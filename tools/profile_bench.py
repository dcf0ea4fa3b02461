"""Per-query bench profile: wall seconds + Spark job count.

At bench scale (sf0.1) most queries are constants-dominated: the wall
is set by the number of SEQUENTIAL Spark jobs (driver-side collects,
localCheckpoints, training rounds) times per-job overhead, plus the
Python-kernel round-trips. Job count is therefore the first thing to
measure when hunting bench-tier wins (guide §1.1: decide where the
time goes before changing anything).

Usage:
    python tools/profile_bench.py OUT.json [q1 q2 ...]   # default: all bench
        [--sf-dir DIR] [--repeat N]

Writes {"query": {"wall": min_sec, "runs": [...], "jobs": n, "stages": n}}.
Jobs/stages are counted on the LAST repeat via the status tracker.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark import registry  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("out", help="output JSON path (must not start with '-')")
    ap.add_argument("names", nargs="*")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--repeat", type=int, default=2)
    args = ap.parse_args()
    if args.out.startswith("-"):
        ap.error(f"output path {args.out!r} looks like a flag, refusing")

    registry.load_all()
    names = args.names or [
        n for n, s in registry.QUERIES.items() if s.bench
    ]
    # streaming last, same reason as bench.py
    names.sort(key=lambda n: "streaming" in registry.QUERIES[n].tags)
    spark = get_session("profile_bench")
    sc = spark.sparkContext

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # warmup
    force(registry.QUERIES[names[0]].fn(spark, args.sf_dir))

    out: dict = {}
    for name in names:
        spec = registry.QUERIES[name]
        streaming = "readstream" in spec.tags
        if streaming:
            force(spec.fn(spark, args.sf_dir))
            time.sleep(4.0)
        runs = []
        jobs = stages = 0
        try:
            for i in range(args.repeat):
                group = f"profile:{name}:{i}"
                sc.setJobGroup(group, name)
                t0 = time.time()
                force(spec.fn(spark, args.sf_dir))
                runs.append(round(time.time() - t0, 3))
                tracker = sc.statusTracker()
                job_ids = tracker.getJobIdsForGroup(group)
                jobs = len(job_ids)
                stages = sum(
                    len(tracker.getJobInfo(j).stageIds)
                    for j in job_ids
                    if tracker.getJobInfo(j) is not None
                )
                if streaming:
                    time.sleep(4.0)
        except Exception as exc:  # noqa: BLE001
            out[name] = {"error": f"{type(exc).__name__}: {exc}"[:300]}
            print(f"# {name}: ERROR {out[name]['error']}", file=sys.stderr)
            continue
        out[name] = {
            "wall": min(runs),
            "runs": runs,
            "jobs": jobs,
            "stages": stages,
        }
        print(f"# {name}: {min(runs):.3f}s jobs={jobs} stages={stages} {runs}", file=sys.stderr)
    Path(args.out).write_text(json.dumps(out, indent=1, sort_keys=True) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
