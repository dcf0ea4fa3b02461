"""Read-only multi-tier scale probe for REGISTERED queries — the tool
behind the ``.probe_registered_1000x_*.json`` records (previous batches
ran the same protocol ad-hoc; this commits it).

For each named query, runs the registered callable at each tier with a
full-plan force (noop-format write — Catalyst cannot eliminate work the
sink consumes, the lesson from the r14b staged probes where a bare
``count()`` let the optimizer drop a left join and time a degenerate
plan), records wall seconds + output rows, and emits the small-vs-big
wall ratio. One un-timed warm query runs first so the initial entry
doesn't pay JVM/codegen init.

Strictly read-only: registered code paths are invoked, never modified —
safe mid-round when the driver window's evidence must stay valid.

Usage:
    python tools/probe_registered_scale.py OUT.json q1 q2 ... \
        [--small /root/testdata/sf0.01] [--big .scale_probe/sf10] \
        [--big-label sf10_1000x] [--ratio-key wall_ratio_1000x] \
        [--repeat N] [--touch]

``--repeat N`` times each query N times and records the min (default 1
— the b1-b3 record methodology). ``--touch`` pre-reads every parquet
file in both tiers before any timing, so the first query doesn't eat
the cold page-cache read (the b4 lesson: a 352 MB first touch on a
contended disk inflated two entries ~8x).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark import registry  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("out", help="output JSON path (must not start with '-')")
    ap.add_argument("names", nargs="+", help="registered query names")
    ap.add_argument("--small", default="/root/testdata/sf0.01")
    ap.add_argument("--big", default=".scale_probe/sf10")
    ap.add_argument("--big-label", default="sf10_1000x")
    ap.add_argument("--ratio-key", default="wall_ratio_1000x")
    ap.add_argument("--repeat", type=int, default=1)
    ap.add_argument("--touch", action="store_true")
    args = ap.parse_args()
    if args.out.startswith("-"):
        ap.error(f"output path {args.out!r} looks like a flag, refusing")
    small, big = args.small, args.big
    big_label, ratio_key = args.big_label, args.ratio_key
    repeat, touch = args.repeat, args.touch
    out_path, names = Path(args.out), args.names

    registry.load_all()
    spark = get_session("scale_probe")
    # Warm the JVM/codegen path once so the first probe isn't inflated.
    spark.range(1_000_000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()
    if touch:
        for d in (small, big):
            for f in sorted(Path(d).glob("*.parquet")):
                f.read_bytes()  # pull into page cache, driver-side

    record: dict[str, dict] = {}
    for name in names:
        spec = registry.QUERIES[name]
        entry: dict[str, dict | float] = {}
        for label, sf_dir in (("sf0.01", small), (big_label, big)):
            runs = []
            for _ in range(repeat):
                t0 = time.time()
                df = spec.fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                runs.append(round(time.time() - t0, 3))
            secs = min(runs)
            rows = spec.fn(spark, sf_dir).count()
            entry[label] = {"rows": rows, "secs": secs}
            if repeat > 1:
                entry[label]["runs"] = runs
            print(f"{name} @ {label}: {rows} rows in {secs}s", flush=True)
        entry[ratio_key] = round(
            entry[big_label]["secs"] / max(entry["sf0.01"]["secs"], 1e-9), 2
        )
        record[name] = entry

    out_path.write_text(json.dumps(record, indent=1) + "\n")
    print(f"wrote {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
