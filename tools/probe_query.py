"""Isolated single-query bench probe — the quiet-host re-measure
protocol (BASELINE.md "Bench noise protocol").

Runs ONE registry query end-to-end (noop-format write) ``--repeat N``
times (default 5) in a fresh process with nothing else on the session,
after the same warm pass bench.py gives streaming queries. Use it to
adjudicate a driver-bench outlier: a stable min here that matches the
historical bar means the driver record caught host contention, not a
regression; a stable min that matches the outlier means the shift is
real and needs a bisect.

Usage:
    python tools/probe_query.py stream_dedup [--repeat 5] [--sf-dir DIR]

Prints one JSON line: {"query": ..., "runs": [...], "min": ..., ...}.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark import registry  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    name = sys.argv[1]
    repeat = 5
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if "--sf-dir" in sys.argv:
        sf_dir = sys.argv[sys.argv.index("--sf-dir") + 1]

    registry.load_all()
    spec = registry.QUERIES[name]
    spark = get_session("probe")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    streaming = "readstream" in spec.tags
    # Same protocol as bench.py: one un-timed warm pass (JVM, codegen,
    # staging copy, state-store init), settle, then timed repeats with
    # the post-stream teardown settle OUTSIDE the timer.
    force(spec.fn(spark, sf_dir))
    if streaming:
        time.sleep(4.0)
    runs: list[float] = []
    for _ in range(repeat):
        t0 = time.time()
        force(spec.fn(spark, sf_dir))
        runs.append(round(time.time() - t0, 3))
        if streaming:
            time.sleep(4.0)
    print(
        json.dumps(
            {
                "query": name,
                "sf_dir": sf_dir,
                "runs": runs,
                "min": min(runs),
                "spread": round(max(runs) / min(runs), 2),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
