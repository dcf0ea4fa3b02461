"""Dump ``.explain("formatted")`` for registered queries to files.

The optimization rounds require committed plan evidence
(``plans/r16/<query>_before.txt`` / ``_after.txt``) so the judge can
check plan-shape claims (Exchange count, join strategy, PushedFilters,
Python-eval nodes) without running Spark.

Usage:
    python tools/dump_plans.py plans/r16 before q1 q2 ...
    python tools/dump_plans.py plans/r16 after --all-bench
    [--sf-dir DIR]   defaults to $SPARK_GRAFT_SF_DIR or /root/testdata/sf0.1

Streaming (``readstream``-tagged) queries are skipped: their callable
materializes a batch result whose plan is the already-captured batch
shape, and running them mid-dump leaves state-store teardown noise.
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark import registry  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n\n")[0])
    ap.add_argument("out_dir", help="directory for plan files (must not start with '-')")
    ap.add_argument("suffix", choices=["before", "after"])
    ap.add_argument("names", nargs="*", help="registered query names")
    ap.add_argument("--all-bench", action="store_true")
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()
    if args.out_dir.startswith("-"):
        ap.error(f"output dir {args.out_dir!r} looks like a flag, refusing")

    registry.load_all()
    names = list(args.names)
    if args.all_bench:
        names += [
            n
            for n, spec in registry.QUERIES.items()
            if spec.bench and n not in names
        ]
    out_dir = Path(args.out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_session("dump_plans")
    for name in names:
        spec = registry.QUERIES[name]
        if "readstream" in spec.tags:
            print(f"# {name}: skipped (readstream)", file=sys.stderr)
            continue
        df = spec.fn(spark, args.sf_dir)
        import contextlib
        import io

        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        path = out_dir / f"{name}_{args.suffix}.txt"
        path.write_text(plan)
        print(f"# wrote {path} ({plan.count('Exchange')} Exchange mentions)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
