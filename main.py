"""Run the whole ETL end-to-end from one command — the engine-level
port of the reference's entrypoint (/root/reference/main.py:1-6: import
``run_etl``, call it, done) with the operational surface a Spark job
needs: explicit warehouse/input paths, offline fixture defaults, and a
JSON run report on stdout for the scheduler to capture.

    python main.py --warehouse ./warehouse
    python main.py --warehouse ./warehouse \
        --history-csv tests/fixtures/../daily.csv \
        --api-json tests/fixtures/frankfurter.json \
        --scrape-html tests/fixtures/xrates.html

The daily schedule artifact lives in
``.github/workflows/data_pipeline.yml`` (the reference schedules the
same three-stage run at 6:00 UTC via cron); on a cluster the identical
command runs under ``spark-submit`` unchanged.

Exit code: 0 if every requested stage produced stats, 1 if any stage
degraded (returned None — the pipelines never raise outward, matching
the reference's independent failure domains, so the exit code is how
a scheduler notices a partial run).
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

_FIXTURES = Path(__file__).resolve().parent / "tests" / "fixtures"


def build_config(args: argparse.Namespace):
    from finance_pipeline_spark.pipelines.config import PipelineConfig
    from finance_pipeline_spark.sources.rest_source import file_fetcher

    fetch_json = None
    if args.api_json:
        fetch_json = file_fetcher(Path(args.api_json))
    fetch_html = None
    if args.scrape_html:
        html_path = Path(args.scrape_html)
        fetch_html = lambda: html_path.read_text()  # noqa: E731
    return PipelineConfig(
        warehouse_dir=args.warehouse,
        processed_dir=args.processed or str(Path(args.warehouse) / "_processed"),
        raw_csv_path=args.history_csv,
        fetch_json=fetch_json,
        fetch_html=fetch_html,
    )


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        description="Run the finance ETL (API -> CSV -> scrape) end-to-end."
    )
    ap.add_argument("--warehouse", default="./warehouse",
                    help="parquet warehouse root (default ./warehouse)")
    ap.add_argument("--processed", default=None,
                    help="intermediate outputs dir (default <warehouse>/_processed)")
    ap.add_argument("--history-csv", default=None,
                    help="Kaggle-shaped daily forex history CSV (S1 input)")
    ap.add_argument("--api-json", default=str(_FIXTURES / "frankfurter.json"),
                    help="REST payload file (offline fixture default); '' disables")
    ap.add_argument("--scrape-html", default=str(_FIXTURES / "xrates.html"),
                    help="scrape HTML file (offline fixture default); '' disables")
    args = ap.parse_args(argv)

    sys.path.insert(0, str(Path(__file__).resolve().parent))
    from finance_pipeline_spark.pipelines import run_etl
    from finance_pipeline_spark.session import get_session

    spark = get_session("finance_pipeline_etl")
    stats = run_etl(spark, build_config(args))
    report = {
        stage: (None if s is None else {"inserted": s.inserted, "skipped": s.skipped})
        for stage, s in stats.items()
    }
    # A stage with no configured input degrades by design (the
    # reference's independent failure domains); it only counts as a
    # failure when its input WAS given and the stage still produced
    # nothing.
    configured = {
        "api": bool(args.api_json),
        "csv": bool(args.history_csv),
        "scrape": bool(args.scrape_html),
    }
    failed = [s for s, st in stats.items() if st is None and configured[s]]
    print(json.dumps({"stages": report, "failed": failed}))
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
