"""End-to-end pipelines (SURVEY.md §3): CSV window load, REST API
load, HTML scrape load — each extract → transform → idempotent keyed
load → sync, plus the sequential orchestrator (etl/__init__.py:11-16:
API, then CSV, then scraper; independent failure domains)."""

from __future__ import annotations

from finance_pipeline_spark.pipelines.api_pipeline import run_api_process
from finance_pipeline_spark.pipelines.config import PipelineConfig
from finance_pipeline_spark.pipelines.csv_pipeline import run_csv_loading_process
from finance_pipeline_spark.pipelines.scrape_pipeline import run_web_scrapping_process


def run_etl(spark, conf: PipelineConfig) -> dict:
    """main.py:4-6 / etl/__init__.py:11-16 — strictly sequential,
    each pipeline degrades independently (returns stats or None,
    never raises outward)."""
    return {
        "api": run_api_process(spark, conf),
        "csv": run_csv_loading_process(spark, conf),
        "scrape": run_web_scrapping_process(spark, conf),
    }
