"""Web-scrape pipeline (etl/web_scraper.py:210-235, §3.3): fetch HTML
→ parse timestamp + rates table → per-day merge-dedup CSV + idempotent
keyed load → sync.

Parity notes preserved from the reference: an unparseable page
timestamp aborts the pipeline (:219-221); a structurally-broken table
alerts and yields an empty frame (:69-84); zero inserted rows is
still success ("all duplicates is fine" on re-scrapes, :201-204),
unlike the API/CSV loaders.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.pipelines.config import SCRAPED_TABLE, PipelineConfig
from finance_pipeline_spark.pipelines.sync import sync_data
from finance_pipeline_spark.schemas import SCRAPED_KEYS, SCRAPED_ROW
from finance_pipeline_spark.sinks.csv_sink import write_merge_dedup
from finance_pipeline_spark.sinks.keyed_writer import WriteStats, idempotent_append, top_rows
from finance_pipeline_spark.sources.scrape_source import parse_page

log = get_logger(__name__)


def run_web_scrapping_process(
    spark: SparkSession, conf: PipelineConfig
) -> WriteStats | None:
    log.info("⚙️ Starting ETL:Web Scraping process...")
    if conf.fetch_html is None:
        log.error("no HTML fetcher configured")
        return None
    try:
        html = conf.fetch_html()
    except Exception as e:  # noqa: BLE001 — network edge: abort quietly
        log.error("❌ Failed to fetch page: %s", e)
        return None
    df = parse_page(spark, html, conf.base_currency, alert=conf.alert)
    if df is None:  # unparseable timestamp → abort
        return None
    if df.isEmpty():
        log.warning("⚠️ No data extracted.")
        return None
    date_str = df.select(F.min("date")).first()[0].isoformat()
    write_merge_dedup(  # K3: per-day file, re-scrape-safe
        spark,
        df,
        f"{conf.processed_dir}/forex_scraped_{date_str}.csv",
        SCRAPED_KEYS,
        SCRAPED_ROW,
    )
    stats = idempotent_append(spark, df, conf.table(SCRAPED_TABLE), SCRAPED_KEYS)
    if stats.inserted > 0:
        top_rows(
            spark, conf.table(SCRAPED_TABLE), [F.col("timestamptz").desc()]
        ).show(truncate=False)
    if conf.sync_transport:
        sync_data(
            spark,
            conf.table(SCRAPED_TABLE),
            conf.sync_transport,
            source="web_scraper",
            lookback_minutes=conf.sync_lookback_minutes,
            alert=conf.alert,
        )
    log.info("✅ ETL:Web Scraping process completed.")
    return stats
