"""REST API pipeline (etl/api_fetcher.py:245-270, §3.1): fetch →
map-explode transform → CSV append + idempotent keyed load → sync.

Ordering parity note: the reference syncs *unconditionally* before
checking load success (api_fetcher.py:263 vs the CSV pipeline's
success-gated sync) — preserved here deliberately.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.pipelines.config import API_TABLE, PipelineConfig
from finance_pipeline_spark.pipelines.sync import sync_data
from finance_pipeline_spark.schemas import API_KEYS
from finance_pipeline_spark.sinks.csv_sink import write_append
from finance_pipeline_spark.sinks.keyed_writer import WriteStats, idempotent_append, top_rows
from finance_pipeline_spark.sources.rest_source import fetch_rates

log = get_logger(__name__)


def run_api_process(spark: SparkSession, conf: PipelineConfig) -> WriteStats | None:
    log.info("⚙️ Starting ETL:API pipeline")
    if conf.fetch_json is None:
        log.error("no REST fetcher configured")
        return None
    df = fetch_rates(spark, conf.fetch_json, conf.base_currency)
    if df is None:
        log.error("❌ Failed to fetch data. Exiting.")
        return None
    write_append(df, f"{conf.processed_dir}/forex_api.csv")  # K2
    stats = idempotent_append(spark, df, conf.table(API_TABLE), API_KEYS)
    if stats.inserted > 0:
        top_rows(
            spark,
            conf.table(API_TABLE),
            [F.col("timestamptz").desc(), F.col("currency").asc()],
        ).show(truncate=False)
    # Unconditional sync — reference ordering quirk (see module doc).
    if conf.sync_transport:
        sync_data(
            spark,
            conf.table(API_TABLE),
            conf.sync_transport,
            source="api",
            lookback_minutes=conf.sync_lookback_minutes,
            alert=conf.alert,
        )
    if stats.inserted > 0:
        log.info("✅ ETL:API process completed successfully.")
    else:
        log.warning("⚠️ ETL:API completed with warnings (no new rows).")
    return stats
