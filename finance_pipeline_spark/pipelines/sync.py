"""Incremental watermark sync (services/supabase.py:42-76): ship rows
ingested in the last N minutes to the REST sink. The scan is a
parquet read with the watermark predicate pushed down (P8 + S6 + P2 +
K7 composed); at scale the table would be partitioned by ingest date
so the filter prunes partitions. At-least-once by design (lookback
window re-ships on overlap), same as the reference — the receiving
side's keyed insert absorbs replays."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.sinks.keyed_writer import read_table
from finance_pipeline_spark.sinks.rest_sink import Transport, post_records

log = get_logger(__name__)


def sync_data(
    spark: SparkSession,
    table_path: str,
    transport: Transport,
    source: str,
    lookback_minutes: int = 20,
    alert=None,
) -> int:
    """Returns the number of rows shipped; 0 on missing table. Alert +
    swallow on transport failure (services/supabase.py:68-73)."""
    import datetime as dt

    df = read_table(spark, table_path)
    if df is None:
        return 0
    # Fixed driver-side cutoff: current_timestamp() re-evaluates per
    # action, so the count and the send would otherwise see different
    # watermark windows (rows aging out between the two scans).
    cutoff = dt.datetime.now(dt.timezone.utc).replace(tzinfo=None) - dt.timedelta(
        minutes=lookback_minutes
    )
    recent = df.filter(F.col("created_at") >= F.lit(cutoff))
    try:
        n = recent.count()
        if n:
            post_records(recent, transport, source=source)
            log.info("[Sync] %d new rows synced (%s)", n, source)
        return n
    except Exception as e:  # noqa: BLE001 — sync must not kill the pipeline
        log.error("[Sync] failed: %s", e)
        if alert:
            alert(f"Failed to sync data: {e}", "[Sync] Error")
        return 0
