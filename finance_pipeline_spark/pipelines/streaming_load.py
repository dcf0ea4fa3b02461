"""Streaming incremental load (SURVEY.md §2.10): a file-source stream
drained through ``foreachBatch`` into the idempotent keyed writer —
the generalization of the reference's 20-minute lookback sync
(services/supabase.py:57-61) with the at-least-once lookback replaced
by exactly-once-per-key: replays and late re-deliveries land in the
anti-join and are skipped, so the sink table converges no matter how
often batches repeat.

``Trigger.AvailableNow`` processes the backlog and stops — the batch/
streaming hybrid a daily-cron deployment of this pipeline would use;
leaving the trigger default turns the same code into a continuous
loader.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.sinks.keyed_writer import WriteStats, idempotent_append

log = get_logger(__name__)


def stream_into_table(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType | str,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[WriteStats]:
    """Drain all available files from ``source_dir`` into the keyed
    table; returns per-microbatch write stats.

    ``max_files_per_trigger`` bounds each microbatch (availableNow
    honors read limits): smaller batches give deterministic
    first-file-wins ordering across replayed keys and bound the
    anti-join's incoming side; None lets one batch take the whole
    backlog."""
    stats: list[WriteStats] = []

    def load_batch(batch_df: DataFrame, batch_id: int) -> None:
        s = idempotent_append(spark, batch_df, table_path, keys)
        log.info(
            "microbatch %d: %d inserted, %d skipped", batch_id, s.inserted, s.skipped
        )
        stats.append(s)

    reader = spark.readStream.schema(schema).option("header", True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.csv(source_dir)
        .writeStream.foreachBatch(load_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


@dataclass(frozen=True)
class CdcApplyStats:
    inserted: int
    updated: int
    deleted: int


def stream_cdc_apply(
    spark: SparkSession,
    source_dir: str,
    schema: T.StructType | str,
    table_path: str,
    keys: list[str],
    checkpoint_dir: str,
    seq_col: str | None = None,
    op_col: str | None = None,
    delete_op: str = "d",
    max_files_per_trigger: int | None = None,
) -> list:
    """Streaming CDC apply: drain a changelog file stream through
    ``foreachBatch`` into the TRANSACTIONAL table's MERGE
    (``TxnKeyedTable.upsert``) — new keys insert, re-delivered keys
    UPDATE to the latest state instead of being skipped. This is the
    continuous half of the CDC pair: ``cdc_latest_state`` compacts a
    historical changelog in batch; this applies one incrementally,
    exactly the Debezium-topic → warehouse-table apply loop.

    ``op_col`` names the changelog's operation column (Debezium
    ``op``): rows whose op equals ``delete_op`` are TOMBSTONES — their
    keys are removed from the table (``TxnKeyedTable.delete_keys``,
    the copy-on-write key-delete) instead of upserted as ghost rows;
    every other op (insert/update/snapshot-read) upserts. The op
    column is dropped before the upsert so it never lands in the
    table. Without ``op_col`` the feed is treated as upsert-only —
    fine for insert/update topics, wrong for feeds that carry
    deletes.

    ``seq_col`` is the changelog's ordering column (LSN / commit ts /
    Kafka offset — every real CDC feed has one). When a microbatch
    carries SEVERAL changes for one key — the default, since one
    availableNow batch can take the whole backlog — the max-seq row
    wins (key tiebreak on the remaining columns), which is what
    "latest state" means: an update followed by a delete deletes, a
    delete followed by a re-insert re-inserts. Without ``seq_col`` the
    upsert falls back to its deterministic min-by-value in-batch pick:
    convergent and replay-safe, but NOT ordered — only acceptable when
    delivery guarantees at most one change per key per batch.

    Crash between microbatches replays from the checkpoint into an
    idempotent apply (same rows upsert to the same state):
    effectively-once table state on at-least-once delivery.
    Concurrent out-of-band writers are safe too — upsert's optimistic
    concurrency restarts on commit conflicts.

    Returns per-microbatch ``UpsertStats`` (no ``op_col``) or
    ``CdcApplyStats`` (with one)."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    table = TxnKeyedTable(spark, table_path, keys)
    stats: list = []

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        df = batch_df
        if seq_col is not None:
            value_cols = [c for c in df.columns if c not in keys]
            w = W.partitionBy(*keys).orderBy(
                F.col(seq_col).desc(),
                *[F.col(c) for c in value_cols if c != seq_col],
            )
            df = (
                df.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .drop("_rn")
            )
        if op_col is None:
            s = table.upsert(df)
            log.info(
                "cdc microbatch %d: %d inserted, %d updated",
                batch_id, s.inserted, s.updated,
            )
            stats.append(s)
            return
        # Tombstone routing. The latest-per-key pick above already ran
        # WITH the op column, so a key whose final change is a delete
        # appears only on the tombstone side (and vice versa) — the
        # two table commits below touch disjoint keys in either order.
        # eqNullSafe: a null op is data, not a tombstone.
        is_del = F.col(op_col).eqNullSafe(F.lit(delete_op))
        upserts = df.filter(~is_del).drop(op_col)
        tombstones = df.filter(is_del).select(*keys)
        s = table.upsert(upserts)
        n_del = table.delete_keys(tombstones)
        log.info(
            "cdc microbatch %d: %d inserted, %d updated, %d deleted",
            batch_id, s.inserted, s.updated, n_del,
        )
        stats.append(
            CdcApplyStats(inserted=s.inserted, updated=s.updated, deleted=n_del)
        )

    reader = spark.readStream.schema(schema).option("header", True)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.csv(source_dir)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
