"""Real JDBC table scan (SURVEY.md §2.1 S6 — the RDBMS leg).

The reference reads its SQLite warehouse through
``pd.read_sql_query`` (etl/csv_loader.py:234); earlier rounds mapped
S6 onto ``spark.sql`` over registered parquet views (the engine's own
storage), with the true-JDBC form disclosed as container-blocked.
That disclosure was wrong by one detail: Spark BUNDLES Apache Derby
(its Hive-metastore store), and Derby embedded is a real SQL engine
behind a real JDBC driver — so this module ships the genuine
``spark.read.jdbc`` connector, exercised end-to-end against an actual
database file, with predicate pushdown INTO the external engine and a
partitioned parallel read.

Scale shape: a JDBC scan is only as parallel as its partitioning —
``partitionColumn/lowerBound/upperBound/numPartitions`` splits the key
range into independent range-predicate queries, one per task, which is
exactly how a production cluster drains a big table without a single
serial cursor. Filters and column pruning push into the remote SQL
(``PushedFilters`` / ``External engine query`` in the plan), so the
database ships only matching rows. Embedded Derby binds the whole
database into the driver JVM — right for local mode and tests; on a
multi-JVM cluster the SAME code points at a server URL
(``jdbc:derby://host/db``, or any RDBMS) — the connector is
URL-agnostic.
"""

from __future__ import annotations

import hashlib
import os
import tempfile
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def derby_url(db_dir: str | Path, create: bool = True) -> str:
    suffix = ";create=true" if create else ""
    return f"jdbc:derby:{db_dir}{suffix}"


def read_jdbc_table(
    spark: SparkSession,
    url: str,
    table: str,
    *,
    partition_column: str | None = None,
    lower: int | None = None,
    upper: int | None = None,
    num_partitions: int = 4,
    driver: str = DERBY_DRIVER,
) -> DataFrame:
    """``spark.read.jdbc`` with optional range partitioning — the
    generic connector; every option is plain Spark JDBC, usable
    verbatim against any server URL."""
    r = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("driver", driver)
    )
    if partition_column is not None:
        r = (
            r.option("partitionColumn", partition_column)
            .option("lowerBound", int(lower))
            .option("upperBound", int(upper))
            .option("numPartitions", int(num_partitions))
        )
    return r.load()


def _seed_orders_slice(spark: SparkSession, sf_dir: str) -> tuple[str, int, int]:
    """Stage a deterministic orders slice (o_orderkey % 100 == 0) into
    an embedded Derby database keyed by the source dir — the 'real
    RDBMS' the scan query reads back. Returns (url, min_key, max_key).
    Re-seeding is an overwrite, so repeated runs are idempotent.

    The db dir is scoped PER PROCESS (pid suffix — r13 advisor):
    embedded Derby takes a single-JVM boot lock, so two concurrent
    sessions (dual-scale gates in parallel, two developers on one
    host) sharing an sf_dir-keyed path would collide — the second
    boot dies with XSDB6, or an overwrite races a concurrent read.
    With the pid in the key, each driver JVM owns its database;
    within one process the seed→read sequence is single-JVM by
    construction (Spark local mode), and re-entry overwrites its own
    copy. Stale pid dirs are bounded-size (one orders slice) and live
    under the system tempdir."""
    db_dir = (
        Path(tempfile.gettempdir())
        / "spark_graft_derby"
        / f"{hashlib.sha1(str(sf_dir).encode()).hexdigest()[:16]}-{os.getpid()}"
    )
    db_dir.parent.mkdir(parents=True, exist_ok=True)
    # Derby writes derby.log into the process cwd unless told otherwise
    # — route it under the db tree so runs don't litter the repo root
    spark.sparkContext._jvm.System.setProperty(
        "derby.stream.error.file", str(db_dir.parent / "derby.log")
    )
    url = derby_url(db_dir)
    slice_df = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") % 100 == 0)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderstatus")
    )
    bounds = slice_df.agg(
        F.min("o_orderkey").alias("lo"), F.max("o_orderkey").alias("hi")
    ).collect()[0]
    (
        slice_df.write.mode("overwrite")
        .format("jdbc")
        .option("url", url)
        .option("dbtable", "ORDERS_SLICE")
        .option("driver", DERBY_DRIVER)
        .save()
    )
    # an empty slice (tiny SF) still creates the table; 0/1 bounds give
    # a valid—if trivial—partitioned read instead of int(None) dying
    lo = int(bounds["lo"]) if bounds["lo"] is not None else 0
    hi = int(bounds["hi"]) if bounds["hi"] is not None else 1
    return url, lo, hi


@query(
    "s6_jdbc_scan",
    # The oracle reads the SAME slice straight off the parquet: any
    # type-mapping bug in the JDBC round trip (bigint/double/varchar),
    # a pushdown that drops or double-applies the predicate, or a
    # partition-range split that loses boundary rows hash-mismatches.
    oracle="""
    SELECT o_orderkey,
           o_custkey,
           o_totalprice,
           o_orderstatus
    FROM orders
    WHERE o_orderkey % 100 = 0 AND o_totalprice > 50000.0
    """,
    tags=("scan", "jdbc", "source"),
)
def s6_jdbc_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 as a TRUE JDBC scan: seed an embedded Derby database from
    the orders table (the test stand-in for the reference's SQLite
    warehouse, etl/csv_loader.py:234), then read it back through
    ``spark.read.jdbc`` with a 4-way range-partitioned parallel scan
    and a filter that pushes INTO the external engine's SQL
    (``PushedFilters`` + ``External engine query`` in the plan —
    Derby ships only matching rows). The unpartitioned/registered-view
    form of S6 lives in ``operators/relational.py``; this is the
    connector a user points at a real RDBMS."""
    url, lo, hi = _seed_orders_slice(spark, sf_dir)
    return read_jdbc_table(
        spark,
        url,
        "ORDERS_SLICE",
        partition_column="o_orderkey",
        lower=lo,
        upper=max(hi, lo + 1),
        num_partitions=4,
    ).filter(F.col("o_totalprice") > 50000.0)
