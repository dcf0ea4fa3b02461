"""Bucketed (co-located) parquet tables — the pay-the-shuffle-once
primitive for 100 TB fact-to-fact joins.

A ``groupBy``/``join`` on an unbucketed table shuffles the full input
every query. Bucketing moves that shuffle to WRITE time: rows are
hash-partitioned into a fixed number of buckets by the join/agg key and
each bucket is sorted, so every later join or aggregation on that key
reads matching buckets side-by-side — Catalyst's EnsureRequirements
sees the required hash distribution already satisfied and plans a
sort-merge join with NO Exchange on either side (asserted on the real
physical plan in tests/test_bucketing.py).

At 100 TB this is the difference between re-shuffling a fact table for
every one of N downstream queries and shuffling it once at ingest:
orders⋈lineitem-style joins, keyed dedup, and incremental merges all
reuse the bucket layout. Bucket count is a layout decision — pick
roughly (table size / healthy partition size) and keep it FIXED across
tables that join each other (equal bucket counts are required for the
exchange-free plan).

Spark-first notes: ``bucketBy`` is only available through
``saveAsTable`` (the bucket spec lives in the catalog, not the parquet
footers); ``sortBy`` makes each bucket file internally sorted so the
merge side of the join needs no full sort when files-per-bucket is 1,
and only a cheap per-bucket merge sort otherwise.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str],
    buckets: int,
    path: str | None = None,
) -> None:
    """Write ``df`` as a bucketed, per-bucket-sorted parquet table
    registered in the session catalog. ``path`` makes it an external
    table (data at ``path``, metadata in the catalog)."""
    w = df.write.format("parquet").mode("overwrite")
    if path is not None:
        w = w.option("path", path)
    w.bucketBy(buckets, keys[0], *keys[1:]).sortBy(keys[0], *keys[1:]).saveAsTable(
        table
    )


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


def physical_plan(df: DataFrame) -> str:
    """The query's physical plan as text (pre-execution; under AQE this
    is the initial plan, which is exactly where static no-Exchange
    claims must hold)."""
    return df._jdf.queryExecution().executedPlan().toString()
