"""Hive-style partitioned parquet layout — the partition-PRUNING
primitive that pairs with bucketing's shuffle elimination
(sinks/bucketed.py). Bucketing kills the exchange for key joins;
date/category partitioning kills the SCAN for range/equality
predicates: a query over one day of a 100 TB, 3-year event table must
open ~0.1% of the files, and that decision must happen at PLANNING
time from directory names — zero data IO — not per-file at runtime.

The writer derives the partition column(s) from the data
(``events`` → ``event_date=2024-01-07/part-*.parquet``); the reader
asserts the contract the layout exists for: a filter on the partition
column shows up in the scan's ``PartitionFilters`` and the
post-pruning file count shrinks (both checked against the real
physical plan in tests/test_partitioned.py — prose claims about
pruning are worthless, the plan either prunes or it doesn't).

Partition-design rules encoded here (and enforced by ``validate``):

- Partition on LOW-cardinality, ALWAYS-FILTERED columns (a date, a
  region, a source). Every distinct value is a directory; a
  high-cardinality partition column (user_id) creates millions of
  tiny files and kills the metastore — that is what bucketing is for.
- Aim for partition sizes in the 100 MB–1 GB range at target scale;
  at 100 TB/3 years, daily partitions of ~90 GB split further by a
  second column (source) or rely on maxPartitionBytes splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# A partition column whose distinct-value count exceeds this is almost
# certainly a key, not a partition dimension — refuse loudly.
MAX_PARTITION_VALUES = 100_000


class PartitionDesignError(ValueError):
    pass


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str], validate: bool = True
) -> None:
    """Write ``df`` as a Hive-partitioned parquet dataset at ``path``.

    ``validate`` counts distinct partition tuples first (one cheap
    aggregate) and refuses key-like partition columns — the mistake
    that turns a table into millions of unsplittable small files.
    """
    if validate:
        n = df.select(*partition_cols).distinct().count()
        if n > MAX_PARTITION_VALUES:
            raise PartitionDesignError(
                f"{n} distinct values across partition columns "
                f"{partition_cols} — high-cardinality columns are join/"
                f"bucket keys, not partition dimensions"
            )
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def events_by_day(spark: SparkSession, sf_dir: str, out_path: str) -> DataFrame:
    """The canonical layout for the ``events`` stream: daily
    partitions, derived from the event timestamp at write time."""
    from finance_pipeline_spark.registry import load

    ev = load(spark, sf_dir, "events").withColumn(
        "event_date", F.to_date("ts")
    )
    write_partitioned(ev, out_path, ["event_date"])
    return read_partitioned(spark, out_path)


def scan_partition_filters(df: DataFrame) -> str:
    """The ``PartitionFilters: [...]`` clause of the scan node in the
    executed plan — empty string if the scan has none. This is the
    observable that proves pruning happened at planning time."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "PartitionFilters" in line:
            return line.strip()
    return ""


def scan_file_count(spark: SparkSession, df: DataFrame) -> int:
    """Number of files the scan will actually read AFTER pruning —
    from the FileSourceScanExec's selected partitions, not the
    directory listing."""
    plan = df._jdf.queryExecution().executedPlan()
    # walk the plan tree for the scan node
    nodes = [plan]
    while nodes:
        node = nodes.pop()
        name = node.getClass().getSimpleName()
        if name == "FileSourceScanExec":
            # force the driver-side partition resolution, then read the
            # numFiles metric it populates (post-pruning file count)
            node.selectedPartitions()
            return int(node.metrics().apply("numFiles").value())
        ch = node.children()
        for i in range(ch.length()):
            nodes.append(ch.apply(i))
    raise RuntimeError("no FileSourceScanExec in plan")
