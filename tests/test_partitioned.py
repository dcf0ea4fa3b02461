"""Partition pruning asserted on the real physical plan: a filter on
the partition column must appear in PartitionFilters and must shrink
the selected-partition count — plus the design guard against
key-as-partition-column mistakes."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from finance_pipeline_spark.sinks.partitioned import (
    PartitionDesignError,
    events_by_day,
    scan_file_count,
    scan_partition_filters,
    write_partitioned,
)

SF_DIR = "/root/testdata/sf0.001"


def test_partition_filter_reaches_scan_and_prunes(spark, tmp_path):
    table = events_by_day(spark, SF_DIR, str(tmp_path / "ev"))
    n_days = table.select("event_date").distinct().count()
    assert n_days > 1, "testdata spans one day; partition test is vacuous"

    one_day = table.filter(F.col("event_date") == table.agg(F.min("event_date")).collect()[0][0])
    filters = scan_partition_filters(one_day)
    assert "event_date" in filters, filters

    pruned = scan_file_count(spark, one_day)
    total = scan_file_count(spark, table)
    assert pruned < total
    assert pruned >= 1

    # pruning must not change results: value-parity with a post-read filter
    first_day = table.agg(F.min("event_date")).collect()[0][0]
    expect = table.collect()
    got = [r for r in expect if r.event_date == first_day]
    assert one_day.count() == len(got)


def test_non_partition_filter_does_not_prune(spark, tmp_path):
    table = events_by_day(spark, SF_DIR, str(tmp_path / "ev"))
    q = table.filter(F.col("event_type") == "click")
    assert scan_file_count(spark, q) == scan_file_count(spark, table)


def test_high_cardinality_partition_column_is_refused(spark):
    df = spark.range(0, 200_001).select(F.col("id").alias("user_id"))
    with pytest.raises(PartitionDesignError):
        write_partitioned(df, "/tmp/should-not-exist", ["user_id"])
