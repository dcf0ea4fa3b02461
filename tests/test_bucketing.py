"""Co-located join via bucketing: the written-down claim ("pay the
shuffle once at write time, join exchange-free forever after") asserted
against the REAL physical plan, not just prose — plus a value check
against the plain shuffled join."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from finance_pipeline_spark.sinks.bucketed import (
    drop_bucketed,
    physical_plan,
    write_bucketed,
)


@pytest.fixture()
def no_broadcast(spark):
    """Tiny test tables would auto-broadcast, which hides the property
    under test (broadcast joins never need an exchange on the big
    side); force the sort-merge path like a fact-to-fact join."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_is_exchange_free(spark, tmp_path, no_broadcast):
    orders = spark.range(0, 1000).select(
        F.col("id").alias("o_id"), (F.col("id") * 7 % 100).alias("o_val")
    )
    lines = spark.range(0, 3000).select(
        (F.col("id") % 1000).alias("o_id"), (F.col("id") % 13).alias("qty")
    )
    try:
        write_bucketed(orders, "b_orders", ["o_id"], 8, str(tmp_path / "bo"))
        write_bucketed(lines, "b_lines", ["o_id"], 8, str(tmp_path / "bl"))

        joined = (
            spark.table("b_orders")
            .join(spark.table("b_lines"), "o_id")
            .groupBy("o_val")
            .agg(F.sum("qty").alias("total_qty"))
        )
        plan = physical_plan(joined)
        # The join itself: sort-merge over co-located buckets, with no
        # shuffle on either scan (the ONLY permitted exchange would be
        # none at all: the groupBy key o_val differs from the bucket
        # key, so assert specifically that no Exchange feeds the join).
        join_side = plan.split("HashAggregate")[-1]  # below the agg
        assert "SortMergeJoin" in plan
        assert "Exchange" not in join_side, join_side

        # Same values as the plain shuffled join.
        expect = {
            (r.o_val, r.total_qty)
            for r in orders.join(lines, "o_id")
            .groupBy("o_val")
            .agg(F.sum("qty").alias("total_qty"))
            .collect()
        }
        got = {(r.o_val, r.total_qty) for r in joined.collect()}
        assert got == expect
    finally:
        drop_bucketed(spark, "b_orders")
        drop_bucketed(spark, "b_lines")


def test_bucketed_groupby_on_bucket_key_skips_exchange(spark, tmp_path, no_broadcast):
    df = spark.range(0, 2000).select(
        (F.col("id") % 64).alias("k"), F.col("id").alias("v")
    )
    try:
        write_bucketed(df, "b_groups", ["k"], 8, str(tmp_path / "bg"))
        agg = spark.table("b_groups").groupBy("k").agg(F.sum("v").alias("s"))
        plan = physical_plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() == 64
    finally:
        drop_bucketed(spark, "b_groups")
