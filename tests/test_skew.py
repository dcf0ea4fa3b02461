"""salted_join: result parity with the plain join on planted-skew
data, and the actual spread property — the hot key's rows land across
many partitions instead of one."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_pipeline_spark.operators.skew import salted_join


def _skewed(spark, n=2000, hot_frac=0.9):
    n_hot = int(n * hot_frac)
    return spark.range(0, n).select(
        F.col("id").alias("row_id"),
        F.when(F.col("id") < n_hot, F.lit("hot"))
        .otherwise(F.concat(F.lit("k"), (F.col("id") % 50).cast("string")))
        .alias("k"),
        (F.col("id") % 7).alias("v"),
    )


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    dim = big.groupBy("k").agg(F.count(F.lit(1)).alias("n"))
    expect = {
        (r.row_id, r.n) for r in big.join(dim, "k").select("row_id", "n").collect()
    }
    got = {
        (r.row_id, r.n)
        for r in salted_join(big, dim, ["k"], salt_from=F.xxhash64("row_id"))
        .select("row_id", "n")
        .collect()
    }
    assert got == expect


def test_left_join_preserves_unmatched_rows(spark):
    big = _skewed(spark, n=200)
    dim = spark.createDataFrame([("hot", 1.0)], "k string, w double")
    out = salted_join(big, dim, ["k"], how="left", salt_from=F.xxhash64("row_id"))
    assert out.count() == 200
    assert out.filter(F.col("w").isNull()).count() == big.filter(F.col("k") != "hot").count()


def test_salt_spreads_the_hot_key(spark):
    """The property salting exists for: after repartitioning by
    (key, salt) — what the join's shuffle does — the hot key's rows
    occupy many partitions, and no partition holds more than a salt's
    share of them."""
    n_salt = 8
    big = _skewed(spark).withColumn(
        "_salt", F.pmod(F.xxhash64("row_id"), F.lit(n_salt)).cast("int")
    )
    parts = (
        big.filter(F.col("k") == "hot")
        .repartition(32, "k", "_salt")
        .withColumn("pid", F.spark_partition_id())
        .groupBy("pid")
        .count()
        .collect()
    )
    n_hot = sum(r["count"] for r in parts)
    # Unsalted, the hot key is ONE partition holding 100%. Salted, it
    # spreads across up to n_salt partitions (hash collisions mod 32
    # can merge a couple) and no partition holds more than a salt-ish
    # share.
    assert len(parts) > n_salt // 2
    assert max(r["count"] for r in parts) < 0.35 * n_hot
