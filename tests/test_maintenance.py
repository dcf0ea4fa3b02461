"""Compaction and z-order clustering, verified on footer statistics
and file counts — the observables that actually drive scan cost."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_pipeline_spark.sinks.maintenance import (
    compact,
    file_count,
    files_prunable,
    footer_spans,
    z_value,
    zorder_write,
)


def test_compact_shrinks_file_count_and_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "t")
    df = spark.range(0, 20_000).select(
        F.col("id"), (F.col("id") % 97).alias("k")
    )
    df.repartition(40).write.parquet(path)  # the small-files situation
    assert file_count(path) == 40

    before, after = compact(spark, path, target_mb=128)
    assert (before, after) == (40, 1)  # tiny table → one healthy file

    out = spark.read.parquet(path)
    assert out.count() == 20_000
    assert out.agg(F.sum("id")).collect()[0][0] == sum(range(20_000))


def test_z_value_is_morton_interleave(spark):
    rows = (
        spark.createDataFrame([(0, 0), (1, 0), (0, 1), (3, 5)], "a int, b int")
        .select("a", "b", z_value(F.col("a"), F.col("b")).alias("z"))
        .collect()
    )
    got = {(r.a, r.b): r.z for r in rows}

    def morton(a, b):
        z = 0
        for i in range(16):
            z |= ((a >> i) & 1) << (2 * i)
            z |= ((b >> i) & 1) << (2 * i + 1)
        return z

    for (a, b), z in got.items():
        assert z == morton(a, b)


def test_zorder_narrows_footer_spans_on_both_columns(spark, tmp_path):
    """Random layout: every file spans ~the whole domain of both keys →
    nothing prunes. Z-ordered layout: most files are skippable for a
    point predicate on EITHER key."""
    n, n_files = 40_000, 16
    df = spark.range(0, n).select(
        (F.xxhash64("id").bitwiseAND(F.lit(1023))).alias("x"),
        (F.xxhash64("id", F.lit(1)).bitwiseAND(F.lit(1023))).alias("y"),
    )
    rand_path = str(tmp_path / "rand")
    df.repartition(n_files).write.parquet(rand_path)
    z_path = str(tmp_path / "zord")
    zorder_write(df, z_path, ("x", "y"), n_files=n_files)

    for col in ("x", "y"):
        rand_spans = footer_spans(rand_path, col)
        z_spans = footer_spans(z_path, col)
        assert len(z_spans) == n_files
        for point in (128, 512, 896):
            # random layout: every file spans every point — nothing prunes
            assert files_prunable(rand_spans, point) == 0
            # z-ordered: most files own a curve segment away from the
            # point (measured 8-12/16 across these points/columns; the
            # floor allows for range-boundary straddle AND the
            # repartitionByRange sampling seed, which varies with the
            # session's RDD-id counter — observed min is 8, floor 6)
            assert files_prunable(z_spans, point) >= 6, (col, point)
