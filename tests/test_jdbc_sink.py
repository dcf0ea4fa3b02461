"""Engine-checked JDBC WRITE path through the server-URL seam
(``sinks/jdbc_sink.py`` — r12 verdict item 6): the K7/Supabase
analogue's rest_sink spool test proves the transport shape, but never
exercises a database engine. These tests drive a write → read-back
round trip through an actual SQL engine (embedded Derby behind the
same URL parameter production would point at a server), checking type
mapping, overwrite idempotence, and INSERT-or-ignore accounting
(reference semantics at services/supabase.py:23-39)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from finance_pipeline_spark.sinks.jdbc_sink import (
    append_new_keys,
    table_exists,
    write_jdbc_table,
)
from finance_pipeline_spark.sources.jdbc_source import (
    derby_url,
    read_jdbc_table,
)


@pytest.fixture()
def url(tmp_path):
    # the SEAM: tests pass an embedded URL; production passes
    # jdbc:derby://host/db or jdbc:postgresql://... — same code path
    return derby_url(tmp_path / "db")


def _orders_slice(spark, n=37):
    return (
        spark.range(1, n + 1)
        .select(
            F.col("id").alias("o_orderkey"),
            (F.col("id") % 7).alias("o_custkey"),
            (F.col("id") * 1.5 + 0.25).alias("o_totalprice"),
            F.when(F.col("id") % 2 == 0, "F").otherwise("O").alias(
                "o_orderstatus"
            ),
        )
    )


def test_write_read_back_round_trip(spark, url):
    """Row-for-row + type parity through the engine: bigint, double,
    varchar survive the write → read-back unchanged."""
    df = _orders_slice(spark)
    write_jdbc_table(df, url, "RT_ORDERS", mode="overwrite")
    back = read_jdbc_table(spark, url, "RT_ORDERS")
    got = sorted(tuple(r) for r in back.collect())
    want = sorted(tuple(r) for r in df.collect())
    assert got == want and len(got) == 37
    # type mapping held (Derby BIGINT/DOUBLE/VARCHAR → Spark types)
    kinds = dict(back.dtypes)
    assert kinds["o_orderkey"] == "bigint"
    assert kinds["o_totalprice"] == "double"
    assert kinds["o_orderstatus"].startswith("string") or kinds[
        "o_orderstatus"
    ].startswith("varchar")


def test_overwrite_is_idempotent(spark, url):
    df = _orders_slice(spark, 10)
    write_jdbc_table(df, url, "OW", mode="overwrite")
    write_jdbc_table(df, url, "OW", mode="overwrite")
    assert read_jdbc_table(spark, url, "OW").count() == 10


def test_append_new_keys_is_insert_or_ignore(spark, url):
    """The reference's ignore-duplicates upsert through a real engine:
    first load inserts everything; an overlapping re-send inserts only
    the unseen keys; a full replay inserts nothing."""
    first = _orders_slice(spark, 20)
    acc1 = append_new_keys(first, url, "IOI", ["o_orderkey"])
    assert acc1 == {"attempted": 20, "inserted": 20, "skipped": 0}

    # rows 11..30: 10 dups (ignored), 10 fresh (inserted)
    second = _orders_slice(spark, 30).filter(F.col("o_orderkey") > 10)
    acc2 = append_new_keys(second, url, "IOI", ["o_orderkey"])
    assert acc2 == {"attempted": 20, "inserted": 10, "skipped": 10}

    replay = _orders_slice(spark, 30)
    acc3 = append_new_keys(replay, url, "IOI", ["o_orderkey"])
    assert acc3 == {"attempted": 30, "inserted": 0, "skipped": 30}

    back = read_jdbc_table(spark, url, "IOI")
    assert back.count() == 30
    assert back.select("o_orderkey").distinct().count() == 30


def test_append_new_keys_intra_batch_first_wins(spark, url):
    """Duplicate keys INSIDE one batch collapse before the write —
    the keyed_writer first-wins contract, through the engine."""
    df = _orders_slice(spark, 5).unionByName(_orders_slice(spark, 5))
    acc = append_new_keys(df, url, "FW", ["o_orderkey"])
    assert acc == {"attempted": 10, "inserted": 5, "skipped": 5}
    assert read_jdbc_table(spark, url, "FW").count() == 5


def test_table_exists_probe(spark, url):
    assert not table_exists(spark, url, "NOPE")
    write_jdbc_table(_orders_slice(spark, 3), url, "YEP", mode="overwrite")
    assert table_exists(spark, url, "YEP")


def test_table_exists_reraises_connectivity_errors(spark, tmp_path):
    """A down/unreachable database must NOT read as 'table missing'
    (r13 advisor): treating a connection error as absence would make
    append_new_keys skip its anti-join and blind-append duplicates.
    A Derby URL without create=true against a nonexistent database
    raises a boot error (SQLState XJ004), not a missing-table error —
    table_exists must propagate it."""
    bad_url = f"jdbc:derby:{tmp_path / 'never_created_db'}"
    with pytest.raises(Exception) as ei:
        table_exists(spark, bad_url, "ANY")
    # and the raised error is the boot failure, not swallowed as False
    assert "XJ004" in str(ei.value) or "not found" in str(ei.value).lower()


def test_append_new_keys_intra_batch_pick_is_deterministic(spark, url):
    """When duplicate keys carry DIFFERENT non-key values, the survivor
    is the lowest-ordering row over the value columns (keyed_writer's
    rule) — not an arbitrary partition-dependent pick (r13 advisor,
    medium). Same data under different partitionings must land the
    same row in the engine."""
    rows = [(1, "b", 9.0), (1, "a", 5.0), (2, "z", 1.0), (2, "z", 0.5)]
    cols = ["k", "name", "val"]
    for i, parts in enumerate((1, 7)):
        table = f"DET{i}"
        df = spark.createDataFrame(rows, cols).repartition(parts)
        acc = append_new_keys(df, url, table, ["k"])
        assert acc == {"attempted": 4, "inserted": 2, "skipped": 2}
        got = {
            (r["k"], r["name"], r["val"])
            for r in read_jdbc_table(spark, url, table).collect()
        }
        # min over (name, val) within each key group
        assert got == {(1, "a", 5.0), (2, "z", 0.5)}
