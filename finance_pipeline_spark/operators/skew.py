"""Skew-aware joins — salting, the engine-portable answer to the
hot-key problem (brief: "skewed keys → salting or AQE skew-join").

A shuffle join hashes rows to tasks BY KEY, so one hot key (a viral
document's domain, a bot user_id, the 'click' event type) lands its
entire row set on ONE task: 1000 executors, 999 idle, one spilling.
AQE's skew-join splitting (spark.sql.adaptive.skewJoin.enabled, on in
this repo's session) fixes many cases at runtime by splitting
oversized partitions, but it only triggers on sort-merge joins and
only per its size thresholds; salting is the explicit, planner-
independent form that also works for aggregations and on engines
without AQE.

The trick: append a salt in [0, n) to the BIG side's key — derived
from a per-row attribute, so the hot key's rows spread across n
partitions — and EXPLODE the small side n× so every (key, salt)
combination still finds its match. Join semantics are unchanged
(inner/left joins verified row-identical in tests); only the
partition-to-task mapping changes. Cost: the small side is replicated
n× through the shuffle — cheap when small ≪ big / n, which is exactly
the skew-join regime (for a truly small dim you broadcast instead and
skip the shuffle entirely; salting is for when the dim side is past
the broadcast cap)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query

DEFAULT_SALT = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    keys: list[str],
    how: str = "inner",
    n_salt: int = DEFAULT_SALT,
    salt_from: Column | None = None,
) -> DataFrame:
    """Join ``big ⋈ small`` on ``keys`` with the big side salted n ways.

    ``salt_from`` is the per-row expression the salt is derived from —
    defaults to a hash of ALL big-side columns, which spreads a hot
    key's rows as long as they differ anywhere. Pass a row-unique
    column (an event_id) when available; the salt value never affects
    the join RESULT, only the shuffle layout, so any choice is
    correct — uniqueness just makes the spread even.
    """
    if salt_from is None:
        salt_from = F.xxhash64(*[F.col(c) for c in big.columns])
    b = big.withColumn("_salt", F.pmod(salt_from, F.lit(n_salt)).cast("int"))
    s = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salt)]))
    )
    return b.join(s, on=keys + ["_salt"], how=how).drop("_salt")


@query(
    "join_skew_enrich",
    oracle="""
    WITH dim AS (
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS type_n,
               CAST(sum(CAST(value AS DECIMAL(38, 6))) AS DOUBLE) AS type_sum,
               max(value) AS type_max
        FROM events GROUP BY event_type
    )
    SELECT e.event_id, e.event_type, d.type_n, d.type_sum, d.type_max
    FROM events e JOIN dim d USING (event_type)
    """,
    tags=("join", "skew"),
    bench=True,
)
def join_skew_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrich every event with its type's global statistics via a
    SALTED shuffle join — the hot-key-safe plan shape.

    event_type is the canonical skewed key: a handful of values over
    the whole stream, so an unsalted shuffle join puts each type's
    entire row set on one task. Salting 8× bounds any task at ~1/8 of
    the hottest key. (At this dim size one would really broadcast —
    the salted shuffle is exercised here because it is the shape that
    survives when the dim side outgrows the broadcast cap; the
    broadcast variant is u-family territory.) Aggregate columns use
    the decimal-sum/exact-max pattern so both engines agree bitwise."""
    ev = load(spark, sf_dir, "events")
    dim = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("type_n"),
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("type_sum"),
        F.max("value").alias("type_max"),
    )
    return salted_join(
        ev.select("event_id", "event_type"),
        dim,
        ["event_type"],
        salt_from=F.xxhash64("event_id"),
    ).select("event_id", "event_type", "type_n", "type_sum", "type_max")
