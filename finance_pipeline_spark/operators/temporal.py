"""Temporal join/rollup operators Spark lacks as built-ins — as-of
join, range-band join, multi-granularity time rollup — each expressed
as a composition of DataFrame primitives whose physical plan stays
shuffle-minimal at 100 TB (SURVEY.md §7 extension tier; these are the
time-series shapes a finance pipeline grows into once data outgrows
one node).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query


@query(
    "join_asof",
    oracle="""
    SELECT a.event_id, a.user_id, a.ts,
           b.event_id AS prior_purchase_id,
           b.value AS prior_purchase_value
    FROM (SELECT * FROM events WHERE event_type = 'click') a
    ASOF LEFT JOIN (
        SELECT user_id, ts,
               max(event_id) AS event_id,
               max_by(value, event_id) AS value
        FROM events WHERE event_type = 'purchase'
        GROUP BY user_id, ts
    ) b
      ON a.user_id = b.user_id AND b.ts < a.ts
    """,
    tags=("temporal", "asof"),
    bench=True,
)
def join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: for every click, the most recent strictly-prior
    purchase by the same user (DuckDB expresses this natively as ASOF
    JOIN — the oracle).

    Spark-first formulation: union the two tagged event streams, then
    one window pass per user ordered by time where ``last(purchase_*,
    ignorenulls)`` over ``rowsBetween(unboundedPreceding, -1)`` carries
    the latest prior purchase onto each click row. ONE shuffle (by
    user) + ONE sort — no per-pair probing, no range explosion; this
    is the plan that survives 100 TB, unlike a windowed-bucket
    nested-loop. Strictness (``b.ts < a.ts``) is encoded in the sort:
    at equal timestamps clicks order BEFORE purchases, so a same-ts
    purchase is never in a click's preceding frame — no reliance on
    (user_id, ts) uniqueness.

    Tie determinism: among purchases sharing the same max prior ts,
    the sort's final ``event_id`` key makes ``last()`` pick the
    highest event_id — deterministic with no extra shuffle. DuckDB's
    ASOF JOIN pick among tied match rows is unspecified, so the
    oracle pre-dedups its purchase side to one row per (user_id, ts)
    keeping ``max(event_id)`` / ``max_by(value, event_id)`` — the
    exact row the Spark sort selects.

    Bench note (r3 "6.5× regression" root cause): this plan is
    unchanged since r2 and runs 0.76-1.0s isolated at sf0.1. The r3
    number (3.46s) was an ordering artifact: the bench ran it
    immediately after stream_dedup, whose stopped streaming query
    leaves ~5-10s of decaying background cleanup (measured: 3.37s
    first-run-after-stream, 1.2s after a 5s settle, 0.76s isolated).
    bench.py now runs streaming-tagged queries last and records
    per-repeat raw times so this class of interference is visible."""
    e = load(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts",
        F.lit(None).cast("bigint").alias("p_id"),
        F.lit(None).cast("double").alias("p_value"),
        F.lit(1).alias("is_probe"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts",
        F.col("event_id").alias("p_id"),
        F.col("value").alias("p_value"),
        F.lit(0).alias("is_probe"),
    )
    merged = clicks.unionByName(purchases)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", F.col("is_probe").desc(), "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    return (
        merged.withColumn("prior_purchase_id", F.last("p_id", ignorenulls=True).over(w))
        .withColumn("prior_purchase_value", F.last("p_value", ignorenulls=True).over(w))
        .filter(F.col("is_probe") == 1)
        .select("event_id", "user_id", "ts", "prior_purchase_id", "prior_purchase_value")
    )


@query(
    "user_gap_stats",
    oracle="""
    WITH gaps AS (
        SELECT user_id,
               epoch(ts - lag(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id)) AS gap
        FROM events
    )
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_gaps,
           round(quantile_cont(gap, 0.5), 3) AS median_gap_s,
           round(max(gap), 3) AS max_gap_s
    FROM gaps WHERE gap IS NOT NULL
    GROUP BY user_id
    """,
    tags=("temporal", "window"),
    bench=True,
)
def user_gap_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics (count / exact median /
    max), all JVM-side: ``gap = us - lag(us) over (partition by user
    order by ts, event_id)`` then one hash aggregate with Spark's
    exact ``percentile`` — the same linear interpolation as DuckDB's
    ``quantile_cont(0.5)``, so the two engines agree bit-for-bit
    before the 3-dp round.

    This is the production plan for the statistics that
    ``grouped_user_gaps`` (operators/udfs.py) computes through a
    Python grouped map: ONE shuffle on user_id that the window and
    the groupBy share (the aggregate reuses the window's hash
    partitioning — no second exchange), zero Python workers, full
    whole-stage codegen except the percentile buffer. At 100 TB the
    window partition is bounded by per-user activity, and a whale
    user costs a straggler task, not a Python round-trip per group.

    Gap seconds are derived from integer microseconds divided by
    1e6 — one IEEE double division, identical on both engines —
    rather than casting timestamps to double (which would round to
    relative precision before subtraction)."""
    e = load(spark, sf_dir, "events").select(
        "user_id", F.unix_micros("ts").alias("us"), "event_id"
    )
    w = W.partitionBy("user_id").orderBy("us", "event_id")
    gaps = e.select(
        "user_id",
        ((F.col("us") - F.lag("us").over(w)) / F.lit(1000000.0)).alias("gap"),
    ).filter(F.col("gap").isNotNull())
    return gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.round(F.percentile("gap", F.lit(0.5)), 3).alias("median_gap_s"),
        F.round(F.max("gap"), 3).alias("max_gap_s"),
    )


_BANDS = [
    # (band, lo, hi) — deliberately irregular so the join is a genuine
    # range lookup, not a derivable equi-bucket.
    ("micro", 0.0, 5000.0),
    ("small", 5000.0, 20000.0),
    ("mid", 20000.0, 60000.0),
    ("large", 60000.0, 1e12),
]


@query(
    "join_range_bands",
    oracle="""
    SELECT band,
           count(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_price
    FROM orders
    JOIN (VALUES ('micro', 0.0, 5000.0),
                 ('small', 5000.0, 20000.0),
                 ('mid', 20000.0, 60000.0),
                 ('large', 60000.0, 1e12)) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    tags=("temporal", "range-join"),
)
def join_range_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join against an irregular band table: every order lands in
    the band whose [lo, hi) interval contains its price.

    The band side is tiny and explicitly broadcast, so the non-equi
    condition runs as a broadcast nested-loop — |bands| comparisons
    per row, map-side, no shuffle: the correct physical plan for a
    small-dimension range join at any scale. (A big-big range join
    would instead chop intervals into aligned buckets to recover an
    equi-join; out of scope for a 4-row dimension.)"""
    o = load(spark, sf_dir, "orders")
    bands = spark.createDataFrame(_BANDS, "band string, lo double, hi double")
    return (
        o.join(
            F.broadcast(bands),
            (F.col("o_totalprice") >= F.col("lo")) & (F.col("o_totalprice") < F.col("hi")),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@query(
    "rollup_time_multi",
    oracle="""
    SELECT time_bucket(INTERVAL 1 DAY, ts) AS day_start,
           CASE WHEN GROUPING(time_bucket(INTERVAL 1 HOUR, ts)) = 0
                THEN time_bucket(INTERVAL 1 HOUR, ts) END AS hour_start,
           CAST(GROUPING(time_bucket(INTERVAL 1 HOUR, ts)) AS BIGINT) AS is_day_total,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY GROUPING SETS (
        (time_bucket(INTERVAL 1 DAY, ts)),
        (time_bucket(INTERVAL 1 DAY, ts), time_bucket(INTERVAL 1 HOUR, ts))
    )
    """,
    tags=("temporal", "rollup"),
)
def rollup_time_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity time rollup (the hypertable continuous-
    aggregate shape): per-hour rows AND per-day totals from ONE scan
    via grouping sets — Spark's Expand operator duplicates each input
    row per grouping set before a single hash aggregate, so adding a
    granularity costs a map-side expansion, not another scan."""
    e = load(spark, sf_dir, "events")
    # date_trunc, not two window() calls (Spark rejects multiple time
    # windows in one projection); day/hour truncation is epoch-aligned
    # exactly like time_bucket.
    g = e.select(
        F.date_trunc("day", "ts").alias("day_start"),
        F.date_trunc("hour", "ts").alias("hour_start"),
        "value",
    )
    return (
        g.groupingSets(
            [[F.col("day_start")], [F.col("day_start"), F.col("hour_start")]],
            "day_start",
            "hour_start",
        )
        .agg(
            F.grouping("hour_start").cast("bigint").alias("is_day_total"),
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("total_value"),
        )
        .select("day_start", "hour_start", "is_day_total", "n_events", "total_value")
    )


@query(
    "cohort_retention",
    oracle="""
    WITH act AS (
        SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS wk
        FROM events
    ), coh AS (
        SELECT user_id, wk,
               min(wk) OVER (PARTITION BY user_id) AS cohort_week
        FROM act
    ), ret AS (
        SELECT cohort_week,
               CAST((wk - cohort_week) // 7 AS BIGINT) AS week_no,
               CAST(count(*) AS BIGINT) AS n_users
        FROM coh GROUP BY 1, 2
    )
    SELECT CAST(cohort_week AS TIMESTAMP) AS cohort_week, week_no, n_users,
           CAST((n_users * 1000) // max(CASE WHEN week_no = 0 THEN n_users END)
                    OVER (PARTITION BY cohort_week) AS BIGINT) AS permille
    FROM ret
    """,
    tags=("temporal", "cohort"),
    bench=True,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention matrix — the classic product-analytics
    rollup: users are cohorted by the ISO week of their first event,
    and each later active week counts them toward (cohort_week,
    week_no) with a permille rate against the cohort's week-0 size.

    Cross-engine exact by construction: week buckets are Monday-
    aligned date_trunc on both engines, week_no is integer ``div 7``
    of a day difference that is a multiple of 7 by construction, and
    the rate is integer permille (``n*1000 div base``) — no floating
    point anywhere.

    Scale shape: ONE scan; the per-user first-week comes from a window
    over the distinct (user, week) pairs rather than a groupBy + self-
    join back (a self-join would rescan and recompute the distinct —
    exchanges are never reused across self-join branches). Three
    narrow shuffles — distinct, user window, final groupBy — each
    keyed by high-cardinality columns, no skew, no broadcast needed.
    At 100 TB the distinct pre-shrinks the stream to |users|×|weeks|
    rows before anything wide happens."""
    e = load(spark, sf_dir, "events")
    act = e.select(
        "user_id", F.date_trunc("week", "ts").cast("date").alias("wk")
    ).distinct()
    w = W.partitionBy("user_id")
    coh = act.withColumn("cohort_week", F.min("wk").over(w))
    ret = (
        coh.groupBy(
            "cohort_week",
            F.expr("datediff(wk, cohort_week) div 7").cast("bigint").alias("week_no"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    base = F.max(F.when(F.col("week_no") == 0, F.col("n_users"))).over(
        W.partitionBy("cohort_week")
    )
    return ret.select(
        "cohort_week",
        "week_no",
        "n_users",
        F.expr("n_users * 1000").cast("bigint").alias("_nk"),
        base.alias("_base"),
    ).select(
        # DATE internally (exact integer day arithmetic); TIMESTAMP on the
        # wire — pandas flattens engine DATEs to midnight Timestamps
        # asymmetrically, so timestamp-out is the repo's date convention.
        F.col("cohort_week").cast("timestamp").alias("cohort_week"),
        "week_no",
        "n_users",
        F.expr("_nk div _base").cast("bigint").alias("permille"),
    )


@query(
    "funnel_conversion",
    oracle="""
    WITH s1 AS (
        SELECT user_id, min(ts) AS t1 FROM events
        WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, min(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts > s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, min(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s2.t2
        GROUP BY e.user_id
    ), counts AS (
        SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
               CAST(count(*) AS BIGINT) AS n_users FROM s1
        UNION ALL
        SELECT 2, 'click', count(*) FROM s2
        UNION ALL
        SELECT 3, 'purchase', count(*) FROM s3
    )
    SELECT step, step_name, n_users,
           CAST((n_users * 1000) //
                first_value(n_users) OVER (ORDER BY step) AS BIGINT) AS permille
    FROM counts
    """,
    tags=("temporal", "funnel"),
)
def funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel conversion (view → click → purchase): a user
    advances to step N only via an event STRICTLY AFTER their step-N-1
    time — the sequencing constraint that separates a funnel from
    three independent counts (a click before the first view does not
    convert). Counts per step plus integer-permille conversion vs
    step 1 — no floating point, exact on both engines.

    Scale shape: each step is a pushed-down ``event_type`` predicate
    scan aggregated to one row per user, then a user-keyed join with
    the previous step's (user, ts) frontier — rows shrink monotonically
    step over step, and every shuffle is keyed by the high-cardinality
    user_id. The final 3-row union + window is driver-trivial."""
    ev = load(spark, sf_dir, "events")

    def first_after(step_type: str, prev: DataFrame, tcol: str, out: str) -> DataFrame:
        return (
            ev.filter(F.col("event_type") == step_type)
            .join(prev, "user_id")
            .filter(F.col("ts") > F.col(tcol))
            .groupBy("user_id")
            .agg(F.min("ts").alias(out))
        )

    s1 = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = first_after("click", s1.select("user_id", "t1"), "t1", "t2")
    s3 = first_after("purchase", s2, "t2", "t3")

    def count_row(df: DataFrame, step: int, name: str) -> DataFrame:
        return df.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(step).cast("bigint").alias("step"),
            F.lit(name).alias("step_name"),
            F.col("n_users").cast("bigint"),
        )

    counts = (
        count_row(s1, 1, "view")
        .unionAll(count_row(s2, 2, "click"))
        .unionAll(count_row(s3, 3, "purchase"))
    )
    base = F.first("n_users").over(
        W.orderBy("step").rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return counts.select(
        "step",
        "step_name",
        "n_users",
        (F.col("n_users") * 1000).alias("_nk"),
        base.alias("_base"),
    ).select(
        "step", "step_name", "n_users",
        F.expr("_nk div _base").cast("bigint").alias("permille"),
    )


@query(
    "event_transition_counts",
    oracle="""
    WITH nxt AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    )
    SELECT from_type, to_type, count(*) AS n_transitions
    FROM nxt WHERE to_type IS NOT NULL
    GROUP BY from_type, to_type
    """,
    tags=("temporal", "sequence", "markov"),
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-sequence transition mining: count (event → next event)
    pairs within each user's time-ordered stream — the first-order
    Markov transition matrix behind user-journey analysis, next-action
    models, and anomalous-flow detection (a sudden new hot transition
    is a bot signature).

    lead() over (user, ts) pairs consecutive events without a
    self-join — the same one-shuffle discipline as user_gap_stats; the
    final (from, to) aggregate is |event_types|² rows with map-side
    combine riding the window's partitioning output. At 100 TB this is
    one exchange on user_id plus a tiny rollup; the event_id tiebreak
    makes equal-timestamp ordering identical in both engines."""
    e = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )
