"""Projections, filters, sorts, set ops, counts — SURVEY.md §2.3/2.5/2.6/2.7.

Each query mirrors one reference operator (file:line cited per function)
re-phrased over the driver's TPC-H-ish tables. All are single-pass
Catalyst plans: filters and projections push into the parquet scan,
top-k compiles to TakeOrderedAndProject (no global sort), and the
anti-join broadcasts its small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query


@query(
    "p1_projection",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
    FROM orders
    """,
    tags=("projection",),
)
def p1_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 column projection — reference SELECTs a fixed column list
    (etl/csv_loader.py:228-233). Column pruning reaches the parquet
    scan: ReadSchema carries only these four columns."""
    return load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )


@query(
    "p2_drop_column",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
    FROM orders
    """,
    tags=("projection",),
)
def p2_drop_column(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 projection-by-exclusion — reference drops the surrogate ``id``
    before sync (services/supabase.py:17-20). ``df.drop`` is pure
    metadata; the pruned scan never reads the excluded column."""
    return load(spark, sf_dir, "orders").drop("o_orderpriority")


@query(
    "p3_date_window",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1998-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1998-07-01 00:00:00'
    """,
    tags=("filter",),
)
def p3_date_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 date-window range predicate — the reference windows the Kaggle
    CSV to the trailing N months right after scan
    (etl/csv_loader.py:54-58). Fixed literals here (synthetic data is
    historical); the predicate pushes down to the parquet reader and, on
    a date-partitioned 100 TB table, becomes partition pruning."""
    o = load(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderdate") >= F.lit("1998-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-07-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")


@query(
    "p4_comparison_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice, l_discount
    FROM lineitem
    WHERE l_discount > 0.05 AND l_quantity > 0
    """,
    tags=("filter",),
)
def p4_comparison_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 comparison predicate — reference drops non-positive rates
    (etl/csv_loader.py:102). Pushed to the scan as two range filters."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter((F.col("l_discount") > 0.05) & (F.col("l_quantity") > 0)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"
    )


@query(
    "p5_null_drop",
    oracle="""
    SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate, l_extendedprice
    FROM lineitem
    WHERE l_returnflag IS NOT NULL
      AND l_shipdate IS NOT NULL
      AND l_extendedprice IS NOT NULL
    """,
    tags=("filter",),
)
def p5_null_drop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 null-drop on a column subset — ``dropna(subset=...)`` at
    etl/csv_loader.py:99-101 → ``DataFrame.na.drop(subset)``. IsNotNull
    predicates push down; parquet can skip row groups via null counts."""
    li = load(spark, sf_dir, "lineitem")
    return li.na.drop(subset=["l_returnflag", "l_shipdate", "l_extendedprice"]).select(
        "l_orderkey", "l_linenumber", "l_returnflag", "l_shipdate", "l_extendedprice"
    )


@query(
    "p6_exact_dedup",
    oracle="SELECT DISTINCT * FROM lineitem",
    tags=("dedup",),
)
def p6_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 exact all-column dedup — ``drop_duplicates()`` at
    etl/csv_loader.py:98. Plans as partial+final hash aggregate over all
    columns: map-side combine shrinks the shuffle, AQE coalesces the
    post-shuffle partitions. At 100 TB, pre-partitioned/bucketed storage
    on the natural key turns this into a shuffle-free local dedup."""
    return load(spark, sf_dir, "lineitem").dropDuplicates()


@query(
    "p7_keyed_dedup",
    oracle="""
    SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    """,
    tags=("dedup",),
)
def p7_keyed_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 keyed dedup, key projection — reference dedups on
    (currency_name, timestamptz) (etl/web_scraper.py:116-118). A bare
    ``dropDuplicates(subset)`` keeps an arbitrary survivor, which is
    non-deterministic under distributed execution, so the comparable
    form is the distinct key set; ``dedup_keyed_pick`` (aggregates.py)
    is the deterministic-survivor variant."""
    return load(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey").distinct()


@query(
    "p8_watermark_filter",
    oracle="""
    SELECT e.event_id, e.ts, e.user_id, e.event_type, e.value
    FROM events e
    WHERE e.ts >= (SELECT max(ts) FROM events) - INTERVAL 12 HOUR
    """,
    tags=("filter", "temporal"),
)
def p8_watermark_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 ingest-watermark predicate — the reference syncs only rows with
    ``created_at >= now - 20 minutes`` (services/supabase.py:57-61).
    Expressed as max(ts)-relative window so it is reproducible on static
    data. The scalar max is a 1-row broadcast (cross) join — no shuffle
    of the fact side; streaming analogue lives in streaming/sync.py."""
    e = load(spark, sf_dir, "events")
    hi = e.agg(F.max("ts").alias("max_ts"))
    return (
        e.crossJoin(F.broadcast(hi))
        .filter(F.col("ts") >= F.col("max_ts") - F.expr("INTERVAL 12 HOURS"))
        .select("event_id", "ts", "user_id", "event_type", "value")
    )


@query(
    "p9_arity_guard",
    oracle="""
    SELECT doc_id, n_chars
    FROM documents
    WHERE len(string_split(trim(text), ' ')) >= 2 AND n_chars >= 2
    """,
    tags=("filter", "text"),
)
def p9_arity_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 min-arity row guard — reference skips scraped <tr> rows with
    fewer than 2 cells (etl/web_scraper.py:88-90); here: docs with at
    least two whitespace-separated fields."""
    d = load(spark, sf_dir, "documents")
    return d.filter(
        (F.size(F.split(F.trim(F.col("text")), " ", -1)) >= 2) & (F.col("n_chars") >= 2)
    ).select("doc_id", "n_chars")


@query(
    "o1_topk_multikey",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice
    FROM orders
    ORDER BY o_orderdate DESC, o_custkey ASC, o_orderkey ASC
    LIMIT 10
    """,
    tags=("sort", "topk"),
    bench=True,
)
def o1_topk_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 multi-key top-k inspect — ``ORDER BY timestamptz DESC,
    currency ASC LIMIT 10`` (etl/csv_loader.py:228-233). Spark plans
    TakeOrderedAndProject: per-partition heap + driver merge, never a
    global sort — the property that makes top-k O(n) at 100 TB.
    o_orderkey appended as a unique tie-break for determinism."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(
            F.col("o_orderdate").desc(), F.col("o_custkey").asc(), F.col("o_orderkey").asc()
        )
        .limit(10)
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    )


@query(
    "o2_topk_single",
    oracle="""
    SELECT event_id, ts, event_type, value
    FROM events
    ORDER BY ts DESC, event_id ASC
    LIMIT 10
    """,
    tags=("sort", "topk"),
)
def o2_topk_single(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 single-key top-k — etl/web_scraper.py:182-187; event_id as
    unique tie-break."""
    return (
        load(spark, sf_dir, "events")
        .orderBy(F.col("ts").desc(), F.col("event_id").asc())
        .limit(10)
        .select("event_id", "ts", "event_type", "value")
    )


@query(
    "o3_dynamic_sort",
    oracle="""
    SELECT c_custkey, c_name, c_acctbal
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey ASC
    LIMIT 25
    """,
    tags=("sort",),
)
def o3_dynamic_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 dynamic sort keys — scripts/inspect_db.py:17-25 builds the
    ORDER BY from introspected columns. Here the key list is computed
    from df.columns at plan time (first numeric non-key column desc,
    then primary key asc) — same introspection, resolved before
    execution so Catalyst still sees a static sort."""
    c = load(spark, sf_dir, "customer")
    numeric = [
        f.name
        for f in c.schema.fields
        if f.dataType.typeName() in ("double", "float") and not f.name.endswith("key")
    ]
    keys = [F.col(numeric[0]).desc()] if numeric else []
    keys.append(F.col(c.columns[0]).asc())
    return c.orderBy(*keys).limit(25).select("c_custkey", "c_name", "c_acctbal")


@query(
    "o4_global_index",
    oracle="""
    SELECT o_orderkey, o_orderdate,
           row_number() OVER (ORDER BY o_orderdate, o_orderkey) - 1 AS row_idx
    FROM orders
    """,
    tags=("sort", "index"),
)
def o4_global_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global row index in total (o_orderdate, o_orderkey) order — the
    scalable form of ``row_number() OVER (ORDER BY ...)``.

    The naive window with no PARTITION BY plans an Exchange
    SinglePartition: every row of a 100 TB table funnels through ONE
    reducer — the canonical scale killer. This plan never does that:

    1. bucket each row by a KEY-DERIVED range (here the order month —
       monotone in the leading sort key, so (bucket, keys) ordering ==
       keys ordering, and it's deterministic: no sampled partitioner,
       nothing to re-sample between jobs);
    2. ``row_number() OVER (PARTITION BY bucket ORDER BY keys)`` —
       ONE distributed hash shuffle, per-bucket sorts run in parallel,
       skew bounded by the busiest month (salt the bucket finer — week,
       day — if a month outgrows an executor);
    3. per-bucket counts (map-side partial agg) → running-sum offsets
       over the TINY bucket table (the only SinglePartition exchange
       left touches ~tens of rows);
    4. broadcast the offsets back: row_idx = offset + local - 1.

    The index is dense, 0-based, and reproducible across runs and
    cluster sizes — what a training-data pipeline needs to address
    examples stably (shard = idx % n_shards, resume-from-idx)."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    bucket = (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("_bucket")
    b = orders.select("o_orderkey", "o_orderdate", bucket)

    local = F.row_number().over(
        W.partitionBy("_bucket").orderBy("o_orderdate", "o_orderkey")
    )
    counts = b.groupBy("_bucket").agg(F.count(F.lit(1)).alias("_n"))
    offsets = counts.select(
        "_bucket",
        F.coalesce(
            F.sum("_n").over(
                W.orderBy("_bucket").rowsBetween(W.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("_offset"),
    )
    return (
        b.withColumn("_local", local)
        .join(F.broadcast(offsets), "_bucket")
        .select(
            "o_orderkey",
            "o_orderdate",
            (F.col("_offset") + F.col("_local") - 1).alias("row_idx"),
        )
    )


@query(
    "u1_union_dedup",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_orderstatus = 'O'
    UNION
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders WHERE o_totalprice > 100000
    """,
    tags=("setop",),
)
def u1_union_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1 union + dedup merge — ``pd.concat + drop_duplicates`` when the
    scraper re-writes a per-day CSV (etl/web_scraper.py:116-118).
    ``unionByName`` aligns by column name (not position), then the
    distinct is one hash-aggregate shuffle."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"
    )
    a = o.filter(F.col("o_orderstatus") == "O")
    b = o.filter(F.col("o_totalprice") > 100000)
    return a.unionByName(b).dropDuplicates()


@query(
    "u2_anti_join",
    oracle="""
    SELECT c.c_custkey, c.c_name, c.c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    """,
    tags=("join", "anti"),
    bench=True,
)
def u2_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2 key-difference anti-join — the reference's only join-shaped
    op: ``INSERT OR IGNORE`` ≡ insert rows whose key is absent from the
    target (etl/csv_loader.py:196). Customers with no finished order.
    The probe side stays partition-local when the build side broadcasts;
    at 100 TB the build side is the *new* batch (small), so this is a
    broadcast anti-join against the big table, not the reverse."""
    c = load(spark, sf_dir, "customer")
    o = (
        load(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


@query(
    "u3_semi_join",
    oracle="""
    SELECT s.s_suppkey, s.s_name, s.s_acctbal
    FROM supplier s
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_suppkey = s.s_suppkey AND l.l_discount > 0.08
    )
    """,
    tags=("join", "semi"),
)
def u3_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3 semi-join (EXISTS) — complement of U2, the membership probe a
    keyed idempotent writer needs ("which incoming keys already exist")."""
    s = load(spark, sf_dir, "supplier")
    li = (
        load(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.08)
        .select("l_suppkey")
    )
    return s.join(li, s.s_suppkey == li.l_suppkey, "left_semi").select(
        "s_suppkey", "s_name", "s_acctbal"
    )


@query(
    "a1_count",
    oracle="SELECT count(*) AS n_rows FROM lineitem",
    tags=("agg",),
)
def a1_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 row count — ``len(df)`` row-accounting (etl/csv_loader.py:66).
    Partial counts per partition, single-row exchange, final sum."""
    return load(spark, sf_dir, "lineitem").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "a3_affected_rows",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders) -
      (SELECT count(*) FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c
                      WHERE c.c_custkey = o.o_custkey AND c.c_acctbal < 0))
      AS would_insert
    """,
    tags=("agg",),
)
def a3_affected_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 affected-row accounting — the reference counts inserted vs
    skipped rows around INSERT OR IGNORE (etl/csv_loader.py:183-185).
    Set-based form: incoming.count() - already_present.count() computed
    as one anti-join count."""
    o = load(spark, sf_dir, "orders")
    neg = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") < 0)
        .select("c_custkey")
    )
    new_rows = o.join(neg, o.o_custkey == neg.c_custkey, "left_anti")
    return new_rows.agg(F.count(F.lit(1)).alias("would_insert"))


@query(
    "a2_empty_probe",
    oracle="""
    SELECT
      (SELECT count(*) FROM orders WHERE o_totalprice < 0) = 0 AS filtered_is_empty,
      (SELECT count(*) FROM orders) = 0 AS table_is_empty
    """,
    tags=("agg", "guard"),
)
def a2_empty_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 empty test — the reference's ``df.empty`` input guard
    (etl/csv_loader.py:91-93, etl/web_scraper.py:224). ``isEmpty`` is
    the Spark form: it evaluates only until the first non-empty
    partition (no full count), the right guard at 100 TB."""
    o = load(spark, sf_dir, "orders")
    probe = [(o.filter(F.col("o_totalprice") < 0).isEmpty(), o.isEmpty())]
    return spark.createDataFrame(
        probe, "filtered_is_empty boolean, table_is_empty boolean"
    )


@query(
    "s6_sql_table_scan",
    oracle="""
    SELECT n.n_name, count(*) AS n_suppliers,
           CAST(SUM(CAST(s.s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    tags=("scan", "sql"),
)
def s6_sql_table_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S6 SQL-over-registered-tables — the reference's
    ``pd.read_sql_query`` surface (etl/csv_loader.py:234 et al.) as
    ``spark.sql`` over temp views: same Catalyst plan as the DataFrame
    API, so the textual-SQL entry point costs nothing."""
    load(spark, sf_dir, "supplier").createOrReplaceTempView("supplier_v")
    load(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    return spark.sql(
        """
        SELECT n.n_name, count(*) AS n_suppliers,
               CAST(SUM(CAST(s.s_acctbal AS DECIMAL(38,6))) AS DOUBLE) AS total_acctbal
        FROM supplier_v s JOIN nation_v n ON s.s_nationkey = n.n_nationkey
        GROUP BY n.n_name
        """
    )
