"""Column derivations / scalar functions — SURVEY.md §2.4 (D1-D11).

The reference's per-row pandas/stdlib scalar work re-expressed as
Catalyst column expressions: everything here stays inside whole-stage
codegen (no Python in the hot path). Timestamp semantics pinned by
``spark.sql.session.timeZone=UTC`` + ANSI off (null-on-parse-failure,
matching the reference's ``errors="coerce"``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query


@query(
    "d1_parse_coerce",
    oracle="""
    SELECT o_orderkey,
           CASE WHEN o_orderstatus = 'P' THEN NULL
                ELSE CAST(CAST(strftime(o_orderdate, '%Y-%m-%d') AS DATE) AS TIMESTAMP) END AS parsed_date
    FROM orders
    """,
    tags=("temporal",),
)
def d1_parse_coerce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1 string→date parse with coerce-to-null —
    ``pd.to_datetime(errors="coerce")`` (etl/csv_loader.py:52). Rows
    with status 'P' get a deliberately malformed string; ``to_date``
    under ANSI-off nulls them instead of raising (try_* semantics)."""
    o = load(spark, sf_dir, "orders")
    raw = F.when(
        F.col("o_orderstatus") == "P", F.lit("not-a-date")
    ).otherwise(F.date_format("o_orderdate", "yyyy-MM-dd"))
    return o.select(
        "o_orderkey", F.to_date(raw, "yyyy-MM-dd").cast("timestamp").alias("parsed_date")
    )


@query(
    "d2_interval_shift",
    oracle="""
    SELECT o_orderkey, o_orderdate + INTERVAL 10 HOUR AS ts_utc
    FROM orders
    """,
    tags=("temporal",),
)
def d2_interval_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 timestamp arithmetic + UTC localization — the CSV pipeline
    derives ``timestamptz = date + 10h`` then tags UTC
    (etl/csv_loader.py:105-108); with session tz pinned to UTC the
    arithmetic IS the localization."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 10 HOURS")).alias("ts_utc"),
    )


@query(
    "d3_tz_convert",
    oracle="""
    SELECT o_orderkey,
           CAST(timezone('Europe/Paris', CAST(o_orderdate + INTERVAL 16 HOUR AS TIMESTAMP)) AS TIMESTAMP) AS ts_utc
    FROM orders
    """,
    tags=("temporal",),
)
def d3_tz_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D3 fixed-wall-time CET→UTC conversion — the API pipeline stamps
    each quote date at 16:00 CET and converts to UTC
    (etl/api_fetcher.py:72-82, etl/config.py:32-33). ``to_utc_timestamp``
    interprets the naive wall time in Europe/Paris (DST-aware, like the
    reference's pytz zone) and yields the UTC instant."""
    o = load(spark, sf_dir, "orders")
    wall = F.col("o_orderdate") + F.expr("INTERVAL 16 HOURS")
    return o.select(
        "o_orderkey", F.to_utc_timestamp(wall, "Europe/Paris").alias("ts_utc")
    )


@query(
    "d4_custom_format_parse",
    oracle="""
    SELECT e.event_id,
           strptime(strftime(e.ts, '%b %-d, %Y %H:%M'), '%b %d, %Y %H:%M') AS parsed_ts
    FROM events e
    """,
    tags=("temporal",),
)
def d4_custom_format_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 custom-format timestamp parse — the scraper parses
    '"Apr 12, 2025 18:28 UTC"' via strptime('%b %d, %Y %H:%M %Z')
    (etl/web_scraper.py:54-59). Round-trips events.ts through the same
    rendering (minute precision) and parses it back."""
    e = load(spark, sf_dir, "events")
    rendered = F.date_format("ts", "MMM d, yyyy HH:mm")
    return e.select(
        "event_id", F.to_timestamp(rendered, "MMM d, yyyy HH:mm").alias("parsed_ts")
    )


@query(
    "d5_format_render",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           strftime(l_shipdate, '%Y-%m-%d') AS ship_day,
           strftime(l_shipdate, '%Y-%m-%dT%H:%M:%S+00:00') AS ship_iso
    FROM lineitem
    """,
    tags=("temporal",),
)
def d5_format_render(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D5 timestamp→string rendering — strftime('%Y-%m-%d') /
    isoformat() at the reference's sink boundary
    (etl/csv_loader.py:166-171,205-207)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.date_format("l_shipdate", "yyyy-MM-dd").alias("ship_day"),
        F.date_format("l_shipdate", "yyyy-MM-dd'T'HH:mm:ssxxx").alias("ship_iso"),
    )


@query(
    "d6_literal_columns",
    oracle="""
    SELECT e.event_id, e.event_type, 'EUR' AS base_currency, 'api' AS source
    FROM events e
    """,
    tags=("projection",),
)
def d6_literal_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D6 literal column add — ``df["base_currency"]="EUR"`` etc.
    (etl/api_fetcher.py:86-88, services/supabase.py:29-30)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "event_type",
        F.lit("EUR").alias("base_currency"),
        F.lit("api").alias("source"),
    )


@query(
    "d7_text_to_double",
    oracle="""
    SELECT o_orderkey,
           CAST(trim('  ' || CAST(o_totalprice AS VARCHAR) || ' ') AS DOUBLE) AS rate
    FROM orders
    """,
    tags=("cast",),
)
def d7_text_to_double(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D7+D8 strip + text→float cast — the scraper casts padded cell
    text with float() (etl/web_scraper.py:91-92). Round-trips the price
    through a padded string; trim + cast recover the exact double."""
    o = load(spark, sf_dir, "orders")
    padded = F.concat(F.lit("  "), F.col("o_totalprice").cast("string"), F.lit(" "))
    return o.select("o_orderkey", F.trim(padded).cast("double").alias("rate"))


@query(
    "d8_trim",
    oracle="""
    SELECT o_orderkey,
           trim('  ' || o_orderpriority || ' ') AS priority_trim,
           ltrim('  ' || o_orderpriority) AS priority_ltrim,
           rtrim(o_orderpriority || ' ') AS priority_rtrim
    FROM orders
    """,
    tags=("string",),
)
def d8_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D8 whitespace strip as its own oracle row — the scraper strips
    header and cell text before use (etl/web_scraper.py:54,91). The
    padding is planted here (testdata strings arrive clean), so all
    three variants demonstrably remove it: trim both sides, ltrim
    leading, rtrim trailing. Pure map-side string ops — narrow, no
    shuffle, codegen'd."""
    o = load(spark, sf_dir, "orders")
    p = F.col("o_orderpriority")
    both = F.concat(F.lit("  "), p, F.lit(" "))
    return o.select(
        "o_orderkey",
        F.trim(both).alias("priority_trim"),
        F.ltrim(F.concat(F.lit("  "), p)).alias("priority_ltrim"),
        F.rtrim(F.concat(p, F.lit(" "))).alias("priority_rtrim"),
    )


@query(
    "d10_current_date",
    oracle="""
    SELECT o_orderkey,
           (CAST(o_orderdate AS DATE) <= current_date) AS is_past,
           LEAST(date_diff('day', CAST(o_orderdate AS DATE), current_date),
                 8000) AS days_ago_capped
    FROM orders
    """,
    tags=("temporal", "now"),
)
def d10_current_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10 current-date anchor — the reference stamps rows with
    ``datetime.now()`` / ``pd.Timestamp.now()`` (etl/api_fetcher.py:70,
    etl/csv_loader.py:54). A raw ``current_date()`` column can't be
    hash-compared (the two engines evaluate at different instants), so
    the query derives values that are invariant for ANY evaluation
    date later than the data: the synthetic order dates all predate
    2002, making ``is_past`` uniformly true and the day-distance
    always above the 8000-day cap (binding from 2023 on, forever).
    ``current_date()`` is still
    genuinely evaluated (constant-folded once per query, not per
    row — exactly how a 100 TB scan wants it)."""
    o = load(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        (d <= F.current_date()).alias("is_past"),
        F.least(
            F.datediff(F.current_date(), d), F.lit(8000)
        ).cast("bigint").alias("days_ago_capped"),
    )


@query(
    "d9_map_explode",
    oracle="""
    SELECT e.event_id, u.key AS metric, u.value AS metric_value
    FROM events e,
    LATERAL (
        SELECT 'value' AS key, e.value AS value
        UNION ALL
        SELECT 'user_id', CAST(e.user_id AS DOUBLE)
    ) u
    """,
    tags=("unnest",),
)
def d9_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9 map→rows unnest — the API's JSON {currency→rate} map flattened
    to long-form rows (etl/api_fetcher.py:85) →
    ``explode(create_map(...))``. Explode is pipelined inside the scan
    stage: no shuffle, output is 2× input rows."""
    e = load(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("value"), F.col("value"),
        F.lit("user_id"), F.col("user_id").cast("double"),
    )
    return e.select("event_id", F.explode(m).alias("metric", "metric_value"))


@query(
    "d9b_json_map_parse",
    oracle="""
    SELECT e.event_id,
           CAST(json_extract_string(e.props, '$.k') AS BIGINT) AS k_value
    FROM events e
    """,
    tags=("unnest", "json"),
)
def d9b_json_map_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D9b JSON payload parse — the API response body is a JSON document
    (etl/api_fetcher.py:69); ``from_json`` with an explicit MapType
    schema, no driver-side json.loads."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "map<string,bigint>")
    return e.select("event_id", parsed.getItem("k").alias("k_value"))


@query(
    "d11_month_offset",
    oracle="""
    SELECT o_orderkey,
           CAST(CAST(CAST(o_orderdate AS DATE) - INTERVAL 1 MONTH AS DATE) AS TIMESTAMP) AS month_back
    FROM orders
    """,
    tags=("temporal",),
)
def d11_month_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D10/D11 month offset — ``today - DateOffset(months=N)`` window
    anchor (etl/csv_loader.py:54-55). add_months clamps to month end the
    same way pandas DateOffset and DuckDB interval arithmetic do."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.add_months(F.col("o_orderdate").cast("date"), -1).cast("timestamp").alias("month_back"),
    )
