"""User-function surface (SURVEY.md §2.9-2.10): the three extension
mechanisms the engine supports beyond built-in expressions, each shown
on a real operator —

- scalar ``@pandas_udf``: Arrow-vectorized per-column kernels
  (``udf_embedding_norm``);
- ``applyInPandasWithState``: custom stateful streaming operators
  (``stateful_user_totals`` — a real watermarked stream drained
  through per-group state);
- ``mapInPandas``: whole-batch kernels (multimodal.py, dedup.py).

Everything here is Arrow-batched; no row-at-a-time Python UDFs exist
anywhere in the engine (the ~10-100× slow path).
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from finance_pipeline_spark.registry import load, query


def l2_norm_udf():
    """Scalar pandas UDF: per-row L2 norm of the embedding array.
    Arrow hands the whole column batch to numpy — one vectorized pass,
    versus a Python call per row with classic UDFs. Constructed lazily
    (the decorator parses its DDL return type against the active
    session, so module-level registration would require a SparkContext
    at import time)."""

    @pandas_udf("double")
    def _norm(emb: pd.Series) -> pd.Series:
        import numpy as np

        return emb.map(
            lambda v: float(
                np.sqrt(
                    np.dot(
                        np.asarray(v, dtype=np.float64),
                        np.asarray(v, dtype=np.float64),
                    )
                )
            )
        )

    return _norm


@query(
    "udf_embedding_norm",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE)
                                FOR x IN embedding])), 4) AS l2_norm
    FROM embeddings
    """,
    tags=("udf", "similarity"),
)
def udf_embedding_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 scalar-pandas_udf surface, oracle-checked: the same norm
    the similarity operators fold JVM-side, computed through the Arrow
    UDF path — demonstrating both paths agree to 4 dp."""
    e = load(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id", F.round(l2_norm_udf()("embedding"), 4).alias("l2_norm")
    )


@query(
    "stateful_user_totals",
    oracle="""
    SELECT user_id,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY user_id
    """,
    tags=("streaming", "stateful", "udf", "readstream"),
)
def stateful_user_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 custom stateful operator: per-user running totals via
    ``applyInPandasWithState`` over a real file-replay stream. State is
    one (count, decimal-sum-as-string) pair per user, updated per
    micro-batch; the drain emits each group's totals which must equal
    the batch aggregate. The decimal accumulation (over per-batch
    pandas sums) keeps the total order-insensitive so the value
    hash-matches the SQL oracle."""
    from decimal import Decimal
    from pathlib import Path

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    from finance_pipeline_spark.operators.streaming_batch import (
        _events_stream_source,
        _stage_file,
    )

    load(spark, sf_dir, "events")  # pins session confs
    stage = (
        Path(__file__).resolve().parents[2] / ".cache" / "stream" / Path(sf_dir).name
    )
    stage.mkdir(parents=True, exist_ok=True)
    _stage_file(f"{sf_dir}/events.parquet", stage / "events.parquet")
    stream = _events_stream_source(spark, sf_dir, stage)

    from decimal import ROUND_HALF_UP

    six_dp = Decimal("0.000001")

    def update_totals(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, "0")
        acc = Decimal(total)
        for pdf in pdfs:
            n += len(pdf)
            # Per-value quantize to 6 dp over the EXACT binary double
            # (Decimal(float) is exact; HALF_UP matches both engines'
            # double→DECIMAL(38,6) cast), then order-free decimal sum.
            acc += sum(
                Decimal(float(v)).quantize(six_dp, rounding=ROUND_HALF_UP)
                for v in pdf["value"]
            )
        state.update((n, str(acc)))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [float(acc)]}
        )

    drained = (
        stream.groupBy("user_id")
        .applyInPandasWithState(
            update_totals,
            outputStructType="user_id bigint, n_events bigint, total_value double",
            stateStructType="n bigint, total string",
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    name = "stateful_user_totals_sink"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            drained.writeStream.outputMode("update")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # Update mode re-emits a user on every batch it appears in; the
    # final totals are the emission with the highest (monotonically
    # nondecreasing) running count.
    from pyspark.sql import Window as W

    drained = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    w = W.partitionBy("user_id").orderBy(F.col("n_events").desc())
    return (
        drained.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "n_events", "total_value")
    )


@query(
    "grouped_user_gaps",
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
    tags=("udf", "grouped-map", "temporal"),
)
def grouped_user_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 grouped-map surface DEMO: per-user inter-event gap
    statistics via ``applyInPandas`` — each user's full event history
    arrives as one pandas frame (the shape for kernels that genuinely
    need imperative per-group logic). Median via numpy interpolation
    == SQL ``quantile_cont(0.5)``.

    This registration exists to keep the grouped-map extension surface
    oracle-checked; it is NOT the plan you'd run for these statistics.
    ``user_gap_stats`` (operators/temporal.py) computes the identical
    result JVM-side with ``lag`` + exact ``percentile`` — no Python in
    the hot path — and carries the bench slot (r3 verdict: this
    grouped map cost 13.1s at sf0.1 = 42% of the whole bench, vs
    ~0.5s for the window plan). Keep grouped maps for logic window
    functions can't express; gap stats aren't that.

    The explicit ``repartition(n, user_id)`` pins the shuffle width:
    grouped-map output stats look tiny to AQE, which otherwise
    coalesces the exchange to ONE partition and serializes every
    per-group Python call through a single task. Width is data-aware:
    at the small tier (~150 user groups, tiny per-group pandas work)
    wider fan-out buys no parallelism but pays a Python worker startup
    per extra task (measured at sf0.01: 32-way 4.8s cold / 1.3s warm
    vs 8-way 0.9s), so the floor stays 8; past ~200k rows/partition
    the per-group work dominates the startup constant and the width
    grows toward every core (a fixed 8-way cap measured 88s at the
    1000x probe tier — 24 idle cores; the same rows/task target is
    how you'd size this on a real cluster)."""
    import math
    import os

    import numpy as np

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    from finance_pipeline_spark.registry import parquet_row_count

    n_rows = parquet_row_count(f"{sf_dir}/events.parquet")  # footer, memoized
    n_part = max(8, min(cpus, n_rows // 200_000 or 1))
    e = (
        load(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .repartition(n_part, "user_id")
    )

    def round3(x: float) -> float:
        # Half-UP (like SQL round); Python's round() is banker's and
        # diverges on exact .0005 boundaries (µs-precision gaps hit
        # them). Gaps are non-negative, so no sign handling.
        return math.floor(x * 1000.0 + 0.5) / 1000.0

    def gap_stats(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        gaps = pdf["ts"].diff().dropna().dt.total_seconds().to_numpy()
        if len(gaps) == 0:
            return pd.DataFrame(
                columns=["user_id", "n_gaps", "median_gap_s", "max_gap_s"]
            )
        return pd.DataFrame(
            {
                "user_id": [int(pdf["user_id"].iloc[0])],
                "n_gaps": [len(gaps)],
                "median_gap_s": [round3(float(np.median(gaps)))],
                "max_gap_s": [round3(float(np.max(gaps)))],
            }
        )

    return e.groupBy("user_id").applyInPandas(
        gap_stats,
        "user_id bigint, n_gaps bigint, median_gap_s double, max_gap_s double",
    )
