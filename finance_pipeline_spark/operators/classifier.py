"""Trained quality classifier — the fastText-style "reference corpus
vs crawl" filter from the GPT-3/LLaMA data recipes, re-expressed
Spark-first.

The standard recipe trains a linear classifier to distinguish a
trusted reference slice (Wikipedia/books; here: a fixed subset of the
``source`` column) from the rest of the crawl, then keeps documents
the classifier scores reference-like. The interesting engineering
problem at 100 TB is DETERMINISTIC distributed training: a naive
gradient sum over doubles changes with partitioning (float addition
isn't associative), so two runs of the same job produce different
weights and different keep sets — an audit nightmare. Here every
per-row gradient contribution is rounded to 9 dp and accumulated as
``decimal(38,12)`` (exact, order-free — the engine's standard trick
for cross-run and cross-engine determinism), so the trained weights
are bit-identical on every run and any partitioning; a pytest pins
that plus separation on planted data.

Cost shape: training is ``iters`` map-side-combined aggregates over
the feature frame (one narrow row per doc — text is touched once in
the feature pass); scoring is one codegen scan with literal weights.
No driver-side data beyond the (d+1)-element weight vector.

Registered rows-only: 20 coupled gradient-descent iterations are an
iterative algorithm, not a static SQL chain (the brief's explicit
rows-only category); correctness is pinned by determinism + planted
separation tests instead.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query

# the trusted "reference" slice of the corpus — stands in for the
# Wikipedia/books side of the classic quality-classifier recipe
_REF_SOURCES = ("src0", "src1", "src2", "src3", "src4")
_ITERS = 20
_LR = 0.5


def doc_features(d: DataFrame) -> DataFrame:
    """(doc_id, f1..f5): deterministic per-doc quality signals, all
    pure JVM expressions on one text scan, each rounded to 6 dp so the
    downstream decimal accumulation is exact. Features: token count
    (log-scaled), type/token ratio, mean token length, digit-character
    ratio, mean sentence-ish segment length."""
    toks = F.split(F.trim(F.col("text")), " ")
    n_tok = F.size(toks).cast("double")
    chars = F.length("text").cast("double")
    digits = (
        chars - F.length(F.regexp_replace("text", r"[0-9]", ""))
    ).cast("double")
    segs = F.size(F.split(F.col("text"), r"[.!?]")).cast("double")
    return d.select(
        "doc_id",
        F.round(F.log1p(n_tok), 6).alias("f1"),
        F.round(
            F.size(F.array_distinct(toks)).cast("double")
            / F.greatest(n_tok, F.lit(1.0)),
            6,
        ).alias("f2"),
        F.round(chars / F.greatest(n_tok, F.lit(1.0)), 6).alias("f3"),
        F.round(digits / F.greatest(chars, F.lit(1.0)), 6).alias("f4"),
        F.round(n_tok / F.greatest(segs, F.lit(1.0)), 6).alias("f5"),
    )


_FEATS = ("f1", "f2", "f3", "f4", "f5")


def _standardize(feat: DataFrame) -> tuple[DataFrame, dict]:
    """6-dp-rounded z-scores with exact decimal moment sums: mean and
    variance come out identical on every run/partitioning, so the
    standardization can't introduce nondeterminism before training."""
    aggs = []
    for f in _FEATS:
        c = F.col(f).cast("decimal(20,6)")
        aggs += [
            F.sum(c).alias(f"s_{f}"),
            F.sum((c * c).cast("decimal(38,12)")).alias(f"q_{f}"),
        ]
    row = feat.agg(F.count(F.lit(1)).alias("n"), *aggs).collect()[0]
    n = max(int(row["n"]), 1)
    stats = {}
    for f in _FEATS:
        mean = float(row[f"s_{f}"] or 0) / n
        var = max(float(row[f"q_{f}"] or 0) / n - mean * mean, 1e-12)
        stats[f] = (round(mean, 6), round(math.sqrt(var), 6))
    out = feat.select(
        *[c for c in feat.columns if c not in _FEATS],
        *[
            F.round(
                (F.col(f) - F.lit(stats[f][0])) / F.lit(max(stats[f][1], 1e-6)),
                6,
            ).alias(f)
            for f in _FEATS
        ],
    )
    return out, stats


def _margin(weights: list[float]) -> Column:
    z = F.lit(weights[0])
    for j, f in enumerate(_FEATS, start=1):
        z = z + F.lit(weights[j]) * F.col(f)
    return z


def logreg_fit(
    labeled: DataFrame, iters: int = _ITERS, lr: float = _LR
) -> list[float]:
    """Deterministic batch gradient descent over (y, f1..f5): per
    iteration ONE map-side-combined aggregate computes the full-batch
    gradient with 9-dp-rounded per-row contributions summed as exact
    decimals; the (d+1)-element weight vector lives on the driver and
    is rounded to 9 dp per step. Same data → same weights, regardless
    of partitioning, executor count, or run order."""
    labeled = labeled.localCheckpoint(eager=True)  # iters passes, one plan
    n = max(labeled.count(), 1)
    w = [0.0] * (1 + len(_FEATS))
    for _ in range(iters):
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w)))
        err = p - F.col("y").cast("double")
        aggs = [
            F.sum(F.round(err, 9).cast("decimal(38,12)")).alias("g0")
        ] + [
            F.sum(
                F.round(err * F.col(f), 9).cast("decimal(38,12)")
            ).alias(f"g{j}")
            for j, f in enumerate(_FEATS, start=1)
        ]
        g = labeled.agg(*aggs).collect()[0]
        w = [
            round(w[j] - lr * float(g[f"g{j}"] or 0) / n, 9)
            for j in range(len(w))
        ]
    return w


def _classifier_oracle() -> str:
    """The ENTIRE training + serving chain re-derived in DuckDB — the
    ``_pq_oracle`` pattern (re-derive trained state in SQL, don't
    embed it): features, exact-decimal standardization moments, and
    the 20 gradient steps unrolled as generated CTE pairs (per step:
    one decimal-summed gradient aggregate over the feature CTE, one
    1-row weight update). Every rounding point mirrors the Spark side
    (6-dp features/stats, 9-dp per-row gradient contributions and
    weights, decimal(38,12) accumulation), so the weights — and hence
    the served scores — hash-match. Static SQL, no data-dependent
    literals: the oracle is sf-agnostic like every other entry
    (r9 verdict item 3 — drops the rows-only count by one)."""
    refs = ", ".join(f"'{s}'" for s in _REF_SOURCES)
    feats = list(_FEATS)
    # per-feature standardization stats: exact decimal moment sums,
    # then the Python-side float math reproduced expression-for-
    # expression (unrounded mean feeds the variance; rounded mean/std
    # feed the z-score; greatest() = the max() clamps)
    mom = ", ".join(
        f"sum(CAST({f} AS DECIMAL(18,6))) AS s_{f}, "
        f"sum(CAST(CAST({f} AS DECIMAL(18,6)) * CAST({f} AS DECIMAL(18,6)) "
        f"AS DECIMAL(38,12))) AS q_{f}"
        for f in feats
    )
    st_cols = ", ".join(
        f"round(CAST(s_{f} AS DOUBLE) / nn, 6) AS m_{f}, "
        f"round(sqrt(greatest(CAST(q_{f} AS DOUBLE) / nn"
        f" - (CAST(s_{f} AS DOUBLE) / nn) * (CAST(s_{f} AS DOUBLE) / nn),"
        f" 1e-12)), 6) AS d_{f}"
        for f in feats
    )
    z_cols = ", ".join(
        f"round((r.{f} - st.m_{f}) / greatest(st.d_{f}, 1e-6), 6) AS {f}"
        for f in feats
    )

    def margin(w: str) -> str:
        # left-associated like the Spark Column fold in _margin
        z = f"{w}.b0"
        for j, f in enumerate(feats, start=1):
            z = f"({z} + {w}.b{j} * {f})"
        return z

    steps = []
    for i in range(_ITERS):
        p = f"1.0 / (1.0 + exp(-{margin('w')}))"
        gsum = ", ".join(
            ["sum(CAST(round(err, 9) AS DECIMAL(38,12))) AS g0"]
            + [
                f"sum(CAST(round(err * {f}, 9) AS DECIMAL(38,12))) AS g{j}"
                for j, f in enumerate(feats, start=1)
            ]
        )
        upd = ", ".join(
            f"round(w.b{j} - {_LR} * CAST(g.g{j} AS DOUBLE) / st.nn, 9)"
            f" AS b{j}"
            for j in range(len(feats) + 1)
        )
        steps.append(
            f"""g_{i} AS MATERIALIZED (
        SELECT {gsum} FROM (
            SELECT {p} - CAST(y AS DOUBLE) AS err, {', '.join(feats)}
            FROM feats CROSS JOIN w_{i} w
        )
    ), w_{i + 1} AS MATERIALIZED (
        SELECT {upd} FROM w_{i} w, g_{i} g, st
    )"""
        )
    w0 = ", ".join(f"0.0 AS b{j}" for j in range(len(feats) + 1))
    score = f"round(1.0 / (1.0 + exp(-{margin('w')})), 6)"
    return f"""
    WITH raw AS MATERIALIZED (
        SELECT doc_id,
               CASE WHEN source IN ({refs}) THEN 1 ELSE 0 END AS y,
               round(ln(1 + CAST(len(string_split(trim(text), ' '))
                                 AS DOUBLE)), 6) AS f1,
               round(CAST(len(list_distinct(string_split(trim(text), ' ')))
                          AS DOUBLE)
                     / greatest(CAST(len(string_split(trim(text), ' '))
                                     AS DOUBLE), 1.0), 6) AS f2,
               round(CAST(length(text) AS DOUBLE)
                     / greatest(CAST(len(string_split(trim(text), ' '))
                                     AS DOUBLE), 1.0), 6) AS f3,
               round((CAST(length(text) AS DOUBLE)
                      - length(regexp_replace(text, '[0-9]', '', 'g')))
                     / greatest(CAST(length(text) AS DOUBLE), 1.0), 6) AS f4,
               round(CAST(len(string_split(trim(text), ' ')) AS DOUBLE)
                     / greatest(CAST(len(regexp_split_to_array(text,
                                         '[.!?]')) AS DOUBLE), 1.0), 6) AS f5
        FROM documents
    ), agg AS (
        SELECT count(*) AS n, {mom} FROM raw
    ), st AS (
        SELECT greatest(n, 1) AS nn, {st_cols}
        FROM (SELECT *, CAST(greatest(n, 1) AS DOUBLE) AS nn0 FROM agg)
    ), feats AS MATERIALIZED (
        SELECT doc_id, y, {z_cols} FROM raw r CROSS JOIN st
    ), w_0 AS MATERIALIZED (
        SELECT {w0}
    ), {', '.join(steps)}
    SELECT doc_id, {score} AS score, {score} >= 0.5 AS ref_like
    FROM feats CROSS JOIN w_{_ITERS} w
    """


@query(
    "text_quality_classifier",
    oracle=_classifier_oracle,
    tags=("text", "quality", "classifier"),
)
def text_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-vs-rest quality classifier: train on (source in
    ``_REF_SOURCES``) labels over deterministic text features, score
    every document — (doc_id, score, ref_like). The keep rule a
    GPT-3-style pipeline applies downstream is ``ref_like`` (or a
    noisy threshold on ``score``); here both ride the row so the
    caller chooses."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source", "text")
    # ONE text scan: the raw feature frame feeds the standardization
    # aggregate, the training passes, and the final scoring select —
    # without the checkpoint each would re-run the documents scan +
    # feature projection (review finding r9)
    feat_raw = doc_features(d).localCheckpoint(eager=True)
    feat, _ = _standardize(feat_raw)
    labeled = feat.join(d.select("doc_id", "source"), "doc_id").withColumn(
        "y", F.col("source").isin(*_REF_SOURCES).cast("int")
    )
    w = logreg_fit(labeled)
    score = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-_margin(w))), 6
    )
    return feat.select(
        "doc_id",
        score.alias("score"),
        (score >= F.lit(0.5)).alias("ref_like"),
    )


def _clf_calibration_oracle() -> str:
    """Calibration-bin replica (staged for r15): the full training
    chain nested as a CTE (DuckDB allows a WITH inside a CTE body),
    then decile bins over the 6-dp score. Exactness: the score is
    6-dp-rounded, so score×10⁶ rounds to an EXACT bigint — the bin,
    the per-bin sum, and both divisions are exact-int arithmetic with
    deterministic IEEE division, never an order-dependent double
    sum."""
    refs = ", ".join(f"'{s}'" for s in _REF_SOURCES)
    return f"""
    WITH pred AS ({_classifier_oracle()}),
    lab AS (
        SELECT p.doc_id,
               CAST(round(p.score * 1000000) AS BIGINT) AS micro,
               CAST(d.source IN ({refs}) AS INT) AS y
        FROM pred p JOIN documents d USING (doc_id)
    )
    SELECT least(micro // 100000, 9) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(y) AS BIGINT) AS n_ref,
           CAST(sum(micro) AS DOUBLE) / count(*) / 1000000 AS mean_score,
           CAST(sum(y) AS DOUBLE) / count(*) AS ref_rate
    FROM lab
    GROUP BY least(micro // 100000, 9)
    """


# Registered in r15 from the staged gate (dual-scale oracle-proven in
# r14).
@query(
    "clf_calibration_bins",
    oracle=lambda: _clf_calibration_oracle(),
    tags=("text", "quality", "classifier", "calibration"),
)
def clf_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier CALIBRATION REPORT — the reliability table an ML-ops
    review reads before trusting a quality filter at 100 TB: per score
    decile, how many documents landed there, the mean predicted score,
    and the OBSERVED reference rate. A well-calibrated filter shows
    ref_rate tracking mean_score; divergence says the threshold the
    curation pipeline applies (``ref_like``) doesn't mean what it
    claims. Composes the registered classifier chain (one run) with a
    10-row aggregation; all arithmetic is exact-integer (the 6-dp
    score lifts to an exact micro-integer) so the oracle matches
    bit-for-bit."""
    d = load(spark, sf_dir, "documents").select("doc_id", "source")
    pred = text_quality_classifier(spark, sf_dir)
    micro = F.round(F.col("score") * 1000000).cast("bigint")
    lab = (
        pred.join(d, "doc_id")
        .select(
            micro.alias("micro"),
            F.col("source").isin(*_REF_SOURCES).cast("int").alias("y"),
        )
        .withColumn("bin", F.least(F.expr("micro div 100000"), F.lit(9)))
    )
    n = F.count(F.lit(1))
    return lab.groupBy("bin").agg(
        n.cast("bigint").alias("n_docs"),
        F.sum("y").cast("bigint").alias("n_ref"),
        (F.sum("micro").cast("double") / n / F.lit(1000000)).alias(
            "mean_score"
        ),
        (F.sum("y").cast("double") / n).alias("ref_rate"),
    )
