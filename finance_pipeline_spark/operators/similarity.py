"""Similarity search over the ``embeddings`` table — brute-force cosine
top-k as the exact baseline, plus a sign-random-projection LSH variant
as the scale path.

Scale design: brute force is a broadcast nested-loop (queries broadcast
to every corpus partition — correct and linear in corpus size, the
right *exact* plan even at 100 TB when |queries| is small). The LSH
variant hashes both sides into Hamming-ball buckets so the candidate
join touches a tiny corpus fraction; recall is tested against the
brute-force baseline in tests/test_similarity.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query

_DIM = 64


def dot(x: Column, y: Column) -> Column:
    """Sequential-order dot product via zip_with + aggregate (JVM-side)."""
    return F.aggregate(
        F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2norm(x: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(x, lambda p: p.cast("double") * p.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


_DUCK_COS = """
round(
  list_sum([CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)
            FOR i IN range(1, {dim} + 1)]) /
  (sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN q.embedding])) *
   sqrt(list_sum([CAST(x AS DOUBLE) * CAST(x AS DOUBLE) FOR x IN c.embedding]))),
  4)
""".format(dim=_DIM)


@query(
    "ann_cosine_topk",
    oracle=f"""
    WITH scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               {_DUCK_COS} AS cosine
        FROM (SELECT * FROM embeddings WHERE vec_id % 100 = 0) q
        JOIN embeddings c ON c.vec_id <> q.vec_id
    ), ranked AS (
        SELECT query_id, corpus_id, cosine,
               CAST(row_number() OVER (PARTITION BY query_id
                     ORDER BY cosine DESC, corpus_id) AS BIGINT) AS rnk
        FROM scored
    )
    SELECT query_id, corpus_id, cosine, rnk FROM ranked WHERE rnk <= 10
    """,
    tags=("similarity", "ann"),
    bench=True,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 per query — the exact ANN baseline.
    Query set (1% of vectors) broadcasts; scoring is a map-only pass
    over the corpus; per-query top-k via row_number (WindowGroupLimit
    keeps k rows per partition before the shuffle). Ranking uses the
    4-dp rounded score with corpus_id tie-break so ordering is
    engine-stable."""
    e = load(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    c = e.select(F.col("vec_id").alias("corpus_id"), F.col("embedding").alias("c_emb"))
    cos = F.round(
        dot(F.col("q_emb"), F.col("c_emb"))
        / (l2norm(F.col("q_emb")) * l2norm(F.col("c_emb"))),
        4,
    )
    scored = (
        c.join(F.broadcast(q), F.col("corpus_id") != F.col("query_id"))
        .select("query_id", "corpus_id", cos.alias("cosine"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
    )


# --- sign-random-projection LSH ----------------------------------------------
# Deterministic pseudo-random hyperplanes: plane p, dim d weight derived
# from a splitmix-style integer mix of (p, d) — reproducible without any
# stored model, cheap to regenerate on every executor.


def _mix(p: int, d: int) -> float:
    x = (p * 0x9E3779B97F4A7C15 + d * 0xBF58476D1CE4E5B9) & 0xFFFFFFFFFFFFFFFF
    x = ((x ^ (x >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
    x ^= x >> 31
    return ((x & 0xFFFFFFFF) / 0x7FFFFFFF) - 1.0  # ~U[-1, 1]


_N_PLANES = 16
_PLANES: list[list[float]] = [
    [_mix(p, d) for d in range(_DIM)] for p in range(_N_PLANES)
]


def srp_signature(emb: Column) -> Column:
    """16-bit sign-random-projection signature as an int: bit p = sign
    of ⟨emb, plane_p⟩. Planes are inlined literal arrays — Catalyst
    constant-folds them; no model state, no shuffle."""
    bits = []
    for p, plane in enumerate(_PLANES):
        proj = F.aggregate(
            F.zip_with(
                emb,
                F.array(*[F.lit(w) for w in plane]),
                lambda x, w: x.cast("double") * w,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(proj > 0, F.lit(1 << p).cast("bigint")).otherwise(F.lit(0).cast("bigint")))
    sig = bits[0]
    for b in bits[1:]:
        sig = sig.bitwiseOR(b)
    return sig


@query(
    "ann_lsh_topk",
    oracle=None,  # hyperplane hashing isn't portable SQL — recall vs the
    # brute-force baseline is asserted in tests/test_similarity.py.
    tags=("similarity", "ann", "lsh"),
)
def ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH-bucketed approximate cosine top-k: 16-bit SRP signatures,
    4×4-bit band blocking (bucket join instead of cross product), exact
    cosine re-rank within candidates. The corpus-side signature is a
    map-only pass; the candidate join shuffles on the band key — the
    100 TB plan, since bucket sizes stay bounded."""
    e = load(spark, sf_dir, "embeddings")
    signed = e.select("vec_id", "embedding", srp_signature(F.col("embedding")).alias("sig"))
    banded = signed.select(
        "vec_id",
        "embedding",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("sig", 4 * i).bitwiseAND(F.lit(0xF)).alias("bkey"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("vec_id", "embedding", F.col("bk.band").alias("band"), F.col("bk.bkey").alias("bkey"))
    q = banded.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
        "band",
        "bkey",
    )
    c = banded.select(
        F.col("vec_id").alias("corpus_id"),
        F.col("embedding").alias("c_emb"),
        "band",
        "bkey",
    )
    cand = (
        c.join(F.broadcast(q), on=["band", "bkey"])
        .filter(F.col("corpus_id") != F.col("query_id"))
        .dropDuplicates(["query_id", "corpus_id"])
    )
    cos = F.round(
        dot(F.col("q_emb"), F.col("c_emb"))
        / (l2norm(F.col("q_emb")) * l2norm(F.col("c_emb"))),
        4,
    )
    w = W.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col("corpus_id"))
    return (
        cand.select("query_id", "corpus_id", cos.alias("cosine"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 10)
    )
