"""Deduplication family over ``documents`` / ``embeddings`` — exact,
MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Scale design (the whole point of these): never go O(n²) on the corpus.
Every fuzzy variant blocks candidates first — LSH band buckets
(MinHash), band-sliced hamming buckets (SimHash), cheap blocking keys
(Jaccard) — and verifies only within buckets. On 100 TB the candidate
join is the cost center; the band/bucket key is the shuffle key, and
skewed buckets (boilerplate docs) are handled by AQE skew-join plus a
bucket-size cap.

MinHash/SimHash signatures use xxhash64, which DuckDB does not provide,
so those two are rows-only for the driver oracle and get planted-dup
assertions in tests/test_dedup.py instead; the exact / Jaccard / cosine
variants carry full SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query

# --- shared shingling -------------------------------------------------------


def _tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(col))), " ", -1)


def _word_shingles(n: int = 3, col: str = "text") -> Column:
    """Distinct word n-gram shingles, empty array for short docs."""
    toks = _tokens(col)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
    )
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(0), F.size(toks) - n), gram)),
    ).otherwise(F.array().cast("array<string>"))


# --- exact ------------------------------------------------------------------


@query(
    "dedup_exact",
    oracle="""
    SELECT min(doc_id) AS canonical_id,
           count(*) AS n_copies,
           min(n_chars) AS n_chars
    FROM documents
    GROUP BY text
    """,
    tags=("dedup",),
    bench=True,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup with canonical-representative pick — hash groupBy on
    the full text, min(doc_id) as the deterministic survivor. The
    production form hashes the text first (group on sha2 digest, 32
    bytes instead of whole documents through the shuffle) — see
    ``dedup_exact_by_digest``."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy("text").agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.min("n_chars").alias("n_chars"),
    ).drop("text")


@query(
    "dedup_exact_by_digest",
    oracle="""
    SELECT sha256(text) AS digest,
           min(doc_id) AS canonical_id,
           count(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    tags=("dedup",),
)
def dedup_exact_by_digest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup keyed on the SHA-256 content digest — at 100 TB the
    shuffle moves 32-byte digests, not document bodies; collision
    probability is negligible (2⁻¹²⁸ scale)."""
    d = load(spark, sf_dir, "documents")
    return d.groupBy(F.sha2(F.encode("text", "UTF-8"), 256).alias("digest")).agg(
        F.min("doc_id").alias("canonical_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


# --- MinHash + LSH ----------------------------------------------------------

_MINHASH_PERMS = 32
_LSH_BANDS = 8  # 8 bands × 4 rows
_ROWS_PER_BAND = _MINHASH_PERMS // _LSH_BANDS
_MERSENNE = (1 << 61) - 1
# Fixed affine permutation parameters (deterministic, engine-local).
_PERM_A = [2 * i + 1 for i in range(1, _MINHASH_PERMS + 1)]
_PERM_B = [7919 * i + 104729 for i in range(_MINHASH_PERMS)]


def _perm_fn(a: int, b: int):
    def fn(h: Column) -> Column:
        return F.pmod(F.lit(a).cast("bigint") * h + F.lit(b), F.lit(_MERSENNE))

    return fn


def minhash_signature(shingles: Column) -> Column:
    """32-perm MinHash signature: one xxhash64 per shingle, then
    min((a·h + b) mod M) per permutation — all JVM-side array ops, no
    UDFs, linear in shingle count."""
    base = F.transform(shingles, lambda s: F.xxhash64(s))
    return F.array(
        *[
            F.array_min(F.transform(base, _perm_fn(a, b)))
            for a, b in zip(_PERM_A, _PERM_B)
        ]
    )


def lsh_band_keys(sig: Column) -> Column:
    """Band the signature: hash each 4-row slice into one bucket key."""
    return F.array(
        *[
            F.xxhash64(
                F.lit(band),
                F.concat_ws(
                    ",", *[sig.getItem(band * _ROWS_PER_BAND + r).cast("string") for r in range(_ROWS_PER_BAND)]
                ),
            )
            for band in range(_LSH_BANDS)
        ]
    )


@query(
    "dedup_minhash_lsh",
    oracle=None,  # xxhash64 isn't portable SQL — rows-only; tests plant near-dups.
    tags=("dedup", "lsh"),
    bench=True,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH near-dup pairs: shingle → 32-perm signature
    → 8 band buckets → same-bucket candidate join → exact Jaccard
    verify ≥ 0.5. Candidate generation is the only shuffle (on the band
    key); verification touches candidate pairs, never the n² cross."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", _word_shingles(3).alias("shingles")
    ).filter(F.size("shingles") > 0)
    sig = d.select(
        "doc_id",
        "shingles",
        lsh_band_keys(minhash_signature(F.col("shingles"))).alias("bands"),
    )
    exploded = sig.select(
        "doc_id", "shingles", F.explode("bands").alias("band_key")
    )
    left = exploded.alias("a")
    right = exploded.alias("b")
    cand = (
        left.join(right, (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.col("a.shingles").alias("sh_a"),
            F.col("b.shingles").alias("sh_b"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_union("sh_a", "sh_b")).cast("double")
    return (
        cand.withColumn("jaccard", F.round(inter / union, 4))
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


# --- SimHash ----------------------------------------------------------------


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash: per-token xxhash64; each output bit is the sign
    of the sum of ±1 votes across tokens. Expressed as 64 aggregate
    folds over the token-hash array — JVM-side, no UDF."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))

    def _bit_vote(i: int):
        def fn(acc: Column, h: Column) -> Column:
            return acc + F.when(
                F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)

        return fn

    def bit(i: int) -> Column:
        return F.aggregate(hashes, F.lit(0).cast("bigint"), _bit_vote(i))
    return F.aggregate(
        F.array(
            *[
                F.when(bit(i) > 0, F.shiftleft(F.lit(1).cast("bigint"), i)).otherwise(
                    F.lit(0).cast("bigint")
                )
                for i in range(64)
            ]
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc.bitwiseOR(x),
    )


@query(
    "dedup_simhash",
    oracle=None,  # xxhash64-based — rows-only; hamming property asserted in tests.
    tags=("dedup", "simhash"),
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: 64-bit signature, 4×16-bit band blocking
    (hamming ≤ 3 ⇒ at least one identical 16-bit band by pigeonhole),
    verify with bit_count(xor) ≤ 3 inside buckets only."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", simhash64(F.array_distinct(_tokens())).alias("sh")
    )
    banded = d.select(
        "doc_id",
        "sh",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftright("sh", 16 * i).bitwiseAND(F.lit(0xFFFF)).alias("bkey"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("bk"),
    ).select("doc_id", "sh", "bk.band", "bk.bkey")
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bkey") == F.col("b.bkey"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.sh").bitwiseXOR(F.col("b.sh"))).alias("hamming"),
        )
        .dropDuplicates(["doc_a", "doc_b"])
        .filter(F.col("hamming") <= 3)
    )
    return pairs


# --- n-gram Jaccard (oracle-checked) ----------------------------------------


@query(
    "dedup_ngram_jaccard",
    oracle="""
    WITH sh AS (
        SELECT doc_id, lang,
               CAST(len(string_split(trim(lower(text)), ' ')) / 32 AS INTEGER) AS len_bucket,
               list_distinct(
                 [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                  FOR i IN range(1, greatest(len(t) - 1, 1))]
               ) AS shingles
        FROM (SELECT doc_id, lang, text, string_split(trim(lower(text)), ' ') AS t
              FROM documents)
        WHERE len(t) >= 3
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.shingles, b.shingles))), 4) AS jaccard
    FROM sh a JOIN sh b
      ON a.lang = b.lang AND a.len_bucket = b.len_bucket AND a.doc_id < b.doc_id
    WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / len(list_distinct(list_concat(a.shingles, b.shingles))) >= 0.2
    """,
    tags=("dedup", "jaccard"),
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocked n-gram Jaccard near-dup pairs — trigram shingle sets,
    candidate blocking on (lang, length-bucket) so the self-join is
    per-block not global, exact Jaccard ≥ 0.2 verify. SQL-expressible
    end to end, so this one carries the oracle for the whole fuzzy
    family."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    sh = (
        d.filter(F.size(toks) >= 3)
        .select(
            "doc_id",
            "lang",
            (F.size(toks) / F.lit(32)).cast("int").alias("len_bucket"),
            _word_shingles(3).alias("shingles"),
        )
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect("a.shingles", "b.shingles")).cast("double")
    union = F.size(F.array_union("a.shingles", "b.shingles")).cast("double")
    jac = inter / union
    return (
        a.join(
            b,
            (F.col("a.lang") == F.col("b.lang"))
            & (F.col("a.len_bucket") == F.col("b.len_bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .filter(jac >= 0.2)
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.round(jac, 4).alias("jaccard"),
        )
    )


# --- embedding cosine near-dup (oracle-checked) ------------------------------


@query(
    "dedup_embedding_cosine",
    oracle="""
    WITH v AS (
        SELECT vec_id, label, embedding FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
           round(
             list_sum([CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
                       FOR x IN list_zip(a.embedding, b.embedding)]) /
             (sqrt(list_sum([CAST(y AS DOUBLE) * CAST(y AS DOUBLE) FOR y IN a.embedding])) *
              sqrt(list_sum([CAST(z AS DOUBLE) * CAST(z AS DOUBLE) FOR z IN b.embedding]))),
             4) AS cosine
    FROM v a JOIN v b ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(
             list_sum([CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)
                       FOR x IN list_zip(a.embedding, b.embedding)]) /
             (sqrt(list_sum([CAST(y AS DOUBLE) * CAST(y AS DOUBLE) FOR y IN a.embedding])) *
              sqrt(list_sum([CAST(z AS DOUBLE) * CAST(z AS DOUBLE) FOR z IN b.embedding]))),
             4) >= 0.5
    """,
    tags=("dedup", "embedding"),
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs — label-blocked (cluster id as
    the blocking key, the IVF idea), exact cosine via zip_with dot
    product, threshold 0.5. The sampled subset (vec_id % 10 = 0) keeps
    the verify join quadratic only within tiny blocks."""
    e = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") % 10 == 0)
        .select("vec_id", "label", "embedding")
    )
    a, b = e.alias("a"), e.alias("b")

    def dot(x: Column, y: Column) -> Column:
        return F.aggregate(
            F.zip_with(x, y, lambda p, q: p.cast("double") * q.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    def norm(x: Column) -> Column:
        return F.sqrt(
            F.aggregate(
                F.transform(x, lambda p: p.cast("double") * p.cast("double")),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )

    cos = F.round(
        dot(F.col("a.embedding"), F.col("b.embedding"))
        / (norm(F.col("a.embedding")) * norm(F.col("b.embedding"))),
        4,
    )
    return (
        a.join(b, (F.col("a.label") == F.col("b.label")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .withColumn("cosine", cos)
        .filter(F.col("cosine") >= 0.5)
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            "cosine",
        )
    )
