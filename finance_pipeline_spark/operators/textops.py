"""Text analysis over the ``documents`` table — training-data-pipeline
operators (language ID, quality scoring, token counting, document
fingerprinting). All four stay entirely JVM-side: built-in string/array
functions inside whole-stage codegen, no Python UDFs, so they scale to
100 TB as embarrassingly-parallel map work (no shuffle at all).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from finance_pipeline_spark.registry import load, query

# Tiny per-language marker lexicons for the n-gram/stopword language-ID
# heuristic. Deterministic and shared verbatim with the SQL oracle.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "fr": ("le", "la", "les", "et", "est"),
    "es": ("el", "los", "las", "y", "es"),
    "zh": ("de5", "shi4", "le5", "zai4", "he2"),
}


def _tokens(col: str = "text") -> Column:
    return F.split(F.trim(F.lower(F.col(col))), " ", -1)


def _sql_tokens(col: str = "text") -> str:
    return f"string_split(trim(lower({col})), ' ')"


@query(
    "text_token_count",
    oracle=lambda: f"""
    SELECT doc_id,
           CAST(len({_sql_tokens()}) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct({_sql_tokens()})) AS BIGINT) AS n_unique_tokens,
           CAST(length(text) AS BIGINT) AS n_chars_actual
    FROM documents
    """,
    tags=("text",),
    bench=True,
)
def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token counting + unique-token cardinality — the
    cheap-and-cacheable size statistics every corpus pipeline needs."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("bigint").alias("n_unique_tokens"),
        F.length("text").cast("bigint").alias("n_chars_actual"),
    )


_REGEX_TOK = r"[a-z]+|[0-9]+|[^a-z0-9\s]+"  # the lookahead-free core of
# the GPT-2 pre-tokenizer: letter runs, digit runs, symbol runs. The
# three branches are DISJOINT character classes, so Java-regex (Spark)
# and RE2 (DuckDB) produce identical matches even though their
# alternation strategies differ — and RE2 has no lookahead, so the
# paper pattern's contraction clauses ('s, 't, …) are deliberately out
# of scope; they'd silently diverge. Input is lowercased first, the
# BPE trainer's normalization.


# Registered in r15 from the staged gate (dual-scale oracle-proven in
# r14): the brief's second token counter — "BPE-ish regex" next to the
# whitespace one — giving tokens-per-word fertility a pre-BPE
# denominator.
@query(
    "text_regex_token_count",
    oracle=lambda: _regex_token_oracle(),
    tags=("text", "tokens"),
)
def text_regex_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex (GPT-2-style pre-tokenizer) token counting next to the
    whitespace counter: letter/digit/symbol runs over the lowercased
    text, per-class counts, and the regex/whitespace ratio as an exact
    integer permille (how much the pre-tokenizer fragments the corpus
    before any merges — the number that sizes a BPE training run).

    Exactness: counts are bigints from identical regex matches (see
    ``_REGEX_TOK`` for why the pattern is engine-safe); the ratio is
    integer division. Scale shape: pure map work on the scan — no
    shuffle, no Python, whole-stage codegen end to end."""
    d = load(spark, sf_dir, "documents")
    low = F.lower(F.coalesce("text", F.lit("")))
    # patterns stay Python-side Column literals — embedding them in a
    # SQL expr string would hit Spark's backslash-escaping of '\s'
    all_runs = F.regexp_extract_all(low, F.lit(_REGEX_TOK), F.lit(0))
    alpha = F.regexp_extract_all(low, F.lit("[a-z]+"), F.lit(0))
    digit = F.regexp_extract_all(low, F.lit("[0-9]+"), F.lit(0))
    ws = F.size(F.split(F.trim(low), " ", -1)).cast("bigint")
    return d.select(
        "doc_id",
        ws.alias("n_ws_tokens"),
        F.size(all_runs).cast("bigint").alias("n_regex_tokens"),
        F.size(alpha).cast("bigint").alias("n_alpha_runs"),
        F.size(digit).cast("bigint").alias("n_digit_runs"),
        (F.size(all_runs).cast("bigint") - F.size(alpha) - F.size(digit))
        .cast("bigint")
        .alias("n_symbol_runs"),
    ).withColumn(
        "frag_permille",
        F.expr("(n_regex_tokens * 1000) div n_ws_tokens"),
    )


def _regex_token_oracle() -> str:
    """DuckDB replica of ``text_regex_token_count`` — same RE2/Java-
    safe pattern, same integer arithmetic. Standard-SQL single-quoted
    literals do NOT escape backslashes, so the pattern embeds
    verbatim ('\\s' reaches RE2 as backslash-s)."""
    pat = _REGEX_TOK
    return f"""
    WITH t AS (
        SELECT doc_id, lower(coalesce(text, '')) AS low FROM documents
    )
    SELECT doc_id,
           CAST(len(string_split(trim(low), ' ')) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(low, '{pat}')) AS BIGINT)
               AS n_regex_tokens,
           CAST(len(regexp_extract_all(low, '[a-z]+')) AS BIGINT)
               AS n_alpha_runs,
           CAST(len(regexp_extract_all(low, '[0-9]+')) AS BIGINT)
               AS n_digit_runs,
           CAST(len(regexp_extract_all(low, '{pat}'))
                - len(regexp_extract_all(low, '[a-z]+'))
                - len(regexp_extract_all(low, '[0-9]+')) AS BIGINT)
               AS n_symbol_runs,
           CAST(len(regexp_extract_all(low, '{pat}')) AS BIGINT) * 1000
               // len(string_split(trim(low), ' ')) AS frag_permille
    FROM t
    """


@query(
    "text_quality_score",
    oracle=lambda: f"""
    WITH t AS (
        SELECT doc_id,
               CAST(length(text) AS DOUBLE) AS n_chars_actual,
               CAST(len({_sql_tokens()}) AS DOUBLE) AS n_tokens,
               CAST(len(list_distinct({_sql_tokens()})) AS DOUBLE) AS n_unique
        FROM documents
    )
    SELECT doc_id,
           round(n_chars_actual / n_tokens, 4) AS avg_token_len,
           round(n_unique / n_tokens, 4) AS ttr,
           round(least(n_tokens / 100.0, 1.0) * (n_unique / n_tokens), 4) AS quality
    FROM t
    """,
    tags=("text",),
)
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic quality scoring — length-normalized type/token ratio,
    the C4/Gopher-style cheap filter family: avg token length, TTR, and
    a combined [0,1] score (short docs down-weighted)."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("double")
    n_unique = F.size(F.array_distinct(toks)).cast("double")
    n_chars = F.length("text").cast("double")
    ttr = n_unique / n_tokens
    return d.select(
        "doc_id",
        F.round(n_chars / n_tokens, 4).alias("avg_token_len"),
        F.round(ttr, 4).alias("ttr"),
        F.round(F.least(n_tokens / 100.0, F.lit(1.0)) * ttr, 4).alias("quality"),
    )


@query(
    "text_quality_prune",
    oracle=lambda: f"""
    WITH scored AS (
        SELECT doc_id, lang,
               round(least(CAST(len({_sql_tokens()}) AS DOUBLE) / 100.0, 1.0)
                     * (CAST(len(list_distinct({_sql_tokens()})) AS DOUBLE)
                        / CAST(len({_sql_tokens()}) AS DOUBLE)), 4) AS quality
        FROM documents
    ), counts AS (
        SELECT lang, quality, count(*) AS n FROM scored GROUP BY lang, quality
    ), cum AS (
        SELECT lang, quality,
               sum(n) OVER (PARTITION BY lang ORDER BY quality) AS cum_n,
               sum(n) OVER (PARTITION BY lang) AS tot
        FROM counts
    ), thresh AS (
        SELECT lang, min(quality) AS q_thresh
        FROM cum WHERE cum_n >= (tot + 9) // 10
        GROUP BY lang
    )
    SELECT s.doc_id, s.lang, s.quality, s.quality >= t.q_thresh AS kept
    FROM scored s JOIN thresh t ON s.lang = t.lang
    """,
    tags=("text", "quality"),
)
def text_quality_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language bottom-decile quality pruning — drop each
    language's worst 10% by the ``text_quality_score`` heuristic, the
    percentile-threshold curation step (CCNet/Gopher style) that keeps
    per-language score scales comparable.

    EXACT percentile, but never the obvious plan: ``percent_rank()
    OVER (PARTITION BY lang ...)`` funnels each entire language through
    one reducer — with ~10 languages on a 100 TB corpus that's 10
    reducers doing all the work. The scores are discretized (4-dp
    round), so the exact threshold comes from the score HISTOGRAM
    instead: groupBy (lang, quality) counts — map-side combinable, one
    shuffle bounded by langs × distinct scores (≤10⁴ rows/lang
    regardless of corpus size) — then cumulative counts and the
    ceil(10%)-rank cut on that tiny table, and a broadcast threshold
    join back. The 10% rank uses integer arithmetic ((tot+9) div 10) —
    no float-boundary drift between engines. Ties at the threshold
    keep (>=): deterministic and side-free."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("double")
    n_unique = F.size(F.array_distinct(toks)).cast("double")
    quality = F.round(
        F.least(n_tokens / 100.0, F.lit(1.0)) * (n_unique / n_tokens), 4
    )
    scored = d.select("doc_id", "lang", quality.alias("quality"))

    from pyspark.sql import Window as W

    counts = scored.groupBy("lang", "quality").agg(F.count(F.lit(1)).alias("n"))
    wcum = W.partitionBy("lang").orderBy("quality").rowsBetween(
        W.unboundedPreceding, 0
    )
    wtot = W.partitionBy("lang")
    cum = counts.select(
        "lang",
        "quality",
        F.sum("n").over(wcum).alias("cum_n"),
        F.sum("n").over(wtot).alias("tot"),
    )
    thresh = (
        cum.filter(F.col("cum_n") >= F.expr("(tot + 9) div 10"))
        .groupBy("lang")
        .agg(F.min("quality").alias("q_thresh"))
    )
    return scored.join(F.broadcast(thresh), "lang").select(
        "doc_id",
        "lang",
        "quality",
        (F.col("quality") >= F.col("q_thresh")).alias("kept"),
    )


def _marker_hits_spark(lang: str) -> Column:
    markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
    return F.size(F.array_intersect(F.array_distinct(_tokens()), markers))


def _marker_hits_sql(lang: str) -> str:
    arr = ", ".join(f"'{m}'" for m in LANG_MARKERS[lang])
    return f"len(list_intersect(list_distinct({_sql_tokens('text')}), [{arr}]))"


@query(
    "text_langid",
    oracle=lambda: f"""
    WITH h AS (
        SELECT doc_id, lang,
               {_marker_hits_sql('en')} AS h_en,
               {_marker_hits_sql('de')} AS h_de,
               {_marker_hits_sql('fr')} AS h_fr,
               {_marker_hits_sql('es')} AS h_es,
               {_marker_hits_sql('zh')} AS h_zh
        FROM documents
    )
    SELECT doc_id, lang,
           CASE
             WHEN h_en >= h_de AND h_en >= h_fr AND h_en >= h_es AND h_en >= h_zh THEN 'en'
             WHEN h_de >= h_fr AND h_de >= h_es AND h_de >= h_zh THEN 'de'
             WHEN h_fr >= h_es AND h_fr >= h_zh THEN 'fr'
             WHEN h_es >= h_zh THEN 'es'
             ELSE 'zh'
           END AS detected_lang
    FROM h
    """,
    tags=("text", "langid"),
)
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language identification by marker-token voting — the classic
    stopword-hit heuristic (a stand-in for char-n-gram models like
    CLD/fastText, which aren't in this container). Ties break by a
    fixed language priority so the result is deterministic."""
    d = load(spark, sf_dir, "documents")
    hits = {lang: _marker_hits_spark(lang) for lang in LANG_MARKERS}
    detected = (
        F.when(
            (hits["en"] >= hits["de"])
            & (hits["en"] >= hits["fr"])
            & (hits["en"] >= hits["es"])
            & (hits["en"] >= hits["zh"]),
            "en",
        )
        .when(
            (hits["de"] >= hits["fr"]) & (hits["de"] >= hits["es"]) & (hits["de"] >= hits["zh"]),
            "de",
        )
        .when((hits["fr"] >= hits["es"]) & (hits["fr"] >= hits["zh"]), "fr")
        .when(hits["es"] >= hits["zh"], "es")
        .otherwise("zh")
    )
    return d.select("doc_id", "lang", detected.alias("detected_lang"))


# Rolling-hash fingerprint parameters (shared with the SQL oracle).
_FP_MOD = 1_000_000_007
_FP_MULT = 131


@query(
    "text_fingerprint",
    oracle=lambda: f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({_sql_tokens()},
                 t -> CAST(length(t) * {_FP_MULT} + ascii(t) AS BIGINT))),
             (acc, x) -> (acc * {_FP_MULT} + x) % {_FP_MOD}
           ) AS fingerprint
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting — polynomial rolling hash over the token
    stream (Rabin-Karp family), folded with ``F.aggregate``: order-
    sensitive (unlike a bag-of-words hash) yet engine-portable because
    it uses only length/ascii/mod arithmetic."""
    d = load(spark, sf_dir, "documents")
    tok_vals = F.transform(
        _tokens(),
        lambda t: (F.length(t) * _FP_MULT + F.ascii(t)).cast("bigint"),
    )
    fp = F.aggregate(
        tok_vals,
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * _FP_MULT + x) % _FP_MOD,
    )
    return d.select("doc_id", fp.alias("fingerprint"))


@query(
    "text_ngram_profile",
    oracle=lambda: f"""
    SELECT doc_id,
           CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_trigrams,
           CAST(len(list_distinct(
             [t[i] || ' ' || t[i+1] || ' ' || t[i+2]
              FOR i IN range(1, greatest(len(t) - 1, 1))]
           )) AS BIGINT) AS n_unique_trigrams
    FROM (SELECT doc_id, {_sql_tokens()} AS t FROM documents)
    """,
    tags=("text", "ngram"),
)
def text_ngram_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-trigram shingle profile — the shingling primitive under
    MinHash/Jaccard dedup, as its own cardinality query."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    tri_at = lambda i: F.concat_ws(  # noqa: E731
        " ", F.element_at(toks, i + 1), F.element_at(toks, i + 2), F.element_at(toks, i + 3)
    )
    tris = F.when(
        F.size(toks) >= 3,
        F.transform(F.sequence(F.lit(0), F.size(toks) - 3), tri_at),
    ).otherwise(F.array().cast("array<string>"))
    return d.select(
        "doc_id",
        F.greatest(F.size(toks) - 2, F.lit(0)).cast("bigint").alias("n_trigrams"),
        F.size(F.array_distinct(tris)).cast("bigint").alias("n_unique_trigrams"),
    )


# BPE-ish pre-tokenization pattern — letter runs, digit runs, single
# other-symbols (the shape GPT-2-style pre-tokenizers split on),
# restricted to constructs RE2 (DuckDB) and Java regex share.
_BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "text_bpe_token_count",
    oracle=lambda: f"""
    SELECT doc_id,
           CAST(len({_sql_tokens()}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS BIGINT)
             AS n_bpe_tokens
    FROM documents
    """,
    tags=("text", "tokens"),
)
def text_bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace vs BPE-style pre-tokenization counts side by side —
    the training-budget estimator (BPE token count tracks model cost;
    whitespace count tracks corpus stats). Pure regex map work, no
    shuffle, identical pattern semantics on both engines."""
    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_ws_tokens"),
        F.size(F.regexp_extract_all("text", F.lit(_BPE_PATTERN), F.lit(0)))
        .cast("bigint")
        .alias("n_bpe_tokens"),
    )


def _bpe_encode_cte() -> str:
    """The shared DuckDB CTE chain replaying GREEDY lowest-rank-first
    BPE under the frozen merge table — a recursive CTE that performs
    exactly one merge per step (the lowest-rank pair present, leftmost
    on ties), precisely ``encode_word``'s loop. An earlier draft used
    nested single-pass ``replace()`` per merge (the sequential
    rank-order form); a property sweep showed that form DIVERGES from
    greedy on boundary-sharing occurrence chains (``aeae`` needs a
    second pass; identical-symbol runs like ``aaaaa`` disagree under
    ANY pass count, because a pass's non-overlapping skip takes a4a5
    where greedy's rescan takes a3a4) — it only hash-passed because
    the driver corpus vocabulary happens to contain no such words. The
    recursive form is exact for every input; adversarial words are
    pinned in tests/test_bpe.py. Recursion depth ≤ word length; rows
    ≤ docs × words × depth — trivial at oracle SF.

    Ends with the per-doc ``agg`` CTE; consumers append their own
    final SELECT over ``ws``/``agg`` (``_bpe_encode_oracle`` per doc,
    ``_bpe_fertility_oracle`` per language)."""
    from finance_pipeline_spark.pipelines.bpe_tokenizer import (
        FROZEN_MERGES_V1,
    )

    def lit(s: str) -> str:
        # rank-map key literal: left || chr(31) || right (no real
        # symbol contains the separator)
        return "'" + s.replace("'", "''").replace(
            "\x1f", "' || chr(31) || '"
        ) + "'"

    keys = ", ".join(lit(a + "\x1f" + b) for a, b in FROZEN_MERGES_V1)
    ranks = ", ".join(str(i) for i in range(len(FROZEN_MERGES_V1)))
    return f"""
    WITH RECURSIVE m AS (SELECT MAP([{keys}], [{ranks}]) AS mm),
    base AS (
        SELECT doc_id,
               trim(lower(coalesce(text, '')), ' ') AS t
        FROM documents
    ), ws AS (
        SELECT doc_id,
               CAST(length(t) AS BIGINT) AS n_chars,
               list_filter(string_split(t, ' '), w -> w <> '') AS words
        FROM base
    ), words0 AS (
        SELECT doc_id, wid,
               list_append(regexp_split_to_array(word, ''), '</w>') AS sym
        FROM (
            SELECT doc_id, generate_subscripts(words, 1) AS wid,
                   unnest(words) AS word
            FROM ws
        )
    ), enc AS (
        SELECT doc_id, wid, sym, 0 AS it FROM words0
        UNION ALL
        SELECT doc_id, wid,
               list_concat(
                   list_concat(sym[1:bi-1], [sym[bi] || sym[bi+1]]),
                   sym[bi+2:]
               ) AS sym,
               it + 1
        FROM (
            SELECT doc_id, wid, sym, it,
                   list_min(pr) AS br,
                   list_position(pr, list_min(pr)) AS bi
            FROM (
                SELECT doc_id, wid, sym, it,
                       [coalesce(map_extract(mm,
                            sym[i] || chr(31) || sym[i+1])[1], 999999)
                        FOR i IN range(1, len(sym))] AS pr
                FROM enc, m
            )
        ) WHERE br < 999999
    ), term AS (
        SELECT doc_id, wid, sym,
               row_number() OVER (PARTITION BY doc_id, wid
                                  ORDER BY it DESC) AS rn
        FROM enc
    ), agg AS (
        SELECT doc_id, CAST(sum(len(sym)) AS BIGINT) AS n_tokens
        FROM term WHERE rn = 1 GROUP BY doc_id
    )"""


def _bpe_encode_oracle() -> str:
    """Per-doc BPE token counts — the ``text_bpe_encode`` driver
    oracle (see ``_bpe_encode_cte`` for the greedy-replay notes)."""
    return (
        _bpe_encode_cte()
        + """
    SELECT ws.doc_id,
           CAST(len(ws.words) AS BIGINT) AS n_words,
           coalesce(agg.n_tokens, 0) AS n_tokens_bpe,
           ws.n_chars
    FROM ws LEFT JOIN agg USING (doc_id)
    """
    )


def _bpe_fertility_oracle() -> str:
    """Per-language tokenizer-fertility report (staged for r15): the
    same greedy-encode CTE chain aggregated per language with the
    exact-integer sums divided once (IEEE double of exact ints —
    bit-identical)."""
    return (
        _bpe_encode_cte()
        + """
    SELECT coalesce(d.lang, 'und') AS lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(len(ws.words)) AS BIGINT) AS n_words,
           CAST(sum(coalesce(agg.n_tokens, 0)) AS BIGINT) AS n_tokens_bpe,
           CASE WHEN sum(len(ws.words)) > 0
                THEN CAST(sum(coalesce(agg.n_tokens, 0)) AS DOUBLE)
                     / sum(len(ws.words))
                ELSE NULL END AS fertility
    FROM ws
    LEFT JOIN agg USING (doc_id)
    JOIN documents d USING (doc_id)
    GROUP BY coalesce(d.lang, 'und')
    """
    )


@query(
    "text_bpe_encode",
    oracle=_bpe_encode_oracle,
    tags=("text", "tokens", "bpe"),
    bench=True,
)
def text_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL BPE encoding under the frozen merge table
    (``pipelines.bpe_tokenizer.FROZEN_MERGES_V1``) — the serving half
    of the tokenizer-training pipeline, driver-oracle-checked (r12
    verdict item 5: training is iterative and stays pytest-pinned;
    encoding with frozen ranks is pure Arrow-batched map work). Runs
    the SAME greedy lowest-rank-first kernel production encoding uses
    (``bpe_encode_docs``: broadcast ranks, per-batch word memo, no
    shuffle); the oracle replays the greedy loop EXACTLY as a recursive
    CTE (one lowest-rank merge per recursion step — nested replace()
    is not equivalent; it diverges on boundary-sharing chains like
    "aeae", r13 property sweep)."""
    from finance_pipeline_spark.pipelines.bpe_tokenizer import (
        FROZEN_MERGES_V1,
        bpe_encode_docs,
    )

    return bpe_encode_docs(
        load(spark, sf_dir, "documents"), list(FROZEN_MERGES_V1)
    )


def bpe_fertility_report(docs: DataFrame, merges) -> DataFrame:
    """Tokenizer FERTILITY per language — BPE tokens per word, the
    multilingual tokenizer-equity metric (a language whose fertility
    runs 2× English's pays 2× the compute per word and fits half the
    content per context window; UniMax-style budget decisions read
    this table next to the allocation one). Composes the served
    encoder (``bpe_encode_docs``: Arrow kernel, broadcast ranks,
    per-batch word memo) with one lang-keyed agg — sums of exact
    bigints, one exact-int→IEEE-double division, so the staged DuckDB
    oracle (``_bpe_fertility_oracle``) is bit-identical. Output is
    |languages| rows."""
    from finance_pipeline_spark.pipelines.bpe_tokenizer import (
        bpe_encode_docs,
    )

    enc = bpe_encode_docs(docs, merges)
    j = enc.join(
        docs.select(
            "doc_id", F.coalesce(F.col("lang"), F.lit("und")).alias("lang")
        ),
        "doc_id",
    )
    words = F.sum("n_words")
    toks = F.sum("n_tokens_bpe")
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        words.cast("bigint").alias("n_words"),
        toks.cast("bigint").alias("n_tokens_bpe"),
        F.when(words > 0, toks.cast("double") / words).alias("fertility"),
    )


# Registered in r15 from the staged gate (dual-scale oracle-proven in
# r14).
@query(
    "text_bpe_fertility",
    oracle=lambda: _bpe_fertility_oracle(),
    tags=("text", "tokens", "bpe", "mixture"),
)
def text_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language fertility under the frozen merge table — see
    ``bpe_fertility_report``."""
    from finance_pipeline_spark.pipelines.bpe_tokenizer import (
        FROZEN_MERGES_V1,
    )

    return bpe_fertility_report(
        load(spark, sf_dir, "documents"), list(FROZEN_MERGES_V1)
    )


@query(
    "text_gopher_rules",
    oracle=lambda: f"""
    WITH t AS (
        SELECT doc_id,
               CAST(len({_sql_tokens()}) AS DOUBLE) AS n_words,
               CAST(length(text) AS DOUBLE) AS n_chars,
               CAST(length(regexp_replace(text, '[A-Za-z0-9 ]', '', 'g')) AS DOUBLE)
                 AS n_symbols
        FROM documents
    )
    SELECT doc_id,
           round(n_chars / n_words, 4) AS mean_word_len,
           round(n_symbols / n_chars, 4) AS symbol_ratio,
           CAST(n_words >= 50 AND n_words <= 100000
                AND n_chars / n_words >= 3 AND n_chars / n_words <= 10
                AND n_symbols / n_chars <= 0.1 AS BOOLEAN) AS keep
    FROM t
    """,
    tags=("text", "quality"),
)
def text_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style corpus filter rules: word-count bounds, mean-word-
    length band, symbol-to-char ratio cap → one boolean keep flag per
    document. The C4/Gopher cheap-filter family as an embarrassingly
    parallel scan (filter pushdown-friendly: downstream pipelines
    filter on `keep` before any expensive stage)."""
    d = load(spark, sf_dir, "documents")
    n_words = F.size(_tokens()).cast("double")
    n_chars = F.length("text").cast("double")
    n_symbols = F.length(
        F.regexp_replace("text", "[A-Za-z0-9 ]", "")
    ).cast("double")
    mean_wl = n_chars / n_words
    sym_ratio = n_symbols / n_chars
    keep = (
        (n_words >= 50) & (n_words <= 100000)
        & (mean_wl >= 3) & (mean_wl <= 10)
        & (sym_ratio <= 0.1)
    )
    return d.select(
        "doc_id",
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_ratio"),
        keep.alias("keep"),
    )


_PACK_CTX = 4096  # tokens per packed training context window
_PACK_SHARDS = 8  # packing parallelism: streams are packed per
# (lang, shard) so the cumulative-sum window scan never serializes a
# whole language onto one task; pack identity stays globally unique as
# (lang, shard, pack_no). Sharding by doc_id % N is deterministic and
# engine-portable (no hash function involved).


@query(
    "text_pack_sequences",
    oracle=lambda: f"""
    WITH sized AS (
        SELECT doc_id, lang,
               CAST(doc_id % {_PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len({_sql_tokens()}) AS BIGINT) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, lang, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized
    )
    SELECT doc_id, lang, shard, n_tokens,
           CAST((cum - n_tokens) // {_PACK_CTX} AS BIGINT) AS pack_no,
           CAST((cum - n_tokens) % {_PACK_CTX} AS BIGINT) AS pack_offset
    FROM packed
    """,
    tags=("text", "packing"),
)
def text_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — assign every document a position in a stream
    of fixed-size training context windows (the document-splitting
    packing model GPT-style pretraining uses: documents are
    concatenated per stream and windows cut every ``_PACK_CTX``
    tokens, so a document starting at offset ``cum - n_tokens`` lands
    in pack ``start // ctx`` at ``start % ctx``).

    Spark-first shape: ONE shuffle on the (lang, shard) stream key,
    then a running-sum window — no iteration, no UDF. Packing is
    order-dependent by nature, so the stream order (doc_id) is part of
    the spec and both engines implement it identically; sharding by
    ``doc_id % shards`` keeps the sequential window scan parallel at
    corpus scale while leaving pack identity (lang, shard, pack_no)
    deterministic. A downstream batch assembler groups by that triple
    and slices text by pack_offset."""
    d = load(spark, sf_dir, "documents")
    from pyspark.sql import Window as W

    toks = _tokens()
    sized = d.select(
        "doc_id",
        "lang",
        F.pmod("doc_id", F.lit(_PACK_SHARDS)).cast("int").alias("shard"),
        F.size(toks).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    start = F.col("cum") - F.col("n_tokens")
    return (
        sized.withColumn("cum", F.sum("n_tokens").over(w))
        .select(
            "doc_id",
            "lang",
            "shard",
            "n_tokens",
            # integer `div`, not floor(a/b): bigint/int division in
            # Spark is DOUBLE, which loses exactness past 2^53 tokens
            # per stream — `div` matches the oracle's `//` at any
            # magnitude (r3 advisory).
            F.expr(f"(cum - n_tokens) div {_PACK_CTX}").cast("bigint").alias("pack_no"),
            (start % _PACK_CTX).cast("bigint").alias("pack_offset"),
        )
    )


def _pack_efficiency_oracle() -> str:
    """Per-stream packing diagnostics (staged for r15): the same
    running-sum CTE as ``text_pack_sequences``, aggregated per
    (lang, shard) stream. All exact-integer arithmetic; the one
    ratio is an exact-int→IEEE-double division."""
    return f"""
    WITH sized AS (
        SELECT doc_id, lang,
               CAST(doc_id % {_PACK_SHARDS} AS INTEGER) AS shard,
               CAST(len({_sql_tokens()}) AS BIGINT) AS n_tokens
        FROM documents
    ), packed AS (
        SELECT doc_id, lang, shard, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang, shard ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sized
    )
    SELECT lang, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST((max(cum) + {_PACK_CTX} - 1) // {_PACK_CTX} AS BIGINT)
             AS n_packs,
           CAST(sum(n_tokens) AS DOUBLE)
             / (((max(cum) + {_PACK_CTX} - 1) // {_PACK_CTX})
                * {_PACK_CTX}) AS fill_frac,
           CAST(sum(CASE WHEN n_tokens > 0 AND
                     (cum - 1) // {_PACK_CTX} > (cum - n_tokens) // {_PACK_CTX}
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_boundary_docs
    FROM packed
    GROUP BY lang, shard
    """


# Registered r16 (the r15 plan's named deferral — dual-scale
# oracle-proven by tools/check_staged.py since r14).
@query(
    "text_pack_efficiency",
    oracle=_pack_efficiency_oracle,
    tags=("text", "packing"),
)
def text_pack_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Packing-efficiency report — per (lang, shard) stream: document
    and token totals, context windows consumed, FILL fraction (tokens
    over window capacity — the tail of each stream is the only waste
    in the document-splitting pack model), and how many documents
    straddle a window boundary (the fragmentation count motivating
    best-fit packing research; every boundary doc costs one attention
    discontinuity). Same single-shuffle running-sum plan as
    ``text_pack_sequences``, aggregated to a |lang|×|shards| frame;
    bigint-exact, one exact division."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    sized = d.select(
        "doc_id",
        "lang",
        F.pmod("doc_id", F.lit(_PACK_SHARDS)).cast("int").alias("shard"),
        F.size(_tokens()).cast("bigint").alias("n_tokens"),
    )
    w = (
        W.partitionBy("lang", "shard")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    packed = sized.withColumn("cum", F.sum("n_tokens").over(w))
    crosses = (
        (F.col("n_tokens") > 0)
        & (
            F.expr(f"(cum - 1) div {_PACK_CTX}")
            > F.expr(f"(cum - n_tokens) div {_PACK_CTX}")
        )
    ).cast("int")
    n_packs = F.expr(f"(max(cum) + {_PACK_CTX} - 1) div {_PACK_CTX}")
    return packed.groupBy("lang", "shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        n_packs.cast("bigint").alias("n_packs"),
        (
            F.sum("n_tokens").cast("double")
            / (n_packs * F.lit(_PACK_CTX))
        ).alias("fill_frac"),
        F.sum(crosses).cast("bigint").alias("n_boundary_docs"),
    )


@query(
    "text_split_assign",
    oracle="""
    SELECT doc_id, lang, bucket_permille,
           CASE WHEN bucket_permille < 980 THEN 'train'
                WHEN bucket_permille < 990 THEN 'val'
                ELSE 'test' END AS split,
           bucket_permille < 100 AS in_10pct_sample
    FROM (
        SELECT doc_id, lang,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000
                 AS bucket_permille
        FROM documents
    )
    """,
    tags=("text", "sampling"),
)
def text_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic split + sample assignment — every document hashes
    to a stable permille bucket (first 24 bits of md5 over the decimal
    doc_id, identical in both engines via hex→int), which drives a
    98/1/1 train/val/test split and a reproducible 10% sample flag.

    This is the reproducibility primitive a training pipeline needs:
    membership depends only on the id, so re-runs, backfills, and
    incremental loads land every document in the same split without
    coordination or stored state. Pure JVM expressions (md5 + conv),
    zero shuffle, embarrassingly parallel at any scale — and never
    Spark's ``sample()``, whose membership changes with partitioning."""
    d = load(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    return d.select(
        "doc_id",
        "lang",
        bucket.alias("bucket_permille"),
        F.when(bucket < 980, "train")
        .when(bucket < 990, "val")
        .otherwise("test")
        .alias("split"),
        (bucket < 100).alias("in_10pct_sample"),
    )


_VOCAB_TOPK = 10  # tokens reported per language


@query(
    "text_vocab_topk",
    oracle=lambda: f"""
    WITH toks AS (
        SELECT lang, unnest({_sql_tokens()}) AS token FROM documents
    ), counts AS (
        SELECT lang, token, count(*) AS n
        FROM toks WHERE token <> '' GROUP BY 1, 2
    )
    SELECT lang, token, n, rnk FROM (
        SELECT lang, token, n,
               CAST(row_number() OVER (PARTITION BY lang
                     ORDER BY n DESC, token) AS BIGINT) AS rnk
        FROM counts
    ) WHERE rnk <= {_VOCAB_TOPK}
    """,
    tags=("text", "vocab"),
    bench=True,
)
def text_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language top-k vocabulary frequencies — the corpus-level
    token histogram a tokenizer-training / vocab-audit step consumes
    (and the canonical map-side-combine demonstration).

    Scale shape: explode fans the corpus out to one row per token, but
    the ``groupBy(lang, token).count`` runs PARTIAL aggregation before
    the exchange — each task ships one row per distinct (lang, token)
    it saw, bounded by vocabulary size, not corpus size. The top-k
    window then runs over the aggregated table (|langs| × |vocab|
    rows — tiny), never the raw token stream. Ties broken by token
    text so both engines pick identical rows."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(_tokens()).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("lang", "token")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    from pyspark.sql import Window as W

    w = W.partitionBy("lang").orderBy(F.col("n").desc(), "token")
    return (
        counts.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _VOCAB_TOPK)
    )


_DECON_MIN_SHARED = 3  # distinct shared trigrams before a train doc is
# flagged against an eval doc (1 shared trigram is noise — common
# phrases; measured at sf0.01: threshold 1 → 170 pairs, 3 → 4 pairs)


@query(
    "text_decontaminate",
    # Shared-shingle COUNTS are hash-agnostic (same argument as the
    # ngram-Jaccard oracle), so the oracle intersects raw trigram
    # strings while Spark ships md5-64 ints.
    oracle=lambda: f"""
    WITH b AS (
        SELECT doc_id, lang, text,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT % 1000 AS pm
        FROM documents
    ), sh AS (
        SELECT doc_id, lang, pm,
               list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                              FOR i IN range(1, greatest(len(t)-1, 1))]) AS ss
        FROM (SELECT doc_id, lang, pm, string_split(trim(lower(text)), ' ') AS t FROM b)
        WHERE len(t) >= 3
    ), post AS (SELECT doc_id, lang, pm, unnest(ss) AS s FROM sh)
    SELECT tr.doc_id AS doc_id, ev.doc_id AS contaminant_id,
           CAST(count(*) AS BIGINT) AS n_shared
    FROM (SELECT * FROM post WHERE pm < 980) tr
    JOIN (SELECT * FROM post WHERE pm >= 980) ev
      ON tr.lang = ev.lang AND tr.s = ev.s
    GROUP BY 1, 2 HAVING count(*) >= {_DECON_MIN_SHARED}
    """,
    tags=("text", "decontamination"),
)
def text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval contamination check — flag train-split documents
    sharing ≥ ``_DECON_MIN_SHARED`` distinct trigram shingles with any
    val/test document (the decontamination pass every pretraining
    pipeline runs before the benchmark split is trusted).

    Composes two engine primitives: the deterministic md5 permille
    bucket from ``text_split_assign`` partitions the corpus, and the
    md5-64 shingle kernel from the dedup family builds the postings.

    Scale shape: a SHUFFLE HASH join on (lang, shingle). The eval side
    is 2% of the corpus by construction — small relative to train, but
    2% of postings still grows linearly with corpus size, so an
    unconditional broadcast (the r3 plan) would blow past Spark's
    broadcast limits (8 GB hard cap, driver memory long before) at
    large scale. Shuffle hash beats sort-merge here: the smaller eval
    side builds the hash map per partition with no sort of the huge
    train side, and the join key is high-cardinality so skew spreads
    naturally (the shingle-postings-join argument — shared with the
    minhash band shuffle; dedup_ngram_jaccard now blocks on bottom-k
    md5 band keys rather than a postings join).
    At small SFs AQE is free to locally pick a broadcast exchange if
    the eval side measures tiny at runtime — the *static* plan no
    longer bakes in a claim that stops being true at 100 TB."""
    from finance_pipeline_spark.operators.dedup import hashed_shingle_rows

    d = load(spark, sf_dir, "documents")
    sh = hashed_shingle_rows(d)
    pm = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    postings = sh.withColumn("pm", pm).select(
        "lang", "doc_id", "pm", F.explode("shingles").alias("s")
    )
    train = postings.filter(F.col("pm") < 980).select("lang", "doc_id", "s")
    ev = postings.filter(F.col("pm") >= 980).select(
        "lang", F.col("doc_id").alias("contaminant_id"), "s"
    )
    return (
        train.join(ev.hint("shuffle_hash"), ["lang", "s"])
        .groupBy("doc_id", "contaminant_id")
        .agg(F.count(F.lit(1)).alias("n_shared"))
        .filter(F.col("n_shared") >= _DECON_MIN_SHARED)
    )


def _split_leakage_oracle() -> str:
    """Near-dup pairs (the full MinHash-LSH oracle chain) joined to
    each side's deterministic split bucket — a leak is a verified pair
    straddling splits."""
    from finance_pipeline_spark.operators.dedup import (
        _MINHASH_BUCKET_CAP,
        _bands_cte,
    )

    return f"""
    WITH {_bands_cte()}, capped AS (
        SELECT doc_id, band_key FROM (
            SELECT doc_id, band_key,
                   count(*) OVER (PARTITION BY band_key) AS n
            FROM bands
        ) WHERE n <= {_MINHASH_BUCKET_CAP}
    ), cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM capped a JOIN capped b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ), pairs AS (
        SELECT doc_a, doc_b, jaccard FROM (
            SELECT c.doc_a, c.doc_b,
                   round(CAST(len(list_intersect(sa.ss, sb.ss)) AS DOUBLE)
                         / len(list_distinct(list_concat(sa.ss, sb.ss))), 4)
                     AS jaccard
            FROM cand c
            JOIN strs sa ON sa.doc_id = c.doc_a
            JOIN strs sb ON sb.doc_id = c.doc_b
        ) WHERE jaccard >= 0.5
    ), sp AS (
        SELECT doc_id,
               CASE WHEN pm < 980 THEN 'train'
                    WHEN pm < 990 THEN 'val'
                    ELSE 'test' END AS split
        FROM (
            SELECT doc_id,
                   ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                     % 1000 AS pm
            FROM documents
        )
    )
    SELECT p.doc_a, p.doc_b, p.jaccard,
           sa.split AS split_a, sb.split AS split_b,
           sa.split <> sb.split AS leaks
    FROM pairs p
    JOIN sp sa ON sa.doc_id = p.doc_a
    JOIN sp sb ON sb.doc_id = p.doc_b
    """


@query(
    "text_split_leakage_audit",
    oracle=_split_leakage_oracle,
    tags=("text", "dedup", "sampling", "audit"),
)
def text_split_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-leakage audit — every verified near-dup pair annotated
    with both sides' train/val/test assignment and a ``leaks`` flag
    for pairs that straddle splits. This is the eval-integrity check a
    pretraining pipeline runs AFTER splitting: ``text_decontaminate``
    catches shingle overlap against the eval slice, but a near-dup
    pair split across train and test is the stronger (and more
    embarrassing) leak — the model trains on a paraphrase of its test
    set. Composes two proven primitives verbatim: ``minhash_pairs``
    (the full LSH chain, exact dups included — identical texts verify
    at jaccard 1.0; the corpus has no sub-shingle-length docs, and the
    exact-dedup family screens those upstream anyway) and
    ``text_split_assign``'s deterministic md5-permille bucket.

    Scale shape: inherits the LSH chain's (band-key shuffle, capped
    buckets, verify-on-survivors); the split join adds two broadcast-
    sized probes of an md5 expression over bare doc_ids — no new
    corpus-sized shuffle."""
    from finance_pipeline_spark.operators.dedup import minhash_pairs

    d = load(spark, sf_dir, "documents")
    pairs = minhash_pairs(d)
    pm = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    sp = d.select(
        "doc_id",
        F.when(pm < 980, "train")
        .when(pm < 990, "val")
        .otherwise("test")
        .alias("split"),
    )
    return (
        pairs.join(
            sp.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("split_a")),
            "doc_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("split_b")),
            "doc_b",
        )
        .select(
            "doc_a", "doc_b", "jaccard", "split_a", "split_b",
            (F.col("split_a") != F.col("split_b")).alias("leaks"),
        )
    )


# PII patterns shared verbatim between the Spark plan and the DuckDB
# oracle. Both engines' regex dialects (java.util.regex / RE2) agree on
# this subset: char classes, bounded repeats, \b, \d. Redaction order
# (email → ipv4 → phone) is part of the spec: it is applied identically
# on both sides, so overlapping matches resolve the same way.
_PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b", "<PHONE>"),
)


def _pii_oracle() -> str:
    counts = ",\n           ".join(
        "CAST(len(regexp_extract_all(text, '%s')) AS BIGINT) AS n_%s"
        % (pat.replace("'", "''"), name)
        for name, pat, _ in _PII_PATTERNS
    )
    clean = "text"
    for _, pat, repl in _PII_PATTERNS:
        clean = "regexp_replace(%s, '%s', '%s', 'g')" % (clean, pat.replace("'", "''"), repl)
    return (
        "SELECT doc_id,\n           "
        + counts
        + ",\n           "
        + clean
        + " AS text_clean\n    FROM documents"
    )


@query(
    "text_pii_scrub",
    oracle=_pii_oracle,
    tags=("text", "pii"),
    bench=True,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction — the scrub pass a training-data
    pipeline runs before anything else touches the text. Counts and
    replaces emails, IPv4 addresses, and phone numbers with typed
    placeholder tags.

    Scale shape: pure JVM ``regexp_count``/``regexp_replace`` inside
    whole-stage codegen — zero shuffle, embarrassingly parallel, and
    the regex subset is chosen to behave identically under Java regex
    and RE2 so the scrub is engine-portable (the same patterns drive
    the DuckDB oracle verbatim). The driver corpus contains no planted
    PII, so the oracle here proves the no-false-positive direction;
    the planted-document tests in tests/test_textops_extra.py prove
    detection and redaction."""
    d = load(spark, sf_dir, "documents")
    cols = [F.col("doc_id")]
    for name, pat, _ in _PII_PATTERNS:
        cols.append(F.regexp_count("text", F.lit(pat)).cast("bigint").alias(f"n_{name}"))
    clean = F.col("text")
    for _, pat, repl in _PII_PATTERNS:
        clean = F.regexp_replace(clean, pat, repl)
    cols.append(clean.alias("text_clean"))
    return d.select(*cols)


@query(
    "text_repetition_stats",
    oracle=lambda: f"""
    WITH toks AS (
        SELECT doc_id, tok, pos FROM (
            SELECT doc_id, unnest({_sql_tokens()}) AS tok,
                   generate_subscripts({_sql_tokens()}, 1) AS pos
            FROM documents
        ) WHERE tok <> ''
    ), seq AS (
        SELECT doc_id, pos, tok,
               lead(tok, 1) OVER w AS t1, lead(tok, 2) OVER w AS t2,
               lead(tok, 3) OVER w AS t3, lead(tok, 4) OVER w AS t4
        FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), bigr AS (
        SELECT doc_id, max(n) AS top_bigram_n FROM (
            SELECT doc_id, tok || ' ' || t1 AS big, count(*) AS n
            FROM seq WHERE t1 IS NOT NULL GROUP BY 1, 2
        ) GROUP BY doc_id
    ), five AS (
        SELECT doc_id,
               count(*) AS n_five,
               count(DISTINCT tok || ' ' || t1 || ' ' || t2 || ' ' || t3 || ' ' || t4)
                   AS n_five_distinct
        FROM seq WHERE t4 IS NOT NULL GROUP BY doc_id
    ), base AS (
        SELECT doc_id,
               CAST(len(list_filter({_sql_tokens()}, t -> t <> '')) AS BIGINT)
                   AS n_tokens
        FROM documents
    )
    SELECT b.doc_id, b.n_tokens,
           CASE WHEN b.n_tokens >= 2
                THEN round(2.0 * bigr.top_bigram_n / b.n_tokens, 6)
                ELSE 0.0 END AS top_bigram_frac,
           CASE WHEN b.n_tokens >= 5
                THEN round(1.0 - 1.0 * five.n_five_distinct / five.n_five, 6)
                ELSE 0.0 END AS dup_fivegram_frac
    FROM base b
    LEFT JOIN bigr ON b.doc_id = bigr.doc_id
    LEFT JOIN five ON b.doc_id = five.doc_id
    """,
    tags=("text", "repetition"),
    bench=True,
)
def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition signals: fraction of tokens covered by
    the single most frequent bigram, and the duplicate fraction of
    5-gram occurrences. High values flag boilerplate / spam / looped
    generations — the repetition half of the quality-filter family
    (text_gopher_rules covers the length/symbol half).

    Scale shape: one shuffle to window the token stream per document
    (lead() builds the n-grams — no self-join, no Python), then two
    partial aggregations whose output is bounded by |docs|, not
    |tokens|. At 100 TB the window key (doc_id) is maximally
    high-cardinality, so the shuffle spreads evenly; everything stays
    in whole-stage codegen."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = (
        d.select("doc_id", F.posexplode(_tokens()).alias("pos", "tok"))
        .filter(F.col("tok") != "")
    )
    w = W.partitionBy("doc_id").orderBy("pos")
    seq = toks.select(
        "doc_id", "tok",
        F.lead("tok", 1).over(w).alias("t1"),
        F.lead("tok", 2).over(w).alias("t2"),
        F.lead("tok", 3).over(w).alias("t3"),
        F.lead("tok", 4).over(w).alias("t4"),
    )
    bigr = (
        seq.filter(F.col("t1").isNotNull())
        .groupBy("doc_id", F.concat_ws(" ", "tok", "t1").alias("big"))
        .agg(F.count(F.lit(1)).alias("n"))
        .groupBy("doc_id")
        .agg(F.max("n").alias("top_bigram_n"))
    )
    five = (
        seq.filter(F.col("t4").isNotNull())
        .select(
            "doc_id",
            F.concat_ws(" ", "tok", "t1", "t2", "t3", "t4").alias("fg"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_five"),
            F.countDistinct("fg").alias("n_five_distinct"),
        )
    )
    # Non-empty token count from the same exploded stream the window
    # consumes: groupBy(doc_id) after the doc_id-partitioned window
    # needs no new exchange, and it avoids a per-doc interpreted
    # higher-order `filter` lambda (measured 10-40× slower than
    # codegen in this repo — see spark-local-perf notes). Documents
    # whose every token is empty fall out of `toks`; the left join
    # from `d` + coalesce(0) puts them back.
    cnt = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_tokens"))
    base = d.select("doc_id").join(cnt, "doc_id", "left").select(
        "doc_id", F.coalesce("n_tokens", F.lit(0)).cast("bigint").alias("n_tokens")
    )
    return (
        base.join(bigr, "doc_id", "left")
        .join(five, "doc_id", "left")
        .select(
            "doc_id", "n_tokens",
            F.when(
                F.col("n_tokens") >= 2,
                F.round(2.0 * F.col("top_bigram_n") / F.col("n_tokens"), 6),
            ).otherwise(0.0).alias("top_bigram_frac"),
            F.when(
                F.col("n_tokens") >= 5,
                F.round(1.0 - F.col("n_five_distinct") / F.col("n_five"), 6),
            ).otherwise(0.0).alias("dup_fivegram_frac"),
        )
    )


_TFIDF_TOPK = 5


@query(
    "text_tfidf_topk",
    oracle=lambda: f"""
    WITH toks AS (
        SELECT doc_id, unnest({_sql_tokens()}) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
        FROM toks WHERE term <> '' GROUP BY 1, 2
    ), df AS (
        SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
    ), n AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
    )
    SELECT doc_id, term, tf, df, score_num, rnk FROM (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * n.n_docs AS score_num,
               CAST(row_number() OVER (
                   PARTITION BY tf.doc_id
                   ORDER BY 1.0 * tf.tf * n.n_docs / df.df DESC, tf.term
               ) AS BIGINT) AS rnk
        FROM tf JOIN df USING (term) CROSS JOIN n
    ) WHERE rnk <= {_TFIDF_TOPK}
    """,
    tags=("text", "tfidf"),
    bench=True,
)
def text_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document top-k distinctive terms by TF-IDF — the keyword /
    topic-signal extraction step of corpus analytics. Log-free scoring
    variant: rank by tf · N / df, which orders identically to
    tf · (N/df) under any monotone damping for a FIXED doc and keeps
    every compared quantity an exact integer ratio — no libm ``ln``
    whose last bit differs between engines (the reason this query is
    hash-checkable; score_num = tf·N and df are returned instead of a
    float score).

    Scale shape: tf is a map-side-combined (doc, term) count; df
    aggregates tf's output (bounded by vocab × docs sharing a term,
    not corpus tokens); N is a 1-row broadcast-of-scalar. The df join
    keys on term — high cardinality, skew-resistant — and the final
    top-k window partitions by doc_id. No floats anywhere except the
    rank ORDER BY, whose operands are exact small-integer products."""
    d = load(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(_tokens()).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.groupBy().agg(F.count(F.lit(1)).alias("n_docs"))
    from pyspark.sql import Window as W

    w = W.partitionBy("doc_id").orderBy(
        (1.0 * F.col("tf") * F.col("n_docs") / F.col("df")).desc(), "term"
    )
    return (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("score_num", F.col("tf") * F.col("n_docs"))
        .withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= _TFIDF_TOPK)
        .select("doc_id", "term", "tf", "df", "score_num", "rnk")
    )


@query(
    "text_mixture_sample",
    oracle="""
    WITH rated AS (
        SELECT doc_id, source,
               250 + (CAST(substr(source, 4) AS INTEGER) % 8) * 350
                   AS rate_permille
        FROM documents
    ), sized AS (
        SELECT doc_id, source, rate_permille,
               rate_permille // 1000 AS full_epochs,
               rate_permille % 1000 AS frac_permille
        FROM rated
    ), fanned AS (
        SELECT doc_id, source, rate_permille, full_epochs, frac_permille,
               unnest(generate_series(0, full_epochs)) AS epoch
        FROM sized
    )
    SELECT doc_id, source, CAST(rate_permille AS BIGINT) AS rate_permille,
           CAST(epoch AS BIGINT) AS epoch
    FROM fanned
    WHERE epoch < full_epochs
       OR ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' ||
                          CAST(epoch AS VARCHAR)), 1, 6))::BIGINT % 1000
          < frac_permille
    """,
    tags=("text", "sampling", "mixture"),
)
def text_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture sampling — the per-source weighting step of a
    pretraining pipeline (sample source A at 2.35 epochs, source B at
    0.25). Rates are permille INTEGERS end to end (rate = 250 +
    (src_num % 8)·350, standing in for the mixture config), so both
    engines agree with zero floating-point involvement:

    - ``rate // 1000`` full epochs are always emitted (upsampling =
      row repetition with a distinguishing ``epoch`` column, the way a
      weighted sampler actually materializes a mixture);
    - the fractional epoch keeps a doc iff md5(doc_id:epoch) permille
      < rate % 1000 — the same stable-hash idiom as
      ``text_split_assign``, so membership is reproducible across
      runs, engines, and backfills, and disjoint sources can be
      re-weighted without reshuffling previous epochs.

    Scale shape: zero-shuffle map work — the epoch fan-out is an
    in-scan ``explode(sequence(...))`` bounded by ceil(max rate), and
    the hash filter cuts rows before anything downstream. The output
    IS the training corpus stream, so no collect, no window, no join."""
    d = load(spark, sf_dir, "documents")
    rate_pm = (
        250 + (F.substring("source", 4, 10).cast("int") % 8) * 350
    ).alias("rate_permille")
    sized = d.select("doc_id", "source", rate_pm).select(
        "doc_id", "source", "rate_permille",
        F.expr("rate_permille div 1000").alias("full_epochs"),
        (F.col("rate_permille") % 1000).alias("frac_permille"),
    )
    fanned = sized.select(
        "doc_id", "source", "rate_permille", "full_epochs", "frac_permille",
        F.explode(F.sequence(F.lit(0), F.col("full_epochs"))).alias("epoch"),
    )
    md5_pm = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws(":", F.col("doc_id"), F.col("epoch"))), 1, 6
            ),
            16,
            10,
        ).cast("bigint")
        % 1000
    )
    return (
        fanned.filter(
            (F.col("epoch") < F.col("full_epochs")) | (md5_pm < F.col("frac_permille"))
        )
        .select(
            "doc_id", "source",
            F.col("rate_permille").cast("bigint").alias("rate_permille"),
            F.col("epoch").cast("bigint").alias("epoch"),
        )
    )


# --- per-source quota curation ----------------------------------------------

_QUOTA_PER_SOURCE = 10


@query(
    "text_source_quota",
    oracle=lambda: f"""
    WITH q AS (
        SELECT source, doc_id,
               round(least(CAST(len({_sql_tokens()}) AS DOUBLE) / 100.0, 1.0)
                     * (CAST(len(list_distinct({_sql_tokens()})) AS DOUBLE)
                        / CAST(len({_sql_tokens()}) AS DOUBLE)), 4) AS quality
        FROM documents
    )
    SELECT source, doc_id, quality, rk FROM (
        SELECT source, doc_id, quality,
               row_number() OVER (PARTITION BY source
                                  ORDER BY quality DESC, doc_id) AS rk
        FROM q
    ) WHERE rk <= {_QUOTA_PER_SOURCE}
    """,
    tags=("text", "curation", "window"),
)
def text_source_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source quota capping — keep the top-K docs per source by
    quality score (the web-corpus curation move that stops one crawl
    domain from dominating the training mix; quality expression shared
    with ``text_quality_score``, tie-broken by doc_id so the cut is
    deterministic).

    Scale shape: ``row_number() ≤ K`` compiles to Spark's
    WindowGroupLimit — each map task keeps only its local top-K per
    source BEFORE the shuffle (asserted on the physical plan in
    tests/test_plans.py), so the exchange carries at most
    K·sources·tasks rows instead of the whole corpus. Skewed sources
    (one domain = half the crawl) therefore cost map-side heap for K
    rows, not a hot reduce partition holding the domain's every doc."""
    from pyspark.sql import Window as W

    d = load(spark, sf_dir, "documents")
    toks = _tokens()
    n_tokens = F.size(toks).cast("double")
    n_unique = F.size(F.array_distinct(toks)).cast("double")
    quality = F.round(
        F.least(n_tokens / 100.0, F.lit(1.0)) * (n_unique / n_tokens), 4
    )
    w = W.partitionBy("source").orderBy(F.col("quality").desc(), "doc_id")
    return (
        d.select("source", "doc_id", quality.alias("quality"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _QUOTA_PER_SOURCE)
    )


_MIX_TOKEN_BUDGET = 800  # default per-source token budget (demo SFs)


def token_budget_mix(
    docs: DataFrame, budget: int = _MIX_TOKEN_BUDGET
) -> DataFrame:
    """Token-budget mixture — the "data recipe" operator: per source,
    take documents in (quality DESC, doc_id) order until the running
    TOKEN total reaches ``budget`` (the doc that crosses the boundary
    is taken — greedy take-until-reached). ``text_source_quota`` caps
    by document COUNT; real pretraining mixes are specified in tokens
    ("30B tokens of source X"), which this computes. Returns every doc
    annotated: (source, doc_id, n_tokens, quality, taken).

    Scale shape — deliberately NOT a per-source running-sum window
    over the corpus (at 100 TB one giant source would serialize
    through a single reducer). Instead the ``text_quality_prune``
    histogram-cut recipe one level up: (1) one map-side-combined
    groupBy to (source, quality) token subtotals — quality is 4-dp
    rounded, so the histogram is bounded by price levels, not corpus
    size; (2) a window over that HISTOGRAM finds each source's
    boundary quality level q* and the tokens consumed before it;
    (3) the cutoffs broadcast back against the corpus — docs strictly
    above q* are taken, strictly below are not, with no per-doc
    window at all; (4) only the boundary BUCKET's docs (one quality
    level per source) run the exact within-bucket running sum. The
    corpus-sized data crosses the wire once (the groupBy); the
    running-sum window touches a sliver.

    Boundary semantics match the naive per-source cumulative sum
    exactly (property-tested against it in tests/test_textops_extra.py):
    taken ⇔ (sum of tokens of all docs strictly ahead in the order)
    < budget."""
    from pyspark.sql import Window as W

    if budget < 1:
        raise ValueError(f"token_budget_mix: budget must be >= 1, got {budget}")
    toks = _tokens()
    n_tokens = F.size(toks).cast("bigint")
    n_t_d = n_tokens.cast("double")
    n_unique = F.size(F.array_distinct(toks)).cast("double")
    # coalesce: a zero-token doc's ratio is 0/0 = null — score it 0.0
    # so it sorts last deterministically instead of null-ordering
    quality = F.coalesce(
        F.round(
            F.least(n_t_d / 100.0, F.lit(1.0)) * (n_unique / n_t_d), 4
        ),
        F.lit(0.0),
    )
    base = docs.select(
        "source",
        "doc_id",
        n_tokens.alias("n_tokens"),
        quality.alias("quality"),
    )
    hist = base.groupBy("source", "quality").agg(
        F.sum("n_tokens").alias("bucket_toks")
    )
    wh = (
        W.partitionBy("source")
        .orderBy(F.col("quality").desc())
        .rowsBetween(W.unboundedPreceding, 0)
    )
    hist2 = hist.withColumn("cum_incl", F.sum("bucket_toks").over(wh)).withColumn(
        "cum_before", F.col("cum_incl") - F.col("bucket_toks")
    )
    # the boundary bucket: first quality level where the budget runs
    # out; absent when the source's total is under budget (all taken)
    cut = hist2.filter(
        (F.col("cum_before") < budget) & (F.col("cum_incl") >= budget)
    ).select(
        "source",
        F.col("quality").alias("q_star"),
        F.col("cum_before").alias("cut_before"),
    )
    j = base.join(F.broadcast(cut), "source", "left")
    off_boundary = j.filter(
        F.col("q_star").isNull() | (F.col("quality") != F.col("q_star"))
    ).select(
        "source",
        "doc_id",
        "n_tokens",
        "quality",
        (F.col("q_star").isNull() | (F.col("quality") > F.col("q_star"))).alias(
            "taken"
        ),
    )
    wb = (
        W.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    boundary = (
        j.filter(F.col("quality") == F.col("q_star"))
        .withColumn(
            "cum_before_doc",
            F.col("cut_before")
            + F.coalesce(F.sum("n_tokens").over(wb), F.lit(0)),
        )
        .select(
            "source",
            "doc_id",
            "n_tokens",
            "quality",
            (F.col("cum_before_doc") < budget).alias("taken"),
        )
    )
    return off_boundary.unionByName(boundary)


def _token_budget_oracle(budget: int = _MIX_TOKEN_BUDGET) -> str:
    """DuckDB replica of ``token_budget_mix`` — the NAIVE per-source
    running-sum form (the oracle needn't be scale-shaped): taken ⇔
    cumulative tokens strictly ahead in (quality DESC, doc_id) order
    < budget. Staged for the r14 window (r13's 50 slots are spoken
    for); parity with the histogram-cut Spark plan is already pinned
    by tests/test_textops_extra.py, including a DuckDB run of this
    exact SQL."""
    return f"""
    WITH t AS (
        SELECT source, doc_id,
               CAST(len({_sql_tokens()}) AS BIGINT) AS n_tokens,
               coalesce(round(
                   least(CAST(len({_sql_tokens()}) AS DOUBLE) / 100.0, 1.0)
                   * (CAST(len(list_distinct({_sql_tokens()})) AS DOUBLE)
                      / CAST(len({_sql_tokens()}) AS DOUBLE)), 4), 0.0)
                 AS quality
        FROM documents
    ), c AS (
        SELECT source, doc_id, n_tokens, quality,
               sum(n_tokens) OVER (
                   PARTITION BY source
                   ORDER BY quality DESC, doc_id
                   ROWS UNBOUNDED PRECEDING
               ) - n_tokens AS cum_before
        FROM t
    )
    SELECT source, doc_id, n_tokens, quality,
           cum_before < {budget} AS taken
    FROM c
    """


@query(
    "token_budget_mix",
    oracle=_token_budget_oracle,
    tags=("text", "curation", "mixture", "training-prep"),
    bench=True,
)
def token_budget_mix_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``token_budget_mix`` over the documents
    table at the default per-source budget — the "data recipe"
    operator's driver oracle row (r13 verdict item 2; function, staged
    oracle, and pytest parity landed in r13, this is the registration).
    The oracle is the naive per-source running sum; the Spark plan is
    the histogram-cut (see ``token_budget_mix``'s scale-shape note)."""
    return token_budget_mix(load(spark, sf_dir, "documents"))


_OVERLAP_N = 8  # n-gram order for the eval-overlap contamination report


def eval_overlap_report(docs: DataFrame) -> DataFrame:
    """Eval-contamination OVERLAP REPORT (GPT-3/PaLM appendix style,
    staged for r15 registration): for every val/test document, the
    fraction of its distinct ``_OVERLAP_N``-gram spans that appear
    anywhere in the train split — the number a model card publishes
    next to its benchmark table. ``text_decontaminate`` DROPS
    contaminated train docs before training; this is the complementary
    audit that MEASURES residual eval-side overlap after the fact
    (they disagree exactly when contamination enters via docs the
    dedup/decontamination thresholds let through).

    Split = the ``text_split_assign`` md5-permille recipe (98/1/1), so
    the report is reproducible across re-runs with no stored state.

    Exactness: grams are counted as distinct SETS, so each engine may
    hash them independently (the Spark-side md5-polynomial kernel of
    ``_gram_posting_rows`` vs the oracle's raw strings — equality-join
    counts are hash-agnostic modulo 64-bit collisions, the
    ``hashed_shingle_rows`` argument); the one division is
    exact-integer → IEEE double, bit-identical.

    Scale shape: the train side folds to a per-gram ``in_train`` flag
    (one map-side-combined groupBy over the postings) — never
    collected, never broadcast-hinted (it grows with the corpus; AQE
    may still pick broadcast while it's small). The probe join key is
    a high-cardinality 64-bit hash, so skew spreads; eval postings
    are ~2% of the corpus by construction. The posting front end (an
    Arrow kernel — see ``_gram_posting_rows``) is referenced twice:
    flag build + eval probe. Output is |eval| rows."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % 1000
    )
    # Shared gram partitioning: flag-build groupBy and eval-probe join
    # reuse ONE exchange, so the Arrow kernel runs once (the
    # text_ngram_novelty ReusedExchange recipe: sentinels leave before
    # the exchange — zero-gram eval docs re-enter from a cheap
    # tokenize-and-count scan — and the probe-side pm filter rides
    # INSIDE the join condition, where predicate pushdown cannot carry
    # it through the repartition and break subtree identity).
    post = _gram_posting_rows(
        docs.select("doc_id", bucket.alias("pm"), "text"),
        _OVERLAP_N,
        "doc_id",
        "pm",
    ).filter(F.col("gram").isNotNull()).repartition("gram")
    # The flag is a TRAIN-POSTING COUNT (count of non-null branches
    # consumes doc_id, which keeps this branch's projection below the
    # exchange identical to the probe's — [doc_id, pm, gram] — so the
    # exchange is reused; a bare max(0/1) flag let column pruning drop
    # doc_id here and the subtrees stopped matching).
    gram_flags = post.groupBy("gram").agg(
        F.count(
            F.when(F.col("pm") < 980, F.col("doc_id"))
        ).alias("n_train")
    )
    n_matched = F.sum(
        F.when(F.col("n_train") > 0, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    flags = gram_flags.select(
        F.col("gram").alias("f_gram"), "n_train"
    )
    # The eval-side cut rides in the join condition as a disjunct that
    # also references the flags side (in_train is 0/1, so the second
    # arm is never true): a single-side conjunct would be split out by
    # predicate pushdown, carried below the probe-side repartition,
    # and the two exchange subtrees would stop being identical.
    stats = (
        post.join(
            flags,
            (F.col("gram") == F.col("f_gram"))
            & ((F.col("pm") >= 980) | (F.col("n_train") < 0)),
        )
        .groupBy("doc_id", "pm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            n_matched.alias("n_matched"),
        )
        .select(
            "doc_id",
            F.when(F.col("pm") < 990, "val").otherwise("test").alias("split"),
            "n_grams",
            "n_matched",
            (
                F.col("n_matched").cast("double") / F.col("n_grams")
            ).alias("overlap_frac"),
        )
    )
    empties = docs.select(
        "doc_id",
        bucket.alias("pm"),
        F.coalesce(F.size(_tokens()), F.lit(-1)).alias("nt"),
    ).filter((F.col("pm") >= 980) & (F.col("nt") < _OVERLAP_N))
    return stats.unionByName(
        empties.select(
            "doc_id",
            F.when(F.col("pm") < 990, "val").otherwise("test").alias("split"),
            F.lit(0).cast("bigint").alias("n_grams"),
            F.lit(0).cast("bigint").alias("n_matched"),
            F.lit(None).cast("double").alias("overlap_frac"),
        )
    )


def _eval_overlap_oracle() -> str:
    """DuckDB replica of ``eval_overlap_report`` over raw gram strings
    (counts are hash-agnostic). Staged for the r15 window — parity is
    pinned by tests/test_textops_extra.py at both demo SFs until the
    registration lands."""
    np = _OVERLAP_N - 1
    return f"""
    WITH t AS (
        SELECT doc_id,
               ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT
                 % 1000 AS pm,
               string_split(trim(lower(text)), ' ') AS toks
        FROM documents
    ), g AS (
        SELECT doc_id, pm,
               list_distinct(
                 [list_aggregate(toks[i:i+{np}], 'string_agg', ' ')
                  FOR i IN range(1, greatest(len(toks) - {np - 1}, 1))]
               ) AS grams
        FROM t
    ), ev AS (
        SELECT doc_id, pm, grams FROM g WHERE pm >= 980
    ), tr AS (
        SELECT DISTINCT unnest(grams) AS gram FROM g WHERE pm < 980
    ), post AS (
        SELECT doc_id, unnest(grams) AS gram FROM ev
    ), m AS (
        SELECT p.doc_id, count(*) AS n_matched
        FROM post p JOIN tr USING (gram) GROUP BY 1
    )
    SELECT ev.doc_id,
           CASE WHEN ev.pm < 990 THEN 'val' ELSE 'test' END AS split,
           CAST(len(ev.grams) AS BIGINT) AS n_grams,
           CAST(coalesce(m.n_matched, 0) AS BIGINT) AS n_matched,
           CASE WHEN len(ev.grams) > 0
                THEN CAST(coalesce(m.n_matched, 0) AS DOUBLE) / len(ev.grams)
                ELSE NULL END AS overlap_frac
    FROM ev LEFT JOIN m USING (doc_id)
    """


@query(
    "eval_overlap_report",
    oracle=lambda: _eval_overlap_oracle(),
    tags=("text", "curation", "contamination", "eval"),
)
def eval_overlap_report_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered form of ``eval_overlap_report`` over the documents
    table (registered in r15 from the staged gate)."""
    return eval_overlap_report(load(spark, sf_dir, "documents"))


def _dataset_card_oracle() -> str:
    """DuckDB replica of ``text_dataset_card`` (staged for r15) — all
    exact arithmetic: bigint counts/sums, the 4-dp quality lifted to
    an exact micro-integer for the mean, the lower-median
    histogram-rank cut on integer token counts, integer-permille
    token share, and exact duplicate counting by text digest."""
    return f"""
    WITH per AS (
        SELECT doc_id, coalesce(source, 'unknown') AS source,
               coalesce(lang, 'und') AS lang,
               md5(coalesce(text, '')) AS digest,
               CAST(len({_sql_tokens()}) AS BIGINT) AS n_tokens,
               CAST(round(coalesce(round(
                   least(CAST(len({_sql_tokens()}) AS DOUBLE) / 100.0, 1.0)
                   * (CAST(len(list_distinct({_sql_tokens()})) AS DOUBLE)
                      / CAST(len({_sql_tokens()}) AS DOUBLE)), 4), 0.0)
                   * 10000) AS BIGINT) AS q_micro
        FROM documents
    ), dupd AS (
        SELECT digest FROM per GROUP BY digest HAVING count(*) > 1
    ), flagged AS (
        SELECT per.*, per.digest IN (SELECT digest FROM dupd) AS is_dup
        FROM per
    ), med AS (
        SELECT source, lang, min(n_tokens) AS median_doc_tokens FROM (
            SELECT source, lang, n_tokens,
                   sum(n) OVER (PARTITION BY source, lang
                                ORDER BY n_tokens) AS cum_n,
                   sum(n) OVER (PARTITION BY source, lang) AS tot
            FROM (SELECT source, lang, n_tokens, count(*) AS n
                  FROM flagged GROUP BY 1, 2, 3)
        ) WHERE cum_n >= (tot + 1) // 2
        GROUP BY source, lang
    ), g AS (
        SELECT source, lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
               CAST(sum(q_micro) AS DOUBLE) / count(*) / 10000
                 AS mean_quality,
               CAST(sum(CAST(is_dup AS INT)) AS BIGINT) AS n_dup_docs
        FROM flagged GROUP BY 1, 2
    )
    SELECT g.source, g.lang, g.n_docs, g.n_tokens,
           CAST(med.median_doc_tokens AS BIGINT) AS median_doc_tokens,
           g.mean_quality,
           CAST(g.n_dup_docs AS DOUBLE) / g.n_docs AS dup_frac,
           CAST((g.n_tokens * 1000)
                // (sum(g.n_tokens) OVER ()) AS BIGINT)
             AS token_share_permille
    FROM g JOIN med USING (source, lang)
    """


# Registered in r15 from the staged gate (dual-scale oracle-proven in
# r14).
@query(
    "text_dataset_card",
    oracle=lambda: _dataset_card_oracle(),
    tags=("text", "curation", "datasheet"),
)
def text_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset DATASHEET — the per-(source, language) composition table
    a dataset release publishes (Datasheets for Datasets; every model
    card's "training data" section): document and token counts, exact
    lower-median document length, mean quality score, exact-duplicate
    fraction, and integer-permille token share of the corpus.

    Exactness: counts/sums are bigint; the 4-dp quality lifts to an
    exact micro-integer so the mean is exact-int arithmetic with two
    deterministic divisions; the median is the histogram-rank cut
    (``agg_exact_median``'s recipe — shuffle bounded by groups ×
    distinct lengths, never a per-group sort); duplicate docs are
    md5-digest groups with >1 member; token share is integer permille
    (``(tokens × 1000) div total``).

    Scale shape: ONE corpus scan feeds a per-doc projection; the
    digest dup-set is a groupBy on 16-byte keys semi-joined back
    (never broadcast-hinted — it grows with the corpus); everything
    after is group-cardinality-sized."""
    from pyspark.sql import Window as W

    toks = _tokens()
    n_t = F.size(toks).cast("bigint")
    n_t_d = n_t.cast("double")
    quality = F.coalesce(
        F.round(
            F.least(n_t_d / 100.0, F.lit(1.0))
            * (F.size(F.array_distinct(toks)).cast("double") / n_t_d),
            4,
        ),
        F.lit(0.0),
    )
    per = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce("source", F.lit("unknown")).alias("source"),
        F.coalesce("lang", F.lit("und")).alias("lang"),
        F.md5(F.coalesce("text", F.lit(""))).alias("digest"),
        n_t.alias("n_tokens"),
        F.round(quality * 10000).cast("bigint").alias("q_micro"),
    )
    dupd = (
        per.groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("digest", F.lit(True).alias("is_dup"))
    )
    flagged = per.join(dupd, "digest", "left").withColumn(
        "is_dup", F.coalesce("is_dup", F.lit(False))
    )
    hist = flagged.groupBy("source", "lang", "n_tokens").agg(
        F.count(F.lit(1)).alias("n")
    )
    wcum = (
        W.partitionBy("source", "lang")
        .orderBy("n_tokens")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    wall = W.partitionBy("source", "lang")
    med = (
        hist.withColumn("cum_n", F.sum("n").over(wcum))
        .withColumn("tot", F.sum("n").over(wall))
        .filter(F.col("cum_n") >= F.expr("(tot + 1) div 2"))
        .groupBy("source", "lang")
        .agg(F.min("n_tokens").cast("bigint").alias("median_doc_tokens"))
    )
    n = F.count(F.lit(1))
    g = flagged.groupBy("source", "lang").agg(
        n.cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        (F.sum("q_micro").cast("double") / n / F.lit(10000)).alias(
            "mean_quality"
        ),
        F.sum(F.col("is_dup").cast("int")).cast("bigint").alias("n_dup_docs"),
    )
    return (
        g.join(med, ["source", "lang"])
        .withColumn(
            "token_share_permille",
            F.expr("(n_tokens * 1000) div (sum(n_tokens) over ())").cast(
                "bigint"
            ),
        )
        .select(
            "source",
            "lang",
            "n_docs",
            "n_tokens",
            "median_doc_tokens",
            "mean_quality",
            (F.col("n_dup_docs").cast("double") / F.col("n_docs")).alias(
                "dup_frac"
            ),
            "token_share_permille",
        )
    )


_UNIMAX_EPOCH_CAP = 4  # per-language epoch ceiling (UniMax's N)
_UNIMAX_BUDGET_EPOCHS = 3  # total token budget = this × corpus tokens


def unimax_alloc(
    docs: DataFrame,
    epoch_cap: int = _UNIMAX_EPOCH_CAP,
    budget_epochs: int = _UNIMAX_BUDGET_EPOCHS,
) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023, public):
    spread a total token budget as UNIFORMLY as possible across
    languages, subject to a per-language epoch ceiling — the
    principled alternative to temperature sampling for multilingual
    pretraining mixes. The budget is ``budget_epochs ×`` the corpus
    token count; each language's cap is ``epoch_cap × its tokens``.

    Closed form instead of the paper's greedy loop: water-filling.
    Sort languages by cap ascending; language k is capped iff
    ``cap_k·(L−k) + cumsum(cap₁..cap_k) ≤ B`` (monotone in k), the
    first K languages saturate their caps and the rest share the
    remainder evenly at level ``U = (B − cumsum(cap₁..cap_K))/(L−K)``.
    Every decision is BIGINT-exact and the two divisions are IEEE
    doubles of exact integers, so the DuckDB oracle is bit-identical —
    no pow()/exp() (whose rounding is engine-specific) anywhere.

    Scale shape: ONE map-side-combined groupBy reduces the corpus to
    a language histogram; every window after that runs on a frame
    bounded by language cardinality (~hundreds), so the unpartitioned
    windows are type-sized by construction, never corpus-sized."""
    from pyspark.sql import Window as W

    per_lang = (
        docs.select(
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.size(_tokens()).cast("bigint").alias("nt"),
        )
        .groupBy("lang")
        .agg(F.sum("nt").alias("n_tokens"))
        .withColumn("cap_tokens", F.lit(int(epoch_cap)) * F.col("n_tokens"))
    )
    w_ord = W.orderBy("cap_tokens", "lang")
    w_run = w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)
    w_all = W.partitionBy()
    c = (
        per_lang.withColumn("rk", F.row_number().over(w_ord))
        .withColumn("cum", F.sum("cap_tokens").over(w_run))
        .withColumn("n_langs", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "budget",
            F.lit(int(budget_epochs)) * F.sum("n_tokens").over(w_all),
        )
        .withColumn(
            "is_capped",
            F.col("cap_tokens") * (F.col("n_langs") - F.col("rk"))
            + F.col("cum")
            <= F.col("budget"),
        )
    )
    k = c.withColumn(
        "k_capped",
        F.max(F.when(F.col("is_capped"), F.col("rk")).otherwise(0)).over(w_all),
    ).withColumn(
        "cum_k",
        F.max(F.when(F.col("is_capped"), F.col("cum")).otherwise(0)).over(w_all),
    )
    alloc = F.when(
        F.col("rk") <= F.col("k_capped"), F.col("cap_tokens").cast("double")
    ).otherwise(
        (F.col("budget") - F.col("cum_k"))
        / (F.col("n_langs") - F.col("k_capped"))
    )
    return k.select(
        "lang",
        "n_tokens",
        "cap_tokens",
        (F.col("rk") <= F.col("k_capped")).alias("capped"),
        alloc.alias("alloc_tokens"),
        (alloc / F.col("n_tokens")).alias("epochs"),
    )


def _unimax_oracle(
    epoch_cap: int = _UNIMAX_EPOCH_CAP,
    budget_epochs: int = _UNIMAX_BUDGET_EPOCHS,
) -> str:
    """DuckDB replica of ``unimax_alloc`` — the SAME water-filling
    closed form (bigint condition, two integer-exact IEEE divisions),
    so the match is bit-exact rather than tolerance-based."""
    return f"""
    WITH per AS (
        SELECT coalesce(lang, 'und') AS lang,
               CAST(sum(len({_sql_tokens()})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ), c AS (
        SELECT lang, n_tokens,
               {int(epoch_cap)} * n_tokens AS cap_tokens,
               row_number() OVER (
                   ORDER BY {int(epoch_cap)} * n_tokens, lang) AS rk,
               sum({int(epoch_cap)} * n_tokens) OVER (
                   ORDER BY {int(epoch_cap)} * n_tokens, lang
                   ROWS UNBOUNDED PRECEDING) AS cum,
               count(*) OVER () AS n_langs,
               {int(budget_epochs)} * sum(n_tokens) OVER () AS budget
        FROM per
    ), f AS (
        SELECT *,
               cap_tokens * (n_langs - rk) + cum <= budget AS is_capped
        FROM c
    ), g AS (
        SELECT *,
               max(CASE WHEN is_capped THEN rk ELSE 0 END) OVER () AS k_capped,
               max(CASE WHEN is_capped THEN cum ELSE 0 END) OVER () AS cum_k
        FROM f
    )
    SELECT lang, n_tokens, cap_tokens,
           rk <= k_capped AS capped,
           CASE WHEN rk <= k_capped THEN CAST(cap_tokens AS DOUBLE)
                ELSE CAST(budget - cum_k AS DOUBLE) / (n_langs - k_capped)
           END AS alloc_tokens,
           CASE WHEN rk <= k_capped THEN CAST(cap_tokens AS DOUBLE)
                ELSE CAST(budget - cum_k AS DOUBLE) / (n_langs - k_capped)
           END / n_tokens AS epochs
    FROM g
    """


# Registered in r15 from the staged gate (hash-green at both SFs via
# tools/check_oracle.py in r14; the r14 window's last slot went to
# dedup_dropped_accounting's changed-code re-earn).
@query(
    "text_unimax_alloc",
    oracle=lambda: _unimax_oracle(),
    tags=("text", "curation", "mixture", "training-prep"),
    bench=True,
)
def text_unimax_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax water-filling language allocation over the documents
    table: budget = 3 epochs of the corpus, per-language cap = 4
    epochs — at both demo SFs the four smaller languages saturate
    their caps and English absorbs the remainder, so the closed form's
    both regimes carry driver-checked signal. See ``unimax_alloc``
    for the exactness and scale-shape notes."""
    return unimax_alloc(load(spark, sf_dir, "documents"))


_TEMP_HALVINGS = 1  # α = 0.5 ** _TEMP_HALVINGS (1 → α=0.5, 2 → α=0.25):
# only exponents reachable by repeated IEEE square roots keep the two
# engines bit-identical — sqrt is correctly rounded on both, pow() is
# not. XLM-R's α=0.3 is NOT representable this way; 0.25/0.5 bracket it.
_TEMP_W_SCALE = 1_000_000  # micro-integer weight quantization. The
# bigint Hamilton products are bounded by min(B, Σu)·max(u) < 2^63,
# which holds through ~4e8-token corpora at micro scale; the 100 TB
# form drops to milli quantization (or lifts the two products to
# decimal(38,0)) — the quantization level is part of the mixture spec
# and must match between planner and trainer either way.


def temperature_alloc(
    docs: DataFrame,
    halvings: int = _TEMP_HALVINGS,
    w_scale: int = _TEMP_W_SCALE,
) -> DataFrame:
    """Temperature-based multilingual mixture allocation (the
    p_i ∝ n_i^α sampling of mBERT/XLM-R, public: Conneau et al. 2020
    §3; the baseline UniMax's paper argues against — shipping both
    lets the mixture designer read the two tables side by side):
    re-split the corpus token budget across languages proportionally
    to n_i^α, flattening the head and boosting the tail.

    Exactness: n_i is a bigint histogram; w_i = floor(n_i^α · scale)
    with n_i^α computed as ``halvings`` repeated IEEE square roots —
    every step correctly rounded on BOTH engines (pinned by a 38k-value
    cross-engine sweep in tests), so w_i is an engine-identical bigint.
    The budget B = Σ n_i then splits by exact largest-remainder
    (Hamilton) arithmetic over the integer weights: quota_i =
    ⌊B·w_i/Σw⌋ computed overflow-split as (B//Σw)·w_i +
    ⌊(B%Σw)·w_i/Σw⌋, leftovers to the largest remainders (ties by
    lang ascending). Σ alloc_tokens == B exactly, on both engines.

    Scale shape: ONE map-side-combined groupBy reduces the corpus to
    the language histogram; every window after that is bounded by
    language cardinality (~hundreds) — the unimax_alloc discipline."""
    from pyspark.sql import Window as W

    per_lang = (
        docs.select(
            F.coalesce(F.col("lang"), F.lit("und")).alias("lang"),
            F.size(_tokens()).cast("bigint").alias("nt"),
        )
        .groupBy("lang")
        .agg(F.sum("nt").alias("n_tokens"))
    )
    w = F.col("n_tokens").cast("double")
    for _ in range(int(halvings)):
        w = F.sqrt(w)
    w_all = W.partitionBy()
    c = (
        per_lang.withColumn(
            "weight_micro",
            F.floor(w * F.lit(float(w_scale))).cast("bigint"),
        )
        .withColumn("budget", F.sum("n_tokens").over(w_all))
        .withColumn("w_sum", F.sum("weight_micro").over(w_all))
    )
    # overflow-split exact floor(B*w/Σw): (B//Σw)*w + (B%Σw)*w // Σw —
    # `div` is Spark's INTEGRAL division, so every step stays bigint
    # (no double round-trip that would go lossy past 2^53)
    quota = F.expr(
        "(budget div w_sum) * weight_micro"
        " + ((budget % w_sum) * weight_micro) div w_sum"
    )
    rem = F.expr("((budget % w_sum) * weight_micro) % w_sum")
    q = (
        c.withColumn("quota", quota.cast("bigint"))
        .withColumn("rem", rem)
        .withColumn("short", (F.col("budget") - F.sum("quota").over(w_all)))
        .withColumn(
            "rk",
            F.row_number().over(W.orderBy(F.col("rem").desc(), "lang")),
        )
    )
    alloc = F.col("quota") + (F.col("rk") <= F.col("short")).cast("bigint")
    return q.withColumn("alloc_tokens", alloc).select(
        "lang",
        "n_tokens",
        "weight_micro",
        "alloc_tokens",
        # exact integer permille: how many thousandths of an epoch of
        # language i the mixture consumes (upsampled tails read >1000)
        F.expr("(alloc_tokens * 1000) div n_tokens").alias(
            "epochs_permille"
        ),
    )


def _temperature_oracle(
    halvings: int = _TEMP_HALVINGS, w_scale: int = _TEMP_W_SCALE
) -> str:
    """DuckDB replica of ``temperature_alloc`` — same repeated-sqrt
    micro-weights, same overflow-split bigint Hamilton, so the match
    is bit-exact rather than tolerance-based."""
    w = "CAST(n_tokens AS DOUBLE)"
    for _ in range(int(halvings)):
        w = f"sqrt({w})"
    return f"""
    WITH per AS (
        SELECT coalesce(lang, 'und') AS lang,
               CAST(sum(len({_sql_tokens()})) AS BIGINT) AS n_tokens
        FROM documents GROUP BY 1
    ), c AS (
        SELECT lang, n_tokens,
               CAST(floor({w} * {int(w_scale)}.0) AS BIGINT) AS weight_micro,
               sum(n_tokens) OVER () AS budget,
               sum(CAST(floor({w} * {int(w_scale)}.0) AS BIGINT))
                   OVER () AS w_sum
        FROM per
    ), q AS (
        SELECT *,
               (budget // w_sum) * weight_micro
                 + ((budget % w_sum) * weight_micro) // w_sum AS quota,
               ((budget % w_sum) * weight_micro) % w_sum AS rem
        FROM c
    ), r AS (
        SELECT *,
               budget - sum(quota) OVER () AS short,
               row_number() OVER (ORDER BY rem DESC, lang) AS rk
        FROM q
    )
    SELECT lang, n_tokens, weight_micro,
           CAST(quota + CASE WHEN rk <= short THEN 1 ELSE 0 END
                AS BIGINT) AS alloc_tokens,
           CAST(((quota + CASE WHEN rk <= short THEN 1 ELSE 0 END) * 1000)
               // n_tokens AS BIGINT) AS epochs_permille
    FROM r
    """


# Registered in r15 from the staged gate: the temperature-sampling
# counterpart of the UniMax table.
@query(
    "text_temperature_alloc",
    oracle=lambda: _temperature_oracle(),
    tags=("text", "curation", "mixture", "training-prep"),
)
def text_temperature_alloc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature mixture allocation (α=0.5) over the documents
    table — the head-flattening/tail-boosting re-split the UniMax
    table is the alternative to; reading both fixes the mixture
    debate with numbers. See ``temperature_alloc`` for exactness and
    scale-shape notes."""
    return temperature_alloc(load(spark, sf_dir, "documents"))


_DSIR_BUCKETS = 4096  # hashed-feature dimensionality (the paper's
# hashing trick: collisions are part of the estimator, so BOTH engines
# must hash identically — md5 makes that a given)
_DSIR_TARGET_LANG = "en"  # the stand-in "target domain" corpus: the
# docs whose hashed-bigram distribution raw docs are scored against.
# In production this is the small curated target set (e.g. Wikipedia);
# a lang slice is the strongest deterministic proxy this schema offers.
_DSIR_K = 100  # resample size: how many raw docs the selection keeps


def dsir_select(
    docs: DataFrame,
    n_buckets: int = _DSIR_BUCKETS,
    target_lang: str = _DSIR_TARGET_LANG,
    k: int = _DSIR_K,
    gumbel_seed: str | None = None,
) -> DataFrame:
    """DSIR — Data Selection via Importance Resampling (Xie et al.
    2023, public): score every document by how much more likely its
    hashed-bigram bag is under the TARGET distribution than under the
    RAW distribution, and select the raw docs that lean target.

    Estimator: bigram occurrences hash into ``n_buckets`` md5 buckets;
    target/raw bucket models are add-1-smoothed multinomials
    p(b) = (c_b + 1) / (T + n_buckets); a doc's log importance weight
    is Σ over its bigram OCCURRENCES of log p_t(b) − log p_r(b). The
    paper resamples ``k`` docs via Gumbel top-k; the default here is
    the deterministic top-``k`` NON-target docs by logw (ties by
    doc_id), which keeps the operator reproducible and
    oracle-checkable. (A fixed logw > 0 cut is the wrong rule: the
    raw-usage-weighted mean log-ratio is a −KL quantity, so absolute
    logw is systematically negative and only the RANKING carries the
    selection signal.) Passing ``gumbel_seed`` opts into the paper's
    actual sampling-without-replacement ∝ exp(logw): the resample key
    becomes logw + Gumbel(0,1) noise derived from
    md5(seed:doc_id) — u = (h₂₄ + 0.5)/2²⁴, g = −ln(−ln(u)) rounded
    to 6 dp and lifted to decimal — so the draw is seeded,
    reproducible, engine-replicable, and re-seedable per epoch.

    Exactness (the KN-scorer recipe): every count is bigint; each of
    the two per-bucket logs rounds to 6 dp and lifts to decimal(38,6)
    BEFORE the subtraction, so the per-doc aggregate is an exact
    order-free decimal sum; logw is that sum cast to double once. Docs
    under 2 tokens carry zero features, logw = 0, never selected.

    Scale shape: one corpus scan builds both bucket tables in a single
    map-side-combined groupBy (cr = all, ct = target-filtered — no
    second pass over the corpus); the ratio table is n_buckets-sized
    and BROADCASTS into the scoring join, so the only corpus-sized
    shuffle keys on doc_id for the per-doc sum. No windows over corpus
    frames; the totals window runs on the n_buckets-sized table; the
    top-k plans as TakeOrderedAndProject (per-partition heads merged
    on the driver, k-bounded) and the selected flag joins back as a
    k-row broadcast."""
    from pyspark.sql import Window as W

    base = docs.select(
        "doc_id",
        (F.coalesce("lang", F.lit("und")) == F.lit(target_lang)).alias(
            "is_target"
        ),
        "text",
    )
    pairs = lm_pairs(
        lm_clean(base, carry=("doc_id", "is_target")),
        carry=("doc_id", "is_target"),
    )
    bucket = (
        F.conv(
            F.substring(F.md5(F.concat_ws(" ", "w1a", "w2a")), 1, 6), 16, 10
        ).cast("bigint")
        % F.lit(int(n_buckets))
    )
    # The explicit bucket repartition makes the bucket-model build and
    # the scoring probe share ONE byte-identical exchange subtree, so
    # the corpus-sized pair explode (measured 11.4 s of the query's
    # 24 s at the 1000× tier) runs once as a ReusedExchange instead of
    # once per branch. Same three traps as the overlap family, same
    # defusals: cr counts doc_id and the scored aggregate carries
    # max(is_target) into the output's coalesce, so column pruning
    # keeps both branch projections at [doc_id, is_target, b].
    # Both null filters are no-ops on real data (md5-derived b and the
    # doc_id PK are never null) but the scoring probe's joins INFER
    # them on that branch only — stating them below the repartition
    # keeps the subtrees byte-identical so the reuse fires.
    grams = (
        pairs.select("doc_id", "is_target", bucket.alias("b"))
        .filter(F.col("b").isNotNull() & F.col("doc_id").isNotNull())
        .repartition("b")
    )
    bt = grams.groupBy("b").agg(
        F.count("doc_id").cast("bigint").alias("cr"),
        F.sum(F.col("is_target").cast("bigint")).alias("ct"),
    )
    w_all = W.partitionBy()
    smooth = F.lit(int(n_buckets))

    def _logp(c: Column, total: Column) -> Column:
        return F.round(
            F.log((c + F.lit(1)).cast("double") / (total + smooth).cast("double")),
            6,
        ).cast("decimal(38,6)")

    ratio = bt.select(
        "b",
        (
            _logp(F.col("ct"), F.sum("ct").over(w_all))
            - _logp(F.col("cr"), F.sum("cr").over(w_all))
        ).alias("lratio"),
    )
    scored = (
        grams.join(F.broadcast(ratio), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_feats"),
            F.sum("lratio").alias("lw"),
            # constant per doc; consumed by all_docs' coalesce so the
            # probe branch keeps is_target below the shared exchange
            F.max("is_target").alias("st"),
        )
    )
    all_docs = (
        base.select("doc_id", "is_target")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("st", F.col("is_target")).alias("is_target"),
            F.coalesce("n_feats", F.lit(0)).cast("bigint").alias("n_feats"),
            F.coalesce(F.col("lw"), F.lit(0).cast("decimal(38,6)")).alias(
                "lw"
            ),
        )
    )
    if gumbel_seed is not None:
        h24 = F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.lit(str(gumbel_seed)),
                        F.col("doc_id").cast("string"),
                    )
                ),
                1,
                6,
            ),
            16,
            10,
        ).cast("bigint")
        u = (h24.cast("double") + F.lit(0.5)) / F.lit(16777216.0)
        key = F.col("lw") + F.round(-F.log(-F.log(u)), 6).cast(
            "decimal(38,6)"
        )
    else:
        key = F.col("lw")
    # featureless docs (under 2 tokens) carry no evidence: their 0
    # score must not outrank scored docs whose logw is negative
    topk = (
        all_docs.filter((~F.col("is_target")) & (F.col("n_feats") > 0))
        .orderBy(key.desc(), "doc_id")
        .limit(int(k))
        .select("doc_id", F.lit(True).alias("sel"))
    )
    return all_docs.join(F.broadcast(topk), "doc_id", "left").select(
        "doc_id",
        "is_target",
        "n_feats",
        F.col("lw").cast("double").alias("logw"),
        F.coalesce("sel", F.lit(False)).alias("selected"),
    )


def _dsir_oracle(
    n_buckets: int = _DSIR_BUCKETS,
    target_lang: str = _DSIR_TARGET_LANG,
    k: int = _DSIR_K,
    gumbel_seed: str | None = None,
) -> str:
    """DuckDB replica of ``dsir_select`` — identical md5 bucketing,
    add-1 bucket models, round-to-6dp decimal log-ratio sums, and the
    same seeded md5-Gumbel resample key when ``gumbel_seed`` is set."""
    if gumbel_seed is not None:
        key = (
            "lw + CAST(round(-ln(-ln((('0x' || substr(md5("
            f"'{gumbel_seed}:' || CAST(doc_id AS VARCHAR)), 1, 6))::BIGINT"
            " + 0.5) / 16777216.0)), 6) AS DECIMAL(38,6))"
        )
    else:
        key = "lw"
    return f"""
    WITH base AS (
        SELECT doc_id,
               coalesce(lang, 'und') = '{target_lang}' AS is_target,
               list_filter({_sql_tokens()}, x -> x <> '') AS toks
        FROM documents
    ), clean AS (
        SELECT * FROM base WHERE len(toks) >= 2
    ), fanned AS (
        SELECT doc_id, is_target, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM clean
    ), grams AS (
        SELECT doc_id, is_target,
               ('0x' || substr(md5(toks[i] || ' ' || toks[i + 1]), 1, 6))
                   ::BIGINT % {int(n_buckets)} AS b
        FROM fanned
    ), bt AS (
        SELECT b, CAST(count(*) AS BIGINT) AS cr,
               CAST(sum(CASE WHEN is_target THEN 1 ELSE 0 END)
                    AS BIGINT) AS ct
        FROM grams GROUP BY 1
    ), ratio AS (
        SELECT b,
               CAST(round(ln(CAST(ct + 1 AS DOUBLE)
                   / CAST(sum(ct) OVER () + {int(n_buckets)} AS DOUBLE)), 6)
                   AS DECIMAL(38,6))
             - CAST(round(ln(CAST(cr + 1 AS DOUBLE)
                   / CAST(sum(cr) OVER () + {int(n_buckets)} AS DOUBLE)), 6)
                   AS DECIMAL(38,6)) AS lratio
        FROM bt
    ), scored AS (
        SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_feats,
               sum(r.lratio) AS lw
        FROM grams g JOIN ratio r USING (b) GROUP BY 1
    ), alldocs AS (
        SELECT d.doc_id,
               coalesce(d.lang, 'und') = '{target_lang}' AS is_target,
               coalesce(s.n_feats, 0) AS n_feats,
               coalesce(s.lw, 0) AS lw
        FROM documents d LEFT JOIN scored s USING (doc_id)
    ), topk AS (
        SELECT doc_id FROM alldocs WHERE NOT is_target AND n_feats > 0
        ORDER BY {key} DESC, doc_id LIMIT {int(k)}
    )
    SELECT a.doc_id, a.is_target, a.n_feats,
           CAST(a.lw AS DOUBLE) AS logw,
           a.doc_id IN (SELECT doc_id FROM topk) AS selected
    FROM alldocs a
    """


# Registered in r15 from the staged gate (same contract as the
# mixture tables above).
@query(
    "text_dsir_select",
    oracle=lambda: _dsir_oracle(),
    tags=("text", "curation", "selection", "training-prep"),
)
def text_dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance-resampling selection over the documents table,
    target = the English slice: raw docs whose hashed-bigram profile
    leans English-like are selected. See ``dsir_select`` for the
    estimator, exactness, and scale-shape notes."""
    return dsir_select(load(spark, sf_dir, "documents"))


_CHUNK_TOKENS = 32  # context-window size (tokens per training chunk)
_CHUNK_OVERLAP = 8  # tokens shared between consecutive chunks
_CHUNK_STRIDE = _CHUNK_TOKENS - _CHUNK_OVERLAP


@query(
    "text_chunk_overlap",
    oracle=lambda: f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), k AS (
        SELECT doc_id, ts, n,
               greatest(1, CAST(ceil((n - {_CHUNK_OVERLAP}) / {_CHUNK_STRIDE}.0)
                                AS BIGINT)) AS n_chunks
        FROM toks
    ), chunks AS (
        SELECT doc_id, n, CAST(c AS BIGINT) AS chunk_idx,
               ts[c * {_CHUNK_STRIDE} + 1 :
                  least(c * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n)] AS chunk
        FROM k, unnest(range(0, n_chunks)) AS r(c)
    )
    SELECT doc_id, chunk_idx,
           CAST(chunk_idx * {_CHUNK_STRIDE} + 1 AS BIGINT) AS start_tok,
           CAST(len(chunk) AS BIGINT) AS n_tokens,
           list_aggregate(chunk, 'string_agg', ' ') AS chunk_text
    FROM chunks
    """,
    tags=("text", "chunking", "training-prep"),
)
def text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping token chunking — split each document into
    fixed-size training chunks (32 tokens) with an 8-token overlap so
    no context is lost at chunk boundaries: the tokenize-and-chunk
    step between curation and sequence packing in an LLM data
    pipeline (the packer, text_pack_sequences, consumes outputs like
    these).

    Chunk count is ``max(1, ceil((n - overlap) / stride))`` — every
    token is covered, the tail chunk may run short, and a doc shorter
    than one window still yields exactly one chunk. All integer
    arithmetic + list slicing, identical in both engines.

    Scale shape: pure map work — tokenize, one ``sequence`` explode,
    one slice per chunk; zero shuffle, linear in corpus size, and the
    explode fans out ~n/stride rows per doc (bounded amplification,
    unlike a per-token explode). The chunker never crosses documents,
    so it parallelizes embarrassingly at 100 TB."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(_CHUNK_OVERLAP)) / F.lit(float(_CHUNK_STRIDE))).cast(
            "bigint"
        ),
    )
    with_k = d.select(
        "doc_id", toks.alias("ts"), n.alias("n"), n_chunks.alias("n_chunks")
    )
    exploded = with_k.select(
        "doc_id",
        "ts",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE  # 0-based token offset
    chunk_len = F.least(
        start + F.lit(_CHUNK_TOKENS), F.col("n")
    ) - start
    chunk = F.slice(F.col("ts"), start + 1, chunk_len)
    return exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        (start + 1).cast("bigint").alias("start_tok"),
        F.size(chunk).cast("bigint").alias("n_tokens"),
        F.array_join(chunk, " ").alias("chunk_text"),
    )


@query(
    "text_chunk_dedup",
    oracle=lambda: f"""
    WITH toks AS (
        SELECT doc_id, string_split(text, ' ') AS ts,
               len(string_split(text, ' ')) AS n
        FROM documents
    ), k AS (
        SELECT doc_id, ts, n,
               greatest(1, CAST(ceil((n - {_CHUNK_OVERLAP}) / {_CHUNK_STRIDE}.0)
                                AS BIGINT)) AS n_chunks
        FROM toks
    ), chunks AS (
        SELECT doc_id, CAST(c AS BIGINT) AS chunk_idx,
               md5(list_aggregate(
                   ts[c * {_CHUNK_STRIDE} + 1 :
                      least(c * {_CHUNK_STRIDE} + {_CHUNK_TOKENS}, n)],
                   'string_agg', ' ')) AS chunk_digest
        FROM k, unnest(range(0, n_chunks)) AS r(c)
    )
    SELECT chunk_digest,
           count(*) AS n_occurrences,
           count(DISTINCT doc_id) AS n_docs,
           min(doc_id) AS keep_doc_id,
           CAST(min(chunk_idx) FILTER (WHERE doc_id = keep) AS BIGINT)
               AS keep_chunk_idx
    FROM (SELECT *, min(doc_id) OVER (PARTITION BY chunk_digest) AS keep
          FROM chunks)
    GROUP BY chunk_digest
    HAVING count(*) > 1
    """,
    tags=("text", "chunking", "dedup", "training-prep"),
)
def text_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level exact dedup — the paragraph-granularity pass of a
    web-corpus pipeline (RefinedWeb/C4-style: repeated boilerplate
    paragraphs recur across unrelated pages and must dedup BELOW
    document granularity): tile documents with text_chunk_overlap's
    chunker, md5 each chunk, and report every digest occurring more
    than once with its occurrence/document counts and the
    deterministic keeper (min doc_id, then min chunk_idx within it).

    Scale shape: the chunker is map-only; the only shuffle keys on
    the md5 digest — maximal cardinality, uniformly distributed, the
    same hash-shuffle discipline as dedup_exact's digest variant. The
    keeper is derived with min/min-filter aggregates (no second
    window pass), and the >1 filter rides HAVING so singleton digests
    — the overwhelming majority — never leave the aggregate."""
    d = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    n = F.size(toks)
    n_chunks = F.greatest(
        F.lit(1),
        F.ceil((n - F.lit(_CHUNK_OVERLAP)) / F.lit(float(_CHUNK_STRIDE))).cast(
            "bigint"
        ),
    )
    exploded = d.select(
        "doc_id", toks.alias("ts"), n.alias("n"), n_chunks.alias("n_chunks")
    ).select(
        "doc_id",
        "ts",
        "n",
        F.explode(F.sequence(F.lit(0), F.col("n_chunks") - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * _CHUNK_STRIDE
    chunk_len = F.least(start + F.lit(_CHUNK_TOKENS), F.col("n")) - start
    chunks = exploded.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.md5(F.array_join(F.slice(F.col("ts"), start + 1, chunk_len), " ")).alias(
            "chunk_digest"
        ),
    )
    from pyspark.sql import Window as W

    keep = F.min("doc_id").over(W.partitionBy("chunk_digest"))
    return (
        chunks.withColumn("keep", keep)
        .groupBy("chunk_digest")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.count_distinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("keep_doc_id"),
            F.min(F.when(F.col("doc_id") == F.col("keep"), F.col("chunk_idx")))
            .cast("bigint")
            .alias("keep_chunk_idx"),
        )
        .filter(F.col("n_occurrences") > 1)
    )


# --- exact duplicated-substring spans ---------------------------------------

_SPAN_W = 20  # tokens per duplicated-substring probe window: spans
# shorter than this are noise (stock phrases); every duplicated run of
# >= W tokens is covered by at least one window, so merged windows
# reconstruct the full span with (W-1)-token end slack at worst.


def _dup_spans_cte() -> str:
    """The duplicated-span detection chain as a DuckDB CTE body ending
    in ``spans`` — shared verbatim by the span-report oracle and the
    scrub oracle, which must agree on every position."""
    return f"""toks AS (
        SELECT doc_id, {_sql_tokens()} AS t FROM documents
    ), grams AS (
        SELECT doc_id, CAST(i AS BIGINT) AS pos,
               md5(list_aggregate(t[i : i + {_SPAN_W} - 1], 'string_agg', ' ')) AS g
        FROM toks, unnest(range(1, len(t) - {_SPAN_W} + 2)) AS r(i)
        WHERE len(t) >= {_SPAN_W}
    ), dup AS (
        SELECT g FROM grams GROUP BY g HAVING count(DISTINCT doc_id) > 1
    ), hits AS (
        SELECT doc_id, pos FROM grams JOIN dup USING (g)
    ), isl AS (
        SELECT doc_id, pos,
               CASE WHEN pos > coalesce(lag(pos) OVER (
                        PARTITION BY doc_id ORDER BY pos), -{_SPAN_W})
                        + {_SPAN_W} - 1
                    THEN 1 ELSE 0 END AS ni
        FROM hits
    ), grp AS (
        SELECT doc_id, pos,
               sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) AS island
        FROM isl
    ), spans AS (
        SELECT doc_id,
               CAST(min(pos) AS BIGINT) AS span_start,
               CAST(max(pos) + {_SPAN_W} - 1 AS BIGINT) AS span_end,
               CAST(max(pos) - min(pos) + {_SPAN_W} AS BIGINT) AS span_tokens,
               CAST(count(*) AS BIGINT) AS n_windows
        FROM grp GROUP BY doc_id, island
    )"""


@query(
    "text_dup_spans",
    oracle=lambda: f"""
    WITH {_dup_spans_cte()}
    SELECT doc_id, span_start, span_end, span_tokens, n_windows FROM spans
    """,
    tags=("text", "dedup", "training-prep"),
)
def text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-SUBSTRING spans — the suffix-array-style pass
    (Lee et al., "Deduplicating Training Data Makes Language Models
    Better") that document- and chunk-level dedup both miss: a
    boilerplate run embedded mid-document (license header, nav bar,
    quoted reply) duplicated across otherwise-distinct pages. Output
    is one row per maximal duplicated span: (doc_id, span_start,
    span_end, span_tokens, n_windows) in 1-based token positions —
    the removal list a curation pipeline applies before training.

    Method: slide a ``_SPAN_W`` (20)-token window at stride 1, key each
    window by md5 of its token run (portable — both engines hash the
    identical string), keep windows whose key occurs in >1 DISTINCT
    document (self-repetition is text_repetition_stats' job), and
    merge overlapping/adjacent hit positions per doc into maximal
    spans with a lag-based gaps-and-islands pass. Pure integer/window
    logic — bit-identical across engines, no rounding.

    Scale shape: the gram explosion is ~n_tokens rows per doc (stride
    1) carrying (doc_id, pos, 32-char key) — columnar-narrow; ONE
    shuffle on the gram key builds the duplicate set, which is tiny
    (only actually-duplicated runs survive the HAVING), so the hits
    semi-join broadcasts it back under AQE; the island merge windows
    over (doc_id, pos) — the same one-exchange shape as every
    warehouse window op. At 100 TB: two corpus passes (gram build is
    recomputed for the semi-join rather than materialized — compute
    is cheaper than shuffling the full gram set twice), then
    span assembly over the small hit set."""
    return dup_spans(load(spark, sf_dir, "documents"))


def dup_spans(d: DataFrame) -> DataFrame:
    """(doc_id, text)+ → maximal cross-document duplicated spans. The
    reusable body of ``text_dup_spans`` — also feeds the scrub."""
    from pyspark.sql import Window as W

    base = d.select("doc_id", _tokens().alias("t")).withColumn(
        "n", F.size("t")
    ).filter(F.col("n") >= _SPAN_W)
    # g is a 64-bit xxhash of the window string, not the md5 hex the
    # oracle spells: only final span rows are compared, so the window
    # key is hash-agnostic modulo 64-bit collisions. Long keys +
    # the min/max pass below took the doc-frequency stage from 95 s
    # to 16 s at the 1000× probe tier (5.9×).
    grams = base.select(
        "doc_id",
        F.explode(
            F.sequence(F.lit(1), F.col("n") - F.lit(_SPAN_W - 1))
        ).alias("pos"),
        "t",
    ).select(
        "doc_id",
        F.col("pos").cast("bigint").alias("pos"),
        F.xxhash64(
            F.array_join(F.slice("t", F.col("pos"), _SPAN_W), " ")
        ).alias("g"),
    )
    # "appears in more than one doc" as min(doc_id) != max(doc_id):
    # one partial-aggregated pass — count_distinct would expand to a
    # two-phase distinct aggregation over the full posting volume.
    dup = (
        grams.groupBy("g")
        .agg(F.min("doc_id").alias("d0"), F.max("doc_id").alias("d1"))
        .filter(F.col("d0") != F.col("d1"))
        .select("g")
    )
    hits = grams.join(dup, "g", "left_semi").select("doc_id", "pos")
    w_ord = W.partitionBy("doc_id").orderBy("pos")
    ni = (
        F.col("pos")
        > F.coalesce(F.lag("pos").over(w_ord), F.lit(-_SPAN_W)) + (_SPAN_W - 1)
    ).cast("bigint")
    grp = hits.withColumn("ni", ni).withColumn(
        "island",
        F.sum("ni").over(w_ord.rowsBetween(W.unboundedPreceding, W.currentRow)),
    )
    return (
        grp.groupBy("doc_id", "island")
        .agg(
            F.min("pos").alias("span_start"),
            (F.max("pos") + F.lit(_SPAN_W - 1)).alias("span_end"),
            (F.max("pos") - F.min("pos") + F.lit(_SPAN_W)).alias("span_tokens"),
            F.count(F.lit(1)).alias("n_windows"),
        )
        .select(
            "doc_id", "span_start", "span_end", "span_tokens", "n_windows"
        )
    )


@query(
    "text_dup_scrub",
    oracle=lambda: f"""
    WITH {_dup_spans_cte()}, ptoks AS (
        SELECT doc_id, generate_subscripts(t, 1) AS pos, unnest(t) AS tok
        FROM toks
    ), marked AS (
        SELECT p.doc_id, p.pos, p.tok,
               s.doc_id IS NOT NULL AS dropped
        FROM ptoks p
        LEFT JOIN spans s
          ON s.doc_id = p.doc_id AND p.pos BETWEEN s.span_start AND s.span_end
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(count(*) FILTER (WHERE dropped) AS BIGINT) AS n_removed,
           coalesce(string_agg(tok, ' ' ORDER BY pos)
                    FILTER (WHERE NOT dropped), '') AS text_clean
    FROM marked
    GROUP BY doc_id
    HAVING count(*) FILTER (WHERE dropped) > 0
    """,
    tags=("text", "dedup", "training-prep"),
)
def text_dup_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the duplicated-span removal list: for every document with
    at least one cross-corpus duplicated span (``text_dup_spans``),
    emit (doc_id, n_tokens, n_removed, text_clean) — the patched text
    with the spans excised, tokens rejoined in order. A fully
    duplicated document scrubs to the empty string (the curation
    pipeline then drops it). Only affected docs are emitted: the
    output is a PATCH list, not a corpus rewrite, so its size scales
    with duplication volume, not corpus size.

    Plan shape: only SPAN-AFFECTED docs are exploded — a left-semi
    join against the span list's distinct doc_ids prunes the corpus
    BEFORE the per-token explode, so the wide regroup is sized by
    duplication volume, not corpus size (the r8 self-review fix: the
    first version exploded every document and threw almost all of it
    away at the final filter). The span list itself is small, so the
    position-range join broadcasts. Spans are disjoint by
    construction (maximal merged islands), so the range join matches
    each token at most once — no double-count, no dedup needed."""
    d = load(spark, sf_dir, "documents")
    spans = dup_spans(d).select(
        F.col("doc_id").alias("s_doc"), "span_start", "span_end"
    )
    return scrub_spans(d, spans).filter(F.col("n_removed") > 0)


def scrub_spans(
    d: DataFrame, spans: DataFrame, lowercase: bool = True
) -> DataFrame:
    """Apply a (s_doc, span_start, span_end) token-position removal
    list to ``d`` (doc_id, text): per AFFECTED doc, emit
    (doc_id, n_tokens, n_removed, text_clean) — the patched text with
    the span tokens excised, remaining tokens rejoined in order. A
    fully-spanned doc emits text_clean = ''. Shared by
    ``text_dup_scrub`` (lowercased, the oracle's tokenization) and the
    curation pipeline's stage 3b (``lowercase=False``: span positions
    come from the lowercased detection pass but split-on-space
    positions are case-invariant, so applying them to the original
    token sequence preserves case) — one copy of the
    position-sensitive logic, so the two paths cannot drift.

    Scale shape: left-semi prune to affected docs → per-token explode
    → broadcast range join → ONE regroup shuffle keyed by doc_id,
    all sized by duplication volume."""
    affected = spans.select(F.col("s_doc").alias("doc_id")).distinct()
    toks = _tokens() if lowercase else F.split(F.trim("text"), " ", -1)
    ptoks = (
        d.join(affected, "doc_id", "left_semi")
        .select("doc_id", F.posexplode(toks).alias("p0", "tok"))
        .select("doc_id", (F.col("p0") + 1).cast("bigint").alias("pos"), "tok")
    )
    marked = ptoks.join(
        F.broadcast(spans),
        (F.col("doc_id") == F.col("s_doc"))
        & F.col("pos").between(F.col("span_start"), F.col("span_end")),
        "left",
    ).select(
        "doc_id", "pos", "tok", F.col("s_doc").isNotNull().alias("dropped")
    )
    kept_toks = F.transform(
        F.array_sort(
            F.collect_list(
                F.when(~F.col("dropped"), F.struct("pos", "tok"))
            )
        ),
        lambda s: s["tok"],
    )
    return marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.col("dropped").cast("bigint")).alias("n_removed"),
        F.array_join(kept_toks, " ").alias("text_clean"),
    )


_LM_VOCAB = 256  # top-V tokens kept by the bigram LM; the rest -> <unk>
_LM_UNFAMILIAR_X = 4  # flag docs whose mean bigram freq < corpus mean / X


def _lm_familiarity_oracle() -> str:
    """The full familiarity chain as one SELECT — shared by the
    ``text_lm_familiarity`` oracle and, nested as a CTE, by the
    ``text_lm_buckets`` oracle."""
    return f"""
    WITH clean AS (
        SELECT doc_id, lang,
               list_filter({_sql_tokens()}, x -> x <> '') AS toks
        FROM documents
    ), clean2 AS (
        SELECT * FROM clean WHERE len(toks) >= 2
    ), uni AS (
        SELECT unnest(toks) AS w FROM clean2
    ), vocab AS (
        SELECT w FROM (SELECT w, count(*) AS n FROM uni GROUP BY w)
        ORDER BY n DESC, w LIMIT {_LM_VOCAB}
    ), fanned AS (
        SELECT doc_id, lang, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM clean2
    ), pairs AS (
        SELECT doc_id, lang, toks[i] AS w1a, toks[i + 1] AS w2a FROM fanned
    ), mapped AS (
        SELECT p.doc_id, p.lang,
               coalesce(v1.w, '<unk>') AS w1,
               coalesce(v2.w, '<unk>') AS w2
        FROM pairs p
        LEFT JOIN vocab v1 ON p.w1a = v1.w
        LEFT JOIN vocab v2 ON p.w2a = v2.w
    ), c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS freq
        FROM mapped GROUP BY 1, 2
    ), per_doc AS (
        SELECT m.doc_id, m.lang,
               CAST(count(*) AS BIGINT) AS n_bigrams,
               CAST(sum(CASE WHEN m.w1 = '<unk>' AND m.w2 = '<unk>'
                             THEN 0 ELSE 1 END) AS BIGINT) AS n_scored,
               CAST(sum(CASE WHEN m.w1 = '<unk>' AND m.w2 = '<unk>'
                             THEN 0 ELSE c2.freq END) AS BIGINT) AS sum_freq
        FROM mapped m JOIN c2 USING (w1, w2)
        GROUP BY 1, 2
    ), corpus_mean AS (
        SELECT lang,
               CASE WHEN sum(n_scored) > 0
                    THEN CAST(sum(sum_freq) AS DOUBLE)
                         / CAST(sum(n_scored) AS DOUBLE) END AS gavg
        FROM per_doc GROUP BY lang
    )
    SELECT doc_id, lang, n_bigrams, n_scored, sum_freq,
           round(CASE WHEN n_scored > 0
                      THEN CAST(sum_freq AS DOUBLE)
                           / CAST(n_scored AS DOUBLE) END, 6)
               AS familiarity,
           n_scored = 0
           OR coalesce((CAST(sum_freq AS DOUBLE) / CAST(n_scored AS DOUBLE))
                       * {_LM_UNFAMILIAR_X}.0 < gavg, FALSE) AS unfamiliar
    FROM per_doc LEFT JOIN corpus_mean USING (lang)
    """


@query(
    "text_lm_familiarity",
    oracle=lambda: _lm_familiarity_oracle(),
    tags=("text", "quality", "lm"),
    bench=True,
)
def text_lm_familiarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-bigram familiarity scoring — the CCNet/KenLM-style
    "train a cheap LM on the corpus, flag documents whose token
    sequences it finds surprising" quality filter, re-expressed so
    every compared value is engine-exact. Tokens outside the top-
    ``_LM_VOCAB`` corpus vocabulary map to ``<unk>``; each document
    scores the mean corpus frequency of its consecutive-token bigrams
    — EXCLUDING ``<unk> <unk>`` pairs, which otherwise become the
    corpus's most frequent bigram type once the true vocabulary
    exceeds the cap and would score pure-OOV gibberish as maximally
    familiar (the r8 advisor inversion); docs whose mean is under
    1/``_LM_UNFAMILIAR_X`` of their LANGUAGE's corpus mean (per-lang,
    so minority languages aren't wholesale-flagged) — or with zero
    scored pairs at all — are flagged ``unfamiliar`` (gibberish,
    boilerplate soup, encoding junk: sequences the corpus LM has
    rarely seen).

    True perplexity needs libm ``ln``, whose last bit differs between
    engines — the reason text_tfidf_topk went log-free. Same trick
    here: arithmetic-mean bigram frequency is hash-exact (integer
    counts, one IEEE-correctly-rounded division, a power-of-two
    scale in the flag compare) and orders documents by the same
    "has this corpus seen these transitions" signal.

    Scale shape: the vocab cap bounds the bigram-frequency table at
    (V+1)^2 rows, so BOTH lookup joins against the corpus-sized pair
    stream are broadcasts — the token stream itself is never
    shuffled. The only shuffles are three bounded aggregations:
    unigram counts (vocab-sized after map-side combine), bigram
    counts ((V+1)^2), and the per-doc rollup (doc-sized). The
    corpus-mean scalar is a 1-row broadcast. At 100 TB the pair
    explode is linear map work inside whole-stage codegen."""
    return lm_familiarity(load(spark, sf_dir, "documents"))


def lm_clean(d: DataFrame, carry: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """(carry..., toks): the LM tokenization — lowercased whitespace
    tokens, empties filtered, docs under 2 tokens dropped. One copy of
    the tokenize semantics for the operator, the curation stage, and
    the stored-index screen."""
    toks = F.filter(_tokens(), lambda x: x != F.lit(""))
    return d.select(*carry, toks.alias("toks")).filter(F.size("toks") >= 2)


def lm_pairs(clean: DataFrame, carry: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """(carry..., w1a, w2a): consecutive-token bigram instances."""
    return clean.select(
        *carry,
        F.explode(
            F.expr(
                "transform(sequence(0, size(toks) - 2),"
                " i -> struct(toks[i] AS w1a, toks[i + 1] AS w2a))"
            )
        ).alias("pr"),
    ).select(*carry, "pr.w1a", "pr.w2a")


def lm_map_to_vocab(pairs: DataFrame, vocab: DataFrame) -> DataFrame:
    """Map raw pair endpoints through a (w) vocab frame — out-of-vocab
    tokens become ``<unk>``. Both lookups broadcast (the vocab is
    capped at ``_LM_VOCAB`` rows)."""
    carry = [c for c in pairs.columns if c not in ("w1a", "w2a")]
    return (
        pairs.join(
            F.broadcast(vocab.select(F.col("w").alias("v1"))),
            F.col("w1a") == F.col("v1"),
            "left",
        )
        .join(
            F.broadcast(vocab.select(F.col("w").alias("v2"))),
            F.col("w2a") == F.col("v2"),
            "left",
        )
        .select(
            *carry,
            F.coalesce("v1", F.lit("<unk>")).alias("w1"),
            F.coalesce("v2", F.lit("<unk>")).alias("w2"),
        )
    )


def lm_score(
    mapped: DataFrame,
    c2: DataFrame,
    gavg: DataFrame | None = None,
    mean_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Per-doc familiarity over vocab-mapped pairs: ``c2`` is the
    (w1, w2, freq) bigram-frequency table (broadcast — bounded at
    (V+1)²); pairs absent from ``c2`` score freq 0 (only possible when
    screening NEW docs against a stored corpus — the operator's own
    c2 covers every pair it scores). ``gavg`` is the corpus-mean
    frame; None derives it from the scored docs themselves (the
    ``text_lm_familiarity`` oracle semantics), grouped by
    ``mean_keys`` (e.g. ``("lang",)`` — per-language means, so a
    minority language's globally-rare bigrams don't flag its every
    document; advisor finding r8).

    ``<unk> <unk>`` pairs are EXCLUDED from both the per-doc mean and
    the corpus mean: once corpus vocabulary exceeds ``_LM_VOCAB``,
    every out-of-vocab token collapses to ``<unk>``, making
    ``<unk> <unk>`` typically the highest-frequency bigram type — so
    pure-OOV gibberish would score maximally FAMILIAR (the advisor's
    inversion finding). With the exclusion, a doc whose every bigram
    is ``<unk> <unk>`` has zero scored pairs (``n_scored`` = 0), null
    familiarity, and is flagged unfamiliar outright."""
    carry = [c for c in mapped.columns if c not in ("w1", "w2")]
    unk2 = (F.col("w1") == F.lit("<unk>")) & (F.col("w2") == F.lit("<unk>"))
    per_doc = (
        mapped.join(F.broadcast(c2), ["w1", "w2"], "left")
        .withColumn("freq", F.coalesce("freq", F.lit(0)))
        .withColumn("scored", ~unk2)
        .groupBy(*carry)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.sum(F.col("scored").cast("bigint")).alias("n_scored"),
            F.sum(F.when(F.col("scored"), F.col("freq")).otherwise(F.lit(0)))
            .cast("bigint")
            .alias("sum_freq"),
        )
    )
    if gavg is None:
        # Self-derived mean = a diamond: per_doc feeds BOTH the mean
        # aggregate and the output join, and without materialization
        # Catalyst re-runs the whole corpus pass (pair explode + vocab
        # map + c2 probe + doc rollup) once per branch — measured as
        # the duplicated Generate subtrees in the r16 plan audit.
        # per_doc is DOC-sized (5 small columns), so checkpointing it
        # is cheap at any scale; lazy, so plan-only consumers
        # (explain, oracle registration) pay nothing.
        per_doc = per_doc.localCheckpoint(eager=False)
        gavg = (
            per_doc.groupBy(*mean_keys)
            .agg(
                F.sum("sum_freq").alias("_sf"), F.sum("n_scored").alias("_ns")
            )
            .select(
                *mean_keys,
                F.when(
                    F.col("_ns") > 0,
                    F.col("_sf").cast("double") / F.col("_ns").cast("double"),
                ).alias("gavg"),
            )
        )
    joined = (
        per_doc.join(F.broadcast(gavg), list(mean_keys), "left")
        if mean_keys
        else per_doc.crossJoin(F.broadcast(gavg))
    )
    fam = F.when(
        F.col("n_scored") > 0,
        F.col("sum_freq").cast("double") / F.col("n_scored").cast("double"),
    )
    return joined.select(
        *carry,
        "n_bigrams",
        "n_scored",
        "sum_freq",
        F.round(fam, 6).alias("familiarity"),
        (
            (F.col("n_scored") == 0)
            | F.coalesce(
                fam * F.lit(float(_LM_UNFAMILIAR_X)) < F.col("gavg"),
                F.lit(False),
            )
        ).alias("unfamiliar"),
    )


def lm_familiarity(d: DataFrame) -> DataFrame:
    """The ``text_lm_familiarity`` scorer over any (doc_id, lang, text)
    frame — exposed so the curation pipeline can screen its own
    (already quality-filtered, already checkpointed) universe with the
    exact semantics the DuckDB oracle verified. The flag compares each
    doc to ITS LANGUAGE's corpus mean (``mean_keys=("lang",)``), so a
    mixed-language corpus can't wholesale-flag a minority language
    whose bigrams are globally rare."""
    # ONE tokenized scan: clean feeds three consumers (the unigram
    # vocab count, the c2 bigram count, and the scoring pair stream) —
    # without the checkpoint each action re-runs the tokenize+filter
    # over the corpus (bench r9: 1.29x the familiarity bar, bought by
    # the <unk>/per-lang fixes; folding the passes buys it back).
    # Lazy checkpoint: plan-only consumers (explain, oracle
    # registration) pay nothing; the first real action materializes.
    clean = lm_clean(d, ("doc_id", "lang")).localCheckpoint(eager=False)
    uni = (
        clean.select(F.explode("toks").alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    vocab = uni.orderBy(F.col("n").desc(), "w").limit(_LM_VOCAB).select("w")
    mapped = lm_map_to_vocab(lm_pairs(clean, ("doc_id", "lang")), vocab)
    c2 = mapped.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("freq"))
    return lm_score(mapped, c2, mean_keys=("lang",))


@query(
    "text_lm_buckets",
    oracle=lambda: f"""
    WITH fam AS ({_lm_familiarity_oracle()}
    ), scored AS (
        SELECT doc_id, lang, familiarity FROM fam
        WHERE familiarity IS NOT NULL
    ), tiled AS (
        SELECT doc_id, lang, familiarity,
               ntile(3) OVER (PARTITION BY lang
                              ORDER BY familiarity DESC, doc_id) AS t
        FROM scored
    )
    SELECT doc_id, lang, familiarity,
           CASE t WHEN 1 THEN 'head' WHEN 2 THEN 'middle'
                  ELSE 'tail' END AS bucket
    FROM tiled
    UNION ALL
    SELECT doc_id, lang, familiarity, 'tail' AS bucket
    FROM fam WHERE familiarity IS NULL
    """,
    tags=("text", "quality", "lm", "mixture"),
    bench=True,
)
def text_lm_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail split: per language, rank documents by
    LM familiarity and cut into terciles — 'head' (most familiar,
    highest-quality prose by the corpus's own standard), 'middle',
    'tail' (rare transitions; CCNet trains on head+middle and samples
    the tail). ntile(3) over (familiarity DESC, doc_id) is exact and
    deterministic (the standard larger-buckets-first distribution both
    engines implement); pure-OOV docs (null familiarity — nothing
    scored) go straight to 'tail'.

    Scale note: ntile needs a per-language sort. Fine while each
    language fits one sort spill budget (lang is the partition key,
    so it's |lang| parallel sorts, not one global); at 100 TB replace
    the tercile rank with percentile_approx cutpoints per lang (two
    scans, no sort) — the bucket semantics CCNet actually uses. The
    exact form is kept here because it hash-checks against the
    oracle."""
    from pyspark.sql import Window as W

    # fam feeds two union branches (scored terciles + null-familiarity
    # tail); checkpoint the doc-sized score frame so the full LM chain
    # runs once, not per branch (same rule curation applies to it).
    fam = (
        lm_familiarity(
            load(spark, sf_dir, "documents").select("doc_id", "lang", "text")
        )
        .select("doc_id", "lang", "familiarity")
        .localCheckpoint(eager=False)
    )
    scored = fam.filter(F.col("familiarity").isNotNull())
    t = F.ntile(3).over(
        W.partitionBy("lang").orderBy(F.col("familiarity").desc(), "doc_id")
    )
    tiled = scored.withColumn("t", t).select(
        "doc_id",
        "lang",
        "familiarity",
        F.when(F.col("t") == 1, "head")
        .when(F.col("t") == 2, "middle")
        .otherwise("tail")
        .alias("bucket"),
    )
    nulls = fam.filter(F.col("familiarity").isNull()).select(
        "doc_id", "lang", "familiarity", F.lit("tail").alias("bucket")
    )
    return tiled.unionByName(nulls)


_KN_D = 0.75  # the standard absolute-discount constant


def _kn_perplexity_oracle() -> str:
    return f"""
    WITH clean AS (
        SELECT doc_id,
               list_filter({_sql_tokens()}, x -> x <> '') AS toks
        FROM documents
    ), clean2 AS (
        SELECT * FROM clean WHERE len(toks) >= 2
    ), fanned AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 1)) AS i
        FROM clean2
    ), pairs AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2 FROM fanned
    ), c2 AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM pairs GROUP BY 1, 2
    ), c1 AS (
        SELECT w1, CAST(sum(n) AS BIGINT) AS ctx,
               CAST(count(*) AS BIGINT) AS kf
        FROM c2 GROUP BY 1
    ), n1p AS (
        SELECT w2, CAST(count(*) AS BIGINT) AS kp FROM c2 GROUP BY 1
    ), t AS (
        SELECT CAST(count(*) AS BIGINT) AS t FROM c2
    ), scored AS (
        SELECT p.doc_id,
               CAST(round(ln(
                 (CAST(c2.n AS DOUBLE) - {_KN_D}) / CAST(c1.ctx AS DOUBLE)
                 + (({_KN_D} * CAST(c1.kf AS DOUBLE)) / CAST(c1.ctx AS DOUBLE))
                   * (CAST(n1p.kp AS DOUBLE) / CAST(t.t AS DOUBLE))
               ), 6) AS DECIMAL(38,6)) AS logp
        FROM pairs p JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
             JOIN n1p USING (w2), t
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_bigrams,
           CAST(sum(logp) AS DOUBLE) AS sum_logp,
           round(exp(-(CAST(sum(logp) AS DOUBLE) / count(*))), 3) AS ppl
    FROM scored GROUP BY doc_id
    """


@query(
    "text_kn_perplexity",
    oracle=lambda: _kn_perplexity_oracle(),
    tags=("text", "lm", "kn", "quality"),
    bench=True,
)
def text_kn_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram perplexity per document — the
    CCNet/KenLM-style quality signal the simple frequency familiarity
    approximates: P(w2|w1) = max(c(w1,w2)-D, 0)/c(w1) +
    D·N1+(w1,·)/c(w1) · N1+(·,w2)/T with D = 0.75, scored over the
    corpus's own bigrams (every pair is seen, so max() never binds and
    the log argument is always > 0; docs under 2 tokens drop with the
    shared ``lm_clean`` rule).

    Cross-engine determinism: probabilities are IEEE chains over
    integer counts written with identical association in both engines;
    per-instance log-probs round to 6 dp and sum as exact decimals
    (order-free — the one float summation in the chain is removed, the
    repo's standing double-aggregation rule). The emitted per-doc
    aggregate is the EXACT decimal sum cast to double (no second
    rounding — a round-after-divide differed by one 6th-decimal ulp
    between the engines' round-on-double implementations on one sf0.1
    doc); ppl rounds at a coarse 3 dp where that boundary window is
    negligible.

    Scale shape: the count tables (c2/c1/n1p) grow with bigram TYPES
    (sub-linear in corpus size). The probability is a function of the
    bigram TYPE alone, so it is computed once per type — c1/n1p join
    onto c2 type-side (type-sized joins) and the finished (w1, w2,
    logp) table broadcasts onto the pair stream as the ONE
    instance-side hash probe (r16: was three probes per instance plus
    a per-instance log(); bit-identical because the per-type
    expression is the exact per-instance expression over the same
    integer inputs). Instances are scanned, never shuffled, except
    the final per-doc rollup. c2 is checkpointed once so its derived
    tables and the probe join don't re-run the pair explode.
    BOUNDEDNESS CAVEAT: "type-sized" is sub-linear but not bounded —
    an open-vocabulary 100 TB corpus can reach billions of bigram
    types, past broadcast range. The two standing upgrades, neither
    changing this operator's semantics at its tested scale: map pairs
    through a top-V vocabulary first (``lm_map_to_vocab`` — the
    familiarity chain's cut, bounding c2 at (V+1)²), or drop the
    ``F.broadcast`` hints and let the joins shuffle-hash partition on
    (w1, w2) — KenLM itself prunes low-count n-grams for the same
    reason."""
    d = load(spark, sf_dir, "documents")
    pairs = lm_pairs(lm_clean(d)).select(
        "doc_id", F.col("w1a").alias("w1"), F.col("w2a").alias("w2")
    )
    c2 = (
        pairs.groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # r17: c1, n1p and the type total t shared one grouping-sets pass
    # over the c2 checkpoint instead of three independent jobs (same
    # exact integer counts — see the trigram form for the recipe).
    a2 = (
        c2.groupingSets([["w1"], ["w2"], []], "w1", "w2")
        .agg(
            F.sum("n").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.grouping_id().alias("gid"),
        )
        .localCheckpoint(eager=False)
    )
    c1 = a2.filter("gid = 1").select(
        "w1", F.col("s").alias("ctx"), F.col("c").alias("kf")
    )
    n1p = a2.filter("gid = 2").select("w2", F.col("c").alias("kp"))
    t_row = a2.filter("gid = 3").select("c").first()
    t = float(t_row["c"]) if t_row is not None else 0.0
    p = (
        (F.col("n").cast("double") - F.lit(_KN_D)) / F.col("ctx").cast("double")
    ) + (
        (F.lit(_KN_D) * F.col("kf").cast("double")) / F.col("ctx").cast("double")
    ) * (F.col("kp").cast("double") / F.lit(t))
    typed = (
        c2.join(F.broadcast(c1), "w1")
        .join(F.broadcast(n1p), "w2")
        .select(
            "w1",
            "w2",
            F.round(F.log(p), 6).cast("decimal(38,6)").alias("logp"),
        )
    )
    scored = pairs.join(F.broadcast(typed), ["w1", "w2"]).select(
        "doc_id", "logp"
    )
    avg = F.col("sum_lp").cast("double") / F.col("n_bigrams")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("logp").alias("sum_lp"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            F.col("sum_lp").cast("double").alias("sum_logp"),
            F.round(F.exp(-avg), 3).alias("ppl"),
        )
    )


def lm_triples(clean: DataFrame, carry: tuple[str, ...] = ("doc_id",)) -> DataFrame:
    """(carry..., w1a, w2a, w3a): consecutive-token trigram instances
    (docs under 3 tokens drop)."""
    return (
        clean.filter(F.size("toks") >= 3)
        .select(
            *carry,
            F.explode(
                F.expr(
                    "transform(sequence(0, size(toks) - 3),"
                    " i -> struct(toks[i] AS w1a, toks[i + 1] AS w2a,"
                    " toks[i + 2] AS w3a))"
                )
            ).alias("tr"),
        )
        .select(*carry, "tr.w1a", "tr.w2a", "tr.w3a")
    )


def _kn3_perplexity_oracle() -> str:
    return f"""
    WITH clean AS (
        SELECT doc_id,
               list_filter({_sql_tokens()}, x -> x <> '') AS toks
        FROM documents
    ), clean3 AS (
        SELECT * FROM clean WHERE len(toks) >= 3
    ), fanned AS (
        SELECT doc_id, toks,
               unnest(generate_series(1, len(toks) - 2)) AS i
        FROM clean3
    ), trips AS (
        SELECT doc_id, toks[i] AS w1, toks[i + 1] AS w2, toks[i + 2] AS w3
        FROM fanned
    ), c3 AS (
        SELECT w1, w2, w3, CAST(count(*) AS BIGINT) AS n
        FROM trips GROUP BY 1, 2, 3
    ), ctx12 AS (
        SELECT w1, w2, CAST(sum(n) AS BIGINT) AS ctx,
               CAST(count(*) AS BIGINT) AS kf
        FROM c3 GROUP BY 1, 2
    ), cont23 AS (
        SELECT w2, w3, CAST(count(*) AS BIGINT) AS kc FROM c3 GROUP BY 1, 2
    ), mid2 AS (
        SELECT w2, CAST(sum(kc) AS BIGINT) AS m2,
               CAST(count(*) AS BIGINT) AS kf2
        FROM cont23 GROUP BY 1
    ), uni AS (
        SELECT w3, CAST(count(*) AS BIGINT) AS ku FROM cont23 GROUP BY 1
    ), u AS (
        SELECT CAST(count(*) AS BIGINT) AS u FROM cont23
    ), scored AS (
        SELECT t.doc_id,
               CAST(round(ln(
                 (CAST(c3.n AS DOUBLE) - {_KN_D}) / CAST(ctx12.ctx AS DOUBLE)
                 + (({_KN_D} * CAST(ctx12.kf AS DOUBLE)) / CAST(ctx12.ctx AS DOUBLE))
                   * (
                     (CAST(cont23.kc AS DOUBLE) - {_KN_D}) / CAST(mid2.m2 AS DOUBLE)
                     + (({_KN_D} * CAST(mid2.kf2 AS DOUBLE)) / CAST(mid2.m2 AS DOUBLE))
                       * (CAST(uni.ku AS DOUBLE) / CAST(u.u AS DOUBLE))
                   )
               ), 6) AS DECIMAL(38,6)) AS logp
        FROM trips t JOIN c3 USING (w1, w2, w3) JOIN ctx12 USING (w1, w2)
             JOIN cont23 USING (w2, w3) JOIN mid2 USING (w2)
             JOIN uni USING (w3), u
    )
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_trigrams,
           CAST(sum(logp) AS DOUBLE) AS sum_logp,
           round(exp(-(CAST(sum(logp) AS DOUBLE) / count(*))), 3) AS ppl
    FROM scored GROUP BY doc_id
    """


@query(
    "text_kn3_perplexity",
    oracle=lambda: _kn3_perplexity_oracle(),
    tags=("text", "lm", "kn", "quality"),
    bench=True,
)
def text_kn3_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney TRIGRAM perplexity per document — the
    full KenLM-order-3 recursion the bigram form (``text_kn_perplexity``,
    which documents this upgrade path) bounds from below:

        P(w3|w1,w2) = (c(w1w2w3)-D)/c(w1w2·)
                      + D·N1+(w1w2·)/c(w1w2·) · P(w3|w2)
        P(w3|w2)    = (N1+(·w2w3)-D)/N1+(·w2·)
                      + D·N1+(w2·)/N1+(·w2·) · P(w3)
        P(w3)       = N1+(·w3)/N1+(··)

    with D = 0.75; the lower orders use CONTINUATION counts (distinct
    left-extensions over trigram types), the Kneser-Ney insight the
    bigram form only applies once. Scored over the corpus's own
    trigrams, every count is >= 1 so no max() clamp binds.

    Cross-engine determinism: the same recipe as the bigram entry —
    the probability is an IEEE chain over integer counts written with
    identical association in both engines, per-instance log-probs
    round to 6 dp and sum as exact decimals, the per-doc aggregate is
    the decimal sum cast once to double, ppl rounds at 3 dp.

    Scale shape: every table (c3/ctx12/cont23/mid2/uni) is TYPE-sized
    (sub-linear in corpus size). The probability is a function of the
    trigram TYPE alone, so it is computed once per type — the four
    derived tables join back onto c3 type-side and the finished
    (w1, w2, w3, logp) table broadcasts onto the trigram stream as
    the ONE instance-side hash probe (r16: was five probes per
    instance plus a per-instance log(); bit-identical because the
    per-type expression is the exact per-instance expression over the
    same integer inputs). Instances are scanned, never shuffled,
    except the final per-doc rollup; c3 is checkpointed once so the
    type-side joins and the probe join don't re-run the triple
    explode. Same
    boundedness caveat + upgrade paths as the bigram entry (top-V
    vocab mapping, or un-hint the broadcasts and shuffle on the gram
    keys — KenLM prunes low-count n-grams for the same reason)."""
    d = load(spark, sf_dir, "documents")
    trips = lm_triples(lm_clean(d)).select(
        "doc_id",
        F.col("w1a").alias("w1"),
        F.col("w2a").alias("w2"),
        F.col("w3a").alias("w3"),
    )
    c3 = (
        trips.groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=True)
    )
    # r17: the four type tables + the continuation total used to be
    # five independent aggregation jobs, each re-shuffling from the c3
    # checkpoint (mid2/uni/u re-deriving cont23 inside their own jobs).
    # Two grouping-sets passes now share the work: pass A computes
    # ctx12 AND cont23 rows in one shuffle over c3; pass B computes
    # mid2, uni AND the grand total u in one shuffle over cont23. The
    # counts are the same exact integers (sum/count over identical
    # groups), so every probability double is unchanged.
    ab = (
        c3.groupingSets([["w1", "w2"], ["w2", "w3"]], "w1", "w2", "w3")
        .agg(
            F.sum("n").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.grouping_id().alias("gid"),
        )
        .localCheckpoint(eager=False)
    )
    ctx12 = ab.filter("gid = 1").select(
        "w1", "w2", F.col("s").alias("ctx"), F.col("c").alias("kf")
    )
    cont23 = ab.filter("gid = 4").select(
        "w2", "w3", F.col("c").alias("kc")
    )
    b2 = (
        cont23.groupingSets([["w2"], ["w3"], []], "w2", "w3")
        .agg(
            F.sum("kc").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.grouping_id().alias("gid"),
        )
        .localCheckpoint(eager=False)
    )
    mid2 = b2.filter("gid = 1").select(
        "w2", F.col("s").alias("m2"), F.col("c").alias("kf2")
    )
    uni = b2.filter("gid = 2").select("w3", F.col("c").alias("ku"))
    # grand-total grouping set = cont23.count(); empty corpus yields no
    # rows at all (Expand over nothing), matching the old count() = 0.
    u_row = b2.filter("gid = 3").select("c").first()
    u = float(u_row["c"]) if u_row is not None else 0.0
    p1 = F.col("ku").cast("double") / F.lit(u)
    p2 = (
        (F.col("kc").cast("double") - F.lit(_KN_D)) / F.col("m2").cast("double")
    ) + (
        (F.lit(_KN_D) * F.col("kf2").cast("double")) / F.col("m2").cast("double")
    ) * p1
    p3 = (
        (F.col("n").cast("double") - F.lit(_KN_D)) / F.col("ctx").cast("double")
    ) + (
        (F.lit(_KN_D) * F.col("kf").cast("double")) / F.col("ctx").cast("double")
    ) * p2
    typed = (
        c3.join(F.broadcast(ctx12), ["w1", "w2"])
        .join(F.broadcast(cont23), ["w2", "w3"])
        .join(F.broadcast(mid2), "w2")
        .join(F.broadcast(uni), "w3")
        .select(
            "w1",
            "w2",
            "w3",
            F.round(F.log(p3), 6).cast("decimal(38,6)").alias("logp"),
        )
    )
    scored = trips.join(F.broadcast(typed), ["w1", "w2", "w3"]).select(
        "doc_id", "logp"
    )
    avg = F.col("sum_lp").cast("double") / F.col("n_trigrams")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("logp").alias("sum_lp"),
        )
        .select(
            "doc_id",
            "n_trigrams",
            F.col("sum_lp").cast("double").alias("sum_logp"),
            F.round(F.exp(-avg), 3).alias("ppl"),
        )
    )


@query(
    "text_url_canonicalize",
    # The fixture assembles a deliberately MESSY url per document
    # (upper-cased scheme/host, scheme-default or explicit ports,
    # shuffled query params, utm_* tracking params, fragments) from
    # deterministic parts; the operator must recover the canonical
    # form BY PARSING THE STRING, while the oracle derives the same
    # canonical form from the ground-truth parts — so any parse bug
    # (port/default-port logic, param sort, tracking strip, fragment
    # cut, case rules) hash-mismatches. Paths stay case-sensitive per
    # RFC 3986; only scheme and host lowercase.
    oracle="""
    WITH b AS (
        SELECT doc_id, source,
               octet_length(encode(coalesce(text, ''))) AS n
        FROM documents
    )
    SELECT doc_id,
           CASE WHEN n % 2 = 0 THEN 'http' ELSE 'https' END
           || '://www.' || source || '.example.com'
           || CASE WHEN n % 4 = 2 THEN ':8080' ELSE '' END
           || '/D/' || CAST(doc_id AS VARCHAR)
           || '?id=' || CAST(doc_id AS VARCHAR) || '&ref=home'
             AS canon_url,
           CAST(n % 4 = 2 AS BOOLEAN) AS kept_port,
           CAST(1 AS BIGINT) AS n_tracking_stripped
    FROM b
    """,
    tags=("text", "url"),
)
def text_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization — the precursor to URL-level dedup and
    host-level quotas: lowercase scheme+host, drop scheme-default
    ports (80/http, 443/https; explicit non-defaults kept), strip
    ``utm_*`` tracking params, sort the surviving query params, cut
    fragments, keep the path verbatim (case-sensitive per RFC 3986).
    Entirely JVM expressions (regexp_extract + array ops) — no UDF, no
    shuffle; at 100 TB this is a free map stage in the scan."""
    d = load(spark, sf_dir, "documents")
    n = F.octet_length(F.encode(F.coalesce("text", F.lit("")), "UTF-8"))
    messy = F.concat(
        F.when(n % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")),
        F.lit("://WWW."),
        F.col("source"),
        F.lit(".ExAmple.COM"),
        F.when(n % 4 == 0, F.lit(":80"))
        .when(n % 4 == 1, F.lit(":443"))
        .when(n % 4 == 2, F.lit(":8080"))
        .otherwise(F.lit("")),
        F.lit("/D/"),
        F.col("doc_id").cast("string"),
        F.when(
            n % 2 == 0,
            F.concat(
                F.lit("?ref=home&id="),
                F.col("doc_id").cast("string"),
                F.lit("&utm_source=feed"),
            ),
        ).otherwise(
            F.concat(
                F.lit("?utm_source=feed&id="),
                F.col("doc_id").cast("string"),
                F.lit("&ref=home"),
            )
        ),
        F.lit("#s"),
        (n % 5).cast("string"),
    )
    u = d.select("doc_id", messy.alias("url"))
    scheme = F.lower(F.regexp_extract("url", r"^([A-Za-z]+)://", 1))
    hostport = F.regexp_extract("url", r"^[A-Za-z]+://([^/?#]+)", 1)
    host = F.lower(F.split(hostport, ":")[0])
    port = F.regexp_extract(hostport, r":(\d+)$", 1)
    path = F.regexp_extract("url", r"^[A-Za-z]+://[^/?#]+([^?#]*)", 1)
    qs = F.regexp_extract("url", r"\?([^#]*)", 1)
    params = F.filter(
        F.split(qs, "&"),
        lambda p: (p != F.lit("")) & ~p.startswith("utm_"),
    )
    n_tracked = F.size(F.split(qs, "&")) - F.size(params)
    kept = ~(
        ((scheme == F.lit("http")) & (port == F.lit("80")))
        | ((scheme == F.lit("https")) & (port == F.lit("443")))
        | (port == F.lit(""))
    )
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(kept, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
        path,
        F.when(
            F.size(params) > 0,
            F.concat(F.lit("?"), F.array_join(F.sort_array(params), "&")),
        ).otherwise(F.lit("")),
    )
    return u.select(
        "doc_id",
        canon.alias("canon_url"),
        kept.alias("kept_port"),
        n_tracked.cast("bigint").alias("n_tracking_stripped"),
    )


# ---------------------------------------------------------------------------
# STAGED for the r15 window (second batch, round-14 extended session):
# corpus self-overlap novelty, cross-source provenance overlap, and
# stratified eval-set sampling. Functions + bit-exact oracles + planted
# pytest parity land now; registration takes r15 slots (the
# token_budget_mix r13 pattern).
# ---------------------------------------------------------------------------

_NOVELTY_N = 3  # shingle order for the corpus self-overlap metrics.
# Trigrams, deliberately matching text_decontaminate's unit: the
# synthetic corpus has a ~40-word vocabulary, so 8-grams only ever
# collide through true duplication (zero signal at the gate SF) while
# trigrams give every doc a measurable shared fraction.


_GRAM_POLY_C = 0x9E3779B97F4A7C15  # odd (invertible mod 2^64) mixing constant
_BITMASK_MAX_SOURCES = 64  # source_overlap_matrix one-hot bits per long;
# past this the op falls back to the collect_set chain (same output —
# the property sweep in tests/test_kernel_properties.py pins the pair)


def _gram_posting_rows(docs: DataFrame, n: int, *carry: str) -> DataFrame:
    """Distinct per-doc ``n``-gram 64-bit-hash POSTING rows
    (carry..., gram bigint) — the shared Arrow front end of the
    overlap-family audits (novelty, source-overlap, eval-overlap).
    A doc with NO n-gram emits ONE sentinel row with gram NULL, so
    per-doc counts that must include zero survive a groupBy (null
    join keys never match, so sentinels are inert in every gram
    join downstream).

    Why a Python kernel and not Catalyst array lambdas: higher-order
    functions don't codegen — the original per-position
    slice+concat_ws+xxhash64 form was measured at 21.6 s for the
    postings of 50k docs on this host vs 4.6 s for this kernel
    (same ratio the winnowing op recorded, 108 s → 5 s at its 100×
    tier). Tokenization stays the JVM ``split(trim(lower(text)))``
    expression so the token boundary is the one every DuckDB oracle
    already proves.

    Hash recipe (hash-AGNOSTIC downstream — every consumer counts
    distinct sets or equality-join matches, the ``hashed_shingle_rows``
    argument): token → first 8 md5 bytes as uint64 (memoized per
    Arrow batch — corpus vocabulary is Zipf-bounded, so md5 runs
    per unique token, not per occurrence), gram → Σ h[i+k]·C^(n-1-k)
    mod 2^64 with C odd, reinterpreted int64. Pairwise collision
    odds stay ~2^-64, same as the xxhash64-over-string form this
    replaces.

    Scale shape: one corpus scan, spread across the cores before the
    kernel (a single small parquet file would otherwise pin the whole
    corpus to one Python worker), constant (carry + 8 B) egress per
    distinct gram; at real scale maxPartitionBytes splits the input
    and the spread collapses to a no-op-sized shuffle."""
    import hashlib

    import numpy as np
    import pandas as pd

    from finance_pipeline_spark.operators.multimodal import (
        _spread_for_python_kernel,
    )

    weights = [
        pow(_GRAM_POLY_C, n - 1 - k, 1 << 64) for k in range(n)
    ]
    carry_fields = [docs.select(*carry).schema[c] for c in carry]
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in carry_fields]
        + ["gram bigint"]
    )
    has_doc_id = "doc_id" in docs.columns
    src_cols = list(carry) + (["doc_id"] if has_doc_id and "doc_id" not in carry else [])
    src = docs.select(*src_cols, _tokens().alias("t"))
    spread = (
        _spread_for_python_kernel(src)
        if "doc_id" in src.columns
        else src.repartition(src.sparkSession.sparkContext.defaultParallelism)
    )
    if "doc_id" in src.columns and "doc_id" not in carry:
        spread = spread.drop("doc_id")

    def kernel(it):
        memo: dict[str, int] = {}
        w = [np.uint64(x) for x in weights]
        for pdf in it:
            out: dict[str, list] = {c: [] for c in carry}
            grams_out: list = []
            for row in zip(*(pdf[c] for c in carry), pdf["t"]):
                *cv, toks = row
                toks = list(toks) if toks is not None else []
                if len(toks) < n:
                    for c, v in zip(carry, cv):
                        out[c].append(v)
                    grams_out.append(None)
                    continue
                h64 = np.empty(len(toks), dtype=np.uint64)
                for j, tok in enumerate(toks):
                    h = memo.get(tok)
                    if h is None:
                        h = int.from_bytes(
                            hashlib.md5(tok.encode()).digest()[:8], "big"
                        )
                        memo[tok] = h
                    h64[j] = h
                g = h64[: len(h64) - n + 1] * w[0]
                for k in range(1, n):
                    g = g + h64[k : len(h64) - n + 1 + k] * w[k]
                uniq = np.unique(g.view(np.int64))
                for c, v in zip(carry, cv):
                    out[c].extend([v] * len(uniq))
                grams_out.extend(uniq.tolist())
            out["gram"] = pd.array(grams_out, dtype="Int64")
            yield pd.DataFrame(out)

    return spread.mapInPandas(kernel, schema=out_schema)


def _sql_novelty_grams(np: int = _NOVELTY_N - 1) -> str:
    """DuckDB list expression producing the same distinct gram STRINGS
    from a ``toks`` list column (counts are hash-agnostic, the
    ``hashed_shingle_rows`` argument shared by every shingle oracle)."""
    return (
        f"list_distinct([list_aggregate(toks[i:i+{np}], 'string_agg', ' ') "
        f"FOR i IN range(1, greatest(len(toks) - {np - 1}, 1))])"
    )


@query(
    "text_ngram_novelty",
    oracle=lambda: _ngram_novelty_oracle(),
    tags=("text", "curation", "diversity"),
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus SELF-OVERLAP per document (staged for r15) — for every
    doc, the fraction of its distinct trigrams that also appear in at
    least one OTHER document. The diversity/memorization-pressure
    diagnostic a curation pass reads next to the dedup ledger: a
    shared_frac near 1.0 marks boilerplate-heavy or near-duplicate
    docs that the pairwise dedup thresholds let through; the corpus
    histogram of this number is the "how templated is this source"
    chart in a dataset audit.

    Exactness: grams are distinct SETS per doc, so each engine hashes
    independently (the Spark-side md5-polynomial kernel of
    ``_gram_posting_rows`` vs the oracle's raw strings — equality-join
    counts are hash-agnostic modulo 64-bit collisions); the one
    division is exact-integer → IEEE double.

    Scale shape: the gram doc-frequency table is a map-side-combined
    groupBy bounded by shingle vocabulary, not corpus size; the join
    back is an equi-join on a high-cardinality 64-bit key (skew
    spreads). Never a broadcast hint on the doc-frequency side (it
    grows with the vocabulary). Output is |docs| rows. The posting
    front end is referenced TWICE (doc-frequency build + the join
    probe) — down from three in the first-registered form, whose
    per-doc stats branch now falls out of the probe-side groupBy
    itself (sentinel rows carry the zero-gram docs through); a 100 TB
    run persists the postings frame once (O(corpus) storage, the
    standard trade) so the audit costs one text scan plus two
    vocab-bounded shuffles."""
    # The explicit gram repartition makes BOTH consumers' required
    # partitioning (the doc-frequency groupBy and the probe join)
    # already-satisfied on an IDENTICAL exchange subtree, so Catalyst
    # plans one ReusedExchange and the Arrow kernel runs ONCE — the
    # naive diamond re-ran kernel + scan per branch, and no extra
    # shuffle is paid because both consumers needed hash(gram) anyway.
    # For the subtrees to stay identical the sentinel rows must go
    # BEFORE the exchange on both branches (a left join would infer
    # isnotnull(gram) on its build side only); docs with no trigram
    # re-enter from a cheap tokenize-and-count scan instead.
    docs = load(spark, sf_dir, "documents")
    post = (
        _gram_posting_rows(docs, _NOVELTY_N, "doc_id")
        .filter(F.col("gram").isNotNull())
        .repartition("gram")
    )
    # count(doc_id) not count(1): doc_id is never null so the value is
    # identical, but it keeps the doc-frequency branch's projection
    # [doc_id, gram] — otherwise column pruning drops doc_id below the
    # exchange on this branch only and the subtrees stop matching.
    df_counts = post.groupBy("gram").agg(F.count("doc_id").alias("nd"))
    n_shared = F.sum(
        F.when(F.col("nd") > 1, F.lit(1)).otherwise(F.lit(0))
    ).cast("bigint")
    stats = (
        post.join(df_counts, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_grams"),
            n_shared.alias("n_shared"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_shared",
            (F.col("n_shared").cast("double") / F.col("n_grams")).alias(
                "shared_frac"
            ),
        )
    )
    empties = docs.select(
        "doc_id", F.coalesce(F.size(_tokens()), F.lit(-1)).alias("nt")
    ).filter(F.col("nt") < _NOVELTY_N)
    return stats.unionByName(
        empties.select(
            "doc_id",
            F.lit(0).cast("bigint").alias("n_grams"),
            F.lit(0).cast("bigint").alias("n_shared"),
            F.lit(None).cast("double").alias("shared_frac"),
        )
    )


def _ngram_novelty_oracle() -> str:
    """DuckDB replica of ``text_ngram_novelty`` over raw gram strings."""
    return f"""
    WITH t AS (
        SELECT doc_id, {_sql_tokens()} AS toks FROM documents
    ), g AS (
        SELECT doc_id, {_sql_novelty_grams()} AS grams FROM t
    ), post AS (
        SELECT doc_id, unnest(grams) AS gram FROM g
    ), c AS (
        SELECT gram FROM post GROUP BY gram HAVING count(*) > 1
    ), m AS (
        SELECT doc_id, count(*) AS n_shared
        FROM post JOIN c USING (gram) GROUP BY 1
    )
    SELECT g.doc_id,
           CAST(len(g.grams) AS BIGINT) AS n_grams,
           CAST(coalesce(m.n_shared, 0) AS BIGINT) AS n_shared,
           CASE WHEN len(g.grams) > 0
                THEN CAST(coalesce(m.n_shared, 0) AS DOUBLE) / len(g.grams)
                ELSE NULL END AS shared_frac
    FROM g LEFT JOIN m USING (doc_id)
    """


@query(
    "source_overlap_matrix",
    oracle=lambda: _source_overlap_oracle(),
    tags=("text", "curation", "forensics", "dedup"),
)
def source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source PROVENANCE OVERLAP matrix (staged for r15) — for
    every pair of sources, the number of distinct trigrams present in
    both and the exact Jaccard of their shingle vocabularies. This is
    the dataset-forensics table that surfaces mirrored crawls and
    re-packaged dumps (e.g. a Common-Crawl-derived source vs C4)
    BEFORE per-document dedup: two sources with high vocabulary
    Jaccard get routed into the same dedup scope; near-disjoint
    sources can be deduped independently.

    Exactness: intersect/total counts over distinct (source, gram)
    postings are hash-agnostic; Jaccard is one exact-int → IEEE
    double division.

    Scale shape — ONE linear chain, every expensive frame computed
    exactly once (the first-registered form self-joined the posting
    table and re-derived it for totals; the r15 rewrite referenced the
    Arrow posting kernel twice through a collect_set that measured
    +68 s at the 1000× tier):

    - sources fold to BIT positions in a single long (sorted source
      list is a dimension-sized driver collect off the pruned source
      column — the type-sized-metadata class of collect); per gram,
      ``bit_or`` of the one-hot masks in whole-stage codegen with
      map-side combine (bit_or is idempotent, so the posting rows
      need NO pre-distinct — one shuffle replaces two);
    - identical masks collapse (grams are interchangeable once their
      source-incidence is known), so everything downstream is sized
      by DISTINCT INCIDENCE PATTERNS (≤ 2^|sources|, practically
      hundreds), not vocabulary;
    - each mask row explodes to its singles + ordered pairs (tiny
      arrays, interpreted-HOF cost nil) and per-source totals come
      back via two window maxes over the diagonal rows — never a
      join, so the chain has no diamond for Catalyst to recompute.

    The OUTPUT is inherently |sources|²; this operator is sized by
    source cardinality, not corpus bytes. A mix with more than 64
    sources falls back to the same chain with the sorted source SET
    (collect_set over strings) in place of the bitmask — identical
    output, one aggregation tier slower."""
    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.coalesce("source", F.lit("unknown")).alias("source"),
        "text",
    )
    post = _gram_posting_rows(docs, _NOVELTY_N, "source").filter(
        F.col("gram").isNotNull()
    )
    src_list = sorted(
        r[0] for r in docs.select("source").distinct().collect()
    )
    if len(src_list) <= _BITMASK_MAX_SOURCES:
        mask_map = F.create_map(
            *[
                c
                for i, s in enumerate(src_list)
                # bit 63 is the long sign bit: lift to the signed
                # two's-complement value so the literal fits.
                for c in (
                    F.lit(s),
                    F.lit((1 << i) - ((1 << 64) if i == 63 else 0)).cast(
                        "long"
                    ),
                )
            ]
        )
        masks = (
            post.select("gram", mask_map[F.col("source")].alias("m"))
            .groupBy("gram")
            .agg(F.bit_or("m").alias("mask"))
            .groupBy("mask")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
            .withColumn(
                "ss",
                F.expr(
                    "filter(sequence(0, 63), b -> (mask & shiftleft(1L, b)) != 0)"
                ),
            )
        )
        name_of = F.array(*[F.lit(s) for s in src_list])
        def to_name(c):
            return F.element_at(name_of, c + F.lit(1))
    else:
        masks = (
            post.groupBy("gram")
            .agg(F.sort_array(F.collect_set("source")).alias("ss"))
            .groupBy("ss")
            .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        )
        def to_name(c):
            return c
    # Singles (a, a) carry per-source totals; ordered pairs (a, b),
    # a before b in the sorted list, carry intersections.
    pair_rows = masks.select(
        F.explode(
            F.expr(
                "flatten(transform(ss, (a, i) -> concat("
                "array(named_struct('ia', a, 'ib', a)), "
                "transform(slice(ss, i + 2, size(ss)), "
                "b2 -> named_struct('ia', a, 'ib', b2)))))"
            )
        ).alias("p"),
        "cnt",
    ).select(F.col("p.ia").alias("ia"), F.col("p.ib").alias("ib"), "cnt")
    c = pair_rows.groupBy("ia", "ib").agg(
        F.sum("cnt").cast("bigint").alias("n")
    )
    diag = F.max(F.when(F.col("ia") == F.col("ib"), F.col("n")))
    c = c.withColumn("ga", diag.over(Window.partitionBy("ia"))).withColumn(
        "gb", diag.over(Window.partitionBy("ib"))
    )
    union_sz = F.col("ga") + F.col("gb") - F.col("n")
    return c.filter(F.col("ia") < F.col("ib")).select(
        to_name(F.col("ia")).alias("source_a"),
        to_name(F.col("ib")).alias("source_b"),
        F.col("n").alias("n_shared_grams"),
        (F.col("n").cast("double") / union_sz).alias("jaccard"),
    )


def _source_overlap_oracle() -> str:
    """DuckDB replica of ``source_overlap_matrix`` over raw grams."""
    return f"""
    WITH t AS (
        SELECT coalesce(source, 'unknown') AS source,
               {_sql_tokens()} AS toks
        FROM documents
    ), g AS (
        SELECT source, {_sql_novelty_grams()} AS grams FROM t
    ), post AS (
        SELECT DISTINCT source, unnest(grams) AS gram FROM g
    ), totals AS (
        SELECT source, CAST(count(*) AS BIGINT) AS n_grams
        FROM post GROUP BY 1
    ), shared AS (
        SELECT a.source AS source_a, b.source AS source_b,
               CAST(count(*) AS BIGINT) AS n_shared_grams
        FROM post a JOIN post b
          ON a.gram = b.gram AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT s.source_a, s.source_b, s.n_shared_grams,
           CAST(s.n_shared_grams AS DOUBLE)
             / (ta.n_grams + tb.n_grams - s.n_shared_grams) AS jaccard
    FROM shared s
    JOIN totals ta ON ta.source = s.source_a
    JOIN totals tb ON tb.source = s.source_b
    """


_STRAT_TOTAL = 100  # target eval-set size for the stratified sampler


def stratified_sample(docs: DataFrame, k: int = _STRAT_TOTAL) -> DataFrame:
    """Stratified sampling core over an arbitrary documents frame —
    see ``text_stratified_sample`` for semantics."""
    from pyspark.sql import Window as W

    d = docs.select(
        "doc_id",
        F.coalesce("source", F.lit("unknown")).alias("source"),
        F.coalesce("lang", F.lit("und")).alias("lang"),
    )
    strata = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    w_all = W.partitionBy(F.lit(1))
    w_rk = W.partitionBy(F.lit(1)).orderBy(
        F.col("rem").desc(), "source", "lang"
    )
    strata = (
        strata.withColumn("total", F.sum("n").over(w_all))
        .withColumn("base", F.expr(f"(CAST({k} AS BIGINT) * n) div total"))
        .withColumn("rem", F.expr(f"(CAST({k} AS BIGINT) * n) % total"))
    )
    strata = strata.withColumn(
        "leftover", F.lit(k).cast("bigint") - F.sum("base").over(w_all)
    ).withColumn("rrk", F.row_number().over(w_rk))
    alloc = F.least(
        F.col("base")
        + F.when(F.col("rrk") <= F.col("leftover"), 1).otherwise(0),
        F.col("n"),
    )
    a = strata.select(
        "source", "lang", alloc.cast("bigint").alias("alloc")
    )
    w_pick = W.partitionBy("source", "lang").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    # the LITERAL k conjunct is redundant (alloc <= k by construction)
    # but it is what lets Catalyst infer WindowGroupLimit: rank-limit
    # pushdown needs a constant bound, so each task keeps only its top
    # k rows per stratum BEFORE the exchange instead of sorting whole
    # strata through the shuffle.
    return (
        d.join(F.broadcast(a), ["source", "lang"])
        .withColumn("pick_rank", F.row_number().over(w_pick).cast("bigint"))
        .filter(
            (F.col("pick_rank") <= F.lit(k).cast("bigint"))
            & (F.col("pick_rank") <= F.col("alloc"))
        )
        .select("source", "lang", "alloc", "doc_id", "pick_rank")
    )


@query(
    "text_stratified_sample",
    oracle=lambda: _stratified_sample_oracle(),
    tags=("text", "curation", "sampling", "eval"),
)
def text_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified eval-set sampling (staged for r15) — draw exactly
    ``_STRAT_TOTAL`` documents allocated across (source, language)
    strata proportionally to their document counts by the
    largest-remainder (Hamilton) method, then pick each stratum's
    quota deterministically by md5(doc_id) order. This is how a
    held-out human-eval or benchmark-seed set gets built: every
    stratum is represented in exact proportion (floors + the K -
    Σfloor leftovers to the largest fractional remainders, ties by
    stratum key), and membership depends only on doc_id — re-runs and
    backfills reproduce the same sample with no stored state.

    Exactness: quotas are pure bigint arithmetic ((K·n) div N, (K·n)
    mod N — no doubles anywhere); the md5 pick order is identical hex
    in both engines. Allocations are capped at the stratum size
    (relevant only when K approaches N).

    Scale shape: the strata table is |sources|×|langs| rows — every
    window after the one corpus-scan groupBy runs on that tiny table;
    the allocation joins back as a broadcast, and the per-stratum pick
    is a rank ≤ k window that Spark executes as WindowGroupLimit
    (partial top-k before the exchange), never a full per-stratum
    sort-materialize."""
    return stratified_sample(load(spark, sf_dir, "documents"))


def _stratified_sample_oracle(k: int = _STRAT_TOTAL) -> str:
    """DuckDB replica of ``text_stratified_sample`` — identical bigint
    quota arithmetic and md5 hex pick order."""
    return f"""
    WITH d AS (
        SELECT doc_id, coalesce(source, 'unknown') AS source,
               coalesce(lang, 'und') AS lang
        FROM documents
    ), s AS (
        SELECT source, lang, CAST(count(*) AS BIGINT) AS n
        FROM d GROUP BY 1, 2
    ), s2 AS (
        SELECT *, sum(n) OVER () AS total FROM s
    ), s3 AS (
        SELECT *, (CAST({k} AS BIGINT) * n) // total AS base,
               (CAST({k} AS BIGINT) * n) % total AS rem
        FROM s2
    ), s4 AS (
        SELECT *, CAST({k} AS BIGINT) - sum(base) OVER () AS leftover,
               row_number() OVER (ORDER BY rem DESC, source, lang) AS rrk
        FROM s3
    ), a AS (
        SELECT source, lang,
               CAST(least(base + CASE WHEN rrk <= leftover
                                      THEN 1 ELSE 0 END, n) AS BIGINT)
                 AS alloc
        FROM s4
    ), r AS (
        SELECT d.source, d.lang, a.alloc, d.doc_id,
               CAST(row_number() OVER (
                   PARTITION BY d.source, d.lang
                   ORDER BY md5(CAST(d.doc_id AS VARCHAR)), d.doc_id
               ) AS BIGINT) AS pick_rank
        FROM d JOIN a USING (source, lang)
    )
    SELECT source, lang, alloc, doc_id, pick_rank
    FROM r WHERE pick_rank <= alloc
    """


# ---------------------------------------------------------------------------
# STAGED for r15/r16 (third extended-session batch): winnowing
# fingerprint selection — the canonical document-fingerprint algorithm
# (Schleimer, Wilkerson, Aiken, "Winnowing: Local Algorithms for
# Document Fingerprinting", SIGMOD 2003 — the MOSS selector). The
# registered ``text_fingerprint`` is ONE rolling hash per document;
# winnowing keeps a position-robust SUBSET of shingle hashes with the
# guarantee that any shared run of >= _WINNOW_W + _WINNOW_K - 1 tokens
# between two documents shares at least one selected fingerprint.
# ---------------------------------------------------------------------------

_WINNOW_K = 3  # shingle width (word trigrams, the repo's dedup shingle)
_WINNOW_W = 4  # winnowing window (guarantee threshold t = W + K - 1 = 6)


def winnow_doc(tokens):
    """The per-document winnowing core, factored out of the Spark
    kernel so property sweeps can drive it without a session:
    tokens -> (n_grams, sorted distinct selected 48-bit hashes).
    Rightmost-tie window minima per the paper; sub-window documents
    degrade to one whole-document window."""
    import hashlib

    import numpy as np
    from numpy.lib.stride_tricks import sliding_window_view

    K, W = _WINNOW_K, _WINNOW_W
    grams = [
        " ".join(tokens[i : i + K]) for i in range(len(tokens) - K + 1)
    ]
    if not grams:
        return 0, np.empty(0, dtype=np.int64)
    h = np.fromiter(
        (
            int.from_bytes(hashlib.md5(g.encode()).digest()[:6], "big")
            for g in grams
        ),
        dtype=np.int64,
        count=len(grams),
    )
    if len(h) < W:
        pos = np.array([len(h) - 1 - h[::-1].argmin()])
    else:
        rev = sliding_window_view(h, W)[:, ::-1]
        pos = np.arange(len(h) - W + 1) + (W - 1) - rev.argmin(axis=1)
    return len(h), np.unique(h[np.unique(pos)])


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, n_grams, n_fingerprints, fp_min, fp_sum) — winnowing
    over word-trigram md5 hashes: per window of ``_WINNOW_W``
    consecutive shingle hashes keep the minimum, breaking ties
    RIGHTMOST (the paper's rule — it maximizes position overlap
    between adjacent windows so the selected set stays small).
    Documents shorter than one window degrade to a single
    whole-document window; documents with no trigram emit an empty
    fingerprint set (NULL min/sum).

    The fingerprint SET is summarized to exact scalars (count of
    distinct selected hashes, min, sum) so the staged oracle compares
    bit-identical bigints; the set itself is what a plagiarism /
    near-dup index would store.

    Split of work, chosen by measurement: tokenization stays a JVM
    expression (``split(trim(lower(text)))`` — the pair whose DuckDB
    parity every text op already proves; Python ``str.strip()`` would
    silently diverge on non-space whitespace). Gram join + md5 + the
    window-min selection run in ONE Arrow ``mapInPandas`` kernel with
    a strided numpy argmin — a first cut as pure Catalyst array
    lambdas was correct but interpreted per element (higher-order
    functions don't codegen): 108 s at the 100× probe tier vs ~5 s
    for this kernel. Zero shuffle beyond the Python-kernel partition
    spread, constant four-column egress; the 48-bit hash (12 md5 hex
    digits) keeps fp_sum far inside int64."""
    import pandas as pd

    from finance_pipeline_spark.operators.multimodal import (
        _spread_for_python_kernel,
    )

    with_toks = docs.select("doc_id", _tokens().alias("t"))

    def kernel(it):
        for pdf in it:
            ids, ngs, nfs, mns, sms = [], [], [], [], []
            for doc_id, toks in zip(pdf["doc_id"], pdf["t"]):
                ids.append(int(doc_id))
                nh, fps = winnow_doc(
                    list(toks) if toks is not None else []
                )
                ngs.append(nh), nfs.append(len(fps))
                if len(fps):
                    mns.append(int(fps[0])), sms.append(int(fps.sum()))
                else:
                    mns.append(None), sms.append(None)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_grams": ngs,
                    "n_fingerprints": nfs,
                    "fp_min": pd.array(mns, dtype="Int64"),
                    "fp_sum": pd.array(sms, dtype="Int64"),
                }
            )

    return _spread_for_python_kernel(with_toks).mapInPandas(
        kernel,
        schema=(
            "doc_id bigint, n_grams bigint, n_fingerprints bigint, "
            "fp_min bigint, fp_sum bigint"
        ),
    )


# Registered r16 (staged third batch; dual-scale oracle-proven by
# tools/check_staged.py since r15). The oracle builder is defined
# below, so the decorator takes the lambda form (resolved lazily by
# QuerySpec.oracle_text()).
@query(
    "text_winnow_fingerprint",
    oracle=lambda: _winnow_oracle(),
    tags=("text", "fingerprint", "winnowing", "dedup"),
)
def text_winnow_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken
    2003, the MOSS algorithm): per doc, hash every k-gram, slide a
    w-window over the hash sequence, keep each window's minimum
    (rightmost tie-break) — a position-robust fingerprint set with a
    guaranteed match on any shared run of length w + k - 1. Emits
    per-doc fingerprint-set summaries (count, min, sum) the oracle
    checks exactly."""
    return winnow_fingerprints(load(spark, sf_dir, "documents"))


def _winnow_oracle() -> str:
    """DuckDB replica of ``text_winnow_fingerprint`` — same trigram
    construction, 12-hex-digit md5 hash, rightmost-tie window minima."""
    K, W = _WINNOW_K, _WINNOW_W
    return f"""
    WITH t AS (
        SELECT doc_id, {_sql_tokens()} AS t FROM documents
    ), g AS (
        SELECT doc_id,
               CASE WHEN len(t) >= {K} THEN
                 [t[i] || ' ' || t[i + 1] || ' ' || t[i + 2]
                  FOR i IN range(1, len(t) - {K - 2})]
               ELSE CAST([] AS VARCHAR[]) END AS grams
        FROM t
    ), h AS (
        SELECT doc_id,
               [('0x' || substr(md5(g), 1, 12))::BIGINT FOR g IN grams] AS h
        FROM g
    ), w AS (
        SELECT doc_id, h, len(h) AS nh,
               CASE WHEN len(h) = 0 THEN 0
                    WHEN len(h) < {W} THEN 1
                    ELSE len(h) - {W} + 1 END AS nwin
        FROM h
    ), sel AS (
        SELECT doc_id, nh,
               list_distinct([h[p] FOR p IN list_distinct([
                 list_max([i FOR i IN range(j, least(j + {W} - 1, nh) + 1)
                           IF h[i] = list_min(h[j : least(j + {W} - 1, nh)])])
                 FOR j IN range(1, nwin + 1)])]) AS fps
        FROM w
    )
    SELECT doc_id,
           CAST(nh AS BIGINT) AS n_grams,
           CAST(len(fps) AS BIGINT) AS n_fingerprints,
           CAST(list_min(fps) AS BIGINT) AS fp_min,
           CAST(list_sum(fps) AS BIGINT) AS fp_sum
    FROM sel
    """


# ---------------------------------------------------------------------------
# STAGED for r16 (fourth extended-session batch): Count-Min Sketch
# heavy hitters (Cormode & Muthukrishnan 2005) — the mergeable-sketch
# member of the approx family (GK quantiles and Spark HLL are already
# registered). The sketch is the 100 TB shape for frequency tracking:
# counters merge by ADDITION, so map-side combine reduces any corpus
# to a fixed d×w int64 grid regardless of scale.
# ---------------------------------------------------------------------------

_CMS_D = 4  # hash rows
# Buckets per row — deliberately UNDERSIZED for the corpus's 31-token
# vocabulary so the sketch actually pays collision noise here (at
# w=1024 every overestimate was 0 and the >= invariant was vacuous;
# at w=16/d=4, 14 of 31 tokens overestimate, and d=4's min-over-rows
# visibly beats d=2's 22 — measured before sizing). A production
# sketch sizes w ~ e/eps >> vocabulary; the MATH is identical.
_CMS_W = 16


def _cms_bucket(r: int):
    """Bucket of the ``tok`` column under hash row r — md5-derived so
    both engines compute it identically."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(f"{r}:"), F.col("tok"))), 1, 12),
        16,
        10,
    ).cast("bigint") % _CMS_W


# Registered r16 (staged fourth batch; dual-scale oracle-proven by
# tools/check_staged.py since r15). Lambda oracle: builder defined below.
@query(
    "text_cms_heavy_hitters",
    oracle=lambda: _cms_oracle(),
    tags=("text", "sketch", "approx", "heavy-hitters"),
)
def text_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(token, exact_count, cms_estimate, overestimate) for the true
    top-20 tokens — a Count-Min Sketch built over the corpus, read
    back next to exact truth so the sketch's defining guarantee
    (estimate >= exact, ALWAYS) is an oracle-checked invariant and
    the overestimate column shows the collision noise a 4×1024 sketch
    actually pays on this vocabulary.

    Plan: one exploded-token scan feeds ONE exact groupBy(token)
    (map-side combined — the only corpus-sized shuffle); the sketch is
    then built FROM the frequency vector (counter(r,b) = sum of counts
    of tokens hashing there — identical to streaming every token, at
    vocabulary cost instead of corpus cost), so the d×w counter grid
    (≤4,096 rows) and the top-20 (TakeOrderedAndProject) are both
    type-sized. Estimates come from exploding the top-20 into
    (token, row, bucket) and a broadcast join against the counter
    grid, min over rows. At 100 TB nothing but the first groupBy
    grows; the sketch itself is 32 KiB."""
    d = load(spark, sf_dir, "documents")
    counts = (
        d.select(F.explode(_tokens()).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    ).localCheckpoint(eager=False)

    grid = (
        counts.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("r"), _cms_bucket(r).alias("b")
                        )
                        for r in range(_CMS_D)
                    ]
                )
            ).alias("rb"),
            "c",
        )
        .groupBy(F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
        .agg(F.sum("c").alias("counter"))
    )

    top = counts.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(20)
    probes = top.select(
        "tok",
        F.col("c").alias("exact_count"),
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(r).alias("r"), _cms_bucket(r).alias("b"))
                    for r in range(_CMS_D)
                ]
            )
        ).alias("rb"),
    ).select("tok", "exact_count", F.col("rb.r").alias("r"), F.col("rb.b").alias("b"))
    est = (
        probes.join(F.broadcast(grid), ["r", "b"])
        .groupBy("tok", "exact_count")
        .agg(F.min("counter").alias("cms_estimate"))
    )
    return est.select(
        F.col("tok").alias("token"),
        F.col("exact_count").cast("bigint"),
        F.col("cms_estimate").cast("bigint"),
        (F.col("cms_estimate") - F.col("exact_count"))
        .cast("bigint")
        .alias("overestimate"),
    )


def _cms_oracle() -> str:
    """DuckDB replica of ``text_cms_heavy_hitters`` — same md5 bucket
    derivation, frequency-vector sketch build, min-over-rows read."""
    d, w = _CMS_D, _CMS_W
    return f"""
    WITH counts AS (
        SELECT tok, CAST(count(*) AS BIGINT) AS c
        FROM (SELECT unnest({_sql_tokens()}) AS tok FROM documents)
        GROUP BY tok
    ), grid AS (
        SELECT r, ('0x' || substr(md5(r || ':' || tok), 1, 12))::BIGINT
                 % {w} AS b,
               sum(c) AS counter
        FROM counts, range(0, {d}) t(r)
        GROUP BY 1, 2
    ), top AS (
        SELECT tok, c FROM counts ORDER BY c DESC, tok ASC LIMIT 20
    ), probes AS (
        SELECT tok, c, r,
               ('0x' || substr(md5(r || ':' || tok), 1, 12))::BIGINT
                 % {w} AS b
        FROM top, range(0, {d}) t(r)
    )
    SELECT p.tok AS token,
           CAST(p.c AS BIGINT) AS exact_count,
           CAST(min(g.counter) AS BIGINT) AS cms_estimate,
           CAST(min(g.counter) - p.c AS BIGINT) AS overestimate
    FROM probes p JOIN grid g USING (r, b)
    GROUP BY p.tok, p.c
    """
