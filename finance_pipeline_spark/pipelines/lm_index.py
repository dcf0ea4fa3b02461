"""Stored corpus bigram-LM — the persistent form of the
``text_lm_familiarity`` quality screen.

The registered operator trains its LM on the batch it scores; a
streaming ingest can't do that — each micro-batch is too small to
estimate "what does this corpus's language look like", and re-reading
the whole corpus per batch is exactly the cost the stored dedup index
exists to avoid. This component persists the LM state the same way
``CorpusDedupIndex`` persists dedup state — two transactional count
tables with APPEND-ONLY delta rows:

- ``uni/`` — key ``(lang, w, token)``: per-add, per-language unigram
  counts.
- ``bi/``  — key ``(lang, w1, w2, token)``: per-add, per-language
  bigram counts.

``token`` is a content address of the added batch (order-free digest
sum over the batch's (lang, text) rows), so a crashed-and-retried add
is a keyed no-op — counts can never double. Readers fold deltas with
SUM (an associative, commutative merge: concurrent adds can never lose
each other's counts — the bloom table's append-only lesson applied to
integers); ``optimize()`` folds accumulated deltas back to one row per
key.

``familiarity(batch)`` then scores NEW docs against the STORED corpus
with the operator's exact semantics (top-``_LM_VOCAB`` vocabulary,
``<unk>`` mapping, mean-bigram-frequency score, corpus-mean/X flag),
derived from the folded counts instead of the batch: stored-unseen
pairs score frequency 0, which is the point — gibberish scores low
against an established corpus even when the probe batch is 3 docs.

PER-LANGUAGE means (r9 verdict item 1): the vocabulary and the bigram
frequency table stay GLOBAL — exactly the batch operator's semantics
(``lm_familiarity`` builds one top-V vocab and one c2 over the whole
frame) — but the corpus-mean each doc's score is flagged against is
its LANGUAGE's mean, derived from the per-lang count split. This
closes the batch-vs-streaming semantic gap: the batch operator and
curation stage 1b score ``mean_keys=("lang",)``, so a minority
language's globally-rare bigrams no longer flag its every document on
the STREAMING path either. Batches without a ``lang`` column count
under ``'und'`` (one group — degenerates to the old global mean, so
single-language callers are unchanged row-for-row).

LEGACY LAYOUT: tables written before the lang key carry no ``lang``
column. Read paths fold those rows under ``'und'`` (mergeSchema reads
them as null). WRITE paths need the migration first — ``add`` into a
legacy table auto-runs ``optimize()``, whose journaled fold rewrites
every surviving row with the lang key (delete-all-tokens → merge
new-schema rows lands on an empty file set, so the keyed anti-join
never probes a lang-less file). Cross-version replay is guarded
in-band (advisor r10): the migrating fold records the retired
text-only add-tokens in ``legacy_tokens.json`` and ``add()`` checks
incoming batches against that set by their OLD-format token, so a
pre-upgrade in-flight add crash-replayed after the upgrade is skipped
(loudly) instead of double-counting under a fresh (lang, text) token.

Scale shape: count tables hold TYPES, not instances — they grow with
vocabulary (unigrams) and observed transition types (bigrams), both
sub-linear in corpus size. The fold is one map-side-combined SUM per
table; the vocabulary cut is a top-V TakeOrdered; the c2 build
re-keys the stored bigram types through the (broadcast) vocab — one
pass over the TYPE table, never the corpus. Scoring is the shared
``lm_score``: broadcast joins against the pair stream, one per-doc
rollup shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.operators import textops
from finance_pipeline_spark.operators.textops import (
    lm_clean,
    lm_map_to_vocab,
    lm_pairs,
    lm_score,
)
from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable


def _content_token(df: DataFrame, src, prefix: str) -> str:
    """Order-free content address of a frame: the SUM of a 60-bit
    integer digest of ``src`` (a Column) per row plus the row count.
    Deterministic for the same content regardless of partitioning —
    the single token idiom for both add batches and optimize folds, so
    the two token spaces can never drift apart."""
    row = df.agg(
        F.sum(
            F.conv(
                F.substring(F.sha2(F.encode(src, "UTF-8"), 256), 1, 15), 16, 10
            ).cast("decimal(38,0)")
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"{prefix}-{row['s']}-{row['n']}"


def _with_lang(batch: DataFrame) -> DataFrame:
    """Normalize a batch to (doc_id, lang, text): a missing or null
    ``lang`` becomes ``'und'`` — one copy of the rule for add, score,
    and token digest, so the three can never disagree on grouping."""
    lang = (
        F.coalesce(F.col("lang"), F.lit("und"))
        if "lang" in batch.columns
        else F.lit("und")
    )
    return batch.select("doc_id", lang.alias("lang"), "text")


def _batch_token(batch: DataFrame) -> str:
    """Content address of a NORMALIZED (doc_id, lang, text) batch.
    Same batch → same token → the keyed merge makes re-adds no-ops
    (crash-retry, at-least-once streaming delivery). ``lang`` is part
    of the digest: two batches with identical texts but different
    language tags are different content — sharing a token would make
    ``screen_before``'s self-exclusion exclude the other batch too."""
    return _content_token(
        batch,
        F.concat_ws("\x1f", F.col("lang"), F.coalesce("text", F.lit(""))),
        "add",
    )


class CorpusLmIndex:
    """Append-only bigram-LM state over (doc_id, text) batches.

    Typical streaming loop (alongside a ``CorpusDedupIndex``)::

        lm = CorpusLmIndex(spark, "/warehouse/lm_index")
        scores = lm.familiarity(batch)   # vs the STORED corpus
        lm.add(batch.join(keeps, "doc_id"))  # grow the LM on survivors
    """

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = str(root)
        self.uni = TxnKeyedTable(
            spark, f"{self.root}/uni", ["lang", "w", "token"]
        )
        self.bi = TxnKeyedTable(
            spark, f"{self.root}/bi", ["lang", "w1", "w2", "token"]
        )
        # trigram deltas (r12): feeds perplexity3's KN order-3 chain.
        # Indexes created before this table exist fine — tri/ stays
        # absent until the first post-upgrade add, and perplexity3
        # refuses an index whose trigram counts don't cover its adds.
        self.tri = TxnKeyedTable(
            spark, f"{self.root}/tri", ["lang", "w1", "w2", "w3", "token"]
        )
        self._recover_folds()

    @staticmethod
    def _norm_lang(df: DataFrame) -> DataFrame:
        """Stored rows → guaranteed (lang, ...) shape: legacy files
        carry no lang column (pre-lang layout) or read as null through
        mergeSchema — both fold under 'und'."""
        if "lang" not in df.columns:
            return df.withColumn("lang", F.lit("und"))
        return df.withColumn("lang", F.coalesce("lang", F.lit("und")))

    def _fold_sidecar(self, name: str):
        from pathlib import Path

        return Path(self.root) / f"{name}_fold_inflight"

    def _recover_folds(self) -> None:
        """Finish a fold that crashed mid-way. Unlike the bloom's
        bit_or, SUM deltas are NOT idempotent under partial folds — a
        fold that merged its consolidated rows while the old deltas
        still existed would double-count. So ``optimize`` journals the
        fold in a sidecar (rows parquet + doomed-token list, the list
        written LAST as the commit marker) and replays it here: delete
        the doomed tokens (no-op if already gone), merge the fold rows
        (keyed — no-op if already in), drop the sidecar. Every step is
        idempotent, so any crash point converges on reopen."""
        import json as _json
        import shutil

        for name, tbl in (
            ("uni", self.uni),
            ("bi", self.bi),
            ("tri", self.tri),
        ):
            side = self._fold_sidecar(name)
            if not side.exists():
                continue
            marker = side / "doomed.json"
            try:
                doomed = _json.loads(marker.read_text())["doomed"]
            except (FileNotFoundError, ValueError, KeyError):
                # missing or torn marker: the fold never started
                # deleting (the marker is written atomically BEFORE any
                # table mutation), so the delta rows are intact —
                # discard and move on. Tolerating a torn marker matters:
                # raising here would brick every subsequent open.
                shutil.rmtree(side, ignore_errors=True)
                continue
            rows = self._norm_lang(
                self.spark.read.parquet(str(side / "rows.parquet"))
            )  # legacy sidecar (pre-lang fold) replays under 'und'
            if doomed:
                tbl.delete(F.col("token").isin(doomed))
            tbl.merge(rows)
            shutil.rmtree(side, ignore_errors=True)

    # -- write side ----------------------------------------------------

    def _is_legacy_layout(self) -> bool:
        """True when stored files predate the lang key (no lang
        column): new-schema merges can't anti-join against them."""
        stored = self.uni.read()
        if stored is not None and "lang" not in stored.columns:
            return True
        stored_bi = self.bi.read()
        return stored_bi is not None and "lang" not in stored_bi.columns

    def _legacy_tokens_path(self):
        from pathlib import Path

        return Path(self.root) / "legacy_tokens.json"

    def _legacy_tokens(self) -> set[str]:
        """Add-tokens the pre-lang layout had stored at migration time
        (recorded by the migrating fold). Used to detect cross-version
        replays: those batches' counts are already folded in, but the
        token formula changed (text-only → (lang, text)), so the keyed
        merge alone can't recognize them."""
        import json

        try:
            return set(json.loads(self._legacy_tokens_path().read_text()))
        except (FileNotFoundError, ValueError):
            return set()

    def _record_legacy_tokens(self, tokens: list[str]) -> None:
        import json
        import os

        merged = sorted(self._legacy_tokens() | set(tokens))
        tmp = self._legacy_tokens_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps(merged))
        os.replace(tmp, self._legacy_tokens_path())

    def add(self, batch: DataFrame) -> dict:
        """Fold a batch's per-language unigram/bigram counts into the
        stored LM (missing/null lang → 'und'). Idempotent per batch
        content; counts are delta rows, so concurrent adds merge
        without loss. A legacy (pre-lang) table migrates first via the
        journaled fold — a one-time optimize() under the writer lock,
        so the first post-upgrade add may lose the lock race loudly
        (retry; the standing optimize contract). Returns accounting.

        Cross-version replay guard (advisor r10): batch tokens digest
        (lang, text) since the lang upgrade, so a pre-upgrade in-flight
        add crash-replayed AFTER the migration would mint a fresh token
        and double-count. The migrating fold records the legacy table's
        add-tokens in ``legacy_tokens.json``; a replay is recognized by
        its OLD-format (text-only) token and skipped as already
        counted. (Content-identical texts under different lang tags
        also match the text-only digest — such a replay keeps the
        pre-upgrade 'und' attribution rather than re-counting, the
        conservative choice.) The check costs one batch scan and only
        runs while the sidecar is non-empty."""
        if self._is_legacy_layout():
            self.optimize()
        legacy_seen = self._legacy_tokens()
        if legacy_seen:
            old_token = _content_token(
                batch, F.coalesce("text", F.lit("")), "add"
            )
            if old_token in legacy_seen:
                get_logger().warning(
                    "CorpusLmIndex.add: batch matches pre-migration "
                    "token %s — counts already folded in at the lang "
                    "upgrade; skipping to avoid double-counting",
                    old_token,
                )
                return {
                    "token": old_token,
                    "uni_rows": 0,
                    "bi_rows": 0,
                    "skipped_legacy_replay": True,
                }
        b2 = _with_lang(batch)
        token = _batch_token(b2)
        clean = lm_clean(b2, ("doc_id", "lang"))
        uni = (
            clean.select("lang", F.explode("toks").alias("w"))
            .groupBy("lang", "w")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("token", F.lit(token))
        )
        bi = (
            lm_pairs(clean, ("lang",))
            .groupBy(
                "lang", F.col("w1a").alias("w1"), F.col("w2a").alias("w2")
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("token", F.lit(token))
        )
        # a SENTINEL row (empty-string grams — impossible for real
        # triples, lm_clean filters empty tokens) records this add in
        # tri/ even when no doc has 3 tokens: perplexity3's coverage
        # check compares bi-vs-tri token sets, and a legitimately
        # trigram-less batch must not read as missing coverage
        sentinel = self.spark.createDataFrame(
            [("und", "", "", "", token, 0)],
            "lang string, w1 string, w2 string, w3 string, "
            "token string, n bigint",
        )
        tri = (
            textops.lm_triples(clean, ("lang",))
            .groupBy(
                "lang",
                F.col("w1a").alias("w1"),
                F.col("w2a").alias("w2"),
                F.col("w3a").alias("w3"),
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("token", F.lit(token))
            .unionByName(sentinel)
        )
        u = self.uni.merge(uni.select("lang", "w", "token", "n"))
        b = self.bi.merge(bi.select("lang", "w1", "w2", "token", "n"))
        t3 = self.tri.merge(tri.select("lang", "w1", "w2", "w3", "token", "n"))
        return {
            "token": token,
            "uni_rows": u.inserted,
            "bi_rows": b.inserted,
            "tri_rows": t3.inserted,
        }

    # -- read side -----------------------------------------------------

    def _folded_uni(self, exclude_token: str | None = None) -> DataFrame | None:
        stored = self.uni.read()
        if stored is None:
            return None
        if exclude_token is not None:
            stored = stored.filter(F.col("token") != exclude_token)
        return (
            self._norm_lang(stored)
            .groupBy("lang", "w")
            .agg(F.sum("n").alias("n"))
        )

    def _folded_bi(self, exclude_token: str | None = None) -> DataFrame | None:
        stored = self.bi.read()
        if stored is None:
            return None
        if exclude_token is not None:
            stored = stored.filter(F.col("token") != exclude_token)
        return (
            self._norm_lang(stored)
            .groupBy("lang", "w1", "w2")
            .agg(F.sum("n").alias("n"))
        )

    # -- trigram coverage state (r13 advisor fix) -----------------------

    def _tri_coverage_path(self):
        from pathlib import Path

        return Path(self.root) / "tri_coverage.json"

    def _read_tri_coverage(self) -> bool | None:
        """Persisted coverage verdict, or None when no fold has
        recorded one yet (index predates the marker, or was never
        optimized)."""
        import json

        try:
            return bool(
                json.loads(self._tri_coverage_path().read_text())["covered"]
            )
        except (FileNotFoundError, ValueError, KeyError):
            return None

    def _write_tri_coverage(self, covered: bool) -> None:
        import json
        import os

        tmp = self._tri_coverage_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps({"covered": covered}))
        os.replace(tmp, self._tri_coverage_path())

    def _tri_covered(self) -> tuple[bool, list[str]]:
        """Does the stored trigram table cover every count in the
        stored bigram table? Returns (covered, missing_add_tokens).

        The r12 token-shape heuristic alone could be LAUNDERED by
        ``optimize()`` (r13 advisor, medium): with a pre-upgrade
        corpus (bi folded, tri absent) plus one post-upgrade add,
        the shapes correctly read uncovered — but a fold consolidates
        every token into one ``fold-*`` row per table, after which
        ``tri_folded=True`` and ``missing=∅`` read as covered even
        though the trigram counts span only the post-upgrade adds.
        So the verdict is now PERSISTED: ``_optimize_locked`` computes
        it on the pre-fold state (while the token evidence is intact)
        and writes ``tri_coverage.json`` atomically BEFORE folding;
        once recorded, the marker supersedes the shape heuristic.
        Precedence here:

        1. no bi counts → vacuously covered;
        2. bi counts but no tri table → uncovered (pre-upgrade);
        3. a bi add-token absent from tri → uncovered regardless of
           the marker (an add crashed between its bi and tri merges —
           replaying the add repairs it, so this is checked live);
        4. marker present → its verdict (fold shapes are no evidence
           after a fold, and a fold crash-window leaves bi folded
           while tri isn't even on a genuinely covered index);
        5. no marker → the r12 shape heuristic (a folded bi whose tri
           never folded means tri missed the folded history).
        """
        bi_stored = self.bi.read()
        if bi_stored is None:
            return True, []
        tri_stored = self.tri.read()
        if tri_stored is None:
            return False, []
        bi_tokens = {
            r["token"] for r in bi_stored.select("token").distinct().collect()
        }
        tri_tokens = {
            r["token"]
            for r in tri_stored.select("token").distinct().collect()
        }
        bi_adds = {t for t in bi_tokens if t.startswith("add-")}
        tri_adds = {t for t in tri_tokens if t.startswith("add-")}
        missing = sorted(bi_adds - tri_adds)
        if missing:
            return False, missing
        marker = self._read_tri_coverage()
        if marker is not None:
            return marker, []
        bi_folded = bool(bi_tokens - bi_adds)
        tri_folded = bool(tri_tokens - tri_adds)
        return not (bi_folded and not tri_folded), []

    def _folded_tri(self, exclude_token: str | None = None) -> DataFrame | None:
        stored = self.tri.read()
        if stored is None:
            return None
        if exclude_token is not None:
            stored = stored.filter(F.col("token") != exclude_token)
        return (
            self._norm_lang(stored)
            .filter(F.col("w1") != "")  # drop add-coverage sentinels
            .groupBy("lang", "w1", "w2", "w3")
            .agg(F.sum("n").alias("n"))
        )

    def _score_against(
        self, uni: DataFrame, bi: DataFrame, batch: DataFrame
    ) -> DataFrame:
        # GLOBAL vocabulary — the operator builds one top-V cut over
        # the whole frame, languages pooled; matching it exactly is
        # what makes the two-language parity test row-for-row.
        vocab = (
            uni.groupBy("w")
            .agg(F.sum("n").alias("n"))
            .orderBy(F.col("n").desc(), "w")
            .limit(textops._LM_VOCAB)
            .select("w")
        )
        # re-key the stored bigram TYPES through the vocab (types, not
        # instances: one pass over the count table, never the corpus),
        # keeping the per-lang split (c2l) for the means; the scoring
        # frequency table (c2) is the lang-pooled sum — again the
        # operator's semantics (one global c2, per-lang means only).
        c2l = (
            lm_map_to_vocab(
                bi.select(
                    "lang",
                    F.col("w1").alias("w1a"),
                    F.col("w2").alias("w2a"),
                    "n",
                ),
                vocab,
            )
            .groupBy("lang", "w1", "w2")
            .agg(F.sum("n").alias("n_l"))
        )
        c2 = c2l.groupBy("w1", "w2").agg(F.sum("n_l").alias("freq"))
        # per-language corpus mean = for language L, sum over L's pair
        # INSTANCES of their type's GLOBAL frequency / L's instance
        # count = Σ_t n_L(t)·freq(t) / Σ_t n_L(t) — over SCORED types
        # only: the '<unk> <unk>' type is excluded, matching lm_score's
        # per-doc exclusion (the r8 advisor inversion fix).
        # Counts cast to double BEFORE the product: long×long overflows
        # at ~3e9 instances of one type, and ANSI mode turns that into
        # a query-killing exception. The double product is exact below
        # 2^53 (so the operator-parity test is unaffected) and
        # correctly-rounded above (fine — the flag is a heuristic at
        # that magnitude).
        nl = F.col("n_l").cast("double")
        fd = F.col("freq").cast("double")
        gavg = (
            c2l.join(c2, ["w1", "w2"])
            .filter(
                ~(
                    (F.col("w1") == F.lit("<unk>"))
                    & (F.col("w2") == F.lit("<unk>"))
                )
            )
            .groupBy("lang")
            .agg(F.sum(nl * fd).alias("_ff"), F.sum(nl).alias("_f"))
            .select(
                "lang",
                F.when(F.col("_f") > 0, F.col("_ff") / F.col("_f")).alias(
                    "gavg"
                ),
            )
        )
        mapped = lm_map_to_vocab(
            lm_pairs(lm_clean(_with_lang(batch), ("doc_id", "lang")), ("doc_id", "lang")),
            vocab,
        )
        return lm_score(mapped, c2, gavg, mean_keys=("lang",))

    def familiarity(self, batch: DataFrame) -> DataFrame:
        """Score (doc_id[, lang], text) docs against the STORED corpus
        LM: (doc_id, lang, n_bigrams, n_scored, sum_freq, familiarity,
        unfamiliar) — the ``text_lm_familiarity`` semantics with
        vocabulary, bigram frequencies, and the corpus means all taken
        from stored state. The flag compares each doc to ITS
        LANGUAGE's stored mean (``mean_keys=("lang",)`` — the batch
        operator's default), so streaming and batch agree on
        multilingual corpora (r9 verdict item 1); a mixed-language
        corpus matches the operator row-for-row when probe == stored
        corpus (pinned by the two-language parity test). Docs whose
        language has no stored instances get a null mean → never
        flagged by the mean compare (n_scored = 0 still flags).
        Batches without a lang column score under 'und' — on a
        single-language corpus that degenerates to the old global
        mean, unchanged row-for-row. Raises on an empty index: a
        screen against no corpus is meaningless and silently keeping
        everything would mask a wiring bug."""
        uni, bi = self._folded_uni(), self._folded_bi()
        if uni is None or bi is None:
            raise ValueError(
                "CorpusLmIndex.familiarity on an empty index — add() a "
                "corpus first"
            )
        return self._score_against(uni, bi, batch)

    def perplexity(self, batch: DataFrame) -> DataFrame:
        """Interpolated Kneser-Ney bigram perplexity of NEW docs
        against the STORED corpus counts — the streaming/serving form
        of ``text_kn_perplexity`` (same D = 0.75, same decimal-sum
        rounding chain; parity-pinned ROW-IDENTICAL when the probe
        equals the stored corpus). KN counts are lang-POOLED, matching
        the batch operator's full-corpus model.

        Unseen events (a probe can contain words the corpus never
        saw) back off deterministically: unseen pair → discounted
        term 0, interpolation weight still applies; unseen CONTEXT →
        pure continuation probability; unseen continuation word →
        half-count floor 0.5/T (so log is always finite). Every branch
        is a documented constant, not a runtime fallback.

        Scale shape: identical to the batch operator — TYPE-sized
        count tables broadcast onto the probe's pair stream; the
        stored corpus is never rescanned (counts come from the folded
        delta tables). The batch operator's boundedness caveat applies
        equally here: past broadcast-sized type tables, cut to a top-V
        vocabulary or let the probe joins shuffle on (w1, w2)."""
        bi = self._folded_bi()
        if bi is None:
            raise ValueError(
                "CorpusLmIndex.perplexity on an empty index — add() a "
                "corpus first"
            )
        kn_d = textops._KN_D
        c2 = (
            bi.groupBy("w1", "w2")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
        c1 = c2.groupBy("w1").agg(
            F.sum("n").alias("ctx"), F.count(F.lit(1)).alias("kf")
        )
        n1p = c2.groupBy("w2").agg(F.count(F.lit(1)).alias("kp"))
        t = float(c2.count())
        pairs = lm_pairs(lm_clean(batch.select("doc_id", "text"))).select(
            "doc_id", F.col("w1a").alias("w1"), F.col("w2a").alias("w2")
        )
        j = (
            pairs.join(F.broadcast(c2), ["w1", "w2"], "left")
            .join(F.broadcast(c1), "w1", "left")
            .join(F.broadcast(n1p), "w2", "left")
        )
        pcont = F.coalesce(F.col("kp").cast("double"), F.lit(0.5)) / F.lit(t)
        # greatest() is a no-op on the seen path ((n-D)/ctx, n >= 1),
        # so probe == corpus reproduces the operator bit-for-bit
        p_seen = (
            F.greatest(
                F.coalesce(F.col("n").cast("double"), F.lit(0.0)) - F.lit(kn_d),
                F.lit(0.0),
            )
            / F.col("ctx").cast("double")
        ) + (
            (F.lit(kn_d) * F.col("kf").cast("double"))
            / F.col("ctx").cast("double")
        ) * pcont
        p = F.when(F.col("ctx").isNotNull(), p_seen).otherwise(pcont)
        scored = j.select(
            "doc_id", F.round(F.log(p), 6).cast("decimal(38,6)").alias("logp")
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

    def perplexity3(self, batch: DataFrame) -> DataFrame:
        """Interpolated Kneser-Ney TRIGRAM perplexity of NEW docs
        against the STORED trigram counts — the streaming/serving form
        of ``text_kn3_perplexity`` (same D = 0.75, same decimal-sum
        rounding chain; parity-pinned ROW-IDENTICAL when the probe
        equals the stored corpus). Counts are lang-POOLED like
        ``perplexity``.

        Backoff for unseen events, each branch a documented constant:
        unseen trigram → discounted term 0, interpolation weight still
        applies to the bigram term; unseen (w1,w2) CONTEXT → pure
        P(w3|w2); unseen (w2,w3) continuation type → discounted term 0
        at the bigram level; unseen middle w2 → pure continuation
        unigram; unseen w3 → half-count floor 0.5/U (log stays
        finite). The seen path reproduces the batch operator
        bit-for-bit (greatest() and coalesce() are no-ops there).

        COVERAGE CONTRACT (r12 review finding, hardened r13): a
        pre-upgrade index plus one post-upgrade add would otherwise
        SILENTLY score against trigram counts covering only the new
        add. Every add stamps a sentinel row into tri/, so coverage
        is checkable; ``_tri_covered`` holds the full verdict logic,
        and — because a fold consolidates tokens and would otherwise
        launder the shape evidence (r13 advisor) — ``optimize()``
        persists the pre-fold verdict to ``tri_coverage.json``, which
        this method honors over the shapes."""
        tri = self._folded_tri()
        if tri is None:
            raise ValueError(
                "CorpusLmIndex.perplexity3 on an index without trigram "
                "counts — the corpus was added before the trigram "
                "upgrade (or never); re-add it or rebuild the index"
            )
        covered, missing = self._tri_covered()
        if not covered:
            raise ValueError(
                "CorpusLmIndex.perplexity3: trigram counts do not "
                "cover every stored count (pre-upgrade corpus + "
                "post-upgrade adds, or an add crashed between its "
                "bigram and trigram merges) — replay the in-flight "
                "add if the uncovered-token list below is non-empty, "
                "otherwise rebuild the index; uncovered add tokens: "
                f"{missing[:5]}"
            )
        kn_d = textops._KN_D
        c3 = (
            tri.groupBy("w1", "w2", "w3")
            .agg(F.sum("n").alias("n"))
            .localCheckpoint(eager=True)
        )
        ctx12 = c3.groupBy("w1", "w2").agg(
            F.sum("n").alias("ctx"), F.count(F.lit(1)).alias("kf")
        )
        cont23 = c3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("kc"))
        mid2 = cont23.groupBy("w2").agg(
            F.sum("kc").alias("m2"), F.count(F.lit(1)).alias("kf2")
        )
        uni3 = cont23.groupBy("w3").agg(F.count(F.lit(1)).alias("ku"))
        u = float(cont23.count())
        if u == 0:
            raise ValueError(
                "CorpusLmIndex.perplexity3: the stored corpus has no "
                "trigrams to model (every added doc was under 3 tokens)"
            )
        trips = textops.lm_triples(
            lm_clean(batch.select("doc_id", "text"))
        ).select(
            "doc_id",
            F.col("w1a").alias("w1"),
            F.col("w2a").alias("w2"),
            F.col("w3a").alias("w3"),
        )
        j = (
            trips.join(F.broadcast(c3), ["w1", "w2", "w3"], "left")
            .join(F.broadcast(ctx12), ["w1", "w2"], "left")
            .join(F.broadcast(cont23), ["w2", "w3"], "left")
            .join(F.broadcast(mid2), "w2", "left")
            .join(F.broadcast(uni3), "w3", "left")
        )
        p1 = F.coalesce(F.col("ku").cast("double"), F.lit(0.5)) / F.lit(u)
        p2_seen = (
            F.greatest(
                F.coalesce(F.col("kc").cast("double"), F.lit(0.0))
                - F.lit(kn_d),
                F.lit(0.0),
            )
            / F.col("m2").cast("double")
        ) + (
            (F.lit(kn_d) * F.col("kf2").cast("double"))
            / F.col("m2").cast("double")
        ) * p1
        p2 = F.when(F.col("m2").isNotNull(), p2_seen).otherwise(p1)
        p3_seen = (
            F.greatest(
                F.coalesce(F.col("n").cast("double"), F.lit(0.0))
                - F.lit(kn_d),
                F.lit(0.0),
            )
            / F.col("ctx").cast("double")
        ) + (
            (F.lit(kn_d) * F.col("kf").cast("double"))
            / F.col("ctx").cast("double")
        ) * p2
        p3 = F.when(F.col("ctx").isNotNull(), p3_seen).otherwise(p2)
        scored = j.select(
            "doc_id", F.round(F.log(p3), 6).cast("decimal(38,6)").alias("logp")
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

    def screen_before(self, batch: DataFrame) -> DataFrame | None:
        """``familiarity`` for a batch that will subsequently be
        ``add``-ed — scores against the stored corpus EXCLUDING this
        batch's own delta token. The streaming ingest needs exactly
        this: on a crash-replay the batch's counts are already stored,
        and without the exclusion the batch would be judged against
        itself (its gibberish has stored freq ≥ 1 → scores familiar —
        the wrong flag would persist in the kept table forever). With
        it, first delivery and replay score against the identical
        state. Known residual: if an ``optimize`` folded the batch's
        token away BETWEEN crash and replay, the exclusion misses and
        the replayed flags may differ — the flag is observational by
        design, and maintenance folds shouldn't run mid-recovery
        anyway (see ``optimize``'s single-writer note).

        Returns None when there is no prior corpus to judge against
        (empty index, or the only stored content IS this batch)."""
        if not self.bi.exists():
            return None
        token = _batch_token(_with_lang(batch))
        uni = self._folded_uni(exclude_token=token)
        bi = self._folded_bi(exclude_token=token)
        if uni is None or bi is None or not bi.limit(1).count():
            return None
        return self._score_against(uni, bi, batch)

    # -- maintenance ---------------------------------------------------

    def optimize(self) -> dict:
        """Fold accumulated delta rows to one consolidated row per key.
        SUM deltas aren't idempotent under partial folds (unlike the
        bloom's bit_or), so the fold is journaled: (1) compute the
        consolidated rows distributed — the count tables grow with TYPE
        cardinality, nothing here collects rows, the fold token is an
        order-free digest aggregate collected as one scalar; (2) write
        them to a sidecar, doomed-token list LAST as the commit marker;
        (3) delete the old delta tokens; (4) merge the fold rows;
        (5) drop the sidecar. A crash anywhere replays (3)-(5) from the
        sidecar — on next open (``_recover_folds``) AND at the top of
        this method, so a failed fold retried in the SAME process
        recovers instead of discarding the committed journal (losing
        the counts whose deltas step (3) already deleted).

        MAINTENANCE IS MUTUALLY EXCLUSIVE: the whole fold holds the
        index-root writer lock, so two concurrent ``optimize`` calls
        can't interleave their journal/delete/merge windows — the
        second caller gets a loud ``ConcurrentWriteError`` and retries
        next cadence (r8 verdict item 6). The remaining single-writer
        note is about ``add``: don't run ``optimize`` concurrently
        with a REPLAYED add whose token is in the doomed list — it can
        re-insert its deltas in the delete→merge window, and the fold
        rows already include those counts (the per-op transactions
        don't linearize across the two commits). Adds between folds,
        and concurrent adds with each other, are safe."""
        from finance_pipeline_spark.sinks.keyed_writer import writer_lock

        with writer_lock(self.root, owner="lm-index-optimize"):
            return self._optimize_locked()

    def _optimize_locked(self) -> dict:
        import json as _json
        import os
        import shutil

        # a prior fold may have crashed in THIS process (no reopen →
        # __init__'s recovery never ran): replay it before starting a
        # new one — rmtree-ing an unreplayed committed journal here
        # would permanently lose the folded counts
        self._recover_folds()
        # PIN the trigram-coverage verdict BEFORE folding (r13 advisor,
        # medium): the fold consolidates every add-token into one
        # fold row per table, destroying the token-shape evidence
        # perplexity3's guard reads — a pre-upgrade corpus plus one
        # post-upgrade add would read as covered after the fold. The
        # verdict is computed here on the intact pre-fold state and
        # written atomically; _tri_covered honors the marker from then
        # on. Recovery above ran first, so a crashed fold's journaled
        # tri rows are merged before we judge the shapes.
        covered, missing = self._tri_covered()
        if missing and not self._is_legacy_layout():
            # REFUSE to fold (r13 advisor, low): these add tokens have
            # bigram counts but no trigram counts — an add crashed
            # between its bigram and trigram merges. Folding now would
            # consolidate the gap into fold rows, pin the coverage
            # marker False forever, and destroy the replay-the-add
            # repair path perplexity3's error message recommends. The
            # pre-fold state is replayable: re-run add() for the named
            # batches, then optimize() again. (The legacy-layout
            # MIGRATION fold is exempt: legacy bi tokens digest text
            # only while tri tokens digest (lang, text), so the token
            # comparison is cross-format noise there, and blocking
            # would wedge add() — which migrates via this fold. The
            # shape heuristic still pins the post-migration verdict.)
            raise ValueError(
                "CorpusLmIndex.optimize: refusing to fold — "
                f"{len(missing)} add token(s) have bigram counts but "
                "no trigram counts (an add crashed between its bigram "
                "and trigram merges). Folding would make the gap "
                "permanent; replay the in-flight add(s) first, then "
                f"optimize. Uncovered add tokens: {missing[:5]}"
            )
        self._write_tri_coverage(covered)
        out = {}
        for name, tbl, keys in (
            ("uni", self.uni, ["lang", "w"]),
            ("bi", self.bi, ["lang", "w1", "w2"]),
            ("tri", self.tri, ["lang", "w1", "w2", "w3"]),
        ):
            stored = tbl.read()
            if stored is None:
                out[f"{name}_tokens_folded"] = 0
                continue
            legacy = "lang" not in stored.columns
            stored = self._norm_lang(stored)
            tokens = [
                r["token"] for r in stored.select("token").distinct().collect()
            ]
            # a legacy-layout table folds even at one token: the fold
            # IS the lang-key migration (its delete-all-tokens → merge
            # lands the new schema on an empty file set, the only
            # write path that can't anti-join against lang-less files)
            if len(tokens) <= 1 and not legacy:
                out[f"{name}_tokens_folded"] = 0
                continue
            if legacy:
                # cross-version replay guard (advisor r10): the fold is
                # about to retire these text-only-digest tokens; record
                # them so a pre-upgrade in-flight add replayed later is
                # recognized (add()'s old-token check) instead of
                # double-counting under a fresh (lang, text) token
                legacy_adds = [t for t in tokens if t.startswith("add-")]
                if legacy_adds:
                    self._record_legacy_tokens(legacy_adds)
                    get_logger().warning(
                        "CorpusLmIndex migration (%s): folding %d "
                        "pre-lang add token(s) — any pre-upgrade "
                        "in-flight add replayed after this point is "
                        "detected via legacy_tokens.json and skipped",
                        name,
                        len(legacy_adds),
                    )
            folded = (
                stored.filter(F.col("token").isin(tokens))
                .groupBy(*keys)
                .agg(F.sum("n").alias("n"))
            )
            fold_token = _content_token(
                folded,
                F.concat_ws("\x1f", *keys, F.col("n").cast("string")),
                "fold",
            )
            doomed = [t for t in tokens if t != fold_token]
            side = self._fold_sidecar(name)
            folded.withColumn("token", F.lit(fold_token)).select(
                *keys, "token", "n"
            ).write.parquet(str(side / "rows.parquet"))
            # marker written atomically (tmp + rename): a torn marker
            # must read as "fold never started", not JSONDecodeError
            tmp = side / ".doomed.json.tmp"
            tmp.write_text(_json.dumps({"doomed": doomed}))
            os.replace(tmp, side / "doomed.json")
            if doomed:
                tbl.delete(F.col("token").isin(doomed))
            tbl.merge(self.spark.read.parquet(str(side / "rows.parquet")))
            shutil.rmtree(side, ignore_errors=True)
            out[f"{name}_tokens_folded"] = len(doomed)
        return out
