"""Stored corpus bigram-LM — the persistent form of the
``text_lm_familiarity`` quality screen.

The registered operator trains its LM on the batch it scores; a
streaming ingest can't do that — each micro-batch is too small to
estimate "what does this corpus's language look like", and re-reading
the whole corpus per batch is exactly the cost the stored dedup index
exists to avoid. This component persists the LM state the same way
``CorpusDedupIndex`` persists dedup state — two transactional count
tables with APPEND-ONLY delta rows:

- ``uni/`` — key ``(w, token)``: per-add unigram counts.
- ``bi/``  — key ``(w1, w2, token)``: per-add bigram counts.

``token`` is a content address of the added batch (order-free digest
sum over the batch's texts), so a crashed-and-retried add is a keyed
no-op — counts can never double. Readers fold deltas with SUM (an
associative, commutative merge: concurrent adds can never lose each
other's counts — the bloom table's append-only lesson applied to
integers); ``optimize()`` folds accumulated deltas back to one row per
key.

``familiarity(batch)`` then scores NEW docs against the STORED corpus
with the operator's exact semantics (top-``_LM_VOCAB`` vocabulary,
``<unk>`` mapping, mean-bigram-frequency score, corpus-mean/X flag),
derived from the folded counts instead of the batch: stored-unseen
pairs score frequency 0, which is the point — gibberish scores low
against an established corpus even when the probe batch is 3 docs.

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
from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable


def _batch_token(batch: DataFrame) -> str:
    """Order-free content address of a (doc_id, text) batch: the SUM of
    a 60-bit integer digest per text plus the row count. Same batch →
    same token → the keyed merge makes re-adds no-ops (crash-retry,
    at-least-once streaming delivery)."""
    row = batch.agg(
        F.sum(
            F.conv(
                F.substring(
                    F.sha2(F.encode(F.coalesce("text", F.lit("")), "UTF-8"), 256),
                    1,
                    15,
                ),
                16,
                10,
            ).cast("decimal(38,0)")
        ).alias("s"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return f"add-{row['s']}-{row['n']}"


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
        self.uni = TxnKeyedTable(spark, f"{self.root}/uni", ["w", "token"])
        self.bi = TxnKeyedTable(spark, f"{self.root}/bi", ["w1", "w2", "token"])
        self._recover_folds()

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

        for name, tbl in (("uni", self.uni), ("bi", self.bi)):
            side = self._fold_sidecar(name)
            if not side.exists():
                continue
            marker = side / "doomed.json"
            if not marker.exists():
                # torn sidecar write: the fold never started deleting,
                # the delta rows are intact — discard and move on
                shutil.rmtree(side, ignore_errors=True)
                continue
            doomed = _json.loads(marker.read_text())["doomed"]
            rows = self.spark.read.parquet(str(side / "rows.parquet"))
            if doomed:
                tbl.delete(F.col("token").isin(doomed))
            tbl.merge(rows)
            shutil.rmtree(side, ignore_errors=True)

    # -- write side ----------------------------------------------------

    def add(self, batch: DataFrame) -> dict:
        """Fold a batch's unigram/bigram counts into the stored LM.
        Idempotent per batch content; counts are delta rows, so
        concurrent adds merge without loss. Returns row accounting."""
        token = _batch_token(batch)
        clean = lm_clean(batch.select("doc_id", "text"))
        uni = (
            clean.select(F.explode("toks").alias("w"))
            .groupBy("w")
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("token", F.lit(token))
        )
        bi = (
            lm_pairs(clean)
            .groupBy(F.col("w1a").alias("w1"), F.col("w2a").alias("w2"))
            .agg(F.count(F.lit(1)).alias("n"))
            .withColumn("token", F.lit(token))
        )
        u = self.uni.merge(uni.select("w", "token", "n"))
        b = self.bi.merge(bi.select("w1", "w2", "token", "n"))
        return {"token": token, "uni_rows": u.inserted, "bi_rows": b.inserted}

    # -- read side -----------------------------------------------------

    def _folded_uni(self) -> DataFrame | None:
        stored = self.uni.read()
        if stored is None:
            return None
        return stored.groupBy("w").agg(F.sum("n").alias("n"))

    def _folded_bi(self) -> DataFrame | None:
        stored = self.bi.read()
        if stored is None:
            return None
        return stored.groupBy("w1", "w2").agg(F.sum("n").alias("n"))

    def familiarity(self, batch: DataFrame) -> DataFrame:
        """Score (doc_id, text) docs against the STORED corpus LM:
        (doc_id, n_bigrams, sum_freq, familiarity, unfamiliar) — the
        ``text_lm_familiarity`` semantics with vocabulary, bigram
        frequencies, and the corpus mean all taken from stored state.
        When the probe equals the stored corpus, the output matches
        the registered operator row-for-row (pinned by test). Raises
        on an empty index: a screen against no corpus is meaningless
        and silently keeping everything would mask a wiring bug."""
        uni, bi = self._folded_uni(), self._folded_bi()
        if uni is None or bi is None:
            raise ValueError(
                "CorpusLmIndex.familiarity on an empty index — add() a "
                "corpus first"
            )
        vocab = (
            uni.orderBy(F.col("n").desc(), "w")
            .limit(textops._LM_VOCAB)
            .select("w")
        )
        # re-key the stored bigram TYPES through the vocab (types, not
        # instances: one pass over the count table, never the corpus)
        c2 = (
            lm_map_to_vocab(
                bi.select(
                    F.col("w1").alias("w1a"), F.col("w2").alias("w2a"), "n"
                ),
                vocab,
            )
            .groupBy("w1", "w2")
            .agg(F.sum("n").alias("freq"))
        )
        # corpus mean bigram frequency = sum over stored pair INSTANCES
        # of their type's frequency / total instances = sum(freq^2)/sum(freq)
        gavg = c2.groupBy().agg(
            (
                F.sum(F.col("freq") * F.col("freq")).cast("double")
                / F.sum("freq").cast("double")
            ).alias("gavg")
        )
        mapped = lm_map_to_vocab(lm_pairs(lm_clean(batch.select("doc_id", "text"))), vocab)
        return lm_score(mapped, c2, gavg)

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
        sidecar on next open (``_recover_folds``) — counts are never
        doubled and never lost."""
        import json as _json
        import shutil

        out = {}
        for name, tbl, keys in (
            ("uni", self.uni, ["w"]),
            ("bi", self.bi, ["w1", "w2"]),
        ):
            stored = tbl.read()
            if stored is None:
                out[f"{name}_tokens_folded"] = 0
                continue
            tokens = [
                r["token"] for r in stored.select("token").distinct().collect()
            ]
            if len(tokens) <= 1:
                out[f"{name}_tokens_folded"] = 0
                continue
            folded = (
                stored.filter(F.col("token").isin(tokens))
                .groupBy(*keys)
                .agg(F.sum("n").alias("n"))
            )
            digest_src = F.concat_ws("\x1f", *keys, F.col("n").cast("string"))
            tok_row = folded.agg(
                F.sum(
                    F.conv(
                        F.substring(
                            F.sha2(F.encode(digest_src, "UTF-8"), 256), 1, 15
                        ),
                        16,
                        10,
                    ).cast("decimal(38,0)")
                ).alias("s"),
                F.count(F.lit(1)).alias("c"),
            ).collect()[0]
            fold_token = f"fold-{tok_row['s']}-{tok_row['c']}"
            doomed = [t for t in tokens if t != fold_token]
            side = self._fold_sidecar(name)
            shutil.rmtree(side, ignore_errors=True)
            folded.withColumn("token", F.lit(fold_token)).select(
                *keys, "token", "n"
            ).write.parquet(str(side / "rows.parquet"))
            (side / "doomed.json").write_text(_json.dumps({"doomed": doomed}))
            if doomed:
                tbl.delete(F.col("token").isin(doomed))
            tbl.merge(self.spark.read.parquet(str(side / "rows.parquet")))
            shutil.rmtree(side, ignore_errors=True)
            out[f"{name}_tokens_folded"] = len(doomed)
        return out
