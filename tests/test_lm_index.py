"""Stored bigram-LM index: operator parity, replay idempotence,
incremental == batch, journaled fold convergence, crash recovery."""

from __future__ import annotations

import json
import random

from pyspark.sql import functions as F

from finance_pipeline_spark.pipelines.lm_index import CorpusLmIndex
from tests.conftest import random_doc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _corpus(rng, n, start=0):
    return [(start + i, random_doc(rng, 40)) for i in range(n)]


def test_familiarity_matches_operator_when_probe_equals_corpus(spark, tmp_path):
    """Stored-state scoring must reproduce text_lm_familiarity
    row-for-row when the probe IS the stored corpus: same vocab, same
    bigram frequencies, same corpus mean, same flags."""
    from finance_pipeline_spark.operators.textops import lm_familiarity

    rng = random.Random(5)
    rows = _corpus(rng, 12)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, rows[:7]))
    idx.add(_docs(spark, rows[7:]))

    got = {
        r.doc_id: (r.n_bigrams, r.sum_freq, r.familiarity, r.unfamiliar)
        for r in idx.familiarity(_docs(spark, rows)).collect()
    }
    ref_df = spark.createDataFrame(
        [(i, t, "en") for i, t in rows], "doc_id bigint, text string, lang string"
    )
    want = {
        r.doc_id: (r.n_bigrams, r.sum_freq, r.familiarity, r.unfamiliar)
        for r in lm_familiarity(ref_df).collect()
    }
    assert got == want


def test_add_is_idempotent_per_batch_content(spark, tmp_path):
    rng = random.Random(7)
    b = _docs(spark, _corpus(rng, 5))
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    s1 = idx.add(b)
    s2 = idx.add(b)  # same content -> same token -> keyed no-op
    assert s1["token"] == s2["token"]
    assert s2["uni_rows"] == 0 and s2["bi_rows"] == 0
    uni = {r.w: r.n for r in idx._folded_uni().collect()}
    idx.add(b)
    assert {r.w: r.n for r in idx._folded_uni().collect()} == uni


def test_incremental_adds_equal_one_union_add(spark, tmp_path):
    rng = random.Random(9)
    rows = _corpus(rng, 10)
    a = CorpusLmIndex(spark, str(tmp_path / "a"))
    a.add(_docs(spark, rows[:4]))
    a.add(_docs(spark, rows[4:]))
    b = CorpusLmIndex(spark, str(tmp_path / "b"))
    b.add(_docs(spark, rows))
    assert {tuple(r) for r in a._folded_uni().collect()} == {
        tuple(r) for r in b._folded_uni().collect()
    }
    assert {tuple(r) for r in a._folded_bi().collect()} == {
        tuple(r) for r in b._folded_bi().collect()
    }


def test_optimize_folds_deltas_and_scores_unchanged(spark, tmp_path):
    rng = random.Random(11)
    rows = _corpus(rng, 8)
    probe = _docs(spark, _corpus(rng, 3, start=100))
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, rows[:4]))
    idx.add(_docs(spark, rows[4:]))
    before = {r.doc_id: r.familiarity for r in idx.familiarity(probe).collect()}

    out = idx.optimize()
    assert out["uni_tokens_folded"] == 2 and out["bi_tokens_folded"] == 2
    assert idx.uni.read().select("token").distinct().count() == 1
    after = {r.doc_id: r.familiarity for r in idx.familiarity(probe).collect()}
    assert after == before
    # second optimize: nothing to fold
    out2 = idx.optimize()
    assert out2 == {"uni_tokens_folded": 0, "bi_tokens_folded": 0}


def test_fold_recovers_from_crash_at_both_corners(spark, tmp_path):
    """The journaled fold must converge whether the crash landed
    before the delete (sidecar + intact deltas: replay must not
    double-count) or after it (deltas gone: replay must restore)."""
    rng = random.Random(13)
    rows = _corpus(rng, 6)

    def build(root):
        idx = CorpusLmIndex(spark, root)
        idx.add(_docs(spark, rows[:3]))
        idx.add(_docs(spark, rows[3:]))
        return idx

    ref = build(str(tmp_path / "ref"))
    want_uni = {tuple(r) for r in ref._folded_uni().collect()}

    for corner in ("pre_delete", "post_delete"):
        root = str(tmp_path / corner)
        idx = build(root)
        tokens = [
            r["token"] for r in idx.uni.read().select("token").distinct().collect()
        ]
        folded = idx.uni.read().groupBy("w").agg(F.sum("n").alias("n"))
        side = idx._fold_sidecar("uni")
        folded.withColumn("token", F.lit("fold-crash")).select(
            "w", "token", "n"
        ).write.parquet(str(side / "rows.parquet"))
        (side / "doomed.json").write_text(json.dumps({"doomed": tokens}))
        if corner == "post_delete":
            idx.uni.delete(F.col("token").isin(tokens))

        reopened = CorpusLmIndex(spark, root)  # recovery runs here
        assert not side.exists()
        assert {tuple(r) for r in reopened._folded_uni().collect()} == want_uni


def test_torn_sidecar_is_discarded(spark, tmp_path):
    """rows.parquet written but no doomed.json marker: the fold never
    started mutating the table — recovery discards the sidecar."""
    rng = random.Random(17)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, _corpus(rng, 4)))
    want = {tuple(r) for r in idx._folded_uni().collect()}
    side = idx._fold_sidecar("uni")
    idx.uni.read().limit(1).write.parquet(str(side / "rows.parquet"))

    reopened = CorpusLmIndex(spark, str(tmp_path / "lm"))
    assert not side.exists()
    assert {tuple(r) for r in reopened._folded_uni().collect()} == want


def test_gibberish_probe_flags_against_stored_corpus(spark, tmp_path):
    """The streaming payoff: a 3-doc probe can't train an LM, but the
    stored corpus can judge it — unseen transitions score freq 0."""
    rng = random.Random(19)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, _corpus(rng, 20)))
    probe = _docs(
        spark,
        [
            (100, random_doc(rng, 40)),  # speaks the corpus language
            (101, " ".join(f"zq{i}x" for i in range(20))),  # gibberish
        ],
    )
    got = {r.doc_id: r for r in idx.familiarity(probe).collect()}
    assert got[101].unfamiliar and got[101].sum_freq == 0
    assert not got[100].unfamiliar
    assert got[100].familiarity > got[101].familiarity


def test_familiarity_on_empty_index_raises(spark, tmp_path):
    import pytest

    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    with pytest.raises(ValueError, match="empty"):
        idx.familiarity(_docs(spark, [(1, "a b c")]))
