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
    row-for-row when the probe IS the stored corpus — on a
    TWO-LANGUAGE corpus (r9 verdict item 1): same global vocab, same
    global bigram frequencies, same PER-LANGUAGE corpus means, same
    flags. Adds split mid-language so per-lang counts also prove the
    cross-batch fold."""
    from finance_pipeline_spark.operators.textops import lm_familiarity

    rng = random.Random(5)
    rows = _corpus(rng, 12)
    lang_of = lambda i: "en" if i % 3 else "fr"  # noqa: E731
    tagged = [(i, lang_of(i), t) for i, t in rows]
    ldocs = spark.createDataFrame(
        tagged, "doc_id bigint, lang string, text string"
    )
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(ldocs.filter(F.col("doc_id") < 7))
    idx.add(ldocs.filter(F.col("doc_id") >= 7))

    got = {
        r.doc_id: (r.lang, r.n_bigrams, r.sum_freq, r.familiarity, r.unfamiliar)
        for r in idx.familiarity(ldocs).collect()
    }
    ref_df = spark.createDataFrame(
        [(i, t, lg) for i, lg, t in tagged],
        "doc_id bigint, text string, lang string",
    )
    want = {
        r.doc_id: (r.lang, r.n_bigrams, r.sum_freq, r.familiarity, r.unfamiliar)
        for r in lm_familiarity(ref_df).collect()
    }
    assert got == want
    assert {lg for _, (lg, *_) in got.items()} == {"en", "fr"}


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
    assert out2 == {
        "uni_tokens_folded": 0,
        "bi_tokens_folded": 0,
        "tri_tokens_folded": 0,
    }


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
    # all-OOV probe: every bigram is <unk>-<unk>, which is excluded
    # from scoring (the advisor inversion fix) -> nothing scored at all
    assert got[101].n_scored == 0 and got[101].familiarity is None
    assert got[100].familiarity > 0


def test_familiarity_on_empty_index_raises(spark, tmp_path):
    import pytest

    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    with pytest.raises(ValueError, match="empty"):
        idx.familiarity(_docs(spark, [(1, "a b c")]))


def test_screen_before_is_replay_deterministic(spark, tmp_path):
    """The ingest invariant: screening a batch BEFORE its add and
    re-screening it AFTER (the crash-replay case, when its delta token
    is already stored) must produce identical flags — screen_before
    excludes the batch's own contribution."""
    rng = random.Random(37)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, _corpus(rng, 20)))
    probe = _docs(
        spark,
        [(100, random_doc(rng, 40)),
         (101, " ".join(f"jw{i}k" for i in range(25)))],
    )
    first = {
        r.doc_id: (r.sum_freq, r.familiarity, r.unfamiliar)
        for r in idx.screen_before(probe).collect()
    }
    assert first[101][2] and not first[100][2]
    idx.add(probe)  # the crash landed after lm.add; the batch replays
    replay = {
        r.doc_id: (r.sum_freq, r.familiarity, r.unfamiliar)
        for r in idx.screen_before(probe).collect()
    }
    assert replay == first
    # sanity: WITHOUT the exclusion the state differs (the probe's own
    # counts are in the fold now)
    with_self = {
        r.doc_id: r.sum_freq for r in idx.familiarity(probe).collect()
    }
    assert with_self != {d: v[0] for d, v in first.items()}


def test_screen_before_returns_none_when_only_self_stored(spark, tmp_path):
    rng = random.Random(41)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    probe = _docs(spark, _corpus(rng, 4))
    assert idx.screen_before(probe) is None  # empty index
    idx.add(probe)
    # the ONLY stored content is this batch: nothing prior to judge by
    assert idx.screen_before(probe) is None


def test_optimize_retry_replays_committed_journal_instead_of_discarding(
    spark, tmp_path
):
    """A fold that deleted its deltas but crashed before the merge,
    retried in the SAME process (no reopen): optimize() must replay the
    journal, not rmtree it — discarding would permanently lose every
    count the delete removed."""
    rng = random.Random(43)
    rows = _corpus(rng, 6)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, rows[:3]))
    idx.add(_docs(spark, rows[3:]))
    want = {tuple(r) for r in idx._folded_uni().collect()}

    # craft the committed-journal crash state by hand: sidecar written,
    # deltas deleted, fold rows NOT merged
    tokens = [
        r["token"] for r in idx.uni.read().select("token").distinct().collect()
    ]
    folded = idx.uni.read().groupBy("w").agg(F.sum("n").alias("n"))
    side = idx._fold_sidecar("uni")
    folded.withColumn("token", F.lit("fold-crash")).select(
        "w", "token", "n"
    ).write.parquet(str(side / "rows.parquet"))
    (side / "doomed.json").write_text(json.dumps({"doomed": tokens}))
    idx.uni.delete(F.col("token").isin(tokens))

    out = idx.optimize()  # same object — __init__ recovery never ran
    assert not side.exists()
    assert {tuple(r) for r in idx._folded_uni().collect()} == want
    # the replayed fold left one token; bi still had two to fold
    assert out["bi_tokens_folded"] == 2


def test_torn_doomed_marker_is_discarded_not_fatal(spark, tmp_path):
    """A half-written doomed.json must read as 'fold never started',
    not brick every subsequent open with JSONDecodeError."""
    rng = random.Random(47)
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, _corpus(rng, 4)))
    want = {tuple(r) for r in idx._folded_uni().collect()}
    side = idx._fold_sidecar("uni")
    idx.uni.read().limit(1).write.parquet(str(side / "rows.parquet"))
    (side / "doomed.json").write_text('{"doo')  # torn mid-write

    reopened = CorpusLmIndex(spark, str(tmp_path / "lm"))
    assert not side.exists()
    assert {tuple(r) for r in reopened._folded_uni().collect()} == want


def test_concurrent_lm_optimize_is_mutually_exclusive(spark, tmp_path):
    """r8 verdict item 6 (LM side): two concurrent optimize() folds
    must serialize on the index-root writer lock; the final counts
    equal the single-writer fold and a later optimize runs clean."""
    import threading

    from finance_pipeline_spark.sinks.keyed_writer import ConcurrentWriteError

    rng = random.Random(47)
    root = str(tmp_path / "lm")
    idx = CorpusLmIndex(spark, root)
    rows = _corpus(rng, 9)
    for lo in (0, 3, 6):
        idx.add(_docs(spark, rows[lo : lo + 3]))
    assert idx.uni.read().select("token").distinct().count() == 3
    want = {tuple(r) for r in idx._folded_uni().collect()}

    results: dict = {}

    def run(tag):
        local = CorpusLmIndex(spark, root)
        try:
            results[tag] = ("ok", local.optimize())
        except ConcurrentWriteError as exc:
            results[tag] = ("locked", str(exc))
        except Exception as exc:  # noqa: BLE001
            results[tag] = ("err", f"{type(exc).__name__}: {exc}")

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    outcomes = sorted(kind for kind, _ in results.values())
    assert outcomes[1] == "ok" or outcomes == ["ok", "ok"], results
    assert "err" not in outcomes, results

    reopened = CorpusLmIndex(spark, root)
    assert reopened.uni.read().select("token").distinct().count() == 1
    assert {tuple(r) for r in reopened._folded_uni().collect()} == want
    later = reopened.optimize()
    assert later["uni_tokens_folded"] == 0 and later["bi_tokens_folded"] == 0


def test_minority_language_not_flagged_by_majority_mean(spark, tmp_path):
    """The r9 verdict's streaming-vs-batch gap, closed: a minority
    language whose bigrams are GLOBALLY rare but internally ordinary
    must not be wholesale-flagged by the stored screen. Same stored
    counts, two probes: true lang tags -> per-lang means keep the
    minority clean; the same docs mislabeled as the majority language
    -> judged against the majority's mean -> flagged. The mean's
    grouping is the only difference, which is exactly the fix."""
    rng = random.Random(53)
    majority = [(i, "en", random_doc(rng, 60)) for i in range(60)]
    xx_words = [f"xw{j}" for j in range(40)]
    minority = [
        (100 + i, "xx", " ".join(rng.choice(xx_words) for _ in range(40)))
        for i in range(3)
    ]
    ldocs = spark.createDataFrame(
        majority + minority, "doc_id bigint, lang string, text string"
    )
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(ldocs)

    by_lang = {
        r.doc_id: r.unfamiliar for r in idx.familiarity(ldocs).collect()
    }
    assert not any(by_lang[100 + i] for i in range(3)), (
        "per-language means must not flag an internally-ordinary "
        f"minority language: {by_lang}"
    )
    # counterfactual: the SAME stored state judges the same docs
    # against the majority mean when their tags say 'en' -> flagged
    mislabeled = ldocs.withColumn("lang", F.lit("en"))
    as_en = {
        r.doc_id: r.unfamiliar for r in idx.familiarity(mislabeled).collect()
    }
    assert all(as_en[100 + i] for i in range(3)), (
        "sanity: under the majority's mean the minority docs should "
        f"flag — if not, the planted contrast is too weak: {as_en}"
    )
    # majority docs unflagged either way
    assert not any(by_lang[i] for i in range(60))


def test_legacy_layout_migrates_on_add_and_scores_per_lang(spark, tmp_path):
    """A table written before the lang key (rows with no lang column)
    must (a) read under 'und', (b) migrate to the lang-keyed layout on
    the next add via the journaled fold, and (c) keep its counts
    bit-for-bit through the migration."""
    rng = random.Random(59)
    root = str(tmp_path / "lm")
    idx = CorpusLmIndex(spark, root)
    rows = _corpus(rng, 8)
    idx.add(_docs(spark, rows[:4]))
    idx.add(_docs(spark, rows[4:]))

    # hand-rewrite both tables to the LEGACY schema (drop lang)
    import shutil

    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    for name, keys in (("uni", ["w"]), ("bi", ["w1", "w2"])):
        old = getattr(idx, name).read().drop("lang").localCheckpoint(eager=True)
        shutil.rmtree(f"{root}/{name}")
        legacy = TxnKeyedTable(spark, f"{root}/{name}", keys + ["token"])
        legacy.merge(old.drop("created_at"))

    re1 = CorpusLmIndex(spark, root)
    assert re1._is_legacy_layout()
    want = {tuple(r) for r in re1._folded_uni().collect()}
    assert all(r[0] == "und" for r in want)  # legacy rows read as 'und'

    # next add migrates, then lands the new batch per-lang
    batch = spark.createDataFrame(
        [(200, "fr", rows[0][1])], "doc_id bigint, lang string, text string"
    )
    re1.add(batch)
    assert not re1._is_legacy_layout()
    folded = {tuple(r) for r in re1._folded_uni().collect()}
    langs = {r[0] for r in folded}
    assert langs == {"und", "fr"}
    # pre-migration counts intact under 'und'
    assert {t for t in folded if t[0] == "und"} == want
    # and scoring still works end-to-end on the migrated index
    out = re1.familiarity(_docs(spark, rows[:2]))
    assert out.count() == 2


def test_pre_upgrade_replay_is_skipped_after_migration(spark, tmp_path):
    """Advisor r10: a pre-upgrade in-flight add (token digested over
    text only) crash-replayed AFTER the lang migration would mint a
    fresh (lang, text) token and double-count. The migrating fold
    records the retired legacy add-tokens; add() recognizes the replay
    by its old-format token and skips — counts stay bit-identical."""
    import shutil

    from finance_pipeline_spark.pipelines.lm_index import _content_token
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    rng = random.Random(67)
    root = str(tmp_path / "lm")
    rows = [(i, random_doc(rng)) for i in range(6)]
    batch = _docs(spark, rows)

    # build the stored counts, then rewrite both tables to the LEGACY
    # schema under the batch's OLD-format (text-only) token — exactly
    # the state a pre-upgrade add left behind
    idx = CorpusLmIndex(spark, root)
    idx.add(batch)
    old_token = _content_token(batch, F.coalesce("text", F.lit("")), "add")
    for name, keys in (("uni", ["w"]), ("bi", ["w1", "w2"])):
        tbl = getattr(idx, name)
        old = (
            tbl.read()
            .drop("lang", "created_at")
            .withColumn("token", F.lit(old_token))
            .localCheckpoint(eager=True)
        )
        shutil.rmtree(f"{root}/{name}")
        TxnKeyedTable(spark, f"{root}/{name}", keys + ["token"]).merge(old)

    re1 = CorpusLmIndex(spark, root)
    assert re1._is_legacy_layout()
    re1.optimize()  # the lang migration — records legacy_tokens.json
    assert old_token in re1._legacy_tokens()
    folded = {tuple(r) for r in re1._folded_uni().collect()}

    # the crash-replay: same batch, post-upgrade → skipped, no double count
    out = re1.add(batch)
    assert out.get("skipped_legacy_replay") is True
    assert {tuple(r) for r in re1._folded_uni().collect()} == folded

    # a genuinely new batch still adds normally
    out2 = re1.add(_docs(spark, [(50, random_doc(rng))]))
    assert "skipped_legacy_replay" not in out2 and out2["uni_rows"] > 0


def test_stored_kn_perplexity_matches_batch_operator(spark, tmp_path):
    """Serving parity: when the probe IS the stored corpus, the
    index's KN perplexity is row-identical to text_kn_perplexity
    (same counts, same rounding chain)."""
    from finance_pipeline_spark import registry
    from tests.conftest import write_documents

    rng = random.Random(41)
    rows = [(i, random_doc(rng)) for i in range(30)]
    sf = write_documents(tmp_path, rows)
    batch = _docs(spark, rows)

    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(batch)
    stored = {
        r.doc_id: (r.n_bigrams, r.sum_logp, r.ppl)
        for r in idx.perplexity(batch).collect()
    }
    op = {
        r.doc_id: (r.n_bigrams, r.sum_logp, r.ppl)
        for r in registry.QUERIES["text_kn_perplexity"].fn(spark, sf).collect()
    }
    assert stored == op


def test_stored_kn_perplexity_unseen_probe_backs_off(spark, tmp_path):
    """Probe docs with unseen words/contexts score FINITE and higher
    than in-distribution probes (the half-count continuation floor +
    context backoff), and adding more corpus changes nothing for
    already-seen events (counts are the only state)."""
    rng = random.Random(43)
    corpus = _docs(spark, [(i, "the quick brown fox jumps " * 4) for i in range(10)])
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(corpus)
    probe = _docs(
        spark,
        [
            (100, "the quick brown fox jumps the quick"),  # in-distribution
            (101, "zq glorp wux vhast zq mibble"),  # fully unseen
            (102, "the quick zq glorp"),  # mixed: seen context + unseen
        ],
    )
    got = {r.doc_id: r for r in idx.perplexity(probe).collect()}
    assert set(got) == {100, 101, 102}
    import math

    for r in got.values():
        assert math.isfinite(r.ppl) and r.ppl > 0
    # both anomalous probes score far above the in-distribution one;
    # NOTE the mixed doc outranks the fully-unseen doc — a SEEN context
    # followed by an unseen word is strong evidence of anomaly (its
    # probability carries only the tiny interpolation mass), while a
    # fully-unseen context just falls back to the continuation prior.
    # That ordering is the KN semantics, not an artifact.
    assert got[101].ppl > 3 * got[100].ppl
    assert got[102].ppl > 3 * got[100].ppl


def test_stored_kn3_perplexity_matches_batch_operator(spark, tmp_path):
    """Trigram serving parity: when the probe IS the stored corpus,
    the index's order-3 KN perplexity is row-identical to
    text_kn3_perplexity (same counts, same rounding chain)."""
    from finance_pipeline_spark import registry
    from tests.conftest import write_documents

    rng = random.Random(47)
    rows = [(i, random_doc(rng)) for i in range(30)]
    sf = write_documents(tmp_path, rows)
    batch = _docs(spark, rows)

    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(batch)
    stored = {
        r.doc_id: (r.n_trigrams, r.sum_logp, r.ppl)
        for r in idx.perplexity3(batch).collect()
    }
    op = {
        r.doc_id: (r.n_trigrams, r.sum_logp, r.ppl)
        for r in registry.QUERIES["text_kn3_perplexity"].fn(spark, sf).collect()
    }
    assert stored == op


def test_stored_kn3_unseen_probe_backs_off_and_legacy_index_refuses(
    spark, tmp_path
):
    """Order-3 backoff mirrors the bigram ladder (finite everywhere,
    anomalies outrank in-distribution probes); an index whose tri/
    table never existed (pre-upgrade corpus) refuses loudly instead of
    scoring against a partial model."""
    import math
    import shutil

    import pytest

    corpus = _docs(
        spark, [(i, "the quick brown fox jumps over " * 4) for i in range(10)]
    )
    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(corpus)
    probe = _docs(
        spark,
        [
            (100, "the quick brown fox jumps over the quick brown"),
            (101, "zq glorp wux vhast zq mibble frop"),
            (102, "the quick brown zq glorp wux"),
        ],
    )
    got = {r.doc_id: r for r in idx.perplexity3(probe).collect()}
    assert set(got) == {100, 101, 102}
    for r in got.values():
        assert math.isfinite(r.ppl) and r.ppl > 0
    assert got[101].ppl > 3 * got[100].ppl
    assert got[102].ppl > 3 * got[100].ppl

    # simulate a pre-upgrade index: drop the trigram table entirely
    shutil.rmtree(tmp_path / "lm" / "tri", ignore_errors=True)
    idx2 = CorpusLmIndex(spark, str(tmp_path / "lm"))
    with pytest.raises(ValueError, match="trigram"):
        idx2.perplexity3(probe)
    # the bigram serving path is unaffected
    assert idx2.perplexity(probe).count() == 3

    # PARTIAL coverage (r12 review finding): a post-upgrade add on top
    # of the tri-less history recreates tri/ covering only itself —
    # perplexity3 must refuse, not score against the partial model
    idx2.add(
        _docs(spark, [(50 + i, "wholly new words arriving here now") for i in range(3)])
    )
    with pytest.raises(ValueError, match="do not cover"):
        idx2.perplexity3(probe)

    # REPLAY-PATH guard (r14, r13-advisor low): while an add token has
    # bigram counts but no trigram counts (an add crashed between its
    # bi and tri merges — here, the tri-less history), optimize() must
    # REFUSE to fold: consolidating would make the gap permanent and
    # destroy the replay repair perplexity3's message recommends.
    with pytest.raises(ValueError, match="refusing to fold"):
        idx2.optimize()
    # the index stayed replayable: re-adding the original corpus is a
    # token-idempotent merge that inserts ONLY its missing trigram
    # rows, after which the fold proceeds and order-3 serving works
    idx2.add(corpus)
    idx2.optimize()
    assert idx2.perplexity3(probe).count() == 3

    # LAUNDERING guard (r13 advisor, medium): when the uncovered state
    # is NOT replay-repairable (pre-upgrade history folded before tri
    # ever existed — no add token to replay), the fold proceeds and
    # must pin the pre-fold verdict in tri_coverage.json, so the
    # refusal survives folds and reopens while bigram serving works.
    lm5 = str(tmp_path / "lm5")
    idx5 = CorpusLmIndex(spark, lm5)
    idx5.add(corpus)
    idx5.add(_docs(spark, [(300, "another covered batch of words here")]))
    shutil.rmtree(tmp_path / "lm5" / "tri", ignore_errors=True)
    idx5 = CorpusLmIndex(spark, lm5)
    idx5.optimize()  # tri table absent entirely: missing=[], folds, pins False
    idx5.add(
        _docs(spark, [(60 + i, "wholly new words arriving here now") for i in range(3)])
    )
    with pytest.raises(ValueError, match="do not cover"):
        idx5.perplexity3(probe)
    idx5.optimize()  # missing=[] (history is fold rows) → folds, re-pins False
    with pytest.raises(ValueError, match="do not cover"):
        idx5.perplexity3(probe)
    idx5b = CorpusLmIndex(spark, lm5)
    with pytest.raises(ValueError, match="do not cover"):
        idx5b.perplexity3(probe)
    assert idx5b.perplexity(probe).count() == 3

    # and a GENUINELY covered index must keep scoring after its folds
    # (the marker records covered=True, not a blanket refusal)
    idx4 = CorpusLmIndex(spark, str(tmp_path / "lm4"))
    idx4.add(corpus)
    idx4.add(_docs(spark, [(200, "an extra covered batch of words here")]))
    pre = {r.doc_id: r for r in idx4.perplexity3(probe).collect()}
    idx4.optimize()
    got4 = {r.doc_id: r for r in idx4.perplexity3(probe).collect()}
    assert set(got4) == {100, 101, 102}
    assert got4[100].ppl == pre[100].ppl  # fold is count-preserving


def test_stored_kn3_sentinel_covers_trigramless_batches(spark, tmp_path):
    """A batch whose docs all have <3 tokens adds NO trigrams but must
    still count as covered (the sentinel row) — and a corpus that is
    ALL such batches refuses with the no-trigrams message rather than
    dividing by zero."""
    import pytest

    idx = CorpusLmIndex(spark, str(tmp_path / "lm"))
    idx.add(_docs(spark, [(1, "two words"), (2, "also short")]))
    with pytest.raises(ValueError, match="no trigrams"):
        idx.perplexity3(_docs(spark, [(9, "a probe with many tokens here")]))
    # now a real corpus lands; the earlier trigram-less add must not
    # read as missing coverage
    idx.add(_docs(spark, [(3, "the quick brown fox jumps over the fence")]))
    out = idx.perplexity3(
        _docs(spark, [(9, "the quick brown fox jumps over")])
    ).collect()
    assert len(out) == 1 and out[0].n_trigrams == 4
