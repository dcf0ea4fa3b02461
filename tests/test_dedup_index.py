"""CorpusDedupIndex: the stored/appendable screen state. Contracts:
screen-vs-fresh-index is all-keep; planted exact/near/novel docs get
the dedup_incremental verdict tiers against STORED state; add() is
idempotent under re-delivery; a new instance on the same path (restart)
sees the accumulated index; the bloom words stay OR-consistent."""

from __future__ import annotations

import random

from finance_pipeline_spark.pipelines.dedup_index import CorpusDedupIndex
from tests.conftest import perturb_doc, random_doc


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_fresh_index_keeps_everything(spark, tmp_path):
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(3)
    batch = _docs(spark, [(i, random_doc(rng)) for i in range(5)])
    got = idx.screen(batch).collect()
    assert len(got) == 5
    assert all(r.verdict == "keep" and not r.exact_dup and not r.near_dup for r in got)


def test_screen_tiers_against_stored_state(spark, tmp_path):
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(7)
    base, other = random_doc(rng), random_doc(rng)
    stats = idx.add(
        _docs(spark, [(1, base), (2, other), (3, random_doc(rng))])
    )
    assert stats["digests_inserted"] == 3
    assert stats["bands_inserted"] > 0
    assert stats["bloom_words_touched"] > 0

    batch = _docs(
        spark,
        [
            (100, base),  # exact copy of stored doc
            (101, perturb_doc(rng, other, n_edits=1)),  # near copy
            (102, " ".join(f"zz{i}" for i in range(60))),  # novel
        ],
    )
    got = {r.doc_id: r for r in idx.screen(batch).collect()}
    assert got[100].exact_dup and got[100].verdict == "drop_exact"
    assert not got[101].exact_dup
    assert got[101].near_dup and got[101].verdict == "review_near"
    assert got[102].verdict == "keep"


def test_add_is_idempotent_and_survives_restart(spark, tmp_path):
    root = str(tmp_path / "idx")
    idx = CorpusDedupIndex(spark, root)
    rng = random.Random(9)
    batch = _docs(spark, [(i, random_doc(rng)) for i in range(4)])
    first = idx.add(batch)
    assert first["digests_inserted"] == 4

    # re-delivery of the same batch inserts nothing anywhere
    again = idx.add(batch)
    assert again["digests_inserted"] == 0
    assert again["bands_inserted"] == 0
    assert again["bloom_words_touched"] == 0

    # a NEW instance on the same path (process restart) sees the state
    idx2 = CorpusDedupIndex(spark, root)
    got = {r.doc_id: r for r in idx2.screen(batch).collect()}
    assert all(r.exact_dup and r.verdict == "drop_exact" for r in got.values())


def test_bloom_words_match_full_rebuild(spark, tmp_path):
    """Incremental OR-maintenance must converge to the same bitmap a
    from-scratch build over all stored digests produces."""
    import numpy as np

    from finance_pipeline_spark.operators.dedup import build_digest_bloom
    from finance_pipeline_spark.pipelines.dedup_index import _digest

    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(13)
    b1 = _docs(spark, [(i, random_doc(rng)) for i in range(3)])
    b2 = _docs(spark, [(i + 10, random_doc(rng)) for i in range(3)])
    idx.add(b1)
    idx.add(b2)

    rebuilt = build_digest_bloom(b1.unionByName(b2).select(_digest().alias("dg")))
    assert np.array_equal(idx._bloom_words(), rebuilt)


def test_null_text_rows_survive_screen_and_add(spark, tmp_path):
    """A NULL text (allowed by the doc schema) must not crash the bloom
    kernels: null digests contribute no bits and never match — the
    semi-join's null semantics."""
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(17)
    base = random_doc(rng)
    with_null = spark.createDataFrame(
        [(1, base), (2, None)], "doc_id bigint, text string"
    )
    idx.add(with_null)
    got = {
        r.doc_id: r.verdict
        for r in idx.screen(
            spark.createDataFrame(
                [(10, base), (11, None)], "doc_id bigint, text string"
            )
        ).collect()
    }
    assert got[10] == "drop_exact"
    assert got[11] == "keep"  # null text never matches anything


def test_optimize_compacts_and_screen_unchanged(spark, tmp_path):
    """Compaction is logically invisible: screens return identical
    verdicts before and after, with fewer files underneath."""
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(19)
    base = random_doc(rng)
    for b in range(3):
        idx.add(_docs(spark, [(b * 10 + i, random_doc(rng)) for i in range(3)]))
    idx.add(_docs(spark, [(99, base)]))

    probe = _docs(spark, [(200, base), (201, random_doc(rng))])
    before = sorted(map(tuple, idx.screen(probe).collect()))
    stats = idx.optimize(target_rows=10_000)
    assert stats["digests"]["files_after"] <= stats["digests"]["files_before"]
    after = sorted(map(tuple, idx.screen(probe).collect()))
    assert before == after
    assert any(v == "drop_exact" for (_, _, _, v) in after)


def test_concurrent_adds_converge(spark, tmp_path):
    """Two threads add overlapping batches at once: the transactional
    tables absorb the race (first-wins digests, keyed bands, OR-bloom
    upsert with restart-on-conflict), so the final index state equals
    a serial add of the union — screen verdicts prove it."""
    import threading

    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(23)
    shared = random_doc(rng)
    b1 = [(1, shared)] + [(10 + i, random_doc(rng)) for i in range(3)]
    b2 = [(2, shared)] + [(20 + i, random_doc(rng)) for i in range(3)]

    errs = []
    barrier = threading.Barrier(2)

    def add(rows):
        try:
            barrier.wait()
            CorpusDedupIndex(spark, str(tmp_path / "idx")).add(_docs(spark, rows))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ts = [threading.Thread(target=add, args=(b,)) for b in (b1, b2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs

    # every added doc's content now screens as an exact duplicate
    probe = _docs(spark, [(100, shared)] + [(101, random_doc(rng))])
    got = {r.doc_id: r.verdict for r in idx.screen(probe).collect()}
    assert got[100] == "drop_exact"
    assert got[101] == "keep"
    # digests table holds exactly the distinct contents (shared counted once)
    assert idx.digests.read().count() == 7
