"""CorpusDedupIndex: the stored/appendable screen state. Contracts:
screen-vs-fresh-index is all-keep; planted exact/near/novel docs get
the dedup_incremental verdict tiers against STORED state; add() is
idempotent under re-delivery; a new instance on the same path (restart)
sees the accumulated index; the bloom words stay OR-consistent."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

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

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )
    from finance_pipeline_spark.pipelines.dedup_index import _digest

    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(13)
    b1 = _docs(spark, [(i, random_doc(rng)) for i in range(3)])
    b2 = _docs(spark, [(i + 10, random_doc(rng)) for i in range(3)])
    idx.add(b1)
    idx.add(b2)

    rebuilt = build_digest_bloom_ranged(
        b1.unionByName(b2).select(_digest().alias("dg"))
    )
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

    # the r7 advisory's lost-update check: the stored bloom must equal
    # a from-scratch build over ALL stored digests — a read-merge-
    # overwrite race would drop the winner's bits for the docs unique
    # to one batch (probing only the shared doc can't see that).
    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )

    rebuilt = build_digest_bloom_ranged(idx.digests.read().select(F.col("dg")), "dg")
    assert np.array_equal(idx._bloom_words(), rebuilt)

    # every doc from BOTH batches screens drop_exact (not just the shared one)
    all_docs = _docs(spark, [(200 + i, t) for i, (_, t) in enumerate(b1 + b2)])
    verdicts = {r.doc_id: r.verdict for r in idx.screen(all_docs).collect()}
    assert all(v == "drop_exact" for v in verdicts.values()), verdicts


def test_optimize_folds_bloom_deltas(spark, tmp_path):
    """Per-add bloom delta rows are folded to one consolidated row-set
    by optimize(); the folded bitmap is bit-identical to the pre-fold
    fold-on-read view and to a from-scratch rebuild."""
    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )

    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(29)
    for b in range(3):
        idx.add(_docs(spark, [(b * 10 + i, random_doc(rng)) for i in range(3)]))
    assert idx.bloom.read().select("token").distinct().count() == 3

    before = idx._bloom_words().copy()
    stats = idx.optimize(target_rows=10_000)
    assert stats["bloom_tokens_folded"] == 3
    assert idx.bloom.read().select("token").distinct().count() == 1
    assert np.array_equal(idx._bloom_words(), before)
    rebuilt = build_digest_bloom_ranged(idx.digests.read().select("dg"), "dg")
    assert np.array_equal(idx._bloom_words(), rebuilt)
    # folding again is a no-op
    assert idx.optimize(target_rows=10_000)["bloom_tokens_folded"] == 0


def test_crashed_add_converges_on_replay(spark, tmp_path):
    """Crash-ordering invariant (bloom → bands → digests): kill add()
    right before the digests commit, then replay the batch. The doc
    must still re-screen as a SURVIVOR (not drop_exact) so the replay
    re-runs add() for it and backfills the digest — afterwards the
    index state equals a never-crashed add (including the band rows a
    digest-first ordering would lose forever)."""
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    rng = random.Random(31)
    batch = _docs(spark, [(1, random_doc(rng)), (2, random_doc(rng))])

    real_merge = idx.digests.merge

    def boom(df):
        raise RuntimeError("injected crash before digests commit")

    idx.digests.merge = boom
    try:
        idx.add(batch)
        raise AssertionError("injected crash did not fire")
    except RuntimeError:
        pass
    idx.digests.merge = real_merge

    # bloom + bands committed, digests did not: replay re-screens the
    # docs as survivors (bloom false-positive is killed by the confirm
    # join against the EMPTY digests table; band self-hits only flag
    # review_near) — never drop_exact, so add() runs again.
    verdicts = {r.doc_id: r.verdict for r in idx.screen(batch).collect()}
    assert all(v != "drop_exact" for v in verdicts.values()), verdicts

    replay = idx.add(batch)
    assert replay["digests_inserted"] == 2  # backfilled
    assert replay["bands_inserted"] == 0  # already committed pre-crash
    assert replay["bloom_words_touched"] == 0  # same content-addressed token

    # converged: everything now screens drop_exact, bloom matches rebuild
    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )

    verdicts = {r.doc_id: r.verdict for r in idx.screen(batch).collect()}
    assert all(v == "drop_exact" for v in verdicts.values())
    rebuilt = build_digest_bloom_ranged(idx.digests.read().select("dg"), "dg")
    assert np.array_equal(idx._bloom_words(), rebuilt)


def test_bloom_broadcast_cache_is_bounded(spark, tmp_path):
    """Repeated per-micro-batch screens must not accumulate broadcast
    blocks (r7 advisory): the content-keyed cache holds at most
    _BLOOM_BC_CAP live broadcasts and re-uses an entry for an
    unchanged bitmap instead of re-broadcasting."""
    import numpy as np

    from finance_pipeline_spark.operators import dedup

    dedup._BLOOM_BC_CACHE.clear()
    n_words = dedup._BLOOM_BITS >> 6
    rng = np.random.default_rng(5)
    for i in range(dedup._BLOOM_BC_CAP + 3):
        words = rng.integers(0, 1 << 62, size=n_words, dtype=np.int64).view(np.uint64)
        dedup._bloom_broadcast(spark, words)
        assert len(dedup._BLOOM_BC_CACHE) <= dedup._BLOOM_BC_CAP
    # same content → cache hit, not a new broadcast
    words = rng.integers(0, 1 << 62, size=n_words, dtype=np.int64).view(np.uint64)
    bc1 = dedup._bloom_broadcast(spark, words)
    bc2 = dedup._bloom_broadcast(spark, words.copy())
    assert bc1 is bc2


def test_legacy_bloom_layouts_rebuild_on_open(spark, tmp_path):
    """Indexes persisted by BOTH legacy bloom layouts — pre-r8
    ([word_idx] mutable rows) and r8 un-ranged deltas ([word_idx,
    token]) — must open cleanly: the current code detects the missing
    range_idx column and rebuilds the ranged bitmaps from the digests
    table (the source of truth) with zero lost exact-screen coverage."""
    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )
    from finance_pipeline_spark.pipelines.dedup_index import _digest
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    for variant, schema, row_fn in (
        ("pre_r8", "word_idx bigint, word bigint", lambda i, w: (i, w)),
        (
            "r8",
            "word_idx bigint, token string, word bigint",
            lambda i, w: (i, "legacy-add", w),
        ),
    ):
        root = tmp_path / f"idx_{variant}"
        rng = random.Random(29)
        batch = _docs(spark, [(i, random_doc(rng)) for i in range(4)])

        # build the index with CURRENT code, then rewrite the bloom
        # table in the legacy layout (flattened, un-ranged words)
        idx = CorpusDedupIndex(spark, str(root))
        idx.add(batch)
        flat = np.bitwise_or.reduce(
            idx._bloom_words().view(np.uint64), axis=0
        ).view(np.int64)
        old_rows = [row_fn(int(i), int(w)) for i, w in enumerate(flat) if w]
        idx.bloom.drop()
        keys = ["word_idx"] if variant == "pre_r8" else ["word_idx", "token"]
        TxnKeyedTable(spark, str(root / "bloom"), keys).merge(
            spark.createDataFrame(old_rows, schema)
        )

        # reopening rebuilds the ranged layout from digests
        idx2 = CorpusDedupIndex(spark, str(root))
        stored = idx2.bloom.read()
        assert "range_idx" in stored.columns
        rebuilt = build_digest_bloom_ranged(batch.select(_digest().alias("dg")))
        assert np.array_equal(idx2._bloom_words(), rebuilt)
        assert not (root / "bloom_rebuild_pending").exists()

        # the rebuilt index still screens and accepts adds
        verdicts = {r.doc_id: r.verdict for r in idx2.screen(batch).collect()}
        assert set(verdicts.values()) == {"drop_exact"}
        b2 = _docs(spark, [(100, random_doc(rng))])
        idx2.add(b2)
        assert idx2.screen(b2).collect()[0].verdict == "drop_exact"


def test_bloom_rebuild_marker_replays_after_crash(spark, tmp_path):
    """Crash corner: the rebuild marker exists (crash between drop and
    rebuild — the bloom table may be missing entirely). Reopening must
    finish the rebuild from digests; exact-screen coverage is restored,
    never silently degraded to keep-everything."""
    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )
    from finance_pipeline_spark.pipelines.dedup_index import _digest

    root = tmp_path / "idx"
    rng = random.Random(31)
    batch = _docs(spark, [(i, random_doc(rng)) for i in range(3)])
    idx = CorpusDedupIndex(spark, str(root))
    idx.add(batch)
    # simulate the crash: marker down, bloom table gone
    idx.bloom.drop()
    (root / "bloom_rebuild_pending").touch()

    idx2 = CorpusDedupIndex(spark, str(root))
    assert not (root / "bloom_rebuild_pending").exists()
    rebuilt = build_digest_bloom_ranged(batch.select(_digest().alias("dg")))
    assert np.array_equal(idx2._bloom_words(), rebuilt)
    verdicts = {r.doc_id: r.verdict for r in idx2.screen(batch).collect()}
    assert set(verdicts.values()) == {"drop_exact"}


def test_legacy_migration_backup_sidecar_triggers_rebuild(spark, tmp_path):
    """A pre-r9 migration-backup sidecar (torn or complete — the
    advisor-flagged corner) is treated as one more legacy signal: the
    sidecar is discarded and the bloom rebuilt from digests, so no
    crash point of the RETIRED backup scheme can lose coverage."""
    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )
    from finance_pipeline_spark.pipelines.dedup_index import _digest

    root = tmp_path / "idx"
    rng = random.Random(37)
    batch = _docs(spark, [(i, random_doc(rng)) for i in range(3)])
    idx = CorpusDedupIndex(spark, str(root))
    idx.add(batch)
    # torn sidecar: a part file landed but no _SUCCESS (crash mid-write)
    backup = root / "bloom_migrate_v1.parquet"
    backup.mkdir(parents=True)
    (backup / "part-00000.parquet").write_bytes(b"\x00garbage not parquet")

    idx2 = CorpusDedupIndex(spark, str(root))
    assert not backup.exists()
    rebuilt = build_digest_bloom_ranged(batch.select(_digest().alias("dg")))
    assert np.array_equal(idx2._bloom_words(), rebuilt)
    stored = idx2.bloom.read()
    assert "range_idx" in stored.columns


def test_concurrent_optimize_is_mutually_exclusive(spark, tmp_path):
    """r8 verdict item 6: two concurrent optimize() calls must not
    interleave their fold/delete windows. The index-root writer lock
    makes exactly one win; the loser fails loudly, and the final state
    equals the single-writer result (fold-once, coverage intact)."""
    import threading

    import numpy as np

    from finance_pipeline_spark.operators.dedup import (
        build_digest_bloom_ranged,
    )
    from finance_pipeline_spark.pipelines.dedup_index import _digest
    from finance_pipeline_spark.sinks.keyed_writer import ConcurrentWriteError

    root = tmp_path / "idx"
    rng = random.Random(43)
    idx = CorpusDedupIndex(spark, str(root))
    batches = []
    for b in range(3):
        batch = _docs(spark, [(b * 10 + i, random_doc(rng)) for i in range(3)])
        batches.append(batch)
        idx.add(batch)
    assert idx.bloom.read().select("token").distinct().count() == 3

    results: dict = {}

    def run(tag):
        # each thread gets its own handle (same stored state)
        local = CorpusDedupIndex(spark, str(root))
        try:
            results[tag] = ("ok", local.optimize(target_rows=10_000))
        except ConcurrentWriteError as exc:
            results[tag] = ("locked", str(exc))
        except Exception as exc:  # noqa: BLE001 — surface in assert below
            results[tag] = ("err", f"{type(exc).__name__}: {exc}")

    ts = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    outcomes = sorted(kind for kind, _ in results.values())
    # one winner; the other either lost the lock race or found nothing
    # left to fold (the winner finished before it acquired)
    assert outcomes[1] == "ok" or outcomes == ["ok", "ok"], results
    assert "err" not in outcomes, results

    # final state == the single-writer result: one fold token, bitmap
    # identical to a from-scratch rebuild, everything screens exact
    reopened = CorpusDedupIndex(spark, str(root))
    assert reopened.bloom.read().select("token").distinct().count() == 1
    rebuilt = build_digest_bloom_ranged(
        reopened.digests.read().select("dg"), "dg"
    )
    assert np.array_equal(reopened._bloom_words(), rebuilt)
    # lock released: a later optimize runs clean
    assert reopened.optimize(target_rows=10_000)["bloom_tokens_folded"] == 0


def test_scaled_bloom_params_derivation():
    """Range count derives from digest capacity: power-of-two steps,
    floored at the 4-range default, ceilinged at 256 (one per first
    digest byte)."""
    from finance_pipeline_spark.operators.dedup import (
        _BLOOM_RANGE_CAP,
        scaled_bloom_params,
    )

    assert scaled_bloom_params(0)["n_ranges"] == 4
    assert scaled_bloom_params(_BLOOM_RANGE_CAP * 4)["n_ranges"] == 4
    assert scaled_bloom_params(_BLOOM_RANGE_CAP * 4 + 1)["n_ranges"] == 8
    assert scaled_bloom_params(_BLOOM_RANGE_CAP * 100)["n_ranges"] == 128
    assert scaled_bloom_params(10**12)["n_ranges"] == 256
    # every derived count divides 256 -> first-byte routing is uniform
    for n in (0, 10, 10**6, 10**9, 10**12):
        assert 256 % scaled_bloom_params(n)["n_ranges"] == 0


def test_ranged_bloom_membership_holds_at_any_range_count(spark):
    """Build+probe agree at EVERY range count (the probe derives the
    routing from the bitmap array's own shape): planted digests are
    always found, absent ones (almost) never — no false negatives at
    4, 16, or 256 ranges."""
    from finance_pipeline_spark.operators.dedup import (
        bloom_maybe_contains_ranged,
        build_digest_bloom_ranged,
    )

    docs = spark.range(200).select(
        F.sha2(F.concat(F.lit("doc-"), F.col("id").cast("string")), 256).alias(
            "dg"
        )
    )
    probe = spark.range(400).select(
        F.col("id").alias("i"),
        F.sha2(F.concat(F.lit("doc-"), F.col("id").cast("string")), 256).alias(
            "dg"
        ),
    )
    for n_ranges in (4, 16, 256):
        words = build_digest_bloom_ranged(docs, n_ranges=n_ranges)
        assert words.shape[0] == n_ranges
        got = {
            r["i"]: r["hit"]
            for r in probe.select(
                "i",
                bloom_maybe_contains_ranged(spark, words, F.col("dg")).alias(
                    "hit"
                ),
            ).collect()
        }
        assert all(got[i] for i in range(200)), f"false negative at {n_ranges}"
        # fp rate sanity on the 200 absent digests (sized for ~1%)
        assert sum(got[i] for i in range(200, 400)) <= 10


def test_bloom_resplit_migrates_stored_index_between_range_counts(
    spark, tmp_path, monkeypatch
):
    """The r9 verdict's re-split path: when the corpus outgrows its
    range count, optimize() rebuilds the stored bloom from the digests
    table at the derived count — screens stay exact across the
    migration, and subsequent adds route with the NEW count."""
    import finance_pipeline_spark.operators.dedup as dedup_mod

    rng = random.Random(61)
    docs = [(i, random_doc(rng, 30)) for i in range(30)]
    d = spark.createDataFrame(docs, "doc_id bigint, text string")
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    idx.add(d)
    assert idx._bloom_n_ranges() == 4  # no meta yet -> legacy default

    # shrink the per-range capacity so 30 digests derive 16 ranges
    monkeypatch.setattr(dedup_mod, "_BLOOM_RANGE_CAP", 2)
    out = idx.optimize()
    assert out["bloom_resplit"] == {"from": 4, "to": 16}
    assert idx._bloom_n_ranges() == 16
    assert idx._bloom_words().shape[0] == 16

    # exactness across the migration: every stored doc still screens
    # drop_exact, novel docs still keep
    verd = {r.doc_id: r.verdict for r in idx.screen(d).collect()}
    assert all(v == "drop_exact" for v in verd.values())
    novel = spark.createDataFrame(
        [(100 + i, random_doc(rng, 30)) for i in range(5)],
        "doc_id bigint, text string",
    )
    assert all(r.verdict != "drop_exact" for r in idx.screen(novel).collect())

    # idempotent at the same corpus size: nothing left to re-split
    assert idx.optimize()["bloom_resplit"] is None

    # adds after the re-split route with the new count
    idx.add(novel)
    verd2 = {r.doc_id: r.verdict for r in idx.screen(novel).collect()}
    assert all(v == "drop_exact" for v in verd2.values())

    # a reopened handle reads the persisted count
    again = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    assert again._bloom_n_ranges() == 16

    # continued growth re-splits again (35 digests at cap 2 -> 32),
    # and the screen stays exact through the second migration too
    out2 = again.optimize()
    assert out2["bloom_resplit"] == {"from": 16, "to": 32}
    verd3 = {r.doc_id: r.verdict for r in again.screen(d).collect()}
    assert all(v == "drop_exact" for v in verd3.values())


def test_add_racing_resplit_remerges_at_new_generation(
    spark, tmp_path, monkeypatch
):
    """The advisor-r10 medium race, closed in-band: an add that read
    the bloom meta BEFORE a re-split flipped the routing generation
    lands its bloom delta under the stale generation (invisible to
    readers) — its post-commit generation check must detect the flip
    and re-merge under the new routing, so the batch's stored digests
    never screen 'keep' (a permanent exact-dup false negative)."""
    import finance_pipeline_spark.operators.dedup as dedup_mod

    rng = random.Random(71)
    b1 = _docs(spark, [(i, random_doc(rng, 30)) for i in range(20)])
    b2 = _docs(spark, [(100 + i, random_doc(rng, 30)) for i in range(6)])
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    idx.add(b1)
    stale_meta = idx._read_bloom_meta()

    # corpus outgrows its range count -> re-split bumps the generation
    monkeypatch.setattr(dedup_mod, "_BLOOM_RANGE_CAP", 2)
    assert idx.optimize()["bloom_resplit"] is not None
    new_meta = idx._read_bloom_meta()
    assert new_meta[1] == stale_meta[1] + 1

    # sharpness control: replicate the OLD code's behavior (stale bloom
    # merge + digest commit, NO generation check) on a copy of the
    # state — the batch screens 'keep', i.e. the false negative is real
    from finance_pipeline_spark.pipelines.dedup_index import _digest

    ctl = CorpusDedupIndex(spark, str(tmp_path / "idx2"))
    ctl.add(b1)
    monkeypatch.setattr(dedup_mod, "_BLOOM_RANGE_CAP", 2)
    ctl.optimize()
    ctl._merge_bloom_delta(b2, *stale_meta)  # stale-routed bits
    ctl.digests.merge(
        b2.select(_digest().alias("dg"), F.col("doc_id").alias("first_doc_id"))
    )
    assert all(
        not r.exact_dup for r in ctl.screen(b2).collect()
    ), "control: without the generation re-merge the dup bits are lost"

    # the FIX: run add(b2) with its first meta read forced stale (the
    # in-flight interleaving); the post-commit check re-merges
    calls = {"n": 0}
    real_read = idx._read_bloom_meta

    def staged():
        calls["n"] += 1
        return stale_meta if calls["n"] == 1 else real_read()

    monkeypatch.setattr(idx, "_read_bloom_meta", staged)
    idx.add(b2)
    assert calls["n"] >= 2  # the post-commit check actually ran
    verd = {r.doc_id: r.verdict for r in idx.screen(b2).collect()}
    assert all(v == "drop_exact" for v in verd.values())


def test_stale_generation_rows_are_invisible_and_gcd(spark, tmp_path, monkeypatch):
    """Rows tagged with a non-current generation (a crashed re-split's
    orphans, a raced add's superseded delta) must never reach a probe
    — folding them would mix two routings — and the next optimize
    garbage-collects them."""
    import numpy as np

    import finance_pipeline_spark.operators.dedup as dedup_mod

    rng = random.Random(73)
    b1 = _docs(spark, [(i, random_doc(rng, 30)) for i in range(20)])
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    idx.add(b1)
    monkeypatch.setattr(dedup_mod, "_BLOOM_RANGE_CAP", 2)
    idx.optimize()
    n_ranges, gen = idx._read_bloom_meta()
    before = idx._bloom_words()
    assert before.shape[0] == n_ranges

    # plant garbage under an older AND a newer generation: range
    # indices beyond the current count + all-ones words — if a probe
    # folded them the bitmap shape/content would be wrong
    junk = [
        (int(n_ranges + 3), 0, f"g{gen - 1:08d}n{n_ranges + 7}-junk", -1),
        (0, 1, f"g{gen + 5:08d}n2-junk", -1),
        (1, 2, "legacy-unprefixed-junk", -1),
    ]
    idx.bloom.merge(
        spark.createDataFrame(
            junk, "range_idx bigint, word_idx bigint, token string, word bigint"
        )
    )
    after = idx._bloom_words()
    assert after.shape == before.shape and np.array_equal(after, before)
    verd = {r.doc_id: r.verdict for r in idx.screen(b1).collect()}
    assert all(v == "drop_exact" for v in verd.values())

    # optimize GCs every non-current generation's rows
    idx.optimize()
    toks = {r["token"] for r in idx.bloom.read().select("token").distinct().collect()}
    assert all(t.startswith(idx._gen_prefix(gen, n_ranges)) for t in toks)


def test_crashed_resplit_before_flip_leaves_old_generation_authoritative(
    spark, tmp_path, monkeypatch
):
    """Crash between the new generation's rebuild and the meta flip:
    the old generation is untouched and still authoritative (screens
    stay exact), the orphaned new-generation rows are invisible, and
    the next optimize completes the re-split."""
    import pytest

    import finance_pipeline_spark.operators.dedup as dedup_mod

    rng = random.Random(83)
    b1 = _docs(spark, [(i, random_doc(rng, 30)) for i in range(20)])
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    idx.add(b1)
    meta0 = idx._read_bloom_meta()
    monkeypatch.setattr(dedup_mod, "_BLOOM_RANGE_CAP", 2)

    boom = {"armed": True}
    real_write = idx._write_bloom_meta

    def crashing_write(n_ranges, gen):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated crash before meta flip")
        return real_write(n_ranges, gen)

    monkeypatch.setattr(idx, "_write_bloom_meta", crashing_write)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.optimize()
    # old generation still authoritative; screens exact
    assert idx._read_bloom_meta() == meta0
    verd = {r.doc_id: r.verdict for r in idx.screen(b1).collect()}
    assert all(v == "drop_exact" for v in verd.values())
    # retry completes (writer lock was released by the context manager)
    out = idx.optimize()
    assert out["bloom_resplit"] is not None
    assert idx._read_bloom_meta()[1] == meta0[1] + 1
    verd2 = {r.doc_id: r.verdict for r in idx.screen(b1).collect()}
    assert all(v == "drop_exact" for v in verd2.values())


def test_crashed_resplit_before_gc_is_cleaned_by_next_fold(
    spark, tmp_path, monkeypatch
):
    """Crash after the meta flip but before the old-generation GC: the
    new generation is complete and live (screens exact immediately),
    and the stale rows are garbage-collected by the next optimize's
    fold."""
    import pytest

    import finance_pipeline_spark.operators.dedup as dedup_mod

    rng = random.Random(89)
    b1 = _docs(spark, [(i, random_doc(rng, 30)) for i in range(20)])
    idx = CorpusDedupIndex(spark, str(tmp_path / "idx"))
    idx.add(b1)
    monkeypatch.setattr(dedup_mod, "_BLOOM_RANGE_CAP", 2)

    boom = {"armed": True}
    real_delete = idx.bloom.delete

    def crashing_delete(pred):
        if boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("simulated crash before generation GC")
        return real_delete(pred)

    monkeypatch.setattr(idx.bloom, "delete", crashing_delete)
    with pytest.raises(RuntimeError, match="simulated crash"):
        idx.optimize()
    n_ranges, gen = idx._read_bloom_meta()
    assert gen == 1  # flip landed
    verd = {r.doc_id: r.verdict for r in idx.screen(b1).collect()}
    assert all(v == "drop_exact" for v in verd.values())
    # stale generation rows still on disk...
    toks = {r["token"] for r in idx.bloom.read().select("token").distinct().collect()}
    assert any(not t.startswith(idx._gen_prefix(gen, n_ranges)) for t in toks)
    # ...until the next optimize's fold GCs them
    idx.optimize()
    toks2 = {r["token"] for r in idx.bloom.read().select("token").distinct().collect()}
    assert all(t.startswith(idx._gen_prefix(gen, n_ranges)) for t in toks2)
    verd2 = {r.doc_id: r.verdict for r in idx.screen(b1).collect()}
    assert all(v == "drop_exact" for v in verd2.values())
