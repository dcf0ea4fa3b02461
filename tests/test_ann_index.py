"""Stored vector index: build/serve parity with the batch operator,
frozen-codebook incremental adds, idempotence, crash markers."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from finance_pipeline_spark.pipelines.ann_index import CorpusAnnIndex
from tests.conftest import write_embeddings

_DIM = 64


def _clustered(tmp_path, n_blobs=20, per_blob=40, seed=17):
    rng = np.random.default_rng(seed)
    centers = 6.0 * rng.standard_normal((n_blobs, _DIM))
    mat = np.vstack(
        [
            centers[b] + 0.4 * rng.standard_normal((per_blob, _DIM))
            for b in range(n_blobs)
        ]
    )
    ids = []
    nid = 1
    for _ in range(len(mat)):
        if nid % 100 == 0:
            nid += 1
        ids.append(nid)
        nid += 1
    q_idx = list(range(0, len(mat), 40))
    q_ids = [(k + 1) * 100 for k in range(len(q_idx))]
    q_mat = mat[q_idx] + 0.1 * rng.standard_normal((len(q_idx), _DIM))
    sf = write_embeddings(tmp_path, ids + q_ids, np.vstack([mat, q_mat]))
    return sf, centers, rng


def test_build_then_search_matches_batch_operator(spark, tmp_path):
    """The stored index serves through the SAME ivfpq_serve stack the
    oracle-registered operator uses — same corpus, same queries, same
    derived params => row-identical results."""
    from finance_pipeline_spark import registry
    from finance_pipeline_spark.registry import load

    sf, _, _ = _clustered(tmp_path)
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")

    idx = CorpusAnnIndex(spark, str(tmp_path / "ann"))
    stats = idx.build(e)
    assert stats["codes_inserted"] == e.count()

    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("q_emb"),
    )
    got = {
        (r.query_id, r.rnk): (r.corpus_id, r.dist)
        for r in idx.search(q, e).collect()
    }
    want = {
        (r.query_id, r.rnk): (r.corpus_id, r.dist)
        for r in registry.QUERIES["ann_ivfpq_scaled"].fn(spark, sf).collect()
    }
    assert got == want


def test_incremental_add_is_frozen_codebook_and_findable(spark, tmp_path):
    """add() encodes against the frozen codebooks (no retrain): a new
    near-duplicate of an existing vector lands in its cell and comes
    back as the query's top hit; re-adding the same batch is a keyed
    no-op."""
    from finance_pipeline_spark.registry import load

    sf, _, rng = _clustered(tmp_path)
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    idx = CorpusAnnIndex(spark, str(tmp_path / "ann"))
    idx.build(e)

    # new vector: a tight copy of query 100's embedding
    q100 = np.array(
        e.filter(F.col("vec_id") == 100).collect()[0]["embedding"],
        dtype=np.float64,
    )
    new_vec = (q100 + 0.01 * rng.standard_normal(_DIM)).astype(float)
    batch = spark.createDataFrame(
        [(900001, [float(x) for x in new_vec])],
        "vec_id bigint, embedding array<double>",
    )
    s1 = idx.add(batch)
    assert s1["codes_inserted"] == 1
    assert idx.add(batch)["codes_inserted"] == 0  # idempotent re-add

    q = spark.createDataFrame(
        [(100, [float(x) for x in q100])], "query_id bigint, q_emb array<double>"
    )
    hits = idx.search(q, e.unionByName(batch), k=5).collect()
    top = min(hits, key=lambda r: r.rnk)
    assert top.corpus_id == 900001  # the planted copy is rank-1


def test_search_before_build_raises(spark, tmp_path):
    idx = CorpusAnnIndex(spark, str(tmp_path / "ann"))
    q = spark.createDataFrame(
        [(1, [0.0] * _DIM)], "query_id bigint, q_emb array<double>"
    )
    with pytest.raises(ValueError, match="not built"):
        idx.search(q, q.select(F.col("query_id").alias("vec_id"),
                               F.col("q_emb").alias("embedding")))


def test_crashed_build_leaves_no_trusted_index(spark, tmp_path):
    """meta.json is the commit marker: a build that crashed before
    writing it (simulated by deleting it) must make every read path
    raise, and a re-build restores service."""
    from finance_pipeline_spark.registry import load

    sf, _, _ = _clustered(tmp_path, n_blobs=8, per_blob=20)
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    root = tmp_path / "ann"
    idx = CorpusAnnIndex(spark, str(root))
    idx.build(e)
    (root / "meta.json").unlink()

    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    reopened = CorpusAnnIndex(spark, str(root))
    with pytest.raises(ValueError, match="not built"):
        reopened.search(q, e)
    with pytest.raises(ValueError, match="not built"):
        reopened.add(e.limit(1))
    reopened.build(e)
    assert reopened.search(q, e).count() > 0


def test_optimize_compacts_codes(spark, tmp_path):
    from finance_pipeline_spark.registry import load

    sf, _, _ = _clustered(tmp_path, n_blobs=8, per_blob=20)
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    idx = CorpusAnnIndex(spark, str(tmp_path / "ann"))
    idx.build(e)
    for i in range(3):  # several small adds -> several files
        batch = e.limit(0).unionByName(
            spark.createDataFrame(
                [(800000 + i, [float(i)] * _DIM)],
                "vec_id bigint, embedding array<double>",
            )
        )
        idx.add(batch)
    out = idx.optimize(target_rows=10_000)
    assert out["files_after"] <= out["files_before"]
    # still serves after compaction
    q = e.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    assert idx.search(q, e).count() > 0


def test_screen_flags_planted_embedding_near_dup(spark, tmp_path):
    """The vector-space incremental screen: a near-copy of a stored
    vector flags review_near with its source as nearest neighbor; a
    novel far vector keeps."""
    from finance_pipeline_spark.registry import load

    sf, centers, rng = _clustered(tmp_path, n_blobs=8, per_blob=20)
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    idx = CorpusAnnIndex(spark, str(tmp_path / "ann"))
    idx.build(e)

    v1 = np.array(
        e.filter(F.col("vec_id") == 1).collect()[0]["embedding"],
        dtype=np.float64,
    )
    near = v1 + 0.01 * rng.standard_normal(_DIM)  # dist ~ 64*0.0001
    far = 50.0 + rng.standard_normal(_DIM)  # far from every blob
    batch = spark.createDataFrame(
        [
            (700001, [float(x) for x in near]),
            (700002, [float(x) for x in far]),
        ],
        "vec_id bigint, embedding array<double>",
    )
    out = {
        r.vec_id: r for r in idx.screen(batch, e, threshold=1.0).collect()
    }
    assert out[700001].near_dup and out[700001].verdict == "review_near"
    assert out[700001].nn_id == 1
    assert not out[700002].near_dup and out[700002].verdict == "keep"


def test_concurrent_ann_optimize_is_mutually_exclusive(spark, tmp_path):
    """r9 verdict item 5: the vector index takes the same index-root
    writer lock as the dedup/LM indexes — two concurrent optimize()
    compactions must serialize: one winner, loud loser (or both clean
    if the winner finished first), final codes identical to the
    single-writer result."""
    import threading

    from finance_pipeline_spark.sinks.keyed_writer import ConcurrentWriteError

    sf, _, _ = _clustered(tmp_path, n_blobs=4, per_blob=10)
    e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "ann")
    idx = CorpusAnnIndex(spark, root)
    idx.build(e.filter(F.col("vec_id") < 20))
    # several small adds -> several files, so compaction has real work
    for lo in (20, 30, 40):
        idx.add(e.filter(F.col("vec_id").between(lo, lo + 9)))
    want = {
        (r["vec_id"], r["cluster"])
        for r in idx.codes.read().select("vec_id", "cluster").collect()
    }

    results: dict = {}

    def run(tag):
        local = CorpusAnnIndex(spark, root)
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
    assert "err" not in outcomes, results
    assert outcomes[1] == "ok" or outcomes == ["ok", "ok"], results

    # compaction changed layout, never content; lock released after
    reopened = CorpusAnnIndex(spark, root)
    got = {
        (r["vec_id"], r["cluster"])
        for r in reopened.codes.read().select("vec_id", "cluster").collect()
    }
    assert got == want
    assert reopened.optimize(target_rows=10_000)["files_after"] <= 2


def test_search_with_missing_codes_returns_empty_not_crash(spark, tmp_path):
    """Advisor r9: meta.json survives but the codes table is empty or
    gone (build over an empty corpus / out-of-band removal) — search
    must return an empty typed frame, and screen() must then keep
    every batch row, instead of AttributeError on None."""
    sf, _, _ = _clustered(tmp_path, n_blobs=4, per_blob=10)
    e = spark.read.parquet(f"{sf}/embeddings.parquet").select(
        "vec_id", "embedding"
    )
    root = str(tmp_path / "ann")
    idx = CorpusAnnIndex(spark, root)
    idx.build(e.filter(F.lit(False)))  # empty corpus: meta lands, no codes
    q = e.limit(3).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("q_emb")
    )
    hits = idx.search(q, e)
    assert hits.columns == ["query_id", "corpus_id", "dist", "rnk"]
    assert hits.count() == 0
    verd = idx.screen(e.limit(3), e, threshold=0.5)
    assert verd.count() == 3
    assert all(r.verdict == "keep" for r in verd.collect())


def test_drift_monitor_triggers_on_distribution_shift(spark, tmp_path):
    """drift(): in-distribution batches read ratio ≈ 1 (no rebuild);
    a shifted batch's reconstruction error blows past the threshold
    and recommends the rebuild the class docstring promises. The
    baseline lands in meta.json at build; pre-baseline/empty indexes
    refuse with the rebuild instruction; empty batches refuse."""
    from finance_pipeline_spark.registry import load

    sf, _, rng = _clustered(tmp_path)
    e = load(spark, sf, "embeddings").select("vec_id", "embedding")
    idx = CorpusAnnIndex(spark, str(tmp_path / "ann"))
    meta = idx.build(e)
    assert meta["base_recon_err"] and meta["base_recon_err"] > 0

    # in-distribution: the corpus itself (superset of the train sample)
    ok = idx.drift(e)
    assert ok["n_vectors"] == e.count()
    assert ok["ratio"] < 1.5 and not ok["rebuild_recommended"]

    # shifted distribution: same cloud pushed far outside every blob
    shifted = e.select(
        "vec_id",
        F.transform("embedding", lambda x: x + F.lit(25.0)).alias(
            "embedding"
        ),
    )
    bad = idx.drift(shifted)
    assert bad["ratio"] > 5.0 and bad["rebuild_recommended"]
    assert bad["base_recon_err"] == ok["base_recon_err"]

    # refusals: empty batch; pre-baseline index
    with pytest.raises(ValueError, match="non-empty"):
        idx.drift(e.filter(F.lit(False)))
    idx2 = CorpusAnnIndex(spark, str(tmp_path / "ann2"))
    idx2.build(e.filter(F.lit(False)))  # empty build: no baseline
    with pytest.raises(ValueError, match="no drift baseline"):
        idx2.drift(e)
