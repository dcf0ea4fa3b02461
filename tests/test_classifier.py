"""Trained quality classifier: deterministic distributed training
(identical weights across partitionings) and planted separation."""

from __future__ import annotations

from pyspark.sql import functions as F

from finance_pipeline_spark import registry
from finance_pipeline_spark.operators.classifier import (
    _standardize,
    doc_features,
    logreg_fit,
)
from tests.conftest import write_documents

registry.load_all()


def _planted(spark, tmp_path, rng_seed=13):
    """Class A (y=1): prose-like docs — short common tokens, sentence
    punctuation. Class B (y=0): junk — long unique tokens, digit
    soup."""
    import random

    rng = random.Random(rng_seed)
    vocab = ["the", "of", "and", "to", "in", "is", "was", "for", "on", "as"]
    docs = []
    for i in range(1, 31):
        toks = [rng.choice(vocab) for _ in range(50)]
        toks[10] = toks[10] + "."
        toks[30] = toks[30] + "."
        docs.append((i, " ".join(toks)))
    for i in range(31, 61):
        docs.append(
            (i, " ".join(f"x{rng.randrange(10**9)}zq{j}" for j in range(40)))
        )
    sf = write_documents(tmp_path, docs)
    return sf, set(range(1, 31))


def _labeled(spark, sf, ref_ids):
    d = registry.load(spark, sf, "documents").select("doc_id", "text")
    feat, _ = _standardize(doc_features(d))
    return feat.withColumn(
        "y", F.col("doc_id").isin(*sorted(ref_ids)).cast("int")
    )


def test_training_is_deterministic_across_partitionings(spark, tmp_path):
    """The decimal-accumulated gradient makes weights bit-identical
    regardless of partitioning — the audit property a 100 TB keep/drop
    decision needs."""
    sf, ref = _planted(spark, tmp_path)
    base = _labeled(spark, sf, ref)
    w1 = logreg_fit(base.repartition(2), iters=8)
    w2 = logreg_fit(base.repartition(13), iters=8)
    w3 = logreg_fit(base.coalesce(1), iters=8)
    assert w1 == w2 == w3
    assert any(abs(x) > 0 for x in w1)  # it actually learned something


def test_planted_separation(spark, tmp_path):
    """Prose vs junk must separate: every class-A doc outscored every
    class-B doc after 20 iterations."""
    sf, ref = _planted(spark, tmp_path)
    labeled = _labeled(spark, sf, ref)
    w = logreg_fit(labeled)
    from finance_pipeline_spark.operators.classifier import _margin

    scores = {
        r.doc_id: r.s
        for r in labeled.select(
            "doc_id", F.round(_margin(w), 6).alias("s")
        ).collect()
    }
    a = [scores[i] for i in sorted(ref)]
    b = [s for i, s in scores.items() if i not in ref]
    assert min(a) > max(b), (min(a), max(b))


def test_registered_query_scores_every_document(spark):
    sf = "/root/testdata/sf0.001"
    out = registry.QUERIES["text_quality_classifier"].fn(spark, sf)
    rows = out.collect()
    n_docs = registry.load(spark, sf, "documents").count()
    assert len(rows) == n_docs
    assert {r.ref_like for r in rows} <= {True, False}
    # deterministic end-to-end: a second run reproduces every score
    again = registry.QUERIES["text_quality_classifier"].fn(spark, sf).collect()
    assert sorted((r.doc_id, r.score) for r in rows) == sorted(
        (r.doc_id, r.score) for r in again
    )


def test_clf_calibration_bins_matches_duckdb(spark):
    """The staged r15 calibration oracle equals clf_calibration_bins
    row-for-row (exact micro-integer arithmetic end-to-end), the bins
    tile [0,1] sanely, and counts reconcile with the corpus."""
    import duckdb

    from finance_pipeline_spark.operators.classifier import (
        _clf_calibration_oracle,
        clf_calibration_bins,
    )

    sf = "/root/testdata/sf0.001"
    got = sorted(
        (r.bin, r.n_docs, r.n_ref, r.mean_score, r.ref_rate)
        for r in clf_calibration_bins(spark, sf).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(map(tuple, con.execute(_clf_calibration_oracle()).fetchall()))
    assert got == want and len(got) > 0
    assert all(0 <= b <= 9 for b, *_ in got)
    n_docs = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert sum(r[1] for r in got) == n_docs
    # a bin's mean predicted score sits inside the bin's range
    for b, n, nref, mean, rate in got:
        assert b / 10 - 1e-9 <= mean <= (b + 1) / 10 + 1e-9 or b == 9
        assert 0.0 <= rate <= 1.0
