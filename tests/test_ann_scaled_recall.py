"""ann_scaled_recall (r16): the exhaustive-mode recall bound for the
two rows-only capacity entries.

Pins the design rationale from the registration comment:
- exhaustive mode (nprobe = k_cells, pool = N) recovers the exact
  brute-force top-10 for EVERY query — recall 1.0 by construction, the
  property the driver oracle asserts every round;
- at the tiny test corpus, the SHIPPING configuration genuinely misses
  true neighbors (the measured reason a shipping-config recall oracle
  would grade the data regime, not the code);
- the ``pool`` parameter added to ``ivfpq_scaled_topk`` is
  default-inert (None reproduces the shipping formula's rows).
"""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def _brute_truth(k: int = 10) -> set[tuple[int, int]]:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    rows = con.execute(f"""
    WITH v AS (
        SELECT vec_id, CAST(embedding AS DOUBLE[]) AS emb FROM embeddings
    ), scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS corpus_id,
               round(list_sum([ (q.emb[i] - c.emb[i]) * (q.emb[i] - c.emb[i])
                                FOR i IN range(1, len(q.emb) + 1)]), 4) AS dist
        FROM (SELECT * FROM v WHERE vec_id % 100 = 0) q
        JOIN v c ON c.vec_id <> q.vec_id
    ), r AS (
        SELECT query_id, corpus_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY dist, corpus_id) AS rnk
        FROM scored
    )
    SELECT query_id, corpus_id FROM r WHERE rnk <= {k}
    """).fetchall()
    return {(q, c) for q, c in rows}


def test_exhaustive_recall_is_complete_and_matches_oracle(spark):
    from finance_pipeline_spark.operators.similarity import ann_scaled_recall

    got = {r.query_id: (r.n_true, r.hits) for r in
           ann_scaled_recall(spark, SF).collect()}
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    expect = min(10, n - 1)
    qids = {q for q, _ in _brute_truth()}
    assert set(got) == qids
    for qid, (n_true, hits) in got.items():
        assert n_true == expect, (qid, n_true, expect)
        assert hits == n_true, (qid, hits, n_true)


def test_shipping_config_misses_at_tiny_n(spark):
    """The documented reason the oracle uses exhaustive mode: shipping
    sqrt(N) capacity at a few-hundred-vector corpus loses true
    neighbors (data regime, not code). If this ever starts passing at
    recall 1.0 the rationale should be re-examined, not celebrated —
    hence a strict < assertion on the total."""
    from finance_pipeline_spark.operators.similarity import (
        ivfpq_scaled_topk,
    )

    truth = _brute_truth()
    ann = {
        (r.query_id, r.corpus_id)
        for r in ivfpq_scaled_topk(spark, SF)
        .select("query_id", "corpus_id")
        .collect()
    }
    assert len(ann & truth) < len(truth)


def test_pool_parameter_default_inert(spark):
    from finance_pipeline_spark.operators.similarity import (
        ivfpq_scaled_topk,
        load,
    )

    from finance_pipeline_spark.operators.similarity import (
        _RERANK_N,
        scaled_ann_params,
    )

    n = load(spark, SF, "embeddings").count()
    p_none = sorted(
        map(tuple, ivfpq_scaled_topk(spark, SF).collect())
    )
    # the shipping formula, passed explicitly — must be byte-identical
    k_cells = scaled_ann_params(n)["k_cells"]
    explicit = max(_RERANK_N, min(1024, 2 * -(-n // k_cells)))
    p_expl = sorted(
        map(tuple, ivfpq_scaled_topk(spark, SF, pool=explicit).collect())
    )
    assert p_none == p_expl


def test_scaled_recall_counts_are_self_consistent(spark):
    from finance_pipeline_spark.operators.similarity import ann_scaled_recall

    df = ann_scaled_recall(spark, SF)
    bad = df.filter(
        (F.col("hits") > F.col("n_true")) | (F.col("hits") < 0)
    ).count()
    assert bad == 0
