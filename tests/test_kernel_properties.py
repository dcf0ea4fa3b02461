"""Property sweeps for the two r15 second-session Arrow kernels:

- ``_gram_posting_rows`` (the overlap-family posting front end):
  driven through ``text_ngram_novelty`` against a pure-Python
  brute force on hypothesis-generated corpora — the distinct-set
  cardinalities and the cross-document sharing structure must match
  exactly whatever the token distribution (repeats, unicode, digits,
  single-token docs, duplicate docs).
- the ``ann_dim_truncation_recall`` prefix-matmul + k-th-best-margin
  preselect: against an exact brute force that mirrors the contract
  semantics (HALF_UP 4-dp rounding, (cosine DESC, corpus_id)
  tie-break, per-width zero-norm and self-pair exclusion) on integer
  vectors chosen to force ties and zero prefixes — the adversarial
  inputs for a margin-based preselect.

Each example is one Spark run, so the sweeps keep max_examples small;
the value is in hypothesis shrinking any structural counterexample,
not in volume.
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal

import pandas as pd
import pytest

pytestmark = pytest.mark.usefixtures("spark")

_TOKENS = ["a", "b", "ab", "é", "7", "x" * 12]


def _round4_half_up(x: float) -> float:
    return float(Decimal(x).quantize(Decimal("0.0001"), ROUND_HALF_UP))


def _brute_novelty(docs: list[list[str]]) -> dict[int, tuple]:
    grams = {
        i: {" ".join(t[j : j + 3]) for j in range(len(t) - 2)}
        for i, t in enumerate(docs)
    }
    out = {}
    for i, g in grams.items():
        shared = {
            x for x in g if any(x in g2 for j, g2 in grams.items() if j != i)
        }
        out[i] = (
            len(g),
            len(shared),
            (len(shared) / len(g)) if g else None,
        )
    return out


def test_gram_kernel_matches_brute_force_novelty(spark, tmp_path):
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.textops import text_ngram_novelty

    doc_strategy = st.lists(
        st.sampled_from(_TOKENS), min_size=0, max_size=12
    )

    @settings(max_examples=5, deadline=None)
    @given(st.lists(doc_strategy, min_size=1, max_size=30))
    def run(corpus):
        d = tmp_path / "case"
        d.mkdir(exist_ok=True)
        pd.DataFrame(
            {
                "doc_id": range(len(corpus)),
                "text": [" ".join(t) for t in corpus],
                "lang": ["en"] * len(corpus),
                "source": ["s"] * len(corpus),
                "n_chars": [0] * len(corpus),
            }
        ).to_parquet(str(d / "documents.parquet"))
        got = {
            r["doc_id"]: (r["n_grams"], r["n_shared"], r["shared_frac"])
            for r in text_ngram_novelty(spark, str(d)).collect()
        }
        # NB "" tokens: "".join of empty list -> text "", which
        # tokenizes to [""] (1 token) -> no trigram, like brute force
        # on a <3-token doc.
        want = _brute_novelty(
            [t if t else [""] for t in corpus]
        )
        assert set(got) == set(want)
        for i in want:
            assert got[i][0] == want[i][0], (i, got[i], want[i])
            assert got[i][1] == want[i][1], (i, got[i], want[i])
            if want[i][2] is None:
                assert got[i][2] is None
            else:
                assert got[i][2] == pytest.approx(want[i][2], abs=1e-12)

    run()


def _brute_trunc_recall(vecs: dict[int, list[int]]) -> list[tuple]:
    import math

    widths = (8, 16, 32, 64)
    queries = {i: v for i, v in vecs.items() if i % 100 == 0}
    ranked: dict[tuple[int, int], list[int]] = {}
    for qid, qv in queries.items():
        for w in widths:
            qs = qv[:w]
            qn = math.sqrt(sum(x * x for x in qs))
            if qn == 0:
                continue
            scored = []
            for cid, cv in vecs.items():
                if cid == qid:
                    continue
                cs = cv[:w]
                cn = math.sqrt(sum(x * x for x in cs))
                if cn == 0:
                    continue
                cos = _round4_half_up(
                    sum(a * b for a, b in zip(qs, cs)) / (qn * cn)
                )
                scored.append((-cos, cid))
            scored.sort()
            ranked[(qid, w)] = [cid for _, cid in scored[:10]]
    out = []
    for qid in sorted(queries):
        full = set(ranked.get((qid, 64), []))
        if not full:
            continue
        for w in (8, 16, 32):
            overlap = len(set(ranked.get((qid, w), [])) & full)
            out.append((qid, w, overlap, len(full), overlap / len(full)))
    return out


def test_trunc_recall_margin_matches_exact_brute_force(spark, tmp_path):
    """Integer vectors in a tiny value range force exact cosine TIES
    (the id tie-break must decide identically in the kernel preselect
    and the brute force) and all-zero prefixes (per-width exclusion).
    Ten corpus vectors per query keeps n_full at the _TOPK boundary,
    where an off-by-one in the k-th-best margin would show."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.similarity import (
        ann_dim_truncation_recall,
    )

    vec = st.lists(st.integers(-2, 2), min_size=64, max_size=64)

    @settings(max_examples=4, deadline=None)
    @given(st.lists(vec, min_size=12, max_size=26), st.data())
    def run(vectors, data):
        n_q = data.draw(st.integers(1, 2))
        ids = [100 * (i + 1) for i in range(n_q)] + [
            i + 1 for i in range(len(vectors) - n_q) if (i + 1) % 100
        ][: len(vectors) - n_q]
        vecs = {i: v for i, v in zip(ids, vectors)}
        d = tmp_path / "emb"
        d.mkdir(exist_ok=True)
        pd.DataFrame(
            {
                "vec_id": list(vecs),
                "embedding": [
                    [float(x) for x in v] for v in vecs.values()
                ],
                "label": [0] * len(vecs),
            }
        ).to_parquet(str(d / "embeddings.parquet"))
        got = sorted(
            (
                r["query_id"],
                r["trunc_dim"],
                r["n_overlap"],
                r["n_full"],
                r["recall"],
            )
            for r in ann_dim_truncation_recall(spark, str(d)).collect()
        )
        want = sorted(_brute_trunc_recall(vecs))
        assert [g[:4] for g in got] == [w[:4] for w in want], (got, want)
        for g, w in zip(got, want):
            assert g[4] == pytest.approx(w[4], abs=1e-12)

    run()


def test_source_overlap_bitmask_and_fallback_agree(spark, tmp_path, monkeypatch):
    """The <=64-source bitmask fast path and the collect_set fallback
    of source_overlap_matrix must be output-identical on the SAME
    corpus — forced by dropping _BITMASK_MAX_SOURCES to 0 for the
    second run. Hypothesis varies source fan-out and shared-trigram
    structure; a divergence in pair counts, totals, or jaccard
    between the two aggregation strategies shrinks to a minimal
    corpus."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators import textops as T

    doc_strategy = st.tuples(
        st.integers(0, 5),  # source index
        st.lists(st.sampled_from(_TOKENS), min_size=0, max_size=10),
    )

    @settings(max_examples=4, deadline=None)
    @given(st.lists(doc_strategy, min_size=1, max_size=25))
    def run(corpus):
        d = tmp_path / "so"
        d.mkdir(exist_ok=True)
        pd.DataFrame(
            {
                "doc_id": range(len(corpus)),
                "text": [" ".join(t) for _s, t in corpus],
                "lang": ["en"] * len(corpus),
                "source": [f"s{s}" for s, _t in corpus],
                "n_chars": [0] * len(corpus),
            }
        ).to_parquet(str(d / "documents.parquet"))
        fast = sorted(map(tuple, T.source_overlap_matrix(spark, str(d)).collect()))
        monkeypatch.setattr(T, "_BITMASK_MAX_SOURCES", 0)
        try:
            slow = sorted(
                map(tuple, T.source_overlap_matrix(spark, str(d)).collect())
            )
        finally:
            monkeypatch.setattr(T, "_BITMASK_MAX_SOURCES", 64)
        assert fast == slow

    run()
