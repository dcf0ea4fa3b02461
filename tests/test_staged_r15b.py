"""Parity + planted-fixture pins for the second batch of r15-staged
operators (round-14 extended session): trigram corpus-novelty,
cross-source provenance overlap, stratified eval sampling, the
embedding-space eval-contamination audit, and the label-centroid
domain-fingerprint matrix.

Each test runs the Spark operator AND its staged DuckDB oracle on the
driver corpus shape (sf0.001) and on a planted corpus with hand-computed
expectations — the same pattern that pinned every earlier staged op
until its registration landed.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _duck(sf_dir: str, sql: str, table: str = "documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def _got(df):
    return sorted(tuple(r) for r in df.collect())


def test_ngram_novelty_matches_duckdb_and_planted(spark, tmp_path):
    """shared_frac counts exactly the distinct trigrams present in at
    least one OTHER document."""
    from finance_pipeline_spark.operators.textops import (
        _ngram_novelty_oracle,
        text_ngram_novelty,
    )

    got = _got(text_ngram_novelty(spark, SF))
    want = _duck(SF, _ngram_novelty_oracle())
    assert got == want and len(got) > 0
    # real signal at the corpus shape: some doc shares, none is all-new
    assert any(r[2] > 0 for r in got)

    # planted: doc1/doc2 share exactly one trigram ("a b c"); doc3 is
    # disjoint; doc4 is too short for any trigram.
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b c d", "x a b c", "p q r s", "u v"],
            "lang": ["en"] * 4,
            "source": ["s"] * 4,
            "n_chars": [0] * 4,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = {r[0]: r for r in _got(text_ngram_novelty(spark, str(tmp_path)))}
    assert got == {
        r[0]: r for r in _duck(str(tmp_path), _ngram_novelty_oracle())
    }
    assert got[1] == (1, 2, 1, 0.5)  # "a b c","b c d" -> one shared
    assert got[2] == (2, 2, 1, 0.5)  # "x a b","a b c"
    assert got[3] == (3, 2, 0, 0.0)
    assert got[4][1:] == (0, 0, None)  # no trigram -> NULL fraction


def test_source_overlap_matrix_matches_duckdb_and_planted(spark, tmp_path):
    """Pairwise shared-trigram counts and exact vocabulary Jaccard."""
    from finance_pipeline_spark.operators.textops import (
        _source_overlap_oracle,
        source_overlap_matrix,
    )

    got = _got(source_overlap_matrix(spark, SF))
    want = _duck(SF, _source_overlap_oracle())
    assert got == want and len(got) > 0
    for sa, sb, n, j in got:
        assert sa < sb and n >= 1 and 0 < j <= 1.0

    # planted: srcA = {a b c, b c d} (docs overlap internally),
    # srcB = {a b c} only, srcC disjoint from both.
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["a b c d", "a b c", "p q r s"],
            "lang": ["en"] * 3,
            "source": ["srcA", "srcB", "srcC"],
            "n_chars": [0] * 3,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = _got(source_overlap_matrix(spark, str(tmp_path)))
    assert got == _duck(str(tmp_path), _source_overlap_oracle())
    # only the A-B pair survives (C shares nothing -> no row)
    assert got == [("srcA", "srcB", 1, 0.5)]  # |A|=2,|B|=1,shared=1

    # >64 sources exercises the collect_set fallback (the bitmask
    # fast path only holds to 64 one-hot bits in a long): 70 sources,
    # each sharing its one trigram with source "hub" only.
    n_src = 70
    rows = [("hub", i, "t%d u%d v%d" % (i, i, i)) for i in range(n_src)]
    rows += [("s%02d" % i, 1000 + i, "t%d u%d v%d" % (i, i, i)) for i in range(n_src)]
    pd.DataFrame(
        {
            "doc_id": [r[1] for r in rows],
            "text": [r[2] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[0] for r in rows],
            "n_chars": [0] * len(rows),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = _got(source_overlap_matrix(spark, str(tmp_path)))
    assert got == _duck(str(tmp_path), _source_overlap_oracle())
    # every spoke pair shares exactly its own trigram with hub;
    # spoke-spoke pairs share nothing
    assert len(got) == n_src
    assert all(sa == "hub" and n == 1 for sa, _sb, n, _j in got)
    assert got[0][3] == 1.0 / 70.0  # |hub|=70, |spoke|=1, shared=1


def test_stratified_sample_matches_duckdb_and_planted(spark, tmp_path):
    """Largest-remainder quotas are exact and the sample is exactly K
    docs picked in md5 order."""
    from finance_pipeline_spark.operators.textops import (
        _STRAT_TOTAL,
        _stratified_sample_oracle,
        stratified_sample,
        text_stratified_sample,
    )

    got = _got(text_stratified_sample(spark, SF))
    want = _duck(SF, _stratified_sample_oracle())
    assert got == want
    assert len(got) == _STRAT_TOTAL  # exact total, no rounding drift
    for _s, _l, alloc, _id, rk in got:
        assert 1 <= rk <= alloc

    # planted largest-remainder: counts 5/3/2 of K=7 over N=10 ->
    # quotas 3.5/2.1/1.4, floors 3/2/1 (sum 6), the one leftover goes
    # to the largest remainder .5 -> stratum a gets 4.
    rows = (
        [("a", i) for i in range(5)]
        + [("b", 10 + i) for i in range(3)]
        + [("c", 20 + i) for i in range(2)]
    )
    pd.DataFrame(
        {
            "doc_id": [i for _, i in rows],
            "text": ["w"] * 10,
            "lang": ["en"] * 10,
            "source": [s for s, _ in rows],
            "n_chars": [0] * 10,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    from finance_pipeline_spark.registry import load

    got = _got(stratified_sample(load(spark, str(tmp_path), "documents"), k=7))
    assert got == _duck(str(tmp_path), _stratified_sample_oracle(k=7))
    per = {}
    for s, _l, alloc, _id, _rk in got:
        per[s] = alloc
    assert per == {"a": 4, "b": 2, "c": 1} and len(got) == 7


def test_stratified_sample_k_exceeds_stratum(spark, tmp_path):
    """When K approaches N the per-stratum cap keeps alloc <= n."""
    from finance_pipeline_spark.operators.textops import (
        _stratified_sample_oracle,
        stratified_sample,
    )
    from finance_pipeline_spark.registry import load

    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["w"] * 4,
            "lang": ["en"] * 4,
            "source": ["a", "a", "a", "b"],
            "n_chars": [0] * 4,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = _got(stratified_sample(load(spark, str(tmp_path), "documents"), k=4))
    assert got == _duck(str(tmp_path), _stratified_sample_oracle(k=4))
    assert len(got) == 4  # every doc sampled, no stratum over-drawn


def test_eval_contamination_matches_duckdb_and_planted(spark, tmp_path):
    """Max train-cosine per eval vector with min-id tie-break, planted
    exact-duplicate caught at cosine 1.0."""
    from finance_pipeline_spark.operators.similarity import (
        _eval_contamination_oracle,
        ann_eval_contamination,
    )

    got = _got(ann_eval_contamination(spark, SF))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM '{SF}/embeddings.parquet'"
    )
    want = sorted(
        map(tuple, con.execute(_eval_contamination_oracle()).fetchall())
    )
    assert got == want and len(got) > 0
    for _v, split, mc, _nn in got:
        assert split in ("val", "test") and -1.0 <= mc <= 1.0

    # planted: find ids landing in each split bucket, plant an exact
    # duplicate pair across the split and an orthogonal eval vector.
    import hashlib

    def pm(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 1000

    train_id = next(i for i in range(1, 500) if pm(i) < 980)
    dup_eval = next(i for i in range(1, 500) if pm(i) >= 980)
    far_eval = next(
        i for i in range(dup_eval + 1, 2000) if pm(i) >= 980
    )
    pd.DataFrame(
        {
            "vec_id": [train_id, dup_eval, far_eval],
            "embedding": [[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]],
            "label": [0, 0, 1],
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))
    got = {r[0]: r for r in _got(ann_eval_contamination(spark, str(tmp_path)))}
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{tmp_path}/embeddings.parquet'"
    )
    want = {
        r[0]: tuple(r)
        for r in con.execute(_eval_contamination_oracle()).fetchall()
    }
    assert got == want
    assert got[dup_eval][2:] == (1.0, train_id)  # duplicate caught
    assert got[far_eval][2] == 0.0  # orthogonal -> zero cosine


@pytest.mark.parametrize(
    "name",
    [
        "text_ngram_novelty",
        "source_overlap_matrix",
        "text_stratified_sample",
        "ann_eval_contamination",
        "emb_label_centroid_cosine",
    ],
)
def test_staged_ops_registered_in_r15(name):
    """The explicit r15 act happened: these registered from the staged
    gate with first driver evidence in the r15 window (each was
    dual-scale oracle-proven pre-flip). Window membership is
    round-specific — the r16 rotation moved them past the fold — so
    the pin is the ROTATION_LOG record, not the current window."""
    from finance_pipeline_spark import registry

    registry.load_all()
    spec = registry.QUERIES[name]
    assert spec.oracle is not None
    assert name in registry.ROTATION_LOG["r15"]["in"]


def test_label_centroid_cosine_matches_duckdb_and_planted(spark, tmp_path):
    """Exact order-free centroids (round-9 decimal lift) and 4-dp
    pairwise cosine; zero-norm centroids excluded on both sides."""
    from finance_pipeline_spark.operators.similarity import (
        _label_centroid_oracle,
        emb_label_centroid_cosine,
    )

    def compare(sf_dir):
        got = sorted(
            tuple(r) for r in emb_label_centroid_cosine(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{sf_dir}/embeddings.parquet'"
        )
        want = sorted(
            map(tuple, con.execute(_label_centroid_oracle()).fetchall())
        )
        assert got == want
        return got

    got = compare(SF)
    assert len(got) == 45  # C(10,2) label pairs, none zero-norm
    for a, b, c in got:
        assert a < b and -1.0 <= c <= 1.0

    # planted: label 0 centroid (.5,.5); label 1 centroid (1,0);
    # label 2 is the zero vector -> zero-norm centroid, excluded.
    pd.DataFrame(
        {
            "vec_id": [1, 2, 3, 4],
            "embedding": [[1.0, 0.0], [0.0, 1.0], [2.0, 0.0], [0.0, 0.0]],
            "label": [0, 0, 1, 2],
        }
    ).to_parquet(str(tmp_path / "embeddings.parquet"))
    got = compare(str(tmp_path))
    assert got == [(0, 1, 0.7071)]  # cos((.5,.5),(1,0)) = 1/sqrt(2)


# --- hypothesis property sweeps -------------------------------------------
# These drive the DUCKDB oracles against independent Python brute-force
# implementations over randomized corpora. Spark <-> oracle parity is
# pinned by the tests above, so oracle <-> brute-force transitively pins
# the Spark operators without paying a Spark job per example.


def test_stratified_allocation_matches_naive_hamilton_hypothesis():
    """Largest-remainder quotas and the md5 pick order, vs a from-
    scratch Python Hamilton allocator (dict loop, not SQL windows):
    same floors, same +1 recipients in (remainder desc, stratum key)
    order, same capped totals, and the sampled ids are exactly each
    stratum's first alloc docs by md5 hex."""
    import hashlib

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.textops import (
        _stratified_sample_oracle,
    )

    @settings(max_examples=25, deadline=None)
    @given(
        counts=st.lists(st.integers(1, 9), min_size=1, max_size=6),
        k=st.integers(1, 40),
    )
    def check(counts, k):
        strata = [(f"s{i}", "en" if i % 2 else "de") for i in range(len(counts))]
        rows, did = [], 0
        for (src, lang), n in zip(strata, counts):
            for _ in range(n):
                rows.append((did, src, lang))
                did += 1
        df = pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": ["w"] * len(rows),
                "lang": [r[2] for r in rows],
                "source": [r[1] for r in rows],
                "n_chars": [0] * len(rows),
            }
        )
        con = duckdb.connect()
        con.register("documents", df)
        got = sorted(
            map(tuple, con.execute(_stratified_sample_oracle(k=k)).fetchall())
        )

        # independent Hamilton: floors, then +1 by (rem desc, key)
        total = sum(counts)
        base = {s: (k * n) // total for s, n in zip(strata, counts)}
        rem = {s: (k * n) % total for s, n in zip(strata, counts)}
        leftover = k - sum(base.values())
        order = sorted(strata, key=lambda s: (-rem[s], s[0], s[1]))
        alloc = dict(base)
        for s in order[:leftover]:
            alloc[s] += 1
        alloc = {
            s: min(a, n) for (s, a), n in zip(alloc.items(), counts)
        }
        want = []
        for (src, lang), n in zip(strata, counts):
            ids = [r[0] for r in rows if (r[1], r[2]) == (src, lang)]
            ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            for rk, i in enumerate(ids[: alloc[(src, lang)]], start=1):
                want.append((src, lang, alloc[(src, lang)], i, rk))
        assert got == sorted(want)
        if k <= total:
            assert sum(alloc.values()) == k  # no rounding drift

    check()


def test_novelty_and_overlap_match_bruteforce_hypothesis():
    """Trigram novelty counts and the source-overlap matrix vs plain
    Python set arithmetic over randomized word-soup corpora (short and
    empty docs included)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.textops import (
        _ngram_novelty_oracle,
        _source_overlap_oracle,
    )

    word = st.sampled_from(["a", "b", "c", "d", "e"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=25, deadline=None)
    @given(texts=st.lists(doc, min_size=1, max_size=8),
           srcs=st.lists(st.sampled_from(["x", "y", "z"]), min_size=8,
                         max_size=8))
    def check(texts, srcs):
        df = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": ["en"] * len(texts),
                "source": srcs[: len(texts)],
                "n_chars": [0] * len(texts),
            }
        )
        con = duckdb.connect()
        con.register("documents", df)

        def grams(t):
            toks = t.strip().lower().split(" ")
            return {
                " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
            } if len(toks) >= 3 else set()

        gs = [grams(t) for t in texts]
        # novelty: per doc, grams present in any OTHER doc
        want_nov = []
        for i, g in enumerate(gs):
            others = set().union(*(gs[:i] + gs[i + 1 :])) if len(gs) > 1 else set()
            shared = len(g & others)
            want_nov.append(
                (i, len(g), shared,
                 shared / len(g) if g else None)
            )
        got_nov = sorted(
            map(tuple, con.execute(_ngram_novelty_oracle()).fetchall())
        )
        assert got_nov == sorted(want_nov)

        # overlap matrix: per source, union of its docs' grams
        per_src: dict = {}
        for g, s in zip(gs, srcs):
            per_src.setdefault(s, set()).update(g)
        want_ov = []
        ss = sorted(per_src)
        for i, a in enumerate(ss):
            for b in ss[i + 1 :]:
                inter = len(per_src[a] & per_src[b])
                if inter:
                    uni = len(per_src[a] | per_src[b])
                    want_ov.append((a, b, inter, inter / uni))
        got_ov = sorted(
            map(tuple, con.execute(_source_overlap_oracle()).fetchall())
        )
        assert got_ov == sorted(want_ov)

    check()


def test_source_dedup_scopes_matches_duckdb_and_planted(spark, tmp_path):
    """Connected components over the shared-digest source graph:
    transitive chains merge (A-B and B-C share docs -> one scope even
    though A and C share nothing), disjoint sources scope to
    themselves."""
    from finance_pipeline_spark.operators.dedup import (
        _source_scopes_oracle,
        source_dedup_scopes,
    )

    got = _got(source_dedup_scopes(spark, SF))
    want = _duck(SF, _source_scopes_oracle())
    assert got == want and len(got) == 20
    for s, sc in got:
        assert sc <= s  # scope is the lexicographic min member

    # planted: docs "p" in A+B, "q" in B+C (chain), D disjoint,
    # E+F share "r" (second component)
    rows = [
        (1, "p", "A"), (2, "p", "B"), (3, "q", "B"), (4, "q", "C"),
        (5, "z", "D"), (6, "r", "E"), (7, "r", "F"),
    ]
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [0] * len(rows),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = dict(_got(source_dedup_scopes(spark, str(tmp_path))))
    assert got == dict(_duck(str(tmp_path), _source_scopes_oracle()))
    assert got == {
        "A": "A", "B": "A", "C": "A",  # transitive chain
        "D": "D",                      # singleton
        "E": "E", "F": "E",            # second component
    }
