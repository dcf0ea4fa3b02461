"""Planted-data tests for the scrub/repetition/quantization operators:
the driver corpus contains no PII and little repetition, so detection
behavior is proven here on synthetic documents."""

from __future__ import annotations

import numpy as np

from tests.conftest import write_documents, write_embeddings

from finance_pipeline_spark.operators.textops import (
    text_pii_scrub,
    text_repetition_stats,
)
from finance_pipeline_spark.operators.similarity import emb_quantize_int8


def test_pii_scrub_detects_and_redacts(spark, tmp_path):
    docs = [
        (1, "contact me at alice.smith+work@example-mail.co for details"),
        (2, "server at 192.168.1.250 answered then 10.0.0.7 timed out"),
        (3, "call 555-867-5309 or 555.123.4567 tomorrow"),
        (4, "nothing sensitive here just words and 42 numbers"),
        (5, "mixed: bob@x.io from 8.8.8.8 phone 123-456-7890"),
    ]
    sf = write_documents(tmp_path, docs)
    out = {r.doc_id: r for r in text_pii_scrub(spark, sf).collect()}

    assert (out[1].n_email, out[1].n_ipv4, out[1].n_phone) == (1, 0, 0)
    assert "<EMAIL>" in out[1].text_clean and "alice" not in out[1].text_clean
    assert out[2].n_ipv4 == 2 and out[2].text_clean.count("<IP>") == 2
    assert out[3].n_phone == 2 and "<PHONE>" in out[3].text_clean
    assert (out[4].n_email, out[4].n_ipv4, out[4].n_phone) == (0, 0, 0)
    assert out[4].text_clean == docs[3][1]  # untouched
    assert (out[5].n_email, out[5].n_ipv4, out[5].n_phone) == (1, 1, 1)


def test_repetition_stats_flags_loops(spark, tmp_path):
    looped = " ".join(["buy now"] * 30)  # 60 tokens, one bigram dominates
    clean = " ".join(f"w{i}" for i in range(60))  # all tokens distinct
    short = "only three tokens"
    sf = write_documents(tmp_path, [(1, looped), (2, clean), (3, short)])
    out = {r.doc_id: r for r in text_repetition_stats(spark, sf).collect()}

    assert out[1].n_tokens == 60
    # "now buy" appears 29 times, "buy now" 30 → top covers 60/60 tokens
    assert out[1].top_bigram_frac == 1.0
    assert out[1].dup_fivegram_frac > 0.9
    assert out[2].top_bigram_frac < 0.05
    assert out[2].dup_fivegram_frac == 0.0
    assert out[3].n_tokens == 3
    assert out[3].dup_fivegram_frac == 0.0  # < 5 tokens → defined as 0


def test_quantize_int8_roundtrip_error_bounded(spark, tmp_path):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(20, 16)).astype(np.float32)
    mat[5] = 0.0  # zero vector: scale 0, all q = 0, no div-by-zero
    sf = write_embeddings(tmp_path, list(range(20)), mat)
    rows = emb_quantize_int8(spark, sf).collect()
    assert len(rows) == 20 * 16

    by_vec: dict[int, list] = {}
    for r in rows:
        by_vec.setdefault(r.vec_id, []).append(r)
    for vid, elems in by_vec.items():
        elems.sort(key=lambda r: r.pos)
        orig = mat[vid].astype(np.float64)
        q = np.array([r.q for r in elems])
        scale = elems[0].scale
        assert int(np.abs(q).max()) <= 127
        if vid == 5:
            assert scale == 0.0 and not q.any()
            continue
        # dequantization error is bounded by half a quantization step
        assert np.abs(q * scale - orig).max() <= scale / 2 + 1e-12
        # the largest-magnitude element maps to ±127 exactly
        assert int(np.abs(q[np.argmax(np.abs(orig))])) == 127


def test_mixture_sample_epoch_semantics(spark):
    """Full epochs always present; fractional epoch hash-gated; row
    multiplicity equals the configured per-source rate in expectation."""
    from finance_pipeline_spark.operators.textops import text_mixture_sample

    out = text_mixture_sample(spark, "/root/testdata/sf0.001").collect()
    by_doc: dict[int, list] = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert by_doc
    for doc, rows in by_doc.items():
        rate = rows[0].rate_permille
        full = rate // 1000
        epochs = sorted(r.epoch for r in rows)
        # full epochs 0..full-1 are all present, exactly once
        assert epochs[: full] == list(range(full))
        # at most one fractional epoch beyond that
        assert len(epochs) in (full, full + 1)
        if len(epochs) == full + 1:
            assert epochs[-1] == full
    # deterministic: a second run yields the identical multiset
    again = text_mixture_sample(spark, "/root/testdata/sf0.001").collect()
    key = lambda r: (r.doc_id, r.epoch)  # noqa: E731
    assert sorted(map(key, out)) == sorted(map(key, again))


def test_chunk_overlap_covers_every_token(spark):
    """Chunking invariants on real testdata: chunks tile each doc with
    the configured stride, consecutive chunks share exactly the
    overlap, every token appears in some chunk, and a short doc yields
    one chunk."""
    from finance_pipeline_spark import registry
    from finance_pipeline_spark.operators import textops as T

    sf = "/root/testdata/sf0.001"
    rows = registry.QUERIES["text_chunk_overlap"].fn(spark, sf).collect()
    docs = {
        r.doc_id: r.text.split(" ")
        for r in registry.load(spark, sf, "documents").collect()
    }
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for doc_id, chunks in by_doc.items():
        toks = docs[doc_id]
        chunks.sort(key=lambda r: r.chunk_idx)
        assert [c.chunk_idx for c in chunks] == list(range(len(chunks)))
        # stride / coverage / reconstruction
        joined = []
        for c in chunks:
            ctoks = c.chunk_text.split(" ")
            assert len(ctoks) == c.n_tokens <= T._CHUNK_TOKENS
            assert c.start_tok == c.chunk_idx * T._CHUNK_STRIDE + 1
            assert ctoks == toks[c.start_tok - 1 : c.start_tok - 1 + c.n_tokens]
            joined.extend(ctoks if c.chunk_idx == 0 else ctoks[T._CHUNK_OVERLAP:])
        # dropping each chunk's overlap region reconstructs the doc
        # exactly — interior overlaps are consistent, nothing missing
        assert joined == toks
        # all tokens covered: last chunk reaches the end
        last = chunks[-1]
        assert last.start_tok - 1 + last.n_tokens == len(toks)
        if len(toks) <= T._CHUNK_TOKENS:
            assert len(chunks) == 1


def test_dup_spans_and_scrub_on_planted_boilerplate(spark, tmp_path):
    """Two docs share a 25-token boilerplate run embedded at different
    offsets; the span report must locate it in both docs and the scrub
    must excise exactly those tokens, leaving the unique remainder."""
    from tests.conftest import write_documents

    from finance_pipeline_spark.operators import textops as T
    from finance_pipeline_spark import registry

    boiler = [f"b{i}" for i in range(25)]
    a_head = [f"a{i}" for i in range(10)]
    a_tail = [f"at{i}" for i in range(8)]
    b_head = [f"c{i}" for i in range(5)]
    doc_a = " ".join(a_head + boiler + a_tail)
    doc_b = " ".join(b_head + boiler)
    doc_c = " ".join(f"z{i}" for i in range(30))  # no duplication
    sf = write_documents(tmp_path, [(1, doc_a), (2, doc_b), (3, doc_c)])

    spans = {
        r.doc_id: (r.span_start, r.span_end)
        for r in registry.QUERIES["text_dup_spans"].fn(spark, sf).collect()
    }
    # doc 1: boiler occupies tokens 11..35; every 20-window fully inside
    # it starts at 11..16, so the reported span is [11, 35]
    assert spans[1] == (11, 35)
    # doc 2: boiler at 6..30 -> span [6, 30]
    assert spans[2] == (6, 30)
    assert 3 not in spans

    scrub = {
        r.doc_id: r for r in registry.QUERIES["text_dup_scrub"].fn(spark, sf).collect()
    }
    assert set(scrub) == {1, 2}
    assert scrub[1].n_removed == 25
    assert scrub[1].text_clean == " ".join(a_head + a_tail)
    assert scrub[2].n_removed == 25
    assert scrub[2].text_clean == " ".join(b_head)


def test_lm_familiarity_flags_gibberish(spark, tmp_path):
    """A corpus of docs sharing common phrasing + one gibberish doc of
    never-repeated token transitions: the gibberish doc (and only it)
    is flagged unfamiliar."""
    from finance_pipeline_spark.operators.textops import text_lm_familiarity

    common = "the quick brown fox jumps over the lazy dog again and again"
    docs = [(i, common) for i in range(1, 21)]
    # gibberish: 12 unique tokens, each bigram occurs exactly once
    docs.append((99, " ".join(f"zq{i}x" for i in range(12))))
    sf = write_documents(tmp_path, docs)
    out = {r.doc_id: r for r in text_lm_familiarity(spark, sf).collect()}

    assert out[99].unfamiliar, "gibberish doc not flagged"
    assert not any(out[i].unfamiliar for i in range(1, 21))
    # the common docs all share identical bigrams -> identical scores
    assert len({out[i].familiarity for i in range(1, 21)}) == 1
    assert out[99].familiarity < out[1].familiarity
    # n_bigrams = len(tokens)-1 for the whitespace tokenization
    assert out[99].n_bigrams == 11
    assert out[1].n_bigrams == len(common.split()) - 1


def test_lm_familiarity_unk_mapping_caps_vocab(spark, tmp_path):
    """Once the vocab cap bites, pure-OOV docs collapse to the
    '<unk> <unk>' bigram — typically the CORPUS'S most frequent type.
    The advisor-flagged inversion: scoring those pairs would rank
    gibberish maximally familiar. They are excluded instead: pure-OOV
    docs have zero scored pairs, null familiarity, and the unfamiliar
    flag; mixed pairs (vocab token next to an OOV token) still score."""
    from finance_pipeline_spark.operators import textops

    # force a tiny vocab so the cap is exercised at test scale
    old = textops._LM_VOCAB
    textops._LM_VOCAB = 2
    try:
        docs = [
            (1, "a b a b a b"),  # 'a' and 'b' fill the whole vocab
            (2, "rare1 rare2 rare1 rare2"),  # all <unk> after mapping
            (3, "rare3 rare4 rare3 rare4"),  # different tokens, same <unk>
            (4, "a rare5 a rare6 a rare7"),  # mixed: a-<unk>/<unk>-a pairs
        ]
        sf = write_documents(tmp_path, docs)
        out = {
            r.doc_id: r
            for r in textops.text_lm_familiarity(spark, sf).collect()
        }
        # pure-OOV docs: every pair is <unk>-<unk> -> nothing scored,
        # flagged outright (NOT scored as the corpus's top bigram)
        for i in (2, 3):
            assert out[i].n_scored == 0 and out[i].sum_freq == 0
            assert out[i].familiarity is None
            assert out[i].unfamiliar
        # mixed pairs still score: doc 4's a-<unk>/<unk>-a transitions
        # carry real frequency mass
        assert out[4].n_scored == out[4].n_bigrams == 5
        assert out[4].sum_freq > 0
        # in-vocab doc unaffected by the exclusion
        assert out[1].n_scored == out[1].n_bigrams == 5
        assert not out[1].unfamiliar
    finally:
        textops._LM_VOCAB = old


def test_lm_familiarity_vocab_overflow_flags_gibberish(spark, tmp_path):
    """The advisor's required regression: a corpus whose TRUE
    vocabulary exceeds _LM_VOCAB (so '<unk>' genuinely dominates) must
    still flag planted pure-OOV gibberish — under the old semantics the
    '<unk> <unk>' frequency made gibberish the most FAMILIAR doc."""
    import random

    from finance_pipeline_spark.operators import textops

    rng = random.Random(41)
    # 40 docs over a 600-word vocabulary: far past _LM_VOCAB=256, so a
    # large OOV tail maps to <unk> even for legitimate docs
    vocab = [f"w{i}" for i in range(600)]
    docs = [
        (i, " ".join(rng.choice(vocab) for _ in range(60)))
        for i in range(1, 41)
    ]
    # planted gibberish: tokens no other doc uses — all OOV
    docs.append((99, " ".join(f"zzqx{i}v" for i in range(30))))
    sf = write_documents(tmp_path, docs)
    out = {
        r.doc_id: r for r in textops.text_lm_familiarity(spark, sf).collect()
    }
    assert out[99].unfamiliar, "pure-OOV gibberish must be flagged"
    assert out[99].n_scored == 0 and out[99].familiarity is None
    # the legitimate docs must NOT be wholesale-flagged just because
    # the vocab overflowed (they share the corpus's real transitions)
    n_flagged = sum(1 for i in range(1, 41) if out[i].unfamiliar)
    assert n_flagged <= 8, f"vocab overflow flagged {n_flagged}/40 real docs"


def test_emb_outlier_prune_flags_planted_far_vector(spark, tmp_path):
    """A tight cluster per label + one vector far from its label's
    centroid: only the far vector is flagged."""
    from finance_pipeline_spark.operators.similarity import emb_outlier_prune

    rng = np.random.default_rng(7)
    dim = 8
    base0 = rng.standard_normal(dim)
    base1 = rng.standard_normal(dim)
    rows, labels = [], []
    for i in range(30):
        rows.append(base0 + 0.01 * rng.standard_normal(dim))
        labels.append(0)
    for i in range(30):
        rows.append(base1 + 0.01 * rng.standard_normal(dim))
        labels.append(1)
    # one far vector PER label: each label's mean distance is then
    # dominated by its own outlier, so the 2x-mean threshold sits far
    # above the inlier noise floor (without a planted outlier, a tight
    # cluster's mean is so small that chi-square noise alone can cross
    # 2x — the flag is relative, not absolute, by design)
    rows.append(base0 + 5.0)
    labels.append(0)
    rows.append(base1 - 5.0)
    labels.append(1)
    ids = list(range(1, len(rows) + 1))
    sf = write_embeddings(tmp_path, ids, np.vstack(rows), labels=labels)
    out = {r.vec_id: r for r in emb_outlier_prune(spark, sf).collect()}

    flagged = {v for v, r in out.items() if r.outlier}
    planted = {len(rows) - 1, len(rows)}
    assert flagged == planted, f"expected only the planted vectors: {flagged}"
    for v in planted:
        assert out[v].dist > 2 * out[v].label_mean_dist
    assert all(r.label_mean_dist > 0 for r in out.values())


def test_lm_familiarity_minority_language_not_wholesale_flagged(
    spark, tmp_path
):
    """Per-language corpus means (advisor finding): under a single
    global mean, every doc of a minority language has globally-rare
    bigrams and gets flagged wholesale. With per-lang means, a
    minority language whose docs share ITS OWN phrasing is unflagged."""
    import pandas as pd

    from finance_pipeline_spark.operators import textops

    en = "the quick brown fox jumps over the lazy dog again and again"
    fr = "le renard brun rapide saute par dessus le chien paresseux aussi"
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, 41)) + [101, 102, 103, 104],
            "text": [en] * 40 + [fr] * 4,
            "lang": ["en"] * 40 + ["fr"] * 4,
            "source": ["test"] * 44,
            "n_chars": [len(en)] * 40 + [len(fr)] * 4,
        }
    )
    pdf.to_parquet(str(tmp_path / "documents.parquet"))
    out = {
        r.doc_id: r
        for r in textops.text_lm_familiarity(spark, str(tmp_path)).collect()
    }
    # the fr docs' bigram frequency (4) is far under the en mass (40);
    # a global mean would flag all four — per-lang must flag none
    assert not any(out[i].unfamiliar for i in (101, 102, 103, 104))
    assert not any(out[i].unfamiliar for i in range(1, 41))


def test_lm_buckets_tercile_split_and_null_tail(spark, tmp_path):
    """CCNet head/middle/tail: per-lang terciles by familiarity with
    deterministic tie-break; pure-OOV docs (null familiarity) land in
    'tail' unconditionally."""
    from finance_pipeline_spark.operators import textops

    old = textops._LM_VOCAB
    textops._LM_VOCAB = 4
    try:
        docs = [
            # vocab fillers: 'a b' dominates
            (1, "a b a b a b"),
            (2, "a b a b c d"),
            (3, "c d c d a b"),
            (4, "c d c d c d"),
            (5, "a b c d a b"),
            (6, "b a d c b a"),
            # pure-OOV doc: every bigram is <unk> <unk>
            (99, "q1z q2z q1z q2z"),
        ]
        sf = write_documents(tmp_path, docs)
        from finance_pipeline_spark import registry

        out = {
            r.doc_id: r
            for r in registry.QUERIES["text_lm_buckets"].fn(spark, sf).collect()
        }
        assert out[99].bucket == "tail" and out[99].familiarity is None
        scored = [r for i, r in out.items() if i != 99]
        buckets = [r.bucket for r in scored]
        assert buckets.count("head") == 2
        assert buckets.count("middle") == 2
        assert buckets.count("tail") == 2
        # ordering: every head doc is at least as familiar as every
        # middle doc, and middle >= tail
        fam = {b: [r.familiarity for r in scored if r.bucket == b] for b in
               ("head", "middle", "tail")}
        assert min(fam["head"]) >= max(fam["middle"])
        assert min(fam["middle"]) >= max(fam["tail"])
    finally:
        textops._LM_VOCAB = old


def test_kn_perplexity_matches_hand_computation(spark, tmp_path):
    """Interpolated KN on a 3-doc corpus, checked against values
    computed by hand from the definition (D=0.75): P(w2|w1) =
    (c(w1,w2)-D)/c(w1) + D*N1+(w1,.)/c(w1) * N1+(.,w2)/T."""
    import math

    from tests.conftest import write_documents

    from finance_pipeline_spark import registry

    rows = [(1, "a b a b"), (2, "a b c"), (3, "x")]  # doc 3 drops (<2 toks)
    sf = write_documents(tmp_path, rows)
    got = {
        r.doc_id: r
        for r in registry.QUERIES["text_kn_perplexity"].fn(spark, sf).collect()
    }
    assert set(got) == {1, 2}
    # corpus pairs: d1: (a,b)x2, (b,a); d2: (a,b), (b,c)
    # c2: (a,b)=3, (b,a)=1, (b,c)=1 ; c1: a: ctx=3 kf=1 ; b: ctx=2 kf=2
    # n1p: b<-{a}:1, a<-{b}:1, c<-{b}:1 ; T=3
    D = 0.75
    p_ab = (3 - D) / 3 + (D * 1 / 3) * (1 / 3)
    p_ba = (1 - D) / 2 + (D * 2 / 2) * (1 / 3)
    p_bc = (1 - D) / 2 + (D * 2 / 2) * (1 / 3)
    lp = lambda p: round(math.log(p), 6)  # noqa: E731
    s1 = lp(p_ab) * 2 + lp(p_ba)
    s2 = lp(p_ab) + lp(p_bc)
    assert got[1].n_bigrams == 3 and got[2].n_bigrams == 2
    assert abs(got[1].sum_logp - s1) < 1e-9
    assert abs(got[2].sum_logp - s2) < 1e-9
    assert abs(got[1].ppl - round(math.exp(-s1 / 3), 3)) < 1e-9
    assert abs(got[2].ppl - round(math.exp(-s2 / 2), 3)) < 1e-9


def test_kn_perplexity_flags_gibberish_higher(spark, tmp_path):
    """The quality-signal property: rare-transition docs score higher
    perplexity than docs made of the corpus's common transitions."""
    import random

    from tests.conftest import write_documents

    from finance_pipeline_spark import registry

    rng = random.Random(31)
    common = [(i, "the quick brown fox jumps over the lazy dog " * 3) for i in range(20)]
    gibber = [(100, " ".join(rng.choice("qzxjvkw") * 3 for _ in range(12)))]
    sf = write_documents(tmp_path, common + gibber)
    got = {
        r.doc_id: r.ppl
        for r in registry.QUERIES["text_kn_perplexity"].fn(spark, sf).collect()
    }
    assert got[100] > 2 * got[0], got


def test_token_budget_mix_matches_naive_running_sum(spark, tmp_path):
    """The histogram-cut form (bounded-size window + boundary-bucket
    sliver) must reproduce the NAIVE per-source running-sum semantics
    exactly: taken ⇔ tokens strictly ahead in (quality DESC, doc_id)
    order < budget. Random corpus with quality ties (shared texts) so
    boundary buckets hold several docs, swept over budgets including
    1, mid, exact-total, and over-total."""
    import random

    import pandas as pd
    import pytest

    from finance_pipeline_spark.operators.textops import token_budget_mix

    rng = random.Random(77)
    words = ["alpha", "beta", "gamma", "delta", "eps"]
    rows = []
    did = 0
    for src in ("s0", "s1", "s2"):
        for _ in range(rng.randint(5, 14)):
            # duplicate texts on purpose: identical quality → shared
            # boundary buckets exercising the within-bucket window
            n = rng.choice([1, 2, 3, 3, 5, 5, 8])
            text = " ".join(rng.choice(words) for _ in range(n))
            for _ in range(rng.randint(1, 2)):
                rows.append((did, text, src))
                did += 1
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": [r[2] for r in rows],
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    docs = spark.read.parquet(str(tmp_path / "documents.parquet"))

    total = sum(len(r[1].split()) for r in rows)
    for budget in (1, 5, 17, 40, total, total + 100):
        got = token_budget_mix(docs, budget=budget).toPandas()
        assert len(got) == len(rows)
        # naive reference over the operator's own per-doc columns
        ref = got.sort_values(["source", "quality", "doc_id"],
                              ascending=[True, False, True]).copy()
        ref["cum_before"] = (
            ref.groupby("source")["n_tokens"].cumsum() - ref["n_tokens"]
        )
        want = dict(
            zip(ref["doc_id"], (ref["cum_before"] < budget).tolist())
        )
        have = dict(zip(got["doc_id"], got["taken"].tolist()))
        assert have == want, (budget, {
            d: (have[d], want[d]) for d in have if have[d] != want[d]
        })

    # budget must bite: at budget 17 some taken, some not, per source
    got = token_budget_mix(docs, budget=17).toPandas()
    by_src = got.groupby("source")["taken"]
    assert (by_src.sum() > 0).all() and (by_src.sum() < by_src.count()).all()

    with pytest.raises(ValueError, match="budget"):
        token_budget_mix(docs, budget=0)


def test_token_budget_oracle_sql_matches_spark(spark, tmp_path):
    """The staged r14 oracle (_token_budget_oracle) run on DuckDB must
    equal token_budget_mix row-for-row on the driver corpus shape —
    so r14 registration is a one-line @query with the parity already
    pinned."""
    import duckdb

    from finance_pipeline_spark.operators.textops import (
        _token_budget_oracle,
        token_budget_mix,
    )

    sf = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    got = sorted(
        (r.source, r.doc_id, r.n_tokens, round(r.quality, 4), r.taken)
        for r in token_budget_mix(docs, budget=200).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'"
    )
    want = sorted(
        (s, d, n, round(q, 4), t)
        for s, d, n, q, t in con.execute(
            _token_budget_oracle(budget=200)
        ).fetchall()
    )
    assert got == want and len(got) > 0


def test_unimax_alloc_matches_naive_water_filling(spark, tmp_path):
    """The closed-form water-filling (sorted-caps threshold condition)
    must reproduce the NAIVE iterative UniMax loop — repeatedly give
    every uncapped language an equal share, saturate any language
    whose cap is hit, redistribute the surplus — across budget regimes
    (nothing capped / mixed / everything capped / budget over total
    caps) and adversarial token distributions (ties, one dominant
    language, single language)."""
    import math

    import pandas as pd

    from finance_pipeline_spark.operators.textops import unimax_alloc

    def naive_unimax(n_by_lang: dict, epoch_cap: int, budget: int):
        caps = {l: epoch_cap * n for l, n in n_by_lang.items()}
        alloc = {}
        remaining = float(budget)
        live = sorted(caps)
        while live:
            share = remaining / len(live)
            hit = [l for l in live if caps[l] <= share]
            if not hit:
                for l in live:
                    alloc[l] = share
                return alloc
            for l in hit:
                alloc[l] = float(caps[l])
                remaining -= caps[l]
                live.remove(l)
        return alloc  # budget exceeds total caps: all saturated

    cases = [
        {"en": 100, "de": 30, "fr": 31, "zh": 30},   # ties on caps
        {"en": 1000, "de": 3, "fr": 5, "zh": 8},     # dominant language
        {"en": 7},                                    # single language
        {"a": 10, "b": 20, "c": 30, "d": 40, "e": 50},
    ]
    for n_by_lang in cases:
        rows, did = [], 0
        for lang, n_toks in n_by_lang.items():
            # split the language's tokens across a few docs
            left = n_toks
            while left:
                take = min(left, 7)
                rows.append((did, " ".join(["w"] * take), lang))
                did, left = did + 1, left - take
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": ["s"] * len(rows),
                "n_chars": [len(r[1]) for r in rows],
            }
        ).to_parquet(str(tmp_path / "documents.parquet"))
        docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
        total = sum(n_by_lang.values())
        for epoch_cap, budget_epochs in ((4, 1), (4, 3), (4, 4), (2, 10)):
            got = {
                r.lang: r
                for r in unimax_alloc(
                    docs, epoch_cap=epoch_cap, budget_epochs=budget_epochs
                ).collect()
            }
            want = naive_unimax(n_by_lang, epoch_cap, budget_epochs * total)
            assert set(got) == set(want), (n_by_lang, epoch_cap, budget_epochs)
            for lang, w in want.items():
                g = got[lang]
                assert math.isclose(g.alloc_tokens, w, rel_tol=1e-12), (
                    lang, g.alloc_tokens, w, epoch_cap, budget_epochs,
                )
                if g.capped:
                    assert g.alloc_tokens == float(g.cap_tokens)
                else:
                    assert g.alloc_tokens <= g.cap_tokens * (1 + 1e-12)
                assert g.epochs == g.alloc_tokens / g.n_tokens
            # invariant: total allocation == min(budget, total caps)
            assert math.isclose(
                sum(r.alloc_tokens for r in got.values()),
                min(budget_epochs * total, epoch_cap * total),
                rel_tol=1e-12,
            )


def test_eval_overlap_report_matches_duckdb_and_planted(spark, tmp_path):
    """The staged r15 oracle (_eval_overlap_oracle) must equal
    eval_overlap_report row-for-row on the driver corpus shape AND on
    a synthetic corpus with planted contamination: an eval doc that
    copies a train doc scores overlap 1.0, a disjoint-vocabulary eval
    doc scores 0.0, and a short (<N tokens) eval doc reports 0 grams
    with a NULL fraction."""
    import hashlib

    import duckdb
    import pandas as pd

    from finance_pipeline_spark.operators.textops import (
        _eval_overlap_oracle,
        eval_overlap_report,
    )

    def pm(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:6], 16) % 1000

    def compare(sf_dir):
        got = sorted(
            (r.doc_id, r.split, r.n_grams, r.n_matched,
             None if r.overlap_frac is None else r.overlap_frac)
            for r in eval_overlap_report(
                spark.read.parquet(f"{sf_dir}/documents.parquet")
            ).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = sorted(map(tuple, con.execute(_eval_overlap_oracle()).fetchall()))
        assert got == want
        return got

    # 1) real testdata shape (val/test docs exist at sf0.001: 500 ids)
    rows = compare("/root/testdata/sf0.001")
    assert len(rows) > 0

    # 2) planted: train ids (pm < 980) vs eval ids (pm >= 980)
    train_ids = [i for i in range(4000) if pm(i) < 980][:3]
    eval_ids = [i for i in range(4000) if pm(i) >= 980][:3]
    long_text = " ".join(f"tok{j}" for j in range(30))
    rows_df = pd.DataFrame(
        {
            "doc_id": train_ids + eval_ids,
            "text": [
                long_text,                                  # train original
                "completely different training words " * 6,  # train filler
                "yet another unrelated training doc " * 6,   # train filler
                long_text,                                   # eval: full copy
                "zz qq ww ee rr tt yy uu ii oo pp aa ss dd", # eval: disjoint
                "too short",                                 # eval: <N tokens
            ],
            "lang": ["en"] * 6,
            "source": ["s"] * 6,
            "n_chars": [0] * 6,
        }
    )
    rows_df.to_parquet(str(tmp_path / "documents.parquet"))
    got = {r[0]: r for r in compare(str(tmp_path))}
    assert set(got) == set(eval_ids)
    copy_row = got[eval_ids[0]]
    assert copy_row[2] == 30 - 7 and copy_row[3] == copy_row[2]
    assert copy_row[4] == 1.0
    disjoint_row = got[eval_ids[1]]
    assert disjoint_row[3] == 0 and disjoint_row[4] == 0.0
    short_row = got[eval_ids[2]]
    assert short_row[2] == 0 and short_row[4] is None


def test_unimax_closed_form_matches_naive_hypothesis(spark, tmp_path):
    """Hypothesis sweep of the water-filling threshold against the
    naive iterative loop: random language token counts (ties and
    dominants included), random epoch caps and budgets. The closed
    form's capped set and allocations must match exactly (same
    arithmetic: integer caps, one exact division)."""
    import math

    import pandas as pd
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.textops import unimax_alloc

    def naive(n_by_lang, cap_e, budget):
        caps = {l: cap_e * n for l, n in n_by_lang.items()}
        alloc, remaining, live = {}, float(budget), sorted(caps)
        while live:
            share = remaining / len(live)
            hit = [l for l in live if caps[l] <= share]
            if not hit:
                for l in live:
                    alloc[l] = share
                return alloc
            for l in hit:
                alloc[l] = float(caps[l])
                remaining -= caps[l]
                live.remove(l)
        return alloc

    @settings(max_examples=12, deadline=None)
    @given(
        counts=st.lists(st.integers(1, 40), min_size=1, max_size=6),
        cap_e=st.integers(1, 5),
        budget_e=st.integers(1, 8),
    )
    def check(counts, cap_e, budget_e):
        n_by_lang = {f"l{i}": c * 7 for i, c in enumerate(counts)}
        rows, did = [], 0
        for lang, n in n_by_lang.items():
            left = n
            while left:
                take = min(left, 7)
                rows.append((did, " ".join(["w"] * take), lang))
                did, left = did + 1, left - take
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[1] for r in rows],
                "lang": [r[2] for r in rows],
                "source": ["s"] * len(rows),
                "n_chars": [0] * len(rows),
            }
        ).to_parquet(str(tmp_path / "documents.parquet"))
        docs = spark.read.parquet(str(tmp_path / "documents.parquet"))
        got = {
            r.lang: r.alloc_tokens
            for r in unimax_alloc(
                docs, epoch_cap=cap_e, budget_epochs=budget_e
            ).collect()
        }
        want = naive(n_by_lang, cap_e, budget_e * sum(n_by_lang.values()))
        assert set(got) == set(want)
        for lang in want:
            assert math.isclose(got[lang], want[lang], rel_tol=1e-12), (
                lang, got[lang], want[lang], counts, cap_e, budget_e,
            )

    check()


def test_pack_efficiency_matches_duckdb_and_invariants(spark, tmp_path):
    """The staged r15 packing-efficiency oracle equals
    text_pack_efficiency row-for-row, and the metrics obey the pack
    model: fill ≤ 1, windows cover the stream, boundary count matches
    a Python replay of the concatenated-stream cut."""
    import duckdb
    import pandas as pd

    from finance_pipeline_spark.operators import textops as T

    def compare(sf_dir):
        got = sorted(
            (r.lang, r.shard, r.n_docs, r.total_tokens, r.n_packs,
             r.fill_frac, r.n_boundary_docs)
            for r in T.text_pack_efficiency(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = sorted(
            map(tuple, con.execute(T._pack_efficiency_oracle()).fetchall())
        )
        assert got == want and len(got) > 0
        return got

    rows = compare("/root/testdata/sf0.001")
    for lang, shard, n_docs, total, n_packs, fill, n_cross in rows:
        assert 0 < fill <= 1.0
        assert n_packs * T._PACK_CTX >= total > (n_packs - 1) * T._PACK_CTX
        assert 0 <= n_cross <= n_docs

    # planted single-stream replay: one lang, shard 0 only (doc_ids
    # multiples of _PACK_SHARDS), known lengths against a Python cut
    ctx = T._PACK_CTX
    lens = [ctx - 5, 10, ctx, 3, 2 * ctx + 1]
    ids = [i * T._PACK_SHARDS for i in range(len(lens))]
    pd.DataFrame(
        {
            "doc_id": ids,
            "text": [" ".join(["w"] * n) for n in lens],
            "lang": ["en"] * len(ids),
            "source": ["s"] * len(ids),
            "n_chars": [0] * len(ids),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = compare(str(tmp_path))
    assert len(got) == 1
    lang, shard, n_docs, total, n_packs, fill, n_cross = got[0]
    assert (lang, shard, n_docs, total) == ("en", 0, 5, sum(lens))
    # python replay of the stream cut
    start, crossings = 0, 0
    for n in lens:
        if n > 0 and (start + n - 1) // ctx > start // ctx:
            crossings += 1
        start += n
    assert n_packs == (sum(lens) + ctx - 1) // ctx
    assert n_cross == crossings == 3  # docs 2, 3, 5 straddle a cut (doc5 two)


def test_dataset_card_matches_duckdb_and_planted(spark, tmp_path):
    """The staged r15 datasheet oracle equals text_dataset_card
    row-for-row on the driver corpus shape AND on a planted corpus
    with known composition (exact dup pair, odd/even median, token
    share permille that must sum to ≤1000 with integer floors)."""
    import duckdb
    import pandas as pd

    from finance_pipeline_spark.operators.textops import (
        _dataset_card_oracle,
        text_dataset_card,
    )

    def compare(sf_dir):
        got = sorted(
            tuple(r) for r in text_dataset_card(spark, sf_dir).collect()
        )
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW documents AS SELECT * FROM "
            f"'{sf_dir}/documents.parquet'"
        )
        want = sorted(map(tuple, con.execute(_dataset_card_oracle()).fetchall()))
        assert got == want and len(got) > 0
        return {(g[0], g[1]): g for g in got}

    rows = compare("/root/testdata/sf0.001")
    assert sum(r[7] for r in rows.values()) <= 1000  # integer floors

    # planted: srcA/en has 3 docs (lengths 2, 4, 6 -> lower median 4),
    # two of them exact duplicates; srcB/de has 1 doc of 8 tokens
    pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["a b", "c d e f", "c d e f", "w x y z " * 2],
            "lang": ["en", "en", "en", "de"],
            "source": ["srcA", "srcA", "srcA", "srcB"],
            "n_chars": [0] * 4,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = compare(str(tmp_path))
    a = got[("srcA", "en")]
    b = got[("srcB", "de")]
    assert (a[2], a[3], a[4]) == (3, 10, 4)  # docs, tokens, median
    assert abs(a[6] - 2 / 3) < 1e-12  # dup_frac: docs 2 and 3
    assert (b[2], b[4], b[6]) == (1, 8, 0.0)
    # integer permille of 10/18 and 8/18
    assert a[7] == 10 * 1000 // 18 and b[7] == 8 * 1000 // 18
