"""Parity + planted-fixture + brute-force pins for the fourth batch of
staged operators (round-14 fourth extended session): winnowing
fingerprint selection (Schleimer et al. 2003), the audio
feature-extract / fingerprint-dedup / resize legs, the IMA ADPCM
codec, Count-Min Sketch heavy hitters, and their CLI wrappers.

Same contract as test_staged_r15/_r15b/_r15c: each operator runs
against its staged DuckDB oracle on the driver corpus shape (sf0.001)
AND on planted corpora with independently-computed expectations, plus
a from-scratch Python brute force for the algorithmic core.
"""

from __future__ import annotations

import hashlib

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"

_WINNOW_K, _WINNOW_W = 3, 4


def _duck(sf_dir: str, sql: str, table: str = "documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def _got(df):
    return sorted(tuple(r) for r in df.collect())


def _write_docs(tmp_path, texts):
    pd.DataFrame(
        [(i, t, "en", "s", len(t or "")) for i, t in enumerate(texts)],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


# --- independent Python brute forces (no Spark, no repo kernels) -------------


def _brute_winnow(text):
    """From-scratch winnowing: word trigrams, 12-hex-digit md5 hash,
    window minima with the RIGHTMOST tie rule."""
    toks = [] if text is None else text.strip().lower().split(" ")
    grams = [
        " ".join(toks[i : i + _WINNOW_K])
        for i in range(len(toks) - _WINNOW_K + 1)
    ]
    h = [
        int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams
    ]
    if not h:
        return 0, 0, None, None
    windows = (
        [h] if len(h) < _WINNOW_W
        else [h[j : j + _WINNOW_W] for j in range(len(h) - _WINNOW_W + 1)]
    )
    sel = set()
    for j, w in enumerate(windows):
        m = min(w)
        # rightmost occurrence of the minimum
        sel.add(j + max(i for i, v in enumerate(w) if v == m))
    fps = sorted({h[p] for p in sel})
    return len(h), len(fps), fps[0], sum(fps)


def _brute_audio(text, frame=32):
    """From-scratch audio replay: cycled utf-8 bytes -> int16 LE
    samples -> framewise energies, without touching the repo's
    encode_wav/decode_wav round trip."""
    tb = ("" if text is None else text).encode("utf-8")
    n = len(tb)
    ns = 100 + n % 57
    rate = 8000 + (n % 3) * 4000
    samples = []
    for i in range(ns):
        if n == 0:
            samples.append(0)
            continue
        lo, hi = tb[(2 * i) % n], tb[(2 * i + 1) % n]
        v = lo + 256 * hi
        samples.append(v - 65536 if v >= 32768 else v)
    nf = ns // frame
    energies = [
        sum(x * x for x in samples[f * frame : (f + 1) * frame])
        for f in range(nf)
    ]
    zc = sum(
        1 for a, b in zip(samples, samples[1:]) if a * b < 0
    )
    return {
        "rate": rate,
        "n_frames": nf,
        "zc": zc,
        "total": sum(x * x for x in samples),
        "max_frame": max(energies),
        "active": sum(1 for e in energies if e > 32_000_000),
        "energies": energies,
    }


def _brute_audio_sig(text):
    b = _brute_audio(text)
    bands = ",".join(
        f"{str(e + 1)[:3]}e{len(str(e + 1))}" for e in b["energies"]
    )
    return hashlib.md5(f"{b['rate']}:{bands}".encode()).hexdigest()


# --- winnowing ---------------------------------------------------------------


def test_winnow_matches_duckdb_and_bruteforce(spark):
    from finance_pipeline_spark.operators.textops import (
        _winnow_oracle,
        text_winnow_fingerprint,
    )

    got = _got(text_winnow_fingerprint(spark, SF))
    assert got == _duck(SF, _winnow_oracle())
    # independent brute force over the same corpus
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    want = sorted(
        (int(i), *map(lambda v: v, _brute_winnow(t))) for i, t in docs
    )
    want = [
        (i, int(ng), int(nf), mn, sm)
        for i, ng, nf, mn, sm in want
    ]
    assert got == want
    # signal: real docs select a proper subset (winnowing compresses)
    assert all(r[2] < r[1] for r in got if r[1] > _WINNOW_W)


def test_winnow_planted_edges(spark, tmp_path):
    """Tie-heavy, sub-window, and empty documents — the paper's edge
    cases: all-identical grams collapse to one fingerprint; fewer
    grams than a window degrade to one whole-doc window; no grams
    emit an empty set (NULL min/sum)."""
    from finance_pipeline_spark.operators.textops import (
        _winnow_oracle,
        text_winnow_fingerprint,
    )

    d = _write_docs(
        tmp_path,
        [
            "a a a a a a a a a a",  # 8 identical trigram hashes
            "one two",  # 0 trigrams
            "",  # empty
            "x y z",  # exactly one trigram
            "p q r s t",  # 3 trigrams < W=4 -> single window
            "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        ],
    )
    got = _got(text_winnow_fingerprint(spark, d))
    assert got == _duck(d, _winnow_oracle())
    by_id = {r[0]: r[1:] for r in got}
    assert by_id[0][1] == 1  # ties collapse to one fingerprint
    assert by_id[1] == (0, 0, None, None)
    assert by_id[2] == (0, 0, None, None)
    ng, nf, mn, sm = by_id[3]
    assert (ng, nf) == (1, 1) and mn == sm  # one gram -> itself
    assert by_id[4][0] == 3 and by_id[4][1] == 1  # sub-window: min only
    for i in range(6):
        assert by_id[i] == _brute_winnow(
            [
                "a a a a a a a a a a",
                "one two",
                "",
                "x y z",
                "p q r s t",
                "alpha beta gamma delta epsilon zeta eta theta iota kappa",
            ][i]
        )


def test_winnow_guarantee_shared_run_shares_fingerprint(spark, tmp_path):
    """The winnowing theorem: two documents sharing a token run of
    length >= W + K - 1 (= 6) share at least one selected fingerprint
    hash. Planted: a common 8-token passage embedded in different
    contexts. Verified on the independent brute force (fingerprint
    SETS), then the op's scalar summaries are pinned to that brute
    force through the oracle parity above."""
    shared = "the quick brown fox jumps over lazy dogs"
    doc_a = "intro words here " + shared + " trailing stuff"
    doc_b = "completely different opening " + shared
    fps_a = _fps_set(doc_a)
    fps_b = _fps_set(doc_b)
    assert fps_a & fps_b, "shared run must share a fingerprint"
    # and genuinely different docs don't collide
    assert not (_fps_set("red green blue cyan") & _fps_set("one two three four"))


def _fps_set(text):
    toks = text.strip().lower().split(" ")
    grams = [
        " ".join(toks[i : i + _WINNOW_K])
        for i in range(len(toks) - _WINNOW_K + 1)
    ]
    h = [int(hashlib.md5(g.encode()).hexdigest()[:12], 16) for g in grams]
    if not h:
        return set()
    windows = (
        [h] if len(h) < _WINNOW_W
        else [h[j : j + _WINNOW_W] for j in range(len(h) - _WINNOW_W + 1)]
    )
    sel = set()
    for j, w in enumerate(windows):
        m = min(w)
        sel.add(j + max(i for i, v in enumerate(w) if v == m))
    return {h[p] for p in sel}


def test_winnow_plan_contract(spark):
    """Map-only work: single parquet scan, JVM tokenization, ONE Arrow
    kernel for gram-hash + window select, and no exchange beyond the
    Python-kernel partition spread (no join, no aggregation)."""
    from finance_pipeline_spark.operators.textops import (
        text_winnow_fingerprint,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        text_winnow_fingerprint(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert plan.count("MapInPandas") == 1
    assert plan.count("Exchange") <= 1  # the kernel partition spread
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# --- audio features ----------------------------------------------------------


def test_audio_features_matches_duckdb_and_bruteforce(spark):
    from finance_pipeline_spark.operators.multimodal import (
        _audio_features_oracle,
        mm_audio_features,
    )

    got = _got(mm_audio_features(spark, SF))
    assert got == _duck(SF, _audio_features_oracle())
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    want = []
    for i, t in docs:
        b = _brute_audio(t)
        want.append(
            (
                int(i), b["rate"], b["n_frames"], b["zc"],
                b["total"], b["max_frame"], b["active"],
            )
        )
    assert got == sorted(want)
    # signal checks: non-constant columns. (zero_crossings is 0 on an
    # all-ASCII corpus — every sample's high byte is 0x20..0x7e, so
    # samples never go negative; the planted test below drives it.)
    assert len({r[1] for r in got}) > 1  # rates vary
    assert len({r[4] for r in got}) > 10  # energies vary


def test_audio_features_planted(spark, tmp_path):
    """Hand-checkable payloads: empty text -> all-zero samples (zero
    energy, zero crossings); an alternating-sign unicode pattern
    drives crossings."""
    from finance_pipeline_spark.operators.multimodal import (
        _audio_features_oracle,
        mm_audio_features,
    )

    texts = ["", "abc", "ÿÿ" * 10, None, "aÿ"]
    d = _write_docs(tmp_path, texts)
    got = _got(mm_audio_features(spark, d))
    assert got == _duck(d, _audio_features_oracle())
    by_id = {r[0]: r[1:] for r in got}
    # empty + None text -> silent clip
    for i in (0, 3):
        rate, nf, zc, tot, mx, act = by_id[i]
        assert (zc, tot, mx, act) == (0, 0, 0, 0) and nf == 3
    # "aÿ" cycles 3 bytes through 2-byte samples: the high byte
    # alternates 0xc3/0x61/0xbf -> sign flips -> real crossings
    assert by_id[4][2] > 0
    for i, t in enumerate(texts):
        b = _brute_audio(t)
        assert by_id[i] == (
            b["rate"], b["n_frames"], b["zc"],
            b["total"], b["max_frame"], b["active"],
        )


def test_audio_features_plan_contract(spark):
    """Decode-family plan: synth + feature kernels as MapInPandas, no
    join, no post-kernel exchange beyond the spread repartition."""
    from finance_pipeline_spark.operators.multimodal import mm_audio_features

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        mm_audio_features(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 2  # synth + features
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# --- audio fingerprint -------------------------------------------------------


def test_audio_fingerprint_matches_duckdb_and_bruteforce(spark):
    from finance_pipeline_spark.operators.multimodal import (
        _audio_fingerprint_oracle,
        mm_audio_fingerprint,
    )

    got = _got(mm_audio_fingerprint(spark, SF))
    assert got == _duck(SF, _audio_fingerprint_oracle())
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    sigs = {int(i): _brute_audio_sig(t) for i, t in docs}
    from collections import Counter

    counts = Counter(sigs.values())
    want = sorted(
        (i, s, counts[s]) for i, s in sigs.items()
    )
    assert got == want


def test_audio_fingerprint_planted_groups(spark, tmp_path):
    """Byte-identical audio MUST collide; disjoint envelopes MUST
    separate. Planted: two copies of one text (identical PCM), one
    near-variant, one silent clip."""
    from finance_pipeline_spark.operators.multimodal import (
        _audio_fingerprint_oracle,
        mm_audio_fingerprint,
    )

    dup = "repeated clip text payload"
    d = _write_docs(tmp_path, [dup, dup, "another clip entirely", ""])
    got = _got(mm_audio_fingerprint(spark, d))
    assert got == _duck(d, _audio_fingerprint_oracle())
    by_id = {r[0]: (r[1], r[2]) for r in got}
    assert by_id[0] == by_id[1] and by_id[0][1] == 2  # true dup group
    assert by_id[2][1] == 1 and by_id[3][1] == 1
    assert len({by_id[i][0] for i in (0, 2, 3)}) == 3  # all distinct sigs


def test_audio_fingerprint_plan_contract(spark):
    """Constant-size signature per clip, ONE shuffle on the 32-byte
    key for the group count — the 100 TB dedup shape."""
    from finance_pipeline_spark.operators.multimodal import (
        mm_audio_fingerprint,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        mm_audio_fingerprint(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 2  # synth + signature
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


def test_winnow_doc_hypothesis_vs_spec():
    """Property sweep of the factored kernel core against an
    independent spec implementation of the paper's definition
    (per-window rightmost argmin over explicit window slices) —
    tie-heavy alphabets (2 symbols) force the rightmost rule to
    matter; long docs exercise the strided path, short ones the
    sub-window degenerate."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.textops import winnow_doc

    @settings(max_examples=150, deadline=None)
    @given(
        st.lists(
            st.sampled_from(["a", "b", "xy", "longword", "ÿ"]),
            min_size=0,
            max_size=40,
        )
    )
    def prop(toks):
        ng, fps = winnow_doc(toks)
        exp_ng, exp_fps = _brute_winnow(" ".join(toks))[0], sorted(
            _fps_set(" ".join(toks)) if toks else set()
        )
        assert ng == exp_ng
        assert list(fps) == exp_fps

    prop()


# --- audio downsample --------------------------------------------------------


def _brute_downsample(text):
    b = _brute_audio(text)
    tb = ("" if text is None else text).encode("utf-8")
    n = len(tb)
    ns = 100 + n % 57
    s = []
    for i in range(ns):
        if n == 0:
            s.append(0)
            continue
        v = tb[(2 * i) % n] + 256 * tb[(2 * i + 1) % n]
        s.append(v - 65536 if v >= 32768 else v)
    no = ns // 2
    out = [int((s[2 * i] + s[2 * i + 1]) / 2) for i in range(no)]  # trunc
    return (
        b["rate"], no,
        sum(1 for a, c in zip(out, out[1:]) if a * c < 0),
        sum(x * x for x in out),
        max(abs(x) for x in out),
    )


def test_audio_downsample_matches_duckdb_and_bruteforce(spark):
    from finance_pipeline_spark.operators.multimodal import (
        _audio_downsample_oracle,
        mm_audio_downsample,
    )

    got = _got(mm_audio_downsample(spark, SF))
    assert got == _duck(SF, _audio_downsample_oracle())
    con = duckdb.connect()
    docs = con.execute(
        f"SELECT doc_id, text FROM '{SF}/documents.parquet'"
    ).fetchall()
    want = sorted((int(i), *_brute_downsample(t)) for i, t in docs)
    assert got == want


def test_audio_downsample_trunc_vs_floor_trap(spark, tmp_path):
    """The parity trap the docstring documents: odd NEGATIVE pair sums
    divide differently under floor (numpy //) and trunc (DuckDB //).
    'zÿ' synthesizes 17 odd-negative pair sums per clip — a floored
    kernel would be off by one on every one of them."""
    from finance_pipeline_spark.operators.multimodal import (
        _audio_downsample_oracle,
        mm_audio_downsample,
    )

    texts = ["zÿ", "aÿbÿc", "~ÿÿ", "", "plain ascii text"]
    d = _write_docs(tmp_path, texts)
    got = _got(mm_audio_downsample(spark, d))
    assert got == _duck(d, _audio_downsample_oracle())
    for i, t in enumerate(texts):
        assert got[i] == (i, *_brute_downsample(t))
    # and the trap is actually exercised: floor != trunc on this corpus
    tb = "zÿ".encode()
    s = []
    for j in range(100 + len(tb) % 57):
        v = tb[(2 * j) % len(tb)] + 256 * tb[(2 * j + 1) % len(tb)]
        s.append(v - 65536 if v >= 32768 else v)
    pairs = [s[2 * j] + s[2 * j + 1] for j in range((100 + len(tb) % 57) // 2)]
    assert any(p < 0 and p % 2 != 0 for p in pairs)


def test_audio_downsample_plan_contract(spark):
    from finance_pipeline_spark.operators.multimodal import (
        mm_audio_downsample,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        mm_audio_downsample(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 2  # synth + resample
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# --- IMA ADPCM ---------------------------------------------------------------


def _brute_adpcm_replay(samples):
    """Independent IMA encoder replay (spec-from-paper, not the repo
    code): returns (reconstructed list, final pred)."""
    STEPS = [7,8,9,10,11,12,13,14,16,17,19,21,23,25,28,31,34,37,41,45,50,
        55,60,66,73,80,88,97,107,118,130,143,157,173,190,209,230,253,279,
        307,337,371,408,449,494,544,598,658,724,796,876,963,1060,1166,
        1282,1411,1552,1707,1878,2066,2272,2499,2749,3024,3327,3660,4026,
        4428,4871,5358,5894,6484,7132,7845,8630,9493,10442,11487,12635,
        13899,15289,16818,18500,20350,22385,24623,27086,29794,32767]
    IDX = [-1, -1, -1, -1, 2, 4, 6, 8]
    pred, idx, out = 0, 0, []
    for s in samples:
        step = STEPS[idx]
        diff = s - pred
        nib = 0
        if diff < 0:
            nib, diff = 8, -diff
        if diff >= step:
            nib |= 4
            diff -= step
        if diff >= step >> 1:
            nib |= 2
            diff -= step >> 1
        if diff >= step >> 2:
            nib |= 1
        dq = step >> 3
        if nib & 4:
            dq += step
        if nib & 2:
            dq += step >> 1
        if nib & 1:
            dq += step >> 2
        pred = pred - dq if nib & 8 else pred + dq
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + IDX[nib & 7]))
        out.append(pred)
    return out, pred


def test_adpcm_codec_roundtrip_hypothesis():
    """decode(encode(x)) must equal the spec replay for arbitrary
    int16 signals — packing order (low nibble first), odd-count pad,
    clamps, and the step-index walk all under test."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    @settings(max_examples=100, deadline=None)
    @given(
        st.lists(
            st.integers(min_value=-32768, max_value=32767),
            min_size=0,
            max_size=130,
        )
    )
    def prop(sig):
        rec = list(decode_adpcm(encode_adpcm(sig)))
        want, _ = _brute_adpcm_replay(sig)
        assert rec == want

    prop()


def test_adpcm_codec_rejects_garbage():
    import pytest

    from finance_pipeline_spark.operators.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    with pytest.raises(ValueError, match="ADP1"):
        decode_adpcm(b"RIFFxxxx")
    good = encode_adpcm([1, 2, 3, 4, 5])
    with pytest.raises(ValueError, match="truncated"):
        decode_adpcm(good[:-1])


def test_adpcm_tracks_smooth_signals():
    """The codec is REAL: on a smooth ramp it tracks within a few
    steps (mean abs err tiny vs amplitude); on white-noise-like jumps
    it degrades — both are properties of IMA ADPCM, not bugs."""
    from finance_pipeline_spark.operators.multimodal import (
        decode_adpcm,
        encode_adpcm,
    )

    ramp = [min(32767, 40 * i) for i in range(400)]
    rec = list(decode_adpcm(encode_adpcm(ramp)))
    errs = [abs(a - b) for a, b in zip(ramp, rec)]
    assert sum(errs) / len(errs) < 10  # measured 3.1; huge headroom
    # a sawtooth with 8000-unit cliffs lags at each cliff (adaptive
    # step needs samples to grow) — that's IMA behavior, pinned loosely
    saw = [int(8000 * (i % 50) / 50) for i in range(400)]
    rec2 = list(decode_adpcm(encode_adpcm(saw)))
    errs2 = [abs(a - b) for a, b in zip(saw, rec2)]
    assert sum(errs2) / len(errs2) < 1000  # measured 416


def test_mm_decode_adpcm_matches_oracle_and_ratio(spark):
    from finance_pipeline_spark.operators.multimodal import (
        _adpcm_oracle,
        mm_decode_adpcm,
    )

    got = _got(mm_decode_adpcm(spark, SF))
    assert got == _duck(SF, _adpcm_oracle())
    for _, ns, pcm_b, adp_b, err, _fp in got:
        assert pcm_b == 2 * ns
        assert adp_b == 8 + (ns + 1) // 2  # the exact 4:1 + header
        assert err >= 0


def test_mm_decode_adpcm_plan_contract(spark):
    from finance_pipeline_spark.operators.multimodal import mm_decode_adpcm

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        mm_decode_adpcm(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("MapInPandas") == 2  # synth + codec chain
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# --- Count-Min Sketch heavy hitters -------------------------------------------


def _brute_cms(token_counts, d=4, w=16):
    """Independent CMS build + read from a frequency dict."""
    grid = {}
    for t, c in token_counts.items():
        for r in range(d):
            b = int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:12], 16) % w
            grid[(r, b)] = grid.get((r, b), 0) + c
    est = {}
    for t in token_counts:
        est[t] = min(
            grid[
                (
                    r,
                    int(hashlib.md5(f"{r}:{t}".encode()).hexdigest()[:12], 16)
                    % w,
                )
            ]
            for r in range(d)
        )
    return est


def test_cms_matches_duckdb_and_invariant(spark):
    from finance_pipeline_spark.operators.textops import (
        _cms_oracle,
        text_cms_heavy_hitters,
    )

    got = _got(text_cms_heavy_hitters(spark, SF))
    assert got == _duck(SF, _cms_oracle())
    assert len(got) == 20
    # the CMS theorem: estimate >= exact, always
    assert all(r[2] >= r[1] and r[3] == r[2] - r[1] for r in got)
    # the sketch is sized to actually collide on this corpus
    assert any(r[3] > 0 for r in got)
    # and against an independent Python CMS over the exact counts
    con = duckdb.connect()
    counts = dict(
        con.execute(
            "SELECT tok, count(*) FROM (SELECT unnest(string_split(trim("
            f"lower(text)), ' ')) tok FROM '{SF}/documents.parquet') GROUP BY tok"
        ).fetchall()
    )
    est = _brute_cms(counts)
    for tok, exact, cms, _over in got:
        assert counts[tok] == exact and est[tok] == cms


def test_cms_hypothesis_random_corpora():
    """Property sweep of the sketch math itself (no Spark): for random
    frequency vectors, the min-over-rows estimate is >= truth and
    equals the brute grid read — including single-token and
    all-colliding (w=1) degenerate sketches."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=100, deadline=None)
    @given(
        st.dictionaries(
            st.text(
                alphabet="abcdefgh ÿ",
                min_size=1,
                max_size=6,
            ).map(lambda s: s.replace(" ", "_")),
            st.integers(min_value=1, max_value=10_000),
            min_size=1,
            max_size=60,
        ),
        st.sampled_from([1, 2, 16]),
    )
    def prop(counts, w):
        est = _brute_cms(counts, w=w)
        assert all(est[t] >= c for t, c in counts.items())
        if w == 1:  # every row is one bucket: estimate == total mass
            total = sum(counts.values())
            assert all(v == total for v in est.values())

    prop()


def test_cms_plan_contract(spark):
    """ONE corpus-sized shuffle (the exact token groupBy with partial
    agg); top-20 plans as TakeOrderedAndProject; the counter grid
    joins broadcast."""
    from finance_pipeline_spark.operators.textops import (
        text_cms_heavy_hitters,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        text_cms_heavy_hitters(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan


# --- CLI ----------------------------------------------------------------------


def test_cli_heavy_hitters_and_audio_stats(capsys):
    """The corpus CLI wraps the new staged ops: JSON out, invariant
    flag true, audio dup groups empty on the tiny corpus (truth floor
    is sf0.1)."""
    import json
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import main as cli

    rc = cli.main(["corpus", "heavy-hitters", "--source-dir", SF])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert len(out["tokens"]) == 20 and out["invariant_holds"]
    assert any(t["over"] > 0 for t in out["tokens"])

    rc = cli.main(["corpus", "audio-stats", "--source-dir", SF])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["clips"] == 500
    assert out["adpcm_ratio"] > 3  # ~4:1 minus the 8-byte header
    assert out["dup_docs"] == 0  # no byte-identical audio at sf0.001
