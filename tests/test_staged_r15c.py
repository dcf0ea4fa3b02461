"""Parity + planted-fixture pins for the third batch of r15-staged
operators (round-14 second extended session): temperature-based
mixture allocation (and batch-mates added below as they land).

Same contract as test_staged_r15/_r15b: each operator runs against its
staged DuckDB oracle on the driver corpus shape (sf0.001) AND on a
planted corpus with hand-computed expectations.
"""

from __future__ import annotations

import math

import duckdb
import pandas as pd

SF = "/root/testdata/sf0.001"


def _duck(sf_dir: str, sql: str, table: str = "documents"):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW {table} AS SELECT * FROM '{sf_dir}/{table}.parquet'"
    )
    return sorted(map(tuple, con.execute(sql).fetchall()))


def _got(df):
    return sorted(tuple(r) for r in df.collect())


def _write_docs(tmp_path, texts_by_lang):
    rows = []
    i = 0
    for lang, texts in texts_by_lang.items():
        for t in texts:
            rows.append((i, t, lang, "s", len(t)))
            i += 1
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_temperature_alloc_matches_duckdb_and_planted(spark, tmp_path):
    """α=0.5 temperature mixture: engine parity on the corpus shape,
    then two hand-computed corpora — exact squares (weights land on
    integers, zero remainder) and a remainder-distribution case."""
    from finance_pipeline_spark.operators.textops import (
        _temperature_oracle,
        text_temperature_alloc,
    )

    got = _got(text_temperature_alloc(spark, SF))
    want = _duck(SF, _temperature_oracle())
    assert got == want and len(got) == 5
    assert sum(r[3] for r in got) == sum(r[1] for r in got)  # Σalloc == B
    # temperature flattens: the head language is downsampled (<1 epoch),
    # every tail language upsampled (>1 epoch)
    by_tokens = sorted(got, key=lambda r: -r[1])
    assert by_tokens[0][4] < 1000
    assert all(r[4] > 1000 for r in by_tokens[1:])

    # planted 1: token counts 1/4/9/16 → sqrt exact → weights
    # 1e6/2e6/3e6/4e6, B=30, Σw=1e7 → quotas 3/6/9/12, zero remainder
    d = _write_docs(
        tmp_path,
        {
            "a": ["w"],
            "b": ["w w w w"],
            "c": ["w w w w w w w w w"],
            "d": ["w " * 15 + "w"],
        },
    )
    got = _got(text_temperature_alloc(spark, d))
    assert got == _duck(d, _temperature_oracle())
    assert got == [
        ("a", 1, 1_000_000, 3, 3000),
        ("b", 4, 2_000_000, 6, 1500),
        ("c", 9, 3_000_000, 9, 1000),
        ("d", 16, 4_000_000, 12, 750),
    ]

    # planted 2: counts 2/3 → w = 1414213/1732050, B=5, Σw=3146263 →
    # quotas 2/2, one leftover token goes to the larger remainder (b)
    (tmp_path / "r").mkdir()
    d = _write_docs(tmp_path / "r", {"a": ["w w"], "b": ["w w w"]})
    got = _got(text_temperature_alloc(spark, d))
    assert got == _duck(d, _temperature_oracle())
    assert got == [
        ("a", 2, 1_414_213, 2, 1000),
        ("b", 3, 1_732_050, 3, 1000),
    ]


def test_temperature_alloc_tracks_float_reference(spark, tmp_path):
    """The bigint Hamilton allocation lands within quantization noise
    of the textbook float formula B·√n_i/Σ√n_j, sums to B exactly,
    and is monotone in n_i — across skew regimes including a
    single-language corpus and a 5-orders-of-magnitude head."""
    from finance_pipeline_spark.operators.textops import temperature_alloc

    for counts in (
        {"en": 100000, "fr": 1000, "sw": 10, "yo": 1},
        {"en": 777},
        {f"l{i}": 50 + i for i in range(12)},
        {"a": 2, "b": 2, "c": 2},  # all-tie: remainder split by lang
    ):
        sub = tmp_path / f"c{len(counts)}_{sum(counts.values())}"
        sub.mkdir()
        d = _write_docs(
            sub,
            {k: [("w " * (v - 1) + "w") if v else ""] for k, v in counts.items()},
        )
        from finance_pipeline_spark.registry import load

        rows = {
            r["lang"]: r
            for r in temperature_alloc(load(spark, d, "documents")).collect()
        }
        b = sum(counts.values())
        s = sum(math.sqrt(v) for v in counts.values())
        assert sum(r["alloc_tokens"] for r in rows.values()) == b
        for lang, n in counts.items():
            ref = b * math.sqrt(n) / s
            assert abs(rows[lang]["alloc_tokens"] - ref) <= 1 + b * 1e-5, (
                lang,
                rows[lang]["alloc_tokens"],
                ref,
            )
        ordered = sorted(counts.items(), key=lambda kv: kv[1])
        allocs = [rows[k]["alloc_tokens"] for k, _ in ordered]
        assert allocs == sorted(allocs)


def test_dsir_select_matches_duckdb_and_planted(spark, tmp_path):
    """DSIR importance resampling: engine parity on the corpus shape,
    then a planted corpus where the target-like raw doc must win the
    k=1 resample over the disjoint-vocabulary one."""
    from finance_pipeline_spark.operators.textops import (
        _dsir_oracle,
        dsir_select,
        text_dsir_select,
    )
    from finance_pipeline_spark.registry import load

    got = _got(text_dsir_select(spark, SF))
    want = _duck(SF, _dsir_oracle())
    assert got == want and len(got) == 500
    # the resample never touches target docs, and fills its k budget
    assert sum(1 for r in got if r[4]) == 100
    assert not any(r[1] and r[4] for r in got)
    # ranking signal: target-language docs read more target-like than
    # the rest on average (logw separates the slices)
    en = [r[3] for r in got if r[1]]
    non = [r[3] for r in got if not r[1]]
    assert sum(en) / len(en) > sum(non) / len(non)

    # planted: en target = {"the cat sat", "the cat ran"}; raw doc 10
    # (fr) shares its bigrams with target, raw doc 11 (fr) is
    # vocabulary-disjoint, doc 12 is featureless (1 token). k=1 must
    # pick doc 10; the featureless doc must never be selected.
    pd.DataFrame(
        {
            "doc_id": [1, 2, 10, 11, 12],
            "text": [
                "the cat sat",
                "the cat ran",
                "the cat sat",
                "xx yy zz",
                "w",
            ],
            "lang": ["en", "en", "fr", "fr", "fr"],
            "source": ["s"] * 5,
            "n_chars": [0] * 5,
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r
        for r in dsir_select(load(spark, str(tmp_path), "documents"), k=1)
        .collect()
    }
    assert _got(
        dsir_select(load(spark, str(tmp_path), "documents"), k=1)
    ) == _duck(str(tmp_path), _dsir_oracle(k=1))
    assert rows[10]["selected"] and not rows[11]["selected"]
    assert rows[10]["logw"] > rows[11]["logw"]
    assert rows[12]["n_feats"] == 0 and rows[12]["logw"] == 0.0
    assert not rows[12]["selected"]
    assert not rows[1]["selected"] and not rows[2]["selected"]


def test_dsir_gumbel_resample_seeded_and_engine_stable(spark):
    """The opt-in Gumbel top-k mode (the paper's actual resampling):
    same seed → identical draw on both engines; different seeds →
    different draws that still concentrate on high-logw docs (the
    noise perturbs the tail, not the head)."""
    from finance_pipeline_spark.operators.textops import (
        _dsir_oracle,
        dsir_select,
    )
    from finance_pipeline_spark.registry import load

    det = _got(dsir_select(load(spark, SF, "documents")))
    det_sel = {r[0] for r in det if r[4]}
    head = {
        r[0]
        for r in sorted(
            (r for r in det if not r[1] and r[2] > 0),
            key=lambda r: (-r[3], r[0]),
        )[:20]
    }
    draws = []
    for seed in ("s1", "epoch-7"):
        got = _got(
            dsir_select(load(spark, SF, "documents"), gumbel_seed=seed)
        )
        assert got == _duck(SF, _dsir_oracle(gumbel_seed=seed))
        sel = {r[0] for r in got if r[4]}
        assert len(sel) == 100 and sel != det_sel  # noise moved the tail
        assert head <= sel  # ...but the head survives the draw
        draws.append(sel)
    assert draws[0] != draws[1]  # seeds are independent draws


def test_dsir_select_plan_contract(spark):
    """The ratio table broadcasts into the scoring join, the resample
    plans as TakeOrderedAndProject (k-bounded, no global sort
    materialization), and nothing falls back to Python or a cartesian
    product."""
    from finance_pipeline_spark.operators.textops import text_dsir_select

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        text_dsir_select(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan


def test_temperature_and_dsir_oracles_match_bruteforce_hypothesis():
    """Both staged oracles vs independent plain-Python brute force
    over randomized corpora: a from-scratch integer Hamilton allocator
    for the temperature table, and a Counter/Decimal DSIR scorer
    (md5 buckets, HALF_UP 6-dp log rounding, top-k by (-logw, id))."""
    import hashlib
    from collections import Counter
    from decimal import ROUND_HALF_UP, Decimal

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from finance_pipeline_spark.operators.textops import (
        _dsir_oracle,
        _temperature_oracle,
    )

    def r6(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(Decimal("0.000001"), ROUND_HALF_UP)

    def brute_temp(texts, langs):
        counts = Counter()
        for t, l in zip(texts, langs):
            counts[l or "und"] += len(t.strip().lower().split(" "))
        w = {l: math.floor(math.sqrt(n) * 1e6) for l, n in counts.items()}
        b, u = sum(counts.values()), sum(w.values())
        q = {l: (b // u) * wi + ((b % u) * wi) // u for l, wi in w.items()}
        rem = {l: ((b % u) * wi) % u for l, wi in w.items()}
        order = sorted(counts, key=lambda l: (-rem[l], l))
        for l in order[: b - sum(q.values())]:
            q[l] += 1
        return sorted(
            (l, counts[l], w[l], q[l], (q[l] * 1000) // counts[l])
            for l in counts
        )

    def brute_dsir(texts, langs, k=3, nb=4096, target="en", seed=None):
        def toks(t):
            return [x for x in t.strip().lower().split(" ") if x]

        def bkt(g):
            return int(hashlib.md5(g.encode()).hexdigest()[:6], 16) % nb

        def gumbel(i):
            h = int(
                hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:6], 16
            )
            return r6(-math.log(-math.log((h + 0.5) / 16777216.0)))

        docs, ct, cr = [], Counter(), Counter()
        for i, (t, l) in enumerate(zip(texts, langs)):
            ts = toks(t)
            bs = (
                [bkt(f"{ts[j]} {ts[j+1]}") for j in range(len(ts) - 1)]
                if len(ts) >= 2
                else []
            )
            is_t = (l or "und") == target
            docs.append((i, is_t, bs))
            for x in bs:
                cr[x] += 1
                if is_t:
                    ct[x] += 1
        tt, tr = sum(ct.values()), sum(cr.values())
        lr = {
            x: r6(math.log((ct[x] + 1) / (tt + nb)))
            - r6(math.log((cr[x] + 1) / (tr + nb)))
            for x in cr
        }
        scored = [
            (i, is_t, len(bs), sum((lr[x] for x in bs), Decimal(0)))
            for i, is_t, bs in docs
        ]
        pool = sorted(
            (r for r in scored if not r[1] and r[2] > 0),
            key=lambda r: (
                -(r[3] + gumbel(r[0])) if seed is not None else -r[3],
                r[0],
            ),
        )
        top = {r[0] for r in pool[:k]}
        return sorted(
            (i, is_t, n, float(lw), i in top) for i, is_t, n, lw in scored
        )

    word = st.sampled_from(["a", "b", "c", "dd", "ee"])
    doc = st.lists(word, min_size=0, max_size=8).map(" ".join)

    @settings(max_examples=25, deadline=None)
    @given(
        texts=st.lists(doc, min_size=1, max_size=10),
        langs=st.lists(
            st.sampled_from(["en", "fr", "zh"]), min_size=10, max_size=10
        ),
    )
    def check(texts, langs):
        langs = langs[: len(texts)]
        df = pd.DataFrame(
            {
                "doc_id": range(len(texts)),
                "text": texts,
                "lang": langs,
                "source": ["s"] * len(texts),
                "n_chars": [0] * len(texts),
            }
        )
        con = duckdb.connect()
        con.register("documents", df)
        got_t = sorted(map(tuple, con.execute(_temperature_oracle()).fetchall()))
        assert got_t == brute_temp(texts, langs)
        got_d = sorted(map(tuple, con.execute(_dsir_oracle(k=3)).fetchall()))
        assert got_d == brute_dsir(texts, langs, k=3)
        got_g = sorted(
            map(tuple, con.execute(_dsir_oracle(k=3, gumbel_seed="hx")).fetchall())
        )
        assert got_g == brute_dsir(texts, langs, k=3, seed="hx")

    check()


def test_mm_thumbnail_matches_duckdb_and_bruteforce(spark, tmp_path):
    """The resize leg of the multimodal quartet: Spark kernel ==
    DuckDB oracle on the corpus shape, and both == an independent
    pure-Python box-downsample over crafted texts (empty, 1-byte,
    multi-byte UTF-8, long) replaying the fixture rule from scratch."""
    from finance_pipeline_spark.operators.multimodal import (
        _mm_thumbnail_oracle,
        mm_thumbnail,
    )

    got = _got(mm_thumbnail(spark, SF))
    want = _duck(SF, _mm_thumbnail_oracle())
    assert got == want and len(got) == 500

    texts = ["", "a", "ab", "héllo wörld", "x" * 40, None]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [0] * len(texts),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = _got(mm_thumbnail(spark, str(tmp_path)))
    assert got == _duck(str(tmp_path), _mm_thumbnail_oracle())

    def brute(text):
        tb = ("" if text is None else text).encode("utf-8")
        n = len(tb)
        w, h = 3 + n % 9, 3 + (n * 5) % 7
        ch = (1, 3, 4)[n % 3]
        need = w * h * ch
        body = (tb * (-(-need // n)))[:need] if n else bytes(need)

        def px(y, x):  # channel-collapsed pixel sum
            return sum(body[(y * w + x) * ch + c] for c in range(ch))

        def q(y0, y1, x0, x1):
            s = sum(px(y, x) for y in range(y0, y1) for x in range(x0, x1))
            return s // ((y1 - y0) * (x1 - x0) * ch)

        h2, w2 = h // 2, w // 2
        return (
            w, h, ch,
            q(0, h2, 0, w2), q(0, h2, w2, w),
            q(h2, h, 0, w2), q(h2, h, w2, w),
        )

    assert {r[0]: r[1:] for r in got} == {
        i: brute(t) for i, t in enumerate(texts)
    }


def test_regex_token_count_matches_duckdb_and_planted(spark, tmp_path):
    """The 'BPE-ish regex' token counter: engine parity on the corpus
    shape and on adversarial texts (unicode letters outside [a-z],
    tabs/newlines, pure punctuation, None, empty) — the disjoint
    character classes make Java-regex and RE2 agree match-for-match."""
    from finance_pipeline_spark.operators.textops import (
        _regex_token_oracle,
        text_regex_token_count,
    )

    got = _got(text_regex_token_count(spark, SF))
    want = _duck(SF, _regex_token_oracle())
    assert got == want and len(got) == 500
    # counts compose: every run is alpha, digit, or symbol
    assert all(r[2] == r[3] + r[4] + r[5] for r in got)

    texts = [
        "", "abc123!!", "a1b2 c3?d4", "héllo, wörld! 42",
        "tabs\tand\nnewlines x9", None, "...", "a " * 5,
    ]
    pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["s"] * len(texts),
            "n_chars": [0] * len(texts),
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))
    got = _got(text_regex_token_count(spark, str(tmp_path)))
    assert got == _duck(str(tmp_path), _regex_token_oracle())
    by_id = {r[0]: r[1:] for r in got}
    # hand-checks: "héllo, wörld! 42" → alpha h/llo/w/rld, digit 42,
    # symbols é/,/ö/! ; "abc123!!" → 3 runs over 1 ws token = 3000‰
    assert by_id[3] == (3, 9, 4, 1, 4, 3000)
    assert by_id[1] == (1, 3, 1, 1, 1, 3000)
    assert by_id[0] == (1, 0, 0, 0, 0, 0)  # empty: 1 ws token, 0 runs


def test_regex_token_count_plan_contract(spark):
    """Pure map work on the scan: single parquet scan, no exchange,
    no Python, whole-stage codegen."""
    from finance_pipeline_spark.operators.textops import (
        text_regex_token_count,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        text_regex_token_count(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1
    assert "Exchange" not in plan
    assert "EvalPython" not in plan and "PythonUDF" not in plan


def test_mm_thumbnail_plan_contract(spark):
    """Resize rides the decode family's plan: Arrow mapInPandas over
    the spread partitioning, no shuffle/exchange after the kernel, no
    cartesian product."""
    from finance_pipeline_spark.operators.multimodal import mm_thumbnail

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        mm_thumbnail(spark, SF)._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("MapInPandas") == 2  # synth + decode/resize
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan


def test_temperature_alloc_single_scan_pure_codegen(spark):
    """Plan contract (the unimax discipline): ONE parquet scan feeds
    the language-histogram groupBy with a partial (map-side) aggregate;
    everything downstream is JVM arithmetic on the language-cardinality
    frame — no Python, no cartesian product."""
    from finance_pipeline_spark.operators.textops import (
        text_temperature_alloc,
    )

    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    plan = (
        text_temperature_alloc(spark, SF)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Scan parquet") == 1, plan.count("Scan parquet")
    assert "EvalPython" not in plan and "PythonUDF" not in plan
    assert "CartesianProduct" not in plan
    assert "partial" in plan.lower()
