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
