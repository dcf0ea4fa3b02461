"""End-to-end batch curation pipeline: stage accounting, dedup
guarantees on planted inputs, and a verifiable shard export."""

from __future__ import annotations

import random

import pandas as pd

from conftest import SF_DIR, perturb_doc, random_doc

from finance_pipeline_spark.pipelines.curation import curate_corpus
from finance_pipeline_spark.sinks.shard_writer import verify_training_shards


def test_curate_corpus_on_driver_testdata(spark, tmp_path):
    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, SF_DIR, out, n_shards=2)

    # Monotone stage accounting
    assert (
        stats["n_input"]
        >= stats["n_screened"]
        >= stats["n_lm_familiar"]
        >= stats["n_exact_unique"]
        >= stats["n_after_near_dedup"]
        >= stats["n_after_scrub"]
        >= stats["n_exported"]
        > 0
    )
    assert sum(stats["splits"].values()) == stats["n_exported"]
    assert stats["manifest"]["n_rows"] == stats["n_exported"]

    # Export round-trips and every per-shard digest re-verifies
    assert verify_training_shards(spark, out) == []
    df = spark.read.parquet(f"{out}/data")
    assert df.count() == stats["n_exported"]
    assert set(df.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test",
    }
    # Exact-dedup guarantee: no two exported rows share text
    assert df.select("text").distinct().count() == stats["n_exported"]
    # Eval-integrity invariant (r13): near-dedup ran BEFORE the split,
    # so no verified near-dup pair may straddle splits in the export
    assert stats["residual_leak_pairs"] == 0


def test_curate_corpus_collapses_planted_duplicates(spark, tmp_path):
    rng = random.Random(7)
    base = [random_doc(rng, 80) for _ in range(20)]
    rows = []
    doc_id = 1
    for t in base:
        rows.append((doc_id, t)); doc_id += 1
    # exact copies of the first five, near-copies of the next five
    for t in base[:5]:
        rows.append((doc_id, t)); doc_id += 1
    for t in base[5:10]:
        rows.append((doc_id, perturb_doc(rng, t, n_edits=2))); doc_id += 1
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, str(tmp_path), out, n_shards=1)
    # The 5 exact copies must go at exact-dedup; the near-copies at
    # the LSH stage (high-Jaccard 2-edit perturbations of 80 tokens).
    assert stats["n_lm_familiar"] - stats["n_exact_unique"] == 5
    assert stats["n_exact_unique"] - stats["n_after_near_dedup"] == 5
    # Canonical (min doc_id) survivors: every original base doc kept
    kept = set(
        spark.read.parquet(f"{out}/data").select("doc_id").toPandas()["doc_id"]
    )
    assert set(range(1, 21)) <= kept


def test_curate_corpus_scrubs_cross_doc_boilerplate(spark, tmp_path):
    """Stage 3b: a 25-token boilerplate run shared by two otherwise
    distinct docs (Jaccard far below the 0.5 LSH bar, so near-dedup
    keeps both) is excised from BOTH, case-preserved; a doc that is
    nothing but the boilerplate plus a too-short residue drops."""
    rng = random.Random(17)
    boiler_toks = [f"BP{i}" for i in range(25)]
    a_unique = random_doc(rng, 60).split(" ")
    b_unique = random_doc(rng, 60).split(" ")
    doc_a = " ".join(a_unique + boiler_toks)
    doc_b = " ".join(boiler_toks + b_unique)
    doc_c = " ".join(boiler_toks + ["only", "four", "extra", "toks"])  # drops
    filler = [random_doc(rng, 60) for _ in range(5)]
    rows = [(1, doc_a), (2, doc_b), (3, doc_c)] + [
        (10 + i, t) for i, t in enumerate(filler)
    ]
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, str(tmp_path), out, n_shards=1)
    assert stats["n_after_near_dedup"] - stats["n_after_scrub"] == 1  # doc_c
    got = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{out}/data").select("doc_id", "text").collect()
    }
    assert got[1] == " ".join(a_unique), "boilerplate tail not excised"
    assert got[2] == " ".join(b_unique), "boilerplate head not excised"
    assert 3 not in got
    # untouched docs keep their exact text
    for i, t in enumerate(filler):
        assert got[10 + i] == t


def test_curate_corpus_lm_screen_drops_planted_gibberish(spark, tmp_path):
    """Stage 1b: a doc that sails through the TTR screen (long, all
    tokens distinct — maximal type/token ratio) but whose bigrams the
    corpus has never seen is dropped at the LM-familiarity stage."""
    rng = random.Random(11)
    rows = [(i, random_doc(rng, 80)) for i in range(1, 31)]
    # high-TTR gibberish: 80 unique out-of-vocabulary tokens — the TTR
    # quality screen scores this 1.0, only the corpus LM catches it
    rows.append((99, " ".join(f"qz{i}gibberish{i}x" for i in range(80))))
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["t"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, str(tmp_path), out, n_shards=1)

    assert stats["n_screened"] == 31  # TTR screen keeps the gibberish
    assert stats["n_lm_familiar"] == 30  # the LM screen drops it
    kept = set(
        spark.read.parquet(f"{out}/data").select("doc_id").toPandas()["doc_id"]
    )
    assert 99 not in kept
    assert set(range(1, 31)) <= kept


def test_curate_corpus_surfaces_dropped_bucket_ledger(spark, tmp_path):
    """r8 verdict item 7: a planted over-cap LSH bucket (>512 docs
    sharing band keys) must show up in the curation stats — the run
    completes, and the caps' exclusions are REPORTED instead of
    silently reading as 'deduped'."""
    rng = random.Random(11)
    # wide-vocab base (random_doc's ~25-word vocabulary would fail the
    # TTR quality screen at 200 tokens)
    base = " ".join(f"w{rng.randrange(5000)}" for _ in range(200))
    rows = [(1, base)]
    # 700 suffix-only variants: all distinct (survive exact dedup) but
    # appending one token only ADDS shingles, so each variant keeps the
    # base's minhash band keys with ~90% probability per band ->
    # buckets of ~630 docs, past the 512 cap
    doc_id = 2
    while len(rows) < 700:
        rows.append((doc_id, f"{base} uq{doc_id}tail"))
        doc_id += 1
    n_en = len(rows)
    # plus healthy docs in a SECOND language: unique wide-vocab
    # content (no dup spans to scrub) scored against the fr corpus
    # mean — the en mean is skewed sky-high by the 699 suffix clones,
    # which is exactly why the LM screen is per-language
    for _ in range(30):
        rows.append(
            (doc_id, " ".join(f"f{rng.randrange(5000)}" for _ in range(60)))
        )
        doc_id += 1
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * n_en + ["fr"] * 30,
            "source": ["test"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(str(tmp_path / "documents.parquet"))

    out = str(tmp_path / "curated")
    stats = curate_corpus(spark, str(tmp_path), out, n_shards=2)
    assert stats["n_dropped_buckets"] > 0
    assert stats["n_docs_in_dropped_buckets"] > 512
    # the cap never kills the run: the healthy minority-language docs
    # come out the far end (the 699 clones legitimately die at the
    # substring scrub — they ARE wall-to-wall boilerplate)
    assert stats["n_exported"] >= 25


def test_curate_corpus_reports_lm_bucket_mix(spark, tmp_path):
    """The CCNet-style quality histogram rides the stats: per-lang
    familiarity terciles sum to the scored-doc count."""
    stats = curate_corpus(spark, SF_DIR, str(tmp_path / "out"), n_shards=2)
    b = stats["lm_buckets"]
    assert set(b) <= {"head", "middle", "tail"} and sum(b.values()) > 0
    # terciles: no bucket more than ~a doc bigger than another per lang
    assert max(b.values()) - min(b.values()) <= stats["n_screened"] * 0.1


def test_curate_corpus_from_warc_segments(spark, tmp_path):
    """The Common Crawl first mile wired into curation: WARC segment
    files in, train-ready shards out, with the same stage accounting —
    and re-running over the same segments produces identical doc_ids
    (the URL-digest stability the keyed stages rely on)."""
    import random

    from finance_pipeline_spark.operators.warc import (
        _http_response_bytes,
        build_warc,
    )
    from finance_pipeline_spark.pipelines.curation import curate_corpus
    from tests.conftest import random_doc

    rng = random.Random(47)
    wdir = tmp_path / "segments"
    wdir.mkdir()
    for seg in range(2):
        recs = [("warcinfo", {}, b"sw: test\r\n")]
        for i in range(6):
            url = f"http://h{seg}.example.com/p/{i}"
            body = random_doc(rng, 60).encode()
            recs.append(
                ("response", {"WARC-Target-URI": url}, _http_response_bytes(body))
            )
        (wdir / f"seg{seg}.warc.gz").write_bytes(build_warc(recs))

    stats = curate_corpus(
        spark, None, str(tmp_path / "out"), n_shards=2, warc_dir=str(wdir)
    )
    assert stats["n_input"] == 12
    assert stats["n_screened"] > 0 and stats["n_exported"] > 0
    assert set(stats["stage_secs"]) >= {"screen", "exact_dedup", "export"}


def test_curate_corpus_optional_token_budget_stage(spark, tmp_path):
    """token_budget thins ONLY the train split (per-source quality-
    ordered take until the budget), leaves val/test byte-identical,
    keeps the export/manifest/splits accounting consistent — and the
    default-off path is unchanged."""
    base = curate_corpus(spark, SF_DIR, str(tmp_path / "c0"), n_shards=2)
    assert base["n_after_budget"] is None
    assert base["n_exported"] == base["n_decontaminated"]

    budget = 120  # small enough to bite on every source at this SF
    stats = curate_corpus(
        spark, SF_DIR, str(tmp_path / "c1"), n_shards=2, token_budget=budget
    )
    assert stats["n_after_budget"] == stats["n_exported"]
    assert stats["n_exported"] < base["n_exported"]  # the budget bit
    assert sum(stats["splits"].values()) == stats["n_exported"]
    assert stats["manifest"]["n_rows"] == stats["n_exported"]

    df0 = spark.read.parquet(f"{tmp_path}/c0/data")
    df1 = spark.read.parquet(f"{tmp_path}/c1/data")
    # val/test ride through untouched
    ev0 = sorted(
        (r.doc_id, r.split) for r in df0.filter("split != 'train'").collect()
    )
    ev1 = sorted(
        (r.doc_id, r.split) for r in df1.filter("split != 'train'").collect()
    )
    assert ev0 == ev1
    # train shrank and is a subset of the unbudgeted train
    tr0 = {r.doc_id for r in df0.filter("split = 'train'").collect()}
    tr1 = {r.doc_id for r in df1.filter("split = 'train'").collect()}
    assert tr1 < tr0
    # the budget semantics: per source, tokens strictly ahead of every
    # kept doc (quality DESC, doc_id order) stay under the budget —
    # spot-check via the operator's own annotation replayed on c0 train
    from finance_pipeline_spark.operators.textops import token_budget_mix

    ann = token_budget_mix(
        df0.filter("split = 'train'").select("doc_id", "source", "text"),
        budget=budget,
    )
    want_taken = {r.doc_id for r in ann.filter("taken").collect()}
    assert tr1 == want_taken


def test_curate_corpus_optional_dsir_stage(spark, tmp_path):
    """dsir_k shrinks ONLY the train split to the target-language
    slice plus the k most target-like docs; val/test ride through
    byte-identical; the kept set replays exactly from the operator run
    on the un-DSIR'd export (deterministic and seeded modes)."""
    base = curate_corpus(spark, SF_DIR, str(tmp_path / "c0"), n_shards=2)
    assert base["n_after_dsir"] is None

    k = 25
    stats = curate_corpus(
        spark, SF_DIR, str(tmp_path / "c1"), n_shards=2, dsir_k=k
    )
    assert stats["n_after_dsir"] == stats["n_exported"] < base["n_exported"]
    assert sum(stats["splits"].values()) == stats["n_exported"]
    assert stats["manifest"]["n_rows"] == stats["n_exported"]

    df0 = spark.read.parquet(f"{tmp_path}/c0/data")
    df1 = spark.read.parquet(f"{tmp_path}/c1/data")
    ev = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.split) for r in df.filter("split != 'train'").collect()
    )
    assert ev(df0) == ev(df1)  # eval sets never thin

    # exact replay: the operator on c0's train docs must reproduce the
    # kept set (target slice + k selected)
    from finance_pipeline_spark.operators.textops import dsir_select

    ann = dsir_select(
        df0.filter("split = 'train'").select("doc_id", "lang", "text"), k=k
    )
    want = {
        r.doc_id
        for r in ann.filter("is_target or selected").collect()
    }
    tr1 = {r.doc_id for r in df1.filter("split = 'train'").collect()}
    assert tr1 == want
    n_target = ann.filter("is_target").count()
    assert len(tr1) == n_target + k  # enough raw docs at this SF

    # seeded Gumbel mode: same replay contract, different draw
    stats_g = curate_corpus(
        spark, SF_DIR, str(tmp_path / "c2"), n_shards=2,
        dsir_k=k, dsir_seed="epoch-0",
    )
    dfg = spark.read.parquet(f"{tmp_path}/c2/data")
    trg = {r.doc_id for r in dfg.filter("split = 'train'").collect()}
    ann_g = dsir_select(
        df0.filter("split = 'train'").select("doc_id", "lang", "text"),
        k=k, gumbel_seed="epoch-0",
    )
    want_g = {
        r.doc_id for r in ann_g.filter("is_target or selected").collect()
    }
    assert trg == want_g and trg != tr1
    assert stats_g["n_after_dsir"] == len(trg) + len(ev(dfg))


def test_curate_corpus_budget_then_dsir_compose(spark, tmp_path):
    """Both optional train-thinning stages together: the budget stage
    runs first, DSIR resamples the POST-budget train universe — the
    kept set replays exactly from dsir_select over the budget-only
    export's train split, and eval splits survive both stages."""
    budget, k = 120, 10
    only_budget = curate_corpus(
        spark, SF_DIR, str(tmp_path / "b"), n_shards=2, token_budget=budget
    )
    both = curate_corpus(
        spark, SF_DIR, str(tmp_path / "bd"), n_shards=2,
        token_budget=budget, dsir_k=k,
    )
    assert both["n_after_budget"] == only_budget["n_after_budget"]
    assert both["n_after_dsir"] == both["n_exported"]
    assert both["n_exported"] < only_budget["n_exported"]

    dfb = spark.read.parquet(f"{tmp_path}/b/data")
    dfbd = spark.read.parquet(f"{tmp_path}/bd/data")
    ev = lambda df: sorted(  # noqa: E731
        (r.doc_id, r.split) for r in df.filter("split != 'train'").collect()
    )
    assert ev(dfb) == ev(dfbd)

    from finance_pipeline_spark.operators.textops import dsir_select

    ann = dsir_select(
        dfb.filter("split = 'train'").select("doc_id", "lang", "text"), k=k
    )
    want = {r.doc_id for r in ann.filter("is_target or selected").collect()}
    got = {r.doc_id for r in dfbd.filter("split = 'train'").collect()}
    assert got == want
