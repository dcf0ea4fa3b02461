"""Streaming corpus ingestion: cross-batch content dedup, checkpoint
resume, and convergence of the accumulated table."""

from __future__ import annotations

import pandas as pd

from pyspark.sql import functions as F

from finance_pipeline_spark.pipelines.corpus_ingest import ingest_corpus_stream


def _write_docs(path, rows):
    pd.DataFrame(
        {
            "doc_id": [r[0] for r in rows],
            "text": [r[1] for r in rows],
            "lang": ["en"] * len(rows),
            "source": ["crawl"] * len(rows),
            "n_chars": [len(r[1]) for r in rows],
        }
    ).to_parquet(path)


def test_ingest_screens_duplicate_content_across_batches(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    # file 1: three distinct docs; file 2: one re-crawl (same text, new
    # doc_id), one in-file duplicate pair, one novel doc
    _write_docs(src / "f1.parquet", [(1, "alpha text"), (2, "beta text"), (3, "gamma text")])
    _write_docs(
        src / "f2.parquet",
        [(10, "alpha text"), (11, "delta text"), (12, "delta text")],
    )
    stats = ingest_corpus_stream(
        spark, str(src), table, ckpt, max_files_per_trigger=1
    )
    assert len(stats) == 2  # one micro-batch per file
    assert (stats[0].inserted, stats[0].skipped) == (3, 0)
    assert (stats[1].inserted, stats[1].skipped) == (1, 2)  # delta novel;
    # re-crawled alpha + the in-file duplicate both screened
    corpus = spark.read.parquet(table)
    assert corpus.count() == 4
    assert corpus.select("digest").distinct().count() == 4


def test_rerun_resumes_from_checkpoint_and_takes_only_new_files(spark, tmp_path):
    src = tmp_path / "incoming"
    src.mkdir()
    table = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")
    _write_docs(src / "f1.parquet", [(1, "alpha text"), (2, "beta text")])
    ingest_corpus_stream(spark, str(src), table, ckpt)
    # second run: old file untouched (checkpoint skips it), new file has
    # one replayed content + one novel
    _write_docs(src / "f2.parquet", [(20, "alpha text"), (21, "epsilon text")])
    stats = ingest_corpus_stream(spark, str(src), table, ckpt)
    assert sum(s.inserted for s in stats) == 1
    assert sum(s.skipped for s in stats) == 1
    assert spark.read.parquet(table).count() == 3


def test_ingest_with_index_screens_exact_and_near(spark, tmp_path):
    """Full-index streaming ingestion: exact re-crawls never land, near
    copies land flagged, and a replayed batch converges (state after
    re-delivery equals state after first delivery)."""
    import random

    from finance_pipeline_spark.pipelines.corpus_ingest import ingest_with_index
    from tests.conftest import perturb_doc, random_doc

    rng = random.Random(21)
    base = random_doc(rng)
    src = tmp_path / "incoming"
    src.mkdir()
    index_root = str(tmp_path / "index")
    kept_path = str(tmp_path / "kept")
    ckpt = str(tmp_path / "ckpt")

    _write_docs(src / "f1.parquet", [(1, base), (2, random_doc(rng))])
    _write_docs(
        src / "f2.parquet",
        [
            (10, base),  # exact re-crawl of doc 1 -> dropped
            (11, perturb_doc(rng, base, n_edits=1)),  # near copy -> flagged
            (12, random_doc(rng)),  # novel -> kept clean
        ],
    )
    stats = ingest_with_index(
        spark, str(src), index_root, kept_path, ckpt, max_files_per_trigger=1
    )
    assert len(stats) == 2
    assert (stats[0]["kept"], stats[0]["dropped_exact"]) == (2, 0)
    assert (stats[1]["kept"], stats[1]["dropped_exact"]) == (2, 1)
    assert stats[1]["near_flagged"] == 1

    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    kept = TxnKeyedTable(spark, kept_path, ["dg"]).read()
    assert kept.count() == 4
    by_id = {r.doc_id: r.verdict for r in kept.collect()}
    assert 10 not in by_id
    assert by_id[11] == "review_near"
    assert by_id[12] == "keep"

    # replay: fresh checkpoint re-delivers both files; all content is
    # already indexed, so nothing new lands anywhere
    stats2 = ingest_with_index(
        spark, str(src), index_root, kept_path, str(tmp_path / "ckpt2")
    )
    assert all(s["kept"] == 0 for s in stats2)
    assert TxnKeyedTable(spark, kept_path, ["dg"]).read().count() == 4


def test_ingest_with_lm_flags_gibberish_against_accumulated_corpus(
    spark, tmp_path
):
    """lm_root threads the stored LM through the stream: batch 1 lands
    unflagged (no corpus to judge against yet), batch 2's gibberish is
    flagged unfamiliar by the LM batch 1 trained, and a replayed batch
    converges to the same kept state."""
    import random

    from finance_pipeline_spark.pipelines.corpus_ingest import ingest_with_index
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable
    from tests.conftest import random_doc

    rng = random.Random(27)
    src = tmp_path / "incoming"
    src.mkdir()
    kwargs = dict(
        index_root=str(tmp_path / "index"),
        kept_path=str(tmp_path / "kept"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lm_root=str(tmp_path / "lm"),
        max_files_per_trigger=1,
    )

    _write_docs(
        src / "f1.parquet", [(i, random_doc(rng, 40)) for i in range(1, 16)]
    )
    stats = ingest_with_index(spark, str(src), **kwargs)
    assert stats[0]["lm_unfamiliar"] == 0  # empty LM judges nothing
    assert stats[0]["kept"] == 15

    _write_docs(
        src / "f2.parquet",
        [
            (100, random_doc(rng, 40)),  # corpus-like -> clean
            (101, " ".join(f"qx{i}z" for i in range(25))),  # gibberish
        ],
    )
    stats = ingest_with_index(spark, str(src), **kwargs)
    assert stats[0]["lm_unfamiliar"] == 1
    kept = TxnKeyedTable(spark, kwargs["kept_path"], ["dg"]).read()
    flags = {
        r.doc_id: r.unfamiliar
        for r in kept.filter(F.col("doc_id") >= 100).collect()
    }
    assert flags == {100: False, 101: True}  # flagged, NOT dropped

    # replay convergence: wipe the checkpoint, re-deliver everything
    import shutil

    shutil.rmtree(kwargs["checkpoint_dir"])
    before = kept.count()
    stats = ingest_with_index(spark, str(src), **kwargs)
    assert all(s["kept"] == 0 for s in stats)  # every doc drop_exact
    assert TxnKeyedTable(spark, kwargs["kept_path"], ["dg"]).read().count() == before


def test_ingest_lm_flag_respects_language_means(spark, tmp_path):
    """The r9 verdict's streaming-vs-batch gap, closed on the INGEST
    path: a minority-language batch whose bigrams are globally rare
    but internally ordinary must not be flagged unfamiliar by the
    stored LM screen — the flag compares against the doc's OWN
    language's stored mean. Planted: batch 1 trains a large 'en'
    corpus plus a small internally-consistent 'xx' corpus; batch 2
    delivers one new doc of each language plus one true gibberish doc."""
    import random

    from finance_pipeline_spark.pipelines.corpus_ingest import ingest_with_index
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable
    from tests.conftest import random_doc

    def _write_lang_docs(path, rows):
        pd.DataFrame(
            {
                "doc_id": [r[0] for r in rows],
                "text": [r[2] for r in rows],
                "lang": [r[1] for r in rows],
                "source": ["crawl"] * len(rows),
                "n_chars": [len(r[2]) for r in rows],
            }
        ).to_parquet(path)

    rng = random.Random(67)
    # a SMALL minority vocabulary (8 words -> 64 bigram types): three
    # training docs cover most types, so a NEW xx doc scores near the
    # xx mean — the test isolates the mean's grouping, not sparsity
    xx_words = [f"xw{j}" for j in range(8)]
    xx_doc = lambda: " ".join(rng.choice(xx_words) for _ in range(40))  # noqa: E731
    src = tmp_path / "incoming"
    src.mkdir()
    kwargs = dict(
        index_root=str(tmp_path / "index"),
        kept_path=str(tmp_path / "kept"),
        checkpoint_dir=str(tmp_path / "ckpt"),
        lm_root=str(tmp_path / "lm"),
        max_files_per_trigger=1,
    )
    _write_lang_docs(
        src / "f1.parquet",
        [(i, "en", random_doc(rng, 60)) for i in range(60)]
        + [(100 + i, "xx", xx_doc()) for i in range(3)],
    )
    ingest_with_index(spark, str(src), **kwargs)

    _write_lang_docs(
        src / "f2.parquet",
        [
            (200, "en", random_doc(rng, 40)),  # majority-language prose
            (201, "xx", xx_doc()),  # minority language, ordinary for it
            (202, "xx", " ".join(f"qz{i}v" for i in range(25))),  # gibberish
        ],
    )
    stats = ingest_with_index(spark, str(src), **kwargs)
    assert stats[0]["lm_unfamiliar"] == 1  # ONLY the gibberish
    kept = TxnKeyedTable(spark, kwargs["kept_path"], ["dg"]).read()
    flags = {
        r.doc_id: r.unfamiliar
        for r in kept.filter(F.col("doc_id") >= 200).collect()
    }
    assert flags == {200: False, 201: False, 202: True}
