"""Shard-export sink: partition completeness, deterministic re-export,
and manifest-based corruption detection."""

from __future__ import annotations

import json
from pathlib import Path

from finance_pipeline_spark.sinks.shard_writer import (
    verify_training_shards,
    write_training_shards,
)


def _docs(spark, n=200):
    from pyspark.sql import functions as F

    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text-"), F.col("id")).alias("text"),
        (F.col("id") % 7).cast("double").alias("score"),
        # a null-bearing column: digest must distinguish null from ''
        F.when(F.col("id") % 11 == 0, None).otherwise(F.lit("en")).alias("lang"),
    )


def test_export_partitions_completely_and_verifies(spark, tmp_path):
    out = str(tmp_path / "shards")
    manifest = write_training_shards(_docs(spark), out, n_shards=8, key_col="doc_id")
    assert manifest["n_rows"] == 200
    assert sum(s["n_rows"] for s in manifest["shards"]) == 200
    # every row readable back, exactly once
    back = spark.read.parquet(f"{out}/data")
    assert back.count() == 200
    assert back.select("doc_id").distinct().count() == 200
    assert verify_training_shards(spark, out) == []


def test_reexport_is_deterministic(spark, tmp_path):
    a = write_training_shards(_docs(spark), str(tmp_path / "a"), 8, "doc_id")
    b = write_training_shards(_docs(spark), str(tmp_path / "b"), 8, "doc_id")
    assert a == b  # same keys → same shards, same digests


def test_verify_catches_lost_and_tampered_shards(spark, tmp_path):
    out = str(tmp_path / "shards")
    write_training_shards(_docs(spark), out, n_shards=4, key_col="doc_id")
    # tamper: drop one whole shard directory
    victim = next(Path(f"{out}/data").glob("shard=*"))
    import shutil

    shutil.rmtree(victim)
    problems = verify_training_shards(spark, out)
    assert problems and "missing from data" in problems[0]


def test_verify_catches_count_preserving_corruption(spark, tmp_path):
    """Same row count, different content — the digest must flag it."""
    out = str(tmp_path / "shards")
    write_training_shards(_docs(spark), out, n_shards=2, key_col="doc_id")
    man = json.loads((Path(out) / "manifest.json").read_text())
    man["shards"][0]["digest"] = str(int(man["shards"][0]["digest"]) + 1)
    (Path(out) / "manifest.json").write_text(json.dumps(man))
    problems = verify_training_shards(spark, out)
    assert len(problems) == 1 and "shard" in problems[0]


def test_jsonl_shards_roundtrip_and_verify(spark, tmp_path):
    """JSONL export: same md5-mod assignment as the parquet exporter,
    manifest-recorded schema re-reads type-faithfully, verify is clean
    on intact data and flags a deleted shard."""
    import shutil
    from pathlib import Path

    from finance_pipeline_spark.sinks.shard_writer import (
        verify_jsonl_shards,
        write_jsonl_shards,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}", float(i) / 3) for i in range(200)],
        "doc_id bigint, text string, score double",
    )
    out = str(tmp_path / "jsonl")
    manifest = write_jsonl_shards(df, out, n_shards=4, key_col="doc_id")
    assert manifest["n_rows"] == 200
    assert manifest["format"] == "jsonl.gz"
    assert len(manifest["shards"]) == 4

    # files really are gzip jsonl
    files = list(Path(out).glob("data/shard=*/*.json.gz"))
    assert files

    # type-faithful roundtrip: same rows, same types
    back = spark.read.schema(manifest["schema_ddl"]).json(f"{out}/data")
    assert back.count() == 200
    assert dict(back.dtypes)["score"] == "double"

    assert verify_jsonl_shards(spark, out) == []
    shutil.rmtree(sorted(Path(out).glob("data/shard=*"))[0])
    problems = verify_jsonl_shards(spark, out)
    assert problems and "missing" in problems[0]


def test_jsonl_timestamps_roundtrip_microseconds(spark, tmp_path):
    """Sub-millisecond timestamps must survive the JSON round trip —
    the writer pins a microsecond timestampFormat, so verification of
    an intact export stays clean (the default millis format truncated
    and flagged false corruption)."""
    import datetime as dt

    from finance_pipeline_spark.sinks.shard_writer import (
        verify_jsonl_shards,
        write_jsonl_shards,
    )

    rows = [
        (i, dt.datetime(2026, 3, 1, 12, 0, 0, 123456 + i)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, ts timestamp")
    out = str(tmp_path / "ts")
    write_jsonl_shards(df, out, n_shards=2, key_col="doc_id")
    assert verify_jsonl_shards(spark, out) == []


def test_export_rejects_existing_shard_column(spark, tmp_path):
    import pytest as _pytest

    from finance_pipeline_spark.sinks.shard_writer import (
        write_jsonl_shards,
        write_training_shards,
    )

    df = spark.createDataFrame([(1, 0)], "doc_id bigint, shard bigint")
    for writer in (write_training_shards, write_jsonl_shards):
        with _pytest.raises(ValueError, match="shard"):
            writer(df, str(tmp_path / "x"), 2, "doc_id")
