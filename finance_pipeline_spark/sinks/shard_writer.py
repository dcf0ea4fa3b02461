"""Training-shard export sink — the trainer-facing output edge of the
LLM-data tier: deterministic sharding of a prepared table (e.g. the
packed sequences from ``text_pack_sequences``) into per-shard parquet
directories plus a driver-side integrity manifest.

Why a manifest: a trainer consuming exported shards needs to know,
before a multi-day run starts, that (a) every shard landed, (b) no
shard was truncated or tampered with, and (c) a re-export produced
byte-identical content. Counts alone miss silent row corruption, so
each shard also carries an ORDER-INSENSITIVE content digest: the sum
of per-row md5-derived integers. Summation commutes, so the digest is
stable under Spark's nondeterministic row order within a shard, and
it is recomputable from the data alone — ``verify_training_shards``
re-derives every entry and diffs against the manifest.

Scale shape: shard assignment is a pure md5-mod column (no shuffle
beyond the one ``repartition`` that co-locates each shard's rows);
the stats aggregation is a map-side-combinable groupBy over n_shards
groups; the only driver materialization is the n_shards-row manifest.
Nothing here is proportional to corpus size on the driver.

Parity note: the reference's export edge is a CSV dump with no
integrity story (etl/csv_loader.py write paths); this generalizes it
to the sharded, verifiable layout a 100 TB corpus actually needs.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_JSON_TS_FORMAT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"  # microsecond-exact round trip;
# Spark timestamps are us precision, the JSON writer default (millis) is not
_NULL_SENTINEL = "\x00null"  # concat_ws drops nulls; make them explicit
_SEP = "\x1f"  # unit separator — cannot appear in the md5 hex digits


def _row_digest(cols: list[str]) -> Column:
    """Per-row digest as a 15-hex-digit (60-bit) integer in
    decimal(20,0): small enough that a decimal(38,0) SUM holds ~10^18
    rows without overflow, wide enough that collisions don't mask
    corruption. Columns enter in sorted-name order so the digest is a
    function of content, not projection order."""
    parts = [
        F.coalesce(F.col(c).cast("string"), F.lit(_NULL_SENTINEL))
        for c in sorted(cols)
    ]
    return F.conv(F.substring(F.md5(F.concat_ws(_SEP, *parts)), 1, 15), 16, 10).cast(
        "decimal(20,0)"
    )


def _shard_stats(df: DataFrame, data_cols: list[str]) -> list[dict]:
    rows = (
        df.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(_row_digest(data_cols)).cast("decimal(38,0)").alias("digest"),
        )
        .collect()
    )
    return sorted(
        (
            {"shard": int(r["shard"]), "n_rows": int(r["n_rows"]),
             "digest": str(r["digest"])}
            for r in rows
        ),
        key=lambda d: d["shard"],
    )


def _with_shard(df: DataFrame, n_shards: int, key_col: str) -> DataFrame:
    """md5-mod shard assignment with the shared argument contract:
    deterministic and engine-portable (same key -> same shard on every
    export). Raises rather than silently overwriting a user column
    named ``shard`` — losing a data column AND breaking verification's
    column diff is the failure mode the check prevents."""
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    if key_col not in df.columns:
        raise ValueError(f"key_col {key_col!r} not in {df.columns}")
    if "shard" in df.columns:
        raise ValueError(
            "input already has a 'shard' column — rename it before export"
        )
    shard = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 6), 16, 10)
        .cast("bigint")
        % n_shards
    )
    return df.withColumn("shard", shard)


def _write_manifest(out_dir: str, manifest: dict) -> None:
    out = Path(out_dir) / "manifest.json"
    tmp = out.with_suffix(".json.tmp")
    tmp.write_text(json.dumps(manifest, indent=1))
    tmp.replace(out)  # atomic: readers never see a half-written manifest


def _diff_manifest(df: DataFrame, manifest: dict) -> list[str]:
    """Shared verify core: recompute per-shard counts + digests from a
    re-read frame and diff against the manifest."""
    data_cols = [c for c in df.columns if c != "shard"]
    problems: list[str] = []
    if sorted(data_cols) != manifest["columns"]:
        problems.append(
            f"columns drifted: manifest {manifest['columns']} vs data {sorted(data_cols)}"
        )
        return problems
    actual = {s["shard"]: s for s in _shard_stats(df, data_cols)}
    for want in manifest["shards"]:
        got = actual.pop(want["shard"], None)
        if got is None:
            problems.append(f"shard {want['shard']}: missing from data")
        elif got != want:
            problems.append(f"shard {want['shard']}: manifest {want} vs data {got}")
    for extra in sorted(actual):
        problems.append(f"shard {extra}: present in data but not in manifest")
    return problems


def write_training_shards(
    df: DataFrame, out_dir: str, n_shards: int, key_col: str
) -> dict:
    """Export ``df`` as ``out_dir/data/shard=K/*.parquet`` for K in
    [0, n_shards) plus ``out_dir/manifest.json``. Shard assignment is
    ``md5(key) mod n_shards`` — deterministic and engine-portable, so
    the same key lands in the same shard on every export (stable
    resume points for a trainer). Returns the manifest dict."""
    data_cols = df.columns
    with_shard = _with_shard(df, n_shards, key_col)
    (
        with_shard.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(f"{out_dir}/data")
    )
    manifest = {
        "n_shards": n_shards,
        "key_col": key_col,
        "columns": sorted(data_cols),
        "shards": _shard_stats(with_shard, data_cols),
    }
    manifest["n_rows"] = sum(s["n_rows"] for s in manifest["shards"])
    _write_manifest(out_dir, manifest)
    return manifest


def verify_training_shards(spark: SparkSession, out_dir: str) -> list[str]:
    """Recompute every shard's row count and content digest from the
    exported data and diff against the manifest. Returns a list of
    human-readable mismatch strings — empty means the export is intact.
    Runs as one distributed aggregation; nothing corpus-sized touches
    the driver."""
    manifest = json.loads((Path(out_dir) / "manifest.json").read_text())
    return _diff_manifest(spark.read.parquet(f"{out_dir}/data"), manifest)


def write_jsonl_shards(
    df: DataFrame, out_dir: str, n_shards: int, key_col: str
) -> dict:
    """Export ``df`` as gzip JSONL shards — the interchange format LLM
    training stacks actually consume — with the SAME md5-mod shard
    assignment and integrity manifest as the parquet exporter: layout
    ``out_dir/data/shard=K/*.json.gz`` + ``out_dir/manifest.json``.
    The manifest additionally records the schema (DDL string) so
    ``verify_jsonl_shards`` can re-read the text files type-faithfully
    (bare ``read.json`` would re-infer and drift on empty/all-null
    columns). One exchange (repartition by shard) → gzip text write;
    compression is per-file, so shards stay splittable at the file
    granularity the shard count sets. Timestamps are written with an
    explicit MICROSECOND format — Spark's JSON default is millisecond
    precision, which would silently truncate sub-ms values and make
    verification flag an intact export as corrupted."""
    data_cols = df.columns
    with_shard = _with_shard(df, n_shards, key_col)
    (
        with_shard.repartition(n_shards, F.col("shard"))
        .write.mode("overwrite")
        .partitionBy("shard")
        .option("compression", "gzip")
        .option("timestampFormat", _JSON_TS_FORMAT)
        .json(f"{out_dir}/data")
    )
    manifest = {
        "format": "jsonl.gz",
        "n_shards": n_shards,
        "key_col": key_col,
        "columns": sorted(data_cols),
        "schema_ddl": ", ".join(
            f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
        ),
        "timestamp_format": _JSON_TS_FORMAT,
        "shards": _shard_stats(with_shard, data_cols),
    }
    manifest["n_rows"] = sum(s["n_rows"] for s in manifest["shards"])
    _write_manifest(out_dir, manifest)
    return manifest


def verify_jsonl_shards(spark: SparkSession, out_dir: str) -> list[str]:
    """JSONL twin of ``verify_training_shards``: re-read the gzip text
    shards with the manifest's recorded schema and diff per-shard row
    counts + content digests. Empty list = intact."""
    manifest = json.loads((Path(out_dir) / "manifest.json").read_text())
    df = (
        spark.read.schema(manifest["schema_ddl"])
        .option(
            "timestampFormat",
            manifest.get("timestamp_format", _JSON_TS_FORMAT),
        )
        .json(f"{out_dir}/data")
    )
    return _diff_manifest(df, manifest)
