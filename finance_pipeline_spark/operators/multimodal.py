"""Multimodal column plumbing — image/audio/video as opaque ``binary``
columns with typed metadata, decoded/feature-extracted via Arrow-batched
``mapInPandas``.

The container has no image/audio codecs, so the decode kernels are
deterministic stubs (clearly marked) — but the Spark-side plumbing is
real and tested: binary payload synthesis, schema contracts, Arrow batch
shapes, partition-parallel UDF execution, frame-sampling explode. On a
real cluster you swap ``_fake_decode_image`` for Pillow/ffmpeg calls and
nothing else changes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from finance_pipeline_spark.registry import load, query


def with_binary_payload(df: DataFrame) -> DataFrame:
    """Synthesize an opaque binary column + typed metadata from document
    text — the stand-in for reading real image/audio bytes. At 100 TB
    the payload column lives in its own parquet column chunk; metadata
    queries never touch it (column pruning)."""
    return df.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("payload"),
        F.struct(
            F.lit("image/fake").alias("mime"),
            F.octet_length(F.encode("text", "UTF-8")).alias("n_bytes"),
            (F.crc32(F.encode("text", "UTF-8")) % 1920).cast("int").alias("width_hint"),
        ).alias("meta"),
    )


@query(
    "mm_binary_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           sha256(text) AS digest
    FROM documents
    """,
    tags=("multimodal",),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column metadata scan: payload size + content digest —
    pure JVM expressions over the binary column, no decode."""
    d = load(spark, sf_dir, "documents")
    payload = F.encode("text", "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).cast("bigint").alias("n_bytes"),
        F.sha2(payload, 256).alias("digest"),
    )


_DECODE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("mean_intensity", T.DoubleType()),
    ]
)


def _fake_decode_image(payload: bytes) -> tuple[int, int, float]:
    """STUB decode — deterministic fake standing in for a real codec
    (Pillow/libjpeg not in this container). Derives (width, height,
    mean byte intensity) from the raw bytes. Swap this function for the
    real decoder; the Spark plumbing is unchanged."""
    n = len(payload)
    width = 64 + (n % 191)
    height = 64 + ((n * 31) % 127)
    mean_intensity = (sum(payload[:256]) / max(min(n, 256), 1)) if n else 0.0
    return width, height, mean_intensity


def decode_image_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: Arrow batches in, decoded metadata out.
    Executes partition-parallel; per-batch vectorized at the pandas
    level, which is where a real codec loop would run."""
    for pdf in it:
        decoded = [_fake_decode_image(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "width": [d[0] for d in decoded],
                "height": [d[1] for d in decoded],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "mean_intensity": [d[2] for d in decoded],
            }
        )


@query(
    "mm_decode_features",
    # The stub codec is pure arithmetic over the payload bytes, so it
    # replicates exactly in SQL: byte values come from hex() pairs of
    # the UTF-8 blob (no float divergence — the mean divides two exact
    # small integers, bit-identical IEEE division on both engines).
    oracle="""
    WITH b AS (
        SELECT doc_id,
               octet_length(encode(text)) AS n,
               hex(encode(text)) AS h
        FROM documents
    )
    SELECT doc_id,
           CAST(64 + (n % 191) AS INTEGER) AS width,
           CAST(64 + ((n * 31) % 127) AS INTEGER) AS height,
           CAST(n AS BIGINT) AS n_bytes,
           CASE WHEN n = 0 THEN 0.0 ELSE
             CAST(list_sum([('0x' || substr(h, 2*i-1, 2))::INT
                            FOR i IN range(1, least(n, 256) + 1)]) AS DOUBLE)
             / least(n, 256)
           END AS mean_intensity
    FROM b
    """,
    tags=("multimodal", "udf"),
)
def mm_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode/feature-extract over binary payloads via Arrow-batched
    ``mapInPandas`` — the pattern for any codec-bound multimodal work:
    JVM handles scan/shuffle, Python sees whole Arrow batches."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    return d.select("doc_id", "payload").mapInPandas(
        decode_image_batches, schema=_DECODE_SCHEMA
    )


@query(
    "mm_frame_sample",
    oracle="""
    SELECT d.doc_id, f.frame_no,
           CAST(least(64, octet_length(encode(d.text)) - f.frame_no * 64) AS BIGINT)
             AS frame_bytes
    FROM documents d,
    LATERAL (
        SELECT CAST(unnest(range(0, CAST(ceil(octet_length(encode(d.text)) / 64.0) AS BIGINT))) AS INTEGER)
          AS frame_no
    ) f
    """,
    tags=("multimodal",),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: treat the payload as a fixed-stride frame
    container and explode one row per 64-byte frame — the shuffle-free
    generator pattern for video→frame fan-out (explode pipelines inside
    the scan stage)."""
    d = with_binary_payload(load(spark, sf_dir, "documents"))
    n_frames = F.ceil(F.col("meta.n_bytes") / F.lit(64.0)).cast("bigint")
    # Guard the explode: for an empty payload n_frames = 0 and
    # sequence(0, -1) would auto-step *descending*, emitting bogus
    # negative frame numbers — emit no frames instead (= oracle's
    # range(0, 0)).
    frame_nos = F.when(
        n_frames > 0, F.sequence(F.lit(0), (n_frames - 1).cast("int"))
    ).otherwise(F.array().cast("array<int>"))
    frames = d.select(
        "doc_id",
        "payload",
        F.explode(frame_nos).alias("frame_no"),
    )
    frame = F.expr("substring(payload, 1 + frame_no * 64, 64)")
    return frames.select(
        "doc_id",
        "frame_no",
        F.octet_length(frame).cast("bigint").alias("frame_bytes"),
    )
