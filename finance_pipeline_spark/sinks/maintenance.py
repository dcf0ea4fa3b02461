"""Table maintenance — compaction and z-order clustering, the two
jobs that keep a 100 TB parquet lake queryable over time.

**Small-file compaction.** Streaming micro-batches and frequent keyed
merges each append a few small files; after months a table holds
millions of them, and scan cost becomes per-file overhead (footer
reads, task scheduling) instead of data. ``compact`` rewrites the
dataset into ~``target_mb``-sized files: total bytes come from the
parquet FOOTERS (pure metadata, no data scan), the rewrite is one
``repartition(n)`` job, and the swap is staged so readers never see a
half-compacted directory.

**Z-order clustering.** Parquet scans prune ROW GROUPS by min/max
statistics, but stats only help if values are clustered: a file whose
``user_id`` spans the whole domain prunes nothing. Sorting by one
column clusters that column only; interleaving the BITS of two keys
(the Morton / z-order curve — public technique, used by Delta
``OPTIMIZE ZORDER BY`` and Databricks' liquid clustering) gives every
interleaved column locality at once, so filters on EITHER key skip
most files. ``zorder_write`` computes the z-value with pure JVM
bit-arithmetic (shiftleft/or — whole-stage codegen, no UDF),
range-partitions on it, and sorts within partitions; the effect is
asserted in tests by reading the FOOTER min/max spans per file —
narrower spans = real pruning power, not prose.
"""

from __future__ import annotations

import shutil
import uuid
from pathlib import Path

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_Z_BITS = 16  # bits interleaved per column; 2 cols → 32-bit z-value


def dataset_bytes(path: str) -> int:
    """Total data size from file sizes on disk — the statistic that
    drives the compaction plan. (Object stores expose the same number
    from a LIST call; no footer or data read needed.)"""
    return sum(p.stat().st_size for p in Path(path).glob("*.parquet"))


def file_count(path: str) -> int:
    return len(list(Path(path).glob("*.parquet")))


def compact(
    spark: SparkSession, path: str, target_mb: int = 128
) -> tuple[int, int]:
    """Rewrite the dataset at ``path`` into ceil(bytes/target) files.
    Returns (files_before, files_after). Staged rewrite: the new
    files land in a sibling temp dir and replace the old ones only
    after the job succeeds, so a crashed compaction leaves the
    original table intact."""
    before = file_count(path)
    n_out = max(1, -(-dataset_bytes(path) // (target_mb * 1024 * 1024)))
    df = spark.read.parquet(path)
    staging = str(Path(path).parent / f"_compact_{uuid.uuid4().hex}")
    df.repartition(n_out).write.mode("overwrite").parquet(staging)
    for old in Path(path).glob("*.parquet"):
        old.unlink()
    for part in Path(staging).glob("*.parquet"):
        part.rename(Path(path) / part.name)
    shutil.rmtree(staging, ignore_errors=True)
    return before, file_count(path)


def z_value(col_a: Column, col_b: Column, bits: int = _Z_BITS) -> Column:
    """Morton interleave of two non-negative integer columns, low
    ``bits`` of each — pure JVM shift/or chain inside codegen."""
    z = F.lit(0).cast("bigint")
    a = col_a.cast("bigint")
    b = col_b.cast("bigint")
    for i in range(bits):
        bit_a = F.shiftright(a, i).bitwiseAND(F.lit(1))
        bit_b = F.shiftright(b, i).bitwiseAND(F.lit(1))
        z = z.bitwiseOR(F.shiftleft(bit_a, 2 * i)).bitwiseOR(
            F.shiftleft(bit_b, 2 * i + 1)
        )
    return z


def zorder_write(
    df: DataFrame, path: str, cols: tuple[str, str], n_files: int = 8
) -> None:
    """Write ``df`` clustered on the z-order curve over two integer
    columns: range-partition by z-value (files own contiguous curve
    segments) and sort within partitions (row groups inside each file
    are clustered too). Filters on EITHER column then prune most
    files by footer min/max."""
    z = z_value(F.col(cols[0]), F.col(cols[1])).alias("_z")
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def footer_spans(path: str, col: str) -> list[tuple]:
    """Per-file (min, max) of ``col`` straight from the parquet
    footers — the statistics a scan's row-group pruning consults.
    The honest observable for clustering quality: narrower spans ⇒
    more files skipped by a point/range predicate."""
    import pyarrow.parquet as pq

    spans = []
    for p in sorted(Path(path).glob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        idx = {md.schema.column(i).name: i for i in range(md.num_columns)}[col]
        mins, maxs = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is not None and st.has_min_max:
                mins.append(st.min)
                maxs.append(st.max)
        if mins:
            spans.append((min(mins), max(maxs)))
    return spans


def files_prunable(spans: list[tuple], point) -> int:
    """How many files a ``col = point`` predicate can SKIP given their
    footer spans."""
    return sum(1 for lo, hi in spans if not (lo <= point <= hi))
