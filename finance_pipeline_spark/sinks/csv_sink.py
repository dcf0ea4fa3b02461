"""CSV sinks (SURVEY.md §2.2 K1-K3).

Spark CSV output is a directory of part files — the cluster-native
shape (a single file would serialize the write through one task). The
merge sink (K3) re-expresses the reference's read-concat-dedup-
overwrite (etl/web_scraper.py:111-126) as unionByName + keyed dedup,
staged to a temp dir first because Spark cannot overwrite a path it
is lazily reading.
"""

from __future__ import annotations

import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.sources.csv_source import read_csv

log = get_logger(__name__)


def write_overwrite(df: DataFrame, path: str) -> None:
    """K1 (etl/csv_loader.py:60-63): windowed extract → fresh CSV."""
    df.write.mode("overwrite").option("header", True).csv(path)


def write_append(df: DataFrame, path: str) -> None:
    """K2 (etl/api_fetcher.py:100-119): append-or-create. Parquet-side
    header bookkeeping disappears — every part file carries a header
    and readers reassemble via the schema, so the exists/first-write
    branch of the reference collapses."""
    df.write.mode("append").option("header", True).csv(path)


def write_merge_dedup(
    spark: SparkSession,
    df: DataFrame,
    path: str,
    keys: list[str],
    schema: T.StructType,
) -> None:
    """K3 (etl/web_scraper.py:111-126): existing ∪ incoming, one row
    per key, overwrite — with the reference's *existing-wins* survivor
    (pandas concat + drop_duplicates keeps the first occurrence, i.e.
    the existing row; a bare dropDuplicates here would pick an
    arbitrary one). Staged write → swap, since the source of the union
    is the target path."""
    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    cols = schema.fieldNames()
    target = Path(path)
    if target.exists():
        existing = read_csv(spark, path, schema).withColumn("_prio", F.lit(0))
        incoming = df.select(*cols).withColumn("_prio", F.lit(1))
        w = W.partitionBy(*keys).orderBy("_prio")
        combined = (
            existing.unionByName(incoming)
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(*cols)
        )
    else:
        combined = df.select(*cols).dropDuplicates(keys)
    tmp = str(target) + ".__staging__"
    combined.write.mode("overwrite").option("header", True).csv(tmp)
    if target.exists():
        shutil.rmtree(target)
    Path(tmp).rename(target)
    log.info("merged CSV written to %s", path)
