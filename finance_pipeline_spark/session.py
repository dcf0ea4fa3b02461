"""SparkSession factory.

One session config for the whole engine. Critical settings:

- ``spark.sql.session.timeZone=UTC`` — timestamp parity with the
  reference's tz-aware ISO strings (see /root/reference/etl/csv_loader.py:105-108)
  and with the DuckDB oracle (naive-UTC timestamps).
- AQE on (coalesce + skew join) — runtime re-planning is the 100 TB
  answer to skewed currency/order keys.
- ``spark.sql.shuffle.partitions`` sized to cores for local mode; on a
  real cluster this would be ~2-3× total executor cores (or left to AQE
  with a high initial value).
- Arrow enabled — every pandas_udf / mapInPandas exchange is Arrow-batched.
- ANSI off — ``to_date``/casts null on failure, matching the reference's
  ``errors="coerce"`` semantics (etl/csv_loader.py:52).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_session(app_name: str = "finance_pipeline_spark") -> SparkSession:
    cpus = cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.ansi.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    # Ship the package zip to executor Python workers unconditionally:
    # any session can hit a mapInPandas/foreachPartition closure that
    # imports this package (the corpus CLI does before any registry
    # load), and a CLI invoked from outside the repo root has no cwd
    # fallback — r8 fix for `main.py corpus` failing anywhere but ./.
    from finance_pipeline_spark.registry import ship_package

    ship_package(spark)
    return spark
