"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All real implementations live in ``finance_pipeline_spark`` — this
module only adapts the registry to the driver's interface.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from finance_pipeline_spark import registry  # noqa: E402

registry.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the pricing-summary aggregate (filter → 2-key
    groupBy → 8 aggregates), the canonical shape of the engine.
    """
    return registry.QUERIES["agg_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, in curated
    ``registry.PRIORITY`` order: the driver evaluates the first 50, so
    every operator family keeps a representative inside that window and
    positions 51+ hold only r1/r2-proven shape-duplicates."""
    return {name: spec.fn for name, spec in registry.ordered_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    return {
        name: spec.oracle_text()
        for name, spec in registry.ordered_queries().items()
        if spec.oracle is not None
    }
