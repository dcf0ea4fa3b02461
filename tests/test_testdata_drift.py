"""Testdata schema drift guard (round-4 postmortem).

The driver regenerated events.parquet between rounds 3 and 4, changing
``ts`` from int64-nanoseconds to ``timestamp[us]`` — and three code
sites that hard-coded the nanos assumption silently produced 1970-era
windows or crashed. These tests fail LOUDLY, naming the observed
physical type, the moment a third encoding appears, and pin the
normalization contract: every consumer sees ``ts: timestamp``.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow.parquet as pq
import pytest

from finance_pipeline_spark.registry import load

KNOWN_TS_ENCODINGS = ("int64", "timestamp[us]", "timestamp[us, tz=UTC]")


def _sf_dirs() -> list[str]:
    root = Path("/root/testdata")
    return sorted(str(p) for p in root.glob("sf*") if (p / "events.parquet").exists())


@pytest.mark.parametrize("d", _sf_dirs())
def test_events_ts_physical_encoding_is_known(d):
    t = str(pq.read_schema(f"{d}/events.parquet").field("ts").type)
    assert t in KNOWN_TS_ENCODINGS, (
        f"{d}/events.parquet ts is {t!r} — testdata drifted to a third "
        "encoding; update registry.load() and "
        "streaming_batch._events_stream_source"
    )


def test_load_normalizes_events_ts_to_timestamp(spark, sf_dir):
    df = load(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_load_normalized_ts_in_plausible_era(spark, sf_dir):
    # The 1000x µs-as-ns mis-conversion lands everything in January
    # 1970; any correct interpretation of the synthetic data is
    # post-2000. One cheap aggregate catches the whole failure class.
    row = load(spark, sf_dir, "events").selectExpr(
        "min(year(ts)) AS lo", "max(year(ts)) AS hi"
    ).collect()[0]
    assert row.lo >= 2000, f"events.ts decoded into {row.lo} — unit drift"
    assert row.hi <= 2100, f"events.ts decoded into {row.hi} — unit drift"


def test_events_value_within_decimal18_bounds(spark):
    """anomaly_zscore_flags squares value as decimal(18,6) — exact up
    to |value| < 10^12, beyond which Spark's non-ANSI cast NULLs
    (silently understating the moments) while DuckDB errors. Guard the
    assumption so a testdata regeneration with huge values fails HERE
    with a pointer, not as an asymmetric oracle mismatch."""
    from pyspark.sql import functions as F

    from finance_pipeline_spark.registry import load

    mx = (
        load(spark, "/root/testdata/sf0.01", "events")
        .agg(F.max(F.abs("value")).alias("m"))
        .collect()[0]
        .m
    )
    assert mx < 1e10, (
        f"events.value reaches {mx}: approaching decimal(18,6)'s 1e12 "
        "bound — widen the squared-moment operand in "
        "operators/warehouse.py::anomaly_zscore_flags (and its oracle) "
        "before values overflow"
    )
