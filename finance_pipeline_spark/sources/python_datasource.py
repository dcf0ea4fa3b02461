"""Custom Python Data Source (SURVEY.md §2.9) — the Spark 4
``DataSource`` API form of the REST connector: after
``spark.dataSource.register(FrankfurterRatesDataSource)``, a
Frankfurter-shaped JSON payload file reads as

    spark.read.format("frankfurter_rates").load(path)

with the map→rows flatten and CET→UTC stamping happening inside the
reader. Versus the driver-side ``rest_source`` path, this makes the
connector a first-class scan: schema declared to Catalyst, partition-
able (one partition per payload file → a backfill over thousands of
daily payload files fans out across executors), and usable from pure
SQL via ``CREATE TABLE ... USING frankfurter_rates``.
"""

from __future__ import annotations

import json
from datetime import date, datetime, timedelta, timezone
from pathlib import Path

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


def _cet_16h_to_utc(date_str: str) -> datetime:
    """16:00 on the quote date in CET-zone wall time → naive-UTC.
    Mirrors rest_source's to_utc_timestamp(.., 'CET'): CET observes
    DST (CEST, UTC+2) from the last Sunday of March to the last
    Sunday of October."""
    d = date.fromisoformat(date_str)

    def last_sunday(year: int, month: int) -> date:
        day = date(year, month + 1, 1) - timedelta(days=1) if month < 12 else date(year, 12, 31)
        return day - timedelta(days=(day.weekday() + 1) % 7)

    dst = last_sunday(d.year, 3) <= d < last_sunday(d.year, 10)
    offset = 2 if dst else 1
    return datetime(d.year, d.month, d.day, 16, 0, tzinfo=timezone.utc) - timedelta(
        hours=offset
    )


class _PayloadPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class FrankfurterRatesReader(DataSourceReader):
    def __init__(self, options: dict):
        self.path = options.get("path")
        self.base = options.get("base", "EUR")

    def partitions(self):
        p = Path(self.path)
        files = sorted(p.glob("*.json")) if p.is_dir() else [p]
        # One partition per payload file: a multi-file backfill scans
        # partition-parallel with no extra plumbing.
        return [_PayloadPartition(str(f)) for f in files]

    def read(self, partition: _PayloadPartition):
        yield from _payload_rows(Path(partition.path), self.base)


def _payload_rows(path: Path, base: str):
    payload = json.loads(path.read_text())
    ts = _cet_16h_to_utc(payload["date"]).replace(tzinfo=None)
    d = date.fromisoformat(payload["date"])
    for currency, rate in payload["rates"].items():
        yield (currency, base, float(rate), d, ts)


class FrankfurterRatesStreamReader(SimpleDataSourceStreamReader):
    """Streaming form of the connector (Spark 4
    ``SimpleDataSourceStreamReader``): the payload directory is an
    append-only feed; the committed offset is an index into the
    filename-sorted file list, so each microbatch reads exactly the
    files that arrived since the last checkpointed offset — a daily
    REST poller becomes `readStream.format("frankfurter_rates")` with
    exactly-once file accounting for free from the checkpoint.

    The committed offset is the NAME of the last processed file, not a
    position: a count-index would shift when a file is backfilled with
    an earlier-sorting name, re-emitting the previous tail file as
    duplicates. With name offsets the feed contract is explicit —
    files must arrive in ascending name order (true for date-named
    API payloads); a file backfilled BEHIND the committed name is
    skipped, never double-read.

    The Simple reader variant runs on the driver — right for this
    source (payloads are KB-sized API responses; the offset math, not
    the byte volume, is the point). A firehose-scale source would
    implement the partitioned ``DataSourceStreamReader`` instead, the
    same upgrade path the batch reader already demonstrates with one
    partition per payload file."""

    def __init__(self, options: dict):
        self.path = options.get("path")
        self.base = options.get("base", "EUR")
        # Offset-planning guard: read() materializes payload rows
        # driver-side, so one call consumes at most this many files —
        # a feed directory that grew large before the first drain
        # becomes several bounded microbatches (the name-ordered
        # offset makes the batching free) instead of one giant list.
        self.max_files = int(options.get("maxFilesPerRead", 64))

    def _files(self):
        p = Path(self.path)
        return sorted(p.glob("*.json")) if p.is_dir() else [p]

    def initialOffset(self) -> dict:
        return {"last": ""}

    def read(self, start: dict):
        """Consume up to ``maxFilesPerRead`` new files in name order.
        A file that fails to parse (half-written JSON mid-upload, or a
        payload missing its fields) STOPS the batch at the last good
        file instead of failing the whole microbatch: the offset never
        advances past it, so the next trigger retries it — by then the
        upload has usually completed. Files behind it wait too,
        preserving the ascending-name feed contract. A permanently
        corrupt file therefore stalls the feed loudly (warning each
        trigger) rather than being silently dropped."""
        new = [f for f in self._files() if f.name > start["last"]]
        new = new[: self.max_files]
        rows: list = []
        last = start["last"]
        for f in new:
            try:
                rows.extend(_payload_rows(f, self.base))
            except (ValueError, KeyError, OSError) as exc:
                import warnings

                warnings.warn(
                    f"frankfurter_rates: payload {f.name} unreadable "
                    f"({type(exc).__name__}: {exc}); batch stops before it "
                    "and the next trigger retries",
                    stacklevel=2,
                )
                break
            last = f.name
        return iter(rows), {"last": last}

    def readBetweenOffsets(self, start: dict, end: dict):
        files = [
            f
            for f in self._files()
            if start["last"] < f.name <= end["last"]
        ]
        return iter([r for f in files for r in _payload_rows(f, self.base)])


def register(spark) -> None:
    """Register the format with the session. Ships the package to
    executor Python workers first — the reader instances deserialize
    there and must import this module."""
    from finance_pipeline_spark.registry import ship_package

    ship_package(spark)
    spark.dataSource.register(FrankfurterRatesDataSource)


class FrankfurterRatesDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "frankfurter_rates"

    def schema(self) -> str:
        return (
            "currency string, base_currency string, exchange_rate double, "
            "date date, timestamptz timestamp"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return FrankfurterRatesReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return FrankfurterRatesStreamReader(self.options)
