"""REST sink (SURVEY.md §2.2 K7) — the Supabase-shaped uploader
(services/supabase.py:23-39) re-expressed as ``foreachPartition``:
each executor POSTs its partition's rows in batches, so upload
bandwidth scales with the cluster instead of funneling through the
driver (the reference collects everything into one driver-side
``to_dict("records")`` call).

The transport is an injectable picklable callable (tests use a
directory-spool transport; production wraps an HTTP client). The
``source`` discriminator column mirrors services/supabase.py:29-30.
"""

from __future__ import annotations

import json
import os
import uuid
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

Transport = Callable[[list[dict]], None]


class SpoolTransport:
    """Offline transport: each batch lands as one JSON-lines file in a
    spool directory — inspectable, durable, executor-safe (unique file
    names). Stands in for the HTTP POST in this no-network container;
    also a legitimate dead-letter/outbox pattern."""

    def __init__(self, spool_dir: str) -> None:
        self.spool_dir = spool_dir

    def __call__(self, records: list[dict]) -> None:
        Path(self.spool_dir).mkdir(parents=True, exist_ok=True)
        name = f"batch-{os.getpid()}-{uuid.uuid4().hex}.jsonl"
        with open(Path(self.spool_dir) / name, "w") as f:
            for r in records:
                f.write(json.dumps(r, default=str) + "\n")


def post_records(
    df: DataFrame,
    transport: Transport,
    source: str | None = None,
    batch_size: int = 500,
    drop: tuple[str, ...] = ("id",),
) -> None:
    """K7 + P2 + M3: drop the surrogate id, tag the source, then
    foreachPartition → dict-records batches → transport."""
    from finance_pipeline_spark.registry import ship_package

    ship_package(df.sparkSession)  # transport class must import on workers
    out = df.drop(*[c for c in drop if c in df.columns])
    if source:
        out = out.withColumn("source", F.lit(source))

    def send_partition(rows) -> None:
        batch: list[dict] = []
        for row in rows:
            batch.append(row.asDict(recursive=True))
            if len(batch) >= batch_size:
                transport(batch)
                batch = []
        if batch:
            transport(batch)

    out.foreachPartition(send_partition)
