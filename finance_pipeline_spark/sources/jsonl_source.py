"""JSON-lines source with corrupt-record quarantine — the ingestion
shape for log/event feeds (the reference's REST fetcher consumes the
same records pre-parsed, etl/api_fetcher.py:40-56; a 100 TB pipeline
receives them as JSONL files and must survive bad lines).

Schema is DECLARED, never inferred — on a cluster, inference is a
second full pass over the input and a drift hazard (same rule as
csv_source). Malformed lines don't kill the job and don't silently
vanish either: PERMISSIVE mode captures them in a corrupt-record
column, and ``read_jsonl`` splits the scan into (clean, quarantine)
so the pipeline loads what parses and ships what doesn't to a
dead-letter location with the raw line intact for replay. That split
is one predicate on one scan — Spark evaluates both branches from the
same pass, no double read.

Scale notes: JSONL is line-splittable, so a single 1 TB file still
fans out across tasks (unlike multiline JSON, which is one task per
file — refuse it at review time). Parsing happens in the scan
(JacksonParser, JVM); no Python touches the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from finance_pipeline_spark.logging_utils import get_logger

log = get_logger(__name__)

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> tuple[DataFrame, DataFrame]:
    """Scan ``path`` as JSONL against ``schema``. Returns
    ``(clean, quarantine)``:

    - ``clean``: rows that parsed — schema columns only;
    - ``quarantine``: the raw text of lines that did NOT parse (or
      parsed to a type mismatch), one ``raw`` column, ready for a
      dead-letter write + replay after a parser fix.

    Implementation: ``read.text`` + ``from_json`` rather than
    ``read.json`` — the raw line stays a first-class column (the
    dead-letter payload), and it sidesteps Spark's restriction on
    querying only the corrupt-record column of a raw JSON scan
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN, whose
    documented workaround is caching — a non-answer at 100 TB).
    Parsing is still the JVM JacksonParser inside codegen; text
    lines are splittable, so big files fan out across tasks."""
    full_schema = T.StructType(
        [*schema.fields, T.StructField(CORRUPT_COL, T.StringType())]
    )
    parsed = spark.read.text(path).select(
        F.col("value").alias("raw"),
        F.from_json(
            "value",
            full_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": CORRUPT_COL},
        ).alias("rec"),
    )
    clean = parsed.filter(F.col(f"rec.{CORRUPT_COL}").isNull()).select(
        *[F.col(f"rec.{f.name}").alias(f.name) for f in schema.fields]
    )
    quarantine = parsed.filter(F.col(f"rec.{CORRUPT_COL}").isNotNull()).select("raw")
    return clean, quarantine


def load_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    dead_letter_path: str | None = None,
) -> tuple[DataFrame, int]:
    """The ingestion step: parse, quarantine bad lines (written to
    ``dead_letter_path`` when given), return (clean rows, n_bad).
    Mirrors the reference's fetch-validate-load contract where invalid
    records are counted and skipped, never silently dropped."""
    clean, quarantine = read_jsonl(spark, path, schema)
    n_bad = quarantine.count()
    if n_bad and dead_letter_path is not None:
        quarantine.write.mode("append").text(dead_letter_path)
        log.warning("quarantined %d malformed JSONL lines to %s", n_bad, dead_letter_path)
    return clean, n_bad
