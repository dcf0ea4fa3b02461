"""JSONL ingestion: clean/quarantine split, dead-letter replay
round-trip, and the no-silent-drop accounting contract."""

from __future__ import annotations

from pyspark.sql import types as T

from finance_pipeline_spark.sources.jsonl_source import load_jsonl, read_jsonl

SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

LINES = [
    '{"event_id": 1, "kind": "click", "value": 1.5}',
    '{"event_id": 2, "kind": "view", "value": 0.25}',
    "this is not json at all",
    '{"event_id": "not-a-number", "kind": "click", "value": 1.0}',
    '{"event_id": 5, "kind": "buy", "value": 9.75}',
    '{broken json',
]


def _write(tmp_path, lines):
    p = tmp_path / "feed.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_clean_and_quarantine_partition_the_input(spark, tmp_path):
    path = _write(tmp_path, LINES)
    clean, quarantine = read_jsonl(spark, path, SCHEMA)
    good = {r.event_id for r in clean.collect()}
    assert good == {1, 2, 5}
    bad = [r.raw for r in quarantine.collect()]
    assert len(bad) == 3
    assert "this is not json at all" in bad  # raw line preserved verbatim
    assert clean.columns == ["event_id", "kind", "value"]  # no corrupt col


def test_dead_letter_write_and_replay(spark, tmp_path):
    path = _write(tmp_path, LINES)
    dl = str(tmp_path / "dead")
    clean, n_bad = load_jsonl(spark, path, SCHEMA, dead_letter_path=dl)
    assert n_bad == 3
    assert clean.count() == 3
    # replay: the dead-letter file is itself line-oriented raw text
    replayed = spark.read.text(dl)
    assert replayed.count() == 3


def test_all_clean_input_writes_no_dead_letter(spark, tmp_path):
    path = _write(tmp_path, LINES[:2])
    dl = str(tmp_path / "dead")
    clean, n_bad = load_jsonl(spark, path, SCHEMA, dead_letter_path=dl)
    assert (clean.count(), n_bad) == (2, 0)
    import pathlib

    assert not pathlib.Path(dl).exists()
