"""Streaming semantics: the Structured Streaming replay must agree
with the equivalent batch aggregate (complete-mode memory sink drains
every window)."""

from __future__ import annotations

from finance_pipeline_spark import registry

registry.load_all()


def test_stream_tumbling_equals_batch(spark, sf_dir):
    stream_rows = {
        (r.w_start, r.event_type): r.n_events
        for r in registry.QUERIES["stream_tumbling_counts"].fn(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.w_start, r.event_type): r.n_events
        for r in registry.QUERIES["win_tumbling"].fn(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows


def test_session_windows_non_overlapping_per_user(spark, sf_dir):
    rows = registry.QUERIES["win_session"].fn(spark, sf_dir).collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r.user_id, []).append((r.session_start, r.session_end))
    assert by_user
    for user, spans in by_user.items():
        spans.sort()
        for (s1, e1), (s2, _) in zip(spans, spans[1:]):
            assert e1 <= s2, (user, (s1, e1), s2)


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pin the exact-gap semantics the oracle encodes (ADVICE r2): an
    event landing exactly gap after the previous one MERGES into that
    session; a split needs a strictly greater gap. The driver testdata
    has no exact 5-minute gaps, so the oracle row can't exercise this —
    plant one, and check Spark against the DuckDB oracle on it."""
    import datetime as dt

    import duckdb
    import pandas as pd

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    events = pd.DataFrame(
        {
            "event_id": [1, 2, 3, 4],
            "ts": [
                t0,
                t0 + dt.timedelta(minutes=5),          # exact gap → same session
                t0 + dt.timedelta(minutes=10, seconds=1),  # gap 5:01 → new session
                t0 + dt.timedelta(hours=2),            # far → third session
            ],
            "user_id": [7, 7, 7, 7],
            "event_type": ["click"] * 4,
            "value": [1.0, 2.0, 3.0, 4.0],
        }
    )
    events["ts"] = events["ts"].astype("datetime64[us]")
    sf = str(tmp_path)
    events.to_parquet(f"{sf}/events.parquet", index=False)

    spec = registry.QUERIES["win_session"]
    got = sorted(
        (r.session_start, r.session_end, r.n_events)
        for r in spec.fn(spark, sf).collect()
    )
    assert got == [
        (t0, t0 + dt.timedelta(minutes=10), 2),  # merged pair, end = last event + gap
        (
            t0 + dt.timedelta(minutes=10, seconds=1),
            t0 + dt.timedelta(minutes=15, seconds=1),
            1,
        ),
        (t0 + dt.timedelta(hours=2), t0 + dt.timedelta(hours=2, minutes=5), 1),
    ]
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    oracle = sorted(
        (s, e, n)
        for _, s, e, n, _ in con.execute(spec.oracle_text()).fetchall()
    )
    assert oracle == got


def test_stream_dedup_removes_planted_duplicates(spark, sf_dir):
    clean = {
        (r.event_type,): r.n_events
        for r in registry.QUERIES["stream_dedup"].fn(spark, sf_dir).collect()
    }
    from pyspark.sql import functions as F

    batch = {
        (r.event_type,): r.n
        for r in registry.load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert clean == batch


def test_foreachbatch_streaming_load_is_idempotent(spark, tmp_path):
    """foreachBatch → keyed writer: drain a CSV directory stream twice
    (fresh checkpoint the second time, simulating full re-delivery) —
    the table must converge to one row per key."""
    from finance_pipeline_spark.pipelines.streaming_load import stream_into_table

    src = tmp_path / "incoming"
    src.mkdir()
    (src / "day1.csv").write_text(
        "currency,timestamptz,exchange_rate\n"
        "USD,2025-05-01T10:00:00,1.10\n"
        "GBP,2025-05-01T10:00:00,0.85\n"
    )
    (src / "day2.csv").write_text(
        "currency,timestamptz,exchange_rate\n"
        "USD,2025-05-02T10:00:00,1.11\n"
        "USD,2025-05-01T10:00:00,1.99\n"  # replayed key — must be skipped
    )
    schema = "currency string, timestamptz timestamp, exchange_rate double"
    table = str(tmp_path / "rates")
    stats1 = stream_into_table(
        spark, str(src), schema, table, ["currency", "timestamptz"],
        str(tmp_path / "ckpt1"), max_files_per_trigger=1,
    )
    assert sum(s.inserted for s in stats1) == 3
    assert sum(s.skipped for s in stats1) == 1
    # Re-deliver everything (new checkpoint → all files reprocessed).
    stats2 = stream_into_table(
        spark, str(src), schema, table, ["currency", "timestamptz"],
        str(tmp_path / "ckpt2"),
    )
    assert sum(s.inserted for s in stats2) == 0
    from finance_pipeline_spark.sinks.keyed_writer import read_table

    t = read_table(spark, table)
    assert t.count() == 3
    assert t.filter("exchange_rate = 1.99").count() == 0  # first writer won


def test_display_grid_and_records(spark):
    from finance_pipeline_spark.display import grid, to_records

    df = spark.createDataFrame([(1, "a"), (2, "b")], "id int, name string")
    g = grid(df.orderBy("id"))
    assert "╒" in g and "│ id" in g and "│ 1" in g and g.count("\n") >= 5
    recs = to_records(df.orderBy("id"), limit=1)
    assert recs == [{"id": 1, "name": "a"}]


def test_stream_session_equals_batch(spark, sf_dir):
    """Append-mode session windows on a real stream must flush EVERY
    real session (the two staggered sentinels + maxFilesPerTrigger=1
    guarantee the tail sessions flush inside a drained data batch —
    a plain single-batch replay provably leaves them stuck in state)."""
    stream_rows = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in registry.QUERIES["stream_session_counts"].fn(spark, sf_dir).collect()
    }
    batch_rows = {
        (r.user_id, r.session_start, r.session_end): r.n_events
        for r in registry.QUERIES["win_session"].fn(spark, sf_dir).collect()
    }
    assert stream_rows == batch_rows
    assert all(u >= 0 for (u, _, _) in stream_rows)  # sentinels dropped


def test_stage_file_restages_only_on_source_change(tmp_path):
    """The stream staging fingerprint must re-stage on ANY source
    change — size or mtime, in either direction (archive-restored
    testdata carries OLDER mtimes; this round's drift arrived as a
    same-named regenerated file) — and must not re-stage when the
    source is untouched."""
    import os

    from finance_pipeline_spark.operators.streaming_batch import _stage_file

    src = tmp_path / "src.parquet"
    dst_dir = tmp_path / "stage"
    dst_dir.mkdir()
    dst = dst_dir / "src.parquet"

    src.write_bytes(b"v1-data")
    assert _stage_file(str(src), dst) is True  # first contact stages
    assert _stage_file(str(src), dst) is False  # unchanged → cached
    assert dst.read_bytes() == b"v1-data"

    # same size, OLDER mtime (archive restore) → must re-stage
    st = os.stat(src)
    os.utime(src, ns=(st.st_atime_ns, st.st_mtime_ns - 10**9))
    assert _stage_file(str(src), dst) is True
    assert _stage_file(str(src), dst) is False

    # content change (size differs) → must re-stage and replace
    src.write_bytes(b"v2-data-longer")
    assert _stage_file(str(src), dst) is True
    assert dst.read_bytes() == b"v2-data-longer"


def test_stream_cdc_apply_upserts_latest_state(spark, tmp_path):
    """Changelog files drained through foreachBatch + txn MERGE: later
    files UPDATE keys earlier files inserted (not skip them), the table
    converges to the newest state per key, and the commit log carries
    one version per microbatch."""
    from finance_pipeline_spark.pipelines.streaming_load import stream_cdc_apply
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable, current_snapshot

    src = tmp_path / "changelog"
    src.mkdir()
    # two files => with maxFilesPerTrigger=1, two ordered microbatches
    (src / "b0.csv").write_text("k,v\n1,old1\n2,old2\n3,old3\n")
    (src / "b1.csv").write_text("k,v\n2,new2\n3,new3\n4,new4\n")
    stats = stream_cdc_apply(
        spark,
        str(src),
        "k bigint, v string",
        str(tmp_path / "table"),
        ["k"],
        str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    assert len(stats) == 2
    assert (stats[0].inserted, stats[0].updated) == (3, 0)
    assert (stats[1].inserted, stats[1].updated) == (1, 2)
    t = TxnKeyedTable(spark, str(tmp_path / "table"), ["k"])
    vals = {r.k: r.v for r in t.read().collect()}
    assert vals == {1: "old1", 2: "new2", 3: "new3", 4: "new4"}
    assert current_snapshot(str(tmp_path / "table")).version == 1


def test_python_datasource_stream_reads_only_new_payloads(spark, tmp_path):
    """The Spark-4 streaming DataSource: offsets index the sorted
    payload file list, so a resumed stream (same checkpoint) processes
    ONLY files that arrived since the committed offset."""
    import json as _json

    from finance_pipeline_spark.sources import python_datasource

    python_datasource.register(spark)
    feed = tmp_path / "feed"
    feed.mkdir()

    def payload(day, rates):
        (feed / f"{day}.json").write_text(
            _json.dumps({"date": day, "rates": rates, "base": "EUR"})
        )

    payload("2024-01-02", {"USD": 1.1, "GBP": 0.86})
    payload("2024-01-03", {"USD": 1.12})

    seen = []

    def drain():
        batch_rows = []
        q = (
            spark.readStream.format("frankfurter_rates")
            .option("path", str(feed))
            .load()
            .writeStream.foreachBatch(
                lambda df, _id: batch_rows.extend(df.collect())
            )
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return batch_rows

    first = drain()
    assert {(r.currency, r.exchange_rate) for r in first} == {
        ("USD", 1.1), ("GBP", 0.86), ("USD", 1.12),
    }
    # a new payload arrives; the resumed stream reads ONLY it
    payload("2024-01-04", {"JPY": 157.2})
    second = drain()
    assert {(r.currency, r.exchange_rate) for r in second} == {("JPY", 157.2)}
    # timestamps carry the CET->UTC stamping (winter: 16:00 CET = 15:00 UTC)
    assert all(r.timestamptz.hour == 15 for r in first + second)


def test_python_datasource_bad_payload_stalls_then_recovers(spark, tmp_path):
    """A half-written JSON payload must not fail the microbatch OR be
    silently skipped: the batch stops at the last good file (offset
    never passes the bad name), and once the file completes the next
    trigger picks it up plus everything behind it."""
    import json as _json

    from finance_pipeline_spark.sources import python_datasource

    python_datasource.register(spark)
    feed = tmp_path / "feed"
    feed.mkdir()
    (feed / "2024-01-02.json").write_text(
        _json.dumps({"date": "2024-01-02", "rates": {"USD": 1.1}})
    )
    (feed / "2024-01-03.json").write_text('{"date": "2024-01-03", "ra')  # torn
    (feed / "2024-01-04.json").write_text(
        _json.dumps({"date": "2024-01-04", "rates": {"USD": 1.3}})
    )

    def drain():
        rows = []
        q = (
            spark.readStream.format("frankfurter_rates")
            .option("path", str(feed))
            .load()
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return rows

    first = drain()
    # only the file BEFORE the torn one came through
    assert {(str(r.date), r.exchange_rate) for r in first} == {("2024-01-02", 1.1)}
    # upload completes -> the retried trigger reads it AND the file behind it
    (feed / "2024-01-03.json").write_text(
        _json.dumps({"date": "2024-01-03", "rates": {"USD": 1.2}})
    )
    second = drain()
    assert {(str(r.date), r.exchange_rate) for r in second} == {
        ("2024-01-03", 1.2), ("2024-01-04", 1.3),
    }


def test_stream_cdc_apply_seq_col_orders_within_batch(spark, tmp_path):
    """Several changes for one key in ONE microbatch: with seq_col the
    MAX-seq change wins (latest state), regardless of value ordering —
    min-by-value dedup would keep 'apple' here."""
    from finance_pipeline_spark.pipelines.streaming_load import stream_cdc_apply
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    src = tmp_path / "changelog"
    src.mkdir()
    (src / "all.csv").write_text(
        "k,v,seq\n1,zebra,1\n1,apple,2\n2,first,1\n"
    )
    stats = stream_cdc_apply(
        spark,
        str(src),
        "k bigint, v string, seq bigint",
        str(tmp_path / "table"),
        ["k"],
        str(tmp_path / "ckpt"),
        seq_col="seq",
    )
    assert len(stats) == 1 and (stats[0].inserted, stats[0].updated) == (2, 0)
    vals = {r.k: r.v for r in TxnKeyedTable(spark, str(tmp_path / "table"), ["k"]).read().collect()}
    assert vals == {1: "apple", 2: "first"}  # seq 2 beats seq 1


def test_stream_cdc_apply_routes_deletes(spark, tmp_path):
    """A CDC feed with an op column: tombstones (op='d') REMOVE their
    key via the txn table's copy-on-write key-delete instead of
    upserting ghost rows; the op column never lands in the table; and
    within one microbatch seq ordering decides update-then-delete
    (deleted) exactly as it decides update-vs-update."""
    from finance_pipeline_spark.pipelines.streaming_load import (
        CdcApplyStats,
        stream_cdc_apply,
    )
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    src = tmp_path / "changelog"
    src.mkdir()
    (src / "b0.csv").write_text(
        "k,v,seq,op\n1,one,1,c\n2,two,1,c\n3,three,1,c\n"
    )
    # k=1: plain tombstone. k=2: update. k=3: update then delete in the
    # SAME batch (seq 3 > 2 -> the delete wins). k=4: fresh insert.
    (src / "b1.csv").write_text(
        "k,v,seq,op\n1,,2,d\n2,two2,2,u\n3,three2,2,u\n3,,3,d\n4,four,2,c\n"
    )
    stats = stream_cdc_apply(
        spark,
        str(src),
        "k bigint, v string, seq bigint, op string",
        str(tmp_path / "table"),
        ["k"],
        str(tmp_path / "ckpt"),
        seq_col="seq",
        op_col="op",
        max_files_per_trigger=1,
    )
    assert len(stats) == 2 and all(isinstance(s, CdcApplyStats) for s in stats)
    assert (stats[0].inserted, stats[0].updated, stats[0].deleted) == (3, 0, 0)
    assert (stats[1].inserted, stats[1].updated, stats[1].deleted) == (1, 1, 2)
    t = TxnKeyedTable(spark, str(tmp_path / "table"), ["k"])
    out = t.read()
    assert "op" not in out.columns
    vals = {r.k: r.v for r in out.collect()}
    assert vals == {2: "two2", 4: "four"}


def test_python_datasource_stream_offsets_survive_backfill(spark, tmp_path):
    """Name-based offsets: a file backfilled BEHIND the committed
    offset must not shift positions and re-emit the tail file as
    duplicates (round-6 review: count-index offsets did exactly that).
    The late file is skipped — the documented in-order feed contract —
    and genuinely new files still flow."""
    import json as _json

    from finance_pipeline_spark.sources import python_datasource

    python_datasource.register(spark)
    feed = tmp_path / "feed"
    feed.mkdir()

    def payload(day, rates):
        (feed / f"{day}.json").write_text(
            _json.dumps({"date": day, "rates": rates, "base": "EUR"})
        )

    def drain():
        rows = []
        q = (
            spark.readStream.format("frankfurter_rates")
            .option("path", str(feed))
            .load()
            .writeStream.foreachBatch(lambda df, _id: rows.extend(df.collect()))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return rows

    payload("2024-01-02", {"USD": 1.1})
    payload("2024-01-03", {"USD": 1.12})
    assert len(drain()) == 2
    # backfill an EARLIER-named file + add a genuinely new one
    payload("2024-01-01", {"USD": 1.05})
    payload("2024-01-04", {"JPY": 157.2})
    second = drain()
    assert {(r.currency, r.exchange_rate) for r in second} == {("JPY", 157.2)}


def test_stream_decode_quarantine_matches_batch_and_keeps_events_clean(
    spark, sf_dir
):
    """The streaming dead-letter decode's per-source totals equal the
    batch ground truth, AND running it must not pollute the EVENTS
    stream staging dir (regression: the first version staged
    documents.parquet inside it, and recursiveFileLookup fed the
    mismatched file to every events stream query)."""
    from pyspark.sql import functions as F

    rows = {
        r.source: r
        for r in registry.QUERIES["stream_decode_quarantine"].fn(spark, sf_dir).collect()
    }
    truth = {
        r.source: r
        for r in registry.load(spark, sf_dir, "documents")
        .select(
            "source",
            F.octet_length(F.encode(F.coalesce("text", F.lit("")), "UTF-8")).alias("n"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("n") % 7 != 0).cast("bigint")).alias("n_ok"),
            F.sum((F.col("n") % 7 == 0).cast("bigint")).alias("n_q"),
        )
        .collect()
    }
    assert set(rows) == set(truth)
    for s, t in truth.items():
        r = rows[s]
        assert (r.n_docs, r.n_ok, r.n_quarantined) == (t.n_docs, t.n_ok, t.n_q)
        assert r.n_quarantined > 0  # the planted corruption is exercised

    # events streaming query still bit-equal to its batch form
    ev = {
        (r.event_type,): r.n_events
        for r in registry.QUERIES["stream_dedup"].fn(spark, sf_dir).collect()
    }
    batch = {
        (r.event_type,): r.n
        for r in registry.load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert ev == batch
