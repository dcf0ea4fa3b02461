"""Event-time windowed aggregation — SURVEY.md §2.10 generalized.

The reference's nearest streaming semantics is a 20-minute ingest-time
lookback sync (services/supabase.py:57-61). Here: proper event-time
tumbling / sliding / session windows over the ``events`` table. The
same ``F.window``/``F.session_window`` expressions run identically in
batch and in Structured Streaming (``stream_tumbling_counts`` and
``stream_dedup`` below run real watermarked streams); batch mode makes
them oracle-checkable.

Windows are epoch-aligned in Spark and DuckDB's ``time_bucket`` default
origin (2000-01-03 is 10-minute aligned with the epoch), so bucket
boundaries agree.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.registry import load, query


def _dec(c):
    return (F.col(c) if isinstance(c, str) else c).cast("decimal(38,6)")


def _stage_file(src: str, dst) -> bool:
    """Copy ``src`` into the stream staging dir unless an up-to-date
    staged copy exists. Freshness is tracked in a sidecar marker
    recording the source's exact (size, mtime_ns) at staging time and
    compared by EQUALITY — ordering comparisons fail both ways
    (archive-restored testdata carries *older* mtimes and would replay
    stale; coarse filesystem timestamps re-stage every run). Copy goes
    through tmp + atomic rename, so a killed copy never leaves a
    truncated parquet for later runs to replay. Returns True when
    (re)staged."""
    import os
    import shutil

    st = os.stat(src)
    fingerprint = f"{st.st_size}:{st.st_mtime_ns}"
    marker = dst.parent / f".{dst.name}.src"
    if dst.exists() and marker.exists() and marker.read_text() == fingerprint:
        return False
    tmp = dst.parent / f".{dst.name}.{os.getpid()}.tmp"
    shutil.copyfile(src, tmp)
    tmp.replace(dst)
    marker.write_text(fingerprint)
    return True


def _stream_shuffle_width(sf_dir: str) -> str:
    """Shuffle-partition width for the drained-stream runs, sized to
    the events source (pyarrow footer count — no Spark job). Stateful
    operators keep one state store per shuffle partition per
    micro-batch, so width is a trade: at the replay tiers a handful of
    partitions avoids paying ~28 idle state-store commits per batch,
    but a FIXED 4 serializes the state insert once the source grows
    (stream_dedup measured 94.9 s at the 10M-row probe tier on 4
    partitions — the grouped_user_gaps lesson in streaming form).
    Target ~250k source rows per partition, floor 4 (sf0.01/sf0.1
    behavior unchanged), cap at the core count — the same rows/store
    target you'd size on a real cluster."""
    import os

    from finance_pipeline_spark.registry import parquet_row_count

    rows = parquet_row_count(f"{sf_dir}/events.parquet")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))
    return str(max(4, min(cpus, rows // 250_000)))


def _events_stream_source(
    spark: SparkSession,
    sf_dir: str,
    stage_dir,
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Build a ``readStream`` DataFrame over a staged events directory
    with ``ts`` normalized to TimestampType — the streaming counterpart
    of ``registry.load``'s batch normalization.

    FileStreamSource needs an explicit schema, so we sniff the SOURCE
    parquet's physical ``ts`` encoding once (pyarrow footer read, no
    Spark job) and branch: int64-nanos testdata (rounds 1-3) is read as
    ``bigint`` then ns→µs converted; ``timestamp[us]`` testdata (round
    4+) is read directly as ``timestamp`` (session zone is pinned UTC,
    so the no-tz parquet annotation reads identically). A third
    encoding fails loudly — round 4's silent drift turned this exact
    ``div 1000`` into 1970-era windows."""
    import pyarrow.parquet as pq

    ts_phys = str(pq.read_schema(f"{sf_dir}/events.parquet").field("ts").type)

    def reader(schema: str):
        r = spark.readStream.schema(schema).option("recursiveFileLookup", "true")
        if max_files_per_trigger is not None:
            r = r.option("maxFilesPerTrigger", str(max_files_per_trigger))
        return r

    if ts_phys == "int64":
        raw_schema = (
            "event_id bigint, ts bigint, user_id bigint, "
            "event_type string, value double, props string"
        )
        stream = reader(raw_schema).parquet(str(stage_dir)).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif ts_phys.startswith("timestamp[us"):
        raw_schema = (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double, props string"
        )
        stream = reader(raw_schema).parquet(str(stage_dir))
    else:
        raise ValueError(
            f"events.ts has unrecognized parquet type {ts_phys!r} — add a "
            "branch in _events_stream_source (known: int64 nanos, "
            "timestamp[us])"
        )
    return stream


@query(
    "win_tumbling",
    oracle="""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start,
           time_bucket(INTERVAL 10 MINUTE, ts) + INTERVAL 10 MINUTE AS w_end,
           event_type,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2, 3
    """,
    tags=("streaming", "window"),
    bench=True,
)
def win_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 10-minute event-time windows per event type — one
    hash-aggregate shuffle keyed on (bucket, type); the bucket is
    computed map-side so partial aggregation applies.

    The group key is the SCALAR bucket start, not ``F.window``'s
    (start, end) struct: the struct carries two timestamps through
    hash + shuffle where one scalar determines both, and on this
    600k-row agg the struct key measured ~25% slower. ``w_end`` is
    derived after the aggregate, on the few output rows. (The streamed
    variant, stream_tumbling_counts, keeps ``F.window`` — watermark
    eviction needs the real window column.)

    The bucket floors via ``pmod`` (exact integer arithmetic), NOT
    ``div``: div truncates toward zero, so a pre-1970 timestamp would
    bucket UP while F.window / DuckDB's time_bucket floor DOWN — a
    latent cross-engine hash divergence the moment testdata ever
    carries a pre-epoch event."""
    e = load(spark, sf_dir, "events")
    step = 600_000_000  # 10 minutes in microseconds, epoch-aligned
    us = F.unix_micros(F.col("ts"))
    bucket = F.timestamp_micros(us - F.pmod(us, F.lit(step)))
    return (
        e.groupBy(bucket.alias("w_start"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "w_start",
            (F.col("w_start") + F.expr("INTERVAL 10 MINUTES")).alias("w_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


@query(
    "win_sliding",
    oracle="""
    SELECT w.w_start,
           w.w_start + INTERVAL 10 MINUTE AS w_end,
           count(*) AS n_events,
           CAST(SUM(CAST(e.value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM events e,
    LATERAL (
        SELECT time_bucket(INTERVAL 5 MINUTE, e.ts) AS w_start
        UNION ALL
        SELECT time_bucket(INTERVAL 5 MINUTE, e.ts) - INTERVAL 5 MINUTE
    ) w
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def win_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10-minute length, 5-minute slide): each event
    lands in exactly length/slide = 2 windows; Spark expands via the
    window generator before the aggregate."""
    e = load(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        e.groupBy(w)
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("w_start"),
            F.col("window.end").alias("w_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "win_session",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 5 MINUTE OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessioned AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           count(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS total_value
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "window", "session"),
)
def win_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (5-minute inactivity gap) per user. Spark's
    ``session_window`` merges an event landing *exactly* at the prior
    session's end (empirically verified on 4.1.2: events at t and
    t+gap form ONE session; a split needs a gap strictly greater than
    the gap duration), so the oracle's gaps-and-islands flag uses a
    strict ``>``. Session end = last event + gap (Spark's
    definition)."""
    e = load(spark, sf_dir, "events")
    sw = F.session_window("ts", "5 minutes")
    return (
        e.groupBy(sw, "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(_dec("value")).cast("double").alias("total_value"),
        )
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@query(
    "stream_tumbling_counts",
    oracle="""
    SELECT time_bucket(INTERVAL 10 MINUTE, ts) AS w_start,
           event_type,
           count(*) AS n_events
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "readstream"),
)
def stream_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True Structured Streaming execution of the tumbling count: the
    events parquet replayed through ``readStream`` with a 10-minute
    watermark, complete-mode memory sink, drained synchronously with
    ``processAllAvailable``. Complete mode emits every window, so the
    drained result equals the batch aggregate — making an end-to-end
    *streaming* run oracle-checkable against plain SQL."""
    load(spark, sf_dir, "events")  # pins session confs (nanos-as-long)
    # FileStreamSource needs a directory; stage the (read-only) events
    # parquet into a repo-local cache dir once per sf.
    from pathlib import Path

    stage = Path(__file__).resolve().parents[2] / ".cache" / "stream" / Path(sf_dir).name
    stage.mkdir(parents=True, exist_ok=True)
    _stage_file(f"{sf_dir}/events.parquet", stage / "events.parquet")
    stream = _events_stream_source(spark, sf_dir, stage)
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.window("ts", "10 minutes"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("window.start").alias("w_start"), "event_type", "n_events"
        )
    )
    name = "stream_tumbling_counts_sink"
    # Stateful-aggregation cost scales with the shuffle-partition count
    # (one state store per partition per batch); for a single-file
    # replay a handful of partitions is plenty. Scoped to this query —
    # the conf is captured at stream start and restored after.
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(sf_dir))
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    # Materialize the drained result and drop the sink view — memory
    # sinks otherwise accumulate driver heap across a long query run.
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


@query(
    "stream_dedup",
    oracle="""
    SELECT event_type, count(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
    tags=("streaming", "dedup", "readstream"),
    bench=True,
)
def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming deduplication (SURVEY.md §2.10): the events replay is
    polluted with exact duplicate rows (every 50th event re-appended as
    a second file — simulating at-least-once re-delivery), then
    ``withWatermark + dropDuplicates(event_id)`` removes them in-stream;
    the drained append-mode output must equal the clean batch counts.
    The watermark bounds the dedup state: keys older than the watermark
    are evicted, which is what makes streaming dedup viable at 100 TB
    (unbounded-state dedup would OOM).

    The deduped stream lands in a PARQUET file sink (executor-side,
    fresh checkpoint per run so the whole replay is re-processed), and
    the count-per-type runs as a batch aggregate over the drained
    files. A memory sink here funnels every deduped row through the
    driver — 83 s and a driver-heap hazard at the 10M-row probe tier
    vs 4.7 s for the file sink (.probe_stream_width_r16.json); the
    sink IS the scale design, not a test harness shortcut."""
    import shutil
    from pathlib import Path

    load(spark, sf_dir, "events")  # pins session confs (nanos-as-long)
    stage = (
        Path(__file__).resolve().parents[2] / ".cache" / "stream_dedup" / Path(sf_dir).name
    )
    stage.mkdir(parents=True, exist_ok=True)
    restaged = _stage_file(f"{sf_dir}/events.parquet", stage / "events.parquet")
    if restaged or not (stage / "dups.parquet").exists():
        # Plant at-least-once duplicates as a second file — rebuilt
        # whenever the source re-stages, so the planted set always
        # matches the replayed events. Schema-free read: the written
        # dups keep the source's physical ``ts`` encoding, so the
        # staged dir stays encoding-uniform for the stream sniffer.
        (
            spark.read.parquet(f"{sf_dir}/events.parquet")
            .filter(F.col("event_id") % 50 == 0)
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(str(stage / "dups.parquet"))
        )
    stream = _events_stream_source(spark, sf_dir, stage)
    deduped = (
        stream.withWatermark("ts", "10 minutes")
        .dropDuplicates(["event_id"])
        .select("event_id", "event_type")
    )
    # Sink + checkpoint live in a SIBLING dir: the replay source reads
    # ``stage`` with recursiveFileLookup, so anything written beneath
    # it would be picked up as stream input (the checkpoint metadata
    # file fails the parquet reader outright).
    out_root = stage.parent / f"{stage.name}_out"
    sink_dir, ckpt_dir = out_root / "dedup_out", out_root / "dedup_ckpt"
    for d in (sink_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(sf_dir))
    try:
        q = (
            deduped.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(sink_dir))
            .option("checkpointLocation", str(ckpt_dir))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    drained = spark.read.schema("event_id bigint, event_type string").parquet(
        str(sink_dir)
    )
    return drained.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))


@query(
    "stream_static_join",
    oracle="""
    SELECT c_mktsegment, event_type, count(*) AS n_events
    FROM events JOIN customer ON user_id = c_custkey
    GROUP BY 1, 2
    """,
    tags=("streaming", "readstream", "join"),
)
def stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join — the canonical Structured
    Streaming dimension-lookup shape: the events replay joins the
    STATIC customer table on user_id = c_custkey, then counts per
    (market segment, event_type) in complete mode. The static side is
    explicitly broadcast, so each micro-batch enriches map-side with
    no stream-side shuffle and NO join state (stream-static inner
    joins are stateless by definition — the property that makes this
    the scale-safe enrichment pattern; a stream-stream join would
    buffer state on both sides).

    The drained complete-mode result equals the batch join+aggregate,
    so a true end-to-end streaming run stays oracle-checkable."""
    from pathlib import Path

    load(spark, sf_dir, "events")  # pins session confs (nanos-as-long)
    dim = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    stage = (
        Path(__file__).resolve().parents[2]
        / ".cache" / "stream_join" / Path(sf_dir).name
    )
    stage.mkdir(parents=True, exist_ok=True)
    _stage_file(f"{sf_dir}/events.parquet", stage / "events.parquet")
    stream = _events_stream_source(spark, sf_dir, stage).select(
        "user_id", "event_type"
    )
    enriched = (
        stream.join(F.broadcast(dim), stream.user_id == dim.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    name = "stream_static_join_sink"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(sf_dir))
    try:
        q = (
            enriched.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out


@query(
    "stream_stream_join",
    oracle="""
    SELECT c.user_id, count(*) AS n_pairs
    FROM events c
    JOIN events p
      ON p.user_id = c.user_id
     AND c.event_type = 'click' AND p.event_type = 'purchase'
     AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 6 HOUR
    GROUP BY c.user_id
    """,
    tags=("streaming", "readstream", "join"),
)
def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream interval join — the hardest Structured
    Streaming join shape: clicks matched to same-user purchases that
    occur within 6 hours AFTER the click, both sides live streams.

    Both inputs carry a watermark and the join condition carries an
    explicit event-time bound, which is what lets Spark EVICT buffered
    state: a click older than (watermark - 6 h) can never match a
    future purchase, so its buffer entry is dropped. Without the time
    bound the join state grows without limit — the difference between
    a 100 TB-viable plan and an OOM. (Stream-STATIC joins, by
    contrast, are stateless — see stream_static_join.)

    The replay arrives in one micro-batch, so every pair is matched
    before any eviction; the drained append-mode pairs aggregate to
    the exact batch interval-join counts, keeping a real end-to-end
    streaming run oracle-checkable. Pairs land in a parquet file sink
    projected to the one column the final aggregate needs — join
    output can exceed the input (fan-out pairs), so a memory sink
    here funnels a bigger-than-source row set through the driver (the
    stream_dedup lesson, amplified)."""
    import shutil
    from pathlib import Path

    load(spark, sf_dir, "events")  # pins session confs
    stage = Path(__file__).resolve().parents[2] / ".cache" / "stream" / Path(sf_dir).name
    stage.mkdir(parents=True, exist_ok=True)
    _stage_file(f"{sf_dir}/events.parquet", stage / "events.parquet")

    clicks = (
        _events_stream_source(spark, sf_dir, stage)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
            F.col("event_id").alias("c_id"),
        )
        .withWatermark("c_ts", "10 minutes")
    )
    purchases = (
        _events_stream_source(spark, sf_dir, stage)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        .withWatermark("p_ts", "10 minutes")
    )
    pairs = clicks.join(
        purchases,
        (F.col("p_user") == F.col("c_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("interval 6 hours")),
    )
    out_root = stage.parent / f"{stage.name}_out"
    sink_dir, ckpt_dir = out_root / "ssj_out", out_root / "ssj_ckpt"
    for d in (sink_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(sf_dir))
    try:
        q = (
            pairs.select("c_user")
            .writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(sink_dir))
            .option("checkpointLocation", str(ckpt_dir))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    drained = spark.read.schema("c_user bigint").parquet(str(sink_dir))
    return (
        drained.groupBy(F.col("c_user").alias("user_id"))
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


@query(
    "stream_session_counts",
    oracle="""
    WITH flagged AS (
        SELECT user_id, ts, value, event_id,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL 5 MINUTE OR
                         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events
    ), sessioned AS (
        SELECT user_id, ts, value,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 5 MINUTE AS session_end,
           count(*) AS n_events
    FROM sessioned
    GROUP BY user_id, session_id
    """,
    tags=("streaming", "readstream", "session"),
)
def stream_session_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows on a REAL stream — the stateful aggregation whose
    state is not a fixed window but a MERGING one: arriving events
    extend or fuse open sessions, and only the watermark can declare a
    session closed (append mode emits exactly then, which is also when
    its state is freed — the eviction that keeps per-user session
    state bounded at 100 TB).

    Append mode only flushes a session once the WATERMARK passes its
    end, and the watermark itself only advances between micro-batches
    — so a single-batch replay would leave the tail sessions stuck in
    state (their flush would happen in a no-data batch that
    ``processAllAvailable`` does not wait for). The replay therefore
    plants TWO far-future sentinel events (user_id = -1, at +1 day and
    +2 days) in separate staged files and sets ``maxFilesPerTrigger=1``:
    batch 1 ingests the real events, batch 2 (first sentinel) advances
    the watermark to real-max − gap, and batch 3 (second sentinel) runs
    with the watermark already past every real session end — flushing
    the tail sessions inside a DATA batch the drain provably covers.
    The drained output (sentinels filtered out) must equal the batch
    gaps-and-islands oracle — the same SQL ``win_session`` hash-matches
    in batch mode."""
    from pathlib import Path

    load(spark, sf_dir, "events")  # pins session confs
    stage = (
        Path(__file__).resolve().parents[2]
        / ".cache" / "stream_session" / Path(sf_dir).name
    )
    stage.mkdir(parents=True, exist_ok=True)
    restaged = _stage_file(f"{sf_dir}/events.parquet", stage / "events.parquet")
    if restaged or not (stage / "sentinel2.parquet").exists():
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        # Sentinels keep the SOURCE file's physical ts encoding so the
        # staged dir stays uniform for the stream sniffer. Files are
        # written in replay order — FileStreamSource lists oldest-mtime
        # first, so events → sentinel1 → sentinel2.
        for n, offset in (("sentinel1", 1), ("sentinel2", 2)):
            if dict(raw.dtypes)["ts"] == "bigint":  # int64 nanos
                sent_ts = F.max("ts") + F.lit(offset * 86400 * 10**9)
            else:
                sent_ts = F.max("ts") + F.expr(f"interval {offset} day")
            (
                raw.agg(sent_ts.alias("ts"))
                .select(
                    F.lit(-1).cast("bigint").alias("event_id"),
                    "ts",
                    F.lit(-1).cast("bigint").alias("user_id"),
                    F.lit("sentinel").alias("event_type"),
                    F.lit(0.0).alias("value"),
                    F.lit(None).cast("string").alias("props"),
                )
                .coalesce(1)
                .write.mode("overwrite")
                .parquet(str(stage / f"{n}.parquet"))
            )
    stream = _events_stream_source(spark, sf_dir, stage, max_files_per_trigger=1)
    # NOTE: the sentinel filter must NOT appear in the streaming plan —
    # a `user_id >= 0` predicate here gets pushed below the
    # EventTimeWatermark node (it's a deterministic filter on a scan
    # column), so the sentinel rows would never advance the watermark
    # and the tail sessions would never flush. Filter after draining.
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "5 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
    # One flushed row per closed session — corpus-order cardinality, so
    # the drain goes through an executor-side parquet file sink (the
    # stream_dedup lesson: a memory sink funnels it through the driver,
    # 163 s at the 10M-event probe tier vs 21 s for the file sink).
    import shutil

    out_root = stage.parent / f"{stage.name}_out"
    sink_dir, ckpt_dir = out_root / "sess_out", out_root / "sess_ckpt"
    for d in (sink_dir, ckpt_dir):
        shutil.rmtree(d, ignore_errors=True)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(sf_dir))
    try:
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(sink_dir))
            .option("checkpointLocation", str(ckpt_dir))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.read.schema(
        "user_id bigint, session_start timestamp, session_end timestamp, "
        "n_events bigint"
    ).parquet(str(sink_dir))
    # Sentinel sessions drop here, AFTER the drain (see note above).
    return out.filter(F.col("user_id") >= 0)


@query(
    "stream_decode_quarantine",
    # Per-source totals of the dead-letter decode, computed by a TRUE
    # streaming run (readStream -> mapInPandas codec kernel ->
    # complete-mode aggregate, drained synchronously) and checked
    # against plain batch SQL: which docs quarantine (n%7==0 planted
    # corruption) and the exact width-sum of the good decodes are both
    # deterministic functions of the text bytes.
    oracle="""
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN n % 7 <> 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_ok,
           CAST(sum(CASE WHEN n % 7 = 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_quarantined,
           CAST(sum(CASE WHEN n % 7 <> 0 THEN 3 + (n % 9) ELSE 0 END)
                AS BIGINT) AS sum_width
    FROM (
        SELECT source,
               octet_length(encode(coalesce(text, ''))) AS n
        FROM documents
    )
    GROUP BY source
    """,
    tags=("streaming", "multimodal", "quarantine", "udf"),
)
def stream_decode_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING multimodal ingest with dead-letter routing — the
    composition a real pipeline runs: documents arrive as a file
    stream, each micro-batch synthesizes/decodes real PNG payloads
    through the same Arrow-batched kernel as ``mm_decode_quarantine``
    (every n%7==0 payload corrupted in-flight), corrupt rows route to
    quarantine counts instead of failing the stream, and a
    complete-mode aggregate tracks per-source ok/quarantined totals.
    The decode kernel is STATELESS (mapInPandas on an unbounded
    stream is legal and scales per-partition); only the final count
    aggregate holds state, bounded by |sources|."""
    from pathlib import Path

    import pandas as pd

    from finance_pipeline_spark.operators.multimodal import decode_png

    load(spark, sf_dir, "documents")  # pins session confs
    # SIBLING of the events staging dir, never inside it: the events
    # stream source lists its dir with recursiveFileLookup, so a
    # nested documents.parquet would pollute every events stream query
    # (caught by the full-gate run that first hit both).
    stage = (
        Path(__file__).resolve().parents[2]
        / ".cache" / "stream_docs" / Path(sf_dir).name
    )
    stage.mkdir(parents=True, exist_ok=True)
    _stage_file(f"{sf_dir}/documents.parquet", stage / "documents.parquet")
    stream = (
        spark.readStream.schema(
            "doc_id bigint, text string, lang string, source string, "
            "n_chars bigint"
        )
        .option("recursiveFileLookup", "true")
        .parquet(str(stage))
    )

    def kernel(it):
        from finance_pipeline_spark.operators.multimodal import (
            png_fixture_payload,
        )

        for pdf in it:
            rows = {"source": [], "ok": [], "width": []}
            for src, t in zip(pdf["source"], pdf["text"]):
                payload = png_fixture_payload(t, corrupt_mod=7)
                rows["source"].append(src)
                try:
                    w2, _, _ = decode_png(payload)
                    rows["ok"].append(True)
                    rows["width"].append(w2)
                except ValueError:
                    rows["ok"].append(False)
                    rows["width"].append(0)
            yield pd.DataFrame(rows)

    decoded = stream.select("source", "text").mapInPandas(
        kernel, "source string, ok boolean, width int"
    )
    agg = decoded.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.col("ok").cast("bigint")).alias("n_ok"),
        F.sum((~F.col("ok")).cast("bigint")).alias("n_quarantined"),
        F.sum(F.when(F.col("ok"), F.col("width")).otherwise(0))
        .cast("bigint")
        .alias("sum_width"),
    )
    name = "stream_decode_quarantine_sink"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", _stream_shuffle_width(sf_dir))
    try:
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    out = spark.table(name).localCheckpoint(eager=True)
    spark.catalog.dropTempView(name)
    return out
