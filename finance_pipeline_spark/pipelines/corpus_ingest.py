"""Continuous corpus ingestion — the streaming deployment shape of the
incremental dedup screen (operators/dedup.py::dedup_incremental): a
document stream drained through ``foreachBatch``, each micro-batch
screened against the ACCUMULATED corpus by content identity (sha256
digest) before appending. Replays, re-crawls, and cross-batch copies
all land in the digest anti-join and are skipped, so the corpus table
converges to one row per distinct content no matter how often the
source re-delivers.

This composes two pieces the repo already trusts: the exact tier of
the incremental screen (digest as the identity key — bodies never
join, 32-byte keys do) and the idempotent keyed writer (in-batch
dedup + anti-join vs the table + append). At 100 TB the accumulated
table is bucketed by digest so each batch's anti-join prunes to
matching buckets; the near-dup tier runs the same way off the stored
band index (see ``dedup_incremental``'s docstring).

Parity: the reference's incremental sync loads "rows newer than a
20-minute lookback" at-least-once and relies on the DB UNIQUE key to
drop replays (services/supabase.py:57-61, etl/csv_loader.py:133);
here the lookback is the stream checkpoint and the UNIQUE key is the
content digest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.logging_utils import get_logger
from finance_pipeline_spark.sinks.keyed_writer import WriteStats, idempotent_append

log = get_logger(__name__)

DOC_SCHEMA = (
    "doc_id bigint, text string, lang string, source string, n_chars bigint"
)


def ingest_corpus_stream(
    spark: SparkSession,
    source_dir: str,
    table_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
) -> list[WriteStats]:
    """Drain all available document parquet files from ``source_dir``
    into the content-deduplicated corpus at ``table_path``; returns
    per-microbatch write stats (inserted = novel content, skipped =
    duplicate content). ``Trigger.AvailableNow`` + the checkpoint make
    re-runs pick up only new files; duplicate CONTENT inside new files
    is still screened — the two layers answer different failure modes
    (source re-delivery vs actual duplicate documents)."""
    stats: list[WriteStats] = []

    def screen_batch(batch_df: DataFrame, batch_id: int) -> None:
        with_digest = batch_df.withColumn(
            "digest", F.sha2(F.encode("text", "UTF-8"), 256)
        )
        s = idempotent_append(spark, with_digest, table_path, ["digest"])
        log.info(
            "corpus batch %d: %d novel, %d duplicate-content",
            batch_id, s.inserted, s.skipped,
        )
        stats.append(s)

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(screen_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats


def ingest_with_index(
    spark: SparkSession,
    source_dir: str,
    index_root: str,
    kept_path: str,
    checkpoint_dir: str,
    max_files_per_trigger: int | None = None,
    lm_root: str | None = None,
) -> list[dict]:
    """Streaming ingestion through the FULL stored dedup index
    (``pipelines/dedup_index.CorpusDedupIndex``) — the production
    upgrade of ``ingest_corpus_stream``'s digest-only screen: each
    micro-batch is screened against the accumulated exact (bloom +
    digest) AND near (MinHash band) tiers, survivors land in a
    transactional kept-docs table keyed on content digest, and the
    index absorbs them so the NEXT batch screens against everything
    seen so far.

    Keep policy mirrors the screen's verdict semantics: ``drop_exact``
    rows never land; ``review_near`` rows land WITH their verdict
    column (flagged for downstream adjudication — band collision is a
    candidate signal, not proof); ``keep`` rows land clean.

    Convergence under re-delivery, the property the test pins: a
    replayed micro-batch re-screens as all-drop_exact (its content is
    in the index now) and the kept table's digest key dedups any race
    remainder — state after N replays equals state after 1.

    ``lm_root`` (optional) threads the stored corpus LM
    (``pipelines/lm_index.CorpusLmIndex``) through the stream:
    survivors are SCORED against the accumulated LM and land with an
    ``unfamiliar`` flag — observational, never a drop, because the LM
    state evolves with the stream and a kept-set that depended on it
    would not replay deterministically (the flag is for downstream
    adjudication, exactly like ``review_near``). ``lm.add`` runs
    BEFORE the kept-merge: a crash between them replays the batch with
    the same content → same batch token → keyed no-op, so LM counts
    are never lost and never doubled.

    Returns one stats dict per micro-batch."""
    from finance_pipeline_spark.pipelines.dedup_index import CorpusDedupIndex
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    idx = CorpusDedupIndex(spark, index_root)
    kept = TxnKeyedTable(spark, kept_path, ["dg"])
    lm = None
    if lm_root is not None:
        from finance_pipeline_spark.pipelines.lm_index import CorpusLmIndex

        lm = CorpusLmIndex(spark, lm_root)
    stats: list[dict] = []

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        import time

        t0 = time.monotonic()
        batch_df = batch_df.localCheckpoint(eager=True)  # stream source
        # is single-pass; the screen + write below each traverse it.
        # The screen and survivor sets also feed MULTIPLE downstream
        # actions (merge, index add, two counts) — eager checkpoints
        # run the Python screen kernels exactly once per batch instead
        # of once per action.
        verdicts = idx.screen(batch_df).localCheckpoint(eager=True)
        survivors = batch_df.join(
            verdicts.filter(F.col("verdict") != "drop_exact").select(
                "doc_id", "verdict"
            ),
            "doc_id",
        ).localCheckpoint(eager=True)
        n_unfamiliar = 0
        if lm is not None:
            # score against the LM as it stood BEFORE this batch, then
            # grow it. screen_before excludes the batch's OWN delta
            # token, so a crash-replayed batch (whose counts are
            # already stored) scores against the identical state as
            # its first delivery — without that, replayed gibberish
            # would be judged against itself and flagged familiar.
            # Docs under 2 tokens get no score row → not unfamiliar;
            # an empty LM (first batch) scores nothing — there's no
            # corpus to disagree with yet.
            fam = lm.screen_before(
                survivors.select("doc_id", "lang", "text")
            )
            if fam is not None:
                survivors = survivors.join(
                    fam.select("doc_id", "unfamiliar"), "doc_id", "left"
                ).withColumn(
                    "unfamiliar", F.coalesce("unfamiliar", F.lit(False))
                )
            else:
                survivors = survivors.withColumn("unfamiliar", F.lit(False))
            survivors = survivors.localCheckpoint(eager=True)
            n_unfamiliar = survivors.filter(F.col("unfamiliar")).count()
            if survivors.limit(1).count():
                lm.add(survivors.select("doc_id", "lang", "text"))
        w = kept.merge(
            survivors.withColumn(
                "dg", F.sha2(F.encode("text", "UTF-8"), 256)
            )
        )
        a = idx.add(survivors.select("doc_id", "text"))
        n_batch = batch_df.count()
        s = {
            "batch_id": batch_id,
            "screened": n_batch,
            "kept": w.inserted,
            "dropped_exact": n_batch - w.inserted - w.skipped,
            "near_flagged": survivors.filter(
                F.col("verdict") == "review_near"
            ).count(),
            **({"lm_unfamiliar": n_unfamiliar} if lm is not None else {}),
            **a,
            # per-batch wall time: the scale signal — batch cost must
            # stay ~flat as the stored corpus grows (screen is bloom +
            # key-only probes, never a corpus rescan)
            "elapsed_sec": round(time.monotonic() - t0, 3),
        }
        log.info("indexed corpus batch %s", s)
        stats.append(s)

    reader = spark.readStream.schema(DOC_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    q = (
        reader.parquet(source_dir)
        .writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stats
