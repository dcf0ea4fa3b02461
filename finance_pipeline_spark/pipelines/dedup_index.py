"""Stored corpus dedup index — the persistent form of the
``dedup_incremental`` / ``dedup_bloom_screen`` screens.

Those queries derive both sides from one table per run; a production
corpus can't re-hash 100 TB per batch. This component makes the
"stored/appendable index" their docstrings promise real: three
transactional tables (``sinks/txn_table.py``) accumulate the corpus
state, and each arriving batch costs hashing the BATCH plus bounded
probes —

- ``digests/``  — key ``dg`` (sha256 hex), value: first owning doc_id.
  The exact tier. First-wins ``merge`` makes re-adds idempotent.
- ``bands/``    — key ``(band_key, doc_id)``: the MinHash-LSH band
  index (8 bands × 4 rows, ``operators/dedup.minhash_band_rows``).
  The near tier.
- ``bloom/``    — key ``word_idx``, value ``word``: the 2^20-bit Bloom
  bitmap over stored digests as ≤16384 bigint words, OR-maintained via
  ``upsert``. Loaded driver-side (≤128 KiB) and broadcast each screen
  so the exact probe never shuffles stored digests.

At 100 TB: write the bands table bucketed on ``band_key`` (see
``sinks/bucketed.py``) so the near probe co-locates without shuffling
the stored side; the digests table never shuffles at all (bloom
pre-filter + broadcast confirm); the bloom table is trivially small.
Parity: the screen's verdict semantics match ``dedup_incremental``
(reference etl/csv_loader.py:124-133 — UNIQUE-key skip generalized to
content identity), with the same over-cap band guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from finance_pipeline_spark.operators.dedup import (
    _MINHASH_BUCKET_CAP,
    bloom_maybe_contains,
    build_digest_bloom,
    minhash_band_rows,
)
from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable


def _digest():
    """sha256-hex of the text column — built lazily (a Column wraps a
    JVM object, so a module-level constant would need a live context
    at import time)."""
    return F.sha2(F.encode("text", "UTF-8"), 256)


class CorpusDedupIndex:
    """Append-only dedup state over (doc_id, text) batches.

    Typical loop::

        idx = CorpusDedupIndex(spark, "/warehouse/dedup_index")
        verdicts = idx.screen(batch)          # doc_id → keep/drop/review
        idx.add(batch.join(keeps, "doc_id"))  # fold survivors into state

    ``screen`` is read-only; ``add`` is transactional per table and
    idempotent under re-delivery (first-wins digest merge, keyed band
    merge, OR-monotone bloom words), so a crashed-and-retried batch
    converges to the same index."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = str(root)
        self.digests = TxnKeyedTable(spark, f"{self.root}/digests", ["dg"])
        self.bands = TxnKeyedTable(
            spark, f"{self.root}/bands", ["band_key", "doc_id"]
        )
        self.bloom = TxnKeyedTable(spark, f"{self.root}/bloom", ["word_idx"])

    # -- read side ---------------------------------------------------

    def _bloom_words(self):
        import numpy as np

        from finance_pipeline_spark.operators.dedup import _BLOOM_BITS

        out = np.zeros(_BLOOM_BITS >> 6, dtype=np.int64)
        stored = self.bloom.read()
        if stored is not None:
            for row in stored.select("word_idx", "word").collect():
                out[row["word_idx"]] = row["word"]
        return out.view(np.uint64)

    def screen(self, batch: DataFrame) -> DataFrame:
        """(doc_id, text) batch → (doc_id, exact_dup, near_dup,
        verdict) against the STORED corpus — same tiers and verdicts
        as ``dedup_incremental``: ``drop_exact`` (stored digest match),
        ``review_near`` (stored band-key hit — candidate, not proof),
        ``keep``.

        Cost shape: one map pass hashing the batch; the exact tier is
        bloom-prefilter + broadcast-confirm (stored digests consumed
        map-only, never shuffled); the near tier ships the batch's
        ≤8·|batch| band keys into a semi-probe of the stored band
        index, with the over-cap bucket guard computed on just the
        matching slice."""
        dgs = batch.select("doc_id", _digest().alias("dg"))

        # exact tier — bloom + broadcast confirm (dedup_bloom_screen's
        # shape, against the stored table)
        stored_dg = self.digests.read()
        if stored_dg is None:
            exact_ids = dgs.select("doc_id").filter(F.lit(False))
        else:
            words = self._bloom_words()
            maybe = dgs.filter(bloom_maybe_contains(self.spark, words, F.col("dg")))
            confirmed = (
                stored_dg.select("dg")
                .join(F.broadcast(maybe.select("dg").distinct()), "dg", "left_semi")
                .distinct()
            )
            exact_ids = maybe.join(F.broadcast(confirmed), "dg", "left_semi").select(
                "doc_id"
            )

        # near tier — batch band rows vs the stored band index
        stored_bands = self.bands.read()
        if stored_bands is None:
            near_ids = dgs.select("doc_id").filter(F.lit(False))
        else:
            # band rows feed two branches of one plan (the semi-probe
            # and the final near_ids join); materialize once so the
            # Python signature kernel doesn't re-run per branch —
            # dedup_incremental's measured pitfall
            probe = minhash_band_rows(batch.select("doc_id", "text")).localCheckpoint(
                eager=True
            )
            matching = stored_bands.select("band_key", "doc_id").join(
                probe.select("band_key").distinct(), "band_key", "left_semi"
            )
            # over-cap guard on the matching slice only: the semi-join
            # keeps EVERY stored row of a matching band_key, so the
            # count is the true corpus bucket size for those keys
            from pyspark.sql import Window as W

            capped = (
                matching.withColumn(
                    "bucket_n", F.count(F.lit(1)).over(W.partitionBy("band_key"))
                )
                .filter(F.col("bucket_n") <= _MINHASH_BUCKET_CAP)
                .select("band_key")
            )
            near_ids = (
                probe.join(capped, "band_key", "left_semi")
                .select("doc_id")
                .distinct()
            )

        return (
            batch.select("doc_id")
            .join(exact_ids.withColumn("exact_hit", F.lit(True)), "doc_id", "left")
            .join(near_ids.withColumn("near_hit", F.lit(True)), "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("exact_hit", F.lit(False)).alias("exact_dup"),
                F.coalesce("near_hit", F.lit(False)).alias("near_dup"),
                F.when(F.col("exact_hit"), F.lit("drop_exact"))
                .when(F.col("near_hit"), F.lit("review_near"))
                .otherwise(F.lit("keep"))
                .alias("verdict"),
            )
        )

    # -- maintenance -------------------------------------------------

    def optimize(self, target_rows: int = 1_000_000) -> dict:
        """Compact all three index tables (key-sorted bin-pack). After
        months of per-batch appends the digests and bands tables are
        thousands of domain-spanning small files; compaction restores
        range-disjoint sorted files, so the per-file key blooms give
        way to near-exact min/max pruning on the digest/band-key
        probes and the file-open overhead drops to ceil(rows/target).
        Run from the same background cadence as any OPTIMIZE job —
        screens racing a compaction read the pre-compaction snapshot
        (snapshot isolation) and lose nothing."""
        out = {}
        for name, table in (
            ("digests", self.digests),
            ("bands", self.bands),
            ("bloom", self.bloom),
        ):
            if table.exists():
                before, after = table.compact(target_rows=target_rows)
                out[name] = {"files_before": before, "files_after": after}
        return out

    # -- write side --------------------------------------------------

    def add(self, batch: DataFrame) -> dict:
        """Fold a (doc_id, text) batch into the stored index. Returns
        per-table insert counts. Safe to re-run on the same batch:
        digests merge first-wins, band rows are keyed on (band_key,
        doc_id), and the bloom update ORs — all idempotent.

        Commit ORDER is load-bearing: the bloom words land FIRST.
        ``screen`` trusts the bloom to have no false negatives against
        the digests table, so a crash between the two commits must
        only ever leave EXTRA bloom bits (harmless false positives the
        confirm join kills), never digests the bloom doesn't know —
        those would be admitted as duplicates forever."""
        import numpy as np

        # bloom: OR the batch's words into the stored words. Both sides
        # are ≤16384 rows — driver arithmetic, then one keyed upsert of
        # the rows that actually changed.
        batch_words = build_digest_bloom(
            batch.select(_digest().alias("dg")), "dg"
        ).view(np.int64)
        stored = self._bloom_words().view(np.int64)
        merged = stored | batch_words
        changed = np.nonzero(merged != stored)[0]
        n_bloom = 0
        if len(changed):
            rows = [(int(i), int(merged[i])) for i in changed]
            df = self.spark.createDataFrame(rows, "word_idx bigint, word bigint")
            up = self.bloom.upsert(df)
            n_bloom = up.inserted + up.updated

        dgs = batch.select(_digest().alias("dg"), F.col("doc_id").alias("first_doc_id"))
        dg_stats = self.digests.merge(dgs)

        band_stats = self.bands.merge(
            minhash_band_rows(batch.select("doc_id", "text"))
        )
        return {
            "digests_inserted": dg_stats.inserted,
            "bands_inserted": band_stats.inserted,
            "bloom_words_touched": n_bloom,
        }
