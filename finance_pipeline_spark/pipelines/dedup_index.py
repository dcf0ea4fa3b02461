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
- ``bloom/``    — key ``(range_idx, word_idx, token)``: RANGE-
  PARTITIONED Bloom bitmaps over stored digests (one independent
  2^20-bit bitmap per digest-prefix range, ``operators/dedup.
  _BLOOM_RANGES``) as APPEND-ONLY per-add delta word rows. Each
  ``add()`` inserts its batch's nonzero words under a
  content-addressed ``token`` (sha256 of the delta), and readers fold
  all rows with ``bit_or`` — a commutative, idempotent merge, so
  concurrent adds can NEVER lose each other's bits (a read-merge-
  overwrite scheme can: the loser's stale overwrite drops the
  winner's freshly OR'd words — permanent false negatives, i.e. docs
  admitted as duplicates forever). ``optimize()`` folds accumulated
  deltas back to one row-set per word. The folded bitmaps are loaded
  driver-side (RANGES x 128 KiB here) and broadcast each screen so
  the exact probe never shuffles stored digests; past ~10^10 digests
  each range's bitmap is resized and shipped independently — executor
  memory is capped per range, not per corpus.

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
    _BLOOM_RANGES,
    _MINHASH_BUCKET_CAP,
    bloom_maybe_contains_ranged,
    build_digest_bloom_ranged,
    minhash_band_rows,
    scaled_bloom_params,
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
        self.bloom = TxnKeyedTable(
            spark, f"{self.root}/bloom", ["range_idx", "word_idx", "token"]
        )
        self._maybe_migrate_bloom()

    def _maybe_migrate_bloom(self) -> None:
        """Bring a legacy bloom layout up to the current one (key
        ``[range_idx, word_idx, token]``, per-range delta rows) by
        REBUILD, not transform. The bloom is DERIVED state — a bitmap
        over the digests table, which is the source of truth — and
        range membership cannot be recovered from an already-OR'd
        monolithic bitmap, so any unrecognized layout (the pre-r8
        ``[word_idx]`` mutable rows, the r8 ``[word_idx, token]``
        un-ranged deltas, or a pre-r9 migration-backup sidecar) is
        dropped and rebuilt from the stored digests in one map-only
        pass.

        Crash safety is marker-first: (1) touch the ``bloom_rebuild_
        pending`` marker; (2) drop the legacy table; (3) rebuild from
        digests under a content-addressed token (keyed merge —
        idempotent); (4) remove the marker. A crash anywhere leaves
        the marker, and the next open redoes (2)-(4) — each step is
        idempotent, and the digests table is never touched, so no
        crash point can lose exact-screen coverage. (This replaces the
        r8 backup-sidecar scheme whose torn-backup corner an advisor
        flagged: with the digests table as the rebuild source there is
        no backup to tear.)"""
        import shutil
        from pathlib import Path

        marker = Path(self.root) / "bloom_rebuild_pending"
        legacy_backup = Path(self.root) / "bloom_migrate_v1.parquet"
        stored = self.bloom.read() if self.bloom.exists() else None
        needs = (
            marker.exists()
            or legacy_backup.exists()
            or (stored is not None and "range_idx" not in stored.columns)
        )
        if not needs:
            return
        marker.parent.mkdir(parents=True, exist_ok=True)
        marker.touch()
        shutil.rmtree(legacy_backup, ignore_errors=True)
        if self.bloom.exists():
            self.bloom.drop()
        self._rebuild_bloom_from_digests()
        marker.unlink(missing_ok=True)

    # -- range-count state (scaled_bloom_params, r9 verdict item 4) ----

    def _bloom_meta_path(self):
        from pathlib import Path

        return Path(self.root) / "bloom_meta.json"

    def _bloom_n_ranges(self) -> int:
        """The range count this index's stored word rows were ROUTED
        with. Persisted in ``bloom_meta.json`` at rebuild time; an
        index without the sidecar predates derived counts and keeps
        the historical ``_BLOOM_RANGES`` default — routing must match
        the stored rows, never the current corpus size (re-splitting
        is ``optimize``'s job, by rebuild)."""
        import json

        try:
            return int(
                json.loads(self._bloom_meta_path().read_text())["n_ranges"]
            )
        except (FileNotFoundError, ValueError, KeyError):
            return _BLOOM_RANGES

    def _derived_n_ranges(self) -> int:
        """What ``scaled_bloom_params`` prescribes for the CURRENT
        stored digest count, floored at the legacy default (shrinking
        below it buys nothing and would churn small indexes)."""
        dg = self.digests.read()
        n = dg.count() if dg is not None else 0
        return max(scaled_bloom_params(n)["n_ranges"], _BLOOM_RANGES)

    def _rebuild_bloom_from_digests(self) -> None:
        """One map-only pass over the stored digests → ranged delta
        rows under a content-addressed rebuild token, at the range
        count ``scaled_bloom_params`` derives from the digest count
        NOW (the sidecar records it for every later add/probe). At
        100 TB this reads the digests table once (32 B/doc, no text)
        — the one-time cost of a layout or range-count change, not a
        recurring one."""
        import hashlib
        import json
        import os

        import numpy as np

        n_ranges = self._derived_n_ranges()
        tmp = self._bloom_meta_path().with_suffix(".json.tmp")
        tmp.write_text(json.dumps({"n_ranges": n_ranges}))
        os.replace(tmp, self._bloom_meta_path())
        dg = self.digests.read()
        if dg is None:
            return
        words = build_digest_bloom_ranged(
            dg.select("dg"), n_ranges=n_ranges
        )
        nzr, nzw = np.nonzero(words)
        if not len(nzr):
            return
        token = "rebuild-" + hashlib.sha256(
            nzr.tobytes() + nzw.tobytes() + words[nzr, nzw].tobytes()
        ).hexdigest()
        rows = [
            (int(r), int(w), token, int(words[r, w]))
            for r, w in zip(nzr, nzw)
        ]
        self.bloom.merge(
            self.spark.createDataFrame(
                rows, "range_idx bigint, word_idx bigint, token string, word bigint"
            )
        )

    # -- read side ---------------------------------------------------

    def _bloom_words(self):
        """Fold every stored delta row into the live per-range bitmaps
        (shape ``(_BLOOM_RANGES, BITS/64)``): bit_or is associative/
        commutative, so any interleaving of concurrent adds reads back
        identically. The groupBy fold runs JVM-side; the driver
        collects ≤ RANGES x BITS/64 rows no matter how many add-tokens
        have accumulated."""
        import numpy as np

        from finance_pipeline_spark.operators.dedup import _BLOOM_BITS

        out = np.zeros(
            (self._bloom_n_ranges(), _BLOOM_BITS >> 6), dtype=np.int64
        )
        stored = self.bloom.read()
        if stored is not None:
            folded = (
                stored.groupBy("range_idx", "word_idx")
                .agg(F.bit_or("word").alias("word"))
                .collect()
            )
            for row in folded:
                out[row["range_idx"], row["word_idx"]] = row["word"]
        return out

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
            maybe = dgs.filter(
                bloom_maybe_contains_ranged(self.spark, words, F.col("dg"))
            )
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
        (snapshot isolation) and lose nothing.

        The bloom table additionally FOLDS its per-add delta rows back
        to one consolidated row-set (bit_or over the tokens seen at
        read time). Crash-safe order: merge the folded rows first,
        then delete exactly the tokens that were folded — a crash
        between the two leaves duplicate delta rows, which the
        read-side bit_or absorbs; a concurrent add() landing a NEW
        token meanwhile is untouched by the targeted delete.

        MAINTENANCE IS MUTUALLY EXCLUSIVE: the whole pass holds the
        index-root writer lock, so two concurrent ``optimize`` calls
        (double-fired cron, two operators) can't interleave their
        fold/delete windows — the second caller gets a loud
        ``ConcurrentWriteError`` naming the lock holder and simply
        retries next cadence (r8 verdict item 6). Concurrent ``add``
        calls remain lock-free and safe (append-only commutative
        deltas)."""
        from finance_pipeline_spark.sinks.keyed_writer import writer_lock

        with writer_lock(self.root, owner="dedup-index-optimize"):
            out = {}
            out["bloom_resplit"] = self._maybe_resplit_bloom()
            out["bloom_tokens_folded"] = self._fold_bloom_deltas()
            for name, table in (
                ("digests", self.digests),
                ("bands", self.bands),
                ("bloom", self.bloom),
            ):
                if table.exists():
                    before, after = table.compact(target_rows=target_rows)
                    out[name] = {"files_before": before, "files_after": after}
            return out

    def _maybe_resplit_bloom(self) -> dict | None:
        """RE-SPLIT when the corpus has outgrown its range count: if
        ``scaled_bloom_params`` over the current digest count derives
        more ranges than the stored rows were routed with, rebuild the
        bloom from the digests table at the new count (the same
        marker-first drop-and-rebuild the layout migration uses — the
        bloom is derived state, and range membership can't be
        recomputed from already-OR'd words). Runs under the caller's
        writer lock. Returns {from, to} when a re-split happened.

        Concurrency note (the family's standing maintenance rule):
        an ``add`` racing the re-split window could land word rows
        routed with the OLD count — its digests commit afterward and
        stay authoritative, but its bloom bits would probe wrong, so
        don't schedule adds concurrently with optimize on a growing
        index; generation-tagged tokens are the named upgrade if that
        discipline ever needs to be enforced in-band."""
        current, derived = self._bloom_n_ranges(), self._derived_n_ranges()
        if derived <= current:
            return None
        from pathlib import Path

        marker = Path(self.root) / "bloom_rebuild_pending"
        marker.parent.mkdir(parents=True, exist_ok=True)
        marker.touch()
        if self.bloom.exists():
            self.bloom.drop()
        self._rebuild_bloom_from_digests()
        marker.unlink(missing_ok=True)
        return {"from": current, "to": derived}

    def _fold_bloom_deltas(self) -> int:
        """Consolidate the bloom's per-add delta rows: bit_or every
        (range, word) across the token set seen NOW, write the result
        under one content-addressed fold token, then delete the folded
        tokens. Returns the number of tokens folded away (0 = nothing
        to do)."""
        import hashlib

        stored = self.bloom.read()
        if stored is None:
            return 0
        tokens = [r["token"] for r in stored.select("token").distinct().collect()]
        if len(tokens) <= 1:
            return 0
        folded = (
            stored.filter(F.col("token").isin(tokens))
            .groupBy("range_idx", "word_idx")
            .agg(F.bit_or("word").alias("word"))
            .collect()
        )
        triples = sorted(
            (int(r["range_idx"]), int(r["word_idx"]), int(r["word"]))
            for r in folded
        )
        fold_token = "fold-" + hashlib.sha256(repr(triples).encode()).hexdigest()
        rows = [(r, i, fold_token, w) for r, i, w in triples]
        self.bloom.merge(
            self.spark.createDataFrame(
                rows,
                "range_idx bigint, word_idx bigint, token string, word bigint",
            )
        )
        doomed = [t for t in tokens if t != fold_token]
        if doomed:
            self.bloom.delete(F.col("token").isin(doomed))
        return len(doomed)

    # -- write side --------------------------------------------------

    def add(self, batch: DataFrame) -> dict:
        """Fold a (doc_id, text) batch into the stored index. Returns
        per-table insert counts. Safe to re-run on the same batch AND
        safe under concurrent adds: digests merge first-wins, band rows
        are keyed on (band_key, doc_id), and the bloom update inserts a
        content-addressed DELTA row-set — same batch → same token →
        first-wins skip (idempotent); different batches → disjoint
        tokens whose rows commute under the read-side bit_or fold, so
        neither writer can overwrite the other's bits (lost bloom bits
        would be permanent false negatives: stored digests screening
        as 'keep' forever).

        Commit ORDER is load-bearing: bloom → bands → digests. A crash
        anywhere in the chain leaves a state a replay converges from —
        extra bloom bits are harmless false positives the confirm join
        kills; extra band rows only raise harmless review_near flags;
        and a doc whose digest did NOT commit still re-screens as a
        survivor (keep/review_near) on replay, so ``add`` runs again
        for it and backfills whatever is missing. The reverse order
        (digests before bands) breaks that: a replayed doc would
        screen drop_exact, never re-enter ``add``, and its band rows
        would be missing forever — future near-duplicates of it would
        screen 'keep'."""
        import hashlib

        import numpy as np

        # bloom delta: distributed RANGED build over the BATCH only
        # (the stored words are never read on the write path), then one
        # append-only merge of the nonzero words under a token derived
        # from their content.
        batch_words = build_digest_bloom_ranged(
            batch.select(_digest().alias("dg")),
            "dg",
            n_ranges=self._bloom_n_ranges(),
        )
        nzr, nzw = np.nonzero(batch_words)
        n_bloom = 0
        if len(nzr):
            token = hashlib.sha256(
                nzr.tobytes() + nzw.tobytes() + batch_words[nzr, nzw].tobytes()
            ).hexdigest()
            rows = [
                (int(r), int(w), token, int(batch_words[r, w]))
                for r, w in zip(nzr, nzw)
            ]
            df = self.spark.createDataFrame(
                rows,
                "range_idx bigint, word_idx bigint, token string, word bigint",
            )
            n_bloom = self.bloom.merge(df).inserted

        band_stats = self.bands.merge(
            minhash_band_rows(batch.select("doc_id", "text"))
        )

        dgs = batch.select(_digest().alias("dg"), F.col("doc_id").alias("first_doc_id"))
        dg_stats = self.digests.merge(dgs)
        return {
            "digests_inserted": dg_stats.inserted,
            "bands_inserted": band_stats.inserted,
            "bloom_words_touched": n_bloom,
        }
