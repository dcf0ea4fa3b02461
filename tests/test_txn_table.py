"""TxnKeyedTable: Delta-style commit-log semantics — atomic insert-if-
absent under concurrent writers, snapshot-isolated reads, time travel,
checkpoint compaction, and torn-write invisibility."""

from __future__ import annotations

import json
import threading

import pytest

from pyspark.sql import functions as F

from finance_pipeline_spark.sinks.txn_table import (
    CHECKPOINT_EVERY,
    TxnKeyedTable,
    current_snapshot,
)


def _batch(spark, keys, tag="x"):
    return spark.createDataFrame(
        [(int(k), f"{tag}{k}") for k in keys], "k bigint, v string"
    )


def test_merge_is_idempotent(spark, tmp_path):
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    s1 = t.merge(_batch(spark, range(10)))
    assert (s1.inserted, s1.skipped) == (10, 0)
    s2 = t.merge(_batch(spark, range(10)))
    assert (s2.inserted, s2.skipped) == (0, 10)
    df = t.read()
    assert df.count() == 10
    assert df.select("k").distinct().count() == 10


def test_lost_race_revalidates_against_conflict_delta(spark, tmp_path):
    """Writer A stages keys 0-9, then (via the test seam) writer B
    commits keys 5-15 first. A must detect the conflict, keep only
    0-4, and commit them — no duplicates, no lost rows, accurate
    accounting on BOTH writers."""
    path = str(tmp_path / "t")
    a = TxnKeyedTable(spark, path, ["k"])
    b = TxnKeyedTable(spark, path, ["k"])

    b_stats = {}

    def interleave(_version):
        b_stats["s"] = b.merge(_batch(spark, range(5, 16), tag="b"))

    a_stats = a.merge(_batch(spark, range(10), tag="a"), _before_commit=interleave)
    assert (b_stats["s"].inserted, b_stats["s"].skipped) == (11, 0)
    assert (a_stats.inserted, a_stats.skipped) == (5, 5)

    df = a.read()
    assert df.count() == 16
    assert df.select("k").distinct().count() == 16
    # B won the race, so contested keys 5-9 carry B's values.
    vals = {r.k: r.v for r in df.collect()}
    assert vals[7] == "b7" and vals[2] == "a2"


def test_lost_race_full_overlap_commits_nothing(spark, tmp_path):
    path = str(tmp_path / "t")
    a = TxnKeyedTable(spark, path, ["k"])
    b = TxnKeyedTable(spark, path, ["k"])

    def interleave(_version):
        b.merge(_batch(spark, range(10), tag="b"))

    a_stats = a.merge(_batch(spark, range(10), tag="a"), _before_commit=interleave)
    assert (a_stats.inserted, a_stats.skipped) == (0, 10)
    df = a.read()
    assert df.count() == 10
    assert {r.v for r in df.collect()} == {f"b{k}" for k in range(10)}
    # A committed nothing: the log holds only B's commit 0, and A's
    # abandoned staged files were deleted (no unreferenced garbage).
    snap = current_snapshot(path)
    assert snap.version == 0
    import pathlib

    data_files = {p.name for p in pathlib.Path(path, "data").glob("*.parquet")}
    assert data_files == set(snap.files)


def test_time_travel_reads_pinned_versions(spark, tmp_path):
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(3)))
    t.merge(_batch(spark, range(3, 6)))
    t.merge(_batch(spark, range(6, 9)))
    assert t.read(version=0).count() == 3
    assert t.read(version=1).count() == 6
    assert t.read().count() == 9
    with pytest.raises(ValueError):
        t.read(version=99)


def test_checkpoint_compacts_log_replay(spark, tmp_path):
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    n = CHECKPOINT_EVERY + 2
    for i in range(n):
        t.merge(_batch(spark, [i]))
    ck = tmp_path / "t" / "_txnlog" / f"{CHECKPOINT_EVERY:08d}.checkpoint.json"
    assert ck.exists()
    listed = json.loads(ck.read_text())
    assert len(listed["files"]) >= 1
    assert t.read().count() == n
    assert current_snapshot(str(tmp_path / "t")).version == n - 1


def test_uncommitted_files_are_invisible(spark, tmp_path):
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(5)))
    # A torn/abandoned write: a parquet part in data/ with no commit.
    stray = _batch(spark, range(100, 200)).withColumn(
        "created_at", F.current_timestamp()
    )
    stray.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "stray"))
    part = next((tmp_path / "stray").glob("*.parquet"))
    part.rename(tmp_path / "t" / "data" / "deadbeef-orphan.parquet")
    assert t.read().count() == 5


def test_threaded_writers_preserve_uniqueness(spark, tmp_path):
    """True racing threads (no seam): N writers, overlapping key
    ranges, all succeed; the table ends with every key exactly once
    and inserted-counts sum to the distinct-key total."""
    path = str(tmp_path / "t")
    ranges = [range(0, 40), range(20, 60), range(40, 80), range(0, 80, 2)]
    stats, errs = [None] * len(ranges), []
    barrier = threading.Barrier(len(ranges))

    def work(i, r):
        try:
            barrier.wait()
            t = TxnKeyedTable(spark, path, ["k"])
            stats[i] = t.merge(_batch(spark, r, tag=f"w{i}_"))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i, r)) for i, r in enumerate(ranges)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    t = TxnKeyedTable(spark, path, ["k"])
    df = t.read()
    assert df.count() == 80
    assert df.select("k").distinct().count() == 80
    assert sum(s.inserted for s in stats) == 80


def test_concurrent_snapshot_readers_never_see_torn_commits(tmp_path):
    """Root cause of the r11 full-suite flake: _try_commit used to
    claim the version file with O_EXCL and write the JSON afterwards,
    so a concurrent current_snapshot could glob the claimed-but-empty
    file and die in json.loads ("Expecting value: line 1 column 1").
    This hammer reproduced that in <0.2 s pre-fix; with the tmp+fsync+
    link publication a visible commit always carries complete JSON.
    No Spark needed — the race is pure filesystem."""
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    path = str(tmp_path / "t")

    class _PathOnly:
        def __init__(self, p):
            self.path = p

    fake = _PathOnly(path)
    stop = threading.Event()
    errs: list[str] = []

    n_commits = 5_000

    def writer():
        v = 1
        while not stop.is_set() and v <= n_commits:
            TxnKeyedTable._try_commit(fake, v, [f"f{v}.parquet"], 1)
            v += 1
        stop.set()

    def reader():
        from finance_pipeline_spark.sinks.txn_table import current_snapshot

        while not stop.is_set():
            try:
                current_snapshot(path)
            except Exception as e:  # noqa: BLE001
                errs.append(repr(e))
                stop.set()

    threads = [threading.Thread(target=writer)] + [
        threading.Thread(target=reader) for _ in range(4)
    ]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    # every published commit parses and the log is gap-free
    from finance_pipeline_spark.sinks.txn_table import current_snapshot

    snap = current_snapshot(path)
    assert snap.version == n_commits
    assert len(snap.files) == n_commits


def test_crashed_commit_leaves_no_torn_version_file(tmp_path):
    """A writer killed between staging its payload and the link claim
    must leave only an underscore tmp (invisible to log replay), never
    a torn version file — and vacuum reaps the aged tmp."""
    import os
    import time as _time
    from unittest import mock

    from finance_pipeline_spark.sinks.txn_table import (
        TxnKeyedTable,
        current_snapshot,
        vacuum,
    )

    path = str(tmp_path / "t")

    class _PathOnly:
        def __init__(self, p):
            self.path = p

    fake = _PathOnly(path)
    TxnKeyedTable._try_commit(fake, 1, ["a.parquet"], 1)
    log_dir = tmp_path / "t" / "_txnlog"

    # In-process failure at the claim: the error propagates, no torn
    # version file appears, AND the tmp is cleaned up (finally).
    with mock.patch("os.link", side_effect=OSError("claim failed")):
        with pytest.raises(OSError):
            TxnKeyedTable._try_commit(fake, 2, ["b.parquet"], 1)
    snap = current_snapshot(path)
    assert snap.version == 1 and snap.files == ("a.parquet",)
    assert not list(log_dir.glob("_*.tmp"))
    assert not (log_dir / "00000002.json").exists()

    # A writer KILLED mid-commit (no finally) leaves only the payload
    # tmp — plant one; replay must ignore it and vacuum reaps it aged.
    tmp = log_dir / "_commit_deadbeef.json.tmp"
    tmp.write_text('{"version": 2, "adds": ["torn.parquet"]')  # torn JSON
    assert current_snapshot(path).version == 1  # invisible to replay
    assert vacuum(path) == []  # fresh: inside the retention window
    past = _time.time() - 8 * 24 * 3600
    os.utime(tmp, (past, past))
    gone = vacuum(path)
    assert tmp.name in gone and not tmp.exists()
    assert current_snapshot(path).version == 1  # log untouched


def test_vacuum_removes_only_aged_orphans(spark, tmp_path):
    import os
    import time

    from finance_pipeline_spark.sinks.txn_table import vacuum

    path = str(tmp_path / "t")
    t = TxnKeyedTable(spark, path, ["k"])
    t.merge(_batch(spark, range(5)))
    data = tmp_path / "t" / "data"

    # plant two orphans: one "old" (crash leftover), one fresh
    # (a concurrent writer could be mid-merge)
    old = data / "deadbeef-old-orphan.parquet"
    fresh = data / "deadbeef-fresh-orphan.parquet"
    committed = next(data.glob("*.parquet"))
    for p in (old, fresh):
        p.write_bytes(committed.read_bytes())
    past = time.time() - 8 * 24 * 3600
    os.utime(old, (past, past))
    os.utime(committed, (past, past))  # committed + old: must SURVIVE

    gone = vacuum(path)
    assert gone == [old.name]
    assert fresh.exists()  # inside retention window
    assert committed.exists()  # referenced by the log — age-proof
    assert t.read().count() == 5  # table unharmed


def test_upsert_updates_matched_inserts_new(spark, tmp_path):
    from finance_pipeline_spark.sinks.txn_table import UpsertStats

    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(10), tag="a"))
    s = t.upsert(_batch(spark, range(5, 15), tag="b"))
    assert s == UpsertStats(inserted=5, updated=5)
    df = t.read()
    assert df.count() == 15
    vals = {r.k: r.v for r in df.collect()}
    assert vals[3] == "a3" and vals[7] == "b7" and vals[12] == "b12"
    # keys stay unique after the rewrite
    assert df.select("k").distinct().count() == 15


def test_upsert_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write granularity: commits land each batch in separate
    files; an upsert matching only batch-2 keys must remove/rewrite
    batch-2's files and leave batch-1's untouched."""
    path = str(tmp_path / "t")
    t = TxnKeyedTable(spark, path, ["k"])
    t.merge(_batch(spark, range(0, 5), tag="a"))
    snap1 = current_snapshot(path)
    t.merge(_batch(spark, range(100, 105), tag="a"))
    t.upsert(_batch(spark, range(100, 105), tag="b"))
    import json as _json
    from pathlib import Path as _P

    entry = _json.loads(
        (_P(path) / "_txnlog" / f"{2:08d}.json").read_text()
    )
    assert entry["removes"]  # something was logically removed
    assert not set(entry["removes"]) & set(snap1.files)  # batch-1 intact
    final = current_snapshot(path)
    assert set(snap1.files) <= set(final.files)
    vals = {r.k: r.v for r in t.read().collect()}
    assert vals[2] == "a2" and vals[102] == "b102"


def test_upsert_lost_race_restarts_from_fresh_snapshot(spark, tmp_path):
    """Writer A stages an upsert, then (via the seam) writer B commits
    an overlapping upsert first. A must discard, restage against B's
    state and win the next slot: serial order B -> A, so contested
    keys carry A's values and nothing is lost or duplicated."""
    path = str(tmp_path / "t")
    a = TxnKeyedTable(spark, path, ["k"])
    b = TxnKeyedTable(spark, path, ["k"])
    a.merge(_batch(spark, range(10), tag="seed"))

    b_stats = {}

    def interleave(_version):
        b_stats["s"] = b.upsert(_batch(spark, range(5, 12), tag="b"))

    a_stats = a.upsert(_batch(spark, range(8, 14), tag="a"), _before_commit=interleave)
    assert (b_stats["s"].inserted, b_stats["s"].updated) == (2, 5)
    # A restarted against B's state: keys 8-11 already exist there
    assert (a_stats.inserted, a_stats.updated) == (2, 4)
    df = a.read()
    assert df.count() == 14
    assert df.select("k").distinct().count() == 14
    vals = {r.k: r.v for r in df.collect()}
    assert vals[3] == "seed3" and vals[6] == "b6" and vals[9] == "a9" and vals[13] == "a13"


def test_threaded_upserts_keep_keys_unique(spark, tmp_path):
    """True racing upserts: overlapping key ranges, all succeed, every
    key exactly once, and each key's value comes from SOME writer's
    batch (serializability smoke: no torn rows, no resurrection)."""
    path = str(tmp_path / "t")
    t0 = TxnKeyedTable(spark, path, ["k"])
    t0.merge(_batch(spark, range(0, 30), tag="seed"))
    ranges = [range(0, 20), range(10, 40), range(25, 50)]
    stats, errs = [None] * len(ranges), []
    barrier = threading.Barrier(len(ranges))

    def work(i, r):
        try:
            barrier.wait()
            t = TxnKeyedTable(spark, path, ["k"])
            stats[i] = t.upsert(_batch(spark, r, tag=f"w{i}_"))
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=work, args=(i, r)) for i, r in enumerate(ranges)]
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    assert not errs, errs
    df = TxnKeyedTable(spark, path, ["k"]).read()
    assert df.count() == 50
    assert df.select("k").distinct().count() == 50
    writers_of = {k: {f"w{i}_{k}" for i, r in enumerate(ranges) if k in r} for k in range(50)}
    for r in df.collect():
        allowed = writers_of[r.k] | ({f"seed{r.k}"} if r.k < 30 and not writers_of[r.k] else set())
        assert r.v in allowed, (r.k, r.v, allowed)


def test_upsert_time_travel_spans_removes(spark, tmp_path):
    """Old versions still resolve after their files were logically
    removed by a later upsert commit."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(5), tag="a"))
    t.upsert(_batch(spark, range(5), tag="b"))
    assert {r.v for r in t.read(version=0).collect()} == {f"a{k}" for k in range(5)}
    assert {r.v for r in t.read(version=1).collect()} == {f"b{k}" for k in range(5)}
    assert t.read().count() == 5


def test_diff_reports_inserts_updates_deletes(spark, tmp_path):
    """CDF between versions: upserting b5..b12 over a0..a9 yields
    updates on 5-9 and inserts on 10-12; unchanged keys don't appear;
    same-value upserts are not phantom updates."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(10), tag="a"))  # v0
    t.upsert(_batch(spark, range(5, 13), tag="b"))  # v1
    rows = {r.k: (r._change, r.v) for r in t.diff(0, 1).collect()}
    assert rows == {
        **{k: ("update", f"b{k}") for k in range(5, 10)},
        **{k: ("insert", f"b{k}") for k in range(10, 13)},
    }
    # re-upserting identical values produces an EMPTY feed
    t.upsert(_batch(spark, range(5, 13), tag="b"))  # v2, no value change
    assert t.diff(1, 2).count() == 0


def test_delete_where_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write DELETE: matching rows disappear, untouched files
    survive as-is, old versions still read the deleted rows (time
    travel), and a no-match predicate commits nothing."""
    path = str(tmp_path / "t")
    t = TxnKeyedTable(spark, path, ["k"])
    t.merge(_batch(spark, range(0, 5), tag="a"))  # v0
    snap0 = current_snapshot(path)
    t.merge(_batch(spark, range(100, 105), tag="a"))  # v1

    n = t.delete(F.col("k") >= 100)  # touches only batch-2 files
    assert n == 5
    assert {r.k for r in t.read().collect()} == set(range(5))
    final = current_snapshot(path)
    assert final.version == 2
    assert set(snap0.files) <= set(final.files)  # batch-1 untouched
    # time travel still sees the deleted rows
    assert t.read(version=1).count() == 10
    # no-match delete is a no-op commit-wise
    assert t.delete(F.col("k") == 9999) == 0
    assert current_snapshot(path).version == 2


def test_delete_lost_race_restarts(spark, tmp_path):
    """Writer A stages a delete, writer B commits an overlapping upsert
    first (via the seam): A restarts against B's state, so B's updated
    row for a contested key is deleted too — serial order B -> A."""
    path = str(tmp_path / "t")
    a = TxnKeyedTable(spark, path, ["k"])
    b = TxnKeyedTable(spark, path, ["k"])
    a.merge(_batch(spark, range(10), tag="seed"))

    def interleave(_version):
        b.upsert(_batch(spark, range(4, 7), tag="b"))

    n = a.delete(F.col("k") < 6, _before_commit=interleave)
    assert n == 6
    vals = {r.k: r.v for r in a.read().collect()}
    assert set(vals) == {6, 7, 8, 9}
    assert vals[6] == "b6"  # B's upsert survived for the uncontested key


def test_schema_evolution_additive_column(spark, tmp_path):
    """A batch with a NEW column merges; old rows read it as null, and
    the upsert path carries the widened schema through its rewrite."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(3), tag="a"))
    widened = spark.createDataFrame(
        [(5, "b5", "extra5"), (1, "b1", "extra1")], "k bigint, v string, w string"
    )
    s = t.upsert(widened)
    assert (s.inserted, s.updated) == (1, 1)
    rows = {r.k: (r.v, r.w) for r in t.read().collect()}
    assert rows[5] == ("b5", "extra5") and rows[1] == ("b1", "extra1")
    assert rows[0] == ("a0", None) and rows[2] == ("a2", None)


def test_delete_preserves_null_predicate_rows(spark, tmp_path):
    """Rows where the delete predicate evaluates to NULL are NOT
    matches — they must survive the rewrite, not silently vanish
    (round-6 review: bare ~condition drops them from both sides)."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, "y")], "k bigint, v string"
    )
    t.merge(df)
    n = t.delete(F.col("v") == "x")
    assert n == 1
    rows = {r.k: r.v for r in t.read().collect()}
    assert rows == {2: None, 3: "y"}


def test_vacuum_never_deletes_files_of_any_committed_version(spark, tmp_path):
    """An upsert logically removes v0's files from the LATEST snapshot,
    but v0 still references them: vacuum must not reclaim them even
    past retention — time travel and diff() depend on it."""
    import os
    import time

    from finance_pipeline_spark.sinks.txn_table import vacuum

    path = str(tmp_path / "t")
    t = TxnKeyedTable(spark, path, ["k"])
    t.merge(_batch(spark, range(5), tag="a"))  # v0
    t.upsert(_batch(spark, range(5), tag="b"))  # v1: removes v0's files
    data = tmp_path / "t" / "data"
    past = time.time() - 8 * 24 * 3600
    for p in data.glob("*.parquet"):
        os.utime(p, (past, past))
    assert vacuum(path) == []  # every file belongs to SOME version
    # v0 remains fully readable and the CDF still resolves
    assert {r.v for r in t.read(version=0).collect()} == {f"a{k}" for k in range(5)}
    assert t.diff(0, 1).count() == 5


def test_history_lists_every_commit(spark, tmp_path):
    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(spark.createDataFrame([(1, "a"), (2, "b")], "k bigint, v string"))
    t.merge(spark.createDataFrame([(2, "x"), (3, "c")], "k bigint, v string"))
    t.upsert(spark.createDataFrame([(3, "new")], "k bigint, v string"))
    h = t.history()
    assert [e["version"] for e in h] == [0, 1, 2]
    assert h[0]["inserted"] == 2
    assert h[1]["inserted"] == 1  # key 2 skipped
    assert h[2]["removes"] >= 1  # upsert rewrote the file holding key 3


def test_threaded_compact_racing_merge_loses_and_retries(spark, tmp_path):
    """compact() racing a foreground merge: both eventually commit,
    nothing is lost — the compaction's conservative restart-on-conflict
    either re-stages against the post-merge snapshot or the merge
    lands after the rewrite; the final table holds every key once."""
    path = str(tmp_path / "t")
    t0 = TxnKeyedTable(spark, path, ["k"])
    for i in range(4):
        t0.merge(_batch(spark, range(i * 25, i * 25 + 25)).coalesce(1))

    errs = []
    results = {}
    barrier = threading.Barrier(2)

    def compactor():
        try:
            barrier.wait()
            results["compact"] = TxnKeyedTable(spark, path, ["k"]).compact(
                target_rows=50
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    def merger():
        try:
            barrier.wait()
            results["merge"] = TxnKeyedTable(spark, path, ["k"]).merge(
                _batch(spark, range(90, 130), tag="m")
            )
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    ths = [threading.Thread(target=compactor), threading.Thread(target=merger)]
    for th in ths:
        th.start()
    for th in ths:
        th.join()
    assert not errs, errs
    t = TxnKeyedTable(spark, path, ["k"])
    df = t.read()
    assert df.count() == 130
    assert df.select("k").distinct().count() == 130
    # merge semantics intact across the race: pre-existing keys kept
    # their first value, novel keys carry the merger's tag
    vals = {r.k: r.v for r in df.filter(F.col("k").isin(95, 129)).collect()}
    assert vals[95] == "x95" and vals[129] == "m129"
    assert results["merge"].inserted == 30  # 100..129 novel


def test_restore_rolls_back_as_a_new_commit(spark, tmp_path):
    """RESTORE semantics: metadata-only rollback, history grows
    forward, stats resurrect for skipping, and restore of a restore
    round-trips."""
    from finance_pipeline_spark.sinks.txn_table import (
        TxnKeyedTable,
        current_snapshot,
    )

    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(10)))  # v0
    v_before = current_snapshot(t.path).version
    t.upsert(_batch(spark, [3, 4], tag="new"))  # v1: rewrites a file
    t.merge(_batch(spark, range(20, 25)))  # v2: appends
    assert t.read().count() == 15

    v_restored = t.restore(v_before)
    assert v_restored == current_snapshot(t.path).version
    got = t.read()
    assert got.count() == 10
    assert {r.v for r in got.filter(F.col("k").isin(3, 4)).collect()} == {
        "x3", "x4",
    }  # the upsert's rewrite is rolled back
    # stats resurrected: bounds pruning still functions post-restore
    assert t.files_for(bounds={"k": (0, 9)}) != []
    # the rolled-back versions still time-travel
    assert t.read(version=v_before + 2).count() == 15
    # restore of a restore returns to the later state
    t.restore(v_before + 2)
    assert t.read().count() == 15

    # bad version raises
    import pytest as _pytest

    with _pytest.raises(ValueError):
        t.restore(999)


def test_commit_publication_survives_no_hardlink_filesystem(tmp_path):
    """os.link fails with EPERM on filesystems without hard-link
    support (r13 advisor): _try_commit must fall back to the atomic
    rename path — commit succeeds, payload is complete JSON, and a
    duplicate version is still refused (probe-strength there)."""
    import errno
    import os as _os
    from unittest import mock

    from finance_pipeline_spark.sinks.txn_table import (
        TxnKeyedTable,
        _commit_file,
        current_snapshot,
    )

    path = str(tmp_path / "t")

    class _PathOnly:
        def __init__(self, p):
            self.path = p

    fake = _PathOnly(path)
    real_link = _os.link

    def no_link(*a, **k):
        raise OSError(errno.EPERM, "hard links not supported")

    with mock.patch("os.link", side_effect=no_link):
        assert TxnKeyedTable._try_commit(fake, 1, ["a.parquet"], 1)
        # payload readable + complete
        body = json.loads(_commit_file(path, 1).read_text())
        assert body["adds"] == ["a.parquet"] and body["version"] == 1
        # duplicate version refused via the exists-probe
        assert not TxnKeyedTable._try_commit(fake, 1, ["b.parquet"], 1)
    assert _os.link is real_link
    # the log replays normally afterwards
    snap = current_snapshot(path)
    assert snap.version == 1 and list(snap.files) == ["a.parquet"]
    # no tmp litter left behind
    leftovers = [
        p for p in (tmp_path / "t" / "_txnlog").iterdir() if "tmp" in p.name
    ]
    assert leftovers == []


def test_restore_rejects_negative_version(spark, tmp_path):
    """restore(-1) must raise, not truncate: the empty pre-table
    snapshot also carries version -1, so without the explicit guard
    the 'last element' idiom would silently empty the table."""
    import pytest as _pytest

    from finance_pipeline_spark.sinks.txn_table import TxnKeyedTable

    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    t.merge(_batch(spark, range(5)))
    with _pytest.raises(ValueError):
        t.restore(-1)
    assert t.read().count() == 5
