"""TxnKeyedTable data skipping: per-file min/max stats recorded at
commit time (parquet footers, no extra data pass) and used to prune
(a) ``read(bounds=...)`` file lists and (b) the existing-key probes of
``merge``/``upsert`` — the Delta-style feature a keyed 100 TB table
needs so a point lookup opens a handful of files, not all of them."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from finance_pipeline_spark.sinks.txn_table import (
    TxnKeyedTable,
    _commit_file,
    current_snapshot,
)


def _batch(spark, keys, tag="x"):
    return spark.createDataFrame(
        [(int(k), f"{tag}{k}") for k in keys], "k bigint, v string"
    )


@pytest.fixture()
def banded(spark, tmp_path):
    """Three commits with disjoint key bands: [0,100), [100,200),
    [200,300) — each staged as a single file (coalesced input)."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    for lo in (0, 100, 200):
        t.merge(_batch(spark, range(lo, lo + 100)).coalesce(1))
    return t


def test_commit_records_minmax_stats(banded):
    snap = current_snapshot(banded.path)
    assert len(snap.files) == 3
    ranges = set()
    for f in snap.files:
        tag, lo, hi = snap.stats[f]["k"]
        assert tag == "int"
        ranges.add((lo, hi))
    assert ranges == {(0, 99), (100, 199), (200, 299)}
    # value column stats ride along too (string min/max)
    assert all(snap.stats[f]["v"][0] == "str" for f in snap.files)


def test_read_bounds_prunes_to_overlapping_files(banded):
    snap = current_snapshot(banded.path)
    keep = banded.files_for(bounds={"k": (150, 160)})
    assert len(keep) == 1
    assert snap.stats[keep[0]]["k"][1:] == [100, 199]
    # the pruned read still returns exactly the predicate's rows
    got = banded.read(bounds={"k": (150, 160)}).filter(
        F.col("k").between(150, 160)
    )
    assert sorted(r.k for r in got.collect()) == list(range(150, 161))
    # open-ended bounds prune one side only
    assert len(banded.files_for(bounds={"k": (None, 99)})) == 1
    assert len(banded.files_for(bounds={"k": (100, None)})) == 2
    # and a no-bounds call keeps everything
    assert len(banded.files_for()) == 3


def test_read_bounds_outside_every_file_is_empty_with_schema(banded):
    out = banded.read(bounds={"k": (1000, 2000)})
    assert out.count() == 0
    assert set(out.columns) >= {"k", "v"}


def test_merge_probe_prunes_but_still_dedups(banded, spark):
    # overlaps only the middle band: 5 existing keys + 5 new
    stats = banded.merge(_batch(spark, range(150, 160), tag="y"))
    assert (stats.inserted, stats.skipped) == (0, 10)
    stats = banded.merge(_batch(spark, [155, 156, 300, 301, 302]))
    assert (stats.inserted, stats.skipped) == (3, 2)
    # table still unique on k
    total = banded.read().count()
    assert total == 303
    assert banded.read().select("k").distinct().count() == 303


def test_merge_disjoint_batch_skips_probe_entirely(banded, spark):
    stats = banded.merge(_batch(spark, range(500, 510)))
    assert (stats.inserted, stats.skipped) == (10, 0)
    assert banded.read().count() == 310


def test_upsert_prunes_rewrite_to_overlapping_files(banded, spark):
    snap_before = current_snapshot(banded.path)
    up = banded.upsert(_batch(spark, [150, 151, 400], tag="new"))
    assert (up.inserted, up.updated) == (1, 2)
    entry = json.loads(
        _commit_file(banded.path, current_snapshot(banded.path).version).read_text()
    )
    # only the middle-band file was rewritten; bands 1 and 3 untouched
    removed = set(entry["removes"])
    assert len(removed) == 1
    (rm,) = removed
    assert snap_before.stats[rm]["k"][1:] == [100, 199]
    rows = {r.k: r.v for r in banded.read().filter(F.col("k").isin(150, 151, 400)).collect()}
    assert rows == {150: "new150", 151: "new151", 400: "new400"}


def test_upsert_empty_batch_claims_no_commit(banded, spark):
    v_before = current_snapshot(banded.path).version
    up = banded.upsert(_batch(spark, []))
    assert (up.inserted, up.updated) == (0, 0)
    assert current_snapshot(banded.path).version == v_before


def test_statless_legacy_commit_is_never_pruned(banded):
    """A commit written before stats existed (or by another writer)
    must always survive pruning — skipping is an optimization, never a
    filter."""
    snap = current_snapshot(banded.path)
    legacy = snap.files[0]
    entry_path = _commit_file(banded.path, 0)
    entry = json.loads(entry_path.read_text())
    entry.pop("stats", None)
    entry_path.write_text(json.dumps(entry))
    keep = banded.files_for(bounds={"k": (1000, 2000)})
    assert keep == [legacy]


def test_stats_survive_checkpoint_compaction(spark, tmp_path):
    from finance_pipeline_spark.sinks.txn_table import CHECKPOINT_EVERY

    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    for i in range(CHECKPOINT_EVERY + 1):
        t.merge(_batch(spark, range(i * 10, i * 10 + 10)).coalesce(1))
    snap = current_snapshot(t.path)
    assert snap.version == CHECKPOINT_EVERY
    # every live file still has its stats after checkpoint replay
    assert set(snap.stats) == set(snap.files)
    assert len(t.files_for(bounds={"k": (0, 5)})) == 1


def test_delete_drops_removed_file_stats(banded, spark):
    n = banded.delete(F.col("k").between(100, 149))
    assert n == 50
    snap = current_snapshot(banded.path)
    # the removed file's stats are gone, every live file has an entry,
    # and the survivor rewrite's stats reflect the narrowed range
    assert set(snap.stats) == set(snap.files)
    assert len(banded.files_for(bounds={"k": (100, 149)})) == 0
    assert banded.read(bounds={"k": (150, 199)}).filter(
        F.col("k").between(150, 199)
    ).count() == 50


def test_delete_keys_prunes_probe_and_removes_rows(banded, spark):
    kdf = spark.createDataFrame([(150,), (151,), (9999,)], "k bigint")
    n = banded.delete_keys(kdf)
    assert n == 2
    snap = current_snapshot(banded.path)
    assert set(snap.stats) == set(snap.files)
    got = banded.read()
    assert got.count() == 298
    assert got.filter(F.col("k").isin(150, 151)).count() == 0
    # a key set entirely outside every file's range touches nothing
    v = snap.version
    assert banded.delete_keys(spark.createDataFrame([(7777,)], "k bigint")) == 0
    assert current_snapshot(banded.path).version == v


def test_compact_bin_packs_sorts_and_sharpens_skipping(spark, tmp_path):
    """Interleaved-key commits leave every file spanning the whole key
    domain — stats skipping prunes nothing. compact() bin-packs the
    live snapshot into key-range-disjoint sorted files in ONE commit:
    same logical table, point lookups open one file, history intact."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    for i in range(6):
        t.merge(_batch(spark, range(i, 600, 6)).coalesce(1))
    before = current_snapshot(t.path)
    assert len(before.files) == 6
    # every append spans ~[0, 600): the RANGE stats prune nothing (the
    # per-file bloom still nails the point lookup — that's its test);
    # compaction's win here is range disjointness + file count
    assert len(t.files_for(bounds={"k": (100, 400)})) == 6

    fb, fa = t.compact(target_rows=200)
    assert (fb, fa) == (6, 3)
    after = current_snapshot(t.path)
    assert set(after.stats) == set(after.files)
    # logically unchanged
    got = t.read()
    assert got.count() == 600
    assert got.select("k").distinct().count() == 600
    assert {r.v for r in got.filter(F.col("k") == 303).collect()} == {"x303"}
    # disjoint sorted ranges -> exactly one file owns any point
    assert len(t.files_for(bounds={"k": (303, 303)})) == 1
    # time travel still reads the pre-compaction version
    assert t.read(version=before.version).count() == 600
    # compacting an already-compacted table is a further no-op commit
    fb2, fa2 = t.compact(target_rows=200)
    assert (fb2, fa2) == (3, 3)


def test_zorder_compact_prunes_on_both_dimensions(spark, tmp_path):
    """A lexicographic (k-then-d) sort makes every file span the whole
    d domain — a d-only predicate prunes nothing. Z-order compaction
    interleaves both dimensions, so each file covers a compact (k, d)
    region and min/max skipping works on EITHER column alone."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    # 32x32 grid: k and d independent; random-ish commit interleave
    rows = [(k, (k * 13 + 7) % 32, f"v{k}") for k in range(1024)]
    df = spark.createDataFrame(rows, "k bigint, d bigint, v string")
    t.merge(df.repartition(4))

    fb, fa = t.compact(target_rows=64, zorder_by=["k", "d"])
    assert fa == 16
    n = len(t.files_for())

    # logically unchanged
    assert t.read().count() == 1024
    assert t.read().select("k").distinct().count() == 1024

    # both single-dimension predicates prune to a strict subset
    k_files = len(t.files_for(bounds={"k": (100, 131)}))
    d_files = len(t.files_for(bounds={"d": (3, 4)}))
    assert k_files < n, (k_files, n)
    assert d_files < n, (d_files, n)
    # and the 2-D box predicate prunes hardest
    box = len(t.files_for(bounds={"k": (100, 131), "d": (3, 4)}))
    assert box <= min(k_files, d_files)
    # pruned read still returns exactly the predicate's rows
    got = t.read(bounds={"k": (100, 131), "d": (3, 4)}).filter(
        F.col("k").between(100, 131) & F.col("d").between(3, 4)
    )
    assert got.count() == df.filter(
        F.col("k").between(100, 131) & F.col("d").between(3, 4)
    ).count()


def test_zorder_compact_key_sorted_comparison(spark, tmp_path):
    """The control for the z-order claim: the same grid compacted
    key-sorted cannot prune a d-only predicate at all."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k", "d"])
    rows = [(k, (k * 13 + 7) % 32, f"v{k}") for k in range(1024)]
    t.merge(spark.createDataFrame(rows, "k bigint, d bigint, v string"))
    t.compact(target_rows=64)
    n = len(t.files_for())
    assert n >= 8
    # leading-key predicate prunes; trailing-dimension predicate can't
    assert len(t.files_for(bounds={"k": (100, 131)})) <= 2
    assert len(t.files_for(bounds={"d": (3, 4)})) == n


def test_point_lookup_bloom_prunes_unsorted_appends(spark, tmp_path):
    """Interleaved-key appends leave every file spanning the whole key
    domain — min/max range stats prune NOTHING for a point lookup. The
    per-file key bloom does: only files actually containing the key
    survive. False-negative-free: the pruned read still returns the
    row."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    for i in range(6):
        t.merge(_batch(spark, range(i, 600, 6)).coalesce(1))
    snap = current_snapshot(t.path)
    assert len(snap.files) == 6
    assert all(f"bloom:k" in snap.stats[f] for f in snap.files)

    # key 303 ≡ 3 (mod 6) lives only in commit 3's file; min/max keeps
    # all 6, the bloom keeps ~1 (false positives may add a file or two)
    keep = t.files_for(bounds={"k": (303, 303)})
    assert 1 <= len(keep) <= 2, keep
    got = t.read(bounds={"k": (303, 303)}).filter(F.col("k") == 303)
    assert [r.v for r in got.collect()] == ["x303"]

    # an absent key prunes everything and still reads empty-with-schema
    assert t.files_for(bounds={"k": (9999, 9999)}) == []
    assert t.read(bounds={"k": (9999, 9999)}).count() == 0

    # range bounds ignore the bloom (point-only) — all files kept
    assert len(t.files_for(bounds={"k": (100, 400)})) == 6


def test_bloom_skipped_for_wide_files_and_string_keys_work(spark, tmp_path):
    """Files past _FILE_BLOOM_MAX_KEYS distinct keys skip the bloom
    (bitmap would saturate); string keys get blooms with exact-str
    canonicalization."""
    import finance_pipeline_spark.sinks.txn_table as tt

    t = TxnKeyedTable(spark, str(tmp_path / "s"), ["name"])
    rows = [(f"user-{i}", i) for i in range(50)]
    t.merge(spark.createDataFrame(rows, "name string, x bigint").coalesce(1))
    snap = current_snapshot(t.path)
    (f,) = snap.files
    assert "bloom:name" in snap.stats[f]
    assert t.files_for(bounds={"name": ("user-7", "user-7")}) == [f]
    assert t.files_for(bounds={"name": ("ghost", "ghost")}) == []

    big = TxnKeyedTable(spark, str(tmp_path / "big"), ["k"])
    n = tt._FILE_BLOOM_MAX_KEYS + 1
    big.merge(
        spark.range(n).select(F.col("id").alias("k"), F.lit("v").alias("v")).coalesce(1)
    )
    bsnap = current_snapshot(big.path)
    (bf,) = bsnap.files
    assert "bloom:k" not in bsnap.stats[bf]  # capped out — min/max only
    assert len(big.files_for(bounds={"k": (5, 5)})) == 1  # range still prunes


def test_merge_probe_bloom_prunes_interleaved_files(spark, tmp_path):
    """A small batch probing an unsorted table: range stats keep every
    file (all span the domain), the per-file blooms keep only files
    actually holding a batch key — and merge stays correct."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    for i in range(6):
        t.merge(_batch(spark, range(i, 600, 6)).coalesce(1))
    snap = current_snapshot(t.path)

    # keys 3 and 9 both live in commit 3's file only
    probe = t.probe_files_for(_batch(spark, [3, 9]), snap)
    assert 1 <= len(probe) <= 2, probe
    # a batch of only-novel keys prunes the whole probe
    assert t.probe_files_for(_batch(spark, [10_000, 10_001]), snap) == []

    # correctness through the pruned probe: existing keys skip, novel
    # keys insert
    stats = t.merge(_batch(spark, [3, 9, 10_000], tag="y"))
    assert (stats.inserted, stats.skipped) == (1, 2)
    got = t.read().filter(F.col("k").isin(3, 9, 10_000)).collect()
    assert {r.k: r.v for r in got} == {3: "x3", 9: "x9", 10_000: "y10000"}


def test_bloom_skips_probe_on_type_mismatched_point_bound(spark, tmp_path):
    """A float probe value against a bigint key must NOT bloom-prune
    (str(303.0) != str(303) would false-negative); the range stats
    still apply and pruning stays a superset guarantee."""
    t = TxnKeyedTable(spark, str(tmp_path / "t"), ["k"])
    for i in range(3):
        t.merge(_batch(spark, range(i, 300, 3)).coalesce(1))
    # int probe: bloom prunes to the owning file
    assert 1 <= len(t.files_for(bounds={"k": (33, 33)})) <= 2
    # float probe of the same key: bloom skipped, range keeps all 3,
    # and the read still finds the row under the caller's own filter
    keep = t.files_for(bounds={"k": (33.0, 33.0)})
    assert len(keep) == 3
    got = t.read(bounds={"k": (33.0, 33.0)}).filter(F.col("k") == 33.0)
    assert got.count() == 1


def test_bloom_membership_property(tmp_path):
    """Property (hypothesis): for any mix of int and str keys, every
    inserted key is maybe-present in its file bloom (zero false
    negatives — the invariant pruning soundness rests on), and the
    int/str canonicalization never cross-matches (str '303' is not
    int 303)."""
    from hypothesis import given, settings, strategies as st

    from finance_pipeline_spark.sinks.txn_table import (
        _FILE_BLOOM_BITS,
        _file_bloom_indexes,
    )

    keys = st.lists(
        st.one_of(st.integers(-(2**62), 2**62), st.text(max_size=30)),
        min_size=1,
        max_size=200,
    )

    @settings(max_examples=200, deadline=None)
    @given(keys)
    def check(vals):
        bits = bytearray(_FILE_BLOOM_BITS >> 3)
        for v in vals:
            for i in _file_bloom_indexes(v):
                bits[i >> 3] |= 1 << (i & 7)
        for v in vals:
            assert all(
                bits[i >> 3] & (1 << (i & 7)) for i in _file_bloom_indexes(v)
            )

    check()


def test_int_str_bloom_indexes_are_str_canonical():
    """str(303) and the string '303' hash identically by design (the
    canonical form IS the string) — which is exactly why _file_matches
    requires the probe TYPE to match the stats tag before bloom-pruning:
    the tag (int vs str), not the hash, is the cross-type guard."""
    from finance_pipeline_spark.sinks.txn_table import _file_bloom_indexes

    assert _file_bloom_indexes(303) == _file_bloom_indexes("303")
    assert _file_bloom_indexes(303) != _file_bloom_indexes("303.0")
