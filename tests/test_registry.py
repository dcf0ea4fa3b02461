"""Registry contract: every query registered once, every oracle is
valid DuckDB SQL over the driver tables (EXPLAIN-checked, cheap), and
the driver entry module exposes the full set."""

from __future__ import annotations

import duckdb
import pytest

from finance_pipeline_spark import registry

registry.load_all()

SF = "/root/testdata/sf0.001"


def test_registry_has_expected_surface():
    assert len(registry.QUERIES) >= 61
    bench = [n for n, s in registry.QUERIES.items() if s.bench]
    assert len(bench) >= 8
    for name, spec in registry.QUERIES.items():
        assert spec.fn is not None and name == spec.name


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in registry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_all_oracles_are_valid_duckdb_sql(duck):
    bad = []
    for name, spec in registry.QUERIES.items():
        if spec.oracle is None:
            continue
        try:
            duck.execute(f"EXPLAIN {spec.oracle}")
        except Exception as e:  # noqa: BLE001
            bad.append((name, str(e)[:120]))
    assert not bad, bad


def test_entry_module_exposes_registry():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entry

    qs = entry.queries()
    oracles = entry.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) == len(registry.QUERIES)
    assert list(qs) == list(registry.PRIORITY)


def test_driver_window_covers_every_family():
    """The driver evaluates only the first DRIVER_WINDOW queries(); the
    curated PRIORITY order must keep one-plus representative of every
    operator family — and the whole beyond-reference tier — inside it."""
    ordered = registry.ordered_queries()  # raises on PRIORITY drift
    window = list(ordered)[: registry.DRIVER_WINDOW]

    must_be_in_window = {
        # beyond-reference tier (one-plus per family; ivf/int8/kmeans,
        # rollup/funnel, token_count/gopher/pack folded r5 on r4-green)
        "ann_cosine_topk", "ann_lsh_topk", "ann_quantized_topk",
        "join_asof",
        "user_gap_stats",
        "text_decontaminate", "text_vocab_topk",
        "text_pii_scrub", "text_repetition_stats",
        "text_tfidf_topk",
        "win_sliding", "win_session", "stream_dedup",
        "stream_stream_join", "stream_session_counts",
        "stateful_user_totals",
        "a3_affected_rows", "s6_sql_table_scan",
        # warehouse & time-series tier (new r5)
        "scd2_order_status", "cdc_latest_state", "attribution_first_last",
        "hist_value_buckets", "profile_columns", "ts_moving_features",
        "ts_resample_ffill", "merge_upsert_orders", "win_distribution_family",
        "metric_rolling_active", "anomaly_zscore_flags",
        "affinity_part_pairs", "winsorize_values", "fuzzy_match_blocked",
        # dedup families (simhash r3-green, exact + group_decisions
        # r4-green in the fold; these three keep the family in-window)
        "dedup_minhash_lsh",
        "dedup_connected_groups",
        # core relational representatives (r5 rotation: the events-ts
        # re-proof cohort re-entered the window and seven r4-green rows
        # moved past the fold — see registry.ROTATION_LOG["r5"])
        "agg_pricing_summary", "win_rank_family", "join_agg_revenue",
        "join_skew_enrich",
        "u2_anti_join", "o2_topk_single",
        "d8_trim", "d10_current_date",
        "p8_watermark_filter",
        "stream_tumbling_counts",
        "grouped_user_gaps",
        "mm_binary_meta",
        "dedup_incremental", "text_source_quota",
    }
    missing = must_be_in_window - set(window)
    assert not missing, f"fell out of the driver window: {sorted(missing)}"

    # every past-fold query carries a hash-green driver row from a prior round
    past_fold = set(ordered) - set(window)
    import json
    from pathlib import Path

    proven = set()
    for f in (
        "CORRECTNESS_r01.json",
        "CORRECTNESS_r02.json",
        "CORRECTNESS_r03.json",
        "CORRECTNESS_r04.json",
    ):
        p = Path(__file__).resolve().parents[1] / f
        if p.exists():
            rows = json.loads(p.read_text())
            # hash-green only: a rows-only ('no_oracle') driver row
            # verified nothing about values and doesn't count as
            # evidence for rotating a query out of the window.
            proven |= {n for n, r in rows.items() if r.get("hash_match")}
    unproven = past_fold - proven
    assert not unproven, f"past-fold queries without prior driver row: {sorted(unproven)}"

    # rotation hygiene (round-3 advisory): every ROTATION_LOG "out" entry
    # must be proven; the LATEST round's "in" entries must actually be in
    # the window (older rounds' in-entries legitimately rotate out again).
    latest = max(registry.ROTATION_LOG)
    assert set(registry.ROTATION_LOG[latest]["in"]) <= set(window), (
        latest, "in entries not in window",
    )
    for rnd, swap in registry.ROTATION_LOG.items():
        assert set(swap["out"]) <= proven, (rnd, "out entries lack prior evidence")
