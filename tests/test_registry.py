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
            duck.execute(f"EXPLAIN {spec.oracle_text()}")
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
        # new driver row earning first evidence in r14
        "token_budget_mix",  # the "data recipe" operator (r13 item 2)
        # changed code in r14 — ngram ledger section moved to band
        # keys in lockstep with dedup_ngram_jaccard; re-earns in-window
        "dedup_dropped_accounting",
        # rows-only by design — window-pinned (can never earn fold
        # evidence under the hash-green rule)
        "ann_ivfpq_scaled", "ann_index_serve",
        # flagship
        "agg_pricing_summary",
        # the full r10-evidence cohort (43) — the registry's oldest
        # driver rows, mandatory under the standing evidence contract
        # (r13 verdict item 1). dedup_ngram_jaccard additionally
        # carries r14 CHANGED CODE (content-derived blocking key).
        # Family coverage comes FROM the cohort (text x12, dedup x6,
        # ann x4, stream x3, agg/join/window/P/D reps); the r9
        # deferrals a1_count + d5_format_render close their ledger.
        "text_lm_familiarity", "text_lm_buckets",
        "text_quality_classifier", "text_bpe_token_count",
        "text_fingerprint", "agg_corr_exact", "a2_empty_probe",
        "win_tumbling", "win_topk_per_group", "join_agg_revenue",
        "join_range_bands", "u3_semi_join", "o3_dynamic_sort",
        "o4_global_index", "p2_drop_column", "p3_date_window",
        "d2_interval_shift", "d6_literal_columns", "dedup_exact",
        "dedup_ngram_jaccard", "dedup_simhash", "dedup_group_decisions",
        "dedup_embedding_cosine", "dedup_semantic_clusters",
        "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
        "ann_quantized_topk", "emb_quantize_int8",
        "stream_tumbling_counts", "stream_static_join",
        "stateful_user_totals", "text_token_count", "text_gopher_rules",
        "text_pack_sequences", "text_split_assign",
        "text_mixture_sample", "text_ngram_profile",
        "text_chunk_overlap", "text_quality_prune", "cohort_retention",
        "event_transition_counts", "merge_upsert_orders",
        "a1_count", "d5_format_render",
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
        "CORRECTNESS_r05.json",
        "CORRECTNESS_r06.json",
        "CORRECTNESS_r07.json",
        "CORRECTNESS_r08.json",
        "CORRECTNESS_r09.json",
        "CORRECTNESS_r10.json",
        "CORRECTNESS_r11.json",
        "CORRECTNESS_r12.json",
        "CORRECTNESS_r13.json",
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
    latest = max(registry.ROTATION_LOG, key=lambda r: int(r[1:]))
    assert set(registry.ROTATION_LOG[latest]["in"]) <= set(window), (
        latest, "in entries not in window",
    )
    for rnd, swap in registry.ROTATION_LOG.items():
        assert set(swap["out"]) <= proven, (rnd, "out entries lack prior evidence")


def test_documented_rotation_counts_match_rotation_log():
    """r13 advisor: README/SURVEY rotation counts drifted from the
    ROTATION_LOG tuples (three mutually disagreeing numbers for r12).
    Every 'N in / M out' claim that names a ROTATION_LOG round in the
    docs must equal len(log['in']) / len(log['out'])."""
    import re
    from pathlib import Path

    root = Path(__file__).resolve().parents[1]
    # two documented phrasings: `ROTATION_LOG["rN"]`, ... K in / M out
    # (README) and 'Rotation rN** (K in / M out' / 'K-in/M-out' (SURVEY)
    pats = [
        re.compile(
            r'ROTATION_LOG\["(r\d+)"\]`,\s*(\d+) in / (\d+) out'
        ),
        re.compile(r"Rotation (r\d+)\*\* \((\d+) in / (\d+) out"),
    ]
    checked = 0
    for doc in ("README.md", "SURVEY.md"):
        text = (root / doc).read_text()
        for pat in pats:
            for rnd, n_in, n_out in pat.findall(text):
                log = registry.ROTATION_LOG.get(rnd)
                assert log is not None, (doc, rnd)
                assert (int(n_in), int(n_out)) == (
                    len(log["in"]),
                    len(log["out"]),
                ), (doc, rnd, n_in, n_out, len(log["in"]), len(log["out"]))
                checked += 1
    assert checked >= 6, f"doc-count patterns matched only {checked} claims"


def test_oracle_constants_stay_in_sync_with_spark_path(monkeypatch):
    """The r6-flagged foot-gun: an oracle f-string that captures a
    module constant at import while the Spark path reads it at call
    time desyncs under a runtime override. Every constant-interpolating
    oracle is now a callable resolved by oracle_text() at ACCESS time,
    so monkeypatching the constant must change the rendered SQL."""
    from finance_pipeline_spark.operators import dedup

    spec = registry.QUERIES["dedup_ngram_jaccard"]
    assert callable(spec.oracle)
    assert f"rn <= {dedup._NGRAM_BLOCK_CAP}" in spec.oracle_text()
    monkeypatch.setattr(dedup, "_NGRAM_BLOCK_CAP", 7)
    assert "rn <= 7" in spec.oracle_text()

    # repo-wide rule: no registered oracle STRING interpolates a live
    # module global (plain-string oracles must be constant-free SQL) —
    # enforced structurally: every f-oracle in the operator modules is
    # a lambda/builder, i.e. callable here.
    n_callable = sum(1 for s in registry.QUERIES.values() if callable(s.oracle))
    assert n_callable >= 25
