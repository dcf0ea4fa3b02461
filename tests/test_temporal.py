"""Planted-value semantics for the temporal operators (the oracle
checks equivalence with DuckDB; these check the *intent*)."""

from __future__ import annotations

import datetime as dt

import pandas as pd

from finance_pipeline_spark import registry

registry.load_all()


def _plant_events(tmp_path, rows):
    pdf = pd.DataFrame(
        {
            "event_id": [r[0] for r in rows],
            "ts": [r[1] for r in rows],
            "user_id": [r[2] for r in rows],
            "event_type": [r[3] for r in rows],
            "value": [float(r[4]) for r in rows],
            "props": ["{}"] * len(rows),
        }
    )
    pdf.to_parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_join_asof_picks_most_recent_strictly_prior_purchase(spark, tmp_path):
    t = lambda m: dt.datetime(2024, 1, 1, 10, m)  # noqa: E731
    sf = _plant_events(
        tmp_path,
        [
            (1, t(0), 7, "purchase", 5.0),
            (2, t(3), 7, "purchase", 9.0),
            (3, t(5), 7, "click", 0.0),   # → purchase 2 (latest prior)
            (4, t(1), 8, "click", 0.0),   # user 8 has no purchase → null
            (5, t(7), 7, "click", 0.0),   # → still purchase 2
        ],
    )
    got = {
        r.event_id: (r.prior_purchase_id, r.prior_purchase_value)
        for r in registry.QUERIES["join_asof"].fn(spark, sf).collect()
    }
    assert got == {3: (2, 9.0), 4: (None, None), 5: (2, 9.0)}


def test_rollup_time_multi_day_totals_equal_hour_sums(spark, sf_dir):
    rows = registry.QUERIES["rollup_time_multi"].fn(spark, sf_dir).collect()
    day_totals = {r.day_start: r.n_events for r in rows if r.is_day_total == 1}
    hour_sums: dict = {}
    for r in rows:
        if r.is_day_total == 0:
            hour_sums[r.day_start] = hour_sums.get(r.day_start, 0) + r.n_events
    assert day_totals and day_totals == hour_sums


def test_cohort_retention_planted_matrix(spark, tmp_path):
    """Two cohorts with known retention: cohort A (users 1,2) starts
    week of Jan 1 2024 (Mon); user 1 returns in weeks 1 and 2, user 2
    never returns. Cohort B (user 3) starts week of Jan 8 and returns
    week 1. Permille is integer n*1000 div week0-size."""
    W0 = dt.datetime(2024, 1, 1, 10, 0)   # Monday
    W1 = dt.datetime(2024, 1, 8, 10, 0)
    W2 = dt.datetime(2024, 1, 15, 10, 0)
    rows = [
        (1, W0, 1, "visit", 1.0),
        (2, W0 + dt.timedelta(days=2), 2, "visit", 1.0),
        (3, W1, 1, "visit", 1.0),
        (4, W2 + dt.timedelta(hours=5), 1, "visit", 1.0),
        (5, W1 + dt.timedelta(days=1), 3, "visit", 1.0),
        (6, W2, 3, "visit", 1.0),
    ]
    sf = _plant_events(tmp_path, rows)
    got = {
        (r.cohort_week.date().isoformat(), r.week_no): (r.n_users, r.permille)
        for r in registry.QUERIES["cohort_retention"].fn(spark, sf).collect()
    }
    assert got == {
        ("2024-01-01", 0): (2, 1000),
        ("2024-01-01", 1): (1, 500),
        ("2024-01-01", 2): (1, 500),
        ("2024-01-08", 0): (1, 1000),
        ("2024-01-08", 1): (1, 1000),
    }


def test_funnel_requires_strict_step_ordering(spark, tmp_path):
    """User 1 converts fully in order. User 2 clicked BEFORE their
    first view — no step-2 credit (and their later purchase without an
    ordered click gives no step-3 credit). User 3 views only."""
    T = dt.datetime(2024, 1, 1, 9, 0)
    m = dt.timedelta(minutes=1)
    rows = [
        (1, T, 1, "view", 1.0),
        (2, T + m, 1, "click", 1.0),
        (3, T + 2 * m, 1, "purchase", 9.0),
        (4, T, 2, "click", 1.0),       # click precedes the view
        (5, T + m, 2, "view", 1.0),
        (6, T + 2 * m, 2, "purchase", 5.0),
        (7, T, 3, "view", 1.0),
    ]
    sf = _plant_events(tmp_path, rows)
    got = {
        r.step: (r.step_name, r.n_users, r.permille)
        for r in registry.QUERIES["funnel_conversion"].fn(spark, sf).collect()
    }
    assert got == {
        1: ("view", 3, 1000),
        2: ("click", 1, 333),
        3: ("purchase", 1, 333),
    }
