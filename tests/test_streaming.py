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
