"""Verdict logic for the repeat-aware bench comparator."""

from __future__ import annotations

from tools.bench_compare import compare


def test_classifies_ok_regression_steal_new_dropped():
    old = {"queries": {"a": 1.0, "b": 1.0, "c": 1.0, "gone": 1.0}}
    new = {
        "queries": {"a": 1.5, "b": 3.0, "c": 3.0, "fresh": 0.4},
        "repeats": {
            "a": [1.6, 1.5, 1.5],
            "b": [3.0, 3.1, 3.0],  # tight at 3x -> regression
            "c": [3.0, 9.0, 12.0],  # wild spread -> steal-suspect
            "fresh": [0.4, 0.4, 0.4],
        },
    }
    lines, rc = compare(old, new, bar=2.0)
    text = "\n".join(lines)
    assert rc == 1
    assert "ok          a" in text
    assert "REGRESSION  b" in text
    assert "steal?      c" in text
    assert "new         fresh" in text
    assert "DROPPED     gone" in text


def test_all_green_exits_zero():
    old = {"queries": {"a": 1.0}}
    new = {"queries": {"a": 1.1}, "repeats": {"a": [1.1, 1.2, 1.1]}}
    lines, rc = compare(old, new, bar=2.0)
    assert rc == 0 and len(lines) == 1


def test_driver_record_shape_unwraps():
    from tools.bench_compare import _load
    import json, tempfile, os

    rec = {"parsed": {"queries": {"a": 1.0}}, "tail": "..."}
    f = tempfile.NamedTemporaryFile("w", suffix=".json", delete=False)
    json.dump(rec, f)
    f.close()
    try:
        assert _load(f.name)["queries"] == {"a": 1.0}
    finally:
        os.unlink(f.name)


def test_merged_min_across_multiple_runs():
    """BASELINE.md merged-min protocol: several NEW runs merge by
    query-wise min with concatenated repeats — one noisy run can't
    manufacture a regression if any run's min is under bar."""
    from tools.bench_compare import compare, merge_records

    old = {"queries": {"q1": 1.0, "q2": 1.0}}
    run1 = {"queries": {"q1": 3.1, "q2": 1.1}, "repeats": {"q1": [3.1, 3.4], "q2": [1.1, 1.2]}}
    run2 = {"queries": {"q1": 1.2, "q2": 1.0}, "repeats": {"q1": [1.2, 1.3], "q2": [1.0, 1.4]}}
    merged = merge_records([run1, run2])
    assert merged["queries"] == {"q1": 1.2, "q2": 1.0}
    assert merged["repeats"]["q1"] == [3.1, 3.4, 1.2, 1.3]
    lines, rc = compare(old, merged, bar=2.0)
    assert rc == 0
    assert all(line.startswith("ok") for line in lines), lines
