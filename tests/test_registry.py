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
