"""Local replica of the driver's correctness gate.

Runs every registered query on Spark and (when an oracle exists) the
oracle SQL on DuckDB over the same parquet tables, then compares
row-count, schema arity, and an order-insensitive value comparison
(sorted rows, columns sorted by name). Stricter than necessary is the
goal: if this passes, any reasonable driver hash passes.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark import registry
from finance_pipeline_spark.session import get_session

registry.load_all()


def canon(df) -> list[tuple]:
    """pandas DataFrame → order-insensitive canonical row list."""
    cols = sorted(df.columns)
    out = df[cols].copy()
    for c in cols:
        # normalize decimals/floats to repr that is stable across engines
        out[c] = out[c].map(_canon_val)
    rows = [tuple(r) for r in out.itertuples(index=False, name=None)]
    rows.sort(key=repr)
    return rows


def _canon_val(v):
    import datetime
    import decimal

    import numpy as np
    import pandas as pd

    if v is None or (isinstance(v, float) and v != v) or v is pd.NaT:
        return "NULL"
    if isinstance(v, decimal.Decimal):
        return f"{v:.6f}"
    if isinstance(v, (np.floating, float)):
        return repr(float(v))
    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        ts = pd.Timestamp(v)
        if ts.tzinfo is not None:
            ts = ts.tz_convert("UTC").tz_localize(None)
        return ts.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    return v


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.01"
    names = [a for a in args if "/" not in a] or list(registry.QUERIES)

    spark = get_session("check_oracle")
    con = duckdb.connect()
    for t in registry.TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    n_pass = n_fail = n_rows_only = 0
    for name in names:
        spec = registry.QUERIES[name]
        t0 = time.time()
        try:
            sdf = spec.fn(spark, sf_dir)
            spd = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {e}")
            n_fail += 1
            continue
        took = time.time() - t0
        if spec.oracle is None:
            print(f"rows  {name}: {len(spd)} rows ({took:.1f}s) [rows-only]")
            n_rows_only += 1
            continue
        try:
            opd = con.execute(spec.oracle_text()).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL  {name}: duckdb error: {e}")
            n_fail += 1
            continue
        problems = []
        if len(spd) != len(opd):
            problems.append(f"rowcount spark={len(spd)} oracle={len(opd)}")
        if sorted(c.lower() for c in spd.columns) != sorted(c.lower() for c in opd.columns):
            problems.append(
                f"columns spark={sorted(spd.columns)} oracle={sorted(opd.columns)}"
            )
        if not problems:
            a, b = canon(spd), canon(opd)
            if a != b:
                diffs = [i for i, (x, y) in enumerate(zip(a, b)) if x != y][:3]
                detail = "; ".join(f"row{i}: spark={a[i]} oracle={b[i]}" for i in diffs)
                problems.append(f"values differ ({detail})")
        if problems:
            print(f"FAIL  {name}: {'; '.join(problems)}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(spd)} rows ({took:.1f}s)")
            n_pass += 1

    print(f"\n{n_pass} pass, {n_rows_only} rows-only, {n_fail} fail")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
