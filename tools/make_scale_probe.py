"""Synthesize a 10× scale-probe dataset from sf0.1 — the cheapest way
to catch super-linear plans before a real 100× ever happens (round-5
verdict item 8). NOT driver testdata: correctness still runs against
/root/testdata; this dir exists only so bench queries can be timed one
scale tier up and their scaling factors recorded in the README gate
note.

Scaling rules (distribution-faithful, not naive copies):
- documents ×10: replica r suffixes every TOKEN with ``r`` and offsets
  doc_id by r·10⁸. A uniform suffix preserves each replica's internal
  shingle-similarity structure exactly (Jaccard is suffix-invariant)
  while making shingles DISJOINT across replicas — so near-dup density
  per capita stays constant, the way a genuinely larger corpus behaves
  (naive copies would make every doc 10 exact twins and quadratically
  inflate every LSH bucket).
- lineitem ×10: replica r offsets l_orderkey by r·10⁹ — order-group
  structure and value distributions unchanged, key cardinality ×10.
- orders ×10 and customer ×10 with CONSISTENT key offsets (o_orderkey
  r·10⁹ matching lineitem; o_custkey/c_custkey r·10⁷): join-shaped
  probes keep their FK integrity, so the join output, the broadcast
  side, and the shuffle all actually grow 10× — replicating only the
  fact side would leave 90% orphans and a 1×-sized join that defeats
  the probe's super-linear-plan detection (round-6 review finding).
- embeddings ×10: replica r offsets vec_id by r·10⁸ and label by
  r·1000 — the label-blocked similarity/dedup operators see 10× the
  blocks at the original per-block density (vectors repeat across
  replicas, but label blocking keeps replicas mutually invisible, the
  same per-capita structure a larger real corpus has).
- every other table: copied as-is (dimension-like for these probes).

Usage: python tools/make_scale_probe.py [out_dir]   (default
.scale_probe/sf1; skips work if the output already exists)
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

SRC = Path("/root/testdata/sf0.1")
REPLICAS = 10


def build(out_dir: Path) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    docs_sql = f"""
    COPY (
        SELECT doc_id + r * 100000000 AS doc_id,
               CASE WHEN r = 0 THEN text
                    ELSE list_aggregate(
                        [t || CAST(r AS VARCHAR) FOR t IN string_split(text, ' ')],
                        'string_agg', ' ')
               END AS text,
               lang, source,
               CAST(length(CASE WHEN r = 0 THEN text
                    ELSE list_aggregate(
                        [t || CAST(r AS VARCHAR) FOR t IN string_split(text, ' ')],
                        'string_agg', ' ')
               END) AS BIGINT) AS n_chars
        FROM read_parquet('{SRC}/documents.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """
    con.execute(docs_sql)

    con.execute(
        f"""
    COPY (
        SELECT l_orderkey + r * 1000000000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM read_parquet('{SRC}/lineitem.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT o_orderkey + r * 1000000000 AS o_orderkey,
               o_custkey + r * 10000000 AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{SRC}/orders.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT c_custkey + r * 10000000 AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{SRC}/customer.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/customer.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT vec_id + r * 100000000 AS vec_id,
               embedding,
               label + r * 1000 AS label
        FROM read_parquet('{SRC}/embeddings.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
    """
    )

    for t in ("region", "nation", "supplier", "part", "events"):
        dst = out_dir / f"{t}.parquet"
        if not dst.exists():
            shutil.copyfile(SRC / f"{t}.parquet", dst)


if __name__ == "__main__":
    out = Path(sys.argv[1] if len(sys.argv) > 1 else ".scale_probe/sf1")
    if (out / "documents.parquet").exists():
        print(f"scale probe already at {out}")
    else:
        build(out)
        print(f"scale probe written to {out}")
