"""Synthesize a 10× scale-probe dataset — the cheapest way to catch
super-linear plans before a real 100× ever happens (round-5 verdict
item 8). NOT driver testdata: correctness still runs against
/root/testdata; these dirs exist only so bench queries can be timed a
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
- events ×10: replica r offsets event_id by r·10⁸ and user_id by
  r·10⁵, timestamps UNCHANGED — the realistic growth shape for an
  event stream (more users over the same period, so per-user session
  structure, window population, and as-of join density stay
  per-capita constant while watermark-window state grows 10×).
- every other table: copied as-is (dimension-like for these probes).

COMPOSABLE LEVELS (the 1000×-of-sf0.01 tier): ``--level 2`` replicates
an already-replicated probe dir one more decade. Two level-aware rules
keep the structure honest:
- Token suffixes at level ≥ 2 are separated by a LETTER (``x3``, not
  ``3``): level-1 suffixes are bare digits, so a second bare-digit
  suffix would COLLIDE — base token ``tok`` under (r1=0, r2=1) becomes
  ``tok1``, byte-identical to replica (r1=1, r2=0)'s tokens, i.e. the
  whole second-level replica 1 of the original slice would be an EXACT
  duplicate of level-1 replica 1, quadratically inflating every dedup
  family. The letter separator keeps all 100 replica vocabularies
  pairwise disjoint.
- Key strides multiply by 10 per level (level-1 doc_ids reach r·10⁸ +
  base < 10⁹, so level 2 strides doc_id by 10⁹, orderkey by 10¹⁰,
  custkey by 10⁸, vec_id by 10⁹, label by 10⁴), preserving uniqueness
  and FK consistency.

Usage:
    python tools/make_scale_probe.py [out_dir] [--src DIR] [--level N]

Defaults: out .scale_probe/sf1, src /root/testdata/sf0.1, level 1.
The 1000×-of-sf0.01 tier used by the .probe_*_1000x records:
    python tools/make_scale_probe.py .scale_probe/sf1
    python tools/make_scale_probe.py .scale_probe/sf10 \
        --src .scale_probe/sf1 --level 2
Skips work if the output already exists.
"""

from __future__ import annotations

import shutil
import sys
from pathlib import Path

import duckdb

DEFAULT_SRC = Path("/root/testdata/sf0.1")
REPLICAS = 10


def build(out_dir: Path, src: Path = DEFAULT_SRC, level: int = 1) -> None:
    out_dir.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 16")

    mult = 10 ** (level - 1)
    # Level-1 suffixes are bare digits; deeper levels prefix a
    # LEVEL-DERIVED letter ('x' at level 2, 'y' at 3, ...) so replica
    # vocabularies stay pairwise disjoint at ANY depth — a
    # level-invariant 'x' would make level-2 token 'tok1' + level-3
    # suffix 'x2' collide with level-2 token 'tok1x2' kept at level-3
    # r=0, reintroducing the exact-duplicate inflation the module doc
    # warns about (r14 advisor finding).
    sep = "" if level == 1 else chr(ord("x") + min(level - 2, 2))
    if level > 4:
        raise SystemExit("level > 4 would reuse suffix separators")

    suffixed = f"""list_aggregate(
        [t || '{sep}' || CAST(r AS VARCHAR) FOR t IN string_split(text, ' ')],
        'string_agg', ' ')"""
    docs_sql = f"""
    COPY (
        SELECT doc_id + r * {100000000 * mult} AS doc_id,
               CASE WHEN r = 0 THEN text ELSE {suffixed} END AS text,
               lang, source,
               CAST(length(CASE WHEN r = 0 THEN text ELSE {suffixed} END)
                    AS BIGINT) AS n_chars
        FROM read_parquet('{src}/documents.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
    """
    con.execute(docs_sql)

    con.execute(
        f"""
    COPY (
        SELECT l_orderkey + r * {1000000000 * mult} AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM read_parquet('{src}/lineitem.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/lineitem.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT o_orderkey + r * {1000000000 * mult} AS o_orderkey,
               o_custkey + r * {10000000 * mult} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM read_parquet('{src}/orders.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/orders.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT c_custkey + r * {10000000 * mult} AS c_custkey,
               c_name, c_nationkey, c_acctbal, c_mktsegment
        FROM read_parquet('{src}/customer.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/customer.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT vec_id + r * {100000000 * mult} AS vec_id,
               embedding,
               label + r * {1000 * mult} AS label
        FROM read_parquet('{src}/embeddings.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)
    """
    )

    con.execute(
        f"""
    COPY (
        SELECT event_id + r * {100000000 * mult} AS event_id,
               ts,
               user_id + r * {100000 * mult} AS user_id,
               event_type, value, props
        FROM read_parquet('{src}/events.parquet'),
             unnest(range(0, {REPLICAS})) AS reps(r)
    ) TO '{out_dir}/events.parquet' (FORMAT PARQUET)
    """
    )

    for t in ("region", "nation", "supplier", "part"):
        dst = out_dir / f"{t}.parquet"
        if not dst.exists():
            shutil.copyfile(src / f"{t}.parquet", dst)


if __name__ == "__main__":
    argv = list(sys.argv[1:])
    src = DEFAULT_SRC
    level = 1
    if "--src" in argv:
        i = argv.index("--src")
        src = Path(argv[i + 1])
        del argv[i : i + 2]
    if "--level" in argv:
        i = argv.index("--level")
        level = int(argv[i + 1])
        del argv[i : i + 2]
    if argv and argv[0].startswith("-"):
        raise SystemExit(
            f"usage: make_scale_probe.py [OUT_DIR] [--src DIR] [--level N]; "
            f"got unexpected flag {argv[0]!r}"
        )
    out = Path(argv[0] if argv else ".scale_probe/sf1")
    # Skip only when EVERY produced table exists — keying on
    # documents.parquet alone let probe dirs built before the
    # replicated-events tier silently keep a stale copied-as-is
    # events.parquet (r14 advisor finding).
    produced = (
        "documents.parquet",
        "lineitem.parquet",
        "embeddings.parquet",
        "events.parquet",
    )
    if all((out / t).exists() for t in produced):
        print(f"scale probe already at {out}")
    else:
        build(out, src=src, level=level)
        print(f"scale probe written to {out}")
