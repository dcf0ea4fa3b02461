"""Staged-operator gate: the r15 registration pre-check.

Runs every STAGED (written + oracled but not yet @query-registered)
operator on Spark and its DuckDB oracle over the same parquet tables,
comparing with STRICT sorted-tuple equality (tighter than the driver's
canonical hash — if this passes, the registration flip is one @query
line over a pre-proven pair, the r13 exactness rule).

Usage: python tools/check_staged.py [sf_dir ...] [--record PATH]
Defaults: sf0.01 AND sf0.1 (the dual-scale rule), record written to
.staged_oracle_check_latest.json. Exits non-zero on any mismatch.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
sys.path.insert(0, str(Path(__file__).resolve().parent))

from finance_pipeline_spark import registry  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def _staged():
    """name → ((spark, sf_dir) -> DataFrame, () -> oracle SQL).

    THE canonical list of staged (written + oracled but not yet
    @query-registered) operators. A registration flip removes the
    entry here and adds the @query decorator.

    r16 registered three of the seven remaining stagings
    (text_pack_efficiency — the r15 plan's named deferral — plus
    winnow and CMS heavy hitters); the window's other free slots went
    to the two _spread_vectors changed-code re-entries
    (ann_cosine_topk / ann_lsh_topk) and the new ann_scaled_recall
    capacity bound (r15 verdict items 2 and 4). The audio quartet
    below holds for the r17 window — this gate keeps it honest
    meanwhile.
    """
    from finance_pipeline_spark.operators import multimodal as M

    return {
        # --- fourth r14 batch, audio quartet (r17 flips by default) ---
        "mm_audio_features": (M.mm_audio_features, M._audio_features_oracle),
        "mm_audio_fingerprint": (
            M.mm_audio_fingerprint,
            M._audio_fingerprint_oracle,
        ),
        "mm_audio_downsample": (
            M.mm_audio_downsample,
            M._audio_downsample_oracle,
        ),
        "mm_decode_adpcm": (M.mm_decode_adpcm, M._adpcm_oracle),
    }


def main() -> int:
    args = sys.argv[1:]
    record = ".staged_oracle_check_latest.json"
    if "--record" in args:
        i = args.index("--record")
        record = args[i + 1]
        args = args[:i] + args[i + 2 :]
    sf_dirs = args or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]

    registry.load_all()
    staged = _staged()
    # a staged op must NOT already be registered (double bookkeeping)
    clash = sorted(set(staged) & set(registry.QUERIES))
    if clash:
        print(f"FAIL staged ops already registered: {clash}")
        return 1

    spark = get_session("check_staged")
    out: dict = {}
    n_fail = 0
    for d in sf_dirs:
        con = duckdb.connect()
        for t in registry.TABLES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{d}/{t}.parquet')"
            )
        tag = Path(d).name
        for name, (fn, osql) in staged.items():
            t0 = time.time()
            # CTE-inlining screen (r15 verdict item 7): DuckDB inlines
            # CTEs by default and a >10-CTE oracle chain can explode
            # its join-order optimizer (ann_ivfpq_topk's oracle hung
            # 45 min at sf0.1 until _mat() pinned AS MATERIALIZED).
            # Flag the hazard BEFORE a flip, not after a hang.
            import re  # noqa: PLC0415

            sql = osql()
            n_cte = len(re.findall(r"(?i)\b[a-z_]\w*\s+AS\s*\(", sql))
            n_mat = len(
                re.findall(r"(?i)\bAS\s+MATERIALIZED\s*\(", sql)
            )
            if n_cte - n_mat > 10:
                print(
                    f"WARN  {tag}:{name}: {n_cte - n_mat} un-MATERIALIZED "
                    f"CTEs (>10) — wrap the oracle in _mat() (the "
                    f"similarity.py recipe) before registering, or the "
                    f"DuckDB join-order optimizer may hang on it"
                )
            # TYPE-AWARE canon (r15 fix): plain tuple equality let a
            # DuckDB double 1278.0 match a Spark bigint 1278 — Python
            # int == float — and text_temperature_alloc then failed
            # the driver-replica repr-canon at registration. Mirror
            # check_oracle's canon so int-vs-float oracle drift is
            # caught HERE, before a flip.
            from check_oracle import _canon_val  # noqa: PLC0415

            def crow(t):
                return tuple(map(_canon_val, t))

            got = sorted(crow(r) for r in fn(spark, d).collect())
            want = sorted(crow(r) for r in con.execute(osql()).fetchall())
            ok = got == want
            n_fail += not ok
            out[f"{tag}:{name}"] = {
                "match": ok,
                "rows": len(got),
                "secs": round(time.time() - t0, 1),
            }
            print(f"{'PASS ' if ok else 'FAIL '} {tag}:{name}: "
                  f"{len(got)} rows ({out[f'{tag}:{name}']['secs']}s)")
            if not ok:
                diff = [(g, w) for g, w in zip(got, want) if g != w][:3]
                print(f"  first diffs: {diff}")
    json.dump(out, open(record, "w"), indent=1)
    print(f"\n{len(out) - n_fail} pass, {n_fail} fail -> {record}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
