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

from finance_pipeline_spark import registry  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def _staged():
    """name → ((spark, sf_dir) -> DataFrame, () -> oracle SQL).

    THE canonical list of r15-staged operators. A registration flip
    removes the entry here and adds the @query decorator; this file's
    emptiness at end of r15 is the done-check.
    """
    from finance_pipeline_spark.operators import classifier as C
    from finance_pipeline_spark.operators import dedup as D
    from finance_pipeline_spark.operators import multimodal as M
    from finance_pipeline_spark.operators import similarity as S
    from finance_pipeline_spark.operators import textops as T

    def eval_overlap(spark, sf_dir):
        return T.eval_overlap_report(registry.load(spark, sf_dir, "documents"))

    return {
        # --- first r14 batch (staged before the snapshot commit) ---
        "text_unimax_alloc": (T.text_unimax_alloc, T._unimax_oracle),
        "text_temperature_alloc": (
            T.text_temperature_alloc,
            T._temperature_oracle,
        ),
        "text_dsir_select": (T.text_dsir_select, T._dsir_oracle),
        "mm_thumbnail": (M.mm_thumbnail, M._mm_thumbnail_oracle),
        "text_regex_token_count": (
            T.text_regex_token_count,
            T._regex_token_oracle,
        ),
        "eval_overlap_report": (eval_overlap, T._eval_overlap_oracle),
        "text_bpe_fertility": (T.text_bpe_fertility, T._bpe_fertility_oracle),
        "clf_calibration_bins": (
            C.clf_calibration_bins,
            C._clf_calibration_oracle,
        ),
        "text_pack_efficiency": (
            T.text_pack_efficiency,
            T._pack_efficiency_oracle,
        ),
        "ann_dim_truncation_recall": (
            S.ann_dim_truncation_recall,
            S._trunc_recall_oracle,
        ),
        "text_dataset_card": (T.text_dataset_card, T._dataset_card_oracle),
        # --- second r14 batch (extended session) ---
        "text_ngram_novelty": (T.text_ngram_novelty, T._ngram_novelty_oracle),
        "source_overlap_matrix": (
            T.source_overlap_matrix,
            T._source_overlap_oracle,
        ),
        "text_stratified_sample": (
            T.text_stratified_sample,
            T._stratified_sample_oracle,
        ),
        "ann_eval_contamination": (
            S.ann_eval_contamination,
            S._eval_contamination_oracle,
        ),
        "emb_label_centroid_cosine": (
            S.emb_label_centroid_cosine,
            S._label_centroid_oracle,
        ),
        "source_dedup_scopes": (
            D.source_dedup_scopes,
            D._source_scopes_oracle,
        ),
        # --- third r14 batch (second extended session) ---
        "text_winnow_fingerprint": (
            T.text_winnow_fingerprint,
            T._winnow_oracle,
        ),
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
        "text_cms_heavy_hitters": (
            T.text_cms_heavy_hitters,
            T._cms_oracle,
        ),
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
            got = sorted(tuple(r) for r in fn(spark, d).collect())
            want = sorted(map(tuple, con.execute(osql()).fetchall()))
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
