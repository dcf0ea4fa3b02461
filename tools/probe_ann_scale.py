"""10x scale probe for the corpus-capacity IVFPQ tier.

Synthesizes clustered embedding corpora at N and 10N (the regime IVF
assumes), runs ``ivfpq_scaled_topk`` end-to-end at each size, and
measures wall time plus recall@10 against an exact numpy baseline.
The point: as N grows 10x the derived capacity grows with it
(sqrt(N) cells, bigger codebooks, wider nprobe) and recall must HOLD
rather than decay — the measurement the r8 verdict asked for before
trusting the scaled constants.

Usage: python tools/probe_ann_scale.py [--n 2000] [--queries 20]
                                       [--train-cap N]
``--train-cap`` passes an absolute training-sample bound through to
``ivfpq_scaled_topk`` (the r14 default-off prep for the r15 flip) so
the build-cost/recall trade is measured, not guessed.
Prints one JSON line with per-size {params, recall_at10, secs}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark.session import get_session  # noqa: E402

_DIM = 64


def _make_corpus(root: Path, n: int, n_queries: int, seed: int):
    """Clustered corpus + noisy-copy queries (ids % 100 == 0), written
    as an embeddings.parquet usable as sf_dir."""
    import pandas as pd

    rng = np.random.default_rng(seed)
    n_blobs = max(8, int(round(np.sqrt(n))))
    per_blob = max(1, n // n_blobs)
    centers = 6.0 * rng.standard_normal((n_blobs, _DIM))
    mat = np.vstack(
        [
            centers[b] + 0.4 * rng.standard_normal((per_blob, _DIM))
            for b in range(n_blobs)
        ]
    )
    ids = []
    nid = 1
    for _ in range(len(mat)):
        if nid % 100 == 0:
            nid += 1
        ids.append(nid)
        nid += 1
    step = max(1, len(mat) // n_queries)
    q_idx = list(range(0, len(mat), step))[:n_queries]
    q_ids = [(k + 1) * 100 for k in range(len(q_idx))]
    q_mat = mat[q_idx] + 0.1 * rng.standard_normal((len(q_idx), _DIM))
    all_ids = ids + q_ids
    all_mat = np.vstack([mat, q_mat])
    pd.DataFrame(
        {
            "vec_id": all_ids,
            "embedding": [r.astype(np.float32).tolist() for r in all_mat],
            "label": [0] * len(all_ids),
        }
    ).to_parquet(root / "embeddings.parquet")
    # the engine reads float32 parquet values — compute the exact
    # baseline on the SAME rounded numbers, or two true neighbors
    # within a float32 ulp can swap across the rank-10 boundary and
    # misstate recall (review finding r9)
    m32 = all_mat.astype(np.float32).astype(np.float64)
    q32 = q_mat.astype(np.float32).astype(np.float64)
    exact = {}
    arr_ids = np.array(all_ids)
    for k, qid in enumerate(q_ids):
        d = ((m32 - q32[k]) ** 2).sum(axis=1)
        order = np.lexsort((arr_ids, d))
        top = [int(arr_ids[j]) for j in order if int(arr_ids[j]) != qid][:10]
        exact[qid] = set(top)
    return exact, len(all_ids)


def main() -> int:
    n = 2000
    n_queries = 20
    train_cap = None
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
    if "--queries" in sys.argv:
        n_queries = int(sys.argv[sys.argv.index("--queries") + 1])
    if "--train-cap" in sys.argv:
        train_cap = int(sys.argv[sys.argv.index("--train-cap") + 1])

    from finance_pipeline_spark.operators.similarity import (
        ivfpq_scaled_topk,
        scaled_ann_params,
    )

    spark = get_session("probe-ann")
    # --train-cap absent => probe the operator's SHIPPING default
    # (_SCALED_TRAIN_CAP since r15), not an explicit None (uncapped);
    # pass --train-cap 0 to force the uncapped path explicitly.
    kw = {} if train_cap is None else {
        "train_cap": None if train_cap == 0 else train_cap
    }
    out = {"dim": _DIM, "train_cap_arg": train_cap, "kwargs": str(kw),
           "sizes": {}}
    for mult, label in ((1, "n"), (10, "n10x")):
        size = n * mult
        with tempfile.TemporaryDirectory() as td:
            root = Path(td)
            exact, n_actual = _make_corpus(root, size, n_queries, seed=23)
            # warm pass (JVM/codegen), then timed
            ivfpq_scaled_topk(spark, str(root), **kw).write.format(
                "noop"
            ).mode("overwrite").save()
            t0 = time.time()
            rows = ivfpq_scaled_topk(spark, str(root), **kw).collect()
            secs = round(time.time() - t0, 3)
            got: dict[int, set] = {}
            for r in rows:
                got.setdefault(r.query_id, set()).add(r.corpus_id)
            recall = sum(
                len(got.get(q, set()) & exact[q]) / 10 for q in exact
            ) / len(exact)
            # report the ACTUAL written corpus size and the params the
            # operator derives from it, not the nominal target (review
            # finding r9: blob rounding undershoots the target)
            out["sizes"][label] = {
                "n": n_actual,
                "params": scaled_ann_params(
                    n_actual,
                    train_cap=kw.get("train_cap", __import__(
                        "finance_pipeline_spark.operators.similarity",
                        fromlist=["_SCALED_TRAIN_CAP"],
                    )._SCALED_TRAIN_CAP),
                ),
                "recall_at10": round(recall, 4),
                "secs": secs,
            }
            print(f"# {label}: {out['sizes'][label]}", file=sys.stderr)
    a, b = out["sizes"]["n"], out["sizes"]["n10x"]
    out["recall_delta_10x"] = round(b["recall_at10"] - a["recall_at10"], 4)
    out["time_ratio_10x"] = round(b["secs"] / max(a["secs"], 1e-9), 2)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
