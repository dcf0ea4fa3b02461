"""Scale probe for the stored dedup index + streaming ingest
(``pipelines/dedup_index.CorpusDedupIndex`` via
``pipelines/corpus_ingest.ingest_with_index``) — the round-7 verdict's
one major component with only unit-scale evidence.

Feeds the sf0.1 documents table (5,000 docs) through the indexed
ingest in N equal micro-batches, with a fraction of each batch
replaced by exact re-crawls and near-copies of earlier batches'
documents, then prints per-batch timings and index stats. The signal:
per-batch cost must stay ~FLAT as the stored corpus grows from 0 to
~5k docs — the screen is a bloom probe plus key-only semi-joins, so
batch cost is O(|batch|) + bounded probes, never a corpus rescan.

Usage: python tools/probe_ingest_scale.py [n_batches] [dup_permille] [--lm]
Prints one JSON line per batch plus a summary line. ``--lm`` threads
the stored bigram-LM (``--lm-index``) through the ingest, so the probe
also measures the familiarity screen's per-batch cost as the stored
LM grows.
"""

from __future__ import annotations

import json
import random
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import pandas as pd  # noqa: E402

from finance_pipeline_spark.pipelines.corpus_ingest import (  # noqa: E402
    ingest_with_index,
)
from finance_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    with_lm = "--lm" in sys.argv
    n_batches = int(args[0]) if len(args) > 0 else 8
    dup_pm = int(args[1]) if len(args) > 1 else 100  # 10% dups
    sf_dir = "/root/testdata/sf0.1"

    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[
        ["doc_id", "text", "lang", "source", "n_chars"]
    ].reset_index(drop=True)
    rng = random.Random(8)
    work = Path(tempfile.mkdtemp(prefix="ingest_probe_"))
    src = work / "incoming"
    src.mkdir()

    per = len(docs) // n_batches
    seen_texts: list[str] = []
    next_id = int(docs["doc_id"].max()) + 1
    for b in range(n_batches):
        chunk = docs.iloc[b * per : (b + 1) * per].copy()
        if seen_texts:
            # replace dup_pm permille of this batch with re-crawls of
            # earlier INGESTED content (fresh doc_ids — content identity
            # is what the index must catch)
            n_dup = max(1, per * dup_pm // 1000)
            idx = rng.sample(range(len(chunk)), n_dup)
            for i in idx:
                t = rng.choice(seen_texts)
                chunk.iloc[i, chunk.columns.get_loc("text")] = t
                chunk.iloc[i, chunk.columns.get_loc("n_chars")] = len(t)
        chunk["doc_id"] = range(next_id, next_id + len(chunk))
        next_id += len(chunk)
        chunk.to_parquet(src / f"b{b:03d}.parquet")
        # record what actually reached the index: the POST-replacement
        # batch (a replaced-away original was never ingested, so
        # replaying it would screen 'keep' and skew the planted rate)
        seen_texts.extend(chunk["text"].dropna())

    spark = get_session("ingest_scale_probe")
    stats = ingest_with_index(
        spark,
        str(src),
        str(work / "index"),
        str(work / "kept"),
        str(work / "ckpt"),
        max_files_per_trigger=1,
        lm_root=str(work / "lm") if with_lm else None,
    )
    for s in stats:
        print(json.dumps(s))
    times = [s["elapsed_sec"] for s in stats]
    if not times:  # empty-source race: report it, don't crash post-run
        print(json.dumps({"summary": "no batches ran", "batches": 0}))
        shutil.rmtree(work, ignore_errors=True)
        return 1
    print(
        json.dumps(
            {
                "summary": "per-batch elapsed as corpus grows",
                "batches": len(stats),
                "docs_per_batch": per,
                "first_batch_sec": times[0],
                "last_batch_sec": times[-1],
                # a sub-ms batch rounds to 0.000 — guard the ratio
                "max_over_min": (
                    round(max(times) / min(times), 2) if min(times) > 0 else None
                ),
                "total_kept": sum(s["kept"] for s in stats),
                "total_dropped_exact": sum(s["dropped_exact"] for s in stats),
            }
        )
    )
    shutil.rmtree(work, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
