"""10x scale probe for the END-TO-END curation pipeline (r9 verdict
item 9 — the stage-level probes exist for ANN/ingest/LM; this one runs
``curate_corpus`` itself at two corpus sizes and reports per-stage
elapsed + the cap-drop ledger at each).

The signal: no stage may grow super-linearly in corpus size. The
hazard stages are near-dedup (banded LSH — pair volume is bucket-
capped, so it must track corpus size, not its square), span scrub
(sliding md5 windows over duplicated runs only), and decontamination
(shuffle-hash join on (lang, shingle)). A stage whose 10x ratio lands
well past 10 is the regression this probe exists to catch.

Usage: python tools/probe_curation_scale.py [small_sf_dir] [big_sf_dir]
Defaults: /root/testdata/sf0.01 vs /root/testdata/sf0.1 (500 → 5,000
docs). Prints one JSON line: per-size {stats, stage_secs, total_sec}
plus per-stage 10x ratios.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from finance_pipeline_spark.pipelines.curation import curate_corpus  # noqa: E402
from finance_pipeline_spark.session import get_session  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    small = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
    big = args[1] if len(args) > 1 else "/root/testdata/sf0.1"

    spark = get_session("probe_curation_scale")
    work = Path(tempfile.mkdtemp(prefix="curation_probe_"))
    out: dict = {"sizes": {}}
    try:
        for tag, sf in (("warmup", small), ("small", small), ("big", big)):
            t0 = time.monotonic()
            stats = curate_corpus(
                spark, sf, str(work / f"out_{tag}"), n_shards=4
            )
            total = round(time.monotonic() - t0, 3)
            if tag == "warmup":  # JVM/codegen warm pass, not measured
                continue
            out["sizes"][tag] = {
                "sf_dir": sf,
                "n_input": stats["n_input"],
                "n_exported": stats["n_exported"],
                "over_cap_buckets": stats["n_dropped_buckets"],
                "docs_excluded_from_pairing": stats[
                    "n_docs_in_dropped_buckets"
                ],
                "stage_secs": stats["stage_secs"],
                "total_sec": total,
            }
        sm, bg = out["sizes"]["small"], out["sizes"]["big"]
        scale = bg["n_input"] / max(sm["n_input"], 1)
        out["input_scale"] = round(scale, 2)
        out["stage_ratio_10x"] = {
            k: round(bg["stage_secs"][k] / max(sm["stage_secs"][k], 1e-3), 2)
            for k in bg["stage_secs"]
            if k in sm["stage_secs"]
        }
        out["total_ratio_10x"] = round(
            bg["total_sec"] / max(sm["total_sec"], 1e-3), 2
        )
        print(json.dumps(out))
        return 0
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    raise SystemExit(main())
