"""Compare bench JSON records with repeat-aware verdicts.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [NEW2.json ...] [--bar 2.0]

Multiple NEW files implement BASELINE.md's merged-min protocol
("Bench noise protocol"): this steal-prone host needs 3 full runs x 3
repeats, compared by the per-query MIN across all runs. The NEW
records are merged query-wise by min with their repeat lists
concatenated, so the spread heuristic sees every sample.

Per query present in both records: ratio = new_min / old_min.
- ratio <= bar               -> ok
- ratio >  bar, but the new record's repeats disagree by more than
  _NOISE_SPREAD (max/min across repeats)  -> steal-suspect (this host
  shows bursty CPU-steal windows; a wild spread means the minimum
  itself is unreliable — re-measure before calling it a regression)
- ratio >  bar with tight repeats         -> REGRESSION (exit 1)

Queries only in NEW set their own bar ("new"); queries only in OLD are
reported as "dropped" (exit 1 — a silently vanished bench entry is how
perf coverage erodes).

Accepts both the raw bench.py output shape ({"queries": ...}) and the
driver's recorded shape ({"parsed": {"queries": ...}}).
"""

from __future__ import annotations

import json
import sys

_NOISE_SPREAD = 2.0  # max/min across a query's repeats before the
# minimum is considered unreliable on this steal-prone host


def _load(path: str) -> dict:
    rec = json.loads(open(path).read())
    if "parsed" in rec and isinstance(rec["parsed"], dict):
        rec = rec["parsed"]
    return rec


def compare(old: dict, new: dict, bar: float) -> tuple[list[str], int]:
    """Returns (report lines, exit code)."""
    oq, nq = old.get("queries", {}), new.get("queries", {})
    reps = new.get("repeats", {})
    lines: list[str] = []
    rc = 0
    for name in sorted(set(oq) | set(nq)):
        if name not in nq:
            lines.append(f"DROPPED     {name}: was {oq[name]:.3f}s, no longer benched")
            rc = 1
            continue
        if name not in oq:
            lines.append(f"new         {name}: {nq[name]:.3f}s (sets its own bar)")
            continue
        ratio = nq[name] / oq[name] if oq[name] > 0 else float("inf")
        r = reps.get(name) or [nq[name]]
        spread = (max(r) / min(r)) if min(r) > 0 else float("inf")
        if ratio <= bar:
            lines.append(f"ok          {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s ({ratio:.2f}x)")
        elif spread > _NOISE_SPREAD:
            lines.append(
                f"steal?      {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s "
                f"({ratio:.2f}x) but repeats {r} spread {spread:.1f}x — re-measure"
            )
        elif len(r) < 2:
            # One sample per query (a driver-recorded stdout JSON has no
            # repeats — they live in bench_detail.json): a single number
            # on this steal-prone host can't be called "tight". Still
            # exit 1 so the gate trips, but say what to actually run.
            lines.append(
                f"REGRESSION? {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s "
                f"({ratio:.2f}x > {bar}x bar, SINGLE sample — run the "
                "BASELINE.md merged-min protocol / probe_query before "
                "believing it)"
            )
            rc = 1
        else:
            lines.append(
                f"REGRESSION  {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s "
                f"({ratio:.2f}x > {bar}x bar, repeats {r} are tight)"
            )
            rc = 1
    return lines, rc


def merge_records(records: list[dict]) -> dict:
    """BASELINE.md merged-min: query-wise min across records, repeat
    lists concatenated (every sample feeds the spread heuristic). A
    query missing from SOME runs keeps the samples it has — but a
    query must appear in at least one record to survive, so the
    dropped-entry check still fires."""
    queries: dict[str, float] = {}
    repeats: dict[str, list[float]] = {}
    for rec in records:
        for name, sec in rec.get("queries", {}).items():
            queries[name] = min(queries.get(name, sec), sec)
            repeats.setdefault(name, []).extend(
                rec.get("repeats", {}).get(name) or [sec]
            )
    return {"queries": queries, "repeats": repeats}


def main() -> int:
    args = []
    skip = False
    for i, a in enumerate(sys.argv[1:], 1):
        if skip:
            skip = False
            continue
        if a == "--bar":
            skip = True
            continue
        if not a.startswith("--"):
            args.append(a)
    bar = 2.0
    if "--bar" in sys.argv:
        bar = float(sys.argv[sys.argv.index("--bar") + 1])
    if len(args) < 2:
        print(__doc__)
        return 2
    new = merge_records([_load(p) for p in args[1:]])
    lines, rc = compare(_load(args[0]), new, bar)
    print("\n".join(lines))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
