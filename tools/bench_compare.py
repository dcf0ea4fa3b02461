"""Compare two bench JSON records with repeat-aware verdicts.

Usage:
    python tools/bench_compare.py OLD.json NEW.json [--bar 2.0]

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
        else:
            lines.append(
                f"REGRESSION  {name}: {oq[name]:.3f}s -> {nq[name]:.3f}s "
                f"({ratio:.2f}x > {bar}x bar, repeats {r} are tight)"
            )
            rc = 1
    return lines, rc


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    bar = 2.0
    if "--bar" in sys.argv:
        bar = float(sys.argv[sys.argv.index("--bar") + 1])
    if len(args) != 2:
        print(__doc__)
        return 2
    lines, rc = compare(_load(args[0]), _load(args[1]), bar)
    print("\n".join(lines))
    return rc


if __name__ == "__main__":
    raise SystemExit(main())
