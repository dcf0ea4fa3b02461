"""Tabular display (SURVEY.md §2.8 M2/M3) — the reference prints a
fancy-grid table after every load (``tabulate`` at
etl/csv_loader.py:235 et al.). Spark's ``df.show()`` is the native
form; these helpers add the reference's two conversion surfaces:
a capture-able grid string and dict-records."""

from __future__ import annotations

from pyspark.sql import DataFrame


def to_records(df: DataFrame, limit: int | None = None) -> list[dict]:
    """M3 ``df.to_dict("records")`` (services/supabase.py:32) — bounded
    driver-side collect; cap with ``limit`` (uncapped collects are the
    anti-pattern the engine otherwise avoids)."""
    capped = df.limit(limit) if limit is not None else df
    return [r.asDict(recursive=True) for r in capped.collect()]


def grid(df: DataFrame, n: int = 10) -> str:
    """M2 fancy-grid rendering of the first n rows, as a string (the
    reference prints; returning lets callers log or assert on it)."""
    rows = df.limit(n).collect()
    cols = df.columns
    cells = [[str(v) for v in (row[c] for c in cols)] for row in rows]
    widths = [
        max(len(c), *(len(r[i]) for r in cells)) if cells else len(c)
        for i, c in enumerate(cols)
    ]

    def line(left: str, mid: str, right: str, fill: str) -> str:
        return left + mid.join(fill * (w + 2) for w in widths) + right

    def row_str(vals) -> str:
        return "│" + "│".join(f" {v:<{w}} " for v, w in zip(vals, widths)) + "│"

    out = [line("╒", "╤", "╕", "═"), row_str(cols), line("╞", "╪", "╡", "═")]
    for r in cells:
        out.append(row_str(r))
        out.append(line("├", "┼", "┤", "─"))
    if cells:
        out[-1] = line("╘", "╧", "╛", "═")
    else:
        out.append(line("╘", "╧", "╛", "═"))
    return "\n".join(out)
