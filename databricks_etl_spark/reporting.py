"""Report rendering — the human-readable output boundary of the
quality-analysis pipeline (the engine analog of the reference's
printed tables and matplotlib figures, ``pre_analysis.py:89-110,
163-195,454-473`` and ``transform.py:214-228``).

Design: every metric stays a tidy DataFrame computed distributed
(operators/profile.py); rendering consumes only those SMALL aggregate
frames driver-side (metric rows, value counts, histogram buckets — all
bounded), so the boundary is identical at sf0.001 and 100 TB. Output
is Markdown with Unicode bar charts: dependency-free (this container
ships no matplotlib), diffable, and viewable anywhere. A deployment
that wants figures plugs the same tidy frames into any plotting lib —
``to_rows`` hands over plain Python structures.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BAR_WIDTH = 30
_FULL = "█"


def _bar(value: float, vmax: float, width: int = _BAR_WIDTH) -> str:
    if vmax <= 0:
        return ""
    n = int(round(width * max(0.0, min(value, vmax)) / vmax))
    return _FULL * n


def _md_table(headers: Sequence[str], rows: Sequence[Sequence]) -> str:
    head = "| " + " | ".join(headers) + " |"
    sep = "|" + "|".join("---" for _ in headers) + "|"
    body = "\n".join(
        "| " + " | ".join(str(v) for v in r) + " |" for r in rows
    )
    return "\n".join([head, sep, body]) if rows else head + "\n" + sep


def render_profile_section(profile_df: DataFrame) -> str:
    """Render a ``profile_report`` tidy frame (metric, column, value)
    as Markdown tables with inline bars — one table per metric. The
    input is metrics-per-column sized (bounded), so the collect is the
    sanctioned aggregate-output class."""
    rows = profile_df.collect()
    by_metric: dict[str, list] = {}
    for r in rows:
        by_metric.setdefault(r["metric"], []).append(r)
    out = []
    for metric in sorted(by_metric):
        out.append(f"### {metric}\n")
        table = [
            (
                r["column"],
                f"{r['value']:.2f}" if r["value"] is not None else "—",
                _bar(r["value"] or 0.0, 100.0),
            )
            for r in sorted(by_metric[metric], key=lambda r: r["column"])
        ]
        out.append(_md_table(["column", "%", ""], table))
        out.append("")
    return "\n".join(out)


def render_value_counts(
    df: DataFrame, col: str, *, top: int = 10
) -> str:
    """Frequency-analysis rendering (the reference's per-column
    value-count bar plots): top-N values with count bars. Aggregation
    is distributed; only N rows reach the driver."""
    vc = (
        df.groupBy(col)
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), col)
        .limit(top)
        .collect()
    )
    vmax = max((r["n"] for r in vc), default=0)
    table = [(r[col], r["n"], _bar(r["n"], vmax)) for r in vc]
    return f"### value counts: {col}\n\n" + _md_table(
        [col, "count", ""], table
    )


def render_histogram(
    df: DataFrame, col: str, *, buckets: int = 10
) -> str:
    """Fixed-width histogram rendering (the reference's distribution
    plots): bucket boundaries from one min/max pass, counts from one
    grouped aggregate, bars driver-side."""
    mm = df.agg(
        F.min(F.col(col).cast("double")).alias("lo"),
        F.max(F.col(col).cast("double")).alias("hi"),
    ).collect()[0]
    lo, hi = mm["lo"], mm["hi"]
    if lo is None or hi is None:
        return f"### histogram: {col}\n\n(no data)"
    span = (hi - lo) or 1.0
    b = F.least(
        F.lit(buckets - 1),
        F.floor((F.col(col).cast("double") - lo) / span * buckets).cast("int"),
    )
    counts = {
        r["b"]: r["n"]
        for r in df.where(F.col(col).isNotNull())
        .groupBy(b.alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    vmax = max(counts.values(), default=0)
    table = []
    for i in range(buckets):
        left = lo + span * i / buckets
        right = lo + span * (i + 1) / buckets
        n = counts.get(i, 0)
        table.append((f"[{left:.2f}, {right:.2f})", n, _bar(n, vmax)))
    return f"### histogram: {col}\n\n" + _md_table(["bucket", "count", ""], table)


def quality_report_markdown(
    df: DataFrame,
    *,
    title: str,
    integrity_checks: dict[str, Column] | None = None,
    count_cols: Sequence[str] = (),
    hist_cols: Sequence[str] = (),
) -> str:
    """The EP1 report end to end: one fused profile aggregation + the
    requested frequency/distribution sections, rendered as a single
    Markdown document — what the reference's analysis notebook prints
    and plots, re-expressed against tidy distributed aggregates."""
    from databricks_etl_spark.operators.profile import profile_report

    parts = [f"# Data-quality report — {title}\n"]
    parts.append(f"rows: **{df.count()}**\n")
    parts.append(
        render_profile_section(
            profile_report(df, integrity_checks=integrity_checks)
        )
    )
    for c in count_cols:
        parts.append(render_value_counts(df, c))
        parts.append("")
    for c in hist_cols:
        parts.append(render_histogram(df, c))
        parts.append("")
    return "\n".join(parts)


def save_report(text: str, path: str) -> None:
    """Write the rendered report (driver-side small text)."""
    with open(path, "w", encoding="utf-8") as f:
        f.write(text)
