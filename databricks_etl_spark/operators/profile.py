"""Data-quality profiling (EP1, ``pre_analysis.py``) — fused single-pass.

The reference computes each metric with one or two Spark actions *per
column* (completeness loop ``pre_analysis.py:75-85``, uniqueness loop
``139-149``, integrity dispatch ``299-359``) — dozens of full-table
re-scans per report. That pattern is exactly what dies at 100 TB
(SURVEY.md §4.1), so every profile operator here is a **single
conditional aggregation**: one scan, one (tiny) shuffle-free reduce,
all columns at once. The result is returned as a tidy long-format
DataFrame (``column``, metric) so it is oracle-checkable and
plot-ready without collecting raw data.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _unpivot(agg_row: DataFrame, cols: Sequence[str], value_name: str) -> DataFrame:
    """One-row-wide → long (column, value) via ``stack`` (no shuffle)."""
    n = len(cols)
    pairs = ", ".join(f"'{c}', `{c}`" for c in cols)
    return agg_row.select(
        F.expr(f"stack({n}, {pairs}) as (column, {value_name})")
    )


def completeness(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """A9 per-column % non-null (``calculate_completeness_percentages``,
    ``pre_analysis.py:75-85``) — one job for all columns.

    Returns ``(column string, pct_complete double)``.
    """
    cols = list(cols or df.columns)
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[F.count(c).alias(c) for c in cols],  # count(col) skips NULLs
    )
    wide = agg.select(
        *[
            F.try_divide(F.lit(100.0) * F.col(f"`{c}`"), F.col("__total")).alias(c)
            for c in cols
        ]  # try_divide: an EMPTY table reports NULL, never 100%-complete
    )
    return _unpivot(wide, cols, "pct_complete")


def uniqueness(df: DataFrame, cols: Sequence[str] | None = None, *, exact: bool = True) -> DataFrame:
    """A10 per-column distinct/total % (``pre_analysis.py:139-149``),
    one pass. ``exact=False`` switches to ``approx_count_distinct``
    (HLL) — the 100 TB default per SURVEY.md §4.3 (the oracle-checked
    path stays exact).

    Returns ``(column string, pct_unique double)``.
    """
    cols = list(cols or df.columns)
    d = F.countDistinct if exact else F.approx_count_distinct
    agg = df.agg(
        F.count(F.lit(1)).alias("__total"),
        *[d(c).alias(c) for c in cols],
    )
    wide = agg.select(
        *[
            F.try_divide(F.lit(100.0) * F.col(f"`{c}`"), F.col("__total")).alias(c)
            for c in cols
        ]  # NULL on empty input, as in completeness
    )
    return _unpivot(wide, cols, "pct_unique")


def integrity(df: DataFrame, checks: dict[str, Column]) -> DataFrame:
    """A11 per-column % of non-null values passing a validity predicate
    (``check_user_id``/``check_type``/... ``pre_analysis.py:236-295``,
    dispatch table ``331-359``) — the whole family in one scan.

    ``checks`` maps column name → boolean predicate over that column.
    Denominator = non-null count, matching the reference (valid/total
    over non-nulls). Returns ``(column string, pct_valid double)``.
    """
    cols = list(checks)
    agg = df.agg(
        *[
            F.sum(F.when(pred, 1).otherwise(0)).alias(f"__ok_{c}")
            for c, pred in checks.items()
        ],
        *[F.count(c).alias(f"__nn_{c}") for c in cols],
    )
    wide = agg.select(
        *[
            F.try_divide(
                F.lit(100.0) * F.col(f"__ok_{c}"), F.col(f"__nn_{c}")
            ).alias(c)
            for c in cols
        ]  # NULL when the column has no non-null values (0/0 trap)
    )
    return _unpivot(wide, cols, "pct_valid")


def summary_stats(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A6 ``describe()`` re-expressed as an explicit aggregation so the
    output is typed (doubles, not strings) and oracle-checkable.

    Returns one row per column: ``(column, n, mean, std, min, max)``.
    Note ``std`` is the *sample* stddev, matching both ``describe`` and
    ANSI ``stddev``.
    """
    parts = []
    for c in cols:
        parts.append(
            df.agg(
                F.lit(c).alias("column"),
                F.count(c).cast("long").alias("n"),
                F.avg(c).alias("mean"),
                F.stddev_samp(c).alias("std"),
                F.min(c).cast("double").alias("min"),
                F.max(c).cast("double").alias("max"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out


def correlation_pairs(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A7 pairwise Pearson correlation, computed **in Spark** in a single
    aggregation — the reference collects raw columns to pandas first
    (``pre_analysis.py:653,678,693,711``), a driver-OOM at scale.

    Returns ``(col_x, col_y, corr)`` for x < y (upper triangle).
    """
    cols = list(cols)
    aggs, names = [], []
    for i, x in enumerate(cols):
        for y in cols[i + 1 :]:
            aggs.append(F.corr(x, y).alias(f"{x}||{y}"))
            names.append((x, y))
    row = df.agg(*aggs)
    n = len(names)
    triples = ", ".join(f"'{x}', '{y}', `{x}||{y}`" for x, y in names)
    return row.select(F.expr(f"stack({n}, {triples}) as (col_x, col_y, corr)"))


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """A7 alternative: full Pearson matrix via ``pyspark.ml.stat.
    Correlation`` (single pass over assembled vectors — preferable to
    O(k²) pairwise ``F.corr`` when k is large). Returns the same tidy
    ``(col_x, col_y, corr)`` upper triangle as
    :func:`correlation_pairs`; agreement asserted in tests."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    cols = list(cols)
    assembled = VectorAssembler(inputCols=cols, outputCol="__v").transform(
        df.select(*cols)
    )
    mat = Correlation.corr(assembled, "__v").head()[0].toArray()
    rows = [
        (cols[i], cols[j], float(mat[i][j]))
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    return df.sparkSession.createDataFrame(rows, "col_x string, col_y string, corr double")


def profile_report(
    df: DataFrame,
    *,
    cols: Sequence[str] | None = None,
    integrity_checks: dict[str, Column] | None = None,
) -> DataFrame:
    """EP1 composite: completeness + uniqueness (+ integrity) for a
    whole table in ONE aggregation job (the reference issues 1–2 jobs
    *per column per metric*, ``pre_analysis.py:75-85,139-149,299-327``).

    Returns a tidy long frame ``(metric, column, value)``. The wide
    one-row aggregate is computed once and unpivoted three ways.
    """
    cols = list(cols or df.columns)
    checks = integrity_checks or {}
    aggs = [F.count(F.lit(1)).alias("__total")]
    aggs += [F.count(c).alias(f"__nn_{c}") for c in cols]
    aggs += [F.countDistinct(c).alias(f"__nd_{c}") for c in cols]
    aggs += [
        F.sum(F.when(pred, 1).otherwise(0)).alias(f"__ok_{c}")
        for c, pred in checks.items()
    ]
    wide = df.agg(*aggs).persist()  # one row; reused by each unpivot
    # try_divide: an EMPTY table (total = 0) reports NULL metrics, never
    # a DIVIDE_BY_ZERO crash and never a fabricated 100% (the same 0/0
    # policy as the standalone completeness/uniqueness operators)
    comp = wide.select(
        *[
            F.try_divide(
                F.lit(100.0) * F.col(f"__nn_{c}"), F.col("__total")
            ).alias(c)
            for c in cols
        ]
    )
    uniq = wide.select(
        *[
            F.try_divide(
                F.lit(100.0) * F.col(f"__nd_{c}"), F.col("__total")
            ).alias(c)
            for c in cols
        ]
    )
    out = _unpivot(comp, cols, "value").withColumn("metric", F.lit("pct_complete")).union(
        _unpivot(uniq, cols, "value").withColumn("metric", F.lit("pct_unique"))
    )
    if checks:
        integ = wide.select(
            *[
                F.try_divide(
                    F.lit(100.0) * F.col(f"__ok_{c}"), F.col(f"__nn_{c}")
                ).alias(c)
                for c in checks
            ]
        )
        out = out.union(
            _unpivot(integ, list(checks), "value").withColumn("metric", F.lit("pct_valid"))
        )
    return out.select("metric", "column", "value")


def flag_validity(df: DataFrame, flag_cols: Sequence[str]) -> DataFrame:
    """Reference flag-consistency check (``pre_analysis.py:374-402``):
    % of rows where each 0/1 flag is a valid binary value.

    Returns ``(column, pct_valid)`` — thin wrapper over :func:`integrity`.
    """
    return integrity(df, {c: F.col(c).isin(0, 1) for c in flag_cols})
