"""Grouped-map operator (SURVEY.md §2.10: ``applyInPandas``) — the
per-group pandas-DataFrame-in/out shape for logic that genuinely needs
a whole group in memory (model-per-group, complex reshapes).

For anything expressible as window/aggregate expressions (like the
z-score below), the JVM window path is preferred at scale — this
module exists to provide the UDF surface and to cross-validate it
against the window implementation (tests/test_grouped_map.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def zscore_per_group(
    df: DataFrame, group_col: str, value_col: str, id_col: str
) -> DataFrame:
    """Per-group z-score via grouped-map applyInPandas (sample stddev,
    matching ``stddev_samp``). Groups are shuffled to executors and
    processed as Arrow batches — group size must fit executor memory
    (the window formulation in q79 has no such bound)."""

    def norm(pdf):
        std = pdf[value_col].std(ddof=1)
        mean = pdf[value_col].mean()
        out = pdf[[id_col, group_col]].copy()
        out["z"] = (pdf[value_col] - mean) / std
        return out

    return df.groupBy(group_col).applyInPandas(
        norm, schema=f"{id_col} long, {group_col} string, z double"
    )


def ols_fit_per_group(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Per-group ordinary-least-squares fit (slope/intercept of
    y = a + b·x) via grouped-map ``applyInPandas`` — the
    model-per-group shape (one model object per group, whole group in
    memory; cf. pandas-on-Spark's ML-per-key idiom).

    Exactness contract (what makes this oracle-checkable): inputs are
    quantized to 6dp and scaled to *integers* (×10⁶ — lossless, the
    data carries ≤2 decimal places); the closed form
    b = (nΣxy − ΣxΣy)/(nΣxx − (Σx)²) is then pure arbitrary-precision
    integer arithmetic — the same integers an ANSI engine gets from
    ``SUM(CAST(CAST(v AS DECIMAL(18,6)) * 1e6 AS HUGEINT))``. Only the
    final divisions happen in float, in the identical expression tree
    on both engines (int→double conversions are correctly rounded in
    both). A float64 ``numpy`` fit would be order-dependent and
    hash-flaky; this is not.

    Scale: one shuffle on the group key; each group must fit executor
    memory. For tiny group counts over huge groups, prefer the
    aggregate closed form (this query's own oracle SQL) — the UDF
    path exists for estimators without a SQL closed form.
    """
    from decimal import Decimal

    import pandas as pd

    q6 = Decimal("0.000001")

    def to_int6(v) -> int:
        return int(Decimal(repr(float(v))).quantize(q6).scaleb(6))

    def fit(pdf):
        xs = [to_int6(v) for v in pdf[x_col]]  # ×1e6
        ys = [to_int6(v) for v in pdf[y_col]]  # ×1e6
        n = len(xs)
        sx, sy = sum(xs), sum(ys)  # ×1e6
        sxx = sum(x * x for x in xs)  # ×1e12
        sxy = sum(x * y for x, y in zip(xs, ys))  # ×1e12
        num, den = n * sxy - sx * sy, n * sxx - sx * sx  # both ×1e12
        if den == 0:
            # degenerate group: constant x (or n = 1) has no defined
            # slope — report NULLs instead of ZeroDivisionError killing
            # the whole applyInPandas stage
            slope = intercept = None
        else:
            b = float(num) / float(den)  # unrounded for the intercept
            slope = round(b, 6)
            intercept = round(
                (float(sy) / 1e6 - b * (float(sx) / 1e6)) / n, 6
            )
        return pd.DataFrame(
            {
                group_col: [pdf[group_col].iloc[0]],
                "n_rows": [n],
                "slope": [slope],
                "intercept": [intercept],
            }
        )

    return df.groupBy(group_col).applyInPandas(
        fit, schema=f"{group_col} string, n_rows long, slope double, intercept double"
    )
