"""Exact rank-based robust statistics (no engine quantile functions).

Quantiles via integer rank selection — value at rank ceil(p·n) within
each group, picked by ``row_number`` — so ANY engine reproduces the
identical result with the identical integer arithmetic: there is no
interpolation/discrete-semantics gap between Spark's ``percentile``
family and another engine's ``quantile_*`` to paper over. The same
property makes these oracle-checkable bit-for-bit (q239/q241).

All selections use the LOWER rank (ceil), all medians are the lower
median at rank (n+1)//2. Deterministic for integer and exact-decimal
columns; for floats the selection is deterministic given a tiebreak
column.

Scale: one shuffle per rank pass (group-key window + rollup on the
same key — no second exchange); MAD adds a join against the ≤|groups|-
row medians relation, which AQE broadcasts.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _rank_expr(p: Fraction) -> str:
    """Integer SQL for ceil(p·n) with n the group size: (num·n + den−1)
    DIV den."""
    return f"(({p.numerator} * n) + {p.denominator - 1}) DIV {p.denominator}"


def group_quantiles(
    df: DataFrame,
    key: str,
    col: str,
    ps: dict[str, Fraction],
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-``key`` exact quantiles of ``col`` at the given fractions.

    ``ps`` maps output column name → Fraction(p), e.g.
    ``{"p25": Fraction(1, 4)}``. Returns (key, n_rows, <one column per
    entry>). One window shuffle + one same-key rollup.
    """
    order = [F.col(col).asc()]
    if tiebreak is not None:
        order.append(F.col(tiebreak).asc())
    w = Window.partitionBy(key)
    r = df.select(
        key,
        col,
        F.row_number().over(w.orderBy(*order)).alias("rn"),
        F.count(F.lit(1)).over(w).alias("n"),
    )
    aggs = [F.max("n").cast("long").alias("n_rows")]
    for out, p in ps.items():
        aggs.append(
            F.max(
                F.when(F.col("rn") == F.expr(_rank_expr(p)), F.col(col))
            ).alias(out)
        )
    return r.groupBy(key).agg(*aggs)


def group_lower_median(
    df: DataFrame, key: str, col: str, out: str, tiebreak: str | None = None
) -> DataFrame:
    """Per-key lower median (rank (n+1)//2): (key, out)."""
    q = group_quantiles(df, key, col, {out: Fraction(1, 2)}, tiebreak)
    return q.select(key, out)


def group_mad(
    df: DataFrame,
    key: str,
    col: str,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key median + median-absolute-deviation (both lower medians):
    (key, median, mad). The robust location/scale pair for outlier
    gates — unlike mean/stddev, not dragged by the outliers themselves.
    """
    med = group_lower_median(df, key, col, "median", tiebreak)
    dev = df.join(med, key).withColumn(
        "__adev", F.abs(F.col(col) - F.col("median"))
    )
    mad = group_lower_median(
        dev.select(key, "__adev", *( [tiebreak] if tiebreak else [] )),
        key,
        "__adev",
        "mad",
        tiebreak,
    )
    return med.join(mad, key)


def mad_outliers(
    df: DataFrame,
    key: str,
    col: str,
    k: float = 3.0,
    tiebreak: str | None = None,
) -> DataFrame:
    """Per-key robust outlier report: (key, n_rows, median, mad,
    n_outliers) with outlier ⇔ |x − median| > k·mad."""
    mm = group_mad(df, key, col, tiebreak)
    dev = df.join(mm, key)
    flag = F.abs(F.col(col) - F.col("median")) > k * F.col("mad")
    return dev.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.max("median").alias("median"),
        F.max("mad").alias("mad"),
        F.count_if(flag).cast("long").alias("n_outliers"),
    )
