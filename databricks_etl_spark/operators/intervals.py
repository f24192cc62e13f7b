"""Interval algebra over event streams (gaps-and-islands).

The union-of-intervals problem — merge overlapping [start, end] ranges
per key and measure the union — is the classic "hard in SQL" shape a
sessionization/occupancy pipeline needs (naive SUM(end-start) double-
counts every overlap). Solved with the running-max-end chain: sort
within key, a new island starts exactly where start > max(all previous
ends). One key shuffle; windows and rollups all ride the same
partitioning.

Backs q245_interval_union_coverage; brute-force-equivalence property
tests in tests/test_properties.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def interval_islands(
    df: DataFrame,
    key: str,
    start: str | Column,
    end: str | Column,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Assign each interval row to its merged island.

    Returns the input columns plus ``island_id`` (1-based within key).
    Intervals touching or overlapping ([1,5] and [5,9]) merge; a gap
    strictly greater than zero starts a new island. Deterministic for
    any numeric/temporal start/end; pass ``order_tiebreak`` (e.g. an
    id column) so equal starts order stably.
    """
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    order = [s.asc(), e.asc()]
    if order_tiebreak is not None:
        order.append(F.col(order_tiebreak).asc())
    wprev = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    wcum = (
        Window.partitionBy(key)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = df.withColumn("__prev_max_e", F.max(e).over(wprev)).withColumn(
        "__new_island",
        F.when(
            F.col("__prev_max_e").isNull() | (s > F.col("__prev_max_e")), 1
        ).otherwise(0),
    )
    return flagged.withColumn(
        "island_id", F.sum("__new_island").over(wcum)
    ).drop("__prev_max_e", "__new_island")


def interval_union_stats(
    df: DataFrame,
    key: str,
    start: str | Column,
    end: str | Column,
    order_tiebreak: str | None = None,
) -> DataFrame:
    """Per-key union measure: (key, n_islands, covered) where covered
    is the summed length of the merged islands — the true activity
    span, never double-counting overlaps."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    isl = interval_islands(df, key, s, e, order_tiebreak).select(
        key, s.alias("__s"), e.alias("__e"), "island_id"
    )
    per_island = isl.groupBy(key, "island_id").agg(
        (F.max("__e") - F.min("__s")).alias("__covered")
    )
    return per_island.groupBy(key).agg(
        F.count(F.lit(1)).cast("long").alias("n_islands"),
        F.sum("__covered").alias("covered"),
    )
