"""Range (interval) join — value ∈ [lo, hi) band lookup.

Spark executes a plain inequality join as BroadcastNestedLoopJoin
(fine when one side is tiny, quadratic otherwise). The scalable form
bucketizes: expand each band into the fixed-width buckets it overlaps,
compute the probe row's bucket, equi-join on bucket, then re-check the
exact predicate — turning O(N·M) into a hash join with bounded
duplication (bands spanning B buckets appear B times).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_bucketed(
    probe: DataFrame,
    bands: DataFrame,
    *,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each probe row to every band with ``lo <= value < hi``.

    ``bands`` must have finite ``lo``/``hi``. The equi-join key is the
    bucket index ``floor(x / bucket_width)``; pick ``bucket_width``
    near the typical band width so duplication stays ~1-2×.
    """
    b = bands.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                # hi is exclusive: a band ending exactly on a bucket
                # boundary does not overlap the next bucket
                F.floor(
                    (F.col(hi_col) - F.lit(1e-9)) / bucket_width
                ).cast("long"),
            )
        ),
    )
    p = probe.withColumn(
        "__bucket", F.floor(F.col(value_col) / bucket_width).cast("long")
    )
    out = p.join(b, "__bucket", how).filter(
        (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
    )
    return out.drop("__bucket")
