"""As-of (point-in-time) join — an operator Spark lacks natively
(listed in the public Spark OLAP-patterns canon; DuckDB/Pandas have it
built in).

Implementation: the **union + partitioned forward-fill** formulation —
tag both sides, union on (key, ts), and carry the most recent right-
side payload forward with ``last(ignorenulls)`` over a partitioned
ordered window. One shuffle on the key, per-partition sort, linear
work — scales like any windowed aggregation and never builds a range
cross-product. (The ``applyInPandas``+``merge_asof`` alternative ships
rows through Arrow; this stays fully JVM-side.)

Tie semantics: a right row at exactly ``ts`` matches (``>=``), the
same as DuckDB's ``ASOF JOIN`` — enforced by sorting right-side rows
before left-side rows at equal timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
) -> DataFrame:
    """For every left row, attach ``payload_cols`` from the most recent
    right row of the same ``on`` key with ``right_ts <= left_ts``
    (NULLs when no such row). Left rows and count are preserved.
    """
    lt = left.withColumn("__ts", F.col(left_ts)).withColumn("__side", F.lit(1))
    rt = right.select(
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    lt_full = lt.select(
        *left.columns, "__ts", "__side", *[F.lit(None).alias(f"__p_{c}") for c in payload_cols]
    )
    rt_full = rt.select(
        *[
            F.col(c) if c == on else F.lit(None).alias(c)
            for c in left.columns
        ],
        "__ts",
        "__side",
        *[F.col(f"__p_{c}") for c in payload_cols],
    )
    unioned = lt_full.unionByName(rt_full)
    # Forward-fill ONE struct of all payload columns, not each column
    # independently: the struct is non-NULL for every right row (even
    # when every payload field is NULL), so a matching right row with a
    # NULL payload correctly *overwrites* older values instead of being
    # skipped by ignorenulls — matching DuckDB ASOF JOIN, which joins
    # rows, not individual fields.
    pay = F.when(
        F.col("__side") == 0,
        F.struct(*[F.col(f"__p_{c}").alias(c) for c in payload_cols]),
    )  # NULL (no otherwise) for left rows → skipped by ignorenulls
    # right rows sort before left rows at equal __ts → inclusive (>=)
    # match; __pay as the final key makes the winner among right rows
    # sharing an identical (key, ts) deterministic (greatest payload
    # struct) instead of partition-order-dependent.
    unioned = unioned.withColumn("__pay", pay)
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__pay"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.select(
        *left.columns,
        "__side",
        F.last(F.col("__pay"), ignorenulls=True).over(w).alias("__fill"),
    )
    return filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[F.col(f"__fill.{c}").alias(c) for c in payload_cols],
    )


def asof_join_forward(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str,
    left_ts: str,
    right_ts: str,
    payload_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Forward as-of: for every left row, attach ``payload_cols`` from
    the EARLIEST right row of the same key with ``right_ts`` strictly
    AFTER ``left_ts`` (and, with ``tolerance_seconds``, no more than
    that far ahead) — the "next purchase after this click" shape.
    NULL payloads when no such row; left rows/count preserved.

    Same union + single-windowed-pass design as :func:`asof_join`
    (one key shuffle, per-partition sort, no range cross-product),
    mirrored: right rows at equal timestamps sort BEFORE left rows and
    the frame starts one row AFTER current, so an equal-``ts`` right
    row is excluded (strict >) without hiding later matches. Among
    right rows sharing a timestamp the least payload struct wins —
    put an id first in ``payload_cols`` for a deterministic tiebreak.
    """
    lt_full = (
        left.withColumn("__ts", F.col(left_ts))
        .withColumn("__side", F.lit(1))
        .select(
            *left.columns,
            "__ts",
            "__side",
            *[F.lit(None).alias(f"__p_{c}") for c in payload_cols],
        )
    )
    rt_full = right.select(
        *[F.col(c) if c == on else F.lit(None).alias(c) for c in left.columns],
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__p_{c}") for c in payload_cols],
    )
    unioned = lt_full.unionByName(rt_full)
    pay = F.when(
        F.col("__side") == 0,
        F.struct(
            F.col("__ts").alias("__match_ts"),
            *[F.col(f"__p_{c}").alias(c) for c in payload_cols],
        ),
    )
    unioned = unioned.withColumn("__pay", pay)
    # rights sort before lefts at equal __ts → excluded from the
    # strictly-following frame → strict-after semantics
    w = (
        Window.partitionBy(on)
        .orderBy(F.col("__ts"), F.col("__side"), F.col("__pay"))
        .rowsBetween(1, Window.unboundedFollowing)
    )
    filled = unioned.select(
        *left.columns,
        "__ts",
        "__side",
        F.first(F.col("__pay"), ignorenulls=True).over(w).alias("__fill"),
    )
    matched = F.col("__fill").isNotNull() & (
        F.lit(True)
        if tolerance_seconds is None
        else (
            F.col("__fill.__match_ts")
            <= F.col("__ts") + F.make_interval(secs=F.lit(tolerance_seconds))
        )
    )
    return filled.filter(F.col("__side") == 1).select(
        *left.columns,
        *[
            F.when(matched, F.col(f"__fill.{c}")).alias(c)
            for c in payload_cols
        ],
    )
