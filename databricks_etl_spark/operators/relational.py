"""Relational core operators (SURVEY.md §2.2, §2.3, §2.6, §2.7).

Most of the reference's relational surface maps 1:1 onto DataFrame
primitives; what the engine adds is *named, deterministic, composable*
forms. Notes on the non-obvious ones:

- ``dedup_keep_first`` replaces ``dropDuplicates([keys])``
  (``pre_process.py:52-54``), whose surviving row is nondeterministic:
  a ``row_number`` over an explicit order gives oracle-checkable
  semantics (SURVEY.md §2.5 note, hard part (c)).
- ``anti_delete`` is the reference's delete-by-key idiom
  (``pre_process.py:168,201,219,235``).
- ``subtract_rows`` keeps the reference's ``subtract`` = EXCEPT
  DISTINCT semantics (``pre_process.py:139``; hard part (d)) —
  ``except_all_rows`` is provided for multiset EXCEPT.
- ``topk`` is ORDER BY ... LIMIT with an explicit total order
  (tiebreaker required) so result *sets* are stable across engines;
  Spark executes it as ``TakeOrderedAndProject`` (no global sort).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def project(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """P1 explicit column prune (``pre_process.py:90-93``)."""
    return df.select(*cols)


def rename(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    """P3 guarded rename (``pre_process.py:68-73``): missing sources are
    skipped, matching the reference's ``if '_c0' in df.columns`` guard."""
    for src, dst in mapping.items():
        if src in df.columns:
            df = df.withColumnRenamed(src, dst)
    return df


def conditional_update(df: DataFrame, column: str, cond: Column, value: Column) -> DataFrame:
    """P12 overwrite a column only where ``cond`` holds
    (``pre_process.py:270-276``); elsewhere the old value is kept."""
    return df.withColumn(column, F.when(cond, value).otherwise(F.col(column)))


def conditional_null_out(df: DataFrame, column: str, keep_cond: Column) -> DataFrame:
    """P12's implicit-NULL variant: ``when`` with no ``otherwise``
    (``pre_process.py:274-276``) — rows failing ``keep_cond`` get NULL."""
    return df.withColumn(column, F.when(keep_cond, F.col(column)))


def anti_delete(df: DataFrame, bad_rows: DataFrame, on: str | list[str]) -> DataFrame:
    """J4 delete-by-key via LEFT ANTI join (``pre_process.py:168`` ff.)."""
    return df.join(bad_rows, on=on, how="left_anti")


def semi(df: DataFrame, other: DataFrame, on: str | list[str]) -> DataFrame:
    """LEFT SEMI (EXISTS) — dual of J4, engine addition (SURVEY.md §2.3)."""
    return df.join(other, on=on, how="left_semi")


def subtract_rows(df: DataFrame, other: DataFrame) -> DataFrame:
    """SO3 EXCEPT DISTINCT — reference ``subtract`` (``pre_process.py:139``)."""
    return df.subtract(other)


def except_all_rows(df: DataFrame, other: DataFrame) -> DataFrame:
    """Multiset EXCEPT ALL (engine addition; documents the distinction
    from ``subtract`` — SURVEY.md hard part (d))."""
    return df.exceptAll(other)


def dedup_keep_first(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[Column | str]
) -> DataFrame:
    """Deterministic keyed dedup: keep the first row per key under an
    explicit total order. Scale note: this is a single hash-shuffle on
    ``keys`` + per-partition sort — no global sort, skew handled by AQE.
    """
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") == 1).drop("__rn")
    )


def topk(df: DataFrame, order_by: Sequence[Column], k: int) -> DataFrame:
    """ORDER BY ... LIMIT k (O1+O2). Executes as TakeOrderedAndProject:
    per-partition heap of k, then k-merge on the driver — O(k) memory,
    no global shuffle, safe at any scale."""
    return df.orderBy(*order_by).limit(k)


def union_distinct(*dfs: DataFrame) -> DataFrame:
    """SO1 chained column-aligned UNION + DISTINCT
    (``pre_analysis.py:434-441``)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.union(d)
    return out.distinct()


def union_all(*dfs: DataFrame) -> DataFrame:
    """SO2 UNION ALL of filtered row-sets (``pre_process.py:139``)."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.union(d)
    return out


def intersect_rows(df: DataFrame, other: DataFrame) -> DataFrame:
    """INTERSECT (engine addition for set-op completeness)."""
    return df.intersect(other)


def select_star_qualified(
    joined: DataFrame, sides: dict[str, DataFrame]
) -> DataFrame:
    """P2 qualified-star projection after a multi-join, with duplicate
    column names disambiguated by prefixing (hard part (a)).

    The reference's ``select('df_bt.*','df_lk_onboarding.*',...)``
    (``pre_analysis.py:702-705``) yields duplicate labels that only
    pandas tolerates; here each side's columns come out as
    ``<alias>__<col>``, so the result is a valid, unambiguous schema.
    ``sides`` maps alias → the aliased DataFrame used in the join.
    """
    cols = []
    for alias, df in sides.items():
        for c in df.columns:
            cols.append(F.col(f"{alias}.{c}").alias(f"{alias}__{c}"))
    return joined.select(*cols)
