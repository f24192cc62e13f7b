"""Ingest normalization (SURVEY.md §1.4): impose the typed schema
exactly once after a stringly CSV read, preserving the reference's
NULL-on-malformed cast semantics (``pre_analysis.py:244-258`` — bad
values are counted, not rejected).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def normalize(df: DataFrame, target: T.StructType) -> DataFrame:
    """Cast present columns to the target schema (by name). Unparseable
    values become NULL via ``try_cast`` — reference semantics under
    Spark 4's default ANSI mode (plain ``cast`` would throw)."""
    cols = []
    have = set(df.columns)
    for field in target.fields:
        if field.name not in have:
            continue
        src = F.col(f"`{field.name}`")
        cols.append(src.try_cast(field.dataType).alias(field.name))
    return df.select(*cols)
