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
