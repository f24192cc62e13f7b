"""Skew-aware join (SURVEY.md §4.3): explicit key-salting for the case
AQE's runtime skew-split can't fix — a shuffle join where one key's
rows exceed a single task's memory on BOTH sides.

Technique (standard salting): replicate the small(er) side R times,
scatter the big side's hot keys across R salt buckets, join on
(key, salt). R=1 degrades to a plain join. Prefer plain joins + AQE
(``spark.sql.adaptive.skewJoin.enabled``) unless a profile shows a
pathological key; salting multiplies the replicated side's volume by R.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    *,
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on column ``on`` with ``salt``-way key
    scattering. Result equals ``big.join(small, on, how)`` (asserted in
    tests/test_skew.py); only the physical distribution differs: the
    hot key's rows land in ``salt`` different shuffle partitions.

    Supported ``how``: inner / left (the delete/enrich patterns the
    reference uses).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    big_s = big.withColumn(
        "__salt", (F.rand(seed=42) * salt).cast("int")
    )
    salts = F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("__salt")
    small_s = small.select("*", salts)
    out = big_s.join(small_s, on=[on, "__salt"], how=how)
    return out.drop("__salt")
