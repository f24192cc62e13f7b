"""2-D skyline (Pareto frontier) without a global-ordering window.

The skyline of a point set under (maximize d1, maximize d2) dominance
is every row no other row beats-or-ties on both dimensions while
strictly beating it on one.  The textbook single-node sweep sorts
globally and keeps a running max — a global ``Window.orderBy``, the
exact construction this repo's plan tripwires forbid at data scale.
This kernel gets the same answer with the exact_ntile two-phase
architecture (range partition → per-partition window → literal
cross-partition offsets):

1. pre-aggregate per distinct ``d1``: ``m2(d1) = max(d2)`` — one
   shuffle; only the max-d2 row of a d1 group can be on the skyline
   (same d1, greater d2 strictly dominates).
2. range-partition the (d1, m2) group relation by d1; per partition a
   DESC-ordered window computes the strict suffix max (max m2 over
   rows with greater d1 *in this partition*, current row excluded —
   keys are distinct after step 1, so row exclusion IS strictness).
3. per-partition maxes land on the driver (≤ n_parts values — the
   exact_ntile literal-offset class) and fold into a literal suffix
   max of all LATER partitions.
4. ``M_strict(d1) = max(intra, later)``; a d1 group is dominated iff
   ``M_strict ≥ m2``.  Survivor rows are the group's max-d2 rows of
   undominated groups (ties on both dims all survive — none strictly
   dominates another).

Deterministic for integer/decimal dimensions (callers quantize doubles
first — cents, counts).  O(n) + one bounded-fan window; no global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_NEG_INF = -(1 << 62)


def skyline_2d(
    df: DataFrame,
    d1: str,
    d2: str,
    *,
    n_parts: int = 64,
) -> DataFrame:
    """Rows of ``df`` on the (max ``d1``, max ``d2``) skyline.

    Both dimension columns must be integral (exact comparisons).
    Returns the input rows (all columns) that are not strictly
    dominated; ties on both dimensions all survive."""
    groups = (
        df.groupBy(d1)
        .agg(F.max(d2).alias("_m2"))
        .repartitionByRange(n_parts, F.col(d1))
        .withColumn("_sp", F.spark_partition_id())
        .localCheckpoint()
    )
    per_part = {
        r["_sp"]: r["_mx"]
        for r in groups.groupBy("_sp")
        .agg(F.max("_m2").alias("_mx"))
        .collect()
    }
    if not per_part:
        return df.filter(F.lit(False))
    # literal suffix max of strictly-later partitions (greater d1)
    max_pid = max(per_part)
    later, acc = [], _NEG_INF
    for pid in range(max_pid, -1, -1):
        later.append(acc)
        acc = max(acc, per_part.get(pid, _NEG_INF))
    later.reverse()  # later[pid] = max over partitions > pid
    w = Window.partitionBy("_sp").orderBy(F.desc(d1)).rowsBetween(
        Window.unboundedPreceding, -1
    )
    flagged = groups.select(
        d1,
        "_m2",
        F.greatest(
            F.coalesce(
                F.max("_m2").over(w), F.lit(_NEG_INF).cast("long")
            ),
            F.element_at(
                F.array(*[F.lit(v).cast("long") for v in later]),
                F.col("_sp") + 1,
            ),
        ).alias("_suffix"),
    )
    keep = flagged.filter(F.col("_suffix") < F.col("_m2")).select(
        d1, F.col("_m2").alias("_keep2")
    )
    # unhinted join back: the skyline is usually tiny (AQE will
    # broadcast it) but worst-case anti-correlated dims make it O(n) —
    # a forced broadcast here would be the q504 mistake
    return (
        df.join(keep, d1)
        .filter(F.col(d2) == F.col("_keep2"))
        .drop("_keep2")
    )
