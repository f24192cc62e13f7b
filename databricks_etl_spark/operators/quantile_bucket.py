"""Scale-safe equi-depth bucketing: approximate quantile boundaries
(tiny one-row aggregate) broadcast back onto the scaling side, bucket
assigned by a map-side range comparison — NO global-ordering window.

This is the 100 TB replacement for ``ntile(k) OVER (ORDER BY col)``:
a global ntile funnels the entire relation through one task's sort,
which is a hard wall once the windowed side reaches 10⁸–10⁹ rows.
Here the scaling side is touched twice, both times embarrassingly
parallel: once by the mergeable quantile sketch (map-combined
``percentile_approx``), once by the per-row bucket assignment against
the broadcast boundary array.

Determinism: ``percentile_approx`` may pick different (valid) boundary
elements under different partitionings, so exact bucket contents are
NOT cross-engine stable. Queries built on this operator therefore
register as *bracket gates* (the q145/q149 pattern): they assert the
rank-error theorem — every bucket's size is within a provable
tolerance of n/k — plus structural invariants that hold for ANY valid
boundary choice (bucket ranges ordered and disjoint, total row count
preserved, per-bucket value aggregates monotone across buckets). The
oracle states those invariants as constants, so a regression breaks
the value hash while partitioning noise cannot.

Rank-error bound (Greenwald–Khanna, as implemented by Spark's
ApproximatePercentile): the element returned for probability p has a
rank within ``n/accuracy`` of ``p·n``. The ≤-count of that element
additionally overshoots its rank by at most (dup(b) − 1) when the
boundary value is duplicated, so bucket i's size deviates from n/k by
at most ``2·(n/accuracy + 1) + dup(bᵢ₋₁) + dup(bᵢ)``; the audit
helper uses the uniform bound ``2·n/accuracy + 2·maxdup + 2``.

Reference parity: the reference has no quantile machinery at all —
this generalizes its fixed-threshold bucketing (``pre_analysis.py``
value-counts buckets) to data-driven boundaries.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_RANGE_BYTES_PER_PARTITION = 8 * 1024 * 1024


def _scaled_parts(df: DataFrame, cap: int) -> int:
    """Byte-proportional range-partition count: one partition per 8 MB
    of the plan-stats size estimate (driver-side metadata, no job),
    floor 4, capped at the caller's ``n_parts``. Estimation failure
    (or a plan with no stats) keeps the cap — never fewer partitions
    at scale, only fewer task launches on small inputs."""
    try:
        est = int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # stats unavailable: keep the configured split
        return cap
    if est <= 0 or est > (1 << 62):  # unknown sentinel (Long.Max-ish)
        return cap
    want = (est + _RANGE_BYTES_PER_PARTITION - 1) // _RANGE_BYTES_PER_PARTITION
    return max(4, min(cap, int(want)))


def exact_ntile(
    df: DataFrame,
    order_cols: list,
    k: int,
    *,
    n_parts: int = 64,
    out_col: str = "bucket",
) -> DataFrame:
    """``ntile(k) OVER (ORDER BY order_cols)`` with EXACT semantics but
    no global-ordering window — the two-phase distributed-rank
    discipline (q417's prefix-sum pattern applied to ranking):

    1. ``repartitionByRange`` on the full order key: Spark's range
       partitioner samples boundaries, so partitions are balanced even
       on skewed or tie-heavy leading columns (the composite key is
       unique, so the sampler never sees tie runs). Partition order ==
       global order by construction.
    2. per-partition counts land on the driver (≤ ``n_parts`` rows —
       the q247 literal-boundary collect class) and fold into literal
       exclusive offsets, so the rank pass is purely map-side: no
       window, no join, not even a broadcast.
    3. ``row_number`` WITHIN each range partition (parallel sorts of
       ~n/n_parts rows) + literal offset = exact global rank ``rn``.
    4. the closed form of SQL ntile's remainder rule — with
       ``q = n DIV k``, ``r = n MOD k`` the FIRST r buckets get q+1
       rows and the rest get q, so
       ``bucket = (rn−1) DIV (q+1) + 1`` while ``rn ≤ r·(q+1)`` and
       ``r + (rn − r·(q+1) − 1) DIV q + 1`` after — in integer
       arithmetic so no float boundary can misassign (property-tested
       against ``F.ntile`` on tie-heavy skewed fixtures).

    Output is bit-identical to ``F.ntile(k)`` whenever ``order_cols``
    is a total order (no duplicate composite keys, no NULLs) — which
    every caller guarantees with explicit tiebreakers — so a lane can
    swap this in WITHOUT changing its oracle or its value hash.

    The range-partitioned frame is localCheckpoint'd: the boundary
    sample must be frozen so the counts pass and the rank pass see the
    SAME partitioning (and the checkpoint is the projected few-column
    relation, not the source table). At 100 TB this is the one
    materialization an exact global rank costs; callers that can live
    with approximate buckets should use :func:`assign_approx_buckets`
    instead, which never materializes.
    """
    from pyspark.sql import Window

    # order_cols: names or Column sort expressions (e.g. F.desc(...))
    order_exprs = [
        F.col(c) if isinstance(c, str) else c for c in order_cols
    ]
    # r17 (guide §2.2): size the range split to the INPUT BYTES (plan-
    # stats estimate, driver-side metadata), capped at the caller's
    # n_parts — a 64-way range shuffle of a few-MB relation pays 64
    # task launches in each of the three passes (sample, counts, rank)
    # for nothing per task. The partition count provably cannot change
    # the output: ranks are globally reconstructed from the literal
    # per-partition offsets, so bucket = f(global rank) either way.
    n_parts = _scaled_parts(df, n_parts)
    part = (
        df.repartitionByRange(n_parts, *order_exprs)
        .withColumn("_enp", F.spark_partition_id())
        .localCheckpoint()
    )
    cnt = {
        r["_enp"]: r["_cn"]
        for r in part.groupBy("_enp").agg(F.count(F.lit(1)).alias("_cn")).collect()
    }
    n = sum(cnt.values())
    if n == 0:
        return part.drop("_enp").withColumn(
            out_col, F.lit(None).cast("int")
        )
    offs, acc = [], 0
    for pid in range(max(cnt) + 1):
        offs.append(acc)
        acc += cnt.get(pid, 0)
    q, r = divmod(n, int(k))
    wrn = Window.partitionBy("_enp").orderBy(*order_exprs)
    rn = F.row_number().over(wrn).cast("long") + F.element_at(
        F.array(*[F.lit(o).cast("long") for o in offs]), F.col("_enp") + 1
    )
    if q == 0:  # fewer rows than buckets: ntile(rn) = rn
        bucket_sql = "CAST(_rn AS INT)"
    else:
        head = r * (q + 1)
        bucket_sql = (
            f"CAST(CASE WHEN _rn <= {head}L"
            f" THEN (_rn - 1) DIV {q + 1}L + 1"
            f" ELSE {r} + (_rn - {head}L - 1) DIV {q}L + 1"
            f" END AS INT)"
        )
    return (
        part.withColumn("_rn", rn)
        .withColumn(out_col, F.expr(bucket_sql))
        .drop("_enp", "_rn")
    )


def assign_approx_buckets(
    df: DataFrame,
    col: str,
    n_buckets: int,
    *,
    accuracy: int = 1000,
    bucket_col: str = "bucket",
) -> DataFrame:
    """Add ``bucket_col`` ∈ 1..n_buckets to ``df`` by approx equi-depth
    boundaries on ``col``. Values equal to a boundary land in the lower
    bucket (assignment is ``1 + #{boundaries < value}``, strict).

    The boundary relation is ONE row (an array of k−1 doubles) and is
    broadcast; the big side sees only a map-side expression — the plan
    contains no Window and no global Sort (asserted in
    tests/test_plan_audit.py).
    """
    probs = F.array(*[F.lit(i / n_buckets) for i in range(1, n_buckets)])
    bounds = df.agg(
        F.percentile_approx(col, probs, F.lit(accuracy)).alias("_bounds")
    )
    assigned = df.join(F.broadcast(bounds)).withColumn(
        bucket_col,
        (
            F.lit(1)
            + F.aggregate(
                "_bounds",
                F.lit(0),
                lambda acc, b: acc + F.when(F.col(col) > b, 1).otherwise(0),
            )
        ).cast("int"),
    )
    return assigned.drop("_bounds")


def assign_literal_buckets(
    df: DataFrame, col: str, bounds: list, *, bucket_col: str = "bucket"
) -> DataFrame:
    """Bucket assignment against DRIVER-HELD literal boundaries (the
    output of one collected sketch pass): pure map-side expressions,
    no join — use when several consumers must share the exact same
    boundary list (q249, size_audit's pass 2).

    Boundaries are de-duplicated first: on tie-heavy dimensions a
    quantile sketch legitimately returns the same element for several
    probabilities, and naive per-boundary increments would then skip
    bucket ids entirely (value > b counts twice), leaving structurally
    empty buckets that make the observed bucket count sketch-dependent.
    """
    bucket = F.lit(1)
    for b in dict.fromkeys(bounds):
        bucket = bucket + F.when(F.col(col) > F.lit(b), 1).otherwise(0)
    return df.withColumn(bucket_col, bucket.cast("int"))


def bucket_size_tolerance(*, accuracy: int = 1000) -> Column:
    """Provable per-bucket size tolerance for the sketch that produced
    the audit frame: ``2·n/accuracy + 2·maxdup + 2`` where ``maxdup``
    is the highest multiplicity among boundary values.

    Returns a scalar Column against a 1-row frame carrying
    ``_n_total`` and ``_maxdup`` columns (see :func:`size_audit`) —
    the tolerance depends only on those columns and ``accuracy``.
    """
    return (
        2.0 * F.col("_n_total") / F.lit(accuracy)
        + 2.0 * F.col("_maxdup")
        + F.lit(2.0)
    )


def size_audit(
    df: DataFrame,
    col: str,
    n_buckets: int,
    *,
    accuracy: int = 1000,
    bounds: list | None = None,
) -> DataFrame:
    """One-row audit frame proving the equi-depth bracket for ``df[col]``:

    - ``n_buckets``   the REQUESTED bucket count k (a literal — on
      tie-heavy dimensions a valid sketch may return duplicated
      boundaries, so the observed distinct bucket count is sketch-
      dependent and must not appear in a hash-compared output; a
      broken assignment is instead caught by the id-consistency check
      folded into ``buckets_ordered`` below — on extreme-tie inputs
      the ``2·maxdup`` term can push the size tolerance past n, so
      ``sizes_within_tol`` alone would be vacuous there);
    - ``n_total``     rows in = rows out (assignment loses nothing);
    - ``sizes_within_tol``  every bucket size within the rank-error
      tolerance of n/k;
    - ``buckets_ordered``   bucket value-ranges are ordered and
      disjoint (max of bucket i ≤ min of bucket i+1) AND the observed
      bucket-id set is exactly the one the de-duplicated boundary list
      implies: every boundary is a data element, so with m distinct
      boundaries a correct assignment yields m non-empty lower buckets
      plus a top bucket iff the data max exceeds the largest boundary.
      Both facts are TRUE for ANY valid sketch output, so a FALSE
      means the assignment operator itself broke (e.g. every row
      dumped into one bucket), even when tie-driven tolerance
      inflation makes ``sizes_within_tol`` undiscriminating.

    All four are deterministic for ANY valid sketch output, so the
    DuckDB oracle states them as constants + the exact COUNT(*).

    Textbook two-pass plan — the minimum for data-driven boundaries:
    pass 1 runs the mergeable quantile sketch and lands k−1 doubles on
    the driver (Observation-sized, the S10-sanctioned collect class);
    pass 2 assigns buckets against LITERAL boundaries (pure map-side
    expressions, no join) and computes the per-bucket stats AND the
    per-boundary duplicate counts in ONE fused aggregate — so the
    relation is scanned exactly twice at any scale, and the tolerance
    provably refers to the same sketch that did the bucketing.

    ``bounds`` lets a caller that ALREADY collected the boundary list
    share it (one sketch feeding both its own stats and this audit —
    q249's shape) instead of paying a second sketch pass.
    """
    if bounds is None:
        probs = F.array(
            *[F.lit(i / n_buckets) for i in range(1, n_buckets)]
        )
        row = df.agg(
            F.percentile_approx(col, probs, F.lit(accuracy)).alias("_bounds")
        ).first()
        bounds = list(row["_bounds"] or [])
    spark = df.sparkSession
    if not bounds:
        # empty (or all-NULL) input: the bracket is VACUOUS — report the
        # REQUESTED bucket count with zero rows and TRUE checks, so the
        # engine agrees with a constant-stating oracle on degenerate
        # ingestion days instead of diverging on an observed 0
        return spark.createDataFrame(
            [(n_buckets, 0, True, True)],
            "n_buckets int, n_total long, sizes_within_tol boolean, "
            "buckets_ordered boolean",
        )
    assigned = assign_literal_buckets(df, col, bounds, bucket_col="_qb")
    per_bucket = assigned.groupBy("_qb").agg(
        F.count(F.lit(1)).alias("_n"),
        F.min(col).alias("_lo"),
        F.max(col).alias("_hi"),
        # duplicate multiplicity of each boundary value, fused into the
        # same aggregate (a boundary value b_i is a data element and
        # lands in its own bucket, so per-bucket counting loses nothing)
        *[
            F.sum(F.when(F.col(col) == F.lit(b), 1).otherwise(0)).alias(
                f"_dup{i}"
            )
            for i, b in enumerate(dict.fromkeys(bounds))
        ],
    )
    # per-bucket frame is ≤ k rows — the ordered-ranges check is a
    # window over k, not over the data
    from pyspark.sql import Window

    w = Window.orderBy("_qb")
    dup_cols = [c for c in per_bucket.columns if c.startswith("_dup")]
    chk = per_bucket.select(
        "_qb",
        "_n",
        (F.lag("_hi").over(w) <= F.col("_lo")).alias("_ord_ok"),
        F.greatest(*dup_cols, F.lit(0)).alias("_dmax"),
        F.col("_hi").alias("_gmax"),
    )
    distinct_bounds = list(dict.fromkeys(bounds))
    summary = chk.agg(
        F.lit(n_buckets).cast("int").alias("n_buckets"),
        F.sum("_n").cast("long").alias("n_total"),
        F.max("_n").cast("double").alias("_max_n"),
        F.min("_n").cast("double").alias("_min_n"),
        F.min(F.coalesce("_ord_ok", F.lit(True))).alias("_ordered"),
        F.max("_dmax").cast("double").alias("_maxdup"),
        # id-consistency inputs: observed non-empty bucket count and
        # the data max (max over per-bucket maxima)
        F.count(F.lit(1)).cast("int").alias("_obs"),
        F.max("_gmax").alias("_datamax"),
    )
    # every distinct boundary is a data element -> m non-empty lower
    # buckets; the (m+1)-th exists iff some value exceeds the largest
    # boundary. Holds for ANY valid sketch, so stating it is
    # sketch-independent.
    expected = F.lit(len(distinct_bounds)) + F.when(
        F.col("_datamax") > F.lit(max(distinct_bounds)), 1
    ).otherwise(0)
    audit = summary.withColumn("_n_total", F.col("n_total").cast("double"))
    tol = bucket_size_tolerance(accuracy=accuracy)
    target = F.col("_n_total") / F.lit(n_buckets)
    return audit.select(
        "n_buckets",
        "n_total",
        (
            (F.col("_max_n") - target <= tol) & (target - F.col("_min_n") <= tol)
        ).alias("sizes_within_tol"),
        (F.col("_ordered") & (F.col("_obs") == expected)).alias(
            "buckets_ordered"
        ),
    )


def exact_cumsum(
    df: DataFrame,
    order_cols: list,
    val_col: str,
    *,
    n_parts: int = 64,
    out_col: str = "cum",
    with_total: bool = False,
) -> DataFrame:
    """``SUM(val) OVER (ORDER BY order_cols ROWS UNBOUNDED PRECEDING)``
    with EXACT semantics but no global-ordering window — the
    :func:`exact_ntile` two-phase architecture with a sum in place of
    a count: range-partition on the (total-order) key, collect the
    per-partition value sums (≤ ``n_parts`` driver rows), fold them
    into literal exclusive prefix offsets, and add each row's
    intra-partition running sum (a partitioned window) to its
    partition's offset.  ``val_col`` must be integral (long) so the
    prefix arithmetic is exact — callers quantize (cents, counts,
    integer weights) first; the running total of 10⁹ rows of large
    cents still fits a long only if the caller guarantees it, so the
    fold runs in DECIMAL(38,0) and casts at the edge.

    The weighted-quantile extractor rides this directly: the q-th
    weighted quantile is the first row (in the total order) whose
    cumulative weight reaches ⌈q·W⌉.

    ``with_total=True`` returns ``(df, total)`` where ``total`` is the
    exact grand sum of ``val_col`` — already known from the collected
    per-partition sums, so callers needing W (quantile targets) avoid
    a second aggregation job over the data."""
    from pyspark.sql import Window

    order_exprs = [
        F.col(c) if isinstance(c, str) else c for c in order_cols
    ]
    # same byte-proportional range-split sizing as exact_ntile (r17);
    # output provably invariant — prefix offsets reconstruct the
    # global running sum at any partition count
    n_parts = _scaled_parts(df, n_parts)
    part = (
        df.repartitionByRange(n_parts, *order_exprs)
        .withColumn("_ecp", F.spark_partition_id())
        .localCheckpoint()
    )
    sums = {
        r["_ecp"]: r["_s"]
        for r in part.groupBy("_ecp")
        .agg(F.sum(F.col(val_col).cast("decimal(38,0)")).alias("_s"))
        .collect()
    }
    if not sums:
        empty = part.drop("_ecp").withColumn(
            out_col, F.lit(None).cast("decimal(38,0)")
        )
        return (empty, 0) if with_total else empty
    offs, acc = [], 0
    for pid in range(max(sums) + 1):
        offs.append(acc)
        acc += int(sums.get(pid) or 0)
    w = Window.partitionBy("_ecp").orderBy(*order_exprs).rowsBetween(
        Window.unboundedPreceding, 0
    )
    intra = F.sum(F.col(val_col).cast("decimal(38,0)")).over(w)
    # offsets array as ONE parsed expression — the per-literal Column
    # build was 2×n_parts py4j round trips per invocation (r16)
    offs_arr = F.expr(
        "array("
        + ", ".join(f"CAST('{o}' AS DECIMAL(38,0))" for o in offs)
        + ")"
    )
    out = (
        part.withColumn(
            out_col,
            intra + F.element_at(offs_arr, F.col("_ecp") + 1),
        )
        .drop("_ecp")
    )
    return (out, acc) if with_total else out
