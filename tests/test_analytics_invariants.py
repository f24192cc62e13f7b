"""Structural invariants for the analytics/time-series queries (q85–
q92) — properties that must hold for ANY input, complementing the
exact-value oracle parity:

- funnel stage counts are monotone non-increasing;
- retention triangle: week-0 actives == cohort size, offsets >= 0;
- ntile quartile sizes within a partition differ by at most 1;
- GROUPING SETS totals are consistent across grouping levels;
- RANGE-frame rolling average equals the plain revenue on frame-of-1
  days and never leaves [min, max] of the framed values;
- streaming dedup-within-watermark matches batch key-distinct.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import queries
from databricks_etl_spark.sources.readers import read_table


def test_funnel_monotone(spark, sf_dir):
    row = queries()["q90_funnel_conversion"](spark, sf_dir).collect()[0]
    assert row.n_view >= row.n_view_click >= row.n_view_click_purchase >= 0
    assert 0.0 <= row.conversion <= 1.0


def test_retention_week0_equals_cohort_size(spark, sf_dir):
    ret = queries()["q91_retention_cohorts"](spark, sf_dir)
    assert ret.filter(F.col("week_offset") < 0).count() == 0
    # every user is active in their own first-seen week, so week-0
    # actives must equal the cohort's total user count
    e = read_table(spark, sf_dir, "events")
    cohort_sizes = (
        e.groupBy("user_id")
        .agg(F.unix_timestamp(F.date_trunc("week", F.min("ts"))).alias("cohort_epoch"))
        .groupBy("cohort_epoch")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )
    w0 = ret.filter(F.col("week_offset") == 0).select("cohort_epoch", "n_active")
    diff = (
        w0.join(cohort_sizes, "cohort_epoch")
        .filter(F.col("n_active") != F.col("n_users"))
        .count()
    )
    assert diff == 0


def test_ntile_quartiles_balanced(spark, sf_dir):
    q = queries()["q88_distribution_windows"](spark, sf_dir)
    sizes = q.groupBy("c_mktsegment", "balance_quartile").count()
    spread = sizes.groupBy("c_mktsegment").agg(
        (F.max("count") - F.min("count")).alias("spread"),
        F.countDistinct("balance_quartile").alias("n_tiles"),
    )
    bad = spread.filter((F.col("spread") > 1) | (F.col("n_tiles") != 4)).count()
    assert bad == 0


def test_grouping_sets_levels_consistent(spark, sf_dir):
    g = queries()["q89_grouping_sets"](spark, sf_dir).collect()
    grand = [r for r in g if r.gid == 3]
    per_flag = [r for r in g if r.gid == 1]
    finest = [r for r in g if r.gid == 0]
    assert len(grand) == 1
    assert sum(r.n_items for r in per_flag) == grand[0].n_items
    assert sum(r.n_items for r in finest) == grand[0].n_items
    assert abs(sum(r.sum_qty for r in per_flag) - grand[0].sum_qty) < 1e-6


def test_rolling_avg_bounded_by_frame(spark, sf_dir):
    roll = queries()["q85_rolling_avg_range_frame"](spark, sf_dir)
    assert roll.filter(
        (F.col("days_in_frame") < 1) | (F.col("days_in_frame") > 7)
    ).count() == 0
    # a frame of exactly one day means avg == that day's revenue
    lone = roll.filter(F.col("days_in_frame") == 1)
    assert lone.filter(
        F.abs(F.col("avg_7d") - F.col("revenue")) > 1e-4
    ).count() == 0


@pytest.mark.slow
def test_streaming_dedup_within_watermark(spark, smoke_sf_dir):
    from databricks_etl_spark.streaming.windows import run_streaming_dedup

    keys = ("user_id", "event_type")
    survivors = run_streaming_dedup(spark, smoke_sf_dir, keys)
    batch_keys = read_table(spark, smoke_sf_dir, "events").select(*keys).distinct()
    assert survivors.count() == batch_keys.count()
    assert survivors.select(*keys).distinct().count() == survivors.count()


def test_merge_upsert_statuses_partition_base_and_changes(spark, sf_dir):
    """Upsert output = base ∪ inserts; statuses partition it exactly:
    updated + unchanged == |base|, inserted == |insert batch|."""
    m = queries()["q98_merge_upsert"](spark, sf_dir)
    by_status = {r["row_status"]: r["n"] for r in
                 m.groupBy("row_status").agg(F.count(F.lit(1)).alias("n")).collect()}
    base = read_table(spark, sf_dir, "customer")
    n_base = base.count()
    n_upd = base.filter(F.col("c_custkey") % 10 == 0).count()
    n_ins = base.filter(F.col("c_custkey") % 100 == 0).count()
    assert by_status.get("updated", 0) == n_upd
    assert by_status.get("inserted", 0) == n_ins
    assert by_status.get("unchanged", 0) == n_base - n_upd
    assert m.count() == n_base + n_ins
    assert m.select("c_custkey").distinct().count() == m.count()  # key stays unique


def test_histogram_partitions_all_rows(spark, sf_dir):
    """Bucket counts must sum to the table's row count — no row lost or
    double-binned by the floor(bucket) edges."""
    h = queries()["q99_value_histogram"](spark, sf_dir)
    total = h.agg(F.sum("n")).collect()[0][0]
    assert total == read_table(spark, sf_dir, "lineitem").count()
    assert h.filter(F.col("bucket_lo") != F.col("bucket") * 5000.0).count() == 0
