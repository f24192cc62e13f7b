"""Sampling + frequency-sketch queries: the reproducible-subset and
heavy-hitter surface (SURVEY.md §2.12 extension — a training-data
pipeline needs deterministic corpus subsets and cheap skew probes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import decimal_sum
from databricks_etl_spark.operators.sampling import (
    freq_items,
    hash_stratified_sample,
)
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_RATES = {"F": 10, "P": 50, "O": 25}


@query(
    "q125_stratified_hash_sample",
    oracle="""
        WITH s AS (
            SELECT o_orderkey, o_orderstatus, o_totalprice,
                   ((o_orderkey % 1000000007) * 48271) % 1000000007 % 100
                       AS bucket
            FROM orders
        )
        SELECT o_orderkey, o_orderstatus
        FROM s
        WHERE bucket < CASE o_orderstatus
                           WHEN 'F' THEN 10 WHEN 'P' THEN 50
                           WHEN 'O' THEN 25 ELSE 0 END
    """,
)
def q125_stratified_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified sample: 10% of finished, 50% of
    pending, 25% of open orders, selected by a portable MINSTD hash
    of the order key — the SAME rows on any engine / partitioning /
    run (hash-verified against the oracle computing the identical
    arithmetic), unlike seeded ``sampleBy`` whose row set depends on
    partition layout. Zero-shuffle: the bucket filter evaluates
    per-row inside the scan stage. This is how a 100 TB pipeline
    pins a reproducible training subset."""
    o = read_table(spark, sf_dir, "orders")
    return hash_stratified_sample(
        o, "o_orderkey", "o_orderstatus", _RATES
    ).select("o_orderkey", "o_orderstatus")


@query(
    "q126_sample_stratum_stats",
    oracle="""
        WITH s AS (
            SELECT o_orderstatus, o_totalprice
            FROM orders
            WHERE ((o_orderkey % 1000000007) * 48271) % 1000000007 % 100
                  < CASE o_orderstatus
                        WHEN 'F' THEN 10 WHEN 'P' THEN 50
                        WHEN 'O' THEN 25 ELSE 0 END
        )
        SELECT o_orderstatus, COUNT(*) AS n_sampled,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE)
                   AS sampled_totalprice
        FROM s GROUP BY 1
    """,
)
def q126_sample_stratum_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregates over the deterministic sample (count + exact decimal
    sum per stratum) — the downstream-consumer proof: statistics over
    the sampled subset are themselves reproducible cross-engine."""
    o = read_table(spark, sf_dir, "orders")
    return (
        hash_stratified_sample(o, "o_orderkey", "o_orderstatus", _RATES)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            decimal_sum(F.col("o_totalprice"), "sampled_totalprice"),
        )
    )


@query(
    "q127_freq_items_sketch",
    oracle="""
        WITH n AS (SELECT COUNT(*) AS total FROM orders),
        hh_s AS (
            SELECT COUNT(*) AS n_hh FROM (
                SELECT o_orderstatus FROM orders, n
                GROUP BY o_orderstatus, n.total
                HAVING COUNT(*) > 0.05 * n.total
            )
        ),
        hh_p AS (
            SELECT COUNT(*) AS n_hh FROM (
                SELECT o_orderpriority FROM orders, n
                GROUP BY o_orderpriority, n.total
                HAVING COUNT(*) > 0.05 * n.total
            )
        )
        SELECT CAST(hh_s.n_hh AS BIGINT) AS n_true_hh_status,
               CAST(hh_p.n_hh AS BIGINT) AS n_true_hh_priority,
               TRUE AS status_hh_all_contained,
               TRUE AS priority_hh_all_contained
        FROM hh_s, hh_p
    """,
)
def q127_freq_items_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass heavy-hitter candidates (Karp et al. via
    ``df.stat.freqItems``) over order status and priority at 5%
    support — the no-shuffle skew probe you run BEFORE choosing a
    join strategy at 100 TB (a key appearing in >support of rows is a
    salting candidate). The sketch's candidate LIST admits false
    positives (engine/partition dependent), but its superset GUARANTEE
    (no false negatives) is deterministic — so the query emits the
    exact true-heavy-hitter counts plus containment booleans (the
    q146/q149 bracket pattern) and the oracle states the theorem; a
    sketch regression (a dropped true heavy hitter) flips a boolean
    and breaks the hash. Count-level coverage also in
    tests/test_sampling.py."""
    o = read_table(spark, sf_dir, "orders")
    cand = freq_items(o, ["o_orderstatus", "o_orderpriority"], 0.05)
    tot = o.agg(F.count(F.lit(1)).alias("total"))

    def true_hh(col: str):
        return (
            o.groupBy(col)
            .agg(F.count(F.lit(1)).alias("c"))
            .crossJoin(F.broadcast(tot))
            .filter(F.col("c") > 0.05 * F.col("total"))
        )

    hh_s = true_hh("o_orderstatus")
    hh_p = true_hh("o_orderpriority")
    gate_s = (
        hh_s.crossJoin(F.broadcast(cand))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true_hh_status"),
            F.min(
                F.array_contains("o_orderstatus_freqItems", F.col("o_orderstatus"))
            ).alias("status_hh_all_contained"),
        )
    )
    gate_p = (
        hh_p.crossJoin(F.broadcast(cand))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_true_hh_priority"),
            F.min(
                F.array_contains("o_orderpriority_freqItems", F.col("o_orderpriority"))
            ).alias("priority_hh_all_contained"),
        )
    )
    return gate_s.crossJoin(F.broadcast(gate_p)).select(
        "n_true_hh_status",
        "n_true_hh_priority",
        "status_hh_all_contained",
        "priority_hh_all_contained",
    )


@query(
    "q129_topk_per_stratum_sample",
    oracle="""
        WITH h AS (
            SELECT o_orderkey, o_orderstatus,
                   ((o_orderkey % 1000000007) * 48271) % 1000000007 AS hk
            FROM orders
        ),
        r AS (
            SELECT o_orderkey, o_orderstatus,
                   row_number() OVER (
                       PARTITION BY o_orderstatus ORDER BY hk, o_orderkey
                   ) AS rk
            FROM h
        )
        SELECT o_orderkey, o_orderstatus, CAST(rk AS BIGINT) AS rk
        FROM r WHERE rk <= 50
    """,
)
def q129_topk_per_stratum_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size-per-stratum sample (exactly k=50 rows per order
    status) chosen by ranking the portable hash — the deterministic
    stand-in for per-group reservoir sampling: same k rows on any
    engine/run, and uniform-ish because the hash decorrelates rank
    from key order. One shuffle on the stratum; at 100 TB replace the
    full window sort with a per-partition top-k + merge (the
    TakeOrderedAndProject pattern) if strata are huge."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    hk = ((F.col("o_orderkey") % 1000000007) * 48271) % 1000000007
    w = Window.partitionBy("o_orderstatus").orderBy(hk, F.col("o_orderkey"))
    return (
        o.withColumn("rk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rk") <= 50)
        .select("o_orderkey", "o_orderstatus", "rk")
    )
