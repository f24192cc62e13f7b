"""Sampling/frequency-sketch contracts: determinism of the hash
sample, statistical sanity of its rates, the freqItems superset
guarantee, and the seeded-sampleBy distributional tolerance."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators.sampling import (
    freq_items,
    hash_stratified_sample,
)
from databricks_etl_spark.sources.readers import read_table


def test_hash_sample_is_deterministic_across_partitionings(spark, smoke_sf_dir):
    o = read_table(spark, smoke_sf_dir, "orders")
    rates = {"F": 10, "P": 50, "O": 25}
    a = {
        r["o_orderkey"]
        for r in hash_stratified_sample(o, "o_orderkey", "o_orderstatus", rates)
        .select("o_orderkey")
        .collect()
    }
    b = {
        r["o_orderkey"]
        for r in hash_stratified_sample(
            o.repartition(7), "o_orderkey", "o_orderstatus", rates
        )
        .select("o_orderkey")
        .collect()
    }
    assert a == b and a


def test_hash_sample_rates_approximate_targets(spark, smoke_sf_dir):
    o = read_table(spark, smoke_sf_dir, "orders")
    rates = {"F": 10, "P": 50, "O": 25}
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    sampled = {
        r["o_orderstatus"]: r["n"]
        for r in hash_stratified_sample(o, "o_orderkey", "o_orderstatus", rates)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    for status, pct in rates.items():
        if totals.get(status, 0) >= 100:
            got = sampled.get(status, 0) / totals[status]
            assert abs(got - pct / 100) < 0.08, (status, got, pct)


def test_freq_items_no_false_negatives(spark, smoke_sf_dir):
    o = read_table(spark, smoke_sf_dir, "orders")
    n = o.count()
    support = 0.05
    row = freq_items(o, ["o_orderpriority"], support).collect()[0]
    candidates = set(row["o_orderpriority_freqItems"])
    exact = {
        r["o_orderpriority"]
        for r in o.groupBy("o_orderpriority")
        .agg(F.count("*").alias("c"))
        .filter(F.col("c") > support * n)
        .collect()
    }
    assert exact <= candidates, f"missing heavy hitters: {exact - candidates}"


def test_sampleby_seeded_rates(spark, smoke_sf_dir):
    """Built-in seeded Bernoulli stratified sampling: per-stratum
    fractions near targets (row identity is partition-layout-
    dependent, so only the distribution is asserted)."""
    o = read_table(spark, smoke_sf_dir, "orders")
    fractions = {"F": 0.2, "P": 0.5, "O": 0.3}
    s = o.sampleBy("o_orderstatus", fractions, seed=42)
    totals = {
        r["o_orderstatus"]: r["n"]
        for r in o.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    sampled = {
        r["o_orderstatus"]: r["n"]
        for r in s.groupBy("o_orderstatus").agg(F.count("*").alias("n")).collect()
    }
    for status, frac in fractions.items():
        if totals.get(status, 0) >= 100:
            got = sampled.get(status, 0) / totals[status]
            assert abs(got - frac) < 0.1, (status, got, frac)


def test_percentile_approx_within_tolerance(spark, sf_dir):
    """Mergeable approximate percentiles (the 100 TB path — one pass,
    no global sort) land within the accuracy implied by the given
    relative-error parameter, judged against exact percentiles."""
    from pyspark.sql import functions as F

    from databricks_etl_spark.sources.readers import read_table

    o = read_table(spark, sf_dir, "orders")
    qs = [0.25, 0.5, 0.75, 0.95]
    approx = o.select(
        F.percentile_approx("o_totalprice", qs, 10000).alias("p")
    ).first()["p"]
    exact = o.select(F.expr(
        f"percentile(o_totalprice, array({','.join(map(str, qs))}))"
    ).alias("p")).first()["p"]
    lo, hi = (
        o.agg(F.min("o_totalprice"), F.max("o_totalprice")).first()
    )
    spread = hi - lo
    for a, e in zip(approx, exact):
        assert abs(a - e) <= 0.01 * spread, (a, e)


def test_hll_estimates_close_and_merge_consistent(spark, sf_dir):
    """DataSketches HLL: per-group estimates within 5% of exact, and
    the union of per-group sketches estimates the GLOBAL distinct the
    same as a single full-scan sketch — mergeability, the property
    that lets 100 TB partials roll up without rescans."""
    from pyspark.sql import functions as F

    from databricks_etl_spark.sources.readers import read_table

    c = read_table(spark, sf_dir, "customer")
    rows = (
        c.groupBy("c_nationkey")
        .agg(
            F.hll_sketch_agg("c_custkey").alias("sk"),
            F.countDistinct("c_custkey").alias("exact"),
        )
        .select(F.hll_sketch_estimate("sk").alias("est"), "exact", "sk")
    )
    collected = rows.select("est", "exact").collect()
    assert collected
    for r in collected:
        assert abs(r["est"] - r["exact"]) <= max(2, 0.05 * r["exact"]), r
    merged = rows.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("u")
    ).first()["u"]
    direct = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("d")
    ).first()["d"]
    exact_global = c.select("c_custkey").distinct().count()
    # Union-of-partials and single-scan sketches take different internal
    # promotion paths (sparse->dense), so estimates differ slightly; both
    # must land within HLL error bounds of the exact global count.
    assert abs(merged - exact_global) <= 0.05 * exact_global, (merged, exact_global)
    assert abs(direct - exact_global) <= 0.05 * exact_global, (direct, exact_global)
