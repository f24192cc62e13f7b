"""Round-5b queries: plan audits + invariants (parity lives in
test_oracle_parity.py). Includes the planted-subset containment test —
the case Jaccard provably misses — and brute-force cross-checks of the
rank-based quantile/MAD arithmetic."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators import dedup as DD
from databricks_etl_spark.plans.registry import queries
from databricks_etl_spark.sources.readers import read_table


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# ---------------------------------------------------------------- plan shapes


def test_q237_single_shuffle(spark, smoke_sf_dir):
    """Window and rollup share the user_id key — exactly one exchange."""
    plan = _executed_plan(queries()["q237_feature_leakage_audit"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q239_single_shuffle(spark, smoke_sf_dir):
    plan = _executed_plan(queries()["q239_group_quantile_bands"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q245_single_shuffle(spark, smoke_sf_dir):
    """Both windows and both rollups ride the user_id partitioning."""
    plan = _executed_plan(queries()["q245_interval_union_coverage"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_q240_no_cartesian(spark, smoke_sf_dir):
    plan = _executed_plan(queries()["q240_lsh_quality_audit"](spark, smoke_sf_dir))
    assert "CartesianProduct" not in plan
    # final stat assembly joins three 1-row aggregates — that's the
    # only nested-loop allowed
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan


def test_q244_no_cartesian(spark, smoke_sf_dir):
    plan = _executed_plan(
        queries()["q244_neardup_degree_distribution"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- invariants


def test_containment_catches_subset_jaccard_misses(spark):
    """Planted case: a 6-token doc quoted inside a 60-token doc —
    containment(short→long) ≈ 1 while Jaccard is far below any dedup
    threshold. The reason the ladder needs this rung."""
    short = "alpha beta gamma delta epsilon zeta"
    long_ = short + " " + " ".join(f"w{i} w{i+1} w{i+2}" for i in range(0, 60, 3))
    df = spark.createDataFrame([(1, short), (2, long_)], "doc_id LONG, text STRING")
    cont = DD.containment_pairs(df, 0.9, ngram=3).collect()
    assert len(cont) == 1 and cont[0].cont_ab == 1.0
    jac = DD.jaccard_pairs(df, 0.3, ngram=3).collect()
    assert jac == []  # symmetric Jaccard misses the same pair


def test_q240_quality_bounds(spark, sf_dir):
    r = queries()["q240_lsh_quality_audit"](spark, sf_dir).collect()[0]
    assert r.n_candidates > 0 and r.n_true > 0
    assert r.n_hits <= min(r.n_candidates, r.n_true)
    assert 0.0 <= r.precision <= 1.0 and 0.0 <= r.recall <= 1.0


def test_q239_quartiles_match_bruteforce(spark, sf_dir):
    rows = queries()["q239_group_quantile_bands"](spark, sf_dir).collect()
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents").select(
        "lang", F.size(tokens_col("text")).alias("n_toks")
    )
    data = {}
    for r in d.collect():
        data.setdefault(r.lang, []).append(r.n_toks)
    for r in rows:
        xs = sorted(data[r.lang])
        n = len(xs)
        assert r.n_docs == n
        assert r.p25_toks == xs[(n + 3) // 4 - 1]
        assert r.p50_toks == xs[(n + 1) // 2 - 1]
        assert r.p75_toks == xs[(3 * n + 3) // 4 - 1]


def test_q241_mad_matches_bruteforce(spark, sf_dir):
    rows = queries()["q241_mad_outliers"](spark, sf_dir).collect()
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents").select(
        "lang", F.size(tokens_col("text")).alias("n_toks")
    )
    data = {}
    for r in d.collect():
        data.setdefault(r.lang, []).append(r.n_toks)
    for r in rows:
        xs = sorted(data[r.lang])
        n = len(xs)
        med = xs[(n + 1) // 2 - 1]
        devs = sorted(abs(x - med) for x in xs)
        mad = devs[(n + 1) // 2 - 1]
        assert r.median_toks == med and r.mad_toks == mad
        assert r.n_outliers == sum(1 for x in xs if abs(x - med) > 3 * mad)


def test_q242_dims_broadcastable_at_test_sf(spark, sf_dir):
    rows = {r.tbl: r for r in queries()["q242_broadcast_decision_audit"](spark, sf_dir).collect()}
    assert rows["nation"].would_broadcast and rows["region"].would_broadcast
    assert rows["lineitem"].n_rows > rows["orders"].n_rows
    for r in rows.values():
        assert r.est_bytes > r.n_rows * 8  # strings counted on top


def test_q243_clean_schema_has_no_orphans(spark, sf_dir):
    rows = queries()["q243_fk_orphan_matrix"](spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r.n_orphans == 0 and r.orphan_rate == 0.0 for r in rows)
    assert all(r.n_child > 0 for r in rows)


def test_q243_detects_planted_orphans(spark, sf_dir):
    """The machinery must actually fire: drop half the parent keys and
    orphans appear (guards against a vacuous always-zero join)."""
    li = read_table(spark, sf_dir, "lineitem")
    part = read_table(spark, sf_dir, "part").filter(F.col("p_partkey") % 2 == 0)
    parent = part.select(F.col("p_partkey").alias("__pk")).distinct()
    flagged = li.join(
        parent.withColumn("__hit", F.lit(1)), li.l_partkey == F.col("__pk"), "left"
    )
    orphan = li.l_partkey.isNotNull() & F.col("__hit").isNull()
    n = flagged.agg(F.count_if(orphan)).collect()[0][0]
    assert n > 0


def test_q245_coverage_bounds(spark, sf_dir):
    rows = queries()["q245_interval_union_coverage"](spark, sf_dir).collect()
    e = read_table(spark, sf_dir, "events")
    per_user = {
        r.user_id: r.n
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(rows) == len(per_user)
    for r in rows:
        n = per_user[r.user_id]
        assert 1 <= r.n_islands <= n
        # each island covers >= one full interval; union <= sum of intervals
        assert 600 * r.n_islands <= r.covered_seconds <= 600 * n


def test_q237_label_consistency(spark, sf_dir):
    rows = queries()["q237_feature_leakage_audit"](spark, sf_dir).collect()
    e = read_table(spark, sf_dir, "events")
    purchasers = {
        r.user_id
        for r in e.filter(F.col("event_type") == "purchase")
        .select("user_id")
        .distinct()
        .collect()
    }
    for r in rows:
        assert r.n_pre_label + r.n_post_label <= r.n_total
        if r.user_id in purchasers:
            assert r.label_epoch is not None and r.n_post_label >= 1
            assert r.n_pre_label + r.n_post_label == r.n_total
        else:
            assert r.label_epoch is None and r.n_post_label == 0
            assert r.n_pre_label == 0  # NULL label -> no pre count either
