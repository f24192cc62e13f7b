"""Physical-plan assertions (SURVEY.md §4.2): guard the properties
that make queries scale — filter pushdown into the parquet scan,
column-pruned ReadSchema, broadcast joins for tiny dims, top-k as
TakeOrderedAndProject, whole-stage codegen presence. These fail if a
refactor silently de-optimizes a plan, even though results stay right.
"""

from __future__ import annotations

from databricks_etl_spark.plans.registry import queries


def _plan(spark, sf_dir, name: str, mode: str = "formatted") -> str:
    df = queries()[name](spark, sf_dir)
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), mode
    )


def test_flagship_pushdown_and_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_revenue_by_nation")
    assert "PushedFilters: [IsNotNull(l_shipdate), GreaterThanOrEqual(l_shipdate" in plan
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" in plan


def test_projection_prunes_scan(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q02_projection_prune")
    assert "ReadSchema: struct<c_custkey:bigint,c_name:string,c_mktsegment:string>" in plan
    assert "c_acctbal" not in plan  # unused column never read


def test_topk_uses_take_ordered(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q23_topk_orders")
    assert "TakeOrderedAndProject" in plan


def test_q1_whole_stage_codegen(spark, sf_dir):
    # Under AQE the pre-execution plan is a single AdaptiveSparkPlan
    # node and codegen mode reports 0 subtrees; disable AQE for the
    # inspection only — the production session keeps it on.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = _plan(spark, sf_dir, "q16_tpch_q1_pricing_summary", "codegen")
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert "WholeStageCodegen" in plan
    assert "Found 0 WholeStageCodegen" not in plan


def test_agg_is_partial_plus_final(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q16_tpch_q1_pricing_summary")
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_sum" in plan


def test_q94_joins_all_broadcast(spark, sf_dir):
    """Q7 shape: every dim join is broadcast-hash — the only shuffles
    left are the final aggregate's (the fact never shuffles for a
    join at this scale; at 100 TB AQE swaps orders⋈lineitem to SMJ)."""
    plan = _plan(spark, sf_dir, "q94_volume_shipping")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") >= 4


def test_q95_filter_pushed_and_topk(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q95_returned_items")
    assert "EqualTo(l_returnflag,R)" in plan  # into the parquet scan
    assert "TakeOrderedAndProject" in plan


def test_q102_full_predicate_pushdown(spark, sf_dir):
    """Q6 shape: every predicate reaches the parquet scan."""
    plan = _plan(spark, sf_dir, "q102_filtered_revenue")
    assert "PushedFilters:" in plan
    for frag in ["GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
                 "GreaterThanOrEqual(l_discount", "LessThan(l_quantity"]:
        assert frag in plan, f"missing pushed filter {frag}"


def test_q103_exists_is_semi_join(spark, sf_dir):
    """EXISTS must compile to a semi join (probe side never expands)."""
    plan = _plan(spark, sf_dir, "q103_order_priority_exists")
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q113_disjunctive_stays_hash_join(spark, sf_dir):
    """Q19 shape: OR'd predicate groups must not degrade the part join
    to a nested loop — the equi-key stays p_partkey."""
    plan = _plan(spark, sf_dir, "q113_disjunctive_revenue")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q114_not_exists_is_anti_join(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q114_idle_rich_customers")
    assert "LeftAnti" in plan


def test_join_strategy_hints_respected(spark, smoke_sf_dir):
    """Catalyst honors per-join strategy hints — the manual override
    lane when AQE's choice is wrong for a known workload: broadcast()
    forces BroadcastHashJoin, merge() forces SortMergeJoin, and
    shuffle_hash() forces ShuffledHashJoin, on the SAME join."""
    from pyspark.sql import functions as F

    from databricks_etl_spark.sources.readers import read_table

    o = read_table(spark, smoke_sf_dir, "orders")
    c = read_table(spark, smoke_sf_dir, "customer")

    def plan_of(hinted):
        df = o.join(hinted, o.o_custkey == hinted.c_custkey).groupBy().count()
        return df._jdf.queryExecution().executedPlan().toString()

    assert "BroadcastHashJoin" in plan_of(F.broadcast(c))
    assert "SortMergeJoin" in plan_of(c.hint("merge"))
    assert "ShuffledHashJoin" in plan_of(c.hint("shuffle_hash"))


def test_q136_no_explode_regroup(spark, sf_dir):
    """The nested-struct pipeline must stay at one aggregate (the
    collect_list) — higher-order lambdas must NOT re-explode or add a
    second shuffle."""
    plan = _plan(spark, sf_dir, "q136_nested_line_structs")
    assert "Generate" not in plan  # no explode
    # formatted plans repeat each node in the detail section; count the
    # tree markers only — exactly the one groupBy shuffle
    assert plan.count("+- Exchange") == 1
