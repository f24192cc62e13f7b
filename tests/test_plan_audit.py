"""Physical-plan audits for the round-3 queries: the plan SHAPE is the
scale contract (broadcast where a side is small, one shuffle where one
suffices, one scan where one suffices) — asserted, not assumed."""

from __future__ import annotations

from databricks_etl_spark.plans.registry import queries


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    # AdaptiveSparkPlan's toString appends the pre-AQE tree under an
    # "== Initial Plan ==" banner — keep only the final plan so node
    # counts aren't doubled
    return plan.split("== Initial Plan ==")[0]


def test_q152_broadcasts_eval_gram_set(spark, smoke_sf_dir):
    """The contamination audit must broadcast the (tiny) eval gram set —
    a shuffle join keyed on gram strings would move the whole corpus's
    grams for no reason."""
    plan = _executed_plan(queries()["q152_contamination_audit"](spark, smoke_sf_dir))
    assert "BroadcastHashJoin" in plan


def test_q153_funnel_is_single_scan(spark, smoke_sf_dir):
    """All five funnel stages fold into conditional sums over ONE scan
    of documents — five scans (one per stage) would read the corpus
    five times at 100 TB."""
    plan = _executed_plan(queries()["q153_quality_funnel"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan


def test_q163_simhash_single_shuffle(spark, smoke_sf_dir):
    """The 64 bit-vote sums must reach the reducer as ONE partial-agg
    exchange on doc_id — the explode(0..63) formulation would shuffle
    64x the rows."""
    plan = _executed_plan(queries()["q163_simhash_md5_oracled"](spark, smoke_sf_dir))
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "partial" in plan.lower()  # map-side combine present


def test_q158_gapfill_no_nested_loop(spark, smoke_sf_dir):
    """Grid densification must stay an equi-join against the per-user
    sequence — a calendar cross join (BroadcastNestedLoop/Cartesian)
    would be users x global-span rows."""
    plan = _executed_plan(queries()["q158_gapfill_forward_fill"](spark, smoke_sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q173_band_candidates_equi_join(spark, smoke_sf_dir):
    """LSH candidate generation must be an EQUI-join on the band-bucket
    key (hash or sort-merge — bucketed either way): a nested-loop or
    cartesian plan here is exactly the all-pairs explosion the banding
    exists to prevent."""
    plan = _executed_plan(
        queries()["q173_band_collision_candidates"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_q183_novelty_equi_join_and_partial_agg(spark, smoke_sf_dir):
    """The first-seen inverted index joins back on the shingle key
    (equi-join) and both aggregates must have map-side partials — at
    100 TB the shingle relation dwarfs the corpus."""
    plan = _executed_plan(queries()["q183_ngram_novelty"](spark, smoke_sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "partial" in plan.lower(), plan


def test_q175_shard_assignment_is_scan_local(spark, smoke_sf_dir):
    """Shard assignment must evaluate inside the scan stage: one scan,
    one aggregate exchange (16 groups), nothing else — the whole point
    of hash sharding is zero data movement before the rollup."""
    plan = _executed_plan(queries()["q175_shard_balance"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
