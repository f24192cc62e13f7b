"""Round-5 queries: plan-shape audits (the scale contract) and
semantic invariants beyond the DuckDB value parity in
test_oracle_parity.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import queries
from databricks_etl_spark.sources.readers import read_table


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.split("== Initial Plan ==")[0]


# ---------------------------------------------------------------- plan shapes


def test_q225_single_scan_two_exchanges(spark, smoke_sf_dir):
    """Both dedup aggregates ride one scan; the rollup re-shuffles only
    because (ws, type) isn't a prefix-partition of (ws, type, user)."""
    plan = _executed_plan(queries()["q225_windowed_batch_dedup"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") <= 2, plan
    assert "partial" in plan.lower(), plan  # map-side combine


def test_q226_joins_histograms_not_facts(spark, smoke_sf_dir):
    """The sizing join must run on the per-key aggregates — each table
    scanned once, aggregated BEFORE any join touches it."""
    plan = _executed_plan(queries()["q226_join_size_estimation"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 2, plan
    # every join input is post-aggregation: the first HashAggregate
    # appears deeper in the tree than any join operator
    assert "CartesianProduct" not in plan


def test_q228_funnel_scan_budget(spark, smoke_sf_dir):
    """Stage counts fuse into one conditional aggregate; only the
    dedup needs a second pass — 4 scans max for the 2-branch union,
    never one per funnel stage (6+)."""
    plan = _executed_plan(queries()["q228_ingestion_capstone"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") <= 4, plan


def test_q230_single_fused_pass_no_python(spark, smoke_sf_dir):
    """All hygiene aggregates fuse over one scan, entirely JVM-side —
    higher-order functions, not Python UDFs."""
    plan = _executed_plan(queries()["q230_embedding_hygiene"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("Exchange") <= 1, plan  # only the final 1-row gather


def test_q232_single_corpus_pass(spark, smoke_sf_dir):
    """The (text, source) grouping is the ONLY pass over corpus rows —
    both downstream consumers read the checkpointed aggregate, never
    re-scanning the corpus."""
    plan = _executed_plan(queries()["q232_dedup_token_budget"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 0, plan  # reads the checkpointed pass
    assert "Scan ExistingRDD" in plan, plan


def test_q235_window_runs_on_histogram(spark, smoke_sf_dir):
    """One fact scan; the cumulative window sorts only the bounded
    histogram relation (a few dozen bands), never the fact table."""
    plan = _executed_plan(queries()["q235_range_partition_plan"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 1, plan
    # the global sort below the window consumes the aggregate output
    assert "Window" in plan


def test_q236_first_seen_join_is_text_level(spark, smoke_sf_dir):
    plan = _executed_plan(queries()["q236_novelty_by_batch"](spark, smoke_sf_dir))
    assert plan.count("Scan parquet") == 0, plan  # reads the checkpointed pass
    assert "Scan ExistingRDD" in plan, plan
    assert "CartesianProduct" not in plan


# ------------------------------------------------------------- invariants


def test_q226_prediction_matches_actual_join(spark, sf_dir):
    """The histogram estimate is EXACT math: Σ n_l(k)·n_r(k) must equal
    the materialized join's row count."""
    pred = (
        queries()["q226_join_size_estimation"](spark, sf_dir)
        .collect()[0]["predicted_join_rows"]
    )
    e = read_table(spark, sf_dir, "events").select(F.col("user_id").alias("k"))
    o = read_table(spark, sf_dir, "orders").select(F.col("o_custkey").alias("k"))
    assert pred == e.join(o, "k").count()


def test_q225_conservation(spark, sf_dir):
    out = queries()["q225_windowed_batch_dedup"](spark, sf_dir)
    tot = out.agg(
        F.sum("n_raw").alias("raw"),
        F.sum("n_kept").alias("kept"),
        F.sum("n_dropped").alias("drop"),
    ).collect()[0]
    n_events = read_table(spark, sf_dir, "events").count()
    assert tot["raw"] == n_events
    assert tot["kept"] + tot["drop"] == tot["raw"]
    assert tot["kept"] <= tot["raw"]


def test_q228_funnel_is_monotone(spark, sf_dir):
    for r in queries()["q228_ingestion_capstone"](spark, sf_dir).collect():
        assert r.n_ingested >= r.n_valid >= r.n_unique >= r.n_quality >= 0


def test_q233_cascade_consistency(spark, sf_dir):
    rows = {r.tbl: r for r in queries()["q233_tombstone_cascade"](spark, sf_dir).collect()}
    assert set(rows) == {"customer", "orders", "lineitem", "events"}
    c = read_table(spark, sf_dir, "customer")
    expected = c.filter(F.col("c_custkey") % 97 == 0).count()
    assert rows["customer"].n_deleted == expected
    for r in rows.values():
        assert 0 <= r.n_deleted <= r.n_rows


def test_q234_split_proportions(spark, sf_dir):
    """md5 assignment should land near 80/10/10 globally, and the
    per-lang fractions must sum to 1."""
    rows = queries()["q234_train_split_assignment"](spark, sf_dir).collect()
    by_split = {}
    by_lang = {}
    for r in rows:
        by_split[r.split] = by_split.get(r.split, 0) + r.n_docs
        by_lang.setdefault(r.lang, 0.0)
        by_lang[r.lang] += r.frac_of_lang
    n = sum(by_split.values())
    assert 0.70 <= by_split["train"] / n <= 0.90
    for lang, s in by_lang.items():
        assert abs(s - 1.0) < 1e-4, (lang, s)


def test_q235_partitions_valid_and_monotone(spark, sf_dir):
    rows = sorted(
        queries()["q235_range_partition_plan"](spark, sf_dir).collect(),
        key=lambda r: r.band,
    )
    assert all(0 <= r.assigned_partition < 8 for r in rows)
    parts = [r.assigned_partition for r in rows]
    assert parts == sorted(parts)  # ranges assign contiguously
    assert rows[0].cum_before == 0


def test_q236_novelty_endpoints(spark, sf_dir):
    """Original batches are all-new; the re-crawl batches (5–9) are
    all duplicates of earlier content."""
    rows = {r.batch: r for r in queries()["q236_novelty_by_batch"](spark, sf_dir).collect()}
    for b, r in rows.items():
        if b <= 4:
            assert r.novelty_rate == 1.0, r
        else:
            assert r.novelty_rate == 0.0, r


def test_q230_hygiene_on_clean_vectors(spark, sf_dir):
    r = queries()["q230_embedding_hygiene"](spark, sf_dir).collect()[0]
    assert r.n_vectors > 0
    assert r.dim_min == r.dim_max  # fixed-dimension corpus
    assert r.n_nonfinite == 0 and r.n_zero_norm == 0
    assert 0 < r.avg_norm <= r.max_norm


def test_q234_split_invariant_to_partitioning(spark, sf_dir):
    """The split is a pure function of md5(doc_id): re-partitioning the
    input must not move a single document between splits — the
    property that makes the assignment reproducible on any engine and
    any cluster layout."""
    from databricks_etl_spark.operators.text import tokens_col  # noqa: F401
    from pyspark.sql import functions as F
    from databricks_etl_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents")
    h = F.md5(F.col("doc_id").cast("string"))
    nib = lambda k: F.instr(F.lit("0123456789abcdef"), F.substring(h, k, 1)) - 1  # noqa: E731
    v = nib(1) * 16 + nib(2)
    split = F.when(v < 204, "train").when(v < 230, "val").otherwise("test")
    a = {r.doc_id: r.s for r in d.repartition(3).select("doc_id", split.alias("s")).collect()}
    b = {r.doc_id: r.s for r in d.repartition(17, "lang").select("doc_id", split.alias("s")).collect()}
    assert a == b and len(a) > 0


def test_q246_scorecard_consistent_with_component_audits(spark, sf_dir):
    """The composed scorecard must agree with the standalone audits it
    joins: per-source near-dup counts match q174 and totals match the
    corpus."""
    sc = {r.source: r for r in queries()["q246_source_scorecard"](spark, sf_dir).collect()}
    q174 = {r.source: r for r in queries()["q174_neardup_rate_by_source"](spark, sf_dir).collect()}
    assert set(sc) == set(q174)
    for s, r in sc.items():
        assert r.n_neardup == q174[s].n_flagged
        assert r.n_docs == q174[s].n_docs
        assert 0 <= r.n_contaminated <= r.n_docs
        assert 0 <= r.n_quality <= r.n_docs
