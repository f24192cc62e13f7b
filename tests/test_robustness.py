"""Degenerate-input hardening: empty tables and NULL-riddled columns
through the operator library. Generalizes the r4 ADVICE lesson (the DQ
gate silently passing on zero rows): every operator must either return
a sane empty/zero result or a well-defined row — never crash, never
fabricate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.operators import dedup as DD
from databricks_etl_spark.operators import relational as R
from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.operators.intervals import interval_union_stats
from databricks_etl_spark.operators.profile import completeness, uniqueness
from databricks_etl_spark.operators.stats import group_quantiles, mad_outliers


@pytest.fixture(scope="module")
def empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_empty_corpus_through_dedup_ladder(spark, empty_docs):
    assert DD.jaccard_pairs(empty_docs, 0.5, ngram=3).count() == 0
    assert DD.containment_pairs(empty_docs, 0.5, ngram=3).count() == 0
    assert DD.dedup_exact(empty_docs, ["text"], "doc_id").count() == 0
    assert TX.shingles(empty_docs, 3).count() == 0


def test_empty_tables_through_relational_and_stats(spark, empty_docs):
    e = spark.createDataFrame([], "k long, rid long, s long, e long")
    assert interval_union_stats(e, "k", "s", "e", "rid").count() == 0
    from fractions import Fraction

    x = spark.createDataFrame([], "g string, v long, id long")
    assert group_quantiles(x, "g", "v", {"p50": Fraction(1, 2)}, "id").count() == 0
    assert mad_outliers(x, "g", "v", tiebreak="id").count() == 0
    assert R.dedup_keep_first(empty_docs, ["text"], [F.col("doc_id")]).count() == 0


def test_empty_profile_reports_no_rows_not_full_marks(spark):
    """Profile metrics on an empty table must not report 100%-complete/
    unique columns (the 0/0 trap the DQ gate fixed): NULL metric or
    zero rows are both acceptable — a 100.0 is not."""
    df = spark.createDataFrame([], "a long, b string")
    for report in (completeness(df), uniqueness(df)):
        for r in report.collect():
            val = r[1]
            assert val is None or val == 0.0, r


def test_null_text_rows_flow_through_text_ops(spark):
    """NULL and whitespace-only texts must not crash tokenization or
    pair generation — NULL text yields no shingles, so NULL docs can
    never appear in a similarity pair."""
    df = spark.createDataFrame(
        [(1, None), (2, "   "), (3, "a b c d e f"), (4, "a b c d e f")],
        "doc_id long, text string",
    )
    sh = TX.shingles(df, 3)
    assert sh.filter(F.col("doc_id") == 1).count() == 0
    pairs = DD.jaccard_pairs(df, 0.5, ngram=3).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(3, 4)}
    # exact dedup: NULL texts group together deterministically
    kept = DD.dedup_exact(df, ["text"], "doc_id")
    assert kept.count() == 3  # NULL, "   ", and the duplicated text


def test_null_keys_through_interval_union(spark):
    """A NULL key forms its own group (Spark groupBy semantics) rather
    than being dropped — callers filter if they want otherwise."""
    df = spark.createDataFrame(
        [(None, 1, 0, 10), (None, 2, 5, 15), (7, 3, 0, 10)],
        "k long, rid long, s long, e long",
    )
    rows = {r.k: (r.n_islands, r.covered) for r in
            interval_union_stats(df, "k", "s", "e", "rid").collect()}
    assert rows[None] == (1, 15) and rows[7] == (1, 10)


def test_single_row_group_stats(spark):
    """n=1 group: every quantile is the single value, MAD is 0, and
    the sole row is never an outlier of itself."""
    from fractions import Fraction

    df = spark.createDataFrame([("g", 42, 1)], "g string, v long, id long")
    q = group_quantiles(
        df, "g", "v",
        {"p25": Fraction(1, 4), "p50": Fraction(1, 2), "p75": Fraction(3, 4)},
        "id",
    ).collect()[0]
    assert (q.p25, q.p50, q.p75) == (42, 42, 42)
    m = mad_outliers(df, "g", "v", tiebreak="id").collect()[0]
    assert m.median == 42 and m.mad == 0 and m.n_outliers == 0


def test_zero_norm_vector_yields_null_cosine_not_crash(spark):
    """Spark 4 ANSI raises DIVIDE_BY_ZERO even for double division: a
    single corrupt (all-zero) embedding must yield NULL similarity,
    not kill the ANN job."""
    from databricks_etl_spark.operators.similarity import cosine

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "id long, v array<double>",
    )
    a, b = df.alias("a"), df.alias("b")
    rows = (
        a.crossJoin(b)
        .select(
            F.col("a.id").alias("ia"), F.col("b.id").alias("ib"),
            cosine(F.col("a.v"), F.col("b.v")).alias("c"),
        )
        .collect()
    )
    for r in rows:
        if 1 in (r.ia, r.ib):
            assert r.c is None, r  # any pair touching the zero vector
        else:
            assert r.c is not None


def test_empty_graph_and_empty_sample(spark):
    from databricks_etl_spark.operators.graph import connected_components
    from databricks_etl_spark.operators.sampling import hash_stratified_sample

    e = spark.createDataFrame([], "id_a long, id_b long")
    assert connected_components(e).count() == 0
    s = spark.createDataFrame([], "k long, g string")
    assert hash_stratified_sample(s, "k", "g", {"x": 10}).count() == 0


def test_empty_string_doc_through_quality_features(spark):
    """An empty-string document must score 0 with NULL ratios — not
    raise DIVIDE_BY_ZERO (Spark 4 ANSI) and kill the corpus scan."""
    rows = {
        r.doc_id: r
        for r in TX.quality_features(
            spark.createDataFrame(
                [(1, ""), (2, None), (3, "the cat sat on the mat today ok")],
                "doc_id long, text string",
            )
        ).collect()
    }
    assert rows[1].quality_score == 0.0 and rows[1].punct_ratio is None
    assert rows[3].quality_score > 0.0


def test_pergroup_ols_degenerate_groups(spark):
    """Constant-x and single-row groups report NULL slope/intercept —
    not a ZeroDivisionError inside the Arrow batch that would fail the
    whole stage."""
    from databricks_etl_spark.operators.grouped import ols_fit_per_group as pergroup_ols

    df = spark.createDataFrame(
        [("const", 1.0, 5.0), ("const", 1.0, 7.0), ("solo", 2.0, 3.0),
         ("ok", 1.0, 2.0), ("ok", 2.0, 4.0)],
        "g string, x double, y double",
    )
    rows = {r.g: r for r in pergroup_ols(df, "g", "x", "y").collect()}
    assert rows["const"].slope is None and rows["const"].intercept is None
    assert rows["solo"].slope is None
    assert abs(rows["ok"].slope - 2.0) < 1e-9


def test_corrupt_payload_quarantined_not_fatal(spark):
    """One bad binary in the batch yields NULL features; the valid row
    still decodes — the stage never dies."""
    from databricks_etl_spark.operators import multimodal as MM

    valid = MM.encode_bmp(2, 2, lambda x, y: (10, 20, 30))
    df = spark.createDataFrame(
        [
            (1, bytearray(b"NOTABMP")),
            (2, bytearray(b"")),
            (3, bytearray(valid)),
            (4, None),  # NULL payload must quarantine too (r5 ADVICE.md)
        ],
        "doc_id long, payload binary",
    )
    rows = {r.doc_id: r for r in MM.decode_features(df).collect()}
    assert rows[1].width is None and rows[2].width is None
    assert rows[3].width == 2 and rows[3].height == 2
    assert rows[1].n_bytes == 7  # metadata survives the quarantine
    assert rows[4].width is None and rows[4].n_bytes is None


def test_empty_graph_pagerank(spark):
    from databricks_etl_spark.operators.graph import pagerank

    e = spark.createDataFrame([], "src long, dst long")
    assert pagerank(e).count() == 0


def test_udf_lanes_degenerate_inputs(spark):
    """Arrow-batched UDF lanes: empty broadcast mapping falls back to
    the default, NULL/empty text embeds to the zero vector — no
    Python-worker exceptions."""
    from databricks_etl_spark.functions.udfs import (
        make_broadcast_lookup_udf,
        make_embed_udf,
    )
    from databricks_etl_spark.operators.skew import salted_join

    u = make_broadcast_lookup_udf(spark, {}, default="unknown")
    df = spark.createDataFrame([(1, "x")], "id long, k string")
    assert df.select(u(F.col("k")).alias("v")).collect()[0].v == "unknown"

    e = make_embed_udf(4)
    df2 = spark.createDataFrame([(1, None), (2, "")], "id long, t string")
    for r in df2.select(e(F.col("t")).alias("v")).collect():
        assert r.v == [0.0, 0.0, 0.0, 0.0]

    left = spark.createDataFrame([], "k long, a long")
    right = spark.createDataFrame([], "k long, b long")
    assert salted_join(left, right, "k").count() == 0


def test_approx_buckets_degenerate_inputs(spark):
    """quantile_bucket edge behavior: a constant column collapses to
    ONE bucket (all boundaries equal, strict > assignment sends every
    row to bucket 1) and an empty relation yields an empty assignment
    — no crashes, no NULL buckets."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.operators.quantile_bucket import (
        assign_approx_buckets,
    )

    const = spark.range(100).select(F.lit(7.5).alias("v"))
    got = assign_approx_buckets(const, "v", 10).select("bucket").distinct().collect()
    assert [r.bucket for r in got] == [1]

    empty = spark.createDataFrame([], "v double")
    assigned = assign_approx_buckets(empty, "v", 10)
    assert assigned.count() == 0


def test_lsh_quality_audit_empty_corpus(spark):
    """Zero-pair corpus through the q240/q255 audit body: counts are 0
    (not NULL), ratios are NULL (not an ANSI DIVIDE_BY_ZERO crash) —
    the same row DuckDB's oracle produces on the degenerate input."""
    from databricks_etl_spark.plans.queries_round5b import _lsh_quality_audit

    empty = spark.createDataFrame([], "doc_id long, text string")
    r = _lsh_quality_audit(empty).collect()[0]
    assert (r.n_candidates, r.n_true, r.n_hits) == (0, 0, 0)
    assert r.precision is None and r.recall is None


def test_size_audit_empty_reports_requested_buckets(spark):
    """Empty input: the bracket is vacuous — size_audit reports the
    REQUESTED bucket count with zero rows and TRUE checks, matching a
    constant-stating oracle instead of diverging on an observed 0."""
    from databricks_etl_spark.operators.quantile_bucket import size_audit

    empty = spark.createDataFrame([], "v double")
    r = size_audit(empty, "v", 10).collect()[0]
    assert (r.n_buckets, r.n_total) == (10, 0)
    assert r.sizes_within_tol and r.buckets_ordered


def test_size_audit_tie_heavy_dimension(spark):
    """Tie-heavy dimension (small-integer values, q248's 'frequency'
    shape): a valid sketch returns DUPLICATED quintile boundaries, so
    the observed distinct bucket count is sketch-dependent — the audit
    must still report the requested k (the hash-compared constant) and
    hold the bracket, with duplicated bounds de-duplicated so bucket
    ids never skip (value > b must not count one tie twice)."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.operators.quantile_bucket import (
        assign_literal_buckets,
        size_audit,
    )

    # 90% of rows share one value — every interior quintile boundary
    # collapses onto it
    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(3.0))
        .otherwise(F.col("id").cast("double"))
        .alias("v")
    )
    r = size_audit(df, "v", 5).collect()[0]
    assert (r.n_buckets, r.n_total) == (5, 1000)
    assert r.sizes_within_tol and r.buckets_ordered

    # duplicated literal bounds: ids stay contiguous from 1 (naive
    # per-boundary increments would emit buckets {1, 4, 5} here)
    assigned = assign_literal_buckets(df, "v", [3.0, 3.0, 3.0, 950.0])
    ids = sorted(x.bucket for x in assigned.select("bucket").distinct().collect())
    assert ids == [1, 2, 3], ids  # ≤3.0 | (3.0, 950.0] | >950.0


def test_size_audit_detects_broken_assignment(spark, monkeypatch):
    """The id-consistency check folded into buckets_ordered catches a
    genuinely broken assignment (every row in one bucket) even on
    tie-heavy inputs where the size tolerance is inflated past n by
    the 2*maxdup term."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.operators import quantile_bucket as QB

    df = spark.range(1000).select(
        F.when(F.col("id") < 900, F.lit(3.0))
        .otherwise(F.col("id").cast("double"))
        .alias("v")
    )
    ok = QB.size_audit(df, "v", 5).collect()[0]
    assert ok.buckets_ordered  # healthy operator passes

    def broken(df, col, bounds, *, bucket_col="bucket"):
        return df.withColumn(bucket_col, F.lit(1))

    monkeypatch.setattr(QB, "assign_literal_buckets", broken)
    bad = QB.size_audit(df, "v", 5).collect()[0]
    assert not bad.buckets_ordered  # all-in-one-bucket is caught
