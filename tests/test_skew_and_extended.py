"""Salted-join equivalence, qualified-star disambiguation, and the
pandas_udf embedding determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators import similarity as SIM
from databricks_etl_spark.operators.skew import salted_join
from databricks_etl_spark.sources.readers import read_table


def test_salted_join_equals_plain_join(spark, smoke_sf_dir):
    li = read_table(spark, smoke_sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, smoke_sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    plain = li.join(o, "l_orderkey").groupBy("o_orderpriority").count()
    salted = salted_join(li, o, "l_orderkey", salt=8).groupBy("o_orderpriority").count()
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_keeps_unmatched(spark, smoke_sf_dir):
    c = read_table(spark, smoke_sf_dir, "customer").select(
        F.col("c_custkey").alias("k"), "c_mktsegment"
    )
    o = (
        read_table(spark, smoke_sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plain = c.join(o, "k", "left")
    salted = salted_join(c, o, "k", salt=4, how="left")
    assert plain.count() == salted.count() == c.count()
    assert (
        plain.filter(F.col("n").isNull()).count()
        == salted.filter(F.col("n").isNull()).count()
    )


def test_embed_stub_deterministic_and_normalized(spark, smoke_sf_dir):
    d = read_table(spark, smoke_sf_dir, "documents").filter(F.col("doc_id") < 30)
    e1 = {r["doc_id"]: list(r["embedding"]) for r in SIM.embed_text_stub(d).collect()}
    e2 = {r["doc_id"]: list(r["embedding"]) for r in SIM.embed_text_stub(d).collect()}
    assert e1 == e2
    for v in e1.values():
        norm = sum(x * x for x in v) ** 0.5
        assert abs(norm - 1.0) < 1e-5


def test_embedding_neardup_selfpair_sanity(spark, smoke_sf_dir):
    """A doc unioned with an exact copy must show cosine 1.0 — exact
    duplicates hash to identical LSH buckets in every table, so the
    bucketed path can never miss them."""
    d = read_table(spark, smoke_sf_dir, "documents").filter(F.col("doc_id") < 20).select(
        "doc_id", "text"
    )
    clone = d.filter(F.col("doc_id") == 0).select(
        F.lit(555).cast("long").alias("doc_id"), "text"
    )
    pairs = SIM.embedding_neardup_pairs(
        SIM.embed_text_stub(d.union(clone)), threshold=0.999
    ).collect()
    assert any(r["id_a"] == 0 and r["id_b"] == 555 for r in pairs)


def test_embedding_neardup_no_cartesian_and_recall(spark, smoke_sf_dir):
    """The registered near-dup path must be LSH-bucketed (no cross
    product in the physical plan) and must recover every pair the
    exact all-pairs baseline finds at threshold 0.98 on this corpus."""
    d = read_table(spark, smoke_sf_dir, "documents").filter(F.col("doc_id") < 120).select(
        "doc_id", "text"
    )
    clones = d.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 900).alias("doc_id"), "text"
    )
    e = SIM.embed_text_stub(d.union(clones))
    approx = SIM.embedding_neardup_pairs(e, threshold=0.98)
    plan = approx._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    got = {(r["id_a"], r["id_b"]) for r in approx.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in SIM.embedding_neardup_pairs_allpairs(e, threshold=0.98).collect()
    }
    assert want, "fixture should contain at least one near-dup pair"
    recall = len(got & want) / len(want)
    assert recall >= 0.9, f"LSH near-dup recall {recall} vs exact baseline"
