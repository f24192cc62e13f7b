"""Bucketed-table co-located join: the write-once-shuffle-never plan
contract. Writes orders and customer bucketed by the join key into an
external path, then asserts the bucketed sort-merge join plan has NO
Exchange on either side (the 100 TB story: the shuffle is paid once at
layout time) while the same join over plain parquet does."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.sources.writers import write_bucketed


@pytest.fixture()
def no_broadcast(spark):
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_join_has_no_exchange(spark, smoke_sf_dir, tmp_path, no_broadcast):
    o = read_table(spark, smoke_sf_dir, "orders")
    c = read_table(spark, smoke_sf_dir, "customer")
    try:
        write_bucketed(
            o, "b_orders", ["o_custkey"], 8,
            path=str(tmp_path / "b_orders"), sort_cols=["o_custkey"],
        )
        write_bucketed(
            c, "b_customer", ["c_custkey"], 8,
            path=str(tmp_path / "b_customer"), sort_cols=["c_custkey"],
        )
        bo, bc = spark.table("b_orders"), spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("n"))
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the only exchange allowed is the post-join aggregation one
        pre_agg = plan.split("HashAggregate")[-1]
        assert "Exchange" not in pre_agg, plan
        assert "SortMergeJoin" in plan, plan

        # control: identical join over non-bucketed parquet DOES shuffle
        plain = o.join(c, o.o_custkey == c.c_custkey).groupBy(
            "c_mktsegment"
        ).agg(F.count(F.lit(1)).alias("n"))
        plain_plan = plain._jdf.queryExecution().executedPlan().toString()
        pre_agg_plain = plain_plan.split("HashAggregate")[-1]
        assert "Exchange" in pre_agg_plain

        # correctness: bucketed result equals plain result
        assert sorted(map(tuple, joined.collect())) == sorted(
            map(tuple, plain.collect())
        )
    finally:
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")
