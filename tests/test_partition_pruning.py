"""Partition pruning — the other half of the 100 TB scan story beside
filter pushdown (test_plans.py) and bucketing (test_bucketing.py).

Static pruning: a filter on the partition column must reduce the files
actually read, visible as ``PartitionFilters`` in the scan node and a
smaller ``inputFiles()`` set. Dynamic partition pruning (DPP): a join
against a filtered dimension must inject a runtime pruning subquery
into the fact scan (``dynamicpruning`` in the plan) so only matching
partitions are read — on a date-partitioned 100 TB fact this is the
difference between scanning 7 years and scanning one.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.sources.readers import read_table


@pytest.fixture()
def partitioned_orders(spark, smoke_sf_dir, tmp_path):
    path = str(tmp_path / "orders_by_year")
    o = read_table(spark, smoke_sf_dir, "orders").withColumn(
        "o_year", F.year("o_orderdate")
    )
    o.write.partitionBy("o_year").mode("overwrite").parquet(path)
    return path


def test_static_partition_pruning(spark, partitioned_orders):
    full = spark.read.parquet(partitioned_orders)
    years = [r[0] for r in full.select("o_year").distinct().collect()]
    assert len(years) > 1, "fixture must span multiple partitions"
    one = full.filter(F.col("o_year") == years[0])

    # inputFiles() reports the unpruned base relation, so assert on the
    # scan node: the partition predicate (with its literal year) must
    # appear under PartitionFilters, not as a post-scan Filter.
    plan = one._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        one._jdf.queryExecution(), "formatted"
    )
    scan = plan[plan.index("PartitionFilters") :].splitlines()[0]
    assert f"= {years[0]}" in scan, scan


def test_dynamic_partition_pruning(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    # A tiny filtered dimension keyed by the fact's partition column.
    # The selective predicate is on a column Catalyst cannot relate to
    # the join key (otherwise constraint propagation would turn this
    # into *static* pruning); DPP must inject the dim's surviving years
    # into the fact scan at runtime via the reused broadcast.
    years = sorted(r[0] for r in fact.select("o_year").distinct().collect())
    dim = spark.createDataFrame(
        [(y, "focus" if i == 0 else "other") for i, y in enumerate(years)],
        "o_year int, tag string",
    ).filter(F.col("tag") == "focus")
    joined = fact.join(dim, "o_year").groupBy("o_year").count()
    plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        joined._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan
