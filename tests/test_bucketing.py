"""Bucketed-table co-located join (SURVEY.md §4.3 / pyspark guide):
both sides bucketed by the join key → SortMergeJoin with NO shuffle
exchange on either side. This is the 100 TB recipe for repeated joins
on the same key; the test asserts the plan property, not just results.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.sources.readers import read_table


@pytest.fixture()
def bucketed_tables(spark, smoke_sf_dir, tmp_path):
    o = read_table(spark, smoke_sf_dir, "orders")
    li = read_table(spark, smoke_sf_dir, "lineitem")
    names = ("bt_orders", "bt_lineitem")
    for name, df, key in [
        (names[0], o, "o_orderkey"),
        (names[1], li, "l_orderkey"),
    ]:
        (
            df.write.bucketBy(8, key)
            .sortBy(key)
            .option("path", str(tmp_path / name))
            .mode("overwrite")
            .saveAsTable(name)
        )
    yield names
    for name in names:
        spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bo, bl = bucketed_tables
    joined = spark.table(bl).join(
        spark.table(bo), F.col("l_orderkey") == F.col("o_orderkey")
    )
    # disable broadcast + AQE so the bucket-aware SortMergeJoin plan is
    # visible deterministically
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan, "bucketed join must not shuffle"
    assert "Bucketed: true" in plan
    # and of course it's still correct
    n = joined.count()
    assert n == 6000
