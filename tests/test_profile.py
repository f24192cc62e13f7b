"""profile_report composite: agrees with the individual single-metric
operators, and flag_validity sanity."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators import profile as P
from databricks_etl_spark.sources.readers import read_table


def test_profile_report_matches_individual_metrics(spark, smoke_sf_dir):
    c = read_table(spark, smoke_sf_dir, "customer")
    checks = {"c_acctbal": F.col("c_acctbal") > 0}
    report = {
        (r["metric"], r["column"]): r["value"]
        for r in P.profile_report(c, integrity_checks=checks).collect()
    }
    for r in P.completeness(c).collect():
        assert report[("pct_complete", r["column"])] == r["pct_complete"]
    for r in P.uniqueness(c).collect():
        assert report[("pct_unique", r["column"])] == r["pct_unique"]
    for r in P.integrity(c, checks).collect():
        assert report[("pct_valid", r["column"])] == r["pct_valid"]


def test_correlation_matrix_agrees_with_pairwise(spark, smoke_sf_dir):
    li = read_table(spark, smoke_sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount"]
    pairs = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in P.correlation_pairs(li, cols).collect()
    }
    matrix = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in P.correlation_matrix(li, cols).collect()
    }
    assert set(pairs) == set(matrix)
    for k in pairs:
        assert abs(pairs[k] - matrix[k]) < 1e-9


def test_flag_validity(spark, smoke_sf_dir):
    o = read_table(spark, smoke_sf_dir, "orders").withColumn(
        "flag", (F.col("o_orderstatus") == "F").cast("int")
    )
    out = {r["column"]: r["pct_valid"] for r in P.flag_validity(o, ["flag"]).collect()}
    assert out["flag"] == 100.0
