"""Grouped-map applyInPandas cross-validation: the pandas per-group
z-score must agree with the JVM window formulation (q79) to 1e-9."""

from __future__ import annotations

from databricks_etl_spark.operators.grouped import zscore_per_group
from databricks_etl_spark.plans.queries_extended import q79_zscore_within_group
from databricks_etl_spark.sources.readers import read_table


def test_grouped_map_zscore_matches_window(spark, smoke_sf_dir):
    c = read_table(spark, smoke_sf_dir, "customer")
    via_pandas = {
        r["c_custkey"]: r["z"]
        for r in zscore_per_group(c, "c_mktsegment", "c_acctbal", "c_custkey").collect()
    }
    via_window = {
        r["c_custkey"]: r["acctbal_z"]
        for r in q79_zscore_within_group(spark, smoke_sf_dir).collect()
    }
    assert set(via_pandas) == set(via_window)
    for k, z in via_window.items():
        assert abs(via_pandas[k] - z) < 1e-4  # window side rounds to 4dp


def test_grouped_map_ols_close_to_numpy(spark, smoke_sf_dir):
    """Exact-decimal OLS must agree with a numpy float64 lstsq to
    float tolerance (it IS the same estimator, different arithmetic)."""
    import numpy as np

    from databricks_etl_spark.operators.grouped import ols_fit_per_group

    li = read_table(spark, smoke_sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    got = {
        r["l_returnflag"]: (r["slope"], r["intercept"], r["n_rows"])
        for r in ols_fit_per_group(
            li, "l_returnflag", "l_quantity", "l_extendedprice"
        ).collect()
    }
    pdf = li.toPandas()
    for flag, grp in pdf.groupby("l_returnflag"):
        x, y = grp["l_quantity"].to_numpy(), grp["l_extendedprice"].to_numpy()
        slope, intercept = np.polyfit(x, y, 1)
        gs, gi, gn = got[flag]
        assert gn == len(grp)
        assert abs(gs - slope) < 1e-3 * max(1.0, abs(slope))
        assert abs(gi - intercept) < 1e-3 * max(1.0, abs(intercept))
