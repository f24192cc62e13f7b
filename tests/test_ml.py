"""Invariants for the ML surface (M1–M4): seeded determinism, cluster
cardinality, PCA dimensionality (cluster IDs themselves are label-
permutable — never asserted, hard part (f))."""

from __future__ import annotations

from databricks_etl_spark.plans.queries_ml import (
    _customer_activity,
    q55_kmeans_activity_clusters,
)
from databricks_etl_spark.operators.ml import cluster_activity


def test_kmeans_invariants(spark, smoke_sf_dir):
    out = q55_kmeans_activity_clusters(spark, smoke_sf_dir)
    rows = out.collect()
    assert len(rows) == 150  # one per customer at sf0.001
    levels = {r["activity_level"] for r in rows}
    assert levels <= {0, 1, 2} and len(levels) == 3
    # registered query projects the pca array to scalar pca_x/pca_y so
    # the driver canonicalizer can sort/hash it
    assert all(r["pca_x"] is not None and r["pca_y"] is not None for r in rows)


def test_kmeans_seeded_determinism(spark, smoke_sf_dir):
    feats = _customer_activity(spark, smoke_sf_dir)
    cols = ["c_acctbal", "n_orders", "days_since_last_order", "active_span_days"]
    a = cluster_activity(feats, cols, id_col="c_custkey")
    b = cluster_activity(feats, cols, id_col="c_custkey")
    ra = {r["c_custkey"]: r["activity_level"] for r in a.collect()}
    rb = {r["c_custkey"]: r["activity_level"] for r in b.collect()}
    assert ra == rb
