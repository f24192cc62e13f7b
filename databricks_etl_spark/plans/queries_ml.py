"""EP3/ML queries: derived-feature mart (oracled) + seeded
KMeans/PCA clustering (rows-only, hard part (f): cluster IDs are
label-permutable so never oracled on IDs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators.features import days_since
from databricks_etl_spark.operators.ml import cluster_activity
from databricks_etl_spark.plans.queries_relational import AS_OF_DATE
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


def _customer_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 analog on the star schema: per-customer activity features
    (the reference's transaction_count / days_since_* mart,
    ``transform.py:66-181``, re-keyed to customers/orders)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.max("o_orderdate").alias("last_order"),
        F.min("o_orderdate").alias("first_order"),
    )
    j = c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left")
    return j.select(
        "c_custkey",
        "c_acctbal",
        F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
        F.coalesce(days_since("last_order", AS_OF_DATE), F.lit(-1))
        .cast("long")
        .alias("days_since_last_order"),
        F.coalesce(
            F.datediff(F.to_date("last_order"), F.to_date("first_order")), F.lit(0)
        )
        .cast("long")
        .alias("active_span_days"),
        F.when(F.col("n_orders").isNull(), 1).otherwise(0).alias("no_events"),
    )


@query(
    "q54_customer_features",
    oracle=f"""
        WITH per_cust AS (
            SELECT o_custkey, COUNT(*) AS n_orders,
                   MAX(o_orderdate) AS last_order, MIN(o_orderdate) AS first_order
            FROM orders GROUP BY o_custkey
        )
        SELECT c_custkey, c_acctbal,
               COALESCE(n_orders, 0) AS n_orders,
               CAST(COALESCE(date_diff('day', CAST(last_order AS DATE), DATE '{AS_OF_DATE}'), -1)
                    AS BIGINT) AS days_since_last_order,
               CAST(COALESCE(date_diff('day', CAST(first_order AS DATE), CAST(last_order AS DATE)), 0)
                    AS BIGINT) AS active_span_days,
               CASE WHEN n_orders IS NULL THEN 1 ELSE 0 END AS no_events
        FROM customer LEFT JOIN per_cust ON c_custkey = o_custkey
    """,
)
def q54_customer_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EP3 derived-feature mart (age-group/day-diff/no-events shape,
    ``transform.py:95-179``) with deterministic ``as_of_date``."""
    return _customer_activity(spark, sf_dir)


@query("q55_kmeans_activity_clusters", oracle=None)
def q55_kmeans_activity_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M1–M4: feature assembly → KMeans(k=3, seed=1) → PCA(2) → join-
    back (``transform.py:192-240``). Rows-only; determinism and
    cluster-count invariants in tests/test_ml.py.

    The registered query projects the ``pca array<double>`` into scalar
    ``pca_x``/``pca_y`` doubles: the driver canonicalizer sorts/hashes
    result columns with pandas, which cannot factorize list cells
    (r5 driver record crashed on exactly this). The array form stays
    available from :func:`operators.ml.cluster_activity` for library
    users."""
    feats = _customer_activity(spark, sf_dir)
    assigned = cluster_activity(
        feats,
        ["c_acctbal", "n_orders", "days_since_last_order", "active_span_days"],
        id_col="c_custkey",
    )
    return assigned.select(
        "c_custkey",
        "activity_level",
        F.col("pca")[0].alias("pca_x"),
        F.col("pca")[1].alias("pca_y"),
    )


@query(
    "q171_kmeans_invariant_gate",
    oracle="""
        SELECT 3 AS k_clusters,
               CAST(COUNT(*) AS BIGINT) AS n_assigned,
               TRUE AS sizes_positive,
               TRUE AS centers_finite,
               TRUE AS pca_dims_ok
        FROM customer
    """,
)
def q171_kmeans_invariant_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q55's KMeans/PCA pipeline graded by its LABEL-PERMUTATION-SAFE
    invariants (the bracket-gate pattern from q145/q146/q149 applied
    to ML): cluster IDs are arbitrary, but (a) exactly k non-empty
    clusters exist, (b) every customer receives exactly one
    assignment, (c) PCA output is 2-dimensional and finite — all
    deterministic for KMeans(k=3, seed=1) regardless of which
    permutation the seed lands on. The oracle states the invariants
    as constants plus the exact assignment count, so an ML-pipeline
    regression (dropped rows, NaN features, empty cluster, wrong
    PCA k) breaks the value hash. Seeded run-to-run equality is
    asserted separately in tests/test_ml.py."""
    feats = _customer_activity(spark, sf_dir)
    assigned = cluster_activity(
        feats,
        ["c_acctbal", "n_orders", "days_since_last_order", "active_span_days"],
        id_col="c_custkey",
    )
    per_cluster = assigned.groupBy("activity_level").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(
            F.size("pca") == 2
        ).alias("dims_ok"),
        F.min(
            ~F.exists("pca", lambda v: F.isnan(v) | v.isNull())
        ).alias("finite_ok"),
    )
    return per_cluster.agg(
        F.count(F.lit(1)).cast("int").alias("k_clusters"),
        F.sum("n").cast("long").alias("n_assigned"),
        F.min(F.col("n") > 0).alias("sizes_positive"),
        F.min("finite_ok").alias("centers_finite"),
        F.min("dims_ok").alias("pca_dims_ok"),
    )
