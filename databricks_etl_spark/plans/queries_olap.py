"""Classic OLAP compositions over the full star schema — exercises
every testdata table (region/supplier included) with the canonical
TPC-H-style shapes: shipping-priority top-k, region-local volume,
per-group top-k, and SCD2 history building.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import decimal_sum
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


@query(
    "q73_shipping_priority",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
          AND o_orderdate < TIMESTAMP '1999-06-01'
          AND l_shipdate  > TIMESTAMP '1999-06-01'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey
        LIMIT 10
    """,
    bench=True,
)
def q73_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: segment filter → 3-way join → grouped revenue →
    top-10. Filters on both fact and dim sides push to their scans;
    the top-k is TakeOrderedAndProject."""
    c = read_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1999-06-01").cast("timestamp")
    )
    li = read_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1999-06-01").cast("timestamp")
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li, o.o_orderkey == li.l_orderkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@query(
    "q74_region_supplier_volume",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
)
def q74_region_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape over the supplier side: fact ⋈ supplier ⋈ nation ⋈
    region with a region filter. The three dims broadcast (all tiny);
    the region predicate prunes nations before the fact join via the
    broadcast chain."""
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .orderBy(F.desc("revenue"))
    )


@query(
    "q75_topk_per_group",
    oracle="""
        SELECT c_mktsegment, o_orderkey, o_totalprice, CAST(rk AS BIGINT) AS rk
        FROM (
            SELECT c_mktsegment, o_orderkey, o_totalprice,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice DESC, o_orderkey
                   ) AS rk
            FROM orders JOIN customer ON o_custkey = c_custkey
        ) WHERE rk <= 3
    """,
)
def q75_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (the canonical OLAP window pattern): top-3
    orders per market segment. One shuffle on the group key; the rank
    filter truncates per partition."""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= 3)
    )


@query(
    "q76_scd2_history",
    oracle="""
        WITH versions AS (
            SELECT user_id, ts AS valid_from, value AS acct_value,
                   lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       AS valid_to
            FROM events
            WHERE event_type = 'purchase'
        )
        SELECT user_id,
               CAST(floor(epoch(valid_from)) AS BIGINT) AS valid_from_epoch,
               CAST(floor(epoch(valid_to)) AS BIGINT) AS valid_to_epoch,
               acct_value,
               CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
        FROM versions
    """,
)
def q76_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history build (the MERGE-less emulation from the public
    Spark canon: window + lead): each purchase event becomes a
    validity interval [valid_from, valid_to), NULL valid_to = current
    version. One shuffle on the business key."""
    e = read_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id",
        F.unix_timestamp("ts").alias("valid_from_epoch"),
        F.unix_timestamp(F.lead("ts").over(w)).alias("valid_to_epoch"),
        F.col("value").alias("acct_value"),
        F.when(F.lead("ts").over(w).isNull(), 1).otherwise(0).alias("is_current"),
    )
