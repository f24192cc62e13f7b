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
        li.join(s, li.l_suppkey == s.s_suppkey)
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


@query(
    "q94_volume_shipping",
    oracle="""
        SELECT sn.n_name AS supp_nation,
               cn.n_name AS cust_nation,
               CAST(year(l_shipdate) AS BIGINT) AS l_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS volume
        FROM lineitem
        JOIN supplier ON s_suppkey = l_suppkey
        JOIN nation sn ON sn.n_nationkey = s_nationkey
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
        JOIN nation cn ON cn.n_nationkey = c_nationkey
        WHERE sn.n_nationkey <> cn.n_nationkey
        GROUP BY 1, 2, 3
    """,
)
def q94_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: cross-border trade volume by (supplier nation,
    customer nation, ship year). Five joins, but only the fact is big:
    supplier/customer/nation all broadcast, so the physical plan is a
    single scan of lineitem through a chain of broadcast-hash joins —
    no fact-side shuffle until the final (25×25×years)-key aggregate.
    """
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    return (
        li.join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .filter(F.col("sn_key") != F.col("cn_key"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "volume"))
    )


@query(
    "q95_returned_items",
    oracle="""
        SELECT c_custkey, c_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               n_name
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey
        LIMIT 20
    """,
)
def q95_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by returned-item revenue.
    The returnflag filter pushes into the lineitem scan; customer and
    nation broadcast; the top-k is TakeOrderedAndProject (no global
    sort materialization)."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = read_table(spark, sf_dir, "nation")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@query(
    "q96_large_orders",
    oracle="""
        WITH big AS (
            SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(28,6))) AS total_qty
            FROM lineitem GROUP BY 1
            HAVING SUM(CAST(l_quantity AS DECIMAL(28,6))) > 150
        )
        SELECT c_custkey, o_orderkey,
               CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
               CAST(total_qty AS DOUBLE) AS total_qty
        FROM big
        JOIN orders   ON o_orderkey = l_orderkey
        JOIN customer ON c_custkey = o_custkey
    """,
)
def q96_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: orders whose line quantities sum past a
    threshold, joined back to their customer — the agg-then-join
    pattern. The HAVING prunes the agg output *before* the joins, so
    the join inputs are tiny even when lineitem is 100 TB."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("total_qty_dec"))
        .filter(F.col("total_qty_dec") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            F.col("total_qty_dec").cast("double").alias("total_qty"),
        )
    )


@query(
    "q97_broadcast_udf_lookup",
    oracle="""
        SELECT s_suppkey,
               COALESCE(n_name, 'UNKNOWN') AS nation_name
        FROM supplier LEFT JOIN nation ON s_nationkey = n_nationkey
    """,
)
def q97_broadcast_udf_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-variable state in an Arrow-batched pandas UDF
    (SURVEY.md §2.10): a nation-name lookup dict shipped once per
    executor via ``sc.broadcast``, read from ``bc.value`` inside the
    UDF. The oracle is the equivalent broadcast JOIN — which is also
    the production shape for a pure lookup; the UDF pins the
    per-executor read-only-state plumbing used where Python is
    genuinely required (models, codecs)."""
    from databricks_etl_spark.functions.udfs import make_broadcast_lookup_udf

    n = read_table(spark, sf_dir, "nation")
    mapping = {r.n_nationkey: r.n_name for r in n.collect()}  # 25 rows
    lookup = make_broadcast_lookup_udf(spark, mapping)
    s = read_table(spark, sf_dir, "supplier")
    return s.select("s_suppkey", lookup(F.col("s_nationkey")).alias("nation_name"))


@query(
    "q170_equidepth_histogram",
    oracle="""
        WITH b AS (
            SELECT l_extendedprice,
                   ntile(10) OVER (
                       ORDER BY l_extendedprice, l_orderkey, l_linenumber
                   ) AS bucket
            FROM lineitem
        )
        SELECT CAST(bucket AS BIGINT) AS bucket,
               COUNT(*) AS n_rows,
               MIN(l_extendedprice) AS lo,
               MAX(l_extendedprice) AS hi
        FROM b GROUP BY bucket
    """,
)
def q170_equidepth_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH histogram (equal row count per bucket, data-driven
    boundaries) via ntile — the complement of q99's fixed-width
    equi-WIDTH histogram, and the structure behind optimizer column
    statistics and quantile-bucketed feature binning. The ORDER BY
    carries (orderkey, linenumber) so tied prices land in a
    deterministic bucket; boundary values (per-bucket min/max) are the
    histogram the engine would publish as column stats. Exact ntile
    semantics WITHOUT a global-ordering window: the two-phase
    distributed rank (``operators.quantile_bucket.exact_ntile`` —
    range-partition, parallel per-partition sorts, broadcast offsets)
    is bit-identical to the oracle's ntile, so the hash is unchanged
    from the global-window construction this lane verified with
    through round 11; q247's approx-boundary twin (broadcast
    boundaries + map-side assignment, bracket-gated) remains the
    zero-materialization alternative."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    li = read_table(spark, sf_dir, "lineitem")
    b = exact_ntile(
        li.select("l_extendedprice", "l_orderkey", "l_linenumber"),
        ["l_extendedprice", "l_orderkey", "l_linenumber"],
        10,
        out_col="bucket",
    )
    return b.groupBy(F.col("bucket").cast("long").alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("l_extendedprice").alias("lo"),
        F.max("l_extendedprice").alias("hi"),
    )
