"""Relational-core queries (SURVEY.md §2.2–§2.8) with DuckDB oracles.

Each query exercises one named operator from the inventory, mapped onto
the driver's TPC-H-ish tables. Reference citations sit on each query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import decimal_avg, decimal_sum
from databricks_etl_spark.operators import relational as R
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

# Deterministic stand-in for current_date() (F6 / hard part (b)).
AS_OF_DATE = "2026-01-01"


# ---------------------------------------------------------------------------
# Flagship: 4-way join + filter + grouped agg + sort
# (S1, P1, P5/P9, J3, A2, O1 in one query — SURVEY.md §7 step 0)
# ---------------------------------------------------------------------------
@query(
    "q01_revenue_by_nation",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation   ON c_nationkey = n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1999-01-01'
          AND l_shipdate <  TIMESTAMP '2000-01-01'
        GROUP BY n_name
        ORDER BY revenue DESC
    """,
    bench=True,
)
def q01_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Three-way+ inner equi-join mart (J3, ``pre_analysis.py:702-705``;
    J6 ``transform.py:66``) with grouped revenue agg.

    Scale: lineitem⋈orders is the big shuffle (AQE-planned sort-merge on
    orderkey); customer joins on the post-agg-side stays hash; nation is
    tiny → explicit broadcast eliminates its shuffle entirely.
    """
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1999-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("2000-01-01").cast("timestamp"))
        )
        .join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .orderBy(F.desc("revenue"))
    )


# ---------------------------------------------------------------------------
# Projections / predicates
# ---------------------------------------------------------------------------
@query(
    "q02_projection_prune",
    oracle="SELECT c_custkey, c_name, c_mktsegment FROM customer",
)
def q02_projection_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P1 explicit column prune (``pre_process.py:90-93``) — the scan
    must read only 3 columns (verify: ReadSchema in explain)."""
    return R.project(read_table(spark, sf_dir, "customer"), ["c_custkey", "c_name", "c_mktsegment"])


@query(
    "q03_isin_membership_sort",
    oracle="""
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM orders
        WHERE o_custkey IN (1, 7, 42, 99)
        ORDER BY o_orderkey
    """,
)
def q03_isin_membership_sort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6 membership predicate + O1 sort — the reference's known-bad-key
    spot check (``pre_analysis.py:205-207``: filter isin + sort)."""
    return (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(1, 7, 42, 99))
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
        .sort("o_orderkey")
    )


@query(
    "q04_between_range",
    oracle="""
        SELECT p_brand, COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        FROM part
        WHERE p_size BETWEEN 10 AND 20
        GROUP BY p_brand
    """,
)
def q04_between_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7 range predicate (``col.between(1,9)``, ``pre_analysis.py:265``)."""
    return (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_size").between(10, 20))
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            decimal_sum("p_retailprice", "total_price"),
        )
    )


@query(
    "q05_rlike_regex",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE regexp_matches(c_name, '^Customer#0*1[0-9]{2}$')
    """,
)
def q05_rlike_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 regex predicate (``rlike('^MLB.*$')``, ``pre_analysis.py:238``)."""
    return (
        read_table(spark, sf_dir, "customer")
        .filter(F.col("c_name").rlike("^Customer#0*1[0-9]{2}$"))
        .select("c_custkey", "c_name")
    )


@query(
    "q06_case_when_buckets",
    oracle="""
        SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                    WHEN o_totalprice < 300000 THEN 'mid'
                    ELSE 'high' END AS price_bucket,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM orders
        GROUP BY price_bucket
    """,
)
def q06_case_when_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11 chained when/otherwise bucketing — the reference's age_group /
    activity buckets (``transform.py:95-99,125-133``)."""
    o = read_table(spark, sf_dir, "orders")
    bucket = (
        F.when(F.col("o_totalprice") < 100000, "low")
        .when(F.col("o_totalprice") < 300000, "mid")
        .otherwise("high")
        .alias("price_bucket")
    )
    return o.groupBy(bucket).agg(
        F.count(F.lit(1)).alias("n_orders"),
        decimal_sum("o_totalprice", "total"),
    )


@query(
    "q07_conditional_update",
    oracle="""
        SELECT CASE WHEN p_size < 10 THEN 'SMALL' ELSE p_type END AS p_type_adj,
               COUNT(*) AS n
        FROM part
        GROUP BY p_type_adj
    """,
)
def q07_conditional_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 conditional column overwrite (``pre_process.py:270-276``):
    rewrite the column only where the predicate holds, else keep it."""
    p = read_table(spark, sf_dir, "part").withColumnRenamed("p_type", "p_type_adj")
    p = R.conditional_update(p, "p_type_adj", F.col("p_size") < 10, F.lit("SMALL"))
    return p.groupBy("p_type_adj").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q08_null_branch_update",
    oracle="""
        SELECT COUNT(*) AS n_rows,
               COUNT(status_kept) AS n_kept,
               COUNT(*) - COUNT(status_kept) AS n_nulled
        FROM (
            SELECT CASE WHEN o_totalprice >= 200000 THEN o_orderstatus END AS status_kept
            FROM orders
        )
    """,
)
def q08_null_branch_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P12 implicit-NULL branch: ``when`` without ``otherwise``
    (``pre_process.py:274-276``) NULLs rows failing the keep-condition;
    P5 null predicates count the result (``pre_analysis.py:81``)."""
    o = read_table(spark, sf_dir, "orders").withColumn("status_kept", F.col("o_orderstatus"))
    o = R.conditional_null_out(o, "status_kept", F.col("o_totalprice") >= 200000)
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("status_kept").alias("n_kept"),
        (F.count(F.lit(1)) - F.count("status_kept")).alias("n_nulled"),
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------
@query(
    "q09_dup_key_expansion",
    oracle="""
        WITH heavy AS (
            SELECT o_custkey AS k, COUNT(*) AS n_orders
            FROM orders GROUP BY o_custkey HAVING COUNT(*) > 15
        )
        SELECT o_orderkey, o_custkey, n_orders
        FROM orders JOIN heavy ON o_custkey = heavy.k
        ORDER BY o_orderkey
    """,
)
def q09_dup_key_expansion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1+A5: find over-represented keys (groupBy+HAVING,
    ``pre_analysis.py:199``) and inner-join them back to expand their
    rows (``pre_analysis.py:201``). The heavy-keys side scales with
    |customer|, so no hard broadcast hint — AQE broadcasts it while it
    fits the 64 MB threshold and falls back to shuffle join beyond."""
    o = read_table(spark, sf_dir, "orders")
    heavy = (
        o.groupBy(F.col("o_custkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 15)
    )
    return (
        o.join(heavy, o.o_custkey == heavy.k, "inner")
        .select("o_orderkey", "o_custkey", "n_orders")
        .orderBy("o_orderkey")
    )


@query(
    "q10_left_enrich_counts",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               COALESCE(n_orders, 0) AS n_orders
        FROM customer
        LEFT JOIN (
            SELECT o_custkey, COUNT(*) AS n_orders FROM orders GROUP BY o_custkey
        ) oc ON c_custkey = oc.o_custkey
    """,
)
def q10_left_enrich_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 left-outer enrich with per-key counts + null-impute to 0 —
    the reference's transactions-per-user enrichment
    (``pre_analysis.py:374-377``; ``pre_process.py:250-260``).

    Scale: aggregate-then-join (pre-aggregated small side) instead of
    join-then-aggregate — the shuffle moves counts, not fact rows."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n_orders_raw"))
    return c.join(per_cust, c.c_custkey == per_cust.o_custkey, "left").select(
        "c_custkey",
        "c_mktsegment",
        F.coalesce(F.col("n_orders_raw"), F.lit(0)).alias("n_orders"),
    )


@query(
    "q11_left_anti_delete",
    oracle="""
        SELECT c_custkey, c_name
        FROM customer
        WHERE c_custkey NOT IN (
            SELECT o_custkey FROM orders WHERE o_totalprice > 450000
        )
    """,
)
def q11_left_anti_delete(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 left anti-join delete-by-key (``pre_process.py:168,201,219,
    235``): customers who never placed a 450k+ order (the filtered
    bad-key set keeps the result non-empty at every scale factor)."""
    c = read_table(spark, sf_dir, "customer")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_totalprice") > 450000)
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return R.anti_delete(c, o, "c_custkey").select("c_custkey", "c_name")


@query(
    "q12_left_semi_exists",
    oracle="""
        SELECT c_mktsegment, COUNT(*) AS n_customers
        FROM customer
        WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        GROUP BY c_mktsegment
    """,
)
def q12_left_semi_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI (EXISTS) — engine-added dual of J4 (SURVEY.md §2.3)."""
    c = read_table(spark, sf_dir, "customer")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "F")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return R.semi(c, o, "c_custkey").groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------
@query(
    "q13_grouped_count_having",
    oracle="""
        SELECT o_custkey, COUNT(*) AS n_orders
        FROM orders
        GROUP BY o_custkey
        HAVING COUNT(*) > 12
    """,
)
def q13_grouped_count_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2+A5 grouped count with HAVING-style post-agg filter
    (``pre_analysis.py:199``: ``agg(count).filter(count > 1)``)."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .filter(F.col("n_orders") > 12)
    )


@query(
    "q14_distinct_counts",
    oracle="""
        SELECT COUNT(DISTINCT c_nationkey) AS n_nations,
               COUNT(DISTINCT c_mktsegment) AS n_segments,
               COUNT(*) AS n_rows
        FROM customer
    """,
)
def q14_distinct_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 exact distinct counts (``select(c).distinct().count()``,
    ``pre_analysis.py:144,439-445``) fused into one aggregation. The
    100 TB default is ``approx_count_distinct`` (SURVEY.md §4.3); exact
    kept here for oracle parity."""
    return read_table(spark, sf_dir, "customer").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct("c_mktsegment").alias("n_segments"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@query(
    "q15_value_counts",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n
        FROM orders
        GROUP BY o_orderpriority
        ORDER BY o_orderpriority
    """,
)
def q15_value_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3/A8 frequency table, in-engine (``groupBy('segment').count()``
    ``pre_analysis.py:520``; pandas ``value_counts().sort_index()``
    ``pre_analysis.py:533-536``)."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("o_orderpriority")
    )


@query(
    "q16_tpch_q1_pricing_summary",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_base_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE) AS sum_charge,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_quantity) AS avg_qty,
               CAST(SUM(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / COUNT(l_discount) AS avg_disc,
               COUNT(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    bench=True,
)
def q16_tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2-family stress: the classic pricing-summary aggregation (8 aggs,
    2 group keys). Exercises partial+final hash agg and whole-stage
    codegen on the fact table — the scan+agg throughput headline."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            decimal_sum("l_quantity", "sum_qty"),
            decimal_sum("l_extendedprice", "sum_base_price"),
            decimal_sum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            decimal_sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            decimal_avg("l_quantity", "avg_qty"),
            decimal_avg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Set operations
# ---------------------------------------------------------------------------
@query(
    "q17_union_distinct",
    oracle="""
        SELECT k FROM (
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
            UNION
            SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'O'
        )
    """,
)
def q17_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 column-aligned union + distinct (``pre_analysis.py:434-441``)."""
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("k"))
    return R.union_distinct(a, b)


@query(
    "q18_subtract_except",
    oracle="""
        SELECT c_custkey FROM customer
        EXCEPT
        SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q18_subtract_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO3 ``subtract`` = EXCEPT DISTINCT (``pre_process.py:139``; hard
    part (d) — note it dedups, unlike ``exceptAll``): customers minus
    those with an in-progress ('P') order."""
    c = read_table(spark, sf_dir, "customer").select("c_custkey")
    o = (
        read_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus") == "P")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return R.subtract_rows(c, o)


@query(
    "q19_intersect",
    oracle="""
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'F'
        INTERSECT
        SELECT o_custkey AS k FROM orders WHERE o_orderstatus = 'P'
    """,
)
def q19_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — engine addition for set-op completeness (SURVEY.md
    §2.7: absent from the reference, trivially oracle-checkable)."""
    o = read_table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("k"))
    b = o.filter(F.col("o_orderstatus") == "P").select(F.col("o_custkey").alias("k"))
    return R.intersect_rows(a, b)


@query(
    "q20_distinct_rows",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q20_distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO4 full-row distinct (``dropDuplicates()``, ``pre_process.py:
    52-54``)."""
    return read_table(spark, sf_dir, "customer").select("c_nationkey", "c_mktsegment").distinct()


# ---------------------------------------------------------------------------
# Windows / sorts / top-k
# ---------------------------------------------------------------------------
@query(
    "q21_window_lag_serial_check",
    oracle="""
        WITH lagged AS (
            SELECT l_orderkey, l_linenumber,
                   lag(l_linenumber, 1) OVER (
                       PARTITION BY l_orderkey ORDER BY l_linenumber
                   ) AS prev_ln
            FROM lineitem
        )
        SELECT l_orderkey,
               COUNT(*) AS n_lines,
               CAST(SUM(CASE WHEN prev_ln IS NOT NULL AND l_linenumber - prev_ln <> 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
        FROM lagged
        GROUP BY l_orderkey
        HAVING n_gaps > 0
        ORDER BY l_orderkey
    """,
)
def q21_window_lag_serial_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1 ``lag`` serial-ness check (``check_c0``, ``pre_analysis.py:
    224-231``) — **partitioned** variant: the reference's unpartitioned
    ``Window.orderBy`` collapses to one task (SURVEY.md §4.1 anti-
    pattern); partitioning by ``l_orderkey`` keeps it parallel at any
    scale while checking the same serial property per group."""
    li = read_table(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    lagged = li.select(
        "l_orderkey",
        "l_linenumber",
        F.lag("l_linenumber", 1).over(w).alias("prev_ln"),
    )
    return (
        lagged.groupBy("l_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(
                F.when(
                    F.col("prev_ln").isNotNull() & (F.col("l_linenumber") - F.col("prev_ln") != 1),
                    1,
                ).otherwise(0)
            ).alias("n_gaps"),
        )
        .filter(F.col("n_gaps") > 0)
        .orderBy("l_orderkey")
    )


@query(
    "q22_dedup_keep_first",
    oracle="""
        SELECT l_orderkey, l_linenumber, l_partkey FROM (
            SELECT l_orderkey, l_linenumber, l_partkey,
                   row_number() OVER (
                       PARTITION BY l_orderkey
                       ORDER BY l_linenumber, l_partkey
                   ) AS rn
            FROM lineitem
        ) WHERE rn = 1
    """,
)
def q22_dedup_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic keyed dedup via row_number (replaces the
    nondeterministic ``dropDuplicates(['user_id'])``,
    ``pre_process.py:52-54``; SURVEY.md §2.5 note / hard part (c))."""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_partkey")
    return R.dedup_keep_first(li, ["l_orderkey"], ["l_linenumber", "l_partkey"])


@query(
    "q23_topk_orders",
    oracle="""
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 25
    """,
)
def q23_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1+O2 top-k with a total order (tiebreak on key). Spark plans
    TakeOrderedAndProject — per-partition heaps, no global sort
    (SURVEY.md §2.6: engine-added ORDER BY ... LIMIT)."""
    o = read_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey", "o_totalprice")
    return R.topk(o, [F.desc("o_totalprice"), F.asc("o_orderkey")], 25)


# ---------------------------------------------------------------------------
# Scalar functions (dates, epoch, arithmetic, JSON extension)
# ---------------------------------------------------------------------------
@query(
    "q24_date_functions",
    oracle=f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS order_year,
               COUNT(*) AS n_orders,
               CAST(MIN(weekofyear(o_orderdate)) AS BIGINT) AS min_week,
               CAST(MAX(date_diff('day', CAST(o_orderdate AS DATE), DATE '{AS_OF_DATE}')) AS BIGINT)
                   AS max_days_since
        FROM orders
        GROUP BY order_year
        ORDER BY order_year
    """,
)
def q24_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1–F7: to_date/year/weekofyear/datediff with the deterministic
    ``as_of_date`` replacing ``current_date()`` (``transform.py:93,
    144,155``; hard part (b))."""
    o = read_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.year("o_orderdate").cast("long").alias("order_year"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.weekofyear("o_orderdate")).cast("long").alias("min_week"),
            F.max(
                F.datediff(F.lit(AS_OF_DATE).cast("date"), F.to_date("o_orderdate"))
            )
            .cast("long")
            .alias("max_days_since"),
        )
        .orderBy("order_year")
    )


@query(
    "q25_greatest_latest_date",
    oracle="""
        SELECT o_orderkey,
               CAST(greatest(CAST(o_orderdate AS DATE), last_ship) AS TIMESTAMP) AS latest_dt
        FROM orders
        JOIN (
            SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS last_ship
            FROM lineitem GROUP BY l_orderkey
        ) ls ON o_orderkey = l_orderkey
        WHERE o_orderkey < 500
        ORDER BY o_orderkey
    """,
)
def q25_greatest_latest_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F8 row-wise ``greatest`` over date columns (``transform.py:155``:
    latest of five activity dates)."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 500)
    ls = (
        read_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max(F.to_date("l_shipdate")).alias("last_ship"))
    )
    return (
        o.join(ls, o.o_orderkey == ls.l_orderkey)
        .select(
            "o_orderkey",
            F.greatest(F.to_date("o_orderdate"), F.col("last_ship"))
            .cast("timestamp")
            .alias("latest_dt"),
        )
        .orderBy("o_orderkey")
    )


@query(
    "q26_unix_timestamp_epoch",
    oracle="""
        SELECT event_type,
               MIN(CAST(floor(epoch(ts)) AS BIGINT)) AS min_epoch,
               MAX(CAST(floor(epoch(ts)) AS BIGINT)) AS max_epoch,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q26_unix_timestamp_epoch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F3 ``unix_timestamp`` numeric date encoding (``pre_analysis.py:
    647,662-665,687`` — used there to feed correlation)."""
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(
            F.min(F.unix_timestamp("ts")).alias("min_epoch"),
            F.max(F.unix_timestamp("ts")).alias("max_epoch"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "q27_json_extract",
    oracle="""
        SELECT event_type,
               CAST(MIN(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS min_k,
               CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS max_k,
               COUNT(*) AS n
        FROM events
        GROUP BY event_type
        ORDER BY event_type
    """,
)
def q27_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON props extraction (extension surface noted in SURVEY.md §2.8:
    the testdata ``events.props`` JSON string via ``get_json_object``)."""
    e = read_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.min(k).cast("long").alias("min_k"),
            F.max(k).cast("long").alias("max_k"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("event_type")
    )


@query(
    "q28_column_arithmetic",
    oracle="""
        SELECT l_orderkey,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                             - l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS adj_delta
        FROM lineitem
        WHERE l_orderkey < 200
        GROUP BY l_orderkey
        ORDER BY l_orderkey
    """,
)
def q28_column_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F12 native column arithmetic (``pre_analysis.py:228,82``)."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 200)
    delta = F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")) - F.col(
        "l_extendedprice"
    )
    return (
        li.groupBy("l_orderkey")
        .agg(decimal_sum(delta, "adj_delta"))
        .orderBy("l_orderkey")
    )


# ---------------------------------------------------------------------------
# Grouping-set extensions (engine additions; Catalyst executes these as a
# single expand+agg — cheaper than N separate scans at 100 TB)
# ---------------------------------------------------------------------------
@query(
    "q29_rollup",
    oracle="""
        SELECT l_returnflag, l_linestatus,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
)
def q29_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals — one scan, expand-based (engine addition;
    the reference computes level totals with separate count() actions)."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"), decimal_sum("l_quantity", "qty")
    )


@query(
    "q30_pivot",
    oracle="""
        SELECT l_returnflag,
               CAST(SUM(CAST(CASE WHEN l_linestatus = 'O' THEN l_quantity END
                             AS DECIMAL(28,6))) AS DOUBLE) AS qty_O,
               CAST(SUM(CAST(CASE WHEN l_linestatus = 'F' THEN l_quantity END
                             AS DECIMAL(28,6))) AS DOUBLE) AS qty_F
        FROM lineitem
        GROUP BY l_returnflag
    """,
)
def q30_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT with an explicit value list (engine addition — implicit
    pivot would need an extra distinct-scan to discover values)."""
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double"))
        .withColumnRenamed("O", "qty_O")
        .withColumnRenamed("F", "qty_F")
    )
