"""Remaining classic TPC-H query shapes (Q4/Q5/Q6/Q8/Q9/Q11/Q12/Q13/
Q14/Q15/Q17/Q19/Q22 analogues) adapted to the testdata star schema —
completing the OLAP-composition surface started in queries_olap.py
(Q1/Q3/Q7/Q10/Q18 are q16/q73/q94/q95/q96).

Adaptations (the testdata schema is a slim TPC-H: no partsupp, no
l_commitdate/l_shipmode, no c_phone): date-lag predicates replace
commit/receipt lags, supplier acctbal replaces partsupp stock value,
nations replace phone prefixes. Every query keeps the *plan shape*
the original exercises — semi-join EXISTS, scalar-subquery HAVING,
disjunctive pushdown, correlated-avg join, argmax-equality — which is
what matters for the engine surface.

Determinism: money aggregates via decimal_sum/decimal_avg (exact,
order-independent); every division rounded to 6dp on both engines;
dates compared as timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import decimal_sum
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_VOL = "CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))"


def _vol() -> F.Column:
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


@query(
    "q102_filtered_revenue",
    oracle="""
        SELECT CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)
                   AS revenue,
               COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
    """,
)
def q102_filtered_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: forecast-revenue-change — a pure filter + global
    aggregate. The whole predicate (date range, discount band,
    quantity cap) pushes into the parquet scan; the aggregate is one
    partial+final pass with no shuffle beyond the 1-row exchange.
    The simplest query that proves predicate pushdown end-to-end."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        & (F.col("l_discount").between(0.05, 0.07))
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        decimal_sum(F.col("l_extendedprice") * F.col("l_discount"), "revenue"),
        F.count(F.lit(1)).alias("n_items"),
    )


@query(
    "q103_order_priority_exists",
    oracle="""
        SELECT o_orderpriority, COUNT(*) AS n_orders
        FROM orders o
        WHERE o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1997-07-01'
          AND EXISTS (
              SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate >= o.o_orderdate + INTERVAL 90 DAY
          )
        GROUP BY o_orderpriority
    """,
)
def q103_order_priority_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: priority counts of orders with at least one
    slow line (shipped ≥90 days after ordering; the schema has no
    commitdate, so order→ship lag is the lateness predicate). EXISTS
    compiles to a LEFT SEMI hash join on the order key — the probe
    side deduplicates, never multiplies rows, and the date filter
    prunes the orders scan first."""
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-07-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    slow = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")),
        "left_semi",
    )
    return slow.groupBy("o_orderpriority").agg(F.count(F.lit(1)).alias("n_orders"))


@query(
    "q104_local_supplier_volume",
    oracle=f"""
        SELECT n_name,
               CAST(SUM({_VOL}) AS DOUBLE) AS revenue
        FROM customer
        JOIN orders   ON c_custkey = o_custkey
        JOIN lineitem ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
        JOIN nation   ON c_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'ASIA'
          AND o_orderdate >= TIMESTAMP '1997-01-01'
          AND o_orderdate <  TIMESTAMP '1998-01-01'
        GROUP BY n_name
    """,
)
def q104_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 proper: revenue from *local* supply chains (supplier
    and customer share a nation) in one region-year. The extra
    equality ``s_nationkey = c_nationkey`` rides on the broadcast
    supplier join — no new shuffle; orders⋈lineitem stays the single
    big sort-merge and every dim broadcasts."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = read_table(spark, sf_dir, "lineitem")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey) & (s.s_nationkey == c.c_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(decimal_sum(_vol(), "revenue"))
    )


@query(
    "q105_market_share",
    oracle=f"""
        WITH all_vol AS (
            SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
                   CAST({_VOL} AS DECIMAL(28,6)) AS volume,
                   sn.n_name AS supp_nation
            FROM lineitem
            JOIN orders   ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation cn ON c_nationkey = cn.n_nationkey
            JOIN region   ON cn.n_regionkey = r_regionkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation sn ON s_nationkey = sn.n_nationkey
            JOIN part     ON l_partkey = p_partkey
            WHERE r_name = 'AMERICA' AND p_type = 'ECONOMY'
        )
        SELECT o_year,
               round(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                                   ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                     / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
        FROM all_vol
        GROUP BY o_year
    """,
)
def q105_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8: a nation's share of ECONOMY-part revenue sold into
    AMERICA, by order year — the conditional-aggregate-over-join
    shape. All dims broadcast; the share is a ratio of two exact
    decimal sums computed in ONE aggregate pass (no second scan, no
    self-join), rounded identically on both engines."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    r = read_table(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA")
    s = read_table(spark, sf_dir, "supplier")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "ECONOMY")
    cn = n.select(F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_rkey"))
    sn = n.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    vol = F.col("__vol")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(r), F.col("cn_rkey") == r.r_regionkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(p, li.l_partkey == p.p_partkey)
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _vol().cast("decimal(28,6)").alias("__vol"),
            "supp_nation",
        )
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(
                        F.lit(0).cast("decimal(28,6)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


@query(
    "q106_product_type_profit",
    oracle="""
        SELECT n_name AS nation,
               CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                             - 0.1 * p_retailprice * l_quantity
                             AS DECIMAL(28,6))) AS DOUBLE) AS profit
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN orders   ON l_orderkey = o_orderkey
        WHERE p_type = 'STANDARD'
        GROUP BY 1, 2
    """,
)
def q106_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape: profit (revenue minus a retail-price-derived
    cost proxy — the schema has no partsupp supplycost) on STANDARD
    parts by supplier nation × order year. part/supplier/nation
    broadcast; lineitem⋈orders is the one big join; the profit
    expression folds into a single decimal sum."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    profit = _vol() - 0.1 * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(o, li.l_orderkey == o.o_orderkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(decimal_sum(profit, "profit"))
    )


@query(
    "q107_late_shipment_priority",
    oracle="""
        SELECT l_linestatus,
               CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
               CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                        THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        WHERE l_shipdate >= o_orderdate + INTERVAL 90 DAY
          AND l_shipdate >= TIMESTAMP '1997-01-01'
          AND l_shipdate <  TIMESTAMP '1998-01-01'
        GROUP BY l_linestatus
    """,
)
def q107_late_shipment_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: late shipments (≥90-day order→ship lag; the
    schema has no shipmode/commitdate) split into high/low-priority
    case-counts per line status. The join keys are the shuffle keys;
    both case-sums fold into one aggregate pass."""
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o.o_orderkey == li.l_orderkey)
        .filter(F.col("l_shipdate") >= F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS"))
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@query(
    "q108_order_count_distribution",
    oracle="""
        SELECT c_count, COUNT(*) AS custdist
        FROM (
            SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN orders ON c_custkey = o_custkey
            GROUP BY c_custkey
        )
        GROUP BY c_count
    """,
)
def q108_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13: the order-count histogram — left join (customers
    with zero orders count as 0), per-customer count, then a second
    tiny aggregate over the counts. The first agg shuffles on the
    customer key; the histogram agg touches ~max-orders rows."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@query(
    "q109_promo_revenue",
    oracle=f"""
        SELECT round(
                   100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO' THEN {_VOL}
                                         ELSE CAST(0 AS DECIMAL(28,6)) END) AS DOUBLE)
                   / CAST(SUM({_VOL}) AS DOUBLE), 6) AS promo_revenue_pct
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1997-03-01'
          AND l_shipdate <  TIMESTAMP '1997-04-01'
    """,
)
def q109_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14: percent of one month's revenue from PROMO parts —
    conditional share in a single aggregate pass; part broadcasts;
    the month filter prunes the lineitem scan."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = read_table(spark, sf_dir, "part")
    vol = _vol().cast("decimal(28,6)")
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .agg(
            F.round(
                100.0
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol).otherwise(
                        F.lit(0).cast("decimal(28,6)")
                    )
                ).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("promo_revenue_pct")
        )
    )


@query(
    "q110_top_supplier",
    oracle=f"""
        WITH rev AS (
            SELECT l_suppkey AS supplier_no,
                   CAST(SUM({_VOL}) AS DOUBLE) AS total_revenue
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1997-04-01'
            GROUP BY 1
        )
        SELECT s_suppkey, s_name, total_revenue
        FROM rev JOIN supplier ON supplier_no = s_suppkey
        WHERE total_revenue = (SELECT MAX(total_revenue) FROM rev)
    """,
)
def q110_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15: supplier(s) hitting the quarter's max revenue — the
    argmax-against-scalar-subquery shape. The per-supplier aggregate
    is computed once and reused for both the max (1-row broadcast)
    and the equality filter; exact decimal sums make the double
    equality deterministic across engines (the reason Q15's
    revenue-equality join is safe here)."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        decimal_sum(_vol(), "total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("__mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("__mx"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


@query(
    "q111_national_acctbal_threshold",
    oracle="""
        SELECT n_name,
               CAST(SUM(CAST(s_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS nation_balance
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        GROUP BY n_name
        HAVING SUM(CAST(s_acctbal AS DECIMAL(28,6)))
               > (SELECT 0.05 * SUM(CAST(s_acctbal AS DECIMAL(28,6))) FROM supplier)
    """,
)
def q111_national_acctbal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: per-nation supplier balance kept only when it
    exceeds a fraction of the GLOBAL balance (scalar-subquery HAVING;
    supplier acctbal stands in for partsupp stock value). The global
    total is a 1-row aggregate broadcast into the filter — two passes
    over an already-aggregated tiny table, not two fact scans."""
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    bal = F.sum(F.col("s_acctbal").cast("decimal(28,6)"))
    per_nation = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(bal.alias("__bal_dec"))
    )
    total = s.agg((bal * 0.05).alias("__thresh"))
    return (
        per_nation.crossJoin(F.broadcast(total))
        .filter(F.col("__bal_dec") > F.col("__thresh"))
        .select("n_name", F.col("__bal_dec").cast("double").alias("nation_balance"))
    )


@query(
    "q112_small_qty_revenue",
    oracle="""
        SELECT round(CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)
                     / 7.0, 6) AS avg_yearly
        FROM lineitem
        JOIN part ON p_partkey = l_partkey
        JOIN (
            SELECT l_partkey AS a_partkey,
                   CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                       / COUNT(l_quantity) AS avg_qty
            FROM lineitem GROUP BY 1
        ) a ON a_partkey = l_partkey
        WHERE p_brand = 'Brand#13' AND l_quantity < 0.2 * avg_qty
    """,
)
def q112_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17: revenue lost to small-quantity orders — the
    correlated-average shape, decorrelated into an aggregate + equi-
    join back on the part key (what Catalyst/DuckDB both do). The
    per-part average is exact (decimal sum / count) so the 0.2×avg
    threshold compares identically across engines."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#13")
    avg_qty = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
            / F.count("l_quantity")
        ).alias("avg_qty")
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .join(avg_qty, li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double")
                / 7.0,
                6,
            ).alias("avg_yearly")
        )
    )


@query(
    "q113_disjunctive_revenue",
    oracle=f"""
        SELECT CAST(SUM({_VOL}) AS DOUBLE) AS revenue, COUNT(*) AS n_items
        FROM lineitem JOIN part ON p_partkey = l_partkey
        WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
               AND l_quantity BETWEEN 1 AND 20)
           OR (p_brand = 'Brand#2' AND p_size BETWEEN 10 AND 30
               AND l_quantity BETWEEN 10 AND 40)
    """,
)
def q113_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: revenue under OR'd (brand, size, quantity)
    predicate groups — the disjunctive-pushdown test. Single-table
    parts of each disjunct (brand/size vs quantity) still push to
    their scans as an OR filter; the join stays a broadcast hash
    join, not a nested loop (asserted in plan tests)."""
    li = read_table(spark, sf_dir, "lineitem")
    p = read_table(spark, sf_dir, "part")
    cond = (
        (F.col("p_brand") == "Brand#1")
        & F.col("p_size").between(1, 15)
        & F.col("l_quantity").between(1, 20)
    ) | (
        (F.col("p_brand") == "Brand#2")
        & F.col("p_size").between(10, 30)
        & F.col("l_quantity").between(10, 40)
    )
    return (
        li.join(p, li.l_partkey == p.p_partkey)
        .filter(cond)
        .agg(decimal_sum(_vol(), "revenue"), F.count(F.lit(1)).alias("n_items"))
    )


@query(
    "q114_idle_rich_customers",
    oracle="""
        WITH avg_bal AS (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                       / COUNT(c_acctbal) AS a
            FROM customer WHERE c_acctbal > 0.0
        )
        SELECT n_name,
               COUNT(*) AS numcust,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE) AS totacctbal
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        WHERE c_acctbal > (SELECT a FROM avg_bal)
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        GROUP BY n_name
    """,
)
def q114_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: above-average-balance customers with no
    orders, counted per nation (nations stand in for phone prefixes).
    The scalar average broadcasts into the filter; NOT EXISTS is a
    LEFT ANTI join on the customer key — at scale the anti join
    shuffles only keys, and the positive-balance filter prunes
    first."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders").select("o_custkey")
    n = read_table(spark, sf_dir, "nation")
    avg_bal = c.filter(F.col("c_acctbal") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(28,6)")).cast("double")
            / F.count("c_acctbal")
        ).alias("__avg")
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(28,6)"))
            .cast("double")
            .alias("totacctbal"),
        )
    )


@query(
    "q119_min_cost_supplier",
    bench=True,
    oracle=f"""
        WITH cost AS (
            SELECT l_partkey, l_suppkey, {_VOL} AS cost
            FROM lineitem
        ),
        mn AS (
            SELECT l_partkey, MIN(cost) AS min_cost
            FROM cost GROUP BY 1
        )
        SELECT DISTINCT p_partkey, p_brand, s_suppkey, s_name, n_name,
               CAST(min_cost AS DOUBLE) AS min_cost
        FROM part
        JOIN mn   ON p_partkey = mn.l_partkey
        JOIN cost ON cost.l_partkey = p_partkey AND cost.cost = min_cost
        JOIN supplier ON cost.l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_type = 'LARGE' AND p_size BETWEEN 10 AND 20
    """,
)
def q119_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape: for each qualifying part, the supplier(s) who
    sold it at the minimum discounted price — the correlated-scalar-
    subquery-on-MIN pattern, compiled as aggregate-then-equality-
    join-back (the same decomposition Catalyst's RewriteCorrelated
    ScalarSubquery performs). The schema has no partsupp, so the
    observed discounted sale price plays supplycost. Determinism:
    the min and the join-back equality are on exact DECIMAL(28,6)
    values (double equality after exact decimal min is safe); ties
    on the min keep EVERY tied supplier (hence DISTINCT), which is
    set-stable with no arbitrary pick. Scale: the QUALIFYING-part
    broadcast semi-filters lineitem BEFORE the min aggregate (min is
    per-part, so restricting parts first is lossless — measured ~2×
    at sf0.1, and the selectivity factor at 100 TB); the per-part min
    is an unordered MIN window over the one partkey shuffle, so the
    filtered lineitem is scanned ONCE and exchanged ONCE (the former
    aggregate-then-equality-join-back scanned it twice and exchanged
    three times — r16 plan diff in plans/r16/); supplier / nation
    broadcast."""
    from pyspark.sql import Window

    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_type") == "LARGE") & F.col("p_size").between(10, 20)
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    cost = (
        read_table(spark, sf_dir, "lineitem")
        .select("l_partkey", "l_suppkey", _vol().cast("decimal(28,6)").alias("cost"))
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
    )
    return (
        cost.withColumn(
            "min_cost", F.min("cost").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("cost") == F.col("min_cost"))
        .join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_suppkey",
            "s_name",
            "n_name",
            F.col("min_cost").cast("double").alias("min_cost"),
        )
        .distinct()
    )


@query(
    "q120_supplier_part_counts",
    oracle="""
        SELECT p_brand, p_type, p_size,
               COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5'
          AND p_size IN (1, 9, 19, 25, 36, 45)
          AND l_suppkey NOT IN (
              SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
          )
        GROUP BY p_brand, p_type, p_size
    """,
)
def q120_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape: distinct-supplier counts per part group,
    excluding a NOT-IN subquery of suppliers (negative balance stands
    in for the complaints LIKE — same plan shape: the exclusion list
    is a broadcast LEFT ANTI join, never a shuffle). The grouped
    COUNT(DISTINCT) partial-aggregates per (group, suppkey) before
    the final count, so the shuffle carries deduplicated pairs."""
    li = read_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    part = read_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5")
        & F.col("p_size").isin(1, 9, 19, 25, 36, 45)
    )
    bad = read_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(bad, li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(part, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@query(
    "q121_concentrated_suppliers",
    oracle="""
        WITH sp AS (
            SELECT l_suppkey, l_partkey,
                   SUM(CAST(l_quantity AS DECIMAL(28,6))) AS qty
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1997-01-01'
              AND l_shipdate <  TIMESTAMP '1998-01-01'
            GROUP BY 1, 2
        ),
        p AS (
            SELECT l_partkey AS pk,
                   SUM(qty) AS total_qty,
                   COUNT(*) AS n_suppliers
            FROM sp GROUP BY 1
        )
        SELECT DISTINCT s_suppkey, s_name, n_name
        FROM supplier
        JOIN nation ON s_nationkey = n_nationkey
        WHERE EXISTS (
            SELECT 1 FROM sp JOIN p ON sp.l_partkey = p.pk
            WHERE sp.l_suppkey = s_suppkey
              AND sp.qty * p.n_suppliers > 3 * p.total_qty
        )
    """,
)
def q121_concentrated_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who dominate the 1997 supply of some
    part — the nested-aggregate EXISTS (per-(supplier,part) aggregate
    compared against a per-part aggregate, then a semi join up to the
    supplier). The availqty comparison becomes "this supplier moved
    >3× the per-supplier average for the part", cross-multiplied
    (qty·n > 3·total) so both sides stay exact decimals — no
    division, no float compare. Scale: two map-combinable aggregates
    sharing the partkey shuffle, then a keys-only semi join."""
    li = read_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    s = read_table(spark, sf_dir, "supplier")
    n = read_table(spark, sf_dir, "nation")
    sp = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).alias("qty")
    )
    p = sp.groupBy("l_partkey").agg(
        F.sum("qty").alias("total_qty"), F.count(F.lit(1)).alias("n_suppliers")
    )
    dominant = (
        sp.join(p, ["l_partkey"])
        .filter(F.col("qty") * F.col("n_suppliers") > F.lit(3) * F.col("total_qty"))
        .select("l_suppkey")
        .distinct()
    )
    return (
        s.join(dominant, s.s_suppkey == dominant.l_suppkey, "left_semi")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )


@query(
    "q122_waiting_orders",
    oracle="""
        SELECT s_name, COUNT(*) AS numwait
        FROM supplier, lineitem l1, orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (
              SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey
          )
          AND NOT EXISTS (
              SELECT 1 FROM lineitem l3, orders o3
              WHERE l3.l_orderkey = l1.l_orderkey
                AND o3.o_orderkey = l3.l_orderkey
                AND l3.l_suppkey <> l1.l_suppkey
                AND l3.l_shipdate > o3.o_orderdate + INTERVAL 60 DAY
          )
        GROUP BY s_name
    """,
)
def q122_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape: suppliers who were the SOLE late shipper on a
    finished multi-supplier order — the EXISTS + NOT-EXISTS pair on
    the same relation (semi join then anti join on the order key,
    both with a supplier-inequality residual). Lateness is ship-lag
    >60 days (schema has no receipt/commit dates). Scale: all three
    lineitem legs share the orderkey shuffle key, so AQE plans them
    as one exchange reused three times; the anti join carries only
    (orderkey, suppkey) pairs."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = read_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey", "o_orderdate")
    s = read_table(spark, sf_dir, "supplier")
    late = li.join(o, li.l_orderkey == o.o_orderkey).filter(
        F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    )
    l1 = late.select("l_orderkey", "l_suppkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_suppkey").alias("s2")
    )
    l3 = late.select(
        F.col("l_orderkey").alias("o3"), F.col("l_suppkey").alias("s3")
    )
    sole_late = (
        l1.join(
            l2,
            (F.col("l_orderkey") == F.col("o2")) & (F.col("l_suppkey") != F.col("s2")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l_orderkey") == F.col("o3")) & (F.col("l_suppkey") != F.col("s3")),
            "left_anti",
        )
    )
    return (
        sole_late.join(s, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
