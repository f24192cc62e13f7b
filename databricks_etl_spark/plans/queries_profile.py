"""Data-quality profile queries (EP1 parity, SURVEY.md §2.4 A6–A11).

Each runs the fused single-pass profile operators
(:mod:`databricks_etl_spark.operators.profile`) against the testdata
tables, with DuckDB oracles written as per-column UNION ALL — the
oracle may loop; the engine must not (one scan for all columns).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import profile as P
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


def _enriched_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer ⟕ first-order-date: produces genuine NULLs (customers
    with no orders) so completeness has something to measure."""
    c = read_table(spark, sf_dir, "customer")
    o = (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.min("o_orderdate").alias("first_order"))
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left").select(
        "c_custkey", "c_mktsegment", "first_order"
    )


_ENRICHED_SQL = """
    SELECT c_custkey, c_mktsegment, first_order
    FROM customer
    LEFT JOIN (
        SELECT o_custkey, MIN(o_orderdate) AS first_order
        FROM orders GROUP BY o_custkey
    ) oc ON c_custkey = oc.o_custkey
"""


@query(
    "q31_profile_completeness",
    oracle=f"""
        WITH t AS ({_ENRICHED_SQL})
        SELECT 'c_custkey' AS "column",
               100.0 * COUNT(c_custkey) / COUNT(*) AS pct_complete FROM t
        UNION ALL
        SELECT 'c_mktsegment', 100.0 * COUNT(c_mktsegment) / COUNT(*) FROM t
        UNION ALL
        SELECT 'first_order', 100.0 * COUNT(first_order) / COUNT(*) FROM t
    """,
)
def q31_profile_completeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 per-column % non-null, fused to ONE job for all columns
    (vs. the reference's filter+count per column,
    ``pre_analysis.py:75-85``)."""
    return P.completeness(_enriched_customer(spark, sf_dir))


@query(
    "q32_profile_uniqueness",
    oracle="""
        SELECT 'o_orderkey' AS "column",
               100.0 * COUNT(DISTINCT o_orderkey) / COUNT(*) AS pct_unique FROM orders
        UNION ALL
        SELECT 'o_custkey', 100.0 * COUNT(DISTINCT o_custkey) / COUNT(*) FROM orders
        UNION ALL
        SELECT 'o_orderstatus', 100.0 * COUNT(DISTINCT o_orderstatus) / COUNT(*) FROM orders
    """,
)
def q32_profile_uniqueness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10 per-column distinct %, one pass (vs. ``pre_analysis.py:
    139-149`` loop)."""
    o = read_table(spark, sf_dir, "orders")
    return P.uniqueness(o, ["o_orderkey", "o_custkey", "o_orderstatus"])


@query(
    "q33_profile_integrity",
    oracle="""
        SELECT 'o_orderstatus' AS "column",
               100.0 * SUM(CASE WHEN o_orderstatus IN ('O','F','P') THEN 1 ELSE 0 END)
                     / COUNT(o_orderstatus) AS pct_valid
        FROM orders
        UNION ALL
        SELECT 'o_totalprice',
               100.0 * SUM(CASE WHEN o_totalprice > 0 THEN 1 ELSE 0 END)
                     / COUNT(o_totalprice)
        FROM orders
        UNION ALL
        SELECT 'o_orderdate',
               100.0 * SUM(CASE WHEN o_orderdate BETWEEN TIMESTAMP '1995-01-01'
                                                     AND TIMESTAMP '2005-12-31'
                                THEN 1 ELSE 0 END)
                     / COUNT(o_orderdate)
        FROM orders
    """,
)
def q33_profile_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11 integrity family (``check_type``/``check_segment``/
    ``check_date_column``..., ``pre_analysis.py:236-295``) — all checks
    in one conditional aggregation over one scan."""
    o = read_table(spark, sf_dir, "orders")
    return P.integrity(
        o,
        {
            "o_orderstatus": F.col("o_orderstatus").isin("O", "F", "P"),
            "o_totalprice": F.col("o_totalprice") > 0,
            "o_orderdate": F.col("o_orderdate").between("1995-01-01", "2005-12-31"),
        },
    )


@query(
    "q34_profile_summary_stats",
    oracle="""
        SELECT 'l_quantity' AS "column", COUNT(l_quantity) AS n,
               round(AVG(l_quantity), 4) AS mean,
               round(stddev_samp(l_quantity), 4) AS std,
               CAST(MIN(l_quantity) AS DOUBLE) AS min,
               CAST(MAX(l_quantity) AS DOUBLE) AS max
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', COUNT(l_discount),
               round(AVG(l_discount), 4), round(stddev_samp(l_discount), 4),
               CAST(MIN(l_discount) AS DOUBLE), CAST(MAX(l_discount) AS DOUBLE)
        FROM lineitem
    """,
)
def q34_profile_summary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6 ``describe()`` as typed aggregation (``pre_analysis.py:
    765-767``). mean/std rounded to 4dp on both sides — accumulation
    order across engines differs in the last ulp."""
    li = read_table(spark, sf_dir, "lineitem")
    stats = P.summary_stats(li, ["l_quantity", "l_discount"])
    return stats.select(
        "column",
        "n",
        F.round("mean", 4).alias("mean"),
        F.round("std", 4).alias("std"),
        "min",
        "max",
    )


@query(
    "q35_profile_correlation",
    oracle="""
        SELECT 'l_quantity' AS col_x, 'l_extendedprice' AS col_y,
               round(corr(l_quantity, l_extendedprice), 6) AS corr
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity', 'l_discount',
               round(corr(l_quantity, l_discount), 6)
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', 'l_discount',
               round(corr(l_extendedprice, l_discount), 6)
        FROM lineitem
    """,
)
def q35_profile_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A7 pairwise Pearson correlation computed IN Spark, one scan —
    the reference collects raw columns to pandas first
    (``pre_analysis.py:653,678,693,711``), a driver OOM at 100 TB."""
    li = read_table(spark, sf_dir, "lineitem")
    pairs = P.correlation_pairs(li, ["l_quantity", "l_extendedprice", "l_discount"])
    return pairs.select("col_x", "col_y", F.round("corr", 6).alias("corr"))
