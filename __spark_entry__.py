"""Driver contract for the spark-graft builder (PySpark target).

Thin re-export of the engine's query registry
(:mod:`databricks_etl_spark.plans.registry`). The driver's verify runs
``entry(spark)`` as a smoke check, runs each ``queries()[name]`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_etl_spark.plans import registry as _registry

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Revenue-by-nation: lineitem ⋈ orders ⋈ customer ⋈ broadcast(nation)
    + date filter + grouped decimal-sum + sort (SURVEY.md §7 step 0).
    """
    from databricks_etl_spark.plans.queries_relational import q01_revenue_by_nation

    return q01_revenue_by_nation(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return _registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for
    non-SQL-expressible ops — driver records rows-only)."""
    return _registry.oracle_sql()
