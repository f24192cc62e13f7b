"""Query registry — the driver-contract surface.

Every implemented operator from SURVEY.md §2 registers here as a named
query: a PySpark callable ``(spark, sf_dir) -> DataFrame`` plus (when
SQL-expressible) the equivalent ANSI SQL the DuckDB oracle runs on the
same parquet tables. ``__spark_entry__.queries()/oracle_sql()`` simply
re-export this registry.

Cross-engine determinism rules every query follows (SURVEY.md §5):
- alias every computed column identically in Spark and SQL;
- double SUM/AVG go through exact decimal accumulation
  (:mod:`databricks_etl_spark.functions.scalars`) so value hashes are
  row-order independent;
- iterative/approximate ops (KMeans, LSH) register with ``oracle=None``
  → driver records the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QueryDef:
    fn: QueryFn
    oracle: str | None
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, bench: bool = False):
    """Register a query under ``name`` with optional DuckDB oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = QueryDef(fn=fn, oracle=oracle, bench=bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load()
    return {k: v.fn for k, v in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _load()
    return {k: v.oracle for k, v in QUERIES.items() if v.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    _load()
    return {k: v.fn for k, v in QUERIES.items() if v.bench}


_loaded = False


def _load() -> None:
    """Import all query modules (self-registering)."""
    global _loaded
    if _loaded:
        return
    import databricks_etl_spark.plans.queries_relational  # noqa: F401
    import databricks_etl_spark.plans.queries_profile  # noqa: F401

    for optional in (
        "databricks_etl_spark.plans.queries_extended",
        "databricks_etl_spark.plans.queries_olap",
        "databricks_etl_spark.plans.queries_events",
        "databricks_etl_spark.plans.queries_timeseries",
        "databricks_etl_spark.plans.queries_analytics",
        "databricks_etl_spark.plans.queries_text",
        "databricks_etl_spark.plans.queries_dedup",
        "databricks_etl_spark.plans.queries_similarity",
        "databricks_etl_spark.plans.queries_ml",
        "databricks_etl_spark.plans.queries_multimodal",
    ):
        try:
            __import__(optional)
        except ImportError:
            pass
    _loaded = True
