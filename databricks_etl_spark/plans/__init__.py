from databricks_etl_spark.plans.registry import QUERIES, QueryDef, oracle_sql, queries  # noqa: F401
