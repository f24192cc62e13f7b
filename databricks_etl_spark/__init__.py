"""databricks_etl_spark — a PySpark-native analytics engine.

Re-implements, Spark-first, the query / data-processing capability
surface of the reference ETL pipeline (``gbaliarda/databricks-etl``:
``pre_analysis.py`` / ``pre_process.py`` / ``transform.py``), plus the
large-scale training-data-pipeline extensions (dedup, similarity
search, multimodal columns, text analysis, streaming windows).

Design rules (see SURVEY.md §4):
- DataFrame/SQL only; no RDDs; declare plans, let Catalyst optimize.
- Single-pass fused aggregations instead of per-column job loops.
- Deterministic, oracle-checkable semantics (``as_of_date`` params,
  ``row_number``-based dedup, decimal-sum for float-stable aggregates).
- Built-in ``pyspark.sql.functions`` on the hot path; Arrow-batched
  Pandas UDFs only where built-ins can't express the semantics.
"""

__version__ = "0.1.0"

from databricks_etl_spark.session import get_spark  # noqa: F401
