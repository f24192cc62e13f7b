from databricks_etl_spark.functions.scalars import (  # noqa: F401
    day_diff,
    decimal_avg,
    decimal_sum,
    latest_of,
    normalize_cast,
    years_since,
)
