from databricks_etl_spark.sources.readers import (  # noqa: F401
    load_latest,
    read_csv_table,
    read_table,
    read_tables,
)
from databricks_etl_spark.sources.schemas import SCHEMAS, schema_for  # noqa: F401
from databricks_etl_spark.sources.writers import write_csv, write_jdbc, write_parquet  # noqa: F401
