from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from databricks_etl_spark.session import get_spark
from databricks_etl_spark.sources.schemas import SCHEMAS

TESTDATA = os.environ.get("SPARK_GRAFT_TESTDATA", "/root/testdata")
# Parity tests default to the driver's correctness SF (0.01).
PARITY_SF_DIR = os.environ.get("SPARK_GRAFT_PARITY_SF_DIR", os.path.join(TESTDATA, "sf0.01"))
SMOKE_SF_DIR = os.path.join(TESTDATA, "sf0.001")


@pytest.fixture(scope="session")
def spark():
    spark = get_spark("databricks_etl_spark_tests")
    yield spark


@pytest.fixture(scope="session")
def duck():
    """DuckDB connection with the same parquet tables registered as
    views — mimics the driver's oracle environment."""
    con = duckdb.connect()
    for name in SCHEMAS:
        path = os.path.join(PARITY_SF_DIR, f"{name}.parquet")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


@pytest.fixture(scope="session")
def sf_dir() -> str:
    return PARITY_SF_DIR


@pytest.fixture(scope="session")
def smoke_sf_dir() -> str:
    return SMOKE_SF_DIR
