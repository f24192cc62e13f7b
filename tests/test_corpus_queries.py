"""Targeted corpus-query edge cases the sf testdata doesn't contain.

q166's divergence risk (ADVICE r3): a digit run longer than 18 chars
overflows BIGINT → try_cast NULL, and DuckDB's ``list_distinct``
removes NULLs while Spark's ``array_distinct`` keeps one. The query
drops NULLs symmetrically before the distinct count; this test plants
a 30-digit token (absent from every sf) and runs the full Spark-vs-
DuckDB parity on a synthetic documents table to lock the fix.
"""

from __future__ import annotations

import duckdb
import pandas as pd

from databricks_etl_spark.plans.registry import QUERIES, _load
from tests.test_oracle_parity import assert_frames_match

_load()


def _synth_documents(tmp_path, rows):
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(len(rows))),
            "text": rows,
            "lang": ["en"] * len(rows),
            "source": ["src0"] * len(rows),
            "n_chars": [len(t) if t is not None else 0 for t in rows],
        }
    )
    pdf["doc_id"] = pdf["doc_id"].astype("int64")
    pdf["n_chars"] = pdf["n_chars"].astype("int64")
    path = tmp_path / "documents.parquet"
    pdf.to_parquet(path)
    return str(tmp_path), str(path)


def test_q166_overflow_token_parity(spark, tmp_path):
    rows = [
        "pay 123456789012345678901234567890 now",  # 30 digits → NULL cast
        "ids 42 42 7 and 123456789012345678901234567890 again "
        "999999999999999999999999999999",  # two distinct overflow runs + dups
        "no digits here",
        None,
        "edge 9223372036854775807 max and 9223372036854775808 overflow",
    ]
    sf_dir, parquet = _synth_documents(tmp_path, rows)
    qd = QUERIES["q166_regexp_extract_all"]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{parquet}')")
    duck_pdf = con.execute(qd.oracle).fetchdf()
    con.close()
    assert_frames_match(spark_pdf, duck_pdf, "q166_overflow")
    # the 30-digit rows really exercised the NULL path
    by_id = spark_pdf.set_index("doc_id")
    assert by_id.loc[0, "n_numbers"] == 1
    assert by_id.loc[0, "n_distinct_numbers"] == 0  # only an overflowed token
    assert pd.isna(by_id.loc[0, "max_number"])
    assert by_id.loc[1, "n_numbers"] == 5
    assert by_id.loc[1, "n_distinct_numbers"] == 2  # 42, 7 (overflows dropped)
