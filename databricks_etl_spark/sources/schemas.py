"""Schema registry — explicit StructTypes declared up front.

The reference reads CSV with no schema and no ``inferSchema``, so every
column is a string, re-cast at each use-site (``pre_analysis.py:36-38``,
casts at ``pre_analysis.py:225,246,253`` etc.). SURVEY.md §1.4 replaces
that with a schema registry: types are imposed exactly once at ingest,
and malformed values become NULL there (cast semantics preserved).

Two schema families:

1. The driver's TPC-H-ish testdata tables (parquet, already typed —
   schemas here document and pin the contract; ``read_table`` verifies).
2. The reference's own three tables (``bt_users_transactions``,
   ``lk_onboarding``, ``lk_users`` — columns per ``pre_analysis.py:114,
   118,122``) as *ingest* (all-string, like the reference's reads) and
   *normalized* (typed) variants, used by the cleaning-pipeline parity
   tests.
"""

from __future__ import annotations

from pyspark.sql import types as T

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

# Reference-shaped tables (SURVEY.md §1.1) — ingest arrives stringly,
# exactly like the reference's schemaless CSV reads; NORMALIZED is the
# post-ingest typed contract (SURVEY.md §1.4).
_STR = T.StringType()

REFERENCE_INGEST: dict[str, T.StructType] = {
    "bt_users_transactions": T.StructType(
        [T.StructField(c, _STR) for c in ["_c0", "user_id", "transaction_dt", "type", "segment"]]
    ),
    "lk_onboarding": T.StructType(
        [
            T.StructField(c, _STR)
            for c in [
                "_c0",
                "Unnamed: 0",
                "first_login_dt",
                "week_year",
                "user_id",
                "habito",
                "habito_dt",
                "activacion",
                "activacion_dt",
                "setup",
                "setup_dt",
                "return",
                "return_dt",
            ]
        ]
    ),
    "lk_users": T.StructType(
        [
            T.StructField(c, _STR)
            for c in [
                "_c0",
                "user_id",
                "name",
                "email",
                "address",
                "birth_dt",
                "phone",
                "type",
                "rubro",
            ]
        ]
    ),
}

REFERENCE_NORMALIZED: dict[str, T.StructType] = {
    "bt_users_transactions": T.StructType(
        [
            T.StructField("_c0", T.IntegerType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("transaction_dt", T.TimestampType()),
            T.StructField("type", T.IntegerType()),
            T.StructField("segment", T.IntegerType()),
        ]
    ),
    "lk_onboarding": T.StructType(
        [
            T.StructField("_c0", T.IntegerType()),
            T.StructField("Unnamed: 0", T.IntegerType()),
            T.StructField("first_login_dt", T.TimestampType()),
            T.StructField("week_year", T.IntegerType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("habito", T.IntegerType()),
            T.StructField("habito_dt", T.DateType()),
            T.StructField("activacion", T.IntegerType()),
            T.StructField("activacion_dt", T.DateType()),
            T.StructField("setup", T.IntegerType()),
            T.StructField("setup_dt", T.DateType()),
            T.StructField("return", T.IntegerType()),
            T.StructField("return_dt", T.DateType()),
        ]
    ),
    "lk_users": T.StructType(
        [
            T.StructField("_c0", T.IntegerType()),
            T.StructField("user_id", T.StringType()),
            T.StructField("name", T.StringType()),
            T.StructField("email", T.StringType()),
            T.StructField("address", T.StringType()),
            T.StructField("birth_dt", T.DateType()),
            T.StructField("phone", T.StringType()),
            T.StructField("type", T.IntegerType()),
            T.StructField("rubro", T.DoubleType()),
        ]
    ),
}


def schema_for(name: str) -> T.StructType:
    return SCHEMAS[name]
