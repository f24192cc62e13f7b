"""Multimodal-column queries: binary payload + typed metadata
(oracled — sha256/octet_length are engine-agnostic), and the
mapInPandas decode/frame-sample pipelines (rows-only; plumbing
asserted in tests/test_multimodal.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import multimodal as MM
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


@query(
    "q56_multimodal_binary_meta",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               sha256(text) AS sha_hex
        FROM documents
        WHERE doc_id < 200
    """,
)
def q56_multimodal_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column ingest metadata: payload bytes + sha256 — the
    typed-metadata half of the multimodal surface, fully JVM-side."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    withbin = MM.attach_binary(d)
    return withbin.select(
        "doc_id",
        F.col("meta.n_bytes").cast("long").alias("n_bytes"),
        F.col("meta.sha256").alias("sha_hex"),
    )


@query("q57_multimodal_decode_features", oracle=None)
def q57_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decode + feature-extract over binary payloads via Arrow-batched
    ``mapInPandas`` (decoder stubbed deterministically — no codecs in
    the container; the batching/schema plumbing is the real thing)."""
    d = read_table(spark, sf_dir, "documents")
    return MM.decode_features(MM.attach_binary(d))


@query("q58_multimodal_frame_sample", oracle=None)
def q58_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame-sampling shape over binary payloads (mapInPandas row
    expansion — a real video sampler emits one row per frame)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return MM.frame_sample(MM.attach_binary(d), every_n_bytes=128)
