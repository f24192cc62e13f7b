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


@query(
    "q57_multimodal_decode_features",
    oracle="""
        WITH d AS (
            SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
            FROM documents WHERE doc_id < 200
        ),
        xs AS (SELECT unnest(range(0, 16)) AS x),
        ys AS (SELECT unnest(range(0, 10)) AS y),
        px AS (
            SELECT doc_id, w, h,
                   (doc_id + 7 * x + 13 * y) % 256 AS r,
                   (2 * doc_id + 5 * x + 11 * y) % 256 AS g,
                   (3 * doc_id + 3 * x + 17 * y) % 256 AS b
            FROM d, xs, ys WHERE x < w AND y < h
        )
        SELECT doc_id,
               CAST(54 + (3 * w + (4 - (3 * w) % 4) % 4) * h AS BIGINT) AS n_bytes,
               CAST(w AS INT) AS width,
               CAST(h AS INT) AS height,
               3 AS channels,
               CAST(SUM(r) AS DOUBLE) / (w * h) AS mean_r,
               CAST(SUM(g) AS DOUBLE) / (w * h) AS mean_g,
               CAST(SUM(b) AS DOUBLE) / (w * h) AS mean_b
        FROM px GROUP BY doc_id, w, h
    """,
)
def q57_multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal decode lane, REAL and hash-checked end to end:
    per-document uncompressed 24-bit BMP payloads (genuine file layout
    — headers, BGR order, bottom-up rows, 4-byte padding) are decoded
    by the pure-Python parser inside Arrow-batched ``mapInPandas``,
    extracting dimensions and exact per-channel means. Pixels are
    closed-form in ``doc_id``, so the DuckDB oracle recomputes the
    expected features arithmetically — a decoder bug (channel-order
    swap, padding off-by-one, row-direction flip) breaks the value
    hash. A deployment swaps ``decode_bmp`` for a JPEG codec; the
    plumbing is identical."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return MM.decode_features(MM.generate_bmp_payloads(d))


@query(
    "q58_multimodal_frame_sample",
    oracle="""
        WITH f AS (
            SELECT doc_id, text,
                   unnest(range(0, greatest(1, length(text)), 128))
                       AS frame_offset
            FROM documents WHERE doc_id < 100
        ),
        c AS (
            SELECT doc_id, frame_offset,
                   substr(text, CAST(frame_offset + 1 AS INT), 128) AS chunk
            FROM f
        )
        SELECT doc_id,
               CAST(frame_offset AS BIGINT) AS frame_offset,
               CAST(length(chunk) AS BIGINT) AS frame_bytes,
               CAST(CAST(COALESCE(list_sum(list_transform(
                        range(1, length(chunk) + 1),
                        i -> ord(substr(chunk, CAST(i AS INT), 1)))), 0)
                    AS BIGINT) % 256 AS INT) AS frame_checksum
        FROM c
    """,
)
def q58_multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1→N frame-sampling shape over binary payloads (mapInPandas row
    expansion — a real video sampler emits one row per frame). The
    payloads are UTF-8 text bytes and the corpus is pure ASCII (byte
    == codepoint, verified at every SF), so each frame's byte-sum
    checksum is recomputable per character in SQL — the expansion
    arithmetic AND the per-frame byte accounting are value-hash-checked
    (previously rows-only on plumbing-test evidence alone)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return MM.frame_sample(MM.attach_binary(d), every_n_bytes=128)


def _q432_register() -> None:
    from databricks_etl_spark.plans.registry import QUERIES

    @query(
        "q432_multimodal_decode_arrow",
        oracle=QUERIES["q57_multimodal_decode_features"].oracle,
    )
    def q432_multimodal_decode_arrow(
        spark: SparkSession, sf_dir: str
    ) -> DataFrame:
        """q57's decode lane on the ``mapInArrow`` path: the same
        pure-Python BMP parser consuming raw Arrow RecordBatches with
        no pandas materialization between transport and codec — for
        binary-heavy multimodal scans the pandas hop copies every
        payload into Python object arrays before the codec ever sees
        it, which at 100 TB is a second full pass over the bytes.
        Registered with q57's OWN closed-form oracle, so the
        Arrow-native path is independently value-hash-proven (not
        just claimed equivalent); the quarantine-by-NULL corrupt-
        payload semantics carry over and are re-tested on this path."""
        d = read_table(spark, sf_dir, "documents").filter(
            F.col("doc_id") < 200
        )
        return MM.decode_features_arrow(MM.generate_bmp_payloads(d))


_q432_register()
