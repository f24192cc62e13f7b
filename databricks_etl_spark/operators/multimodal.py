"""Multimodal columns (north-star extension, SURVEY.md §2.12):
image/audio/video as opaque ``binary`` columns + typed metadata, with
decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` operators.

The container has no image/audio codecs, so the decode step is STUBBED
(deterministic fake derived from the bytes, clearly marked); the
Spark-side plumbing — schema, partition-parallel batch iteration, UDF
signatures, binary handling — is real and tested
(tests/test_multimodal.py).

Scale notes: binary payloads ride in the same parquet row-groups;
``spark.sql.files.maxPartitionBytes`` bounds per-task memory;
mapInPandas streams Arrow batches, never materializing a partition.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_AVAILABLE = False  # no codec libs in this container


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal ingest: payload as ``binary`` + typed
    metadata (size, sha256, declared modality). JVM-side only."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn("payload", payload).withColumn(
        "meta",
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
            F.lit("image/fake").alias("content_type"),
        ),
    )


# 8 fake "pixel statistics" per payload — deterministic in the bytes.
_DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, channels int, "
    "mean_r double, mean_g double, mean_b double"
)


def _fake_decode(payload: bytes) -> tuple[int, int, int, float, float, float]:
    """Deterministic stand-in for an image decoder. A real deployment
    replaces this one function (e.g. PIL/torchvision) — everything
    around it (batching, schema, partitioning) is production-shaped."""
    if DECODE_AVAILABLE:  # pragma: no cover
        raise NotImplementedError("real codec path not available in this container")
    n = len(payload)
    width = 16 + n % 64
    height = 16 + (n // 64) % 64
    samp = payload[:300]
    s = [0, 0, 0]
    for i, b in enumerate(samp):
        s[i % 3] += b
    denom = max(1, len(samp) // 3)
    return width, height, 3, s[0] / denom / 255.0, s[1] / denom / 255.0, s[2] / denom / 255.0


def decode_features(df: DataFrame) -> DataFrame:
    """Decode + feature-extract over the binary column via
    ``mapInPandas`` (Arrow batch iterator — the per-partition custom
    operator shape; no row-at-a-time Python)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [_fake_decode(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                feats,
                columns=["width", "height", "channels", "mean_r", "mean_g", "mean_b"],
            )
            out.insert(0, "n_bytes", [len(p) for p in pdf["payload"]])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return df.select("doc_id", "payload").mapInPandas(op, _DECODE_SCHEMA)


def frame_sample(df: DataFrame, every_n_bytes: int = 1024) -> DataFrame:
    """'Video frame sampling' stub: emit one row per sampled offset of
    each payload — demonstrates the 1→N mapInPandas expansion shape
    (a real frame sampler yields one row per decoded frame)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for off in range(0, max(1, len(payload)), every_n_bytes):
                    chunk = payload[off : off + every_n_bytes]
                    rows.append((doc_id, off, len(chunk), sum(chunk) % 256))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_offset", "frame_bytes", "frame_checksum"]
            )

    return df.select("doc_id", "payload").mapInPandas(
        op, "doc_id long, frame_offset long, frame_bytes long, frame_checksum int"
    )
