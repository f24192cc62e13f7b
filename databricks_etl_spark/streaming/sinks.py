"""Streaming sinks beyond the built-ins: the ``foreachBatch``
exactly-once materialization pattern.

Structured Streaming's delivery guarantee is at-least-once per
micro-batch into arbitrary sinks; exactly-once requires the sink write
to be IDEMPOTENT in ``epoch_id`` (the engine may re-run a batch after
failure with the same epoch). The standard recipe: partition the
output by epoch and use dynamic partition overwrite, so a replayed
epoch overwrites its own partition instead of appending duplicates —
the same idea a Delta/Iceberg MERGE would implement transactionally.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def epoch_idempotent_sink(path: str) -> Callable[[DataFrame, int], None]:
    """``foreachBatch`` function writing each micro-batch to
    ``path/__epoch=<epoch_id>/`` with dynamic partition overwrite:
    re-delivery of the same epoch replaces, never duplicates. The
    write itself is a normal distributed parquet write (no driver
    collect)."""

    def write(batch_df: DataFrame, epoch_id: int) -> None:
        (
            batch_df.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(path)
        )

    return write


def read_latest_per_key(spark: SparkSession, path: str, keys: list[str]) -> DataFrame:
    """Materialized view over an epoch-partitioned sink: for each key,
    the row from the HIGHEST epoch (update-mode streams re-emit a
    key's row each time it changes; the latest epoch wins).
    Deterministic: epoch is a total order per key and update-mode
    emits at most one row per (key, epoch), so ``max_by(col, __epoch)``
    is tie-free — a hash aggregate with map-side partial combine,
    cheaper than the row_number window (full shuffle + per-key sort)
    it replaces."""
    df = spark.read.parquet(path)
    others = [c for c in df.columns if c not in keys and c != "__epoch"]
    return df.groupBy(*keys).agg(
        *[F.max_by(c, "__epoch").alias(c) for c in others]
    )


def run_foreachbatch_counts(
    spark: SparkSession, sf_dir: str, *, replay_last_epoch: bool = False
) -> DataFrame:
    """Drive a per-user event-count stream through the idempotent
    foreachBatch sink (availableNow), then return the materialized
    latest-per-user counts.

    With ``replay_last_epoch=True``, the highest epoch's exact payload
    is read back from the sink and written AGAIN with the same
    epoch_id before materializing — simulating Structured Streaming's
    at-least-once re-delivery after a failure. Idempotence means the
    materialization is unchanged, so the result stays byte-equal to
    the batch aggregate (q131's DuckDB oracle hash-checks this)."""
    import shutil

    from databricks_etl_spark.sources.writers import scratch_dir
    from databricks_etl_spark.streaming.windows import (
        stream_events,
        stream_shuffle,
    )

    # stable per-(process, sf_dir) path, removed at interpreter exit.
    # Dynamic partition overwrite replaces only matching epochs, so a
    # previous run's stale extra epochs must be cleared up front — each
    # call is self-contained (full availableNow drain + optional replay).
    out = scratch_dir("fbsink_", key=sf_dir)
    shutil.rmtree(out, ignore_errors=True)
    counts = (
        stream_events(spark, sf_dir)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    with stream_shuffle(spark, sf_dir):
        q = (
            counts.writeStream.outputMode("update")
            .foreachBatch(epoch_idempotent_sink(out))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    if replay_last_epoch:
        # the sink's layout contract IS epoch directories — the highest
        # epoch comes from a filesystem listing, not a footer-scan job
        import os

        last = max(
            int(d.split("=", 1)[1])
            for d in os.listdir(out)
            if d.startswith("__epoch=")
        )
        payload = (
            spark.read.parquet(out)
            .filter(F.col("__epoch") == last)
            .drop("__epoch")
        )
        epoch_idempotent_sink(out)(payload, int(last))
    return read_latest_per_key(spark, out, ["user_id"])
