"""Streaming table-statistics maintenance: q433's ANALYZE surface
kept current AT INGEST — the Delta add-file-stats discipline.

Every micro-batch is a "written file"; its per-column stats partial
(count, non-null count, min, max — all fully ASSOCIATIVE) lands in the
epoch-idempotent sink (dynamic partition overwrite by epoch, so a
replayed epoch overwrites its own partition — exactly-once), and the
drain merges file stats to exact table stats: sum the counts, min the
mins, max the maxes. This is precisely how a lakehouse table format
keeps query-planner stats fresh without ever rescanning history: the
log carries per-file stats, the table stats are their fold.

NDV is deliberately absent: distinct counts are NOT associative, so
the streaming path cannot maintain them exactly — the batch lane
(q433) owns exact NDV and the HLL ladder (q143) owns the mergeable
approximation. Stating which stats survive the partial/merge split is
the point of the lane.

Reference: no counterpart (the reference notebooks are batch-only);
extends the engine's streaming surface (SURVEY.md §2.9).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_PARTIAL_SCHEMA = (
    "column_name string, n long, nn long, mn double, mx double, __epoch int"
)

# (published column name, the stats expression over the events batch)
_STAT_COLS: list[tuple[str, str]] = [
    ("event_id", "CAST(event_id AS DOUBLE)"),
    ("user_id", "CAST(user_id AS DOUBLE)"),
    ("value", "CAST(value AS DOUBLE)"),
    # epoch seconds (floored) — the unix_timestamp ↔ floor(epoch())
    # cross-engine pair (q428's convention; NTZ is not double-castable)
    ("ts_epoch", "CAST(unix_timestamp(ts) AS DOUBLE)"),
]


def make_stats_epoch(partials_path: str):
    """``foreachBatch`` handler: fold the batch to one stats partial
    row per column and land them under the batch's epoch partition."""

    def ingest(batch_df: DataFrame, epoch_id: int) -> None:
        aggs = [F.count(F.lit(1)).alias("__n")]
        for name, expr in _STAT_COLS:
            c = F.expr(expr)
            aggs += [
                F.count(c).alias(f"{name}__nn"),
                F.min(c).alias(f"{name}__mn"),
                F.max(c).alias(f"{name}__mx"),
            ]
        row = batch_df.agg(*aggs)
        parts = None
        for name, _ in _STAT_COLS:
            p = row.select(
                F.lit(name).alias("column_name"),
                F.col("__n").alias("n"),
                F.col(f"{name}__nn").alias("nn"),
                F.col(f"{name}__mn").alias("mn"),
                F.col(f"{name}__mx").alias("mx"),
            )
            parts = p if parts is None else parts.unionByName(p)
        (
            parts.withColumn("__epoch", F.lit(int(epoch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__epoch")
            .parquet(partials_path)
        )

    return ingest


def drain_table_stats(spark: SparkSession, partials_path: str) -> DataFrame:
    """Merge the accumulated per-epoch file stats into table stats —
    the associative fold (sum / sum / min / max) per column."""
    partials = spark.read.schema(_PARTIAL_SCHEMA).parquet(partials_path)
    return (
        partials.groupBy("column_name")
        .agg(
            F.sum("n").cast("long").alias("n_rows"),
            (F.sum("n") - F.sum("nn")).cast("long").alias("n_null"),
            F.min("mn").alias("min_val"),
            F.max("mx").alias("max_val"),
        )
    )


def run_streaming_table_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Drive stats maintenance end to end with availableNow over the
    events table and return the drained table stats."""
    from databricks_etl_spark.sources.writers import scratch_dir
    from databricks_etl_spark.streaming.windows import stream_events

    partials_path = scratch_dir("tablestats_partials_", key=sf_dir)
    shutil.rmtree(partials_path, ignore_errors=True)
    (
        spark.createDataFrame([], _PARTIAL_SCHEMA)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "static")
        .partitionBy("__epoch")
        .parquet(partials_path)
    )
    from databricks_etl_spark.streaming.windows import stream_shuffle

    with stream_shuffle(spark, sf_dir, tables=("events",)):
        q = (
            stream_events(spark, sf_dir)
            .writeStream.foreachBatch(make_stats_epoch(partials_path))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return drain_table_stats(spark, partials_path)
