"""Execution-behavior tests: seeded sampling determinism, foreachBatch
exactly-once-style sink, AQE skew-join handling."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.streaming.windows import stream_events, tumbling_counts


def test_seeded_sample_deterministic(spark, sf_dir):
    """Seeded TABLESAMPLE. API footgun (verified): positional
    ``sample(0.01, seed=42)`` silently DROPS the seed — the float fills
    the ``withReplacement`` slot and reseeds randomly per call; only
    the explicit-kwargs form is reproducible."""
    o = read_table(spark, sf_dir, "orders")
    s1 = sorted(
        r["o_orderkey"]
        for r in o.sample(withReplacement=False, fraction=0.01, seed=42).collect()
    )
    s2 = sorted(
        r["o_orderkey"]
        for r in o.sample(withReplacement=False, fraction=0.01, seed=42).collect()
    )
    assert s1 == s2 and len(s1) > 0


@pytest.mark.slow
def test_foreach_batch_sink(spark, smoke_sf_dir, tmp_path):
    """foreachBatch: the exactly-once sink pattern — each micro-batch
    lands as one parquet write keyed by batch id."""
    out = str(tmp_path / "fb")

    def sink(df, epoch_id: int) -> None:
        df.write.mode("overwrite").parquet(f"{out}/batch={epoch_id}")

    agg = tumbling_counts(stream_events(spark, smoke_sf_dir).withWatermark("ts", "30 minutes"))
    q = agg.writeStream.outputMode("complete").foreachBatch(sink).trigger(
        availableNow=True
    ).start()
    q.awaitTermination()
    assert os.listdir(out), "foreachBatch wrote nothing"
    back = spark.read.parquet(f"{out}/batch=*")
    batch = tumbling_counts(read_table(spark, smoke_sf_dir, "events"))
    assert back.count() == batch.count()


def test_aqe_handles_skewed_join(spark):
    """A 200k-row hot key joins correctly with AQE skew handling on
    (the engine's default); result equality is the contract, the
    executed plan shows the adaptive rewrite."""
    hot = spark.range(200_000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
    rest = spark.range(1_000).select((F.col("id") % 100).alias("k"), F.col("id").alias("v"))
    left = hot.union(rest)
    right = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
    j = left.join(right, "k")
    n = j.count()
    expected = 200_000 + rest.join(right, "k").count()
    assert n == expected


def test_aqe_skew_split_actually_fires(spark):
    """PROVE the AQE skew-join split, not just survive skew: force a
    sort-merge join (merge hint + broadcast disabled — at test scale
    Catalyst would otherwise broadcast the dim, which is skew-immune
    and proves nothing) and lower the skew thresholds to test scale;
    the FINAL adaptive plan must carry ``SortMergeJoin(skew=true)``
    with an ``AQEShuffleRead skewed`` feeding it, and the result must
    equal the unskewed-join answer. This is the runtime behavior
    q147_skew_stress_join relies on at cluster scale, where the dim
    exceeds the broadcast threshold and the hot partition exceeds the
    default 256MB skew threshold."""
    tuned = {
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in tuned}
    try:
        for k, v in tuned.items():
            spark.conf.set(k, v)
        hot = spark.range(300_000).select(F.lit(7).alias("k"), F.col("id").alias("v"))
        rest = spark.range(1_000).select(
            (F.col("id") % 100).alias("k"), F.col("id").alias("v")
        )
        right = spark.range(100).select(F.col("id").alias("k"), F.lit("x").alias("tag"))
        j = hot.union(rest).join(right.hint("merge"), "k")
        # collect() the join itself: count() would execute a different
        # plan tree and leave this one unadapted (isFinalPlan=false)
        assert len(j.collect()) == 301_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
