"""Structured Streaming ≡ batch equivalence (SURVEY.md §5.2-2).

The streaming tumbling aggregation (readStream → watermark → window →
memory sink, availableNow) must produce exactly the batch result —
Spark's unified semantics, asserted rather than assumed.
"""

from __future__ import annotations

import pytest

from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.streaming import windows as W

# every test here drains at least one real streaming query
pytestmark = pytest.mark.slow


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_streaming_tumbling_equals_batch(spark, smoke_sf_dir):
    batch = W.tumbling_counts(read_table(spark, smoke_sf_dir, "events"))
    stream = W.run_tumbling_stream(spark, smoke_sf_dir)
    assert _rows(stream) == _rows(batch)
    assert stream.count() > 0


def test_streaming_sliding_equals_batch(spark, smoke_sf_dir):
    batch = W.sliding_counts(read_table(spark, smoke_sf_dir, "events"))
    stream = W.run_windowed_stream(spark, smoke_sf_dir, W.sliding_counts)
    assert _rows(stream) == _rows(batch)


def test_streaming_session_windows_equals_batch(spark, smoke_sf_dir):
    batch = W.session_windows(read_table(spark, smoke_sf_dir, "events"))
    stream = W.run_windowed_stream(spark, smoke_sf_dir, W.session_windows)
    assert _rows(stream) == _rows(batch)


def test_stateful_running_totals_equals_batch(spark, smoke_sf_dir):
    """applyInPandasWithState running totals == batch groupBy agg."""
    from pyspark.sql import functions as F

    from databricks_etl_spark.streaming.stateful import run_running_totals_stream

    stream = run_running_totals_stream(spark, smoke_sf_dir)
    batch = (
        read_table(spark, smoke_sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
    )
    s = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in stream.collect()}
    b = {r["user_id"]: (r["n_events"], round(r["total_value"], 6)) for r in batch.collect()}
    assert s == b


def test_session_window_boundary_semantics(spark):
    """An event at exactly prev_ts + gap MERGES; gap+1s splits."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        (1, base, 1, "a", 1.0, None),
        (1, base + dt.timedelta(minutes=5), 2, "a", 1.0, None),  # == gap → merge
        (2, base, 3, "a", 1.0, None),
        (2, base + dt.timedelta(minutes=5, seconds=1), 4, "a", 1.0, None),  # > gap → split
    ]
    df = spark.createDataFrame(
        [(r[2], r[1], r[0], r[3], r[4], r[5]) for r in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    out = W.session_windows(df, "5 minutes")
    per_user = {r["user_id"]: r for r in out.groupBy("user_id").count().collect()}
    assert per_user[1]["count"] == 1  # merged into one session
    assert per_user[2]["count"] == 2  # split into two sessions


def test_stream_static_join_equals_batch(spark, smoke_sf_dir):
    """Stateless stream-static join must equal the batch join exactly."""
    from pyspark.sql import functions as F

    stream = W.run_stream_static_join(spark, smoke_sf_dir)
    e = read_table(spark, smoke_sf_dir, "events")
    dim = read_table(spark, smoke_sf_dir, "customer").select(
        F.col("c_custkey").alias("user_id"), "c_mktsegment"
    )
    batch = e.join(dim, "user_id").select(
        "event_id", "user_id", "event_type", "c_mktsegment"
    )
    assert _rows(stream) == _rows(batch)


def test_stream_stream_interval_join_equals_batch(spark, smoke_sf_dir):
    """Watermarked stream-stream interval join (click → purchase within
    30 min, same user) must equal the batch interval join."""
    from pyspark.sql import functions as F

    stream = W.run_stream_stream_join(spark, smoke_sf_dir)
    e = read_table(spark, smoke_sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")),
    ).select("user_id", "click_id", "purchase_id")
    assert stream.count() > 0
    assert _rows(stream) == _rows(batch)


def test_stream_stream_left_outer_join_null_frontier(spark, smoke_sf_dir):
    """Left-outer stream-stream join: matched rows equal the batch
    inner join exactly; NULL (no-purchase) rows are emitted exactly
    for unmatched clicks the final watermark has proven dead
    (click_ts + horizon < max_ts - horizon), and never for clicks
    the watermark hasn't passed."""
    import datetime as dt

    from pyspark.sql import functions as F

    out = W.run_stream_stream_left_outer_join(spark, smoke_sf_dir)
    e = read_table(spark, smoke_sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch_inner = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 minutes")),
    ).select("user_id", "click_id", "purchase_id")

    got_matched = {
        (r["user_id"], r["click_id"], r["purchase_id"])
        for r in out.filter(F.col("purchase_id").isNotNull()).collect()
    }
    want_matched = {
        (r["user_id"], r["click_id"], r["purchase_id"]) for r in batch_inner.collect()
    }
    assert got_matched == want_matched

    horizon = dt.timedelta(minutes=30)
    # The global watermark is the MIN over both inputs' watermarks
    # (each = that side's max event time - delay) — the clicks side,
    # not the overall max event, is what trails here.
    max_click = clicks.agg(F.max("click_ts")).first()[0]
    max_purch = purchases.agg(F.max("purchase_ts")).first()[0]
    final_wm = min(max_click, max_purch) - horizon
    matched_click_ids = {c for (_, c, _) in want_matched}
    unmatched = {
        (r["click_id"], r["click_ts"])
        for r in clicks.collect()
        if r["click_id"] not in matched_click_ids
    }
    got_nulls = {
        r["click_id"] for r in out.filter(F.col("purchase_id").isNull()).collect()
    }
    must_emit = {c for (c, ts) in unmatched if ts + horizon < final_wm}
    may_emit = {c for (c, ts) in unmatched}
    assert must_emit, "fixture should have watermark-dead unmatched clicks"
    assert must_emit <= got_nulls, "watermark-dead unmatched clicks missing"
    assert got_nulls <= may_emit, "NULL emitted for a matched or unknown click"


def test_merge_sessions_pure():
    from databricks_etl_spark.streaming.stateful import _merge

    # chain within gap merges; > gap splits; out-of-order input is fine
    got = _merge([(1000, 1000, 1), (1250, 1250, 1), (2000, 2000, 1), (700, 700, 1)])
    assert got == [(700, 1250, 3), (2000, 2000, 1)]
    # an event landing between two stored sessions bridges them
    assert _merge([(0, 100, 2), (700, 900, 3), (400, 400, 1)]) == [(0, 900, 6)]


def test_stateful_sessionize_matches_batch_up_to_watermark(spark, smoke_sf_dir):
    """Sessions emitted by the stateful operator must be EXACTLY the
    batch-computed sessions whose end+gap the final watermark passed:
    equality on (user, start, end, n), nothing extra, nothing closed
    missing."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from databricks_etl_spark.streaming import stateful as ST

    out = ST.run_sessionize_stream(spark, smoke_sf_dir)
    got = {
        (r["user_id"], r["session_start_epoch"], r["session_end_epoch"], r["n_events"])
        for r in out.collect()
    }

    e = read_table(spark, smoke_sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    # The stateful operator discretizes event time to whole epoch
    # seconds (its documented contract), so the batch reference must
    # compute gaps in the same floored-second space — NOT the
    # microsecond-exact interval comparison q80 uses against its oracle.
    prev_s = F.unix_timestamp(F.lag("ts").over(w))
    gap_s = F.unix_timestamp("ts") - prev_s
    g = e.withColumn(
        "new_sess",
        F.when(prev_s.isNull() | (gap_s > ST.SESSION_GAP_S), 1)
        .otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = g.withColumn("sess_id", F.sum("new_sess").over(run))
    batch = s.groupBy("user_id", "sess_id").agg(
        F.unix_timestamp(F.min("ts")).alias("start_s"),
        F.unix_timestamp(F.max("ts")).alias("end_s"),
        F.count(F.lit(1)).alias("n"),
    )
    # NTZ timestamps are epoch-micros interpreted as-if-UTC — the same
    # value Spark derives the watermark from (unix_micros rejects NTZ,
    # so floor to ms driver-side from the collected naive datetime).
    import datetime as dt

    max_ts = e.agg(F.max("ts").alias("m")).first()["m"]
    max_ts_ms = (max_ts - dt.datetime(1970, 1, 1)) // dt.timedelta(milliseconds=1)
    final_wm_ms = max_ts_ms - 300_000  # delay "5 minutes"
    want = {
        (r["user_id"], r["start_s"], r["end_s"], r["n"])
        for r in batch.collect()
        if (r["end_s"] + ST.SESSION_GAP_S) * 1000 <= final_wm_ms
    }
    assert want, "fixture should contain watermark-closed sessions"
    assert got == want


def test_foreachbatch_sink_exactly_once_and_idempotent(spark, smoke_sf_dir, tmp_path):
    """The epoch-partitioned foreachBatch sink: (1) materialized
    latest-per-key counts equal the batch aggregate exactly;
    (2) replaying an epoch (the at-least-once failure mode) leaves
    the materialization unchanged — idempotence, hence exactly-once."""
    from pyspark.sql import functions as F

    from databricks_etl_spark.streaming import sinks as SK

    out = SK.run_foreachbatch_counts(spark, smoke_sf_dir)
    got = {(r["user_id"], r["n_events"]) for r in out.collect()}
    e = read_table(spark, smoke_sf_dir, "events")
    want = {
        (r["user_id"], r["n"])
        for r in e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want

    # idempotent replay: same payload, same epoch, written twice
    path = str(tmp_path / "sink")
    sink = SK.epoch_idempotent_sink(path)
    batch = e.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_events"))
    sink(batch, 7)
    once = sorted(map(tuple, SK.read_latest_per_key(spark, path, ["user_id"]).collect()))
    sink(batch, 7)  # replay
    twice = sorted(map(tuple, SK.read_latest_per_key(spark, path, ["user_id"]).collect()))
    assert once == twice


def test_checkpoint_restart_processes_each_file_once(spark, smoke_sf_dir, tmp_path):
    """Checkpointed file-source stream: a restarted query (same
    checkpoint dir) must pick up ONLY files that arrived after the
    first run — each input row lands in the sink exactly once across
    restarts. This is the recovery half of exactly-once (the sink
    idempotence half is the foreachBatch test)."""
    from pyspark.sql import functions as F

    e = read_table(spark, smoke_sf_dir, "events")
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ckpt"),
    )
    first = e.filter(F.col("event_id") % 2 == 0)
    second = e.filter(F.col("event_id") % 2 == 1)
    first.write.parquet(in_dir)  # batch 1 file(s)

    def run_once():
        stream = (
            spark.readStream.schema(e.schema)
            .parquet(in_dir)
            .select("event_id", "user_id", "event_type")
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run_once()
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == first.count()

    second.write.mode("append").parquet(in_dir)  # new files arrive
    run_once()  # restart from the same checkpoint
    out = spark.read.parquet(out_dir)
    assert out.count() == e.count()  # nothing reprocessed, nothing lost
    assert out.select("event_id").distinct().count() == e.count()


def test_rocksdb_state_store_matches_batch(spark, smoke_sf_dir):
    """The same windowed aggregation, state kept in RocksDB instead of
    the default in-memory HDFS-backed store, must produce the
    identical result — the provider that makes streaming state larger
    than executor memory viable at scale (spill-to-disk, incremental
    checkpoints). Provider is a per-query conf read at stream start,
    so set-and-restore is safe on the shared session."""
    key = "spark.sql.streaming.stateStore.providerClass"
    saved = spark.conf.get(key, None)
    try:
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )
        out = W.run_tumbling_stream(spark, smoke_sf_dir)
        batch = W.tumbling_counts(read_table(spark, smoke_sf_dir, "events"))
        assert _rows(out) == _rows(batch)
    finally:
        if saved is None:
            spark.conf.unset(key)
        else:
            spark.conf.set(key, saved)


def test_transform_with_state_v2_matches_batch(spark, smoke_sf_dir):
    """Spark 4's transformWithStateInPandas lane: the v2 running-totals
    processor must agree exactly with the batch aggregate (and thus
    with the q64 applyInPandasWithState twin, which is oracle-proven
    against the same expression). Skips — never silently passes — when
    the container's protobuf install can't start the TWS driver worker
    (capability gate, streaming/stateful_v2.py)."""
    from databricks_etl_spark.streaming import stateful_v2 as V2

    if not V2.tws_available():
        pytest.skip("transformWithState runner needs google.protobuf (broken in container)")
    from pyspark.sql import functions as F

    out = V2.run_running_totals_v2(spark, smoke_sf_dir)
    e = read_table(spark, smoke_sf_dir, "events")
    batch = e.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        (
            F.sum(F.round(F.col("value") * 1_000_000).cast("long")) / 1_000_000
        ).alias("total_value"),
    )
    assert _rows(out) == _rows(batch)


def test_python_datasource_stream_writer_exactly_once(spark, smoke_sf_dir, tmp_path):
    """Streaming Python DataSource writer: availableNow drain of the
    events table through the pyjsonl stream sink must land every row
    exactly once (batchId-named parts, per-epoch idempotent commit),
    and a RESTART from the same checkpoint must add nothing."""
    import glob
    import os

    from databricks_etl_spark.sources import pydatasource as PDS
    from databricks_etl_spark.streaming.windows import stream_events

    PDS.register(spark)
    out = str(tmp_path / "events_jsonl")
    ckpt = str(tmp_path / "ckpt")

    def drain():
        q = (
            stream_events(spark, smoke_sf_dir)
            .select("event_id", "user_id", "event_type")
            .writeStream.format("pyjsonl")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    drain()
    n_src = read_table(spark, smoke_sf_dir, "events").count()
    back = spark.read.json(out)
    assert back.count() == n_src
    assert back.select("event_id").distinct().count() == n_src
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))
    n_files = len(glob.glob(os.path.join(out, "part-*.jsonl")))

    # restart on the same checkpoint: no new batches, no new rows
    drain()
    assert spark.read.json(out).count() == n_src
    assert len(glob.glob(os.path.join(out, "part-*.jsonl"))) == n_files


def test_python_datasource_stream_reader_offsets(spark, tmp_path):
    """Streaming read side of the Python DataSource connector: the
    seqgen stream drained with availableNow must equal the batch
    seqgen read row-for-row (offset chunking loses/duplicates nothing)
    and must advance in multiple micro-batches."""
    from databricks_etl_spark.sources import pydatasource as PDS

    PDS.register(spark)
    stream = (
        spark.readStream.format("seqgen")
        .option("rows", 1000)
        .option("batchrows", 250)
        .load()
    )
    name = "seqgen_stream_sink"
    q = (
        stream.writeStream.format("memory")
        .queryName(name)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(processingTime="0 seconds")
        .start()
    )
    # the Simple reader serves ONE offset range per trigger (that is
    # its contract — availableNow would stop after the first batch),
    # so run the continuous trigger until all four batches landed
    import time

    deadline = time.time() + 120
    while spark.table(name).count() < 1000 and time.time() < deadline:
        time.sleep(0.5)
    q.stop()
    q.awaitTermination()
    got = spark.table(name)
    batch = (
        spark.read.format("seqgen").option("rows", 1000).load()
    )
    assert got.count() == 1000
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_empty_ingestion_day_drains_zero_rows(spark, tmp_path):
    """An empty input directory (no events file yet) must plan and
    drain cleanly with zero output — the empty-ingestion-day case a
    scheduled pipeline hits on day one, not a plan-time crash."""
    empty_dir = tmp_path / "empty_day"
    empty_dir.mkdir()
    out = W.run_tumbling_stream(spark, str(empty_dir))
    assert out.count() == 0


def test_streaming_fingerprint_dedup_matches_batch(spark, smoke_sf_dir):
    """q254's lane at survivor level: with a watermark spanning the
    whole drain, every distinct content fingerprint survives exactly
    once, each survivor's doc really carries that fingerprint, and
    planted duplicate content collapses to one survivor."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.sources.readers import read_table
    from databricks_etl_spark.streaming import windows as W

    drained = W.run_streaming_fingerprint_dedup(spark, smoke_sf_dir)
    d = read_table(spark, smoke_sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    batch = d.select("doc_id", F.md5(norm).alias("md5_fp"))
    n_distinct = batch.select("md5_fp").distinct().count()
    # one survivor per fingerprint (drain-spanning watermark → no
    # state eviction mid-drain, no re-emits)
    assert drained.count() == n_distinct
    assert drained.select("md5_fp").distinct().count() == n_distinct
    # every survivor (doc_id, fp) pair is genuine
    assert (
        drained.select("doc_id", "md5_fp")
        .join(batch, ["doc_id", "md5_fp"], "left_anti")
        .count()
        == 0
    )


def test_incremental_neardup_epoch_slicing_invariant(spark, tmp_path):
    """The streaming ingest loop's core claim: the drained pair set
    does not depend on micro-batch slicing. Drive make_ingest_epoch by
    hand — once with the whole batch in one epoch, once split into two
    epochs with a planted cross-epoch duplicate pair — and assert both
    runs produce the identical pair set, equal to the one-shot batch
    incremental join."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.operators import text as TX
    from databricks_etl_spark.operators.dedup import incremental_band_join
    from databricks_etl_spark.plans.queries_round4 import _band_buckets
    from databricks_etl_spark.streaming.neardup import make_ingest_epoch

    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (101, "alpha beta gamma delta epsilon zeta eta theta"),  # dup of 1
            (102, "cross epoch duplicate sentence shared by two stream docs"),
            (103, "cross epoch duplicate sentence shared by two stream docs"),
            (104, "totally novel text with nothing in common at all"),
        ],
        "doc_id long, text string",
    )
    corpus_bands = _band_buckets(
        spark, "", shingle_set=TX.shingles(corpus, 3).distinct()
    )

    def drain(slices):
        ix = str(tmp_path / f"ix_{len(slices)}_{slices[0][0]}")
        pr = str(tmp_path / f"pr_{len(slices)}_{slices[0][0]}")
        corpus_bands.withColumn("__epoch", F.lit(-1)).write.mode(
            "overwrite"
        ).partitionBy("__epoch").parquet(ix)
        ingest = make_ingest_epoch(ix, pr)
        for epoch, ids in enumerate(slices):
            ingest(batch.filter(F.col("doc_id").isin(ids)), epoch)
        return {
            (r.id_a, r.id_b): r.n_shared_bands
            for r in spark.read.parquet(pr).collect()
        }

    one_epoch = drain([[101, 102, 103, 104]])
    two_epochs = drain([[101, 102], [103, 104]])  # 102/103 dup split
    # replay idempotency: re-running the LAST epoch (Structured
    # Streaming's at-least-once re-delivery) must not change the pair
    # set — the handler's index read excludes its own epoch partition
    ix = str(tmp_path / "ix_2_101")
    pr = str(tmp_path / "pr_2_101")
    make_ingest_epoch(ix, pr)(batch.filter(F.col("doc_id").isin([103, 104])), 1)
    replayed = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in spark.read.parquet(pr).collect()
    }
    assert replayed == two_epochs
    batch_bands = _band_buckets(
        spark, "", shingle_set=TX.shingles(batch, 3).distinct()
    )
    oneshot = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in incremental_band_join(batch_bands, corpus_bands).collect()
    }
    assert one_epoch == two_epochs == oneshot
    assert (102, 103) in oneshot and (1, 101) in oneshot


def test_streaming_semdedup_epoch_slicing_invariant(spark, tmp_path):
    """The embedding-lane ingest loop's core claim (mirror of the band
    lane's test above): the drained semantic-pair set is invariant to
    micro-batch slicing, including a planted cross-epoch near-dup pair,
    and replaying the last epoch (at-least-once delivery) changes
    nothing."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.operators.similarity import assign_cells
    from databricks_etl_spark.streaming.semdedup import make_semdedup_epoch

    cents = spark.createDataFrame(
        [(0, [1.0, 0.0, 0.0, 0.0]), (1, [0.0, 1.0, 0.0, 0.0])],
        "cid int, centroid array<double>",
    )
    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    batch = spark.createDataFrame(
        [
            (101, [1.0, 0.05, 0.0, 0.0]),   # near-dup of corpus 1
            (102, [0.0, 1.0, 0.05, 0.0]),   # cross-epoch dup pair with 103
            (103, [0.0, 1.0, 0.049, 0.0]),
            (104, [-1.0, 0.0, 0.0, 0.0]),   # novel (anti-parallel to c0)
        ],
        "vec_id long, embedding array<double>",
    )

    def drain(slices, tag):
        ix = str(tmp_path / f"sdix_{tag}")
        pr = str(tmp_path / f"sdpr_{tag}")
        assign_cells(corpus, cents).withColumn("__epoch", F.lit(-1)).write.mode(
            "overwrite"
        ).partitionBy("__epoch").parquet(ix)
        ingest = make_semdedup_epoch(ix, pr, cents, 0.95)
        for epoch, ids in enumerate(slices):
            ingest(batch.filter(F.col("vec_id").isin(ids)), epoch)
        return ix, pr, {
            (r.id_a, r.id_b): r.s for r in spark.read.parquet(pr).collect()
        }

    _, _, one = drain([[101, 102, 103, 104]], "one")
    ix2, pr2, two = drain([[101, 102], [103, 104]], "two")
    assert one == two and len(one) >= 2  # 101-corpus1 and 102-103 found
    assert (102, 103) in one or (103, 102) in one

    # replay idempotency: re-run the LAST epoch; pair set unchanged
    make_semdedup_epoch(ix2, pr2, cents, 0.95)(
        batch.filter(F.col("vec_id").isin([103, 104])), 1
    )
    replayed = {
        (r.id_a, r.id_b): r.s for r in spark.read.parquet(pr2).collect()
    }
    assert replayed == two
