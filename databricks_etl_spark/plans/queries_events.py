"""Event-time window queries over ``events`` (SURVEY.md §2.9).

Batch-mode windowed aggregations with DuckDB ``time_bucket`` /
lag-gap-cumsum oracles, plus a true Structured Streaming run
(rows-only; batch-equivalence asserted in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.streaming import windows as W


@query(
    "q50_tumbling_window",
    oracle="""
        SELECT CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts))) AS BIGINT) AS ws_epoch,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def q50_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time windows (10 min) — ``F.window`` batch mode;
    the identical expression runs as a stream in q53."""
    return W.tumbling_counts(read_table(spark, sf_dir, "events"))


@query(
    "q51_sliding_window",
    oracle="""
        WITH assigned AS (
            SELECT time_bucket(INTERVAL '5 minutes', ts) AS ws, event_type FROM events
            UNION ALL
            SELECT time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes', event_type
            FROM events
        )
        SELECT CAST(floor(epoch(ws)) AS BIGINT) AS ws_epoch,
               event_type,
               COUNT(*) AS n_events
        FROM assigned
        GROUP BY 1, 2
    """,
)
def q51_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (10 min / 5 min hop): every event belongs to two
    windows; the oracle materializes the same assignment with two
    bucket shifts + UNION ALL."""
    return W.sliding_counts(read_table(spark, sf_dir, "events"))


@query(
    "q52_session_windows",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                   ) AS sess_id
            FROM g
        )
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
        FROM s
        GROUP BY user_id, sess_id
    """,
)
def q52_session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user session windows, 5-min inactivity gap
    (``F.session_window``). The oracle re-derives sessions by the
    classic lag-gap-cumsum — two independent implementations must
    agree exactly (boundary semantics: an event at exactly
    prev_ts + gap still MERGES; only a strictly larger gap splits —
    verified against Spark's session_window)."""
    return W.session_windows(read_table(spark, sf_dir, "events"))


_SESSION_ORACLE = """
        WITH g AS (
            SELECT user_id, ts, value,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, ts, value,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                   ) AS sess_id
            FROM g
        )
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS session_value
        FROM s
        GROUP BY user_id, sess_id
"""


@query("q80_sessionize_lag_cumsum", oracle=_SESSION_ORACLE, bench=True)
def q80_sessionize_lag_cumsum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization via lag-gap + running-sum session ids — the
    window-function formulation of q52's ``session_window``. Three
    independent implementations (session_window, this, and the DuckDB
    oracle) must agree exactly."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from databricks_etl_spark.functions.scalars import decimal_sum, gap_exceeds

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    g = e.withColumn(
        "new_sess",
        F.when(prev.isNull() | gap_exceeds("ts", prev, 300), 1).otherwise(0),
    )
    run = Window.partitionBy("user_id").orderBy("ts").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = g.withColumn("sess_id", F.sum("new_sess").over(run))
    return s.groupBy("user_id", "sess_id").agg(
        F.unix_timestamp(F.min("ts")).alias("session_start_epoch"),
        F.count(F.lit(1)).alias("n_events"),
        decimal_sum("value", "session_value"),
    ).drop("sess_id")


@query(
    "q81_inter_event_gaps",
    oracle="""
        WITH gaps AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT)
                       - CAST(floor(epoch(lag(ts) OVER (
                             PARTITION BY user_id ORDER BY ts))) AS BIGINT)
                       AS gap_s
            FROM events
        )
        SELECT user_id,
               COUNT(gap_s) AS n_gaps,
               CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
               CAST(MAX(gap_s) AS BIGINT) AS max_gap_s,
               quantile_cont(gap_s, 0.5) AS median_gap_s
        FROM gaps
        GROUP BY user_id
    """,
)
def q81_inter_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event gap statistics (lag + grouped percentile) —
    the arrival-process profile that sizes session gaps and
    watermarks."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    gaps = e.select(
        "user_id",
        (
            F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
        ).alias("gap_s"),
    )
    return gaps.groupBy("user_id").agg(
        F.count("gap_s").alias("n_gaps"),
        F.min("gap_s").cast("long").alias("min_gap_s"),
        F.max("gap_s").cast("long").alias("max_gap_s"),
        F.expr("percentile(gap_s, 0.5)").alias("median_gap_s"),
    )


@query(
    "q53_streaming_tumbling",
    oracle="""
        SELECT CAST(floor(epoch(time_bucket(INTERVAL '10 minutes', ts))) AS BIGINT) AS ws_epoch,
               event_type,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY 1, 2
    """,
)
def q53_streaming_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE Structured Streaming execution of q50: readStream file
    source → watermark → windowed agg → memory sink, drained with
    ``availableNow``. Complete-mode output is the FULL final result
    table and the drain sees every row (single-file source → the
    watermark never drops data mid-stream), so the materialization
    equals the batch aggregate exactly and q50's DuckDB oracle
    hash-checks the streaming execution itself (q131 pattern). Exact
    batch-equivalence also asserted in tests/test_streaming.py."""
    return W.run_tumbling_stream(spark, sf_dir)


@query(
    "q93_streaming_dedup",
    oracle="""
        SELECT DISTINCT user_id, event_type FROM events
    """,
)
def q93_streaming_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming dedup with bounded state
    (``dropDuplicatesWithinWatermark``): first event per
    (user_id, event_type) within the watermark survives, state evicted
    after — the effectively-once repair stage of a streaming ingest.
    WHICH survivor row emits is arrival-order dependent (and a key may
    re-emit after state eviction), but the drained output's KEY SET is
    exactly the batch distinct — so the materialized distinct keys are
    hash-checked against DuckDB (q131 pattern), proving drain coverage
    and key identity; survivor-level semantics stay asserted in
    tests/test_analytics_invariants.py."""
    return W.run_streaming_dedup(spark, sf_dir).select("user_id", "event_type").distinct()


@query(
    "q100_stream_static_join",
    oracle="""
        SELECT e.event_id, e.user_id, e.event_type, c.c_mktsegment
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
    """,
)
def q100_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming stream-static enrichment join (events stream ⋈
    broadcast customer-segment dim), drained with ``availableNow``.
    Stateless — no watermark or state store involved, so the drained
    materialization is exactly the batch inner join as a SET: the
    DuckDB oracle hash-checks streaming delivery end to end (the q131
    pattern). Exact batch-equivalence also asserted in
    tests/test_streaming.py."""
    return W.run_stream_static_join(spark, sf_dir)


@query(
    "q101_stream_stream_join",
    oracle="""
        WITH clicks AS (
            SELECT user_id, event_id AS click_id, ts AS click_ts
            FROM events WHERE event_type = 'click'
        ),
        purchases AS (
            SELECT user_id AS p_user_id, event_id AS purchase_id,
                   ts AS purchase_ts
            FROM events WHERE event_type = 'purchase'
        )
        SELECT c.user_id, c.click_id, p.purchase_id
        FROM clicks c
        JOIN purchases p
          ON c.user_id = p.p_user_id
         AND p.purchase_ts > c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
    """,
)
def q101_stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream interval join (clicks ⋈ same-user purchases
    within 30 min), both sides watermarked so join state is bounded —
    the attribution-join shape of a streaming pipeline. INNER interval
    joins emit a pair exactly when both rows arrive inside the state
    horizon, and an availableNow drain sees every row, so the
    materialized pairs equal the batch interval join as a set — the
    DuckDB oracle hash-checks the streaming execution (q131 pattern).
    Exact batch-equivalence also asserted in tests/test_streaming.py."""
    return W.run_stream_stream_join(spark, sf_dir)


@query(
    "q161_session_conversion",
    oracle="""
        WITH g AS (
            SELECT user_id, ts, event_type,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR ts - lag(ts) OVER w > INTERVAL '5 minutes'
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ),
        s AS (
            SELECT user_id, event_type,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING
                   ) AS sess_id
            FROM g
        ),
        sess AS (
            SELECT user_id, sess_id,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS converted
            FROM s GROUP BY 1, 2
        )
        SELECT user_id,
               COUNT(*) AS n_sessions,
               CAST(SUM(converted) AS BIGINT) AS n_converting,
               round(CAST(SUM(converted) AS DOUBLE) / COUNT(*), 6) AS conv_rate
        FROM sess GROUP BY user_id
    """,
)
def q161_session_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-level conversion rate: sessionize (the q80 lag-cumsum,
    microsecond-exact gap predicate), flag sessions containing a
    purchase, and roll up per user — the composition (sessionize →
    per-session flag → per-user rate) every product-analytics pipeline
    runs on top of raw events. Window + two aggregations, one user_id
    shuffle end to end (all three steps share the partitioning)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from databricks_etl_spark.functions.scalars import gap_exceeds

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts")
    prev = F.lag("ts").over(w)
    g = e.withColumn(
        "new_sess",
        F.when(prev.isNull() | gap_exceeds("ts", prev, 300), 1).otherwise(0),
    )
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    s = g.withColumn("sess_id", F.sum("new_sess").over(run))
    sess = s.groupBy("user_id", "sess_id").agg(
        F.max(F.when(F.col("event_type") == "purchase", 1).otherwise(0)).alias(
            "converted"
        )
    )
    return sess.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum("converted").cast("long").alias("n_converting"),
        F.round(
            F.sum("converted").cast("double") / F.count(F.lit(1)), 6
        ).alias("conv_rate"),
    )
