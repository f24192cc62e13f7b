"""Time-series / distribution queries (north-star extensions beyond the
reference's single ``lag`` window, SURVEY.md §2.5 note + §2.12).

Adds the window shapes a time-series / training-data pipeline needs that
the reference lacks entirely (its only window is the unpartitioned
serial-check lag, ``pre_analysis.py:224-231``):

- RANGE-frame rolling aggregates (moving average over a value-based
  frame, not a row-count frame);
- hypertable-style multi-resolution rollups (same fact aggregated at
  hour + day grain, stacked with a ``resolution`` discriminator);
- BPE-ish regex token counting over ``documents`` (the token-budget
  estimator shape: whitespace tokens vs sub-word-ish regex tokens);
- distribution windows (``ntile`` / ``cume_dist`` / ``percent_rank``).

All oracle-paired; determinism per README (decimal accumulation, epoch
seconds for bucket starts, explicit tiebreakers in every ORDER BY).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import MONEY
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


@query(
    "q85_rolling_avg_range_frame",
    oracle="""
        WITH daily AS (
            SELECT CAST(datediff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS day_num,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev_dec
            FROM orders
            GROUP BY 1
        )
        SELECT day_num,
               CAST(rev_dec AS DOUBLE) AS revenue,
               round(CAST(SUM(rev_dec) OVER w AS DOUBLE)
                     / COUNT(*) OVER w, 6) AS avg_7d,
               CAST(COUNT(*) OVER w AS BIGINT) AS days_in_frame
        FROM daily
        WINDOW w AS (ORDER BY day_num RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
    """,
)
def q85_rolling_avg_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """7-day rolling average revenue via a RANGE window frame.

    RANGE (value-based) frames differ from ROWS frames when days are
    missing: a gap day shrinks the frame, which ``rangeBetween(-6, 0)``
    over an epoch-day key models exactly (the q59 running-sum query
    covers the ROWS case). Determinism: the per-day revenue stays
    DECIMAL(28,6) *through the window sum* and is cast to double only at
    the end, so the fold is order-independent in both engines.

    Scale: grain is the calendar day, so the unpartitioned ORDER BY has
    bounded cardinality (~2.5k rows for 7 years of TPC-H dates) no
    matter how large ``orders`` is — the heavy lifting is the daily
    pre-aggregation, which is an ordinary partial+final hash agg.
    """
    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(
        F.datediff(F.to_date("o_orderdate"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("day_num")
    ).agg(F.sum(F.col("o_totalprice").cast(MONEY)).alias("rev_dec"))
    w = Window.orderBy("day_num").rangeBetween(-6, 0)
    return daily.select(
        "day_num",
        F.col("rev_dec").cast("double").alias("revenue"),
        F.round(
            F.sum("rev_dec").over(w).cast("double") / F.count(F.lit(1)).over(w), 6
        ).alias("avg_7d"),
        F.count(F.lit(1)).over(w).cast("long").alias("days_in_frame"),
    )


@query(
    "q86_multires_rollup",
    oracle="""
        SELECT 'hour' AS resolution,
               CAST(floor(epoch(date_trunc('hour', ts))) AS BIGINT) AS bucket_epoch,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 2
        UNION ALL
        SELECT 'day' AS resolution,
               CAST(floor(epoch(date_trunc('day', ts))) AS BIGINT) AS bucket_epoch,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events GROUP BY 2
    """,
)
def q86_multires_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style multi-resolution rollup: the ``events`` fact
    aggregated at hour and day grain in one result, discriminated by a
    ``resolution`` column (the continuous-aggregate / downsampling shape
    of time-series stores).

    Scale: each grain is an independent partial+final hash agg over the
    same scan; Spark reuses the exchange where possible and the coarse
    grains are strictly smaller, so cost ≈ one scan + the finest-grain
    shuffle. Bucket starts are epoch seconds (BIGINT) per the README
    cross-engine rule.
    """
    e = read_table(spark, sf_dir, "events")

    def grain(res: str) -> DataFrame:
        return e.groupBy(
            F.unix_timestamp(F.date_trunc(res, F.col("ts"))).alias("bucket_epoch")
        ).agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast(MONEY)).cast("double").alias("total_value"),
        ).select(F.lit(res).alias("resolution"), "bucket_epoch", "n_events", "total_value")

    return grain("hour").unionByName(grain("day"))


# GPT-2-ish pre-tokenizer, reduced to ASCII classes that mean the same
# thing in Java regex (Spark) and RE2 (DuckDB): letter runs, single
# digits, or a single non-alnum-non-space symbol.
_BPE_RE = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]"


@query(
    "q87_bpe_regex_tokens",
    oracle=f"""
        SELECT doc_id,
               CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT) AS n_ws_tokens,
               CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS BIGINT) AS n_bpe_tokens,
               round(CAST(len(regexp_extract_all(text, '{_BPE_RE}')) AS DOUBLE)
                     / length(text), 6) AS bpe_per_char
        FROM documents
        WHERE doc_id < 500
    """,
)
def q87_bpe_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget estimation: whitespace token count vs a BPE-ish
    regex pre-tokenizer (letter runs / digits / single symbols — the
    GPT-2 pre-tokenizer shape reduced to engine-portable ASCII classes).
    ``n_bpe_tokens`` upper-bounds the sub-word token count, the usual
    cheap estimator when sizing a pre-training corpus in tokens.

    One scan, pure JVM expressions (``regexp_extract_all``), no UDF.
    """
    from databricks_etl_spark.operators.text import token_count

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    n_bpe = F.size(F.regexp_extract_all(F.col("text"), F.lit(_BPE_RE), 0))
    return d.select(
        "doc_id",
        token_count("text").cast("long").alias("n_ws_tokens"),
        n_bpe.cast("long").alias("n_bpe_tokens"),
        F.round(n_bpe.cast("double") / F.length("text"), 6).alias("bpe_per_char"),
    )


@query(
    "q88_distribution_windows",
    oracle="""
        SELECT c_custkey,
               c_mktsegment,
               CAST(ntile(4) OVER w AS BIGINT) AS balance_quartile,
               round(cume_dist() OVER w, 6) AS cum_frac,
               round(percent_rank() OVER w, 6) AS pct_rank
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def q88_distribution_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution/ranking windows the reference lacks: per-segment
    account-balance quartiles (``ntile``), cumulative fraction
    (``cume_dist``) and relative rank (``percent_rank``).

    Determinism: the ORDER BY carries ``c_custkey`` as an explicit
    unique tiebreaker, which makes all three functions total-order
    deterministic in both engines. Scale: partitioned by segment —
    ordinary window shuffle, parallel across segments (salt the segment
    key if one segment dominates).
    """
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.asc("c_acctbal"), F.asc("c_custkey"))
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.ntile(4).over(w).cast("long").alias("balance_quartile"),
        F.round(F.cume_dist().over(w), 6).alias("cum_frac"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


_DAY = "CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) * 86400"


@query(
    "q158_gapfill_forward_fill",
    # rotated OUT of the bench set r12 (steady 0.2s warm for 6 rounds;
    # the 1,900-char capture line caps the set, so rotate-not-add) in
    # favor of q457 — the round-11b family's regression tracker
    bench=False,
    oracle=f"""
        WITH daily AS (
            SELECT user_id, {_DAY} AS day_epoch,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS day_value
            FROM events GROUP BY 1, 2
        ),
        span AS (
            SELECT user_id, MIN(day_epoch) AS mn, MAX(day_epoch) AS mx
            FROM daily GROUP BY 1
        ),
        grid AS (
            SELECT user_id, unnest(generate_series(mn, mx, 86400)) AS day_epoch
            FROM span
        ),
        j AS (
            SELECT g.user_id, g.day_epoch, d.day_value
            FROM grid g LEFT JOIN daily d USING (user_id, day_epoch)
        )
        SELECT user_id, day_epoch, day_value,
               day_value IS NOT NULL AS observed,
               last_value(day_value IGNORE NULLS) OVER (
                   PARTITION BY user_id ORDER BY day_epoch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_ffill
        FROM j
    """,
)
def q158_gapfill_forward_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap filling (``time_bucket_gapfill`` shape):
    densify each user's sparse daily series onto a regular calendar
    grid (``sequence`` + explode — per-user, no cross join against a
    global calendar) and forward-fill the last observation across the
    gaps (``last(ignorenulls)`` over an ordered running frame). The
    regularized-series prerequisite for any rolling/seasonal model.
    Scale: the grid explode is proportional to user-span days, not
    users × global span; the fill is one partitioned window — no
    driver loop, no self-join per gap."""
    e = read_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    daily = e.groupBy("user_id", day.alias("day_epoch")).agg(
        F.sum(F.col("value").cast(MONEY)).cast("double").alias("day_value")
    )
    span = daily.groupBy("user_id").agg(
        F.min("day_epoch").alias("mn"), F.max("day_epoch").alias("mx")
    )
    grid = span.select(
        "user_id",
        F.explode(F.sequence("mn", "mx", F.lit(86400).cast("long"))).alias("day_epoch"),
    )
    j = grid.join(daily, ["user_id", "day_epoch"], "left")
    w = (
        Window.partitionBy("user_id")
        .orderBy("day_epoch")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return j.select(
        "user_id",
        "day_epoch",
        "day_value",
        F.col("day_value").isNotNull().alias("observed"),
        F.last("day_value", ignorenulls=True).over(w).alias("value_ffill"),
    )


@query(
    "q159_cumulative_distinct_users",
    oracle=f"""
        WITH du AS (
            SELECT DISTINCT {_DAY} AS day_epoch, user_id FROM events
        ),
        active AS (
            SELECT day_epoch, COUNT(*) AS n_active FROM du GROUP BY 1
        ),
        fs AS (
            SELECT user_id, MIN(day_epoch) AS d0 FROM du GROUP BY 1
        ),
        news AS (
            SELECT d0 AS day_epoch, COUNT(*) AS n_new FROM fs GROUP BY 1
        )
        SELECT a.day_epoch, a.n_active,
               COALESCE(n.n_new, 0) AS n_new,
               CAST(SUM(COALESCE(n.n_new, 0)) OVER (
                   ORDER BY a.day_epoch
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS BIGINT) AS cum_users
        FROM active a LEFT JOIN news n ON a.day_epoch = n.day_epoch
    """,
)
def q159_cumulative_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users per day — the growth-curve metric a
    naive ``COUNT(DISTINCT) OVER (ORDER BY day)`` cannot express
    (distinct isn't window-decomposable). The scalable identity:
    cumulative distinct = running SUM of first-appearance counts — one
    distinct (day, user) pass, one MIN per user, one tiny ordered
    window over days. The same identity is how a 100 TB pipeline
    maintains the curve incrementally (new days only touch new
    first-appearances)."""
    e = read_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    du = e.select(day.alias("day_epoch"), "user_id").distinct()
    active = du.groupBy("day_epoch").agg(F.count(F.lit(1)).alias("n_active"))
    news = (
        du.groupBy("user_id")
        .agg(F.min("day_epoch").alias("day_epoch"))
        .groupBy("day_epoch")
        .agg(F.count(F.lit(1)).alias("n_new"))
    )
    j = active.join(news, "day_epoch", "left").select(
        "day_epoch", "n_active", F.coalesce("n_new", F.lit(0)).alias("n_new")
    )
    w = Window.orderBy("day_epoch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return j.withColumn("cum_users", F.sum("n_new").over(w))


@query(
    "q160_rolling_median",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, {_DAY} AS day_epoch,
                   CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS day_value
            FROM events GROUP BY 1, 2
        )
        SELECT event_type, day_epoch, day_value,
               round(quantile_cont(day_value, 0.5) OVER (
                   PARTITION BY event_type ORDER BY day_epoch
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW
               ), 6) AS roll_median7
        FROM daily
    """,
)
def q160_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day MEDIAN per event type — a holistic (full-frame)
    window aggregate, unlike the decomposable rolling average (q85):
    the engine must keep the frame's values, so this is the shape that
    stresses window memory at scale (bounded here by the 7-row frame).
    Both engines interpolate identically (Spark ``percentile`` ≡ DuckDB
    ``quantile_cont`` at rank p·(n-1)) over identical decimal-summed
    inputs, so the medians hash-match exactly."""
    e = read_table(spark, sf_dir, "events")
    day = (F.floor(F.unix_timestamp("ts") / 86400) * 86400).cast("long")
    daily = e.groupBy("event_type", day.alias("day_epoch")).agg(
        F.sum(F.col("value").cast(MONEY)).cast("double").alias("day_value")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("day_epoch")
        .rowsBetween(-6, Window.currentRow)
    )
    return daily.select(
        "event_type",
        "day_epoch",
        "day_value",
        F.round(F.expr("percentile(day_value, 0.5)").over(w), 6).alias("roll_median7"),
    )
