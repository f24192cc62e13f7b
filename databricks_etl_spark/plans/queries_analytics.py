"""Product-analytics and fuzzy-matching queries (north-star extensions,
SURVEY.md §2.12): event funnels, cohort retention, GROUPING SETS, and
edit-distance near-dup — the remaining classic shapes a warehouse user
of the reference would expect, none of which its notebooks contain
(verified: no grouping sets / window funnels / fuzzy matching anywhere
in ``/root/reference``).

All oracle-paired. Determinism: counts are exact integers; week buckets
are epoch seconds (``date_trunc('week')`` is ISO-Monday in both Spark
and DuckDB); Levenshtein is exact edit distance in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


@query(
    "q89_grouping_sets",
    oracle="""
        SELECT l_returnflag,
               l_linestatus,
               CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
)
def q89_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of q29's rollup / q66's
    cube) with ``grouping_id`` to disambiguate NULL-as-subtotal from
    NULL-as-value. One scan; Spark expands the sets into a single
    aggregate with a grouping-id column — no repeated scans.
    """
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.groupingSets(
            [["l_returnflag", "l_linestatus"], ["l_returnflag"], []],
            "l_returnflag",
            "l_linestatus",
        )
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double").alias("sum_qty"),
        )
    )


@query(
    "q90_funnel_conversion",
    oracle="""
        WITH v AS (
            SELECT user_id, MIN(ts) AS t_view FROM events
            WHERE event_type = 'view' GROUP BY 1
        ),
        c AS (
            SELECT e.user_id, MIN(e.ts) AS t_click
            FROM events e JOIN v ON e.user_id = v.user_id
            WHERE e.event_type = 'click' AND e.ts > v.t_view
            GROUP BY 1
        ),
        p AS (
            SELECT e.user_id, MIN(e.ts) AS t_purchase
            FROM events e JOIN c ON e.user_id = c.user_id
            WHERE e.event_type = 'purchase' AND e.ts > c.t_click
            GROUP BY 1
        )
        SELECT (SELECT COUNT(*) FROM v) AS n_view,
               (SELECT COUNT(*) FROM c) AS n_view_click,
               (SELECT COUNT(*) FROM p) AS n_view_click_purchase,
               round(CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
                     / (SELECT COUNT(*) FROM v), 6) AS conversion
    """,
)
def q90_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel view → click → purchase: a user advances a
    stage only with a strictly-later event of the next type (min-
    timestamp chaining — the standard sequential-funnel formulation).

    Scale shape: each stage is a filter + per-user min + equi-join on
    ``user_id`` — hash-partitioned by user, no window over the full
    event stream, no cross-stage shuffle beyond the user key. The
    final counts are three 1-row aggregates cross-joined (driver-safe).
    """
    e = read_table(spark, sf_dir, "events")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    nv = v.agg(F.count(F.lit(1)).alias("n_view"))
    nc = c.agg(F.count(F.lit(1)).alias("n_view_click"))
    np_ = p.agg(F.count(F.lit(1)).alias("n_view_click_purchase"))
    return (
        nv.crossJoin(nc)
        .crossJoin(np_)
        .select(
            "n_view",
            "n_view_click",
            "n_view_click_purchase",
            F.round(
                F.col("n_view_click_purchase").cast("double") / F.col("n_view"), 6
            ).alias("conversion"),
        )
    )


@query(
    "q91_retention_cohorts",
    oracle="""
        WITH first_seen AS (
            SELECT user_id,
                   CAST(floor(epoch(date_trunc('week', MIN(ts)))) AS BIGINT) AS cohort_epoch
            FROM events GROUP BY 1
        ),
        activity AS (
            SELECT DISTINCT user_id,
                   CAST(floor(epoch(date_trunc('week', ts))) AS BIGINT) AS wk_epoch
            FROM events
        )
        SELECT f.cohort_epoch,
               CAST((a.wk_epoch - f.cohort_epoch) / 604800 AS BIGINT) AS week_offset,
               COUNT(DISTINCT a.user_id) AS n_active
        FROM activity a JOIN first_seen f USING (user_id)
        GROUP BY 1, 2
    """,
)
def q91_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by first-seen ISO week,
    counted as active in each subsequent week (the classic retention
    triangle, long form).

    Scale shape: two per-user aggregations + one equi-join on
    ``user_id`` (co-partitioned), then a small (cohorts × weeks) agg.
    Week starts are epoch seconds; ``date_trunc('week')`` is ISO-Monday
    in both engines.
    """
    e = read_table(spark, sf_dir, "events")
    first_seen = e.groupBy("user_id").agg(
        F.unix_timestamp(F.date_trunc("week", F.min("ts"))).alias("cohort_epoch")
    )
    activity = e.select(
        "user_id", F.unix_timestamp(F.date_trunc("week", F.col("ts"))).alias("wk_epoch")
    ).distinct()
    return (
        activity.join(first_seen, "user_id")
        .groupBy(
            "cohort_epoch",
            ((F.col("wk_epoch") - F.col("cohort_epoch")) / 604800)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@query(
    "q92_levenshtein_neardup",
    oracle="""
        WITH p AS (
            SELECT p_partkey, p_name,
                   string_split(p_name, ' ')[-1] AS noun
            FROM part WHERE p_partkey < 800
        )
        SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
               a.p_name AS name_a, b.p_name AS name_b,
               CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist
        FROM p a JOIN p b ON a.noun = b.noun AND a.p_partkey < b.p_partkey
        WHERE levenshtein(a.p_name, b.p_name) <= 3 AND a.p_name <> b.p_name
    """,
)
def q92_levenshtein_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup over part names with blocking: candidate
    pairs come from an equi-join on the name's last word (the blocking
    key), and only candidates pay the O(len²) Levenshtein — the
    standard record-linkage blocking pattern, which replaces the
    quadratic all-pairs comparison with a hash join at scale.
    """
    p = (
        read_table(spark, sf_dir, "part")
        .filter(F.col("p_partkey") < 800)
        .select(
            "p_partkey",
            "p_name",
            F.element_at(F.split("p_name", " "), -1).alias("noun"),
        )
    )
    a = p.select(
        F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"), "noun"
    )
    b = p.select(
        F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"), "noun"
    )
    return (
        a.join(b, "noun")
        .filter(F.col("key_a") < F.col("key_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b").cast("long"))
        .filter((F.col("edit_dist") <= 3) & (F.col("name_a") != F.col("name_b")))
        .select("key_a", "key_b", "name_a", "name_b", "edit_dist")
    )


@query(
    "q98_merge_upsert",
    oracle="""
        WITH changes AS (
            SELECT c_custkey, c_name,
                   round(CAST(c_acctbal + 100.0 AS DECIMAL(28,6)), 2) AS c_acctbal
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer) AS c_custkey,
                   'new-' || c_name AS c_name,
                   CAST(0.0 AS DECIMAL(28,6)) AS c_acctbal
            FROM customer WHERE c_custkey % 100 = 0
        )
        SELECT COALESCE(ch.c_custkey, b.c_custkey) AS c_custkey,
               COALESCE(ch.c_name, b.c_name) AS c_name,
               CAST(COALESCE(ch.c_acctbal, CAST(b.c_acctbal AS DECIMAL(28,6))) AS DOUBLE)
                   AS c_acctbal,
               CASE WHEN b.c_custkey IS NULL THEN 'inserted'
                    WHEN ch.c_custkey IS NULL THEN 'unchanged'
                    ELSE 'updated' END AS row_status
        FROM customer b FULL OUTER JOIN changes ch USING (c_custkey)
    """,
)
def q98_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO emulation without a lakehouse format: apply a change
    batch (updates + inserts, derived deterministically from the base)
    via full-outer join + COALESCE, tagging each row inserted /
    updated / unchanged — the upsert half of CDC ingestion (q76's SCD2
    history is the audit half; a Delta sink would replace this with a
    native MERGE).

    Scale shape: one shuffle on the merge key for the outer join
    (changes are usually ≪ base, so AQE broadcasts them); no windows,
    no driver-side state. Insert keys are offset by MAX(c_custkey)+1
    (1-row aggregate, broadcast; the +1 keeps key 0's insert disjoint) so they are disjoint from base keys
    at ANY scale factor — a fixed offset would collide once the key
    space outgrows it.
    """
    b = read_table(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_acctbal")
    updates = (
        b.filter(F.col("c_custkey") % 10 == 0)
        .select(
            "c_custkey",
            "c_name",
            F.round((F.col("c_acctbal") + 100.0).cast("decimal(28,6)"), 2).alias("c_acctbal"),
        )
    )
    mx = b.agg((F.max("c_custkey") + 1).alias("__max_key"))
    inserts = (
        b.filter(F.col("c_custkey") % 100 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("c_custkey") + F.col("__max_key")).alias("c_custkey"),
            F.concat(F.lit("new-"), F.col("c_name")).alias("c_name"),
            F.lit(0.0).cast("decimal(28,6)").alias("c_acctbal"),
        )
    )
    ch = updates.unionByName(inserts)
    bb = b.select(
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
        F.col("c_acctbal").alias("b_bal"),
    )
    cc = ch.select(
        F.col("c_custkey").alias("ch_key"),
        F.col("c_name").alias("ch_name"),
        F.col("c_acctbal").alias("ch_bal"),
    )
    return (
        bb.join(cc, bb.b_key == cc.ch_key, "full_outer")
        .select(
            F.coalesce("ch_key", "b_key").alias("c_custkey"),
            F.coalesce("ch_name", "b_name").alias("c_name"),
            F.coalesce(F.col("ch_bal"), F.col("b_bal").cast("decimal(28,6)"))
            .cast("double")
            .alias("c_acctbal"),
            F.when(F.col("b_key").isNull(), "inserted")
            .when(F.col("ch_key").isNull(), "unchanged")
            .otherwise("updated")
            .alias("row_status"),
        )
    )


@query(
    "q99_value_histogram",
    oracle="""
        SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bucket,
               CAST(floor(l_extendedprice / 5000.0) * 5000.0 AS DOUBLE) AS bucket_lo,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS total_price
        FROM lineitem
        GROUP BY 1, 2
    """,
)
def q99_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram (width-bucket binning) over a fact
    measure — the frequency-analysis shape of the reference's EP1
    (``pre_analysis.py`` frequency plots) made engine-side and
    scale-safe: one partial+final agg on ~bucket-count keys, histogram
    never leaves the JVM un-aggregated."""
    li = read_table(spark, sf_dir, "lineitem")
    bucket = F.floor(F.col("l_extendedprice") / 5000.0).cast("long")
    return (
        li.groupBy(
            bucket.alias("bucket"),
            (bucket * 5000.0).cast("double").alias("bucket_lo"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_extendedprice").cast("decimal(28,6)")).cast("double").alias("total_price"),
        )
    )


@query(
    "q132_incremental_agg_maintenance",
    # rotated out of the bench set r13 (steady 0.2s; streaming/incremental
    # family tracked by q131) in favor of q466 z-order pricing
    oracle="""
        WITH changes AS (
            SELECT c_custkey, c_nationkey,
                   round(CAST(c_acctbal + 100.0 AS DECIMAL(28,6)), 2) AS c_acctbal
            FROM customer WHERE c_custkey % 10 = 0
            UNION ALL
            SELECT c_custkey + (SELECT MAX(c_custkey) + 1 FROM customer),
                   c_nationkey,
                   CAST(0.0 AS DECIMAL(28,6))
            FROM customer WHERE c_custkey % 100 = 0
        ),
        merged AS (
            SELECT COALESCE(ch.c_custkey, b.c_custkey) AS c_custkey,
                   COALESCE(ch.c_nationkey, b.c_nationkey) AS c_nationkey,
                   COALESCE(ch.c_acctbal, CAST(b.c_acctbal AS DECIMAL(28,6)))
                       AS c_acctbal
            FROM customer b FULL OUTER JOIN changes ch USING (c_custkey)
        )
        SELECT c_nationkey, COUNT(*) AS n_customers,
               CAST(SUM(c_acctbal) AS DOUBLE) AS total_bal
        FROM merged GROUP BY 1
    """,
)
def q132_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-aggregate maintenance: per-nation
    (count, sum(acctbal)) updated from a CDC change batch WITHOUT
    rescanning the base — new_agg = old_agg + Σ(new values) −
    Σ(overwritten old values), where the overwritten values come from
    a semi-join of base against change keys (|changes| ≪ |base|, so
    it broadcasts). The oracle recomputes the aggregate from the
    fully-merged table — algebraic-delta maintenance must equal the
    full recomputation exactly, which is why sums stay in exact
    decimals until the final cast. THE 100 TB pattern: the daily
    change set touches the scan, the 100 TB base only feeds the
    (cached/stored) old aggregate."""
    b = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    mx = b.agg((F.max("c_custkey") + 1).alias("__off"))
    dec = "decimal(28,6)"
    updates = b.filter(F.col("c_custkey") % 10 == 0).select(
        "c_custkey",
        "c_nationkey",
        F.round((F.col("c_acctbal") + 100.0).cast(dec), 2).alias("c_acctbal"),
    )
    inserts = (
        b.filter(F.col("c_custkey") % 100 == 0)
        .crossJoin(F.broadcast(mx))
        .select(
            (F.col("c_custkey") + F.col("__off")).alias("c_custkey"),
            "c_nationkey",
            F.lit(0.0).cast(dec).alias("c_acctbal"),
        )
    )
    changes = updates.unionByName(inserts)

    # the stored aggregate (in production: read from the serving store)
    old_agg = b.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.col("c_acctbal").cast(dec)).alias("total_bal"),
    )
    # retracted rows: base rows whose key is overwritten by a change
    retracted = b.join(
        changes.select("c_custkey"), "c_custkey", "left_semi"
    )
    delta = (
        changes.select(
            "c_nationkey", F.lit(1).alias("dn"), F.col("c_acctbal").alias("dv")
        )
        .unionByName(
            retracted.select(
                "c_nationkey",
                F.lit(-1).alias("dn"),
                (-F.col("c_acctbal").cast(dec)).alias("dv"),
            )
        )
        .groupBy("c_nationkey")
        .agg(F.sum("dn").alias("dn"), F.sum("dv").alias("dv"))
    )
    return (
        old_agg.join(delta, "c_nationkey", "left")
        .select(
            "c_nationkey",
            (F.col("n_customers") + F.coalesce("dn", F.lit(0))).alias("n_customers"),
            (F.col("total_bal") + F.coalesce(F.col("dv"), F.lit(0).cast(dec)))
            .cast("double")
            .alias("total_bal"),
        )
    )


@query(
    "q133_order_day_streaks",
    oracle="""
        WITH days AS (
            SELECT DISTINCT o_custkey,
                   CAST(floor(epoch(o_orderdate)) / 86400 AS BIGINT) AS d
            FROM orders
        ),
        grp AS (
            SELECT o_custkey, d,
                   d - row_number() OVER (
                       PARTITION BY o_custkey ORDER BY d
                   ) AS island
            FROM days
        ),
        streaks AS (
            SELECT o_custkey, COUNT(*) AS streak_len
            FROM grp GROUP BY o_custkey, island
        )
        SELECT o_custkey,
               CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
               COUNT(*) AS n_streaks
        FROM streaks GROUP BY 1
    """,
)
def q133_order_day_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: longest run of CONSECUTIVE order days per
    customer via the row_number-difference trick (day − rank is
    constant within an island) — the classic shape for streaks/
    uptime/sessions-on-a-grid that needs no self-join and no
    iteration: two windows + two aggregates, all partitioned by
    customer."""
    from pyspark.sql import Window

    o = read_table(spark, sf_dir, "orders")
    days = o.select(
        "o_custkey",
        (F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400))).cast("bigint").alias("d"),
    ).distinct()
    w = Window.partitionBy("o_custkey").orderBy("d")
    grp = days.withColumn("island", F.col("d") - F.row_number().over(w))
    streaks = grp.groupBy("o_custkey", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return streaks.groupBy("o_custkey").agg(
        F.max("streak_len").cast("bigint").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
    )


@query(
    "q134_revenue_share_of_nation",
    oracle="""
        WITH rev AS (
            SELECT n_name, c_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS cust_rev
            FROM customer
            JOIN nation ON c_nationkey = n_nationkey
            JOIN orders ON o_custkey = c_custkey
            GROUP BY 1, 2
        )
        SELECT n_name, c_custkey,
               CAST(cust_rev AS DOUBLE) AS cust_rev,
               round(CAST(cust_rev AS DOUBLE)
                     / CAST(SUM(cust_rev) OVER (PARTITION BY n_name) AS DOUBLE),
                     6) AS share_of_nation
        FROM rev
    """,
)
def q134_revenue_share_of_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ratio-to-report: each customer's share of their nation's order
    revenue — aggregate once, then a partition-window sum turns the
    same pass into percent-of-parent (no second scan, no self-join
    against the totals). Decimal-exact numerator and denominator; the
    division is the only float step, rounded identically."""
    from pyspark.sql import Window

    c = read_table(spark, sf_dir, "customer")
    n = read_table(spark, sf_dir, "nation")
    o = read_table(spark, sf_dir, "orders")
    rev = (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name", "c_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("cust_rev"))
    )
    w = Window.partitionBy("n_name")
    return rev.select(
        "n_name",
        "c_custkey",
        F.col("cust_rev").cast("double").alias("cust_rev"),
        F.round(
            F.col("cust_rev").cast("double") / F.sum("cust_rev").over(w).cast("double"),
            6,
        ).alias("share_of_nation"),
    )
