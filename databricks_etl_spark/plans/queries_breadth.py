"""Round-2 breadth queries: grouped-map model fits, ANN exactness
brackets, and streaming outer joins — the backlog items from the
round-1 review, each either oracle-paired or bracketed against an
oracle-paired exact twin.

Why these matter: q115 proves the ``applyInPandas`` model-per-group
surface can be held to the SAME hash-exact standard as SQL operators
(exact decimal closed form); q116 closes the ANN ladder by showing the
IVF machinery degrades to the *provably exact* answer when probing is
exhaustive (hash-checked against DuckDB brute force — so the only
approximation left in q68 is the probe subset, not the machinery);
q117 turns ANN recall from a test-only assert into a driver-visible
artifact; q118 adds the watermark-eviction outer join, the one
stream-stream shape round 1 lacked.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import similarity as SIM
from databricks_etl_spark.operators.grouped import ols_fit_per_group
from databricks_etl_spark.plans.queries_similarity import _dot_sql
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.streaming import windows as W


@query(
    "q115_pergroup_ols",
    oracle="""
        WITH i AS (
            SELECT l_returnflag,
                   CAST(CAST(l_quantity AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS xi,
                   CAST(CAST(l_extendedprice AS DECIMAL(18,6)) * 1000000 AS HUGEINT) AS yi
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag,
                   COUNT(*) AS n,
                   SUM(xi) AS sx, SUM(yi) AS sy,
                   SUM(xi * xi) AS sxx, SUM(xi * yi) AS sxy
            FROM i GROUP BY 1
        )
        SELECT l_returnflag,
               n AS n_rows,
               round(CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS slope,
               round((CAST(sy AS DOUBLE) / 1000000.0
                      - (CAST(n * sxy - sx * sy AS DOUBLE)
                         / CAST(n * sxx - sx * sx AS DOUBLE))
                        * (CAST(sx AS DOUBLE) / 1000000.0)) / n, 6) AS intercept
        FROM s
    """,
)
def q115_pergroup_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-per-group: OLS fit of extendedprice ~ quantity per return
    flag via grouped-map ``applyInPandas`` (whole group in pandas, one
    fitted model out — the per-key-estimator shape). The pandas side
    computes the closed form in exact ``Decimal`` arithmetic, the
    oracle in exact SQL decimal sums — identical rationals, identical
    final float divisions, hash-exact across engines. See
    :func:`databricks_etl_spark.operators.grouped.ols_fit_per_group`
    for the scale contract (group fits executor memory; tiny-group-
    count fits should use the aggregate closed form directly)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_quantity", "l_extendedprice"
    )
    return ols_fit_per_group(li, "l_returnflag", "l_quantity", "l_extendedprice")


@query(
    "q116_ivf_fullprobe_exact",
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings
                   WHERE vec_id >= 5 AND vec_id < 10),
             c AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
             s AS (
                SELECT qid, nid,
                       round({_dot_sql('qe', 'ce')}
                             / (sqrt({_dot_sql('qe', 'qe')}) * sqrt({_dot_sql('ce', 'ce')})),
                             6) AS cosine_sim
                FROM q, c WHERE qid <> nid
             ),
             r AS (
                SELECT qid AS query_id, nid AS neighbor_id, cosine_sim,
                       row_number() OVER (
                           PARTITION BY qid ORDER BY cosine_sim DESC, nid
                       ) AS rank
                FROM s
             )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine_sim
        FROM r WHERE rank <= 10
    """,
)
def q116_ivf_fullprobe_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat with n_probe = n_centroids: probing every cell makes
    the coarse quantizer a pure partitioner, so the result must equal
    exact brute-force top-k — hash-checked here against the DuckDB
    brute-force oracle. This brackets the ANN ladder: q68 (subset
    probes) is the SAME machinery minus cells, so its only source of
    error is the probe selection, proven by this query + q117's
    recall, not assumed."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter((F.col("vec_id") >= 5) & (F.col("vec_id") < 10))
    return SIM.ivf_topk(e, q, 10, n_centroids=8, n_probe=8)


@query("q117_ann_recall_vs_exact", oracle=None)
def q117_ann_recall_vs_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@10 of both ANN variants (BRP-LSH q48, IVF q68) against
    the exact brute-force top-10 (q47), per query vector — the ANN
    quality metric as a first-class query instead of a test-only
    assert. Deterministic (seeded LSH/KMeans) but not SQL-expressible
    → rows-only driver check; thresholds asserted in tests."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(e, q, 10).select("query_id", "neighbor_id")
    lsh = SIM.brp_lsh_neighbors(e, q, 10, num_tables=8, bucket_length=4.0).select(
        "query_id", "neighbor_id"
    )
    ivf = SIM.ivf_topk(e, q, 10, n_centroids=8, n_probe=3).select(
        "query_id", "neighbor_id"
    )
    hits = lambda ann, name: (  # noqa: E731
        exact.join(ann, ["query_id", "neighbor_id"])
        .groupBy("query_id")
        .agg((F.count(F.lit(1)) / 10.0).alias(name))
    )
    base = exact.select("query_id").distinct()
    return (
        base.join(hits(lsh, "lsh_recall_at10"), "query_id", "left")
        .join(hits(ivf, "ivf_recall_at10"), "query_id", "left")
        .select(
            "query_id",
            F.coalesce("lsh_recall_at10", F.lit(0.0)).alias("lsh_recall_at10"),
            F.coalesce("ivf_recall_at10", F.lit(0.0)).alias("ivf_recall_at10"),
        )
    )


@query(
    "q145_ann_recall_gate",
    oracle="""
        SELECT COUNT(*) AS n_queries,
               TRUE AS lsh_min_recall_ge_080,
               TRUE AS ivf6_min_recall_ge_060,
               TRUE AS ivf6_mean_recall_ge_080
        FROM embeddings WHERE vec_id < 5
    """,
)
def q145_ann_recall_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN quality as a HASH-CHECKED driver artifact (the HLL-brackets
    pattern): recall@10 of BRP-LSH (8 tables) and IVF-Flat (6 of 8
    probes) against exact brute-force top-10 is computed in-Spark, then
    emitted as tolerance-bracket booleans the DuckDB oracle states as
    constants — if any seeded-ANN recall degrades below the bracket
    (min LSH ≥ 0.8, min IVF ≥ 0.6, mean IVF ≥ 0.8; measured 0.9/0.7/0.9
    at sf0.001 and 0.9/0.8/0.92 at sf0.01, all with margin), the value
    hash mismatches and the driver flags it. q116 proves full-probe IVF
    degrades to exact; this gates the subset-probe quality. n_queries
    is oracle-computable (COUNT of query vectors), pinning row shape."""
    e = read_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") < 5)
    exact = SIM.cosine_topk(e, q, 10).select("query_id", "neighbor_id")
    lsh = SIM.brp_lsh_neighbors(e, q, 10, num_tables=8, bucket_length=4.0).select(
        "query_id", "neighbor_id"
    )
    ivf = SIM.ivf_topk(e, q, 10, n_centroids=8, n_probe=6).select(
        "query_id", "neighbor_id"
    )

    def recall(ann: DataFrame, name: str) -> DataFrame:
        hits = (
            exact.join(ann, ["query_id", "neighbor_id"])
            .groupBy("query_id")
            .agg((F.count(F.lit(1)) / 10.0).alias(name))
        )
        return (
            exact.select("query_id")
            .distinct()
            .join(hits, "query_id", "left")
            .select("query_id", F.coalesce(name, F.lit(0.0)).alias(name))
        )

    per_q = recall(lsh, "lsh_r").join(recall(ivf, "ivf_r"), "query_id")
    return per_q.agg(
        F.count(F.lit(1)).alias("n_queries"),
        (F.min("lsh_r") >= 0.8).alias("lsh_min_recall_ge_080"),
        (F.min("ivf_r") >= 0.6).alias("ivf6_min_recall_ge_060"),
        (F.avg("ivf_r") >= 0.8).alias("ivf6_mean_recall_ge_080"),
    )


@query(
    "q118_streaming_left_outer_join",
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
        SELECT c.user_id, c.click_id, p.purchase_id,
               CAST(floor(epoch(c.click_ts)) AS BIGINT) AS click_epoch
        FROM clicks c
        LEFT JOIN purchases p
          ON c.user_id = p.p_user_id
         AND p.purchase_ts > c.click_ts
         AND p.purchase_ts <= c.click_ts + INTERVAL 30 MINUTE
        WHERE c.click_ts + INTERVAL 60 MINUTE <
              (SELECT least((SELECT max(click_ts) FROM clicks),
                            (SELECT max(purchase_ts) FROM purchases)))
    """,
)
def q118_streaming_left_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE stream-stream LEFT OUTER interval join with watermark
    eviction: unmatched clicks emit NULL-purchase rows only once the
    global watermark (min across both inputs' max-event-time − delay)
    proves no match can arrive. The materialization is restricted to
    the DECIDED frontier — clicks with ``click_ts + horizon`` strictly
    below the final watermark (⇔ ``click_ts + 2·horizon <
    min(max_click_ts, max_purchase_ts)``) — where the streaming output
    provably equals the batch left join, so the DuckDB oracle
    hash-checks watermark-eviction semantics end to end (the q131
    materialized-drain pattern; NULL-frontier exactness proven in
    tests/test_streaming.py). The undecided tail is withheld by BOTH
    engines via the same filter."""
    out = W.run_stream_stream_left_outer_join(spark, sf_dir)
    e = read_table(spark, sf_dir, "events")
    bounds = (
        e.agg(
            F.max(F.when(F.col("event_type") == "click", F.col("ts"))).alias("max_c"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias("max_p"),
        )
        .select(F.least("max_c", "max_p").alias("frontier_src"))
    )
    decided = (
        out.crossJoin(F.broadcast(bounds))
        .filter(
            F.col("click_ts") + F.expr("INTERVAL 60 MINUTE") < F.col("frontier_src")
        )
    )
    return decided.select(
        "user_id",
        "click_id",
        "purchase_id",
        F.unix_timestamp("click_ts").alias("click_epoch"),
    )


@query(
    "q128_stateful_sessionize",
    oracle="""
        WITH e AS (
            SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
        ),
        g AS (
            SELECT user_id, ts_s,
                   CASE WHEN lag(ts_s) OVER w IS NULL
                             OR ts_s - lag(ts_s) OVER w > 300
                        THEN 1 ELSE 0 END AS new_sess
            FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_s)
        ),
        s AS (
            SELECT user_id, ts_s,
                   CAST(SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts_s
                       ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sess_id
            FROM g
        ),
        sess AS (
            SELECT user_id,
                   MIN(ts_s) AS session_start_epoch,
                   MAX(ts_s) AS session_end_epoch,
                   CAST(COUNT(*) AS BIGINT) AS n_events
            FROM s GROUP BY user_id, sess_id
        )
        SELECT user_id, session_start_epoch, session_end_epoch, n_events
        FROM sess
        WHERE session_end_epoch + 601 <
              (SELECT CAST(floor(epoch(max(ts))) AS BIGINT) FROM events)
    """,
)
def q128_stateful_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization as a CUSTOM stateful streaming
    operator (``applyInPandasWithState`` + EventTimeTimeout): open
    sessions ride in state as arrays, and a session is emitted
    exactly once — when the watermark passes its end + gap, so
    out-of-order events inside the horizon can still extend or bridge
    sessions (eager emission would double-count).

    Oracled on the DECIDED frontier (q118's pattern): the final
    watermark is ``max_ts − 5 min`` (ms precision), so any session
    with ``end + gap`` at least one full second below it —
    ``end_s + 601 < floor(epoch(max_ts))`` — was provably flushed; the
    1 s margin absorbs the engine's ms-truncated watermark bookkeeping
    so no boundary session can straddle the cut. Both engines apply
    the identical filter, the sessionizer works in floored-second
    space, and the oracle re-derives sessions with the lag/cumsum
    formulation — so the custom stateful operator's emission semantics
    are value-hash-checked. Full-emission equality also asserted in
    tests/test_streaming.py."""
    from databricks_etl_spark.streaming.stateful import run_sessionize_stream

    out = run_sessionize_stream(spark, sf_dir)
    e = read_table(spark, sf_dir, "events")
    m = e.agg(F.unix_timestamp(F.max("ts")).alias("max_s"))
    return (
        out.crossJoin(F.broadcast(m))
        .filter(F.col("session_end_epoch") + 601 < F.col("max_s"))
        .select("user_id", "session_start_epoch", "session_end_epoch", "n_events")
    )


@query(
    "q131_foreachbatch_materialized_counts",
    oracle="""
        SELECT user_id, COUNT(*) AS n_events
        FROM events
        GROUP BY user_id
    """,
    bench=True,
)
def q131_foreachbatch_materialized_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-once streaming materialization, HASH-CHECKED end to end:
    per-user counts driven through a ``foreachBatch`` sink partitioned
    by epoch with dynamic partition overwrite, then the LAST epoch's
    exact payload replayed through the sink (the at-least-once
    re-delivery failure mode) before reading back latest-per-key.
    Counts are exact and the sink idempotent, so the materialization
    after replay must hash-equal DuckDB's plain GROUP BY COUNT —
    streaming delivery semantics graded by the oracle, not asserted
    locally only. Replay idempotence unit-coverage in
    tests/test_streaming.py."""
    from databricks_etl_spark.streaming.sinks import run_foreachbatch_counts

    return run_foreachbatch_counts(spark, sf_dir, replay_last_epoch=True)


_Q137_SQL = """
    SELECT l_returnflag,
           l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
                AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS count_order
    FROM {lineitem}
    WHERE l_shipdate <= TIMESTAMP '1998-01-01'
    GROUP BY l_returnflag, l_linestatus
"""


@query("q137_sql_lane_pricing", oracle=_Q137_SQL.format(lineitem="lineitem"))
def q137_sql_lane_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pure-SQL user lane: register temp views and run the EXACT
    SAME ANSI text through ``spark.sql`` that the DuckDB oracle runs —
    one source string, two engines, hash-equal. Proves the engine
    serves SQL-first users (not just the DataFrame API) and that the
    dialect subset used throughout this repo is genuinely portable.
    Catalyst compiles this to the identical plan as the DataFrame
    formulation (same scan pushdown, same partial aggregates)."""
    view = "li_q137"
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView(view)
    return spark.sql(_Q137_SQL.format(lineitem=view))


@query(
    "q138_python_datasource",
    oracle="""
        WITH src AS (
            SELECT range AS id,
                   CAST(((range % 1000000007) * 48271) % 1000000007 % 10
                        AS INTEGER) AS bucket,
                   CAST(((range % 1000000007) * 48271) % 1000000007 AS DOUBLE)
                       / 1000000007 AS val
            FROM range(10000)
        )
        SELECT bucket, COUNT(*) AS n,
               CAST(MIN(id) AS BIGINT) AS min_id,
               CAST(SUM(CAST(val AS DECIMAL(28,6))) AS DOUBLE) AS sum_val
        FROM src GROUP BY bucket
    """,
)
def q138_python_datasource(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom connector lane: a Python DataSource (Spark 4 API —
    executor-side partitioned reads, no JVM code) generating a
    deterministic sequence, aggregated per bucket and hash-checked
    against the oracle reproducing the generator arithmetic in SQL.
    Proves the full third-party-source path: registration, options,
    split planning, executor reads, schema projection. sum_val uses
    the repo's decimal-sum rule (quantize each value to 6dp, exact
    decimal accumulation) so the aggregate is order-independent
    cross-engine."""
    from databricks_etl_spark.sources.pydatasource import register

    register(spark)
    src = (
        spark.read.format("seqgen")
        .option("rows", 10000)
        .option("partitions", 8)
        .load()
    )
    return src.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("id").cast("bigint").alias("min_id"),
        F.sum(F.col("val").cast("decimal(28,6)")).cast("double").alias("sum_val"),
    )


@query(
    "q143_hll_mergeable_distinct",
    oracle="""
        SELECT CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
               CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS exact_global,
               TRUE AS all_nation_est_within_tol,
               TRUE AS union_est_within_tol,
               TRUE AS full_scan_est_within_tol
        FROM customer
    """,
)
def q143_hll_mergeable_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable distinct-count sketches (Spark 4 Apache DataSketches
    HLL): per-nation customer sketches PLUS the union-merged global
    estimate computed FROM the per-nation sketches — the 100 TB
    property that matters: partial sketches built per partition/day
    merge into any rollup without touching raw data again (exact
    distinct cannot do this). Sketch binaries are engine-specific, but
    the ERROR-BOUND THEOREM is hash-checkable (the q146/q149 bracket
    pattern): default lgConfigK=12 gives RSE ≈ 1.04/√4096 ≈ 1.6%, so a
    5% gate holds for any merge order; the oracle states the theorem
    as constants plus the exact counts, and any sketch regression
    breaks the value hash. Numeric closeness + merge-law coverage also
    in tests/test_sampling.py."""
    c = read_table(spark, sf_dir, "customer")
    per_nation = c.groupBy("c_nationkey").agg(
        F.hll_sketch_agg("c_custkey").alias("sk"),
        F.countDistinct("c_custkey").alias("exact_distinct"),
    )
    tol = F.lit(0.05)
    within = (
        F.abs(F.hll_sketch_estimate("sk") - F.col("exact_distinct"))
        <= tol * F.col("exact_distinct")
    )
    gate = per_nation.agg(
        F.count(F.lit(1)).cast("long").alias("n_nations"),
        F.sum("exact_distinct").cast("long").alias("exact_global"),
        F.min(within).alias("all_nation_est_within_tol"),
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("union_est"),
    )
    full = c.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("c_custkey")).alias("full_est")
    )
    return (
        gate.crossJoin(F.broadcast(full))
        .select(
            "n_nations",
            "exact_global",
            "all_nation_est_within_tol",
            (
                F.abs(F.col("union_est") - F.col("exact_global"))
                <= tol * F.col("exact_global")
            ).alias("union_est_within_tol"),
            # union-of-partials and single-scan sketches take different
            # internal promotion paths, so their estimates differ
            # slightly — both are gated against exact, not each other
            (
                F.abs(F.col("full_est") - F.col("exact_global"))
                <= tol * F.col("exact_global")
            ).alias("full_scan_est_within_tol"),
        )
    )


@query(
    "q144_morton_layout",
    oracle="""
        WITH m AS (
            SELECT o_orderkey,
                   CAST(o_custkey % 256 AS BIGINT) AS x,
                   CAST(CAST(floor(epoch(o_orderdate)) / 86400 AS BIGINT) % 256
                        AS BIGINT) AS y
            FROM orders
        ),
        z AS (
            SELECT o_orderkey,
                   (((x >> 0) & 1) << 0) | (((y >> 0) & 1) << 1) |
                   (((x >> 1) & 1) << 2) | (((y >> 1) & 1) << 3) |
                   (((x >> 2) & 1) << 4) | (((y >> 2) & 1) << 5) |
                   (((x >> 3) & 1) << 6) | (((y >> 3) & 1) << 7) |
                   (((x >> 4) & 1) << 8) | (((y >> 4) & 1) << 9) |
                   (((x >> 5) & 1) << 10) | (((y >> 5) & 1) << 11) |
                   (((x >> 6) & 1) << 12) | (((y >> 6) & 1) << 13) |
                   (((x >> 7) & 1) << 14) | (((y >> 7) & 1) << 15)
                       AS morton
            FROM m
        )
        SELECT CAST(morton >> 8 AS BIGINT) AS tile,
               COUNT(*) AS n_orders,
               CAST(MIN(morton) AS BIGINT) AS min_morton,
               CAST(MAX(morton) AS BIGINT) AS max_morton
        FROM z GROUP BY 1
    """,
)
def q144_morton_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key: bit-interleaving customer and
    order-day into one sort key so rows close in BOTH dimensions are
    close on disk — the multi-dimensional clustering trick behind
    Delta Z-ORDER / Iceberg sort orders, built from plain bit ops (no
    engine extension). Sorting/range-partitioning 100 TB by this key
    makes min/max file statistics prune BOTH predicates (customer
    range AND date range), where single-column sort prunes only one.
    The query emits per-tile (morton >> 8) file-statistics analogues
    (count, min/max key) — exactly what a data-skipping planner reads
    — and is fully oracled bit-for-bit."""
    from databricks_etl_spark.operators.layout import morton_key

    o = read_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long") % 256
    )
    z = o.select("o_orderkey", morton_key(x, y, 8).alias("morton"))
    return (
        z.groupBy(F.shiftright("morton", 8).cast("long").alias("tile"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("morton").cast("long").alias("min_morton"),
            F.max("morton").cast("long").alias("max_morton"),
        )
    )


@query(
    "q168_udtf_sentences",
    oracle="""
        WITH s AS (
            SELECT doc_id, string_split(text, '. ') AS ss FROM documents
        ),
        x AS (
            SELECT doc_id,
                   unnest(list_transform(range(1, len(ss) + 1),
                       i -> {'pos': i - 1, 'sent': trim(ss[i])})) AS r
            FROM s
        )
        SELECT doc_id, CAST(r.pos AS INT) AS pos, r.sent AS sentence
        FROM x WHERE length(r.sent) >= 5
    """,
)
def q168_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF lane (Spark 4 user-defined TABLE function): a
    sentence-splitting UDTF applied per document via LATERAL join —
    the third-party-extension API q138's DataSource covers for
    sources, covered here for row-generating functions (registration,
    return schema, lateral correlation, NULL input handling). The
    oracle reproduces the split/trim/filter in pure SQL, so the UDTF's
    row semantics are hash-checked. UDTFs are Python-side (API lane,
    not a hot path — the repo's built-in explode/split expressions
    are the 100 TB route); enable
    ``spark.sql.execution.pythonUDTF.arrow.enabled`` for Arrow
    batching in production."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, sentence string")
    class SplitSentences:
        def eval(self, text):
            if text is None:
                return
            # strip SPACES only — the oracle's trim() trims ' ' not \t\n,
            # so stripping all whitespace here would diverge on documents
            # with tabs/newlines adjacent to '. ' boundaries
            for i, s in enumerate(t.strip(" ") for t in text.split(". ")):
                if len(s) >= 5:
                    yield i, s

    spark.udtf.register("q168_split_sentences", SplitSentences)
    view = "q168_docs"
    read_table(spark, sf_dir, "documents").createOrReplaceTempView(view)
    return spark.sql(f"""
        SELECT d.doc_id, s.pos, s.sentence
        FROM {view} d, LATERAL q168_split_sentences(d.text) s
    """)
