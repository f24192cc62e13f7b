"""Scale-infrastructure queries (round 3): sketch gates, skew stress,
Z-order pruning, estimator-error audits.

Theme: the machinery that keeps a 100 TB deployment honest —
mergeable sketches whose error bounds are *hash-checked* against exact
answers (the HLL-brackets pattern from q143/q145), a deliberately
skewed join for the AQE bench story, and a written-then-pruned Z-order
layout proving the data-skipping path end-to-end. No reference analog
(the reference is a fixed 3-notebook pipeline); north-star surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import decimal_sum
from databricks_etl_spark.operators.layout import morton_key, tiles_covering_box
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.sources.writers import scratch_dir

_CMS_EPS = 0.001
_CMS_SEED = 42


@query(
    "q146_cms_heavy_hitters_gate",
    oracle="""
        WITH c AS (
            SELECT o_custkey, COUNT(*) AS exact_cnt FROM orders GROUP BY 1
        ),
        t AS (
            SELECT o_custkey, exact_cnt FROM c
            ORDER BY exact_cnt DESC, o_custkey LIMIT 20
        )
        SELECT o_custkey, exact_cnt,
               TRUE AS est_ge_exact,
               TRUE AS est_le_eps_bound
        FROM t
    """,
)
def q146_cms_heavy_hitters_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch heavy-hitter estimates, hash-checked against
    exact counts (approx-top-k as a graded artifact). The CMS aggregate
    is built distributed (``F.count_min_sketch`` — counter sums, so
    merge-order independent and, with a fixed seed, fully deterministic
    regardless of partitioning); the exact top-20 customers (count
    desc, key asc tiebreak) are then probed against the sketch
    driver-side (k probes on one ~100 KB sketch — aggregate-scale,
    within the no-raw-collect policy). Emitted brackets are the CMS
    theorems: estimate ≥ exact always (no deletions), and estimate ≤
    exact + ε·N (ε=0.001, N=total rows). At 100 TB the sketch is the
    point: per-partition partials merge into one fixed-size summary
    without a second pass over raw data, unlike exact groupBy counts
    which shuffle the full key space."""
    o = read_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("exact_cnt"))
    topk = counts.orderBy(F.desc("exact_cnt"), F.asc("o_custkey")).limit(20)
    agg = o.agg(
        F.count_min_sketch(
            "o_custkey", F.lit(_CMS_EPS), F.lit(0.99), F.lit(_CMS_SEED)
        ).alias("sk"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    jsk = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(agg["sk"])
    )
    slack = _CMS_EPS * agg["n"]
    rows = [
        (
            r["o_custkey"],
            r["exact_cnt"],
            jsk.estimateCount(int(r["o_custkey"])) >= r["exact_cnt"],
            jsk.estimateCount(int(r["o_custkey"])) <= r["exact_cnt"] + slack,
        )
        for r in topk.collect()
    ]
    return spark.createDataFrame(
        rows,
        "o_custkey bigint, exact_cnt bigint, est_ge_exact boolean, "
        "est_le_eps_bound boolean",
    )


@query(
    "q147_skew_stress_join",
    oracle="""
        WITH f AS (
            SELECT CASE WHEN l_orderkey % 7 < 2 THEN 1 ELSE l_orderkey END AS k,
                   l_extendedprice * (1 - l_discount) AS rev
            FROM lineitem
        )
        SELECT o.o_orderstatus,
               COUNT(*) AS n_items,
               CAST(SUM(CAST(f.rev AS DECIMAL(28,6))) AS DOUBLE) AS revenue
        FROM f JOIN orders o ON f.k = o.o_orderkey
        GROUP BY o.o_orderstatus
    """,
    bench=True,
)
def q147_skew_stress_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deliberately skewed fact-dim join: ~29% of lineitem rows are
    remapped onto one hot order key, the canonical power-law key
    distribution that sinks naive shuffle joins (one straggler
    partition does a third of the work). Plan ladder, verified: at
    sf0.01–sf0.1 Catalyst broadcasts the column-pruned dim
    (BroadcastHashJoin — skew-IMMUNE by construction, no hot
    partition exists), which is the optimal plan and the point of
    letting the optimizer choose; at cluster scale where the dim
    exceeds the broadcast threshold, the same query becomes a
    sort-merge join and AQE's skew split subdivides the hot partition
    — that runtime rewrite is PROVEN (``SortMergeJoin(skew=true)`` in
    the final adaptive plan) by
    tests/test_misc_exec.py::test_aqe_skew_split_actually_fires.
    Registered as a BENCH entry; result is the per-status revenue
    rollup — small output, all the cost is the skewed join."""
    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    fact = li.select(
        F.when(F.col("l_orderkey") % 7 < 2, F.lit(1).cast("long"))
        .otherwise(F.col("l_orderkey"))
        .alias("k"),
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    j = fact.join(o.select("o_orderkey", "o_orderstatus"), fact["k"] == o["o_orderkey"])
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_items"),
        decimal_sum("rev", "revenue"),
    )


_Q148_BOX_X = (64, 127)
_Q148_BOX_Y = (32, 95)


@query(
    "q148_morton_box_prune",
    oracle="""
        WITH m AS (
            SELECT o_orderkey,
                   CAST(o_custkey % 256 AS BIGINT) AS x,
                   CAST(CAST(floor(epoch(o_orderdate)) / 86400 AS BIGINT) % 256
                        AS BIGINT) AS y
            FROM orders
        )
        SELECT o_orderkey, x, y
        FROM m
        WHERE x BETWEEN 64 AND 127 AND y BETWEEN 32 AND 95
    """,
)
def q148_morton_box_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order data-skipping path END TO END: write orders
    partitioned by Morton tile (top 3 bits of each dimension,
    interleaved — 64 tiles), then answer a 2-D box predicate by (1)
    deriving the covering tile set driver-side (pure int math on the
    8×8 tile grid), (2) reading ONLY those partitions (Catalyst
    partition pruning — the plan's PartitionFilters, asserted in
    tests/test_layout.py), (3) applying the residual exact predicate.
    The result must hash-equal DuckDB's plain box filter over the
    original table — pruning is an optimization, never a semantics
    change. This is q144's layout key actually *doing* its job: at
    100 TB the tile set bounds the scan to the box's neighborhood in
    both dimensions, where a single-column sort prunes only one."""
    o = read_table(spark, sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = (
        F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long") % 256
    )
    # materialize the layout: tile = interleave of x[7:5], y[7:5]
    laid = o.select("o_orderkey", x.alias("x"), y.alias("y"))
    laid = laid.withColumn(
        "tile", F.shiftright(morton_key(F.col("x"), F.col("y"), 8), 10)
    )
    # stable scratch path (mode=overwrite truncates it each run; removed
    # at interpreter exit) — a fresh mkdtemp per call would leak one
    # parquet copy of orders per driver/bench/test invocation
    out = scratch_dir("zorder_", key=sf_dir)
    laid.repartition(8, "tile").write.mode("overwrite").partitionBy("tile").parquet(out)

    tiles = tiles_covering_box(_Q148_BOX_X, _Q148_BOX_Y, bits=8, tile_bits=3)
    back = (
        spark.read.parquet(out)
        .filter(F.col("tile").isin(tiles))
        .filter(
            F.col("x").between(*_Q148_BOX_X) & F.col("y").between(*_Q148_BOX_Y)
        )
    )
    return back.select("o_orderkey", "x", "y")


@query(
    "q149_quantile_sketch_gate",
    oracle="""
        SELECT l_returnflag, COUNT(*) AS n,
               TRUE AS p50_within_tol,
               TRUE AS p95_within_tol
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q149_quantile_sketch_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-percentile rank-error gate (the quantile-sketch
    analog of the HLL/CMS brackets): per return-flag,
    ``percentile_approx(price, p, accuracy=1000)`` guarantees the
    returned value's true rank is within n/accuracy of p·n for ANY
    sketch-merge order — so the bracket booleans are deterministic
    even though the picked value itself may vary with partitioning.
    The true rank is recomputed exactly in-Spark (count of values ≤
    picked), the oracle states the theorem as constants, and any
    sketch regression breaks the value hash. Mergeable quantile
    summaries are how percentile dashboards survive 100 TB — exact
    per-group sorts do not."""
    li = read_table(spark, sf_dir, "lineitem").select("l_returnflag", "l_extendedprice")
    picked = li.groupBy("l_returnflag").agg(
        F.percentile_approx("l_extendedprice", F.array(F.lit(0.5), F.lit(0.95)), F.lit(1000)).alias("ap"),
        F.count(F.lit(1)).alias("n"),
    )
    j = li.join(F.broadcast(picked), "l_returnflag")
    ranks = j.groupBy("l_returnflag").agg(
        F.first("n").alias("n"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("ap")[0], 1).otherwise(0)
        ).alias("r50"),
        F.sum(
            F.when(F.col("l_extendedprice") <= F.col("ap")[1], 1).otherwise(0)
        ).alias("r95"),
    )
    tol = F.col("n") / 1000 + 1
    return ranks.select(
        "l_returnflag",
        "n",
        (F.abs(F.col("r50") - 0.5 * F.col("n")) <= tol).alias("p50_within_tol"),
        (F.abs(F.col("r95") - 0.95 * F.col("n")) <= tol).alias("p95_within_tol"),
    )


_Q150_K = 32


@query(
    "q150_minhash_estimate_error",
    oracle=r"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(lower(trim(text)), '\s+') AS toks
            FROM documents
        ),
        d AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])) AS sh
            FROM t
        ),
        i0 AS (SELECT doc_id, unnest(sh) AS item FROM d),
        keep AS (SELECT item FROM i0 GROUP BY item HAVING COUNT(*) <= 100),
        i AS (SELECT i0.doc_id, i0.item FROM i0 JOIN keep USING (item)),
        sz AS (SELECT doc_id, COUNT(*) AS set_size FROM i GROUP BY 1),
        pairs AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
            FROM i a JOIN i b USING (item)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        ),
        ej AS (
            SELECT id_a, id_b,
                   round(CAST(shared AS DOUBLE)
                         / (sa.set_size + sb.set_size - shared), 6) AS jaccard
            FROM pairs
            JOIN sz sa ON pairs.id_a = sa.doc_id
            JOIN sz sb ON pairs.id_b = sb.doc_id
        ),
        pj AS (SELECT * FROM ej WHERE jaccard >= 0.05),
        sk AS (
            SELECT doc_id,
                   list_sort(list_distinct(list_transform(sh, s -> md5(s))))[1:32]
                       AS sketch
            FROM d
        ),
        wide AS (
            SELECT pj.id_a, pj.id_b, pj.jaccard,
                   ua.sketch AS sa, ub.sketch AS sb,
                   list_sort(list_distinct(ua.sketch || ub.sketch))[1:32] AS u
            FROM pj
            JOIN sk ua ON pj.id_a = ua.doc_id
            JOIN sk ub ON pj.id_b = ub.doc_id
        )
        SELECT id_a, id_b, jaccard,
               round(CAST(len(list_filter(u,
                         x -> list_contains(sa, x) AND list_contains(sb, x)))
                     AS DOUBLE) / len(u), 6) AS minhash_est
        FROM wide
    """,
)
def q150_minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k MinHash Jaccard ESTIMATES hash-checked against the
    exact Jaccard for the same pairs — the sketch-accuracy audit most
    dedup pipelines never run. The bottom-32 md5-shingle sketch
    (q41's operator) is a deterministic 1-permutation MinHash, so the
    classic estimator |S_k(A∪B) ∩ S(A) ∩ S(B)| / |S_k(A∪B)| is
    SQL-expressible and both engines must agree on every estimate
    bit-for-bit (md5 and lexicographic hex order are
    engine-independent — no bracket needed, full value equality).
    Pair set = q44's exact 3-gram pairs (max_df=100 guard); sketches
    are over the unguarded shingle sets, mirrored exactly in the
    oracle. At 100 TB only the k-hash sketches shuffle, never the
    shingle sets."""
    from databricks_etl_spark.operators import dedup as DD
    from databricks_etl_spark.operators.text import bottom_k_sketch

    d = read_table(spark, sf_dir, "documents")
    pairs = DD.jaccard_pairs(d, 0.05, ngram=3, max_df=100)
    sk = bottom_k_sketch(d, k=_Q150_K)
    sa = sk.select(F.col("doc_id").alias("id_a"), F.col("sketch").alias("sa"))
    sb = sk.select(F.col("doc_id").alias("id_b"), F.col("sketch").alias("sb"))
    wide = (
        pairs.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "u", F.slice(F.array_sort(F.array_union("sa", "sb")), 1, _Q150_K)
        )
    )
    m = F.size(F.array_intersect(F.array_intersect("u", "sa"), "sb"))
    return wide.select(
        "id_a",
        "id_b",
        "jaccard",
        F.round(m.cast("double") / F.size("u"), 6).alias("minhash_est"),
    )


@query(
    "q155_window_function_breadth",
    oracle="""
        SELECT o_orderkey, o_orderpriority,
               CAST(ntile(4) OVER w AS BIGINT) AS quartile,
               round(percent_rank() OVER w, 6) AS pct_rank,
               round(cume_dist() OVER w, 6) AS cum_dist,
               nth_value(o_orderkey, 2) OVER (
                   PARTITION BY o_orderpriority
                   ORDER BY o_totalprice, o_orderkey
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
               ) AS second_cheapest_key
        FROM orders
        WINDOW w AS (PARTITION BY o_orderpriority
                     ORDER BY o_totalprice, o_orderkey)
    """,
)
def q155_window_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-window breadth in one pass: ntile quartiles,
    percent_rank, cume_dist, and a full-frame nth_value, all over the
    same (priority, price) window — one shuffle on the partition key,
    one per-partition sort, four functions. The ORDER BY carries an
    explicit o_orderkey tiebreak so every rank is a deterministic
    total order (the repo-wide rule that makes window output
    hash-comparable across engines); nth_value pins an explicit
    unbounded frame because engines disagree on its default."""
    from pyspark.sql import Window

    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.ntile(4).over(w).cast("long").alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cum_dist"),
        F.nth_value("o_orderkey", 2).over(wf).alias("second_cheapest_key"),
    )


_EMB_DOT_REV = (
    "list_sum(list_transform(range(1, len(embedding) + 1), "
    "i -> CAST(embedding[i] AS DOUBLE) "
    "* CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)))"
)


@query(
    "q156_higher_order_arrays",
    oracle=f"""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               CAST(len(list_filter(embedding, v -> v > 0)) AS BIGINT) AS n_pos,
               round(sqrt(list_sum(list_transform(embedding,
                     v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)))), 6) AS l2_norm,
               CASE WHEN list_max(embedding) > list_min(embedding)
                    THEN round((CAST(embedding[1] AS DOUBLE)
                                - CAST(list_min(embedding) AS DOUBLE))
                               / (CAST(list_max(embedding) AS DOUBLE)
                                  - CAST(list_min(embedding) AS DOUBLE)), 6)
               END AS first_minmax_scaled,
               round({_EMB_DOT_REV}, 6) AS self_reverse_dot
        FROM embeddings
    """,
)
def q156_higher_order_arrays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions as first-class vector math —
    ``filter``/``transform``/``aggregate``/``zip_with``/``reverse``
    composed per row with ZERO shuffle and zero UDFs (all lambda
    expressions run inside whole-stage codegen): positive-component
    count, L2 norm (sequential left fold — bit-identical to DuckDB's
    list_sum fold, the repo's cross-engine float rule), min-max
    scaling of the first component (guarded against constant vectors),
    and the self·reverse dot. This is the expression toolbox the
    embedding operators (q47/q63) are built from, proven element-wise."""
    from databricks_etl_spark.operators.similarity import dot

    e = read_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    mn = F.array_min(emb).cast("double")
    mx = F.array_max(emb).cast("double")
    return e.select(
        "vec_id",
        F.size(emb).cast("long").alias("dim"),
        F.size(F.filter(emb, lambda v: v > 0)).cast("long").alias("n_pos"),
        F.round(
            F.sqrt(
                F.aggregate(
                    F.transform(emb, lambda v: v.cast("double") * v.cast("double")),
                    F.lit(0.0),
                    lambda acc, v: acc + v,
                )
            ),
            6,
        ).alias("l2_norm"),
        F.when(
            mx > mn, F.round((emb[0].cast("double") - mn) / (mx - mn), 6)
        ).alias("first_minmax_scaled"),
        F.round(dot(emb, F.reverse(emb)), 6).alias("self_reverse_dot"),
    )


@query(
    "q157_asof_forward_tolerance",
    oracle="""
        WITH c AS (
            SELECT user_id, event_id AS click_id, ts AS cts
            FROM events WHERE event_type = 'click'
        ),
        p AS (
            SELECT user_id, event_id AS purchase_id, ts AS pts
            FROM events WHERE event_type = 'purchase'
        ),
        j AS (
            SELECT c.user_id, c.click_id, c.cts, p.purchase_id, p.pts,
                   row_number() OVER (
                       PARTITION BY c.user_id, c.click_id
                       ORDER BY p.pts, p.purchase_id
                   ) AS rn
            FROM c LEFT JOIN p
              ON c.user_id = p.user_id
             AND p.pts > c.cts
             AND p.pts <= c.cts + INTERVAL '30 minutes'
        )
        SELECT user_id, click_id,
               CAST(floor(epoch(cts)) AS BIGINT) AS click_epoch,
               purchase_id,
               CAST(floor(epoch(pts)) AS BIGINT) AS purchase_epoch
        FROM j WHERE rn = 1
    """,
)
def q157_asof_forward_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join with tolerance: every click is attributed to
    the EARLIEST same-user purchase strictly after it and within 30
    minutes (NULLs otherwise) — the pick-one attribution shape, vs
    q101's stream-stream variant that keeps every match. Runs as the
    union + single-windowed-pass operator (one user_id shuffle, no
    range cross-product — the oracle's LEFT JOIN + row_number is the
    quadratic formulation this operator replaces at scale); tiebreak
    among equal-timestamp purchases is the least (ts, purchase_id)
    struct, mirrored by the oracle's ORDER BY."""
    from databricks_etl_spark.operators.asof import asof_join_forward

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("cts"),
    )
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("pts"),
    )
    out = asof_join_forward(
        clicks,
        purchases,
        on="user_id",
        left_ts="cts",
        right_ts="pts",
        payload_cols=["pts", "purchase_id"],
        tolerance_seconds=1800,
    )
    return out.select(
        "user_id",
        "click_id",
        F.unix_timestamp("cts").alias("click_epoch"),
        "purchase_id",
        F.unix_timestamp("pts").alias("purchase_epoch"),
    )
