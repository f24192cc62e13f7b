"""Extended coverage queries: window frames, arg-max, qualified-star
multi-join (hard part (a)), skew-salted join, pandas_udf embedding
near-dup, stateful streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.functions.scalars import decimal_sum
from databricks_etl_spark.operators import similarity as SIM
from databricks_etl_spark.operators.relational import select_star_qualified
from databricks_etl_spark.operators.skew import salted_join
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


@query(
    "q59_running_sum_window",
    oracle="""
        SELECT l_orderkey, l_linenumber,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS DOUBLE) AS running_qty,
               CAST(row_number() OVER (
                   PARTITION BY l_orderkey ORDER BY l_linenumber
               ) AS BIGINT) AS rn
        FROM lineitem
        WHERE l_orderkey < 300
    """,
)
def q59_running_sum_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window frame spec (rowsBetween) + ranking — engine additions
    beyond the reference's single lag window (SURVEY.md §2.5: no frame
    specs exist there). Decimal accumulation keeps the running sum
    bit-stable across engines."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 300)
    w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.sum(F.col("l_quantity").cast("decimal(28,6)")).over(frame).cast("double").alias(
            "running_qty"
        ),
        F.row_number().over(w).cast("long").alias("rn"),
    )


@query(
    "q60_arg_max",
    oracle="""
        SELECT c_mktsegment,
               arg_max(o_orderkey, o_totalprice) AS top_orderkey,
               MAX(o_totalprice) AS top_price
        FROM orders JOIN customer ON o_custkey = c_custkey
        GROUP BY c_mktsegment
    """,
)
def q60_arg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3 max-by, in-engine (the reference does it driver-side over a
    file listing, ``transform.py:43``): the orderkey of each segment's
    priciest order. (o_totalprice values are distinct at this scale, so
    arg_max is unambiguous — both engines break ties arbitrarily
    otherwise.)"""
    o = read_table(spark, sf_dir, "orders")
    c = read_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(
            F.max_by("o_orderkey", "o_totalprice").alias("top_orderkey"),
            F.max("o_totalprice").alias("top_price"),
        )
    )


@query(
    "q61_qualified_star_join",
    oracle="""
        SELECT o.o_orderkey   AS o__o_orderkey,
               o.o_totalprice AS o__o_totalprice,
               c.c_custkey    AS c__c_custkey,
               c.c_name       AS c__c_name,
               n.n_nationkey  AS n__n_nationkey,
               n.n_name       AS n__n_name
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n   ON c.c_nationkey = n.n_nationkey
        WHERE o.o_orderkey < 100
    """,
)
def q61_qualified_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2 qualified-star after a 3-way join with name disambiguation
    (hard part (a)): the reference's ``select('df_bt.*', ...)``
    (``pre_analysis.py:702-705``) produces duplicate labels; the engine
    emits ``alias__col`` names instead."""
    o = read_table(spark, sf_dir, "orders").filter(F.col("o_orderkey") < 100).select(
        "o_orderkey", "o_totalprice", "o_custkey"
    ).alias("o")
    c = read_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_nationkey"
    ).alias("c")
    n = read_table(spark, sf_dir, "nation").select("n_nationkey", "n_name").alias("n")
    joined = o.join(c, F.col("o.o_custkey") == F.col("c.c_custkey")).join(
        F.broadcast(n), F.col("c.c_nationkey") == F.col("n.n_nationkey")
    )
    out = select_star_qualified(
        joined,
        {
            "o": o.select("o_orderkey", "o_totalprice"),
            "c": c.select("c_custkey", "c_name"),
            "n": n,
        },
    )
    return out


@query(
    "q62_salted_skew_join",
    oracle="""
        SELECT o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS qty
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority
    """,
)
def q62_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-salted join (SURVEY.md §4.3): same result as the plain
    equi-join, but the build side is replicated across 8 salt buckets
    so one hot key cannot pin a single shuffle partition. (Default
    path is plain join + AQE skew-split; salting is the explicit
    escape hatch.)"""
    li = read_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    o = read_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    j = salted_join(li, o, "l_orderkey", salt=8)
    return j.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), decimal_sum("l_quantity", "qty")
    )


@query(
    "q65_percentiles",
    oracle="""
        SELECT o_orderstatus,
               quantile_cont(o_totalprice, 0.5) AS p50,
               quantile_cont(o_totalprice, 0.9) AS p90,
               COUNT(*) AS n
        FROM orders
        GROUP BY o_orderstatus
    """,
)
def q65_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (``percentile`` ≡ ANSI
    ``quantile_cont``, bit-identical — verified). The 100 TB default is
    ``percentile_approx`` (one-pass sketch, no per-group sort); exact
    kept on the oracle path."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
        F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )


@query(
    "q66_cube",
    oracle="""
        SELECT o_orderstatus, o_orderpriority,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q66_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dims — all 4 grouping sets in one expand+agg scan
    (engine addition alongside q29 ROLLUP)."""
    o = read_table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"), decimal_sum("o_totalprice", "total")
    )


@query(
    "q67_asof_join_last_click",
    bench=True,
    oracle="""
        SELECT e.event_id,
               e.user_id,
               c.event_id AS click_event_id,
               CAST(floor(epoch(e.ts)) AS BIGINT) AS event_epoch,
               CAST(floor(epoch(c.ts)) AS BIGINT) AS click_epoch
        FROM events e
        ASOF LEFT JOIN (
            SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
        ) c ON e.user_id = c.user_id AND e.ts >= c.ts
    """,
)
def q67_asof_join_last_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (point-in-time): every event matched to the most
    recent click (inclusive) by the same user. Spark lacks a native
    ASOF — implemented as union + partitioned forward-fill (one key
    shuffle, linear; see operators/asof.py); oracle is DuckDB's native
    ASOF LEFT JOIN."""
    from databricks_etl_spark.operators.asof import asof_join

    e = read_table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_event_id"),
        F.col("ts").alias("click_ts"),
    )
    out = asof_join(
        e.select("event_id", "user_id", "ts"),
        clicks,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        payload_cols=["click_event_id", "click_ts"],
    )
    return out.select(
        "event_id",
        "user_id",
        "click_event_id",
        F.unix_timestamp("ts").alias("event_epoch"),
        F.unix_timestamp("click_ts").alias("click_epoch"),
    )


@query(
    "q69_range_join_price_bands",
    oracle="""
        WITH bands AS (
            SELECT 'b0' AS band, 0.0 AS lo, 100000.0 AS hi
            UNION ALL SELECT 'b1', 100000.0, 250000.0
            UNION ALL SELECT 'b2', 250000.0, 400000.0
            UNION ALL SELECT 'b3', 400000.0, 1000000.0
        )
        SELECT band, COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS total
        FROM orders JOIN bands
          ON o_totalprice >= lo AND o_totalprice < hi
        GROUP BY band
    """,
)
def q69_range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join via bucketized equi-join
    (operators/rangejoin.py): the scalable alternative to Spark's
    BroadcastNestedLoopJoin for inequality conditions — O(N·M) becomes
    a hash join on bucket index + exact re-check."""
    from databricks_etl_spark.operators.rangejoin import range_join_bucketed

    o = read_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [
            ("b0", 0.0, 100_000.0),
            ("b1", 100_000.0, 250_000.0),
            ("b2", 250_000.0, 400_000.0),
            ("b3", 400_000.0, 1_000_000.0),
        ],
        "band string, lo double, hi double",
    )
    j = range_join_bucketed(
        o, bands, value_col="o_totalprice", lo_col="lo", hi_col="hi",
        bucket_width=100_000.0,
    )
    return j.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"), decimal_sum("o_totalprice", "total")
    )


@query(
    "q70_except_all_multiset",
    oracle="""
        SELECT l_orderkey, COUNT(*) AS n_remaining
        FROM (
            SELECT l_orderkey FROM lineitem
            EXCEPT ALL
            SELECT l_orderkey FROM lineitem WHERE l_linenumber = 1
        )
        GROUP BY l_orderkey
    """,
)
def q70_except_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset EXCEPT ALL (``exceptAll``) — the counterpart of the
    reference's dedup-ing ``subtract`` (hard part (d)): per-key
    multiplicities are preserved, so each order keeps
    (lines − 1) copies after removing its first line."""
    from databricks_etl_spark.operators.relational import except_all_rows

    li = read_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey")
    b = li.filter(F.col("l_linenumber") == 1).select("l_orderkey")
    return (
        except_all_rows(a, b)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_remaining"))
    )


@query(
    "q71_intersect_all_multiset",
    oracle="""
        SELECT l_orderkey, COUNT(*) AS n_common
        FROM (
            SELECT l_orderkey FROM lineitem WHERE l_linenumber <= 3
            INTERSECT ALL
            SELECT l_orderkey FROM lineitem WHERE l_linenumber >= 2
        )
        GROUP BY l_orderkey
    """,
)
def q71_intersect_all_multiset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset INTERSECT ALL — per-key min(multiplicity) semantics,
    completing the set-op family with q19/q70."""
    li = read_table(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_linenumber") <= 3).select("l_orderkey")
    b = li.filter(F.col("l_linenumber") >= 2).select("l_orderkey")
    return (
        a.intersectAll(b)
        .groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )


@query(
    "q72_from_json_struct",
    oracle="""
        SELECT event_type,
               CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
               COUNT(CAST(props->>'$.k' AS INTEGER)) AS n_parsed
        FROM events
        GROUP BY event_type
    """,
)
def q72_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via ``from_json`` into a struct column (vs
    q27's per-path ``get_json_object``) — the schema-on-read shape for
    semi-structured ``props``; malformed JSON yields NULL fields."""
    e = read_table(spark, sf_dir, "events")
    parsed = e.withColumn("p", F.from_json("props", "k INT"))
    return parsed.groupBy("event_type").agg(
        F.sum(F.col("p.k")).cast("long").alias("sum_k"),
        F.count(F.col("p.k")).alias("n_parsed"),
    )


@query(
    "q77_unpivot_melt",
    oracle="""
        SELECT l_orderkey, measure, CAST(val AS DOUBLE) AS val
        FROM (
            SELECT l_orderkey, 'quantity' AS measure, l_quantity AS val
            FROM lineitem WHERE l_orderkey < 50
            UNION ALL
            SELECT l_orderkey, 'discount', l_discount
            FROM lineitem WHERE l_orderkey < 50
            UNION ALL
            SELECT l_orderkey, 'tax', l_tax
            FROM lineitem WHERE l_orderkey < 50
        )
    """,
)
def q77_unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot / melt via ``stack`` (wide → long, the inverse of q30's
    pivot) — a single projection with row expansion, no shuffle."""
    li = read_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") < 50)
    return li.select(
        "l_orderkey",
        F.expr(
            "stack(3, 'quantity', l_quantity, 'discount', l_discount, 'tax', l_tax)"
            " as (measure, val)"
        ),
    )


@query(
    "q78_array_functions",
    oracle="""
        SELECT vec_id,
               CAST(len(embedding) AS BIGINT) AS dim,
               round(CAST(list_min(embedding) AS DOUBLE), 6) AS vmin,
               round(CAST(list_max(embedding) AS DOUBLE), 6) AS vmax,
               round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
                     / len(embedding), 6) AS vmean,
               CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
        FROM embeddings
        WHERE vec_id < 100
    """,
)
def q78_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array higher-order functions (size/min/max/aggregate/filter) —
    the JVM-side array toolkit the similarity operators build on,
    exposed as per-vector statistics."""
    e = read_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    total = F.aggregate(
        F.col("embedding"), F.lit(0.0), lambda acc, x: acc + x.cast("double")
    )
    return e.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.round(F.array_min("embedding").cast("double"), 6).alias("vmin"),
        F.round(F.array_max("embedding").cast("double"), 6).alias("vmax"),
        F.round(total / F.size("embedding"), 6).alias("vmean"),
        F.size(F.filter(F.col("embedding"), lambda x: x > 0)).cast("long").alias("n_pos"),
    )


@query(
    "q79_zscore_within_group",
    oracle="""
        SELECT c_custkey, c_mktsegment,
               round((c_acctbal - AVG(c_acctbal) OVER w)
                     / stddev_samp(c_acctbal) OVER w, 4) AS acctbal_z
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment)
    """,
)
def q79_zscore_within_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-group normalization (z-score per market segment) via an
    unordered analytic window — one shuffle on the group key. The
    grouped-map ``applyInPandas`` formulation of the same operator is
    cross-validated against this in tests/test_grouped_map.py."""
    c = read_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment")
    z = (F.col("c_acctbal") - F.avg("c_acctbal").over(w)) / F.stddev_samp(
        "c_acctbal"
    ).over(w)
    return c.select("c_custkey", "c_mktsegment", F.round(z, 4).alias("acctbal_z"))


@query("q63_embedding_neardup_docs", oracle=None)
def q63_embedding_neardup_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup over documents: Pandas-UDF stub
    embedding (md5 feature hashing — deterministic) + BRP-LSH bucketed
    candidate pairs + exact cosine re-rank ≥ 0.98 — no cross product
    in the plan (cos ≥ t on unit vectors ⇔ euclidean ≤ √(2(1−t)), a
    bounded-radius LSH search). Rows-only (seeded projections + md5
    embedding aren't SQL-expressible); recall vs the all-pairs exact
    baseline and plan shape asserted in tests."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return SIM.embedding_neardup_pairs(SIM.embed_text_stub(d), threshold=0.98)


@query(
    "q64_stateful_running_totals",
    oracle="""
        SELECT user_id,
               COUNT(*) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS total_value
        FROM events
        GROUP BY user_id
    """,
)
def q64_stateful_running_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful streaming operator (applyInPandasWithState):
    running per-user (count, sum) maintained in GroupState, driven to
    completion with availableNow. State carries the value sum in exact
    integer micro-units (int64 addition is associative, so the final
    total is independent of arrival/batch order — the stateful analog
    of the decimal-sum rule), which makes the drained result
    hash-checkable against DuckDB's exact decimal aggregate (q131
    pattern). Batch equality also asserted in
    tests/test_streaming.py."""
    from databricks_etl_spark.streaming.stateful import run_running_totals_stream

    return run_running_totals_stream(spark, sf_dir)


@query(
    "q135_variant_json",
    oracle="""
        SELECT event_type,
               COUNT(CAST(props->>'$.k' AS INTEGER)) AS n_parsed,
               CAST(SUM(CASE WHEN CAST(props->>'$.k' AS INTEGER) >= 50
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
               CAST(MAX(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS max_k
        FROM events
        GROUP BY event_type
    """,
)
def q135_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured JSON via Spark 4 VARIANT (``parse_json`` +
    ``try_variant_get``) — the open-schema alternative to q72's
    fixed-struct ``from_json``: the binary variant encoding keeps
    shredded field access columnar without declaring a schema up
    front, the engine-native way to hold heterogeneous event payloads
    at 100 TB. ``try_variant_get`` yields NULL on missing/mistyped
    paths (same contract as the oracle's ->> cast)."""
    e = read_table(spark, sf_dir, "events")
    k = F.try_variant_get(F.parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").alias("n_parsed"),
            F.sum(F.when(F.col("k") >= 50, 1).otherwise(0))
            .cast("long")
            .alias("n_high"),
            F.max("k").cast("long").alias("max_k"),
        )
    )


@query(
    "q136_nested_line_structs",
    oracle="""
        WITH g AS (
            SELECT l_orderkey,
                   list_sort(list(struct_pack(
                       ln := l_linenumber,
                       qty := l_quantity,
                       px := CAST(l_extendedprice AS DECIMAL(28,6))
                   ))) AS lines
            FROM lineitem GROUP BY 1
        )
        SELECT l_orderkey,
               CAST(len(lines) AS INTEGER) AS n_lines,
               CAST(len(list_filter(lines, x -> x.qty >= 30)) AS INTEGER)
                   AS n_big,
               COALESCE(CAST(list_sum(list_transform(
                   list_filter(lines, x -> x.qty >= 30), x -> x.px
               )) AS DOUBLE), 0.0) AS big_rev
        FROM g
    """,
)
def q136_nested_line_structs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested array-of-structs surface: order lines collected into a
    SORTED struct array (sort_array fixes collect_list's
    nondeterministic order — the rule for any collected array), then
    processed entirely with higher-order functions (filter /
    transform / aggregate lambdas) — no explode-regroup round trip,
    no UDF. The fold accumulates in exact decimal over the sorted
    array, so the cross-engine sum is order-stable by construction."""
    li = read_table(spark, sf_dir, "lineitem")
    dec = "decimal(28,6)"
    g = li.groupBy("l_orderkey").agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    F.col("l_linenumber").alias("ln"),
                    F.col("l_quantity").alias("qty"),
                    F.col("l_extendedprice").cast(dec).alias("px"),
                )
            )
        ).alias("lines")
    )
    big = F.filter(F.col("lines"), lambda x: x["qty"] >= 30)
    return g.select(
        "l_orderkey",
        F.size("lines").alias("n_lines"),
        F.size(big).alias("n_big"),
        F.aggregate(
            big,
            F.lit(0).cast(dec),
            # decimal + widens to (29,6); re-cast keeps the accumulator type
            lambda acc, x: (acc + x["px"]).cast(dec),
        )
        .cast("double")
        .alias("big_rev"),
    )
