r"""Round-5 queries: the operational layer of a 100 TB ingestion run.

Every query here is a job a production training-data pipeline schedules
around the core operators the repo already proves — windowed batch
dedup (the batch twin of ``dropDuplicatesWithinWatermark``), pre-join
cardinality/skew sizing, per-source contamination drill-down, the
capstone multi-stage ingestion funnel, partition planning, tombstone
cascades, split assignment, and batch-over-batch novelty. All are
DuckDB-oracled (exact value parity); none has a reference analog (the
reference is a 3-notebook tabular ETL client — SURVEY.md §2.12
north-star surface).

Cross-engine determinism: counts/sums are integer or decimal-
accumulated; the only float divisions happen once per output row on
exact integer inputs (IEEE-correctly-rounded in both engines), then
round(…, 6); portable fingerprints use md5 (instr-nibble decoding, the
q163/q172 technique), never engine-seeded hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


# ---------------------------------------------------------------------------
# q225 — windowed batch dedup (dropDuplicatesWithinWatermark's batch twin)
# ---------------------------------------------------------------------------


@query(
    "q225_windowed_batch_dedup",
    oracle="""
        WITH k AS (
            SELECT CAST(floor(epoch(ts) / 600) * 600 AS BIGINT) AS ws_epoch,
                   event_type, user_id, COUNT(*) AS n_in_key
            FROM events GROUP BY 1, 2, 3
        )
        SELECT ws_epoch, event_type,
               CAST(SUM(n_in_key) AS BIGINT) AS n_raw,
               CAST(COUNT(*) AS BIGINT) AS n_kept,
               CAST(SUM(n_in_key) - COUNT(*) AS BIGINT) AS n_dropped
        FROM k GROUP BY 1, 2
    """,
)
def q225_windowed_batch_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed dedup across an ingestion batch: within each 10-minute
    event-time window, one event per (user, event_type) survives — the
    deterministic batch twin of the streaming
    ``dropDuplicatesWithinWatermark`` path (q93), reporting per-window
    raw/kept/dropped so a replayed batch can be audited against the
    stream's state-store dedup.

    Plan: ONE shuffle chain — partial-combinable count per
    (window, key), then a map-combinable rollup to (window, type); the
    dedup itself never materializes survivor rows, only counts. 100 TB:
    both aggregates are pre-aggregated map-side; state is bounded by
    live windows, exactly like the stream."""
    e = read_table(spark, sf_dir, "events")
    ws = (F.floor(F.unix_timestamp("ts") / 600) * 600).cast("long")
    per_key = (
        e.groupBy(ws.alias("ws_epoch"), "event_type", "user_id")
        .agg(F.count(F.lit(1)).alias("n_in_key"))
    )
    return per_key.groupBy("ws_epoch", "event_type").agg(
        F.sum("n_in_key").cast("long").alias("n_raw"),
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        (F.sum("n_in_key") - F.count(F.lit(1))).cast("long").alias("n_dropped"),
    )


# ---------------------------------------------------------------------------
# q226 — pre-join cardinality + skew sizing from key histograms
# ---------------------------------------------------------------------------


@query(
    "q226_join_size_estimation",
    oracle="""
        WITH l AS (SELECT user_id AS k, COUNT(*) AS nl FROM events GROUP BY 1),
             r AS (SELECT o_custkey AS k, COUNT(*) AS nr FROM orders GROUP BY 1),
             j AS (SELECT l.k, nl * nr AS contrib FROM l JOIN r USING (k))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_common_keys,
               CAST(SUM(contrib) AS BIGINT) AS predicted_join_rows,
               CAST(MAX(contrib) AS BIGINT) AS max_key_rows,
               round(CAST(MAX(contrib) AS DOUBLE) / SUM(contrib), 6) AS skew_share
        FROM j
    """,
)
def q226_join_size_estimation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join sizing: predict |events ⋈ orders| on the user key from
    the two per-key count histograms (Σ n_l(k)·n_r(k)) WITHOUT running
    the join — the planner-style estimate a pipeline computes before
    choosing shuffle partitions / salting for a 100 TB join. Also
    emits the largest single-key contribution and its share: the skew
    signal that decides whether the join needs salting (q62) or AQE
    skew-split.

    Plan: two map-combinable aggregates + a join of the (small)
    histograms — the whole point is that this costs O(distinct keys),
    not O(join output)."""
    e = read_table(spark, sf_dir, "events")
    o = read_table(spark, sf_dir, "orders")
    left = e.groupBy(F.col("user_id").alias("k")).agg(
        F.count(F.lit(1)).alias("nl")
    )
    right = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count(F.lit(1)).alias("nr")
    )
    j = left.join(right, "k").select(
        (F.col("nl") * F.col("nr")).alias("contrib")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_common_keys"),
        F.sum("contrib").cast("long").alias("predicted_join_rows"),
        F.max("contrib").cast("long").alias("max_key_rows"),
        F.round(
            F.max("contrib").cast("double") / F.sum("contrib"), 6
        ).alias("skew_share"),
    )


# ---------------------------------------------------------------------------
# q227 — contamination drill-down by source
# ---------------------------------------------------------------------------

_GRAMS4_SQL = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g4 AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3])) AS gs
        FROM t WHERE len(toks) >= 4
    ),
    e4 AS (SELECT doc_id, unnest(gs) AS g FROM g4)
"""


@query(
    "q227_contamination_by_source",
    oracle=f"""
        WITH {_GRAMS4_SQL},
        ev AS (SELECT DISTINCT g FROM e4 WHERE doc_id % 50 = 0),
        hit AS (
            SELECT DISTINCT e4.doc_id FROM e4 JOIN ev USING (g)
            WHERE e4.doc_id % 50 <> 0
        ),
        tot AS (
            SELECT source, COUNT(*) AS n_docs FROM documents
            WHERE doc_id % 50 <> 0 GROUP BY 1
        ),
        bad AS (
            SELECT d.source, COUNT(*) AS n_contaminated
            FROM hit JOIN documents d USING (doc_id) GROUP BY 1
        )
        SELECT t.source, CAST(t.n_docs AS BIGINT) AS n_docs,
               CAST(COALESCE(b.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               round(CAST(COALESCE(b.n_contaminated, 0) AS DOUBLE) / t.n_docs, 6)
                   AS contamination_rate
        FROM tot t LEFT JOIN bad b ON t.source = b.source
    """,
)
def q227_contamination_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contamination drill-down: q152's doc-level benchmark
    -overlap audit rolled up to the ingestion SOURCE — the report that
    decides which feeds get quarantined rather than which documents
    get dropped. A source with a high rate is systematically scraping
    the eval set; a uniform low rate is chance n-gram overlap.

    Plan: gram build + one equi-join against the eval gram set (AQE
    broadcasts it while small — it scales with the corpus, so no hard
    hint), distinct doc hits, then a source rollup joined to per-source
    totals. 100 TB: identical to q152 plus one bounded-key (≤ sources)
    aggregate."""
    d = read_table(spark, sf_dir, "documents")
    grams = TX.shingles(d, 4).distinct().withColumnRenamed("shingle", "g")
    ev = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    corpus = grams.filter(F.col("doc_id") % 50 != 0)
    hit = corpus.join(ev, "g").select("doc_id").distinct()
    tot = (
        d.filter(F.col("doc_id") % 50 != 0)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    bad = (
        hit.join(d.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return tot.join(bad, "source", "left").select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce("n_contaminated", F.lit(0)).cast("long").alias("n_contaminated"),
        F.round(
            F.coalesce("n_contaminated", F.lit(0)).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("contamination_rate"),
    )


# ---------------------------------------------------------------------------
# q228 — capstone: daily ingestion funnel (clean → dedup → quality gate)
# ---------------------------------------------------------------------------


@query(
    "q228_ingestion_capstone",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, text, lang, source, n_chars FROM documents
            UNION ALL
            SELECT doc_id + 100000, text, lang, source, n_chars FROM documents
        ),
        valid AS (
            SELECT * FROM raw WHERE n_chars >= 150 AND lang IS NOT NULL
        ),
        uniq AS (
            SELECT min(doc_id) AS doc_id, arg_min(source, doc_id) AS source,
                   text
            FROM valid GROUP BY text
        ),
        scored AS (
            SELECT source, len({_TOKS}) AS n_toks FROM uniq
        ),
        s_raw AS (SELECT source, COUNT(*) AS n_ingested FROM raw GROUP BY 1),
        s_valid AS (SELECT source, COUNT(*) AS n_valid FROM valid GROUP BY 1),
        s_uniq AS (
            SELECT source, COUNT(*) AS n_unique,
                   COUNT(*) FILTER (n_toks >= 30) AS n_quality
            FROM scored GROUP BY 1
        )
        SELECT r.source,
               CAST(r.n_ingested AS BIGINT) AS n_ingested,
               CAST(COALESCE(v.n_valid, 0) AS BIGINT) AS n_valid,
               CAST(COALESCE(u.n_unique, 0) AS BIGINT) AS n_unique,
               CAST(COALESCE(u.n_quality, 0) AS BIGINT) AS n_quality,
               round(CAST(COALESCE(u.n_quality, 0) AS DOUBLE) / r.n_ingested, 6)
                   AS yield_rate
        FROM s_raw r
        LEFT JOIN s_valid v ON r.source = v.source
        LEFT JOIN s_uniq u ON r.source = u.source
    """,
)
def q228_ingestion_capstone(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The daily-ingestion capstone: one query chaining the pipeline's
    stages — ingest (crawl + re-crawl simulated by the q42 shifted
    union), validity filter (length + language), exact content dedup
    (keep-first survivor, attributed to the survivor's source), token
    quality gate — into a per-source funnel report with final yield.
    This is the morning dashboard for a 100 TB/day corpus: which feed
    collapsed at which stage.

    Plan: validity flags are scan-local; the only wide exchanges are
    the content-hash dedup (at 100 TB: on md5(text), bounding shuffle
    width) and per-source rollups on a bounded key. Token counting
    runs AFTER dedup — never tokenize rows that dedup will drop."""
    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "source", "n_chars"
    )
    raw = d.union(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )
    is_valid = (F.col("n_chars") >= 150) & F.col("lang").isNotNull()
    # stage counts fuse into ONE conditional aggregate over the corpus
    # (never one scan per funnel stage — the q153 single-scan rule)
    s_counts = raw.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_ingested"),
        F.count_if(is_valid).alias("n_valid"),
    )
    uniq = raw.filter(is_valid).groupBy("text").agg(
        F.min("doc_id").alias("doc_id"),
        F.min_by("source", "doc_id").alias("source"),
    )
    scored = uniq.select(
        "source", F.size(TX.tokens_col("text")).alias("n_toks")
    )
    s_uniq = scored.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_unique"),
        F.count_if(F.col("n_toks") >= 30).alias("n_quality"),
    )
    return (
        s_counts.join(s_uniq, "source", "left")
        .select(
            "source",
            F.col("n_ingested").cast("long").alias("n_ingested"),
            F.col("n_valid").cast("long").alias("n_valid"),
            F.coalesce("n_unique", F.lit(0)).cast("long").alias("n_unique"),
            F.coalesce("n_quality", F.lit(0)).cast("long").alias("n_quality"),
            F.round(
                F.coalesce("n_quality", F.lit(0)).cast("double")
                / F.col("n_ingested"),
                6,
            ).alias("yield_rate"),
        )
    )


# ---------------------------------------------------------------------------
# q229 — join-key skew audit across the schema
# ---------------------------------------------------------------------------

_SKEW_KEYS = [
    ("orders", "o_custkey"),
    ("lineitem", "l_orderkey"),
    ("lineitem", "l_suppkey"),
    ("events", "user_id"),
]


def _skew_sql(tbl: str, col: str) -> str:
    return f"""
        SELECT '{tbl}' AS tbl, '{col}' AS key_col,
               CAST(SUM(c) AS BIGINT) AS n_rows,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(MAX(c) AS BIGINT) AS max_key_rows,
               round(CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c), 6)
                   AS skew_factor
        FROM (SELECT {col}, COUNT(*) AS c FROM {tbl} GROUP BY 1)
    """


@query(
    "q229_skew_factor_audit",
    oracle=" UNION ALL ".join(_skew_sql(t, c) for t, c in _SKEW_KEYS),
)
def q229_skew_factor_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-wide join-key skew audit: for every key a pipeline joins
    or aggregates on, the max-key/mean-key row ratio — the number that
    decides per-join whether plain hash partitioning is safe or the
    key needs salting (q62) / AQE skew-split at 100 TB. A skew factor
    near 1 is uniform; >> 1 means the hottest key dominates a reducer.

    Plan: one map-combinable per-key count per audited key (the same
    aggregate AQE's runtime statistics come from), each collapsing to
    a 1-row summary; 4 rows out. lineitem is read once per audited key
    (two column-pruned single-column scans) — cheaper at scale than
    one scan + a 2x expand shuffle via grouping sets."""
    parts = []
    for tbl, col in _SKEW_KEYS:
        t = read_table(spark, sf_dir, tbl)
        per_key = t.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        parts.append(
            per_key.agg(
                F.sum("c").cast("long").alias("n_rows"),
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.max("c").cast("long").alias("max_key_rows"),
                F.round(
                    F.max("c").cast("double") * F.count(F.lit(1)) / F.sum("c"),
                    6,
                ).alias("skew_factor"),
            ).select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("key_col"),
                "n_rows", "n_keys", "max_key_rows", "skew_factor",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# q230 — embedding hygiene gate (vector-column DQ)
# ---------------------------------------------------------------------------


@query(
    "q230_embedding_hygiene",
    oracle="""
        WITH v AS (
            SELECT len(embedding) AS dim,
                   len(list_filter(embedding,
                       x -> isnan(CAST(x AS DOUBLE)) OR isinf(CAST(x AS DOUBLE))))
                       > 0 AS bad,
                   list_sum(list_transform(embedding,
                       x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))) AS norm2
            FROM embeddings
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
               CAST(MIN(dim) AS BIGINT) AS dim_min,
               CAST(MAX(dim) AS BIGINT) AS dim_max,
               CAST(COUNT(*) FILTER (bad) AS BIGINT) AS n_nonfinite,
               CAST(COUNT(*) FILTER (NOT bad AND norm2 = 0) AS BIGINT)
                   AS n_zero_norm,
               round(CAST(SUM(CAST(round(sqrt(norm2), 6) AS DECIMAL(28,6)))
                              FILTER (NOT bad) AS DOUBLE)
                     / COUNT(*) FILTER (NOT bad), 6) AS avg_norm,
               round(MAX(sqrt(norm2)) FILTER (NOT bad), 6) AS max_norm
        FROM v
    """,
)
def q230_embedding_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-column hygiene gate run before any ANN/dedup job ships:
    dimension drift (ragged arrays), non-finite values, zero-norm
    vectors (cosine would divide by zero), and the norm profile. The
    embedding analog of the q188 DQ suite — a single fused pass.

    Determinism: per-row norm² is the same sequential fold both
    engines run (q47's proven pattern); the norm AVERAGE accumulates
    round(‖v‖, 6) as DECIMAL so the cross-row sum is order-independent
    (README decimal-sum rule). Plan: one scan, all aggregates fused
    and map-combinable; 1 row out."""
    e = read_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    v = e.select(
        F.size("embedding").alias("dim"),
        F.exists(
            "embedding",
            lambda x: F.isnan(xd(x)) | (F.abs(xd(x)) == F.lit(float("inf"))),
        ).alias("bad"),
        F.aggregate(
            "embedding", F.lit(0.0), lambda acc, x: acc + xd(x) * xd(x)
        ).alias("norm2"),
    )
    ok = ~F.col("bad")
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("n_vectors"),
        F.min("dim").cast("long").alias("dim_min"),
        F.max("dim").cast("long").alias("dim_max"),
        F.count_if(F.col("bad")).cast("long").alias("n_nonfinite"),
        F.count_if(ok & (F.col("norm2") == 0)).cast("long").alias("n_zero_norm"),
        F.round(
            F.sum(
                F.when(ok, F.round(F.sqrt("norm2"), 6).cast("decimal(28,6)"))
            ).cast("double")
            / F.count_if(ok),
            6,
        ).alias("avg_norm"),
        F.round(F.max(F.when(ok, F.sqrt("norm2"))), 6).alias("max_norm"),
    )


# ---------------------------------------------------------------------------
# q231 — cross-shard duplicate audit
# ---------------------------------------------------------------------------


@query(
    "q231_cross_shard_duplicates",
    oracle="""
        WITH raw AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000, text FROM documents
        ),
        g AS (
            SELECT min(doc_id) AS group_id,
                   COUNT(*) AS n_copies,
                   COUNT(DISTINCT doc_id % 16) AS n_shards
            FROM raw GROUP BY text
        )
        SELECT group_id, CAST(n_copies AS BIGINT) AS n_copies,
               CAST(n_shards AS BIGINT) AS n_shards,
               n_shards > 1 AS cross_shard
        FROM g
    """,
)
def q231_cross_shard_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-shard duplicate audit: for every duplicate-content group
    (q42's crawl + re-crawl corpus), how many hash shards (doc_id % 16,
    q175's layout) it spans. If most groups are shard-local, dedup can
    run shard-parallel with no global shuffle; cross-shard groups are
    the rows that force a global content-key exchange — this query
    measures that fraction before committing to a dedup topology.

    Plan: one content-key aggregate carrying (min id, count, distinct
    shard) — at 100 TB the group key is md5(text) (q42 rule) and the
    distinct-shard count is bounded by 16, so the aggregate stays
    map-combinable."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = d.union(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    g = raw.groupBy("text").agg(
        F.min("doc_id").alias("group_id"),
        F.count(F.lit(1)).alias("n_copies"),
        F.count_distinct(F.col("doc_id") % 16).alias("n_shards"),
    )
    return g.select(
        "group_id",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("n_shards").cast("long").alias("n_shards"),
        (F.col("n_shards") > 1).alias("cross_shard"),
    )


# ---------------------------------------------------------------------------
# q232 — post-dedup token budget by source
# ---------------------------------------------------------------------------


@query(
    "q232_dedup_token_budget",
    oracle=f"""
        WITH raw AS (
            SELECT doc_id, text, source FROM documents
            UNION ALL
            SELECT doc_id + 100000, text, source FROM documents
        ),
        tokd AS (SELECT doc_id, source, len({_TOKS}) AS n_toks FROM raw),
        surv AS (
            SELECT arg_min(source, doc_id) AS source,
                   min(doc_id) AS doc_id, len({_TOKS}) AS n_toks
            FROM raw GROUP BY text
        ),
        r AS (
            SELECT source, COUNT(*) AS raw_docs, SUM(n_toks) AS raw_tokens
            FROM tokd GROUP BY 1
        ),
        u AS (
            SELECT source, COUNT(*) AS unique_docs, SUM(n_toks) AS unique_tokens
            FROM surv GROUP BY 1
        )
        SELECT r.source,
               CAST(r.raw_docs AS BIGINT) AS raw_docs,
               CAST(r.raw_tokens AS BIGINT) AS raw_tokens,
               CAST(COALESCE(u.unique_docs, 0) AS BIGINT) AS unique_docs,
               CAST(COALESCE(u.unique_tokens, 0) AS BIGINT) AS unique_tokens,
               round(1.0 - CAST(COALESCE(u.unique_tokens, 0) AS DOUBLE)
                     / r.raw_tokens, 6) AS dup_token_share
        FROM r LEFT JOIN u ON r.source = u.source
    """,
)
def q232_dedup_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Post-dedup token budget: raw vs surviving tokens per source —
    the number that actually matters when sizing a training run
    (epochs are counted in unique tokens, not crawled tokens). A
    source with a high dup_token_share is re-crawling itself; its raw
    volume overstates its contribution.

    Plan: token counts are scan-local; one content-key dedup shuffle
    (md5(text) at 100 TB) keeping min-id survivor + its source, then
    bounded-key source rollups. Integer sums only — the single
    division happens once per output row."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text", "source")
    raw = d.union(
        d.select((F.col("doc_id") + 100000).alias("doc_id"), "text", "source")
    )
    # ONE corpus pass: group to (text, source) first — tokenize each
    # distinct text once (not once per copy), carry copy counts, then
    # resolve the min-doc_id survivor at the (distinct text) level
    ts = (
        raw.groupBy("text", "source")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min("doc_id").alias("min_doc"),
        )
        .withColumn("n_toks", F.size(TX.tokens_col("text")))
        # two consumers (survivor resolution + raw rollup): materialize
        # the corpus pass once — far smaller than re-scanning + re-
        # shuffling the corpus per consumer (the q185 treatment)
        .localCheckpoint(eager=False)
    )
    surv = ts.groupBy("text").agg(
        F.min_by("source", "min_doc").alias("source"),
        F.min_by("n_toks", "min_doc").alias("n_toks"),
    )
    r = ts.groupBy("source").agg(
        F.sum("n_copies").alias("raw_docs"),
        F.sum(F.col("n_copies") * F.col("n_toks")).alias("raw_tokens"),
    )
    u = surv.groupBy("source").agg(
        F.count(F.lit(1)).alias("unique_docs"),
        F.sum("n_toks").alias("unique_tokens"),
    )
    return r.join(u, "source", "left").select(
        "source",
        F.col("raw_docs").cast("long").alias("raw_docs"),
        F.col("raw_tokens").cast("long").alias("raw_tokens"),
        F.coalesce("unique_docs", F.lit(0)).cast("long").alias("unique_docs"),
        F.coalesce("unique_tokens", F.lit(0)).cast("long").alias("unique_tokens"),
        F.round(
            1.0
            - F.coalesce("unique_tokens", F.lit(0)).cast("double")
            / F.col("raw_tokens"),
            6,
        ).alias("dup_token_share"),
    )


# ---------------------------------------------------------------------------
# q233 — tombstone cascade (GDPR delete impact)
# ---------------------------------------------------------------------------


@query(
    "q233_tombstone_cascade",
    oracle="""
        WITH tomb AS (SELECT c_custkey FROM customer WHERE c_custkey % 97 = 0),
        del_o AS (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM tomb)
        )
        SELECT 'customer' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) FILTER (c_custkey % 97 = 0) AS BIGINT) AS n_deleted,
               round(CAST(COUNT(*) FILTER (c_custkey % 97 = 0) AS DOUBLE)
                     / COUNT(*), 6) AS frac_deleted
        FROM customer
        UNION ALL
        SELECT 'orders', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (o_custkey IN (SELECT c_custkey FROM tomb))
                   AS BIGINT),
               round(CAST(COUNT(*) FILTER (
                   o_custkey IN (SELECT c_custkey FROM tomb)) AS DOUBLE)
                   / COUNT(*), 6)
        FROM orders
        UNION ALL
        SELECT 'lineitem', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (l_orderkey IN (SELECT o_orderkey FROM del_o))
                   AS BIGINT),
               round(CAST(COUNT(*) FILTER (
                   l_orderkey IN (SELECT o_orderkey FROM del_o)) AS DOUBLE)
                   / COUNT(*), 6)
        FROM lineitem
        UNION ALL
        SELECT 'events', CAST(COUNT(*) AS BIGINT),
               CAST(COUNT(*) FILTER (user_id IN (SELECT c_custkey FROM tomb))
                   AS BIGINT),
               round(CAST(COUNT(*) FILTER (
                   user_id IN (SELECT c_custkey FROM tomb)) AS DOUBLE)
                   / COUNT(*), 6)
        FROM events
    """,
)
def q233_tombstone_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-erasure impact report: given a customer tombstone set
    (every 97th key stands in for the deletion queue), count the rows
    each downstream table would lose — orders by ownership, lineitem
    through the order cascade, events by user id — BEFORE running the
    destructive MERGE (q98's machinery). The dry-run a compliance
    pipeline schedules daily.

    Plan: semi-join membership flags folded into per-table conditional
    aggregates — one scan per table; the tombstone set scales with
    |customer|, so no hard broadcast hint (AQE decides). 4 rows out."""
    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    li = read_table(spark, sf_dir, "lineitem")
    e = read_table(spark, sf_dir, "events")
    tomb = c.filter(F.col("c_custkey") % 97 == 0).select("c_custkey")
    del_o = o.join(
        tomb, o.o_custkey == tomb.c_custkey, "left_semi"
    ).select("o_orderkey")

    def _row(tbl: str, df: DataFrame, flag) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.count_if(flag).cast("long").alias("n_deleted"),
            F.round(
                F.count_if(flag).cast("double") / F.count(F.lit(1)), 6
            ).alias("frac_deleted"),
        ).select(F.lit(tbl).alias("tbl"), "n_rows", "n_deleted", "frac_deleted")

    cust = _row("customer", c, F.col("c_custkey") % 97 == 0)
    ords = _row(
        "orders",
        o.join(
            tomb.withColumn("__t", F.lit(1)),
            o.o_custkey == tomb.c_custkey,
            "left",
        ),
        F.col("__t").isNotNull(),
    )
    lis = _row(
        "lineitem",
        li.join(
            del_o.withColumn("__t", F.lit(1)),
            li.l_orderkey == del_o.o_orderkey,
            "left",
        ),
        F.col("__t").isNotNull(),
    )
    evs = _row(
        "events",
        e.join(
            tomb.withColumn("__t", F.lit(1)),
            e.user_id == tomb.c_custkey,
            "left",
        ),
        F.col("__t").isNotNull(),
    )
    return cust.unionAll(ords).unionAll(lis).unionAll(evs)


# ---------------------------------------------------------------------------
# q234 — deterministic train/val/test split assignment
# ---------------------------------------------------------------------------

_NIB = "instr('0123456789abcdef', substr({h}, {k}, 1)) - 1"


def split_sql(col: str) -> str:
    """The q234 portable md5-nibble split rule as an ANSI-SQL fragment:
    first two nibbles of md5(col) → 0..255; <204 train, <230 val, else
    test (~80/10/10). THE single source of the thresholds/positions —
    every consumer (q234's own oracle, q337's leakage audit) embeds
    this fragment so the rule cannot drift per-query. Twin of
    :func:`split_col`; keep the two in lockstep."""
    h = f"md5(CAST({col} AS VARCHAR))"
    v = f"(({_NIB.format(h=h, k=1)}) * 16 + ({_NIB.format(h=h, k=2)}))"
    return (
        f"CASE WHEN {v} < 204 THEN 'train' "
        f"WHEN {v} < 230 THEN 'val' ELSE 'test' END"
    )


def split_col(col: str) -> F.Column:
    """Spark twin of :func:`split_sql` — the same md5-nibble rule as a
    pure scan-local Column expression (no shuffle, engine-portable)."""
    h = F.md5(F.col(col).cast("string"))
    nib = lambda k: F.instr(F.lit("0123456789abcdef"), F.substring(h, k, 1)) - 1  # noqa: E731
    v = nib(1) * 16 + nib(2)
    return F.when(v < 204, "train").when(v < 230, "val").otherwise("test")


@query(
    "q234_train_split_assignment",
    oracle=f"""
        WITH s AS (
            SELECT lang, {split_sql('doc_id')} AS split FROM documents
        ),
        per AS (SELECT lang, split, COUNT(*) AS n_docs FROM s GROUP BY 1, 2),
        tot AS (SELECT lang, SUM(n_docs) AS n_lang FROM per GROUP BY 1)
        SELECT per.lang, per.split, CAST(per.n_docs AS BIGINT) AS n_docs,
               round(CAST(per.n_docs AS DOUBLE) / tot.n_lang, 6) AS frac_of_lang
        FROM per JOIN tot ON per.lang = tot.lang
    """,
)
def q234_train_split_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic, engine-portable train/val/test split (~80/10/10)
    stratified by language: the assignment is a pure function of
    md5(doc_id) (first two nibbles → 0..255; <204 train, <230 val,
    else test), so ANY engine — Spark today, DuckDB in the oracle, a
    feature store tomorrow — derives the identical split with no
    stored assignment table and no leakage across re-runs. The q125
    portable-bucketing idea applied to eval hygiene.

    Plan: assignment is scan-local (one md5 per row, no shuffle);
    the report is a bounded-key (lang × 3) rollup. 100 TB: embarrass-
    ingly parallel."""
    d = read_table(spark, sf_dir, "documents")
    s = d.select("lang", split_col("doc_id").alias("split"))
    per = s.groupBy("lang", "split").agg(F.count(F.lit(1)).alias("n_docs"))
    tot = per.groupBy("lang").agg(F.sum("n_docs").alias("n_lang"))
    return per.join(tot, "lang").select(
        "lang",
        "split",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.round(F.col("n_docs").cast("double") / F.col("n_lang"), 6).alias(
            "frac_of_lang"
        ),
    )


# ---------------------------------------------------------------------------
# q235 — range-partition plan from a fixed-width histogram
# ---------------------------------------------------------------------------

_BAND_W = 25000
_N_PARTS = 8


@query(
    "q235_range_partition_plan",
    oracle=f"""
        WITH hist AS (
            SELECT CAST(floor(o_totalprice / {_BAND_W}) AS BIGINT) AS band,
                   COUNT(*) AS n_rows
            FROM orders GROUP BY 1
        ),
        cum AS (
            SELECT band, n_rows,
                   COALESCE(SUM(n_rows) OVER (
                       ORDER BY band ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS cum_before,
                   SUM(n_rows) OVER () AS total
            FROM hist
        )
        SELECT band, band * {_BAND_W}.0 AS band_lo,
               CAST(n_rows AS BIGINT) AS n_rows,
               CAST(cum_before AS BIGINT) AS cum_before,
               CAST((cum_before * {_N_PARTS}) // total AS INT)
                   AS assigned_partition
        FROM cum
    """,
)
def q235_range_partition_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-partition planning without a global sort: build a fixed-
    width value histogram (one map-combinable aggregate), then assign
    each band to one of {_N_PARTS} equi-depth output partitions by its
    cumulative row count — the same boundary computation
    ``repartitionByRange`` approximates by reservoir sampling, made
    exact and auditable. The window runs over the HISTOGRAM (bounded:
    ~20 bands here, price-range/width always), never over the data.

    Determinism: floor(price/width) and integer cumsum — no float
    accumulation; the partition index is pure integer math."""
    o = read_table(spark, sf_dir, "orders")
    hist = (
        o.groupBy(
            F.floor(F.col("o_totalprice") / _BAND_W).cast("long").alias("band")
        )
        .agg(F.count(F.lit(1)).alias("n_rows"))
    )
    w = Window.orderBy("band").rowsBetween(Window.unboundedPreceding, -1)
    cum = hist.select(
        "band",
        "n_rows",
        F.coalesce(F.sum("n_rows").over(w), F.lit(0)).alias("cum_before"),
        F.sum("n_rows").over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("total"),
    )
    return cum.select(
        "band",
        (F.col("band") * float(_BAND_W)).alias("band_lo"),
        F.col("n_rows").cast("long").alias("n_rows"),
        F.col("cum_before").cast("long").alias("cum_before"),
        F.expr(f"CAST((cum_before * {_N_PARTS}) DIV total AS INT)").alias(
            "assigned_partition"
        ),
    )


# ---------------------------------------------------------------------------
# q236 — batch-over-batch novelty rate
# ---------------------------------------------------------------------------


@query(
    "q236_novelty_by_batch",
    oracle="""
        WITH raw AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 500, text FROM documents WHERE doc_id % 3 = 0
        ),
        batched AS (SELECT doc_id // 100 AS batch, text FROM raw),
        first_seen AS (
            SELECT text, min(batch) AS first_batch FROM batched GROUP BY 1
        ),
        per AS (
            SELECT b.batch, COUNT(*) AS n_docs,
                   COUNT(*) FILTER (f.first_batch = b.batch) AS n_first_seen
            FROM batched b JOIN first_seen f ON b.text = f.text
            GROUP BY 1
        ),
        nov AS (
            SELECT first_batch AS batch, COUNT(*) AS n_new_texts
            FROM first_seen GROUP BY 1
        )
        SELECT per.batch, CAST(per.n_docs AS BIGINT) AS n_docs,
               CAST(COALESCE(nov.n_new_texts, 0) AS BIGINT) AS n_new_texts,
               round(CAST(COALESCE(nov.n_new_texts, 0) AS DOUBLE)
                     / per.n_docs, 6) AS novelty_rate
        FROM per LEFT JOIN nov ON per.batch = nov.batch
    """,
)
def q236_novelty_by_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch-over-batch novelty: treating doc_id ranges as ingestion
    batches (with a partial re-crawl appended — every 3rd doc
    re-arrives 5 batches later), the fraction of each batch's content
    that is NEW to the corpus — the first-derivative signal that tells
    a crawler when a feed has gone stale (novelty → 0) long before
    storage fills with duplicates.

    Plan: one content-key aggregate for first-seen batch (md5(text)
    key at 100 TB), one bounded-key batch rollup, one tiny join. The
    incremental-production variant keeps first_seen as a state table
    and anti-joins each new batch — same core plan."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    raw = d.union(
        d.filter(F.col("doc_id") % 3 == 0).select(
            (F.col("doc_id") + 500).alias("doc_id"), "text"
        )
    )
    # ONE corpus pass to (batch, text) counts; everything downstream
    # (first-seen, per-batch totals, novelty) runs on the distinct-text
    # relation, never re-joining corpus rows
    bt = raw.groupBy(F.expr("doc_id DIV 100").alias("batch"), "text").agg(
        F.count(F.lit(1)).alias("n_in_batch")
    ).localCheckpoint(eager=False)  # two consumers — one corpus pass
    first_seen = bt.groupBy("text").agg(F.min("batch").alias("first_batch"))
    per = bt.groupBy("batch").agg(F.sum("n_in_batch").alias("n_docs"))
    nov = first_seen.groupBy(F.col("first_batch").alias("batch")).agg(
        F.count(F.lit(1)).alias("n_new_texts")
    )
    return per.join(nov, "batch", "left").select(
        "batch",
        F.col("n_docs").cast("long").alias("n_docs"),
        F.coalesce("n_new_texts", F.lit(0)).cast("long").alias("n_new_texts"),
        F.round(
            F.coalesce("n_new_texts", F.lit(0)).cast("double")
            / F.col("n_docs"),
            6,
        ).alias("novelty_rate"),
    )
