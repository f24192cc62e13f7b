r"""Round-5b queries: dedup-ladder quality audits, robust statistics,
and pipeline-hygiene reports (continues queries_round5.py).

Highlights: asymmetric containment near-dup (the subset-duplication
rung Jaccard misses), a fully-oracled precision/recall audit of the
LSH banding against exact Jaccard truth, exact rank-based group
quantiles and MAD outliers (no engine quantile functions — identical
integer rank selection on both sides), cost-based broadcast sizing,
an FK orphan matrix over every schema edge, candidate-graph degree
distribution (integer log2 via bin()), and interval-union coverage
(gaps-and-islands). All DuckDB-oracled; SURVEY §2.12 north-star
surface (no reference analog).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from databricks_etl_spark.operators import dedup as DD
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


# ---------------------------------------------------------------------------
# q237 — feature/label leakage audit
# ---------------------------------------------------------------------------


@query(
    "q237_feature_leakage_audit",
    oracle="""
        WITH w AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS ts_epoch,
                   min(CASE WHEN event_type = 'purchase'
                            THEN CAST(floor(epoch(ts)) AS BIGINT) END)
                       OVER (PARTITION BY user_id) AS label_epoch
            FROM events
        )
        SELECT user_id, label_epoch,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               CAST(COUNT(*) FILTER (ts_epoch < label_epoch) AS BIGINT)
                   AS n_pre_label,
               CAST(COUNT(*) FILTER (ts_epoch >= label_epoch) AS BIGINT)
                   AS n_post_label
        FROM w GROUP BY 1, 2
    """,
)
def q237_feature_leakage_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train-data leakage audit: per user, the label timestamp (first
    purchase) and how many of their events fall ON/AFTER it — the rows
    a point-in-time-correct feature pipeline must exclude, and the
    number an offline/online skew incident starts from. Users who
    never purchase have a NULL label and zero leak rows.

    Plan: the label is a partitioned window min; the per-user rollup
    then groups on the SAME key — one shuffle total, no join. 100 TB:
    user-partitioned, map-side combinable rollup."""
    e = read_table(spark, sf_dir, "events")
    ts_epoch = F.unix_timestamp("ts")
    w = Window.partitionBy("user_id")
    rows = e.select(
        "user_id",
        ts_epoch.alias("ts_epoch"),
        F.min(
            F.when(F.col("event_type") == "purchase", ts_epoch)
        ).over(w).alias("label_epoch"),
    )
    return rows.groupBy("user_id", "label_epoch").agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.count_if(F.col("ts_epoch") < F.col("label_epoch"))
        .cast("long")
        .alias("n_pre_label"),
        F.count_if(F.col("ts_epoch") >= F.col("label_epoch"))
        .cast("long")
        .alias("n_post_label"),
    )


# ---------------------------------------------------------------------------
# q238 — asymmetric containment near-dup pairs
# ---------------------------------------------------------------------------


@query(
    "q238_containment_neardup",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        d AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       AS sh
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
        )
        SELECT * FROM (
            SELECT id_a, id_b,
                   round(CAST(shared AS DOUBLE) / sa.set_size, 6) AS cont_ab,
                   round(CAST(shared AS DOUBLE) / sb.set_size, 6) AS cont_ba
            FROM pairs
            JOIN sz sa ON pairs.id_a = sa.doc_id
            JOIN sz sb ON pairs.id_b = sb.doc_id
        ) WHERE cont_ab >= 0.4 OR cont_ba >= 0.4
    """,
)
def q238_containment_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dup: C(a→b) = |S_a∩S_b|/|S_a| on
    3-gram shingles — the subset-duplication detector (a short doc
    quoted inside a long one scores high containment but low Jaccard,
    so q44 misses it). Second rung of the dedup ladder.

    Plan: same inverted-index self-join + max_df posting cap as q44
    (operators/dedup.containment_pairs); identical shuffle profile."""
    d = read_table(spark, sf_dir, "documents")
    return DD.containment_pairs(d, 0.4, ngram=3, max_df=100)


# ---------------------------------------------------------------------------
# q239 — exact per-group quantile bands (rank selection, no quantile fn)
# ---------------------------------------------------------------------------


@query(
    "q239_group_quantile_bands",
    oracle=f"""
        WITH x AS (
            SELECT lang, doc_id, len({_TOKS}) AS n_toks FROM documents
        ),
        r AS (
            SELECT lang, n_toks,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n_toks, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM x
        )
        SELECT lang, CAST(max(n) AS BIGINT) AS n_docs,
               CAST(max(CASE WHEN rn = (n + 3) // 4 THEN n_toks END)
                   AS BIGINT) AS p25_toks,
               CAST(max(CASE WHEN rn = (n + 1) // 2 THEN n_toks END)
                   AS BIGINT) AS p50_toks,
               CAST(max(CASE WHEN rn = (3 * n + 3) // 4 THEN n_toks END)
                   AS BIGINT) AS p75_toks
        FROM r GROUP BY lang
    """,
)
def q239_group_quantile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-language token-count quartiles WITHOUT an engine
    quantile function: value at integer rank ceil(p·n) selected via
    row_number — both engines run the identical rank arithmetic
    ((n+3)//4, (n+1)//2, (3n+3)//4), so there is no interpolation-
    semantics gap to paper over (the reason q65's percentile_disc
    cousins need care). The corpus-profiling step that sets the
    chunking (q139) and packing (q140) length budgets per language.

    Plan: one shuffle (lang partition) for the rank window, rollup on
    the same key — no second exchange."""
    from fractions import Fraction

    from databricks_etl_spark.operators.stats import group_quantiles
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    x = d.select("lang", "doc_id", F.size(tokens_col("text")).alias("n_toks"))
    q = group_quantiles(
        x,
        "lang",
        "n_toks",
        {
            "p25_toks": Fraction(1, 4),
            "p50_toks": Fraction(1, 2),
            "p75_toks": Fraction(3, 4),
        },
        tiebreak="doc_id",
    )
    return q.select(
        "lang",
        F.col("n_rows").alias("n_docs"),
        F.col("p25_toks").cast("long").alias("p25_toks"),
        F.col("p50_toks").cast("long").alias("p50_toks"),
        F.col("p75_toks").cast("long").alias("p75_toks"),
    )


# ---------------------------------------------------------------------------
# q240 — LSH banding precision/recall vs exact Jaccard truth
# ---------------------------------------------------------------------------


@query(
    "q240_lsh_quality_audit",
    oracle=None,  # set below — needs _BANDS_SQL from queries_round4
)
def q240_lsh_quality_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup ladder's quality report, fully oracled: candidate
    pairs from the md5 LSH banding (q172/q173 construction) scored
    against EXACT 3-gram Jaccard ≥ 0.5 truth (q44's construction) —
    one row of n_candidates / n_true / n_hits / precision / recall.
    This is the audit that says whether the bucketed fast path is
    actually catching the duplicates the exact rung defines — run on
    a sampled corpus slice in production; q255 is exactly that sliced
    production recipe and carries the headline-bench slot (this
    full-corpus form stays as the sf-bounded exhaustive audit).

    Plan: bands side is the bucketed equi-join (never all-pairs);
    truth side is the max_df-capped inverted index; the intersection
    is an equi-join of two pair sets on (u, v). 100 TB: every stage
    bucketed or posting-capped."""
    return _lsh_quality_audit(read_table(spark, sf_dir, "documents"))


def _lsh_quality_audit(d: DataFrame) -> DataFrame:
    """Shared body of q240 (full corpus) and q255 (md5-sampled slice):
    banding candidates vs exact-Jaccard truth over the given document
    relation."""
    from databricks_etl_spark.operators.text import shingles
    from databricks_etl_spark.plans.queries_round4 import _band_buckets

    # both ladder rungs consume the SAME distinct 3-gram shingle set —
    # tokenize/shingle the corpus once and share the materialization.
    # Storage trade: the checkpointed relation is distinct-(doc,shingle)
    # sized (spills via MEMORY_AND_DISK); at 100 TB one would persist
    # DISK_ONLY or re-derive per rung if executor storage is tighter
    # than compute — measured here, materialize-once wins
    sh = shingles(d, 3).distinct().localCheckpoint(eager=False)
    # the band signatures are self-joined below (a × c): without a
    # materialization BOTH join sides recompute the per-doc min
    # aggregate over the whole shingle-hash relation (r16: q255's
    # plan carried the aggregate twice). 4 rows/doc — cheap to pin.
    b = _band_buckets(d.sparkSession, "", shingle_set=sh).localCheckpoint(
        eager=False
    )
    a = b.select(F.col("doc_id").alias("u"), "band", "band_hash")
    c = b.select(F.col("doc_id").alias("v"), "band", "band_hash")
    cands = (
        a.join(c, ["band", "band_hash"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
        .withColumn("is_cand", F.lit(1))
    )
    truth = (
        DD.jaccard_pairs(
            d,
            0.5,
            ngram=3,
            max_df=100,
            items=sh.select("doc_id", F.col("shingle").alias("item")),
        )
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .withColumn("is_true", F.lit(1))
    )
    # single pass over the union of both pair sets: one full-outer join
    # on (u, v) + one aggregate yields all three counts — each rung is
    # computed exactly once, so no checkpoint barriers are needed for
    # cands/truth (formerly two consumers each; measured ~30% off the
    # sampled audit's warm wall at sf0.1)
    both = cands.join(truth, ["u", "v"], "full_outer")
    # outer coalesce: on a DEGENERATE corpus (no pairs at all) SUM over
    # zero rows is NULL while the oracle's COUNT(*) is 0 — the counts
    # must agree on empty input too
    agg = both.agg(
        F.coalesce(F.sum(F.coalesce("is_cand", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_candidates"),
        F.coalesce(F.sum(F.coalesce("is_true", F.lit(0))), F.lit(0))
        .cast("long")
        .alias("n_true"),
        F.coalesce(
            F.sum(
                F.when(
                    (F.col("is_cand") == 1) & (F.col("is_true") == 1), 1
                ).otherwise(0)
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_hits"),
    )
    # try_divide: a degenerate zero-pair corpus reports NULL ratios
    # (DuckDB's x/0 behavior) instead of an ANSI DIVIDE_BY_ZERO crash
    return agg.select(
        "n_candidates",
        "n_true",
        "n_hits",
        F.round(
            F.try_divide(F.col("n_hits").cast("double"), F.col("n_candidates")),
            6,
        ).alias("precision"),
        F.round(
            F.try_divide(F.col("n_hits").cast("double"), F.col("n_true")), 6
        ).alias("recall"),
    )


def _q240_oracle(src: str = "documents", extra_ctes: str = "") -> str:
    from databricks_etl_spark.plans.queries_round4 import _bands_sql_over

    return f"""
        WITH {extra_ctes}{_bands_sql_over(src)},
        cand AS (
            SELECT DISTINCT a.doc_id AS u, c.doc_id AS v
            FROM b a JOIN b c
              ON a.band = c.band AND a.band_hash = c.band_hash
            WHERE a.doc_id < c.doc_id
        ),
        tt AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
        d3 AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks) - 1),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                       AS sh3
            FROM tt
        ),
        i0 AS (SELECT doc_id, unnest(sh3) AS item FROM d3),
        keep AS (SELECT item FROM i0 GROUP BY item HAVING COUNT(*) <= 100),
        i AS (SELECT i0.doc_id, i0.item FROM i0 JOIN keep USING (item)),
        sz AS (SELECT doc_id, COUNT(*) AS set_size FROM i GROUP BY 1),
        pr AS (
            SELECT a.doc_id AS u, b2.doc_id AS v, COUNT(*) AS shared
            FROM i a JOIN i b2 USING (item)
            WHERE a.doc_id < b2.doc_id GROUP BY 1, 2
        ),
        truth AS (
            SELECT u, v FROM (
                SELECT u, v,
                       round(CAST(shared AS DOUBLE)
                             / (sa.set_size + sb.set_size - shared), 6) AS j
                FROM pr JOIN sz sa ON pr.u = sa.doc_id
                        JOIN sz sb ON pr.v = sb.doc_id
            ) WHERE j >= 0.5
        ),
        hit AS (SELECT cand.u, cand.v FROM cand JOIN truth USING (u, v))
        SELECT CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
               CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_true,
               CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hits,
               round(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
                     / (SELECT COUNT(*) FROM cand), 6) AS precision,
               round(CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
                     / (SELECT COUNT(*) FROM truth), 6) AS recall
    """


# ---------------------------------------------------------------------------
# q241 — per-group MAD robust outliers (exact rank medians)
# ---------------------------------------------------------------------------


@query(
    "q241_mad_outliers",
    oracle=f"""
        WITH x AS (
            SELECT lang, doc_id, len({_TOKS}) AS n_toks FROM documents
        ),
        r1 AS (
            SELECT lang, n_toks,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY n_toks, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM x
        ),
        med AS (
            SELECT lang, max(CASE WHEN rn = (n + 1) // 2 THEN n_toks END)
                       AS median_toks
            FROM r1 GROUP BY lang
        ),
        dev AS (
            SELECT x.lang, x.doc_id, x.n_toks,
                   abs(x.n_toks - med.median_toks) AS adev
            FROM x JOIN med USING (lang)
        ),
        r2 AS (
            SELECT lang, n_toks, adev,
                   row_number() OVER (
                       PARTITION BY lang ORDER BY adev, doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY lang) AS n
            FROM dev
        ),
        mad AS (
            SELECT lang, max(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad_toks
            FROM r2 GROUP BY lang
        )
        SELECT dev.lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(max(med.median_toks) AS BIGINT) AS median_toks,
               CAST(max(mad.mad_toks) AS BIGINT) AS mad_toks,
               CAST(COUNT(*) FILTER (dev.adev > 3 * mad.mad_toks) AS BIGINT)
                   AS n_outliers
        FROM dev JOIN med USING (lang) JOIN mad USING (lang)
        GROUP BY dev.lang
    """,
)
def q241_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-group outlier detection: median absolute deviation
    (lower-median at integer rank (n+1)//2, both levels) and the
    |x − med| > 3·MAD count — the length-anomaly gate that flags
    machine-generated or truncated documents where a mean/stddev
    z-score (q79) gets dragged by the very outliers it hunts. All
    integer arithmetic, no quantile-function semantics gap.

    Plan: two rank windows on the lang key + joins against two
    ≤|langs|-row medians relations (AQE broadcasts). 100 TB: windows
    partition by lang; skewed language sizes would salt (q62) first."""
    from databricks_etl_spark.operators.stats import mad_outliers
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    x = d.select("lang", "doc_id", F.size(tokens_col("text")).alias("n_toks"))
    out = mad_outliers(x, "lang", "n_toks", k=3.0, tiebreak="doc_id")
    return out.select(
        "lang",
        F.col("n_rows").alias("n_docs"),
        F.col("median").cast("long").alias("median_toks"),
        F.col("mad").cast("long").alias("mad_toks"),
        "n_outliers",
    )


# ---------------------------------------------------------------------------
# q242 — cost-based broadcast decision audit
# ---------------------------------------------------------------------------

# (table, numeric/date col count, string cols) — schema-derived widths:
# 8 bytes per numeric/timestamp column, actual summed bytes for strings
_SIZING = [
    ("nation", 2, ["n_name"]),
    ("region", 1, ["r_name"]),
    ("customer", 3, ["c_name", "c_mktsegment"]),
    ("supplier", 3, ["s_name"]),
    ("part", 3, ["p_name", "p_brand", "p_type"]),
    ("orders", 4, ["o_orderstatus", "o_orderpriority"]),
    ("lineitem", 9, ["l_returnflag", "l_linestatus"]),
]

_BCAST_THRESHOLD = 64 * 1024 * 1024


def _sizing_sql(tbl: str, n_num: int, scols: list[str]) -> str:
    slen = " + ".join(f"SUM(CAST(length({c}) AS BIGINT))" for c in scols)
    return f"""
        SELECT '{tbl}' AS tbl, CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(COUNT(*) * {n_num} * 8 + {slen} AS BIGINT) AS est_bytes,
               round(CAST(COUNT(*) * {n_num} * 8 + {slen} AS DOUBLE)
                     / 1048576.0, 6) AS est_mb,
               (COUNT(*) * {n_num} * 8 + {slen}) <= {_BCAST_THRESHOLD}
                   AS would_broadcast
        FROM {tbl}
    """


@query(
    "q242_broadcast_decision_audit",
    oracle=" UNION ALL ".join(_sizing_sql(t, n, s) for t, n, s in _SIZING),
)
def q242_broadcast_decision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-based broadcast sizing audit: per table, the planner-style
    in-memory size estimate (8 B per numeric/timestamp column + actual
    summed string bytes) against the session's 64 MB broadcast
    threshold — the computation behind this round's hint sweep: a
    relation's broadcastability is a RUNTIME property of size, never a
    schema-time constant, so hard hints on SF-scaled tables are wrong
    by construction. At sf0.1 every dim fits; at 100 TB only
    nation/region still would.

    Plan: one fused aggregate per table (count + string-length sums),
    7 rows out."""
    parts = []
    for tbl, n_num, scols in _SIZING:
        t = read_table(spark, sf_dir, tbl)
        slen = None
        for c in scols:
            term = F.sum(F.length(c).cast("long"))
            slen = term if slen is None else slen + term
        est = F.count(F.lit(1)) * n_num * 8 + slen
        parts.append(
            t.agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                est.cast("long").alias("est_bytes"),
                F.round(est.cast("double") / 1048576.0, 6).alias("est_mb"),
                (est <= F.lit(_BCAST_THRESHOLD)).alias("would_broadcast"),
            ).select(
                F.lit(tbl).alias("tbl"),
                "n_rows", "est_bytes", "est_mb", "would_broadcast",
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


# ---------------------------------------------------------------------------
# q243 — FK orphan matrix over every schema edge
# ---------------------------------------------------------------------------

_FK_EDGES = [
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("events", "user_id", "customer", "c_custkey"),
]


@query(
    "q243_fk_orphan_matrix",
    oracle=" UNION ALL ".join(
        f"""
        SELECT '{ct}' AS child_tbl, '{cc}' AS fk_col,
               CAST(COUNT(*) AS BIGINT) AS n_child,
               CAST(COUNT(*) FILTER ({cc} IS NOT NULL AND {cc} NOT IN
                   (SELECT {pc} FROM {pt})) AS BIGINT) AS n_orphans,
               round(CAST(COUNT(*) FILTER ({cc} IS NOT NULL AND {cc} NOT IN
                   (SELECT {pc} FROM {pt})) AS DOUBLE) / COUNT(*), 6)
                   AS orphan_rate
        FROM {ct}
        """
        for ct, cc, pt, pc in _FK_EDGES
    ),
)
def q243_fk_orphan_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity matrix: orphan counts for EVERY foreign-
    key edge in the schema in one report — the whole-warehouse version
    of q188's single FK check (same NOT-IN NULL-key policy the r4
    advice locked in: NULL keys are a completeness problem, not an
    orphan). All-zero orphans is the expected PASS state; the value of
    the query is that a broken ingest shows up as a nonzero cell with
    its rate.

    Plan: per edge, one membership left-join folded into a conditional
    aggregate — parent key sets scale with data, so no hard broadcast
    hints (AQE decides per size). 7 rows out."""
    rows = []
    for ct, cc, pt, pc in _FK_EDGES:
        child = read_table(spark, sf_dir, ct)
        parent = read_table(spark, sf_dir, pt).select(
            F.col(pc).alias("__pk")
        ).distinct()
        flagged = child.join(
            parent.withColumn("__hit", F.lit(1)),
            child[cc] == F.col("__pk"),
            "left",
        )
        orphan = child[cc].isNotNull() & F.col("__hit").isNull()
        rows.append(
            flagged.agg(
                F.count(F.lit(1)).cast("long").alias("n_child"),
                F.count_if(orphan).cast("long").alias("n_orphans"),
                F.round(
                    F.count_if(orphan).cast("double") / F.count(F.lit(1)), 6
                ).alias("orphan_rate"),
            ).select(
                F.lit(ct).alias("child_tbl"),
                F.lit(cc).alias("fk_col"),
                "n_child", "n_orphans", "orphan_rate",
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionAll(r)
    return out


# ---------------------------------------------------------------------------
# q244 — candidate-graph degree distribution (integer log2 buckets)
# ---------------------------------------------------------------------------


@query(
    "q244_neardup_degree_distribution",
    oracle=None,  # set below — needs _BANDS_SQL
)
def q244_neardup_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the LSH candidate graph in log2 buckets
    — the graph-health check before q123's connected components: a
    heavy tail (high-degree hub docs) predicts giant merged clusters
    and quadratic pair expansion; near-uniform low degrees mean the
    banding is selective. Bucket = bit_length(degree)−1 computed as
    length(bin(degree))−1 — pure integer, no float log2 to disagree
    across engines.

    Plan: the q185 edge build (bucketed equi-join, oriented u<v),
    degree aggregate, then a ≤64-bucket rollup."""
    from databricks_etl_spark.plans.queries_round4 import _band_buckets

    b = _band_buckets(spark, sf_dir)
    a = b.select(F.col("doc_id").alias("u"), "band", "band_hash")
    c = b.select(F.col("doc_id").alias("v"), "band", "band_hash")
    e = (
        a.join(c, ["band", "band_hash"])
        .filter(F.col("u") < F.col("v"))
        .select("u", "v")
        .distinct()
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    bucket = (F.length(F.bin("degree")) - 1).cast("int")
    return (
        deg.groupBy(bucket.alias("log2_degree"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_nodes"),
            F.min("degree").cast("long").alias("min_degree"),
            F.max("degree").cast("long").alias("max_degree"),
        )
    )


def _q244_oracle() -> str:
    from databricks_etl_spark.plans.queries_round4 import _BANDS_SQL

    return f"""
        WITH {_BANDS_SQL},
        e AS (
            SELECT DISTINCT a.doc_id AS u, c.doc_id AS v
            FROM b a JOIN b c
              ON a.band = c.band AND a.band_hash = c.band_hash
            WHERE a.doc_id < c.doc_id
        ),
        deg AS (
            SELECT node, COUNT(*) AS degree
            FROM (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
            GROUP BY node
        )
        SELECT CAST(length(bin(degree)) - 1 AS INT) AS log2_degree,
               CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(MIN(degree) AS BIGINT) AS min_degree,
               CAST(MAX(degree) AS BIGINT) AS max_degree
        FROM deg GROUP BY 1
    """


# ---------------------------------------------------------------------------
# q245 — interval-union coverage (gaps and islands)
# ---------------------------------------------------------------------------

_HALF_W = 300  # seconds each side of an event


@query(
    "q245_interval_union_coverage",
    oracle=f"""
        WITH iv AS (
            SELECT user_id, event_id,
                   CAST(floor(epoch(ts)) AS BIGINT) - {_HALF_W} AS s,
                   CAST(floor(epoch(ts)) AS BIGINT) + {_HALF_W} AS e
            FROM events
        ),
        m AS (
            SELECT user_id, event_id, s, e,
                   max(e) OVER (
                       PARTITION BY user_id ORDER BY s, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max_e
            FROM iv
        ),
        f AS (
            SELECT user_id, event_id, s, e,
                   CASE WHEN prev_max_e IS NULL OR s > prev_max_e
                        THEN 1 ELSE 0 END AS new_island
            FROM m
        ),
        isl AS (
            -- event_id in the ORDER BY so both windows share one TOTAL
            -- order; with duplicate (user_id, ts) rows, (s, e) alone
            -- ties and DuckDB's two sorts could disagree on which tied
            -- row carries the flag (r5 ADVICE.md)
            SELECT user_id, s, e,
                   SUM(new_island) OVER (
                       PARTITION BY user_id ORDER BY s, e, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS island_id
            FROM f
        ),
        per_island AS (
            SELECT user_id, island_id,
                   max(e) - min(s) AS covered
            FROM isl GROUP BY 1, 2
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(covered) AS BIGINT) AS covered_seconds
        FROM per_island GROUP BY 1
    """,
)
def q245_interval_union_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-union coverage per user (gaps-and-islands): each event
    projects a ±5-minute activity interval; overlapping intervals
    merge into islands and the union length is the user's true active
    time — the sessionization-adjacent metric naive SUM(duration)
    double-counts. Classic hard-in-SQL shape, solved with the running-
    max-end chain: a new island starts where start > max(all previous
    ends).

    Plan: one user-key shuffle; both windows and both rollups ride the
    same partitioning (the q80 sessionize pattern). All integer epoch
    arithmetic."""
    from databricks_etl_spark.operators.intervals import interval_union_stats

    e = read_table(spark, sf_dir, "events")
    iv = e.select(
        "user_id",
        "event_id",
        (F.unix_timestamp("ts") - _HALF_W).alias("s"),
        (F.unix_timestamp("ts") + _HALF_W).alias("e"),
    )
    out = interval_union_stats(iv, "user_id", "s", "e", order_tiebreak="event_id")
    return out.select(
        "user_id",
        "n_islands",
        F.col("covered").cast("long").alias("covered_seconds"),
    )


# Late-bound oracles (need _BANDS_SQL imported from queries_round4,
# which the registry imports before this module)
from databricks_etl_spark.plans.registry import QUERIES as _Q  # noqa: E402
from dataclasses import replace as _replace  # noqa: E402

_Q["q240_lsh_quality_audit"] = _replace(
    _Q["q240_lsh_quality_audit"], oracle=_q240_oracle()
)
_Q["q244_neardup_degree_distribution"] = _replace(
    _Q["q244_neardup_degree_distribution"], oracle=_q244_oracle()
)
