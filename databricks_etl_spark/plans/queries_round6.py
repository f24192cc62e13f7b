"""Round-6 queries: scale-safe quantile-bucketing twins for the five
global-single-ordering-window queries flagged by the r5 verdict
(q170 equi-depth histogram, q220 RFM, q192 decile lift, q221 Pareto,
q142 vocab). Each exact form stays registered as the sf-bounded
baseline; the twin here replaces the global ``ntile``/``row_number``
with either

- approximate quantile boundaries (tiny, broadcast) + map-side range
  assignment (:mod:`operators.quantile_bucket`), registered as a
  bracket gate over invariants that hold for ANY valid sketch output
  (the q145/q149 pattern), or
- a ``TakeOrderedAndProject`` top-K reduction (per-partition top-K +
  driver merge — no global sort shuffle) when only the head of the
  ordering is needed (vocab build).

tests/test_plan_audit.py asserts the scaling side of each plan carries
no Window operator and no global Sort.

Reference parity: these generalize the reference's fixed-threshold
bucket summaries (``pre_analysis.py:163-195`` value-counts buckets) to
data-driven boundaries at cluster scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.operators.quantile_bucket import (
    assign_approx_buckets,
    size_audit,
)
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_ACC = 1000  # percentile_approx accuracy: rank error ≤ n/_ACC


@query(
    "q247_equidepth_histogram_approx",
    oracle="""
        SELECT 10 AS n_buckets,
               CAST(COUNT(*) AS BIGINT) AS n_total,
               TRUE AS sizes_within_tol,
               TRUE AS buckets_ordered
        FROM lineitem
    """,
)
def q247_equidepth_histogram_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q170's equi-depth histogram rebuilt for 100 TB: approx decile
    boundaries on l_extendedprice (mergeable sketch, map-combined) →
    broadcast → map-side range assignment — lineitem, the largest
    table, is never funneled through a single-task ntile sort. The
    bracket proves every bucket holds n/10 rows within the
    Greenwald–Khanna rank-error tolerance and the bucket value-ranges
    are ordered and disjoint; the oracle states the theorem as
    constants plus the exact row count."""
    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    return size_audit(li, "l_extendedprice", 10, accuracy=_ACC)


@query(
    "q248_rfm_approx_quintiles",
    oracle="""
        WITH rfm AS (SELECT o_custkey FROM orders GROUP BY o_custkey)
        SELECT dim,
               5 AS n_buckets,
               CAST((SELECT COUNT(*) FROM rfm) AS BIGINT) AS n_total,
               TRUE AS sizes_within_tol,
               TRUE AS buckets_ordered
        FROM (VALUES ('frequency'), ('monetary'), ('recency')) AS t(dim)
    """,
)
def q248_rfm_approx_quintiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q220's RFM quintiles without the three global ntile(5) windows:
    one equi-depth bracket per dimension (recency / frequency /
    monetary), each via broadcast approx boundaries over the
    per-customer aggregate — at 10⁸–10⁹ customers the per-dimension
    assignment stays embarrassingly parallel. Output is one audit row
    per dimension (driver sorts rows, so emission order is free).

    Segment *labels* from approx quintiles are sketch-dependent, so
    the exact q220 remains the label-producing baseline; this twin is
    the production path's correctness certificate."""
    from databricks_etl_spark.functions.scalars import MONEY

    o = read_table(spark, sf_dir, "orders")
    as_of = "1998-12-01"
    rfm = o.groupBy("o_custkey").agg(
        F.datediff(F.lit(as_of).cast("date"), F.max("o_orderdate").cast("date"))
        .cast("double")
        .alias("recency"),
        F.count(F.lit(1)).cast("double").alias("frequency"),
        F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias("monetary"),
    )
    audits = []
    for dim in ["frequency", "monetary", "recency"]:
        audits.append(
            size_audit(rfm, dim, 5, accuracy=_ACC).select(
                F.lit(dim).alias("dim"),
                "n_buckets",
                "n_total",
                "sizes_within_tol",
                "buckets_ordered",
            )
        )
    out = audits[0]
    for a in audits[1:]:
        out = out.unionByName(a)
    return out


@query(
    "q249_decile_lift_approx",
    oracle="""
        SELECT 10 AS n_deciles,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               TRUE AS sizes_within_tol,
               TRUE AS avg_balance_monotone,
               TRUE AS rates_valid
        FROM customer
    """,
)
def q249_decile_lift_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q192's decile lift at scale: customers bucketed into acctbal
    deciles by broadcast approx boundaries instead of a global
    ntile(10). Deterministic invariants for ANY valid sketch: 10
    buckets, size tolerance, per-decile mean balance monotone
    nondecreasing (bucket value-ranges are disjoint and ordered, so
    their means must be), and every decile's buy-rate in [0, 1]."""
    from databricks_etl_spark.operators.quantile_bucket import (
        assign_literal_buckets,
    )

    c = read_table(spark, sf_dir, "customer")
    o = read_table(spark, sf_dir, "orders")
    buyers = o.select("o_custkey").distinct()
    base = c.join(buyers, c["c_custkey"] == buyers["o_custkey"], "left").select(
        "c_custkey",
        F.col("c_acctbal").cast("double").alias("bal"),
        F.col("o_custkey").isNotNull().alias("bought"),
    )
    # ONE sketch pass shared by the per-decile stats and the audit:
    # the audited boundaries are exactly the ones that did the
    # bucketing (2 passes over base total, not 4)
    probs = F.array(*[F.lit(i / 10) for i in range(1, 10)])
    bounds = list(
        base.agg(
            F.percentile_approx("bal", probs, F.lit(_ACC)).alias("b")
        ).first()["b"]
        or []  # empty/all-NULL customer day: percentile returns NULL
    )
    assigned = assign_literal_buckets(base, "bal", bounds, bucket_col="decile")
    per = assigned.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("bal").alias("avg_bal"),
        F.count_if(F.col("bought")).alias("n_buyers"),
    )
    audit = size_audit(base, "bal", 10, accuracy=_ACC, bounds=bounds)
    w = Window.orderBy("decile")  # ≤10 rows — bounded window
    chk = per.select(
        "n",
        (F.lag("avg_bal").over(w) <= F.col("avg_bal")).alias("mono_ok"),
        ((F.col("n_buyers") >= 0) & (F.col("n_buyers") <= F.col("n"))).alias(
            "rate_ok"
        ),
    ).agg(
        # outer coalesce: MIN over zero rows (empty input) is NULL; the
        # vacuous bracket is TRUE, matching the constant-stating oracle
        F.coalesce(
            F.min(F.coalesce("mono_ok", F.lit(True))), F.lit(True)
        ).alias("avg_balance_monotone"),
        F.coalesce(F.min("rate_ok"), F.lit(True)).alias("rates_valid"),
    )
    return audit.join(F.broadcast(chk)).select(
        F.col("n_buckets").alias("n_deciles"),
        F.col("n_total").alias("n_customers"),
        "sizes_within_tol",
        "avg_balance_monotone",
        "rates_valid",
    )


@query(
    "q250_pareto_approx_topshare",
    oracle="""
        WITH crev AS (SELECT o_custkey FROM orders GROUP BY o_custkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_customers,
               TRUE AS top_count_within_tol,
               TRUE AS top_share_exceeds_count_share
        FROM crev
    """,
)
def q250_pareto_approx_topshare(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q221's Pareto concentration without the global ranked cumulative
    window: the 'top ~20% of customers' is cut at the broadcast approx
    p80 revenue boundary (strictly-above assignment). Invariants
    deterministic for any valid sketch: the top bucket's customer
    count is within rank-error tolerance of n/5 (the tolerance carries
    the boundary value's duplicate multiplicity, as the operator's
    theorem requires — a heavily-tied boundary widens it), and —
    because every top-bucket customer's revenue ≥ every other
    customer's — the top bucket's revenue share must be at least its
    count share (the direction of Pareto concentration, stated without
    depending on which boundary element the sketch picked). Two-pass
    literal-bound plan, the size_audit shape: sketch collected
    driver-side, then ONE fused aggregate computes count/share/dup
    terms together."""
    from databricks_etl_spark.functions.scalars import MONEY

    o = read_table(spark, sf_dir, "orders")
    crev = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(MONEY)).cast("double").alias("rev")
    )
    b80 = crev.agg(
        F.percentile_approx("rev", F.lit(0.8), F.lit(_ACC)).alias("b")
    ).first()["b"]
    tot = crev.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("rev").alias("rev_total"),
        F.sum(F.when(F.col("rev") > F.lit(b80), 1).otherwise(0))
        .cast("double")
        .alias("n_top"),
        F.sum(
            F.when(F.col("rev") > F.lit(b80), F.col("rev")).otherwise(0.0)
        ).alias("rev_top"),
        F.sum(F.when(F.col("rev") == F.lit(b80), 1).otherwise(0))
        .cast("double")
        .alias("dup"),
    )
    # |n_top - n/5| ≤ rank error (n/_ACC + 1) + boundary multiplicity
    tol = F.col("n") / F.lit(_ACC) + F.col("dup") + F.lit(2.0)
    return tot.select(
        F.col("n").cast("long").alias("n_customers"),
        # coalesce(·, TRUE): on an empty orders day the sums are NULL
        # and the bracket is vacuous — match the oracle's constants
        F.coalesce(
            F.abs(F.col("n_top") - F.col("n") / 5) <= tol, F.lit(True)
        ).alias("top_count_within_tol"),
        F.coalesce(
            F.try_divide(F.col("rev_top"), F.col("rev_total"))
            >= F.try_divide(F.col("n_top"), F.col("n")) - F.lit(1e-12),
            F.lit(True),
        ).alias("top_share_exceeds_count_share"),
    )


_V251 = 100


@query(
    "q251_vocab_topk_scalable",
    oracle=rf"""
        WITH tok AS (
            SELECT unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ),
        cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY 1)
        SELECT CAST(row_number() OVER (ORDER BY c DESC, w) AS INT) AS vocab_id,
               w AS token,
               CAST(c AS BIGINT) AS n_occurrences
        FROM cnt
        ORDER BY c DESC, w
        LIMIT {_V251}
    """,
)
def q251_vocab_topk_scalable(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q142's vocabulary build without the global row_number over every
    distinct token: top-100 tokens come from ``orderBy().limit()``,
    which Spark executes as TakeOrderedAndProject — per-partition
    top-K then a driver merge of K-row heaps, no global sort shuffle
    (plan asserted in tests/test_plan_audit.py). Only the K surviving
    rows see a row_number window (bounded input, same class as the
    decile-lift 10-row arithmetic). Exact and fully hash-oracled:
    (count DESC, token) is a deterministic total order."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    top = cnt.orderBy(F.desc("c"), "w").limit(_V251)
    w = Window.orderBy(F.desc("c"), "w")  # over K rows only
    return top.select(
        F.row_number().over(w).cast("int").alias("vocab_id"),
        F.col("w").alias("token"),
        F.col("c").cast("long").alias("n_occurrences"),
    )


# ---------------------------------------------------------------------------
# q252/q253 — incremental near-dup maintenance (new batch vs corpus index)
# ---------------------------------------------------------------------------

# batch re-id offset: batch doc ids = corpus id + offset. 10^10 sits
# above any plausible corpus doc_id (sf0.1 tops out at 4999; even a
# 50M-doc sf1000 corpus stays 3 orders of magnitude below), so batch
# and corpus id ranges can never collide — the id-derived invariants
# (batch doc is always the greater id; cross_corpus = id_a < offset)
# stay sound at every scale factor
_B252 = 10_000_000_000


def _bands_sql_incremental() -> str:
    from databricks_etl_spark.plans.queries_round4 import _bands_sql_over

    return f"""
        raw AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + {_B252} AS doc_id, text FROM documents
            WHERE doc_id % 5 = 0
        ),
        {_bands_sql_over("raw")},
        bb AS (SELECT * FROM b WHERE doc_id >= {_B252}),
        cb AS (SELECT * FROM b WHERE doc_id < {_B252})
    """


def _incremental_bands(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """(batch_bands, corpus_bands) for the shared q252/q253/q256/q272
    construction: batch = every 5th document re-identified by _B252 —
    ONE definition, so the Spark side can never drift from the oracles'
    shared ``_bands_sql_incremental`` CTE."""
    from databricks_etl_spark.operators import text as TX
    from databricks_etl_spark.plans.queries_round4 import _band_buckets

    corpus_bands = _band_buckets(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents")
    batch = d.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + _B252).alias("doc_id"), "text"
    )
    # no distinct: the band construction is a per-doc MIN, which is
    # multiplicity-invariant — same rule as _band_buckets' own internal
    # path (r17; the oracle keeps its distinct, identical minima)
    batch_bands = _band_buckets(
        spark, sf_dir, shingle_set=TX.shingles(batch, 3)
    )
    return batch_bands, corpus_bands


def _incremental_candidates(
    spark: SparkSession, sf_dir: str, *, max_bucket: int | None = None
) -> DataFrame:
    from databricks_etl_spark.operators.dedup import incremental_band_join

    batch_bands, corpus_bands = _incremental_bands(spark, sf_dir)
    return incremental_band_join(batch_bands, corpus_bands, max_bucket=max_bucket)


@query(
    "q252_incremental_neardup_candidates",
    oracle=f"""
        WITH {_bands_sql_incremental()},
        cross_p AS (
            SELECT least(a.doc_id, c.doc_id) AS id_a,
                   greatest(a.doc_id, c.doc_id) AS id_b,
                   TRUE AS cross_corpus
            FROM bb a JOIN cb c
              ON a.band = c.band AND a.band_hash = c.band_hash
        ),
        within_p AS (
            SELECT a.doc_id AS id_a, c.doc_id AS id_b, FALSE AS cross_corpus
            FROM bb a JOIN bb c
              ON a.band = c.band AND a.band_hash = c.band_hash
             AND a.doc_id < c.doc_id
        ),
        u AS (SELECT * FROM cross_p UNION ALL SELECT * FROM within_p)
        SELECT id_a, id_b, cross_corpus,
               CAST(COUNT(*) AS BIGINT) AS n_shared_bands
        FROM u GROUP BY 1, 2, 3
    """,
)
def q252_incremental_neardup_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup maintenance, fully hash-oracled: a NEW
    ingest batch (every 5th document, re-identified) is band-bucketed
    and equi-joined against the PERSISTED corpus band index
    (``dedup.incremental_band_join``) — the corpus text is never
    re-shingled. Candidates = batch×corpus collisions (cross_corpus)
    + batch×batch collisions; corpus×corpus pairs are never
    recomputed. The oracle runs the same banding over corpus ∪ batch
    restricted to pairs touching the batch — the 'recompute the world'
    semantics the incremental plan must (and does) reproduce exactly.
    This is the production ingest shape at 100 TB: per-batch cost is
    O(|batch| + collisions), not O(|corpus|)."""
    return _incremental_candidates(spark, sf_dir)


@query(
    "q253_incremental_batch_novelty",
    oracle=f"""
        WITH {_bands_sql_incremental()},
        batch_ids AS (
            SELECT DISTINCT doc_id + {_B252} AS batch_doc_id
            FROM documents WHERE doc_id % 5 = 0
        ),
        hit AS (
            SELECT DISTINCT a.doc_id AS batch_doc_id
            FROM bb a JOIN cb c
              ON a.band = c.band AND a.band_hash = c.band_hash
        )
        SELECT i.batch_doc_id,
               (h.batch_doc_id IS NULL) AS is_novel
        FROM batch_ids i LEFT JOIN hit h USING (batch_doc_id)
    """,
)
def q253_incremental_batch_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Survivorship side of incremental maintenance: which batch
    documents are NOVEL vs the corpus index (no band collision with
    any existing doc) and which are near-dup suspects to route into
    exact verification (q240's ladder). Composes q252's candidates —
    batch ids with a cross-corpus hit are flagged; the rest enter the
    corpus as new survivors. At 100 TB this list IS the ingest
    decision: append novel docs + their bands to the index, quarantine
    the rest."""
    pairs = _incremental_candidates(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents")
    batch_ids = (
        d.filter(F.col("doc_id") % 5 == 0)
        .select((F.col("doc_id") + _B252).alias("batch_doc_id"))
        .distinct()
    )
    # in a cross-corpus pair the batch doc is the greater id (batch ids
    # are offset above every corpus id)
    hit = (
        pairs.filter("cross_corpus")
        .select(F.col("id_b").alias("batch_doc_id"))
        .distinct()
    )
    return batch_ids.join(
        hit.withColumn("_hit", F.lit(1)), "batch_doc_id", "left"
    ).select("batch_doc_id", F.col("_hit").isNull().alias("is_novel"))


# ---------------------------------------------------------------------------
# q254 — streaming content-fingerprint dedup (the q42 streaming twin)
# ---------------------------------------------------------------------------


@query(
    "q254_streaming_fingerprint_dedup",
    oracle=r"""
        SELECT DISTINCT
               md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))
                   AS md5_fp
        FROM documents
    """,
)
def q254_streaming_fingerprint_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-real-time corpus dedup, drained and hash-checked:
    documents arrive as a stream, are fingerprinted map-side (md5 of
    normalized text — ``doc_fingerprint``'s exact-dedup key), and
    ``dropDuplicatesWithinWatermark`` keeps the first arrival per
    fingerprint with watermark-bounded state
    (``streaming/windows.run_streaming_fingerprint_dedup``) — the
    true-stream twin of q42's batch exact dedup. Survivor CHOICE is
    arrival-order dependent, but the drained fingerprint set must
    equal the batch DISTINCT exactly (q93/q131 pattern), which the
    DuckDB oracle hash-checks. Survivor-level invariants (count ==
    distinct count under a drain-spanning watermark) are asserted in
    tests/test_streaming.py."""
    from databricks_etl_spark.streaming import windows as W

    drained = W.run_streaming_fingerprint_dedup(spark, sf_dir)
    return drained.select("md5_fp").distinct()


# ---------------------------------------------------------------------------
# q255 — LSH quality audit on a deterministic md5-sampled slice
# ---------------------------------------------------------------------------

# portable deterministic ~50% slice: first hex char of md5(doc_id-as-
# string) ≤ '7' — identical row set in Spark and DuckDB
_Q255_PRED_SQL = "substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= '7'"


def _q255_oracle() -> str:
    from databricks_etl_spark.plans.queries_round5b import _q240_oracle

    return _q240_oracle(
        "docslice",
        extra_ctes=(
            "docslice AS (SELECT doc_id, text FROM documents "
            f"WHERE {_Q255_PRED_SQL}), "
        ),
    )


@query("q255_lsh_quality_audit_sampled", oracle=_q255_oracle(), bench=True)
def q255_lsh_quality_audit_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q240's precision/recall audit run the way production runs it at
    100 TB: on a DETERMINISTIC hash-sampled corpus slice (md5 of
    doc_id, first hex char ≤ '7' — ~50%, portable so DuckDB draws the
    identical slice). Both ladder rungs — banding candidates and
    exact-Jaccard truth — see only the slice, so the audit measures
    the same banding configuration at half the quadratic-truth cost;
    the full-corpus exhaustive form stays registered as q240. This
    carries the headline-bench slot (q240 was 18% of the r5 bench
    warm total)."""
    from databricks_etl_spark.plans.queries_round5b import _lsh_quality_audit

    d = read_table(spark, sf_dir, "documents")
    sliced = d.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) <= "7"
    )
    return _lsh_quality_audit(sliced)


@query(
    "q256_band_index_update",
    oracle=f"""
        WITH {_bands_sql_incremental()},
        hit AS (
            SELECT DISTINCT a.doc_id
            FROM bb a JOIN cb c
              ON a.band = c.band AND a.band_hash = c.band_hash
        ),
        novel AS (
            SELECT doc_id FROM bb EXCEPT SELECT doc_id FROM hit
        )
        SELECT doc_id, band, band_hash FROM cb
        UNION ALL
        SELECT b2.doc_id, b2.band, b2.band_hash
        FROM bb b2 JOIN (SELECT DISTINCT doc_id FROM novel) n USING (doc_id)
    """,
)
def q256_band_index_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The write side of incremental maintenance: the UPDATED corpus
    band index after an ingest = existing index ∪ bands of the batch's
    NOVEL documents only (q253's decision applied) — near-dup suspects
    are quarantined, so their bands never pollute the index. The
    oracle recomputes the same index from scratch over corpus ∪ batch,
    proving the incremental append equals the recompute-the-world
    result. At 100 TB this is an append-only partition write of
    |novel|×4 rows per batch; the index itself is never rewritten."""
    from databricks_etl_spark.operators.dedup import incremental_band_join

    batch_bands, corpus_bands = _incremental_bands(spark, sf_dir)
    pairs = incremental_band_join(batch_bands, corpus_bands)
    hit = (
        pairs.filter("cross_corpus")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    novel_bands = batch_bands.join(hit, "doc_id", "left_anti")
    return corpus_bands.unionByName(novel_bands)


@query(
    "q257_streaming_incremental_neardup",
    oracle=f"""
        WITH {_bands_sql_incremental()},
        cross_p AS (
            SELECT least(a.doc_id, c.doc_id) AS id_a,
                   greatest(a.doc_id, c.doc_id) AS id_b,
                   TRUE AS cross_corpus
            FROM bb a JOIN cb c
              ON a.band = c.band AND a.band_hash = c.band_hash
        ),
        within_p AS (
            SELECT a.doc_id AS id_a, c.doc_id AS id_b, FALSE AS cross_corpus
            FROM bb a JOIN bb c
              ON a.band = c.band AND a.band_hash = c.band_hash
             AND a.doc_id < c.doc_id
        ),
        u AS (SELECT * FROM cross_p UNION ALL SELECT * FROM within_p)
        SELECT id_a, id_b, cross_corpus,
               CAST(COUNT(*) AS BIGINT) AS n_shared_bands
        FROM u GROUP BY 1, 2, 3
    """,
)
def q257_streaming_incremental_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q252's incremental near-dup run as a TRUE Structured Streaming
    ingest loop (``streaming/neardup.py``): per micro-batch the delta
    is banded, joined against the index-so-far, pairs land in an
    epoch-idempotent sink, and the delta's bands are appended to the
    index for later epochs — so the drained pair set is invariant to
    how the engine slices micro-batches (a cross-epoch pair is found
    exactly once, when its later doc arrives). Hash-checked against
    the same recompute-the-world oracle as q252; the epoch-slicing
    invariance itself is unit-tested with a forced two-epoch harness
    in tests/test_streaming.py."""
    from databricks_etl_spark.streaming.neardup import (
        run_streaming_incremental_neardup,
    )

    return run_streaming_incremental_neardup(spark, sf_dir)


# ---------------------------------------------------------------------------
# q258 — quality-aware near-dup survivor selection
# ---------------------------------------------------------------------------


@query(
    "q258_quality_survivor_dedup",
    oracle=None,  # set below — needs _PAIRS_05 + the q37 quality SQL
)
def q258_quality_survivor_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup survivorship by QUALITY, not by id: within each
    near-dup cluster (q123's connected components over unigram-Jaccard
    pairs) the survivor is the member with the highest quality_score
    (q37's composite; doc_id min as tiebreak) — the production rule
    for choosing which copy of duplicated content enters the training
    mix. Unclustered docs pass through. The per-cluster ranking window
    is bounded by cluster size (dup groups, not the corpus), so the
    plan stays scale-safe — a degenerate giant cluster (mass
    boilerplate) is excluded upstream by q272's hot-bucket cap before
    it ever reaches clustering; quality_score is a sum of exact 0.25 terms,
    so the cross-engine ordering cannot diverge on ulps. Fully
    hash-oracled: recursive-CTE closure + identical quality SQL."""
    from databricks_etl_spark.operators import text as TX
    from databricks_etl_spark.plans.queries_dedup import _neardup_components

    d = read_table(spark, sf_dir, "documents")
    comps = _neardup_components(spark, sf_dir)
    quality = TX.quality_features(d).select("doc_id", "quality_score")
    labeled = (
        d.select("doc_id")
        .join(comps, d.doc_id == comps.id, "left")
        .select(
            "doc_id",
            F.coalesce("component", F.col("doc_id")).alias("cluster_id"),
            F.col("id").isNotNull().alias("was_clustered"),
        )
        .join(quality, "doc_id")
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.desc("quality_score"), "doc_id"
    )
    return (
        labeled.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("doc_id", "cluster_id", "was_clustered", "quality_score")
    )


def _q258_oracle() -> str:
    from databricks_etl_spark.plans.queries_dedup import _PAIRS_05
    from databricks_etl_spark.plans.queries_text import _STOP_ALL
    from databricks_etl_spark.plans.queries_text import _TOKS as _TTOKS

    return f"""
        WITH RECURSIVE {_PAIRS_05},
        q AS (
            SELECT doc_id,
                   CAST(
                     (CASE WHEN len({_TTOKS}) BETWEEN 5 AND 1000
                           THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(text)
                             - length(regexp_replace(text,
                                 '[!-/:-@\\[-`{{-~]', '', 'g')) AS DOUBLE)
                             / length(text) < 0.1 THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN CAST(len(list_filter({_TTOKS},
                             t -> t IN ({_STOP_ALL}))) AS DOUBLE)
                             / len({_TTOKS}) > 0.01 THEN 0.25 ELSE 0.0 END)
                   + (CASE WHEN CAST(length(text) - (len({_TTOKS}) - 1)
                             AS DOUBLE) / len({_TTOKS})
                             BETWEEN 2.0 AND 12.0 THEN 0.25 ELSE 0.0 END)
                     AS DOUBLE) AS quality_score
            FROM documents
        ),
        lab AS (
            SELECT d.doc_id,
                   COALESCE(cc.component, d.doc_id) AS cluster_id,
                   (cc.id IS NOT NULL) AS was_clustered,
                   q.quality_score
            FROM documents d
            LEFT JOIN cc ON d.doc_id = cc.id
            JOIN q ON d.doc_id = q.doc_id
        )
        SELECT doc_id, cluster_id, was_clustered, quality_score
        FROM (
            SELECT *, row_number() OVER (
                PARTITION BY cluster_id
                ORDER BY quality_score DESC, doc_id) AS rn
            FROM lab
        ) WHERE rn = 1
    """


from dataclasses import replace as _replace  # noqa: E402

from databricks_etl_spark.plans.registry import QUERIES as _Q  # noqa: E402

_Q["q258_quality_survivor_dedup"] = _replace(
    _Q["q258_quality_survivor_dedup"], oracle=_q258_oracle()
)


# ---------------------------------------------------------------------------
# q259 — change-point detection (binary segmentation, step 1)
# ---------------------------------------------------------------------------


@query(
    "q259_revenue_changepoint",
    oracle="""
        WITH daily AS (
            SELECT CAST(o_orderdate AS DATE) AS d,
                   SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
            FROM orders GROUP BY 1
        ),
        c AS (
            SELECT d,
                   SUM(rev) OVER (ORDER BY d
                       ROWS UNBOUNDED PRECEDING) AS cum,
                   SUM(rev) OVER () AS tot,
                   CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS nt,
                   CAST(COUNT(*) OVER () AS BIGINT) AS nn
            FROM daily
        ),
        g AS (
            SELECT d, nt, nn,
                   CAST(cum AS DOUBLE) / nt AS mean_before,
                   CAST(tot - cum AS DOUBLE) / (nn - nt) AS mean_after
            FROM c WHERE nt < nn
        )
        SELECT CAST(d AS TIMESTAMP) AS split_date,
               nt AS n_days_before,
               (nn - nt) AS n_days_after,
               round(mean_before, 6) AS mean_before,
               round(mean_after, 6) AS mean_after,
               round(abs(mean_before - mean_after), 6) AS mean_gap
        FROM g
        ORDER BY abs(mean_before - mean_after) DESC, d
        LIMIT 1
    """,
)
def q259_revenue_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-point detection on the daily-revenue series (binary
    segmentation, first split): the date that maximizes the absolute
    gap between the mean revenue before and after it. Cumulative sums
    are exact decimals (order-independent), so the double means and
    the argmax ordering are bit-identical cross-engine with no
    rounding tricks; tie broken by date. The windows run over the
    per-DAY grid (~2.4k rows for TPC-H's 7-year span) — bounded by
    the calendar, not the fact table, so the single-ordering window
    is scale-safe (the same argument as the EWMA/seasonality series
    queries)."""
    from databricks_etl_spark.functions.scalars import MONEY

    o = read_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.to_date("o_orderdate").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(MONEY)).alias("rev")
    )
    w = Window.orderBy("d")
    c = daily.select(
        "d",
        F.sum("rev").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("cum"),
        F.sum("rev").over(Window.partitionBy()).alias("tot"),
        F.row_number().over(w).cast("long").alias("nt"),
        F.count(F.lit(1)).over(Window.partitionBy()).cast("long").alias("nn"),
    ).filter(F.col("nt") < F.col("nn"))
    g = c.select(
        "d",
        "nt",
        "nn",
        (F.col("cum").cast("double") / F.col("nt")).alias("mean_before"),
        ((F.col("tot") - F.col("cum")).cast("double") / (F.col("nn") - F.col("nt"))).alias(
            "mean_after"
        ),
    )
    return (
        g.orderBy(F.abs(F.col("mean_before") - F.col("mean_after")).desc(), "d")
        .limit(1)
        .select(
            F.col("d").cast("timestamp").alias("split_date"),
            F.col("nt").alias("n_days_before"),
            (F.col("nn") - F.col("nt")).alias("n_days_after"),
            F.round("mean_before", 6).alias("mean_before"),
            F.round("mean_after", 6).alias("mean_after"),
            F.round(F.abs(F.col("mean_before") - F.col("mean_after")), 6).alias(
                "mean_gap"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q260 — per-document unigram entropy (sequential-fold determinism)
# ---------------------------------------------------------------------------


@query(
    "q260_token_entropy",
    oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ),
        cnt AS (
            SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
        ),
        pd AS (
            SELECT doc_id,
                   CAST(SUM(c) AS BIGINT) AS n,
                   CAST(COUNT(*) AS BIGINT) AS n_distinct,
                   list_sort(list(CAST(c AS DOUBLE))) AS cs
            FROM cnt GROUP BY 1
        )
        SELECT doc_id,
               n AS n_tokens,
               n_distinct,
               round(log2(CAST(n AS DOUBLE))
                     - list_reduce(list_transform(cs, x -> x * log2(x)),
                                   (a, b) -> a + b) / n,
                     6) AS entropy_bits
        FROM pd
    """,
)
def q260_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document unigram Shannon entropy — the repetition/diversity
    quality signal (low entropy = boilerplate or token spam; the
    information-theoretic sibling of q82's repetition ratio).
    H = log2(n) − (Σ c·log2(c))/n over the doc's distinct-token
    counts. Cross-engine determinism by the SEQUENTIAL-FOLD rule
    (README): the counts are sorted, then both engines left-fold
    c·log2(c) in identical order (F.aggregate here, list_reduce in
    DuckDB), so the floating sum is bit-identical — no reliance on
    unordered SUM. Shuffle profile: two map-combinable aggregates on
    (doc, token) then doc — the same as TF (q39)."""
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    cnt = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("c"))
    pd_ = cnt.groupBy("doc_id").agg(
        F.sum("c").cast("long").alias("n"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sort_array(F.collect_list(F.col("c").cast("double"))).alias("cs"),
    )
    fold = F.aggregate(
        "cs", F.lit(0.0), lambda a, c: a + c * F.log2(c)
    )
    return pd_.select(
        "doc_id",
        F.col("n").alias("n_tokens"),
        "n_distinct",
        F.round(
            F.log2(F.col("n").cast("double")) - fold / F.col("n"), 6
        ).alias("entropy_bits"),
    )


# ---------------------------------------------------------------------------
# q261 — VARIANT semi-structured lane (Spark 4)
# ---------------------------------------------------------------------------


@query(
    "q261_variant_semistructured",
    oracle="""
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(props->>'$.k' AS INTEGER)) AS BIGINT) AS sum_k,
               round(CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE), 6)
                   AS sum_value
        FROM events
        GROUP BY event_type
    """,
)
def q261_variant_semistructured(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT end to end: each event's fields are re-encoded
    as one nested JSON document, ingested with ``try_parse_json`` into
    a VARIANT column (the open-schema semi-structured type — Spark's
    answer to JSON columns at 100 TB: parsed once into a binary
    encoding, path access without re-parsing, malformed input → NULL
    not a crash), then typed back out with ``variant_get`` paths
    ($.k int, $.et string, $.m.v double) and aggregated. The oracle
    computes the same aggregate from the raw columns — equality proves
    the encode → variant → typed-extract path is lossless. The JSON
    construction is deliberately part of the query so the lane tests
    nested objects, not just the flat {"k": n} testdata props."""
    from databricks_etl_spark.functions.scalars import MONEY

    e = read_table(spark, sf_dir, "events")
    doc = F.to_json(
        F.struct(
            F.get_json_object("props", "$.k").cast("int").alias("k"),
            F.col("event_type").alias("et"),
            F.struct(F.col("value").alias("v")).alias("m"),
        )
    )
    v = e.select(F.try_parse_json(doc).alias("v"))
    typed = v.select(
        F.variant_get("v", "$.k", "int").alias("k"),
        F.variant_get("v", "$.et", "string").alias("event_type"),
        F.variant_get("v", "$.m.v", "double").alias("value"),
    )
    return typed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("k").cast("long").alias("sum_k"),
        F.round(
            F.sum(F.col("value").cast(MONEY)).cast("double"), 6
        ).alias("sum_value"),
    )


# ---------------------------------------------------------------------------
# q262 — per-brand Pareto front (skyline query)
# ---------------------------------------------------------------------------


@query(
    "q262_pareto_front_parts",
    oracle="""
        SELECT p.p_brand, p.p_partkey, p.p_retailprice, p.p_size
        FROM part p
        WHERE NOT EXISTS (
            SELECT 1 FROM part o
            WHERE o.p_brand = p.p_brand
              AND o.p_retailprice <= p.p_retailprice
              AND o.p_size <= p.p_size
              AND (o.p_retailprice < p.p_retailprice
                   OR o.p_size < p.p_size)
        )
    """,
)
def q262_pareto_front_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto-front query: per brand, the parts not dominated
    on (retailprice, size) — both minimized; a part survives unless a
    same-brand part is ≤ on both axes and < on one. The oracle states
    the quadratic NOT EXISTS definition; the engine computes it in
    O(n log n) per brand with the sort-and-running-min skyline sweep:
    group to (brand, price) with the group's min size, a per-brand
    ordered window over the DISTINCT PRICE groups gives the min size
    among strictly-cheaper groups, and a part is on the front iff it
    is min-size within its price group AND no cheaper group undercuts
    its size. No quadratic self-join anywhere; the window runs over
    price groups within one brand (bounded, and never the fact
    table)."""
    p = read_table(spark, sf_dir, "part").select(
        "p_brand", "p_partkey", "p_retailprice", "p_size"
    )
    grp = p.groupBy("p_brand", "p_retailprice").agg(
        F.min("p_size").alias("msize")
    )
    w = Window.partitionBy("p_brand").orderBy("p_retailprice")
    grp2 = grp.withColumn(
        "prev_min",
        F.min("msize").over(w.rowsBetween(Window.unboundedPreceding, -1)),
    )
    j = p.join(grp2, ["p_brand", "p_retailprice"])
    return j.filter(
        (F.col("p_size") == F.col("msize"))
        & (F.col("prev_min").isNull() | (F.col("prev_min") > F.col("p_size")))
    ).select("p_brand", "p_partkey", "p_retailprice", "p_size")


# ---------------------------------------------------------------------------
# q263 — BM25 retrieval scoring
# ---------------------------------------------------------------------------

# fixed query terms (the IR probe a retrieval pipeline would score):
_Q263_TERMS = ("data", "model", "training", "quality")
_Q263_K1, _Q263_B = 1.2, 0.75

# the (doc, term) BM25 contribution CTE chain (tok..contrib) — shared
# verbatim by q263's oracle and the impact-ordered pruning sweep
# (queries_round11.q405), so the two lanes score identically
_Q263_CONTRIB_SQL = rf"""tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ),
        dl AS (SELECT doc_id, COUNT(*) AS len FROM tok GROUP BY 1),
        stats AS (
            SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                   AVG(CAST(len AS DOUBLE)) AS avgdl
            FROM dl
        ),
        tf AS (
            SELECT doc_id, w, COUNT(*) AS f FROM tok
            WHERE w IN ({", ".join(f"'{t}'" for t in _Q263_TERMS)})
            GROUP BY 1, 2
        ),
        df AS (SELECT w, COUNT(*) AS d FROM tf GROUP BY 1),
        contrib AS (
            SELECT tf.doc_id, tf.w,
                   CAST(round(
                       ln((stats.n_docs - df.d + 0.5) / (df.d + 0.5) + 1.0)
                       * (tf.f * ({_Q263_K1} + 1.0))
                       / (tf.f + {_Q263_K1} * (1.0 - {_Q263_B}
                          + {_Q263_B} * dl.len / stats.avgdl)),
                       9) AS DECIMAL(18,9)) AS c
            FROM tf
            JOIN df USING (w)
            JOIN dl USING (doc_id)
            CROSS JOIN stats
        )"""


@query(
    "q263_bm25_retrieval",
    oracle=f"""
        WITH {_Q263_CONTRIB_SQL}
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_terms_hit,
               round(CAST(SUM(c) AS DOUBLE), 6) AS bm25
        FROM contrib GROUP BY doc_id
    """,
)
def q263_bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 scoring of the corpus against a fixed query-term set — the
    lexical-retrieval sibling of the embedding ANN lane (hybrid search
    scores both). Classic Okapi form (k1=1.2, b=0.75) with
    the +1 idf smoothing. Cross-engine float discipline: each (doc,
    term) contribution is one deterministic double expression, rounded
    to 9dp and cast to DECIMAL(18,9) BEFORE the per-doc sum — decimal
    addition is order-independent, so the score hash cannot flake on
    summation order (the same rule as decimal revenue sums). Shuffle
    profile: the term filter prunes the token stream to the query
    vocabulary before any shuffle; df/avgdl are tiny broadcast
    aggregates."""
    return _q263_contrib(spark, sf_dir).groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_terms_hit"),
        F.round(F.sum("c").cast("double"), 6).alias("bm25"),
    )


def _q263_contrib(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The (doc_id, w, c) BM25 contribution relation — q263's scoring
    kernel, shared with the impact-ordered pruning sweep
    (queries_round11.q405). Spark twin of ``_Q263_CONTRIB_SQL``."""
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("len"))
    stats = dl.agg(
        F.count(F.lit(1)).cast("double").alias("n_docs"),
        F.avg(F.col("len").cast("double")).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("w").isin(*_Q263_TERMS))
        .groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("f"))
    )
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("d"))
    contrib = (
        tf.join(F.broadcast(df_), "w")
        # dl scales with the corpus — NEVER broadcast; the doc_id hash
        # join is the right plan (tf is already query-vocab-pruned)
        .join(dl, "doc_id")
        .join(F.broadcast(stats))
        .select(
            "doc_id",
            "w",
            F.round(
                F.log(
                    (F.col("n_docs") - F.col("d") + 0.5) / (F.col("d") + 0.5)
                    + 1.0
                )
                * (F.col("f") * (_Q263_K1 + 1.0))
                / (
                    F.col("f")
                    + _Q263_K1
                    * (1.0 - _Q263_B + _Q263_B * F.col("len") / F.col("avgdl"))
                ),
                9,
            )
            .cast("decimal(18,9)")
            .alias("c"),
        )
    )
    return contrib


# ---------------------------------------------------------------------------
# q264 — k-anonymity audit (privacy lane, next to q141's PII redaction)
# ---------------------------------------------------------------------------

_Q264_K = 5


@query(
    "q264_k_anonymity_audit",
    oracle=f"""
        WITH qi AS (
            SELECT c_nationkey, c_mktsegment,
                   CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
                   COUNT(*) AS n
            FROM customer GROUP BY 1, 2, 3
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               CAST(SUM(CASE WHEN n < {_Q264_K} THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_small_classes,
               CAST(SUM(CASE WHEN n < {_Q264_K} THEN n ELSE 0 END) AS BIGINT)
                   AS n_reidentifiable_rows,
               CAST(MIN(n) AS BIGINT) AS k_anonymity,
               round(CAST(SUM(CASE WHEN n < {_Q264_K} THEN n ELSE 0 END)
                          AS DOUBLE) / SUM(n), 6) AS reident_risk_share
        FROM qi
    """,
)
def q264_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers (nation × market
    segment × $1000 balance band): the privacy gate a data release
    runs next to PII redaction (q141) — equivalence classes smaller
    than k=5 members make their rows re-identifiable. Reports
    the achieved k (min class size), the count of small classes, and
    the share of at-risk rows. One map-combinable groupBy on the
    quasi-identifier tuple + a 1-row summary — the same profile as a
    value-counts query at any scale."""
    c = read_table(spark, sf_dir, "customer")
    qi = c.groupBy(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000.0).cast("long").alias("bal_band"),
    ).agg(F.count(F.lit(1)).alias("n"))
    small = F.when(F.col("n") < _Q264_K, 1).otherwise(0)
    small_rows = F.when(F.col("n") < _Q264_K, F.col("n")).otherwise(0)
    return qi.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.sum(small).cast("long").alias("n_small_classes"),
        F.sum(small_rows).cast("long").alias("n_reidentifiable_rows"),
        F.min("n").cast("long").alias("k_anonymity"),
        F.round(
            F.sum(small_rows).cast("double") / F.sum("n"), 6
        ).alias("reident_risk_share"),
    )


# ---------------------------------------------------------------------------
# q265 — per-dimension embedding statistics (hygiene sibling of q230)
# ---------------------------------------------------------------------------


@query(
    "q265_embedding_dim_stats",
    oracle="""
        WITH e AS (
            SELECT vec_id,
                   unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        )
        SELECT CAST(dim AS INT) AS dim,
               CAST(COUNT(*) AS BIGINT) AS n,
               round(CAST(SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12)))
                          AS DOUBLE)
                     / COUNT(*), 6) AS mean_x,
               round(CAST(SUM(CAST(CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))
                                   * CAST(CAST(x AS DOUBLE) AS DECIMAL(18,9))
                              AS DECIMAL(38,18))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_x2,
               round(CAST(MIN(x) AS DOUBLE), 6) AS min_x,
               round(CAST(MAX(x) AS DOUBLE), 6) AS max_x
        FROM e GROUP BY dim
    """,
)
def q265_embedding_dim_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension embedding distribution stats — the drift /
    normalization audit run before indexing a vector corpus (a
    collapsed or exploded dimension shows up as a degenerate mean or
    range; the per-VECTOR hygiene gate is q230). posexplode keys the
    shuffle by (dim), 16–1024 groups — map-combinable, flat at any
    corpus size. Decimal discipline: float32 inputs are exact in
    DECIMAL(18,9) (x and x² likewise in the widened product type), so
    the sums are order-independent and the 6dp means hash-stable."""
    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select("vec_id", (F.col("pos") + 1).cast("int").alias("dim"), "x")
    xd = F.col("x").cast("double").cast("decimal(18,9)")
    return ex.groupBy("dim").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.round(
            (
                F.sum(
                    F.col("x").cast("double").cast("decimal(28,12)")
                ).cast("double")
            )
            / F.count(F.lit(1)),
            6,
        ).alias("mean_x"),
        F.round(
            F.sum((xd * xd).cast("decimal(38,18)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("mean_x2"),
        F.round(F.min("x").cast("double"), 6).alias("min_x"),
        F.round(F.max("x").cast("double"), 6).alias("max_x"),
    )


# ---------------------------------------------------------------------------
# q266 — embedded-record parsing breadth (from_csv, str_to_map)
# ---------------------------------------------------------------------------


@query(
    "q266_embedded_record_parsing",
    oracle="""
        WITH enc AS (
            SELECT event_id,
                   event_type || ',' || CAST(user_id AS VARCHAR)
                       || ',' || CAST(round(value, 3) AS VARCHAR) AS csv_s,
                   'et=' || event_type || ';uid='
                       || CAST(user_id AS VARCHAR) AS kv_s
            FROM events
        ),
        parsed AS (
            SELECT event_id,
                   string_split(csv_s, ',')[1] AS c_type,
                   CAST(string_split(csv_s, ',')[2] AS BIGINT) AS c_user,
                   CAST(string_split(csv_s, ',')[3] AS DOUBLE) AS c_value,
                   string_split(string_split(kv_s, ';')[1], '=')[2] AS m_type,
                   CAST(string_split(string_split(kv_s, ';')[2], '=')[2]
                        AS BIGINT) AS m_user
            FROM enc
        )
        SELECT c_type AS event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(c_user) AS BIGINT) AS sum_user,
               round(CAST(SUM(CAST(c_value AS DECIMAL(18,3))) AS DOUBLE), 3)
                   AS sum_value,
               CAST(MIN(CASE WHEN c_type = m_type AND c_user = m_user
                             THEN 1 ELSE 0 END) AS BIGINT) AS parsers_agree
        FROM parsed GROUP BY 1
    """,
)
def q266_embedded_record_parsing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedded-record parsing breadth: events re-encoded as delimited
    strings, then recovered with BOTH structured parsers — ``from_csv``
    (schema'd CSV-in-a-cell, the S2 lane at cell granularity) and
    ``str_to_map`` (k=v;k=v attribute strings) — and cross-validated:
    parsers_agree proves the two decoders reconstruct identical
    fields. Values round-trip through round(·,3) text so the
    double→string→double path is exact on both engines. Everything is
    map-side expression work; the only shuffle is the final 5-key
    aggregate."""
    e = read_table(spark, sf_dir, "events")
    csv_s = F.concat_ws(
        ",",
        "event_type",
        F.col("user_id").cast("string"),
        F.round("value", 3).cast("string"),
    )
    kv_s = F.concat(
        F.lit("et="),
        F.col("event_type"),
        F.lit(";uid="),
        F.col("user_id").cast("string"),
    )
    enc = e.select("event_id", csv_s.alias("csv_s"), kv_s.alias("kv_s"))
    parsed = enc.select(
        "event_id",
        F.from_csv(
            "csv_s", F.lit("c_type string, c_user bigint, c_value double")
        ).alias("r"),
        F.str_to_map("kv_s", F.lit(";"), F.lit("=")).alias("m"),
    ).select(
        "event_id",
        "r.c_type",
        "r.c_user",
        "r.c_value",
        F.col("m")["et"].alias("m_type"),
        F.col("m")["uid"].cast("bigint").alias("m_user"),
    )
    agree = F.when(
        (F.col("c_type") == F.col("m_type"))
        & (F.col("c_user") == F.col("m_user")),
        1,
    ).otherwise(0)
    return parsed.groupBy(F.col("c_type").alias("event_type")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("c_user").cast("long").alias("sum_user"),
        F.round(
            F.sum(F.col("c_value").cast("decimal(18,3)")).cast("double"), 3
        ).alias("sum_value"),
        F.min(agree).cast("long").alias("parsers_agree"),
    )


# ---------------------------------------------------------------------------
# q267 — time-weighted average value per user (TWAP)
# ---------------------------------------------------------------------------


@query(
    "q267_time_weighted_average",
    oracle="""
        WITH seq AS (
            SELECT user_id,
                   CAST(floor(epoch(ts)) AS BIGINT) AS t,
                   value,
                   lead(CAST(floor(epoch(ts)) AS BIGINT)) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS t_next
            FROM events
        ),
        seg AS (
            SELECT user_id,
                   CAST(value AS DECIMAL(28,6)) * (t_next - t) AS wv,
                   (t_next - t) AS w
            FROM seq WHERE t_next IS NOT NULL AND t_next > t
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_segments,
               CAST(SUM(w) AS BIGINT) AS held_seconds,
               round(CAST(SUM(wv) AS DOUBLE) / SUM(w), 6) AS twap
        FROM seg GROUP BY user_id
    """,
)
def q267_time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average (TWAP): each event's value is held until
    the user's next event; the average weights each value by its
    holding duration — the correct aggregate for sampled-state series
    (balances, prices, queue depths), where the plain AVG over-weights
    bursts. lead() over the per-user order gives segment ends;
    weighted sums are exact decimals × integer seconds (epoch floor on
    both engines), so the 6dp ratio is hash-stable. Zero-length
    segments (duplicate timestamps) carry zero weight and are dropped
    identically on both sides. One shuffle on user_id."""
    from databricks_etl_spark.functions.scalars import MONEY

    e = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        F.unix_timestamp("ts").alias("t"),
        "value",
        F.lead(F.unix_timestamp("ts")).over(w).alias("t_next"),
    ).filter(F.col("t_next").isNotNull() & (F.col("t_next") > F.col("t")))
    seg = seq.select(
        "user_id",
        (F.col("value").cast(MONEY) * (F.col("t_next") - F.col("t"))).alias("wv"),
        (F.col("t_next") - F.col("t")).alias("w"),
    )
    return seg.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("w").cast("long").alias("held_seconds"),
        F.round(F.sum("wv").cast("double") / F.sum("w"), 6).alias("twap"),
    )


# ---------------------------------------------------------------------------
# q268 — multimodal corrupt-rate audit (quarantine lane, driver-checked)
# ---------------------------------------------------------------------------


@query(
    "q268_multimodal_corrupt_rate",
    oracle="""
        WITH pay AS (
            SELECT doc_id, source,
                   CASE
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                       THEN 'truncated'
                     WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '1'
                       THEN 'null'
                     ELSE 'ok'
                   END AS kind
            FROM documents WHERE doc_id < 200
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_payloads,
               CAST(SUM(CASE WHEN kind = 'ok' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_decoded,
               CAST(SUM(CASE WHEN kind <> 'ok' THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_quarantined,
               round(CAST(SUM(CASE WHEN kind <> 'ok' THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS corrupt_rate
        FROM pay GROUP BY source
    """,
)
def q268_multimodal_corrupt_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal QUARANTINE lane driver-checked end to end (until
    now it was unit-test evidence only): real BMP payloads are planted
    with deterministic corruption — md5(doc_id) first hex '0' →
    truncated bytes, '1' → NULL payload — pushed through the Arrow
    ``mapInPandas`` decoder, and the per-source decode/quarantine
    counts are aggregated. A decoded row has a width; a quarantined
    one reports NULL features but never kills the stage. The oracle
    recomputes the rates from the planting predicate alone, so the
    value hash proves BOTH that corrupt payloads quarantine AND that
    valid ones all decode."""
    from databricks_etl_spark.operators import multimodal as MM

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    pay = MM.generate_bmp_payloads(d)
    h1 = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    planted = pay.withColumn(
        "payload",
        F.when(h1 == "0", F.expr("substring(payload, 1, 10)"))
        .when(h1 == "1", F.lit(None).cast("binary"))
        .otherwise(F.col("payload")),
    )
    feats = MM.decode_features(planted)
    src = d.select("doc_id", "source")
    j = feats.join(src, "doc_id")
    bad = F.when(F.col("width").isNull(), 1).otherwise(0)
    return j.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_payloads"),
        F.sum(1 - bad).cast("long").alias("n_decoded"),
        F.sum(bad).cast("long").alias("n_quarantined"),
        F.round(F.sum(bad).cast("double") / F.count(F.lit(1)), 6).alias(
            "corrupt_rate"
        ),
    )


# ---------------------------------------------------------------------------
# q269 — LSH pruning-efficiency report (the 100 TB cost story, measured)
# ---------------------------------------------------------------------------


def _q269_oracle() -> str:
    from databricks_etl_spark.plans.queries_round4 import _BANDS_SQL

    return f"""
        WITH {_BANDS_SQL},
        buckets AS (
            SELECT band, band_hash, COUNT(*) AS s
            FROM b GROUP BY 1, 2
        ),
        tot AS (SELECT COUNT(DISTINCT doc_id) AS n FROM b)
        SELECT CAST(tot.n AS BIGINT) AS n_docs,
               CAST(COUNT(*) AS BIGINT) AS n_buckets,
               CAST(MAX(s) AS BIGINT) AS max_bucket,
               CAST(SUM(s * (s - 1) / 2) AS BIGINT) AS candidate_pairs,
               CAST(tot.n * (tot.n - 1) / 2 AS BIGINT) AS allpairs,
               round(CAST(tot.n * (tot.n - 1) / 2 AS DOUBLE)
                     / SUM(s * (s - 1) / 2), 2) AS pruning_factor
        FROM buckets, tot
        GROUP BY tot.n
    """


@query("q269_lsh_pruning_efficiency", oracle=_q269_oracle())
def q269_lsh_pruning_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The measured cost story behind the 'banding is 100 TB-safe'
    claim: per band-bucket of size s the candidate join materializes
    s·(s−1)/2 comparisons; this audit sums that over every bucket and
    reports the pruning factor vs the N·(N−1)/2 all-pairs product —
    the number a capacity plan would use to size the dedup stage.
    (Bucket-pair counting happens BEFORE pair dedup across bands, i.e.
    it measures join work, not distinct candidates — deliberately, as
    that is what the executors actually pay.) One aggregate over the
    band relation; no pair materialization anywhere."""
    from databricks_etl_spark.plans.queries_round4 import _band_buckets

    b = _band_buckets(spark, sf_dir)
    buckets = b.groupBy("band", "band_hash").agg(F.count(F.lit(1)).alias("s"))
    tot = b.agg(F.count_distinct("doc_id").alias("n"))
    cand = F.sum(F.expr("s * (s - 1) DIV 2"))
    return buckets.join(F.broadcast(tot)).groupBy("n").agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("s").cast("long").alias("max_bucket"),
        cand.cast("long").alias("candidate_pairs"),
        F.expr("first(n * (n - 1) DIV 2)").cast("long").alias("allpairs"),
        F.round(
            F.try_divide(F.expr("first(n * (n - 1) DIV 2)").cast("double"), cand),
            2,
        ).alias("pruning_factor"),
    ).select(
        F.col("n").cast("long").alias("n_docs"),
        "n_buckets",
        "max_bucket",
        "candidate_pairs",
        "allpairs",
        "pruning_factor",
    )


# ---------------------------------------------------------------------------
# q270 — trending tokens per event-week (windowed top-K, partitioned)
# ---------------------------------------------------------------------------


@query(
    "q270_trending_tokens_weekly",
    oracle=r"""
        WITH tok AS (
            SELECT (doc_id % 10) AS wk,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ),
        cnt AS (
            SELECT wk, w, COUNT(*) AS c FROM tok GROUP BY 1, 2
        ),
        ranked AS (
            SELECT wk, w, c,
                   row_number() OVER (
                       PARTITION BY wk ORDER BY c DESC, w) AS rk
            FROM cnt
        )
        SELECT CAST(wk AS BIGINT) AS wk,
               CAST(rk AS BIGINT) AS rank,
               w AS token,
               CAST(c AS BIGINT) AS n_occurrences
        FROM ranked WHERE rk <= 3
    """,
)
def q270_trending_tokens_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending tokens per ingest batch (doc_id % 10 as the batch/week
    key): top-3 tokens by count within each batch with the
    deterministic (count DESC, token) tiebreak — the dashboard query
    behind 'what is this week's crawl full of'. The ranking window is
    PARTITIONED by the batch key (unlike q142's global vocab rank), so
    at 100 TB each partition sorts only its own token tally — this is
    the shape the scale rules allow without a twin."""
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        (F.col("doc_id") % 10).alias("wk"),
        F.explode(tokens_col("text")).alias("w"),
    )
    cnt = tok.groupBy("wk", "w").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy("wk").orderBy(F.desc("c"), "w")
    return (
        cnt.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select(
            F.col("wk").cast("long").alias("wk"),
            F.col("rank").cast("long").alias("rank"),
            F.col("w").alias("token"),
            F.col("c").cast("long").alias("n_occurrences"),
        )
    )


# ---------------------------------------------------------------------------
# q271 — TF-IDF weighted cosine pairs (sparse similarity join)
# ---------------------------------------------------------------------------

_Q271_MAXDF = 100
_Q271_THRESH = 0.5


@query(
    "q271_tfidf_cosine_pairs",
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
            FROM documents
        ),
        tf AS (SELECT doc_id, w, COUNT(*) AS f FROM tok GROUP BY 1, 2),
        n AS (SELECT CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS nd FROM tf),
        dfq AS (
            SELECT w, COUNT(*) AS d FROM tf GROUP BY 1
            HAVING COUNT(*) <= {_Q271_MAXDF}
        ),
        wt AS (
            SELECT tf.doc_id, tf.w,
                   tf.f * ln(n.nd / dfq.d) AS wd
            FROM tf JOIN dfq USING (w) CROSS JOIN n
        ),
        norm AS (
            SELECT doc_id,
                   sqrt(CAST(SUM(CAST(round(wd * wd, 9) AS DECIMAL(28,9)))
                             AS DOUBLE)) AS nrm
            FROM wt GROUP BY 1
        ),
        prod AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(SUM(CAST(round(a.wd * b.wd, 9) AS DECIMAL(28,9)))
                        AS DOUBLE) AS dot,
                   CAST(COUNT(*) AS BIGINT) AS n_shared_terms
            FROM wt a JOIN wt b USING (w)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT id_a, id_b, n_shared_terms,
               round(dot / (na.nrm * nb.nrm), 6) AS cosine
        FROM prod
        JOIN norm na ON prod.id_a = na.doc_id
        JOIN norm nb ON prod.id_b = nb.doc_id
        WHERE dot / (na.nrm * nb.nrm) >= {_Q271_THRESH}
    """,
)
def q271_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF weighted cosine similarity join — the SPARSE-vector rung
    between exact set Jaccard (q43) and dense embedding cosine (q47):
    rare shared vocabulary counts more, so it catches topical
    near-dups that set overlap underweights. Same inverted-index plan
    and max_df posting cap as the Jaccard ladder (the df cap also
    kills the idf≈0 stop-tokens that would dominate join cost while
    contributing nothing to the score). Float discipline: each w_a·w_b
    product and each w² norm term is rounded to 9dp and summed as
    DECIMAL(28,9) — order-independent — before the one final sqrt /
    divide, so the 6dp cosine is hash-stable cross-engine. The
    threshold compares the UNROUNDED ratio on both sides."""
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    tok = d.select("doc_id", F.explode(tokens_col("text")).alias("w"))
    tf = tok.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("f"))
    nd = tf.agg(F.count_distinct("doc_id").cast("double").alias("nd"))
    dfq = (
        tf.groupBy("w")
        .agg(F.count(F.lit(1)).alias("d"))
        .filter(F.col("d") <= _Q271_MAXDF)
    )
    wt = (
        tf.join(dfq, "w")
        .join(F.broadcast(nd))
        .select(
            "doc_id",
            "w",
            (F.col("f") * F.log(F.col("nd") / F.col("d"))).alias("wd"),
        )
    )
    dec = "decimal(28,9)"
    norm = wt.groupBy("doc_id").agg(
        F.sqrt(
            F.sum(F.round(F.col("wd") * F.col("wd"), 9).cast(dec)).cast("double")
        ).alias("nrm")
    )
    a = wt.select(F.col("doc_id").alias("id_a"), "w", F.col("wd").alias("wa"))
    b = wt.select(F.col("doc_id").alias("id_b"), "w", F.col("wd").alias("wb"))
    prod = (
        a.join(b, "w")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(F.round(F.col("wa") * F.col("wb"), 9).cast(dec))
            .cast("double")
            .alias("dot"),
            F.count(F.lit(1)).cast("long").alias("n_shared_terms"),
        )
    )
    na = norm.select(F.col("doc_id").alias("id_a"), F.col("nrm").alias("na"))
    nb = norm.select(F.col("doc_id").alias("id_b"), F.col("nrm").alias("nb"))
    # try_divide: an all-boilerplate corpus (every idf = 0) yields zero
    # norms; NULL cosine fails the >= filter, matching DuckDB's WHERE
    cos = F.try_divide(F.col("dot"), F.col("na") * F.col("nb"))
    return (
        prod.join(na, "id_a")
        .join(nb, "id_b")
        .filter(cos >= _Q271_THRESH)
        .select("id_a", "id_b", "n_shared_terms", F.round(cos, 6).alias("cosine"))
    )


_Q272_CAP = 8


@query(
    "q272_incremental_neardup_capped",
    oracle=f"""
        WITH {_bands_sql_incremental()},
        ok AS (
            SELECT band, band_hash FROM b
            GROUP BY 1, 2 HAVING COUNT(*) <= {_Q272_CAP}
        ),
        bbk AS (SELECT bb.* FROM bb JOIN ok USING (band, band_hash)),
        cbk AS (SELECT cb.* FROM cb JOIN ok USING (band, band_hash)),
        cross_p AS (
            SELECT least(a.doc_id, c.doc_id) AS id_a,
                   greatest(a.doc_id, c.doc_id) AS id_b,
                   TRUE AS cross_corpus
            FROM bbk a JOIN cbk c
              ON a.band = c.band AND a.band_hash = c.band_hash
        ),
        within_p AS (
            SELECT a.doc_id AS id_a, c.doc_id AS id_b, FALSE AS cross_corpus
            FROM bbk a JOIN bbk c
              ON a.band = c.band AND a.band_hash = c.band_hash
             AND a.doc_id < c.doc_id
        ),
        u AS (SELECT * FROM cross_p UNION ALL SELECT * FROM within_p)
        SELECT id_a, id_b, cross_corpus,
               CAST(COUNT(*) AS BIGINT) AS n_shared_bands
        FROM u GROUP BY 1, 2, 3
    """,
)
def q272_incremental_neardup_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q252 with the HOT-BUCKET GUARD engaged (max_bucket=8):
    band buckets whose total (index + delta) size exceeds the cap are
    excluded from candidate generation — the guard that keeps the band
    join from going quadratic when mass-duplicated boilerplate piles
    thousands of docs into one bucket (the band-join analog of the
    Jaccard ladder's max_df posting cap; the excluded clusters route
    to the boilerplate handler instead). Oracled with the same
    recompute-the-world SQL under an identical HAVING size cap, so
    the guard's exact semantics — not just its existence — are
    hash-checked. The cap-vs-work curve is unit-tested with a planted
    boilerplate cluster in tests/test_dedup_similarity.py."""
    return _incremental_candidates(spark, sf_dir, max_bucket=_Q272_CAP)


# ---------------------------------------------------------------------------
# q273 — dynamic-gap sessionization (per-event inactivity timeout)
# ---------------------------------------------------------------------------


@query(
    "q273_dynamic_gap_sessions",
    oracle="""
        WITH iv AS (
            SELECT user_id, event_id, ts, event_type,
                   ts + CASE WHEN event_type = 'click'
                             THEN INTERVAL '5 minutes'
                             ELSE INTERVAL '30 minutes' END AS e
            FROM events
        ),
        m AS (
            SELECT user_id, event_id, ts, event_type, e,
                   max(e) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                       AS prev_max_e
            FROM iv
        ),
        f AS (
            SELECT user_id, event_id, ts, event_type, e,
                   CASE WHEN prev_max_e IS NULL OR ts > prev_max_e
                        THEN 1 ELSE 0 END AS new_sess
            FROM m
        ),
        s AS (
            SELECT user_id, ts, event_type,
                   SUM(new_sess) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id, e
                       ROWS UNBOUNDED PRECEDING) AS sess_id
            FROM f
        )
        SELECT user_id,
               CAST(floor(epoch(MIN(ts))) AS BIGINT) AS session_start_epoch,
               COUNT(*) AS n_events,
               CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_clicks
        FROM s GROUP BY user_id, sess_id
    """,
)
def q273_dynamic_gap_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a PER-EVENT inactivity timeout
    (``session_window`` with a gap EXPRESSION — Spark's dynamic-gap
    form): clicks hold the session 5 minutes, heavier events 30 — the
    engagement-dependent timeout real session models use. Semantics
    are interval islands with e = ts + gap(event) and running-max-end
    (boundary-inclusive merge, exactly q245's machinery), which the
    oracle reproduces in µs-exact interval arithmetic — no float
    timestamps anywhere. One shuffle on user_id, state bounded by the
    largest gap."""
    e = read_table(spark, sf_dir, "events")
    gap = F.when(F.col("event_type") == "click", F.lit("5 minutes")).otherwise(
        F.lit("30 minutes")
    )
    return (
        e.groupBy(F.session_window("ts", gap), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("event_type") == "click", 1).otherwise(0)
            )
            .cast("long")
            .alias("n_clicks"),
        )
        .select(
            "user_id",
            F.unix_timestamp(F.col("session_window.start")).alias(
                "session_start_epoch"
            ),
            "n_events",
            "n_clicks",
        )
    )


# ---------------------------------------------------------------------------
# q274 — exact distinct counting via bitmap aggregates
# ---------------------------------------------------------------------------


@query(
    "q274_bitmap_distinct_customers",
    oracle="""
        SELECT o_orderpriority,
               CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY o_orderpriority
    """,
)
def q274_bitmap_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counting through the bitmap aggregate family
    (``bitmap_bucket_number`` / ``bitmap_bit_position`` /
    ``bitmap_construct_agg`` / ``bitmap_count``) — the middle rung of
    the distinct ladder: exact like COUNT(DISTINCT) but MERGEABLE like
    HLL (q143), because per-bucket bitmaps OR together. That is the
    materialized-rollup trick at 100 TB: persist per-(group, bucket)
    bitmaps once, answer any distinct query over group unions by
    bitmap_or_agg + popcount without touching raw data again. The
    oracle is plain COUNT(DISTINCT) — value equality proves the whole
    encode → construct → popcount chain exact."""
    o = read_table(spark, sf_dir, "orders")
    enc = o.select(
        "o_orderpriority",
        F.bitmap_bucket_number("o_custkey").alias("bkt"),
        F.bitmap_bit_position("o_custkey").alias("pos"),
    )
    per_bucket = enc.groupBy("o_orderpriority", "bkt").agg(
        F.bitmap_construct_agg("pos").alias("bm"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    return per_bucket.groupBy("o_orderpriority").agg(
        F.sum(F.bitmap_count("bm")).cast("long").alias("n_customers"),
        F.sum("n_rows").cast("long").alias("n_orders"),
    )


# ---------------------------------------------------------------------------
# q275 — regression aggregates from exact decimal moment sums
# ---------------------------------------------------------------------------


@query(
    "q275_regression_moments",
    oracle="""
        WITH pts AS (
            SELECT l_returnflag AS g,
                   CAST(l_quantity AS DECIMAL(28,6)) AS x,
                   CAST(l_extendedprice AS DECIMAL(28,6)) AS y
            FROM lineitem
        ),
        m AS (
            SELECT g,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(x) AS sx, SUM(y) AS sy,
                   SUM(CAST(x * y AS DECIMAL(38,12))) AS sxy,
                   SUM(CAST(x * x AS DECIMAL(38,12))) AS sxx
            FROM pts GROUP BY g
        )
        SELECT g, n,
               round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                     / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                        - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                     6) AS slope,
               round((CAST(sy AS DOUBLE)
                      - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
                        * CAST(sx AS DOUBLE)) / n,
                     6) AS intercept
        FROM m
    """,
)
def q275_regression_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group least-squares fit (price ~ quantity) from EXACT
    decimal moment sums — the distributed-regression recipe: the five
    sufficient statistics (n, Σx, Σy, Σxy, Σx²) are map-combinable
    decimal aggregates (order-independent, unlike the built-in
    ``regr_slope``'s float accumulation, which cannot cross-engine
    hash), and the slope/intercept algebra runs on the final tiny
    per-group row. Inputs are TPC-H decimals, so x·y and x² are exact
    in the widened type. The same pattern extends to r², covariance
    matrices, and one-pass PCA moments at any scale."""
    li = read_table(spark, sf_dir, "lineitem")
    dec, wide = "decimal(28,6)", "decimal(38,12)"
    pts = li.select(
        F.col("l_returnflag").alias("g"),
        F.col("l_quantity").cast(dec).alias("x"),
        F.col("l_extendedprice").cast(dec).alias("y"),
    )
    m = pts.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(wide)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(wide)).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy, sxx = F.col("sxy").cast("double"), F.col("sxx").cast("double")
    slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    return m.select(
        "g",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((sy - slope * sx) / F.col("n"), 6).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# q276 — embedding covariance matrix (one-pass distributed PCA moments)
# ---------------------------------------------------------------------------


@query(
    "q276_embedding_covariance",
    oracle="""
        WITH e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings
        ),
        p AS (
            SELECT a.vec_id, a.dim AS i, b.dim AS j,
                   CAST(CAST(CAST(a.x AS DOUBLE) AS DECIMAL(18,9))
                        * CAST(CAST(b.x AS DOUBLE) AS DECIMAL(18,9))
                        AS DECIMAL(38,18)) AS xij
            FROM e a JOIN e b USING (vec_id)
            WHERE a.dim <= b.dim
        ),
        m AS (
            SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(xij) AS sxy
            FROM p GROUP BY 1, 2
        ),
        mu AS (
            SELECT dim, SUM(CAST(CAST(x AS DOUBLE) AS DECIMAL(28,12))) AS sx
            FROM e GROUP BY 1
        )
        SELECT CAST(m.i AS INT) AS i, CAST(m.j AS INT) AS j,
               round((CAST(m.sxy AS DOUBLE)
                      - CAST(mi.sx AS DOUBLE) * CAST(mj.sx AS DOUBLE) / m.n)
                     / m.n, 6) + 0.0 AS cov
        FROM m
        JOIN mu mi ON m.i = mi.dim
        JOIN mu mj ON m.j = mj.dim
    """,
)
def q276_embedding_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The upper-triangular covariance matrix of the embedding space in
    ONE distributed pass — the moment-sum route to PCA at 100 TB
    (q55's ``pyspark.ml`` PCA is the library form; this is what it
    computes underneath): per-vector dim-pair products are exact
    decimals, the (i, j)-keyed sums are map-combinable, and the
    d(d+1)/2-row result is eigendecomposed driver-side in any numeric
    library. For d=64 the pair relation is 2080 rows per vector and
    the final shuffle carries 2080 keys regardless of corpus size
    (a fused single-aggregate form would need 2080 codegen'd sum
    expressions — the keyed join is the shape that survives wide
    embeddings). Decimal discipline as q265 (float32 exact in
    DECIMAL(18,9); products in the widened type) makes every entry
    hash-stable."""
    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "vec_id", F.posexplode("embedding").alias("pos", "x")
    ).select(
        "vec_id",
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("x").cast("double").cast("decimal(18,9)").alias("x"),
    )
    a = ex.select("vec_id", F.col("dim").alias("i"), F.col("x").alias("xa"))
    b = ex.select("vec_id", F.col("dim").alias("j"), F.col("x").alias("xb"))
    p = (
        a.join(b, "vec_id")
        .filter(F.col("i") <= F.col("j"))
        .select(
            "i", "j", (F.col("xa") * F.col("xb")).cast("decimal(38,18)").alias("xij")
        )
    )
    m = p.groupBy("i", "j").agg(
        F.count(F.lit(1)).cast("long").alias("n"), F.sum("xij").alias("sxy")
    )
    mu = ex.groupBy("dim").agg(
        F.sum(F.col("x").cast("decimal(28,12)")).alias("sx")
    )
    mi = mu.select(F.col("dim").alias("i"), F.col("sx").alias("sxi"))
    mj = mu.select(F.col("dim").alias("j"), F.col("sx").alias("sxj"))
    return (
        m.join(F.broadcast(mi), "i")
        .join(F.broadcast(mj), "j")
        .select(
            "i",
            "j",
            (
                F.round(
                    (
                        F.col("sxy").cast("double")
                        - F.col("sxi").cast("double")
                        * F.col("sxj").cast("double")
                        / F.col("n")
                    )
                    / F.col("n"),
                    6,
                )
                # Zero-sign normalization: DuckDB's round() emits -0.0 for
                # tiny negative covariances while Spark's BigDecimal HALF_UP
                # emits +0.0; IEEE `-0.0 + 0.0 = +0.0` makes both engines
                # byte-identical under the driver's value hash (the oracle
                # applies the same `+ 0.0`).
                + F.lit(0.0)
            ).alias("cov"),
        )
    )


# ---------------------------------------------------------------------------
# q277 — multimodal audio lane: real WAV/PCM16 codec, hash-checked
# ---------------------------------------------------------------------------


@query(
    "q277_multimodal_audio_features",
    oracle="""
        WITH d AS (
            SELECT doc_id, 32 + doc_id % 97 AS n
            FROM documents WHERE doc_id < 200
        ),
        s AS (
            SELECT doc_id, n,
                   ((doc_id * 131 + unnest(range(0, n)) * 7919) % 65536)
                       - 32768 AS v
            FROM d
        )
        SELECT doc_id,
               CAST(44 + 2 * n AS BIGINT) AS n_bytes,
               CAST(n AS BIGINT) AS n_samples,
               CAST(8000 AS BIGINT) AS sample_rate,
               CAST(SUM(abs(v)) AS BIGINT) AS sum_abs,
               CAST(SUM(v * v) AS BIGINT) AS sum_sq
        FROM s GROUP BY doc_id, n
    """,
)
def q277_multimodal_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The AUDIO leg of the multimodal surface, real and hash-checked
    end to end (the WAV sibling of q57's BMP lane): per-document
    RIFF/WAVE PCM16 payloads — genuine file layout, stdlib
    ``wave``-openable — are parsed by the pure-Python decoder inside
    Arrow-batched ``mapInPandas``, extracting sample count, rate, and
    exact integer energy features (Σ|s|, Σs²). Samples are closed-form
    in ``doc_id``, so the DuckDB oracle recomputes every feature
    arithmetically: a parser bug (endianness, header walk, data-chunk
    offset) breaks the value hash. A deployment swaps
    ``decode_wav`` for an MP3/FLAC codec; the plumbing is
    identical."""
    from databricks_etl_spark.operators import multimodal as MM

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return MM.audio_features(MM.generate_wav_payloads(d))


# ---------------------------------------------------------------------------
# q278 — multimodal readiness report (image x audio x text composition)
# ---------------------------------------------------------------------------


@query(
    "q278_multimodal_readiness",
    oracle=r"""
        WITH img AS (
            SELECT doc_id, 4 + doc_id % 13 AS w, 4 + doc_id % 7 AS h
            FROM documents WHERE doc_id < 100
        ),
        aud AS (
            SELECT doc_id, 32 + doc_id % 97 AS n
            FROM documents WHERE doc_id < 100
        ),
        txt AS (
            SELECT doc_id,
                   len(string_split_regex(lower(trim(text)), '\s+'))
                       AS n_tokens
            FROM documents WHERE doc_id < 100
        )
        SELECT img.doc_id,
               CAST(img.w * img.h AS BIGINT) AS n_pixels,
               CAST(aud.n AS BIGINT) AS n_samples,
               CAST(txt.n_tokens AS BIGINT) AS n_tokens,
               (img.w >= 8 AND aud.n >= 64 AND txt.n_tokens >= 5)
                   AS train_ready
        FROM img JOIN aud USING (doc_id) JOIN txt USING (doc_id)
    """,
)
def q278_multimodal_readiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal composition capstone: every document's IMAGE
    (q57's BMP decode), AUDIO (q277's WAV decode), and TEXT (q36's
    tokenizer) features joined into one per-document training-
    readiness row — the join-modalities step every multimodal data
    pipeline ends with. Both codec lanes run for real inside
    mapInPandas; the oracle recomputes everything from the closed
    forms, so the hash proves the three lanes agree doc-by-doc after
    the join. One equi-join chain on doc_id; each modality is scanned
    once."""
    from databricks_etl_spark.operators import multimodal as MM
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    img = MM.decode_features(MM.generate_bmp_payloads(d)).select(
        "doc_id", (F.col("width") * F.col("height")).cast("long").alias("n_pixels"),
        F.col("width").alias("_w"),
    )
    aud = MM.audio_features(MM.generate_wav_payloads(d)).select(
        "doc_id", F.col("n_samples").alias("n_samples")
    )
    txt = d.select(
        "doc_id", F.size(tokens_col("text")).cast("long").alias("n_tokens")
    )
    return (
        img.join(aud, "doc_id")
        .join(txt, "doc_id")
        .select(
            "doc_id",
            "n_pixels",
            "n_samples",
            "n_tokens",
            (
                (F.col("_w") >= 8)
                & (F.col("n_samples") >= 64)
                & (F.col("n_tokens") >= 5)
            ).alias("train_ready"),
        )
    )


# ---------------------------------------------------------------------------
# q279 — streaming sliding-window drain (overlapping-window state)
# ---------------------------------------------------------------------------


@query(
    "q279_streaming_sliding_window",
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
def q279_streaming_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRUE streaming sliding (hopping) windows, drained and
    hash-checked (the overlapping-window sibling of q53's tumbling
    drain — state per key × overlap factor, the state-pressure case a
    windowed stream must survive): each event lands in two 10-minute
    windows hopping every 5. availableNow drain with a
    disorder-covering watermark makes the materialization equal the
    batch assignment, which the DuckDB oracle (q51's double-assignment
    form) hash-checks."""
    from databricks_etl_spark.streaming import windows as W

    return W.run_sliding_stream(spark, sf_dir)


# ---------------------------------------------------------------------------
# q280–q282 — schema-profiling trio (the reference's cross-table
# relationship analysis, pre_analysis.py:299-327, generalized to
# DISCOVERY instead of checking declared edges)
# ---------------------------------------------------------------------------


@query(
    "q280_fk_inference",
    oracle="""
        WITH pairs(child_tbl, child_col, parent_tbl, parent_col) AS (
            VALUES ('orders', 'o_custkey', 'customer', 'c_custkey'),
                   ('customer', 'c_custkey', 'orders', 'o_custkey'),
                   ('lineitem', 'l_partkey', 'part', 'p_partkey'),
                   ('part', 'p_partkey', 'lineitem', 'l_partkey'),
                   ('supplier', 's_nationkey', 'nation', 'n_nationkey'),
                   ('nation', 'n_nationkey', 'supplier', 's_nationkey')
        ),
        d AS (
            SELECT 'orders' AS tbl, 'o_custkey' AS col, o_custkey AS v FROM orders
            UNION SELECT 'customer', 'c_custkey', c_custkey FROM customer
            UNION SELECT 'lineitem', 'l_partkey', l_partkey FROM lineitem
            UNION SELECT 'part', 'p_partkey', p_partkey FROM part
            UNION SELECT 'supplier', 's_nationkey', s_nationkey FROM supplier
            UNION SELECT 'nation', 'n_nationkey', n_nationkey FROM nation
        ),
        sz AS (SELECT tbl, col, COUNT(*) AS n FROM d GROUP BY 1, 2),
        inter AS (
            SELECT p.child_tbl, p.child_col, p.parent_tbl, p.parent_col,
                   COUNT(*) AS shared
            FROM pairs p
            JOIN d a ON a.tbl = p.child_tbl AND a.col = p.child_col
            JOIN d b ON b.tbl = p.parent_tbl AND b.col = p.parent_col
                    AND b.v = a.v
            GROUP BY 1, 2, 3, 4
        )
        SELECT i.child_tbl, i.child_col, i.parent_tbl, i.parent_col,
               CAST(sa.n AS BIGINT) AS n_child_distinct,
               round(CAST(i.shared AS DOUBLE) / sa.n, 6) AS containment,
               (i.shared = sa.n) AS fk_candidate
        FROM inter i
        JOIN sz sa ON sa.tbl = i.child_tbl AND sa.col = i.child_col
    """,
)
def q280_fk_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Foreign-key DISCOVERY by value-set containment — the inference
    generalization of the reference's declared-edge relationship
    checks (``pre_analysis.py:299-327``, our q33/q243): for candidate
    column pairs, containment = |distinct(child) ∩ distinct(parent)| /
    |distinct(child)|; containment 1.0 marks an FK candidate, and the
    reversed direction scores low — how schema-profiling tools propose
    join graphs over undocumented lakes. Each column's distinct set is
    computed once (map-combinable DISTINCT union), intersections are
    equi-joins on values; both directions of three edges are scored so
    the output shows the asymmetry that makes the signal useful."""
    tables = {
        "orders": ("o_custkey",),
        "customer": ("c_custkey",),
        "lineitem": ("l_partkey",),
        "part": ("p_partkey",),
        "supplier": ("s_nationkey",),
        "nation": ("n_nationkey",),
    }
    d = None
    for tbl, cols in tables.items():
        t = read_table(spark, sf_dir, tbl)
        for col in cols:
            part = t.select(
                F.lit(tbl).alias("tbl"),
                F.lit(col).alias("col"),
                F.col(col).alias("v"),
            ).distinct()
            d = part if d is None else d.unionByName(part)
    pairs = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("customer", "c_custkey", "orders", "o_custkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("part", "p_partkey", "lineitem", "l_partkey"),
        ("supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation", "n_nationkey", "supplier", "s_nationkey"),
    ]
    pdf = spark.createDataFrame(
        pairs, "child_tbl string, child_col string, parent_tbl string, parent_col string"
    )
    sz = d.groupBy("tbl", "col").agg(F.count(F.lit(1)).alias("n"))
    a = d.select(
        F.col("tbl").alias("child_tbl"),
        F.col("col").alias("child_col"),
        "v",
    )
    b = d.select(
        F.col("tbl").alias("p_tbl"),
        F.col("col").alias("p_col"),
        F.col("v").alias("pv"),
    )
    inter = (
        F.broadcast(pdf)
        .join(a, ["child_tbl", "child_col"])
        .join(
            b,
            (F.col("pv") == F.col("v"))
            & (F.col("p_tbl") == F.col("parent_tbl"))
            & (F.col("p_col") == F.col("parent_col")),
        )
        .groupBy("child_tbl", "child_col", "parent_tbl", "parent_col")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sz.select(
        F.col("tbl").alias("child_tbl"),
        F.col("col").alias("child_col"),
        F.col("n").alias("n_child_distinct"),
    )
    return inter.join(sa, ["child_tbl", "child_col"]).select(
        "child_tbl",
        "child_col",
        "parent_tbl",
        "parent_col",
        F.col("n_child_distinct").cast("long").alias("n_child_distinct"),
        F.round(
            F.col("shared").cast("double") / F.col("n_child_distinct"), 6
        ).alias("containment"),
        (F.col("shared") == F.col("n_child_distinct")).alias("fk_candidate"),
    )


@query(
    "q281_functional_dependencies",
    oracle="""
        WITH cand(det, dep) AS (
            VALUES ('c_custkey', 'c_name'),
                   ('c_custkey', 'c_nationkey'),
                   ('c_nationkey', 'c_mktsegment'),
                   ('c_mktsegment', 'c_nationkey')
        ),
        s AS (
            SELECT 'c_custkey' AS det, 'c_name' AS dep,
                   COUNT(DISTINCT c_custkey) AS n_det,
                   COUNT(DISTINCT (c_custkey, c_name)) AS n_pair
            FROM customer
            UNION ALL
            SELECT 'c_custkey', 'c_nationkey',
                   COUNT(DISTINCT c_custkey),
                   COUNT(DISTINCT (c_custkey, c_nationkey))
            FROM customer
            UNION ALL
            SELECT 'c_nationkey', 'c_mktsegment',
                   COUNT(DISTINCT c_nationkey),
                   COUNT(DISTINCT (c_nationkey, c_mktsegment))
            FROM customer
            UNION ALL
            SELECT 'c_mktsegment', 'c_nationkey',
                   COUNT(DISTINCT c_mktsegment),
                   COUNT(DISTINCT (c_mktsegment, c_nationkey))
            FROM customer
        )
        SELECT det AS determinant, dep AS dependent,
               CAST(n_det AS BIGINT) AS n_determinant_values,
               CAST(n_pair AS BIGINT) AS n_pairs,
               (n_det = n_pair) AS fd_holds,
               round(CAST(n_det AS DOUBLE) / n_pair, 6) AS fd_strength
        FROM s
    """,
)
def q281_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (A → B holds iff every value of
    A maps to exactly one B, i.e. |distinct(A)| = |distinct(A,B)|) —
    the consistency-analysis sibling of FK inference (q280) and the
    formal version of the reference's flag-consistency checks
    (``pre_analysis.py:374-402``): key→attribute FDs must hold
    (c_custkey→c_name), category↔category generally do not; the
    strength ratio quantifies 'how close'. One conditional-distinct
    aggregation per candidate over a shared scan — at 100 TB the
    distinct counts switch to HLL (q143's lane) with a bracket."""
    c = read_table(spark, sf_dir, "customer")
    cands = [
        ("c_custkey", "c_name"),
        ("c_custkey", "c_nationkey"),
        ("c_nationkey", "c_mktsegment"),
        ("c_mktsegment", "c_nationkey"),
    ]
    out = None
    for det, dep in cands:
        row = c.agg(
            F.lit(det).alias("determinant"),
            F.lit(dep).alias("dependent"),
            F.count_distinct(F.col(det)).cast("long").alias(
                "n_determinant_values"
            ),
            F.count_distinct(F.struct(det, dep)).cast("long").alias("n_pairs"),
        )
        out = row if out is None else out.unionByName(row)
    return out.select(
        "determinant",
        "dependent",
        "n_determinant_values",
        "n_pairs",
        (F.col("n_determinant_values") == F.col("n_pairs")).alias("fd_holds"),
        F.round(
            F.col("n_determinant_values").cast("double") / F.col("n_pairs"), 6
        ).alias("fd_strength"),
    )


@query(
    "q282_header_detail_reconciliation",
    oracle="""
        WITH line_sums AS (
            SELECT l_orderkey,
                   CAST(COUNT(*) AS BIGINT) AS n_lines,
                   SUM(CAST(l_extendedprice AS DECIMAL(28,6))
                       * CAST(1 - l_discount AS DECIMAL(28,6))
                       * CAST(1 + l_tax AS DECIMAL(28,6))) AS computed
            FROM lineitem GROUP BY 1
        )
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders_with_lines,
               CAST(SUM(CASE WHEN abs(CAST(computed AS DOUBLE) - o_totalprice)
                                  <= 0.02 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_reconciled,
               CAST(SUM(CASE WHEN abs(CAST(computed AS DOUBLE) - o_totalprice)
                                  > 0.02 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_discrepant,
               round(CAST(SUM(CASE WHEN abs(CAST(computed AS DOUBLE)
                                            - o_totalprice) <= 0.02
                                   THEN 1 ELSE 0 END) AS DOUBLE)
                     / COUNT(*), 6) AS reconciled_share,
               round(CAST(SUM(CAST(abs(CAST(computed AS DOUBLE)
                                       - o_totalprice) AS DECIMAL(28,6)))
                          AS DOUBLE) / COUNT(*), 2) AS avg_abs_gap
        FROM orders JOIN line_sums ON o_orderkey = l_orderkey
    """,
)
def q282_header_detail_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Header/detail reconciliation — the accounting-grade cross-table
    consistency audit (the quantitative extension of the reference's
    relationship analysis): each order's o_totalprice must equal the
    sum of its lines' extendedprice·(1−discount)·(1+tax) within a
    2-cent tolerance (real TPC-H's generation invariant). Line sums
    accumulate in exact decimals (order-independent); the comparison
    happens once per order. On THIS synthetic testdata the audit
    fires for every order (o_totalprice is generated independently of
    the lines — avg gap ≈ $157k at sf0.01), which is exactly the
    point: the audit detects a generator-level inconsistency a
    billing pipeline would page on, and the hash-checked counts prove
    both engines measure the same violation. One shuffle (orderkey
    rollup) + one equi-join with the header."""
    from databricks_etl_spark.functions.scalars import MONEY

    li = read_table(spark, sf_dir, "lineitem")
    o = read_table(spark, sf_dir, "orders")
    line_sums = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.sum(
            F.col("l_extendedprice").cast(MONEY)
            * (F.lit(1) - F.col("l_discount")).cast(MONEY)
            * (F.lit(1) + F.col("l_tax")).cast(MONEY)
        ).alias("computed"),
    )
    j = o.join(line_sums, o.o_orderkey == line_sums.l_orderkey)
    ok = (
        F.abs(F.col("computed").cast("double") - F.col("o_totalprice"))
        <= 0.02
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_orders_with_lines"),
        F.sum(F.when(ok, 1).otherwise(0)).cast("long").alias("n_reconciled"),
        F.sum(F.when(ok, 0).otherwise(1)).cast("long").alias("n_discrepant"),
        F.round(
            F.sum(F.when(ok, 1).otherwise(0)).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("reconciled_share"),
        F.round(
            F.sum(
                F.abs(
                    F.col("computed").cast("double") - F.col("o_totalprice")
                ).cast(MONEY)
            ).cast("double")
            / F.count(F.lit(1)),
            2,
        ).alias("avg_abs_gap"),
    )
