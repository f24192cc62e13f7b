r"""Round-7 queries: exact-substring decontamination (the verbatim-copy
rung under the n-gram contamination lane q152/q227) and SemDeDup-style
embedding-cluster dedup (the semantic rung under the MinHash/embedding
near-dup lanes) — the two remaining production decontamination/dedup
shapes a 100 TB training-data pipeline runs (VERDICT r6 #4/#5).

No reference counterpart: the reference notebooks (pre_analysis.py /
pre_process.py / transform.py) have no text-corpus machinery at all;
these extend the engine's north-star LLM-data surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import similarity as SIM
from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# q283/q284 — exact-substring contamination (gram length 24, corpus
# stride 8: any verbatim overlap of >= 24+8-1 = 31 chars is always hit)
# ---------------------------------------------------------------------------

_XL = 24  # gram length
_XS = 8  # corpus-side stride

# benchmark side: every offset (stride 1); corpus side: every _XS-th.
# list_distinct mirrors the engine's array_distinct (per-doc dedup
# before counting, so n_grams_hit counts DISTINCT corpus grams hit).
_X_BGRAMS = f"""
        bg AS (
            SELECT doc_id AS bench_id,
                   list_distinct(list_transform(range(1, length(text) - {_XL - 2}),
                       i -> substr(text, CAST(i AS INT), {_XL}))) AS gs
            FROM documents WHERE doc_id % 50 = 0 AND length(text) >= {_XL}
        ),
        bgrams AS (SELECT bench_id, unnest(gs) AS gram FROM bg),
        cg AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, length(text) - {_XL - 2}, {_XS}),
                       i -> substr(text, CAST(i AS INT), {_XL}))) AS gs
            FROM documents WHERE doc_id % 50 != 0 AND length(text) >= {_XL}
        ),
        cgrams AS (SELECT doc_id, unnest(gs) AS gram FROM cg)"""


@query(
    "q283_exact_contamination_pairs",
    oracle=f"""
        WITH {_X_BGRAMS}
        SELECT doc_id, bench_id, CAST(COUNT(*) AS BIGINT) AS n_grams_hit
        FROM cgrams JOIN bgrams USING (gram)
        GROUP BY 1, 2
    """,
)
def q283_exact_contamination_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring benchmark contamination, pair-level: every
    (training doc, benchmark doc) pair sharing a verified verbatim
    24-char gram, with the count of corpus grams hit — the
    reference-free twin of a suffix-array decontamination scan. The
    n-gram lane (q152) catches token-level overlap; this catches
    byte-exact copies (any shared span >= 31 chars is guaranteed hit by
    the stride math, see ``operators/text.exact_substring_hits``).

    Plan: corpus grams carry xxhash64 only; the benchmark (id, hash)
    set and its texts broadcast; candidates are verified by substring
    containment, which deletes hash collisions — so the hash join is
    an optimization, never a semantics change, and the oracle's plain
    gram-equality join states the same relation."""
    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = d.filter(F.col("doc_id") % 50 != 0).select("doc_id", "text")
    return TX.exact_substring_hits(corpus, bench, length=_XL, stride=_XS)


@query(
    "q284_scorecard_exact_contamination",
    oracle=f"""
        WITH {_X_BGRAMS},
        hitdocs AS (
            SELECT DISTINCT cgrams.doc_id FROM cgrams JOIN bgrams USING (gram)
        ),
        corpus_docs AS (
            SELECT doc_id, source FROM documents WHERE doc_id % 50 != 0
        )
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(h.doc_id) AS BIGINT) AS n_exact_contaminated,
               round(CAST(COUNT(h.doc_id) AS DOUBLE) / COUNT(*), 6)
                   AS exact_contamination_rate
        FROM corpus_docs c LEFT JOIN hitdocs h USING (doc_id)
        GROUP BY source
    """,
)
def q284_scorecard_exact_contamination(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """The exact-substring audit composed into the per-source
    scorecard (q246's drill-down shape): for each ingestion feed, how
    many of its training docs contain a verbatim benchmark span. A
    feed scraping the eval set verbatim shows a nonzero rate here even
    when paraphrase-level contamination (q246's 4-gram rate) is noisy.
    Docs too short to carry a 24-char gram stay in the denominator —
    they are clean by definition, not excluded."""
    d = read_table(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), "text"
    )
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    pairs = TX.exact_substring_hits(
        corpus.select("doc_id", "text"), bench, length=_XL, stride=_XS
    )
    flag = pairs.select("doc_id").distinct().withColumn("__x", F.lit(1))
    n = F.count(F.lit(1))
    return (
        corpus.select("doc_id", "source")
        .join(flag, "doc_id", "left")
        .groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.count("__x").cast("long").alias("n_exact_contaminated"),
            F.round(F.count("__x").cast("double") / n, 6).alias(
                "exact_contamination_rate"
            ),
        )
    )


# ---------------------------------------------------------------------------
# q285/q286 — SemDeDup-style embedding-cluster dedup
# ---------------------------------------------------------------------------

# 8 fixed orthogonal "comb" centroids in 64-dim: centroid j is 1.0 at
# every coordinate i with i % 8 == j. Deterministic, shared verbatim by
# engine and oracle (q214's literal-centers pattern lifted to 64-dim).
_Q285_K = 8
_Q285_DIM = 64
_Q285_CENTS: list[list[float]] = [
    [1.0 if i % _Q285_K == j else 0.0 for i in range(_Q285_DIM)]
    for j in range(_Q285_K)
]
_Q285_T = 0.35  # dedup threshold — same τ as the q193 exact rung

_Q285_D2 = (
    "list_sum(list_transform(range(1, len(embedding) + 1), "
    "i -> (CAST(embedding[i] AS DOUBLE) - c[i])"
    " * (CAST(embedding[i] AS DOUBLE) - c[i])))"
)
_Q285_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _quality_sql() -> str:
    """q258's composite quality-score expression (verbatim — the
    survivor-priority the SemDeDup prune reuses), as a CTE body."""
    from databricks_etl_spark.plans.queries_text import _STOP_ALL
    from databricks_etl_spark.plans.queries_text import _TOKS as _TTOKS

    return f"""
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
        )"""


def _q285_oracle() -> str:
    vals = ", ".join(f"({j}, {c})" for j, c in enumerate(_Q285_CENTS))
    dot = _Q285_DOT
    sim = (
        f"round({dot.format(a='a.embedding', b='b.embedding')}"
        f" / (sqrt({dot.format(a='a.embedding', b='a.embedding')})"
        f" * sqrt({dot.format(a='b.embedding', b='b.embedding')})), 6)"
    )
    return f"""
        WITH cents(cid, c) AS (VALUES {vals}),
        asg AS (
            SELECT vec_id, embedding, cid,
                   row_number() OVER (
                       PARTITION BY vec_id ORDER BY {_Q285_D2}, cid
                   ) AS rn
            FROM embeddings, cents
        ),
        cells AS (
            SELECT vec_id, embedding, CAST(cid AS INT) AS cell_id
            FROM asg WHERE rn = 1
        ),
        {_quality_sql()},
        lab AS (
            SELECT cells.vec_id, cells.embedding, cells.cell_id,
                   q.quality_score
            FROM cells JOIN q ON cells.vec_id = q.doc_id
        ),
        dom AS (
            SELECT DISTINCT a.vec_id
            FROM lab a JOIN lab b
              ON a.cell_id = b.cell_id AND a.vec_id <> b.vec_id
            WHERE {sim} >= {_Q285_T}
              AND (b.quality_score > a.quality_score
                   OR (b.quality_score = a.quality_score
                       AND b.vec_id < a.vec_id))
        )
        SELECT l.vec_id, l.cell_id,
               (dom.vec_id IS NOT NULL) AS pruned,
               l.quality_score
        FROM lab l LEFT JOIN dom ON l.vec_id = dom.vec_id
    """


@query("q285_semdedup_fixed_centroids", oracle=None)  # oracle set below
def q285_semdedup_fixed_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup with FIXED literal centroids — the hash-checkable twin
    of the seeded-KMeans production run (q286), the same way q214
    twins the KMeans assignment step. Vectors are cell-assigned by
    squared-euclidean argmin against 8 broadcast comb centroids; a
    member is pruned iff a strictly higher-priority near-duplicate
    (cosine ≥ 0.35; priority = quality DESC, vec_id ASC — q258's
    survivor rule, quality joined from the documents table on
    vec_id = doc_id) exists IN ITS CELL. All folds are the sequential
    zip_with/aggregate shape, bit-identical to the DuckDB list_sum
    oracle; output is one row per vector."""
    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    quality = TX.quality_features(d).select(
        F.col("doc_id").alias("vec_id"), "quality_score"
    )
    cents = spark.createDataFrame(
        list(enumerate(_Q285_CENTS)), "cid int, centroid array<double>"
    )
    return SIM.semdedup_prune(e, cents, quality, _Q285_T)


from dataclasses import replace as _replace  # noqa: E402

from databricks_etl_spark.plans.registry import QUERIES as _Q  # noqa: E402

_Q["q285_semdedup_fixed_centroids"] = _replace(
    _Q["q285_semdedup_fixed_centroids"], oracle=_q285_oracle()
)


@query("q286_semdedup_ivf", oracle=None)
def q286_semdedup_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production SemDeDup run: centroids come from the seeded
    KMeans coarse quantizer (k=8, seed=42 — the same quantizer the IVF
    ANN path q49 fits), then the identical dominated-member prune as
    q285. KMeans cell boundaries are partitioning-sensitive, so this
    registers rows-only; q285 is the oracled twin proving the prune
    body, and the summary invariants (every vector emitted exactly
    once, pruned ⊆ near-dup-in-cell) are unit-tested."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    d = read_table(spark, sf_dir, "documents")
    e = read_table(spark, sf_dir, "embeddings")
    quality = TX.quality_features(d).select(
        F.col("doc_id").alias("vec_id"), "quality_score"
    )
    fv = e.select("vec_id", "embedding", array_to_vector(F.col("embedding")).alias("__fv"))
    km = KMeans(k=_Q285_K, seed=42, featuresCol="__fv", predictionCol="__cell")
    model = km.fit(fv)
    cents = spark.createDataFrame(
        [(i, [float(x) for x in ctr]) for i, ctr in enumerate(model.clusterCenters())],
        "cid int, centroid array<double>",
    )
    return SIM.semdedup_prune(e, cents, quality, _Q285_T)
