"""Deduplication queries (SURVEY.md §2.12 dedup ladder): exact,
n-gram Jaccard (both oracle-paired), MinHashLSH and SimHash
(seeded hashes → rows-only driver checks, invariants in tests/).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import dedup as DD
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


@query(
    "q42_dedup_exact",
    oracle="""
        SELECT MIN(doc_id) AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_copies
        FROM (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT doc_id + 100000 AS doc_id, text FROM documents
        )
        GROUP BY text
    """,
)
def q42_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact content dedup keeping the smallest id (deterministic
    survivor — vs ``dropDuplicates``'s arbitrary one,
    ``pre_process.py:52-54``). The corpus is unioned with a shifted
    copy of itself to simulate a crawl with duplicates.

    Scale: one hash-shuffle on the content key; at 100 TB dedup on
    md5(text) instead of raw text to bound shuffle width (same
    semantics, collision-negligible)."""
    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    dup = d.union(d.select((F.col("doc_id") + 100000).alias("doc_id"), "text"))
    counts = dup.groupBy("text").agg(F.count(F.lit(1)).alias("n_copies"))
    kept = DD.dedup_exact(dup, ["text"], "doc_id").select("doc_id", "text")
    return kept.join(counts, "text").select("doc_id", "n_copies")


@query(
    "q43_jaccard_unigram_pairs",
    oracle=f"""
        WITH d AS (
            SELECT doc_id, list_distinct({_TOKS}) AS toks
            FROM documents WHERE doc_id < 150
        ),
        i0 AS (SELECT doc_id, unnest(toks) AS item FROM d),
        keep AS (SELECT item FROM i0 GROUP BY item HAVING COUNT(*) <= 100),
        i AS (SELECT i0.doc_id, i0.item FROM i0 JOIN keep USING (item)),
        sz AS (SELECT doc_id, COUNT(*) AS set_size FROM i GROUP BY 1),
        sh AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
            FROM i a JOIN i b USING (item)
            WHERE a.doc_id < b.doc_id
            GROUP BY 1, 2
        )
        SELECT * FROM (
            SELECT id_a, id_b,
                   round(CAST(shared AS DOUBLE)
                         / (sa.set_size + sb.set_size - shared), 6) AS jaccard
            FROM sh
            JOIN sz sa ON sh.id_a = sa.doc_id
            JOIN sz sb ON sh.id_b = sb.doc_id
        ) WHERE jaccard >= 0.6
    """,
)
def q43_jaccard_unigram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact unigram-Jaccard near-dup pairs via inverted-index
    self-join (token → doc postings, join, count shared), with the
    ``max_df=100`` posting-list guard (ubiquitous tokens dropped from
    index AND set sizes — mirrored in the oracle SQL, so the guard
    itself is hash-verified). Bounded to doc_id<150 here; the
    unbounded scale path is LSH candidate generation (q44)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 150)
    return DD.jaccard_pairs(d, 0.6, ngram=1, max_df=100)


@query(
    "q44_jaccard_3gram_pairs",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
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
        )
        SELECT * FROM (
            SELECT id_a, id_b,
                   round(CAST(shared AS DOUBLE)
                         / (sa.set_size + sb.set_size - shared), 6) AS jaccard
            FROM pairs
            JOIN sz sa ON pairs.id_a = sa.doc_id
            JOIN sz sb ON pairs.id_b = sb.doc_id
        ) WHERE jaccard >= 0.05
    """,
)
def q44_jaccard_3gram_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram shingle Jaccard pairs — shingles make near-dup detection
    order-sensitive (unigram sets can't distinguish shuffled text).
    Shingle postings are near-unique → the inverted-index join stays
    linear-ish, and the ``max_df=100`` guard (mirrored in the oracle)
    bounds any pathological ubiquitous shingle; this is the exact
    counterpart the MinHash sketch approximates."""
    d = read_table(spark, sf_dir, "documents")
    return DD.jaccard_pairs(d, 0.05, ngram=3, max_df=100)


@query("q45_minhash_lsh_pairs", oracle=None)
def q45_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH near-dup candidates (``pyspark.ml``): banded hash
    join — the 100 TB dedup path. Seeded hash family → rows-only
    driver check; estimator-quality invariants live in
    tests/test_dedup_similarity.py."""
    d = read_table(spark, sf_dir, "documents")
    return DD.minhash_lsh_pairs(d, threshold=0.5)


@query("q46_simhash_signatures", oracle=None)
def q46_simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash signatures from xxhash64 token bit-votes (pure
    built-ins, no UDF). Rows-only (engine-seeded hash); hamming-
    distance invariants in tests."""
    d = read_table(spark, sf_dir, "documents")
    return DD.simhash64(d)
