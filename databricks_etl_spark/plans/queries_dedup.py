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


_PAIRS_05 = f"""
        d AS (SELECT doc_id, list_distinct({_TOKS}) AS toks FROM documents),
        i0 AS (SELECT doc_id, unnest(toks) AS item FROM d),
        keep AS (SELECT item FROM i0 GROUP BY item HAVING COUNT(*) <= 100),
        i AS (SELECT i0.doc_id, i0.item FROM i0 JOIN keep USING (item)),
        sz AS (SELECT doc_id, COUNT(*) AS set_size FROM i GROUP BY 1),
        sh AS (
            SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared
            FROM i a JOIN i b USING (item)
            WHERE a.doc_id < b.doc_id GROUP BY 1, 2
        ),
        pr AS (
            SELECT id_a, id_b FROM (
                SELECT id_a, id_b,
                       CAST(shared AS DOUBLE)
                           / (sa.set_size + sb.set_size - shared) AS j
                FROM sh
                JOIN sz sa ON sh.id_a = sa.doc_id
                JOIN sz sb ON sh.id_b = sb.doc_id
            ) WHERE j >= 0.5
        ),
        e AS (SELECT id_a AS a, id_b AS b FROM pr
              UNION SELECT id_b, id_a FROM pr),
        walk AS (
            SELECT a AS id, a AS label FROM e
            UNION
            SELECT e.b AS id, w.label FROM e JOIN walk w ON e.a = w.id
        ),
        cc AS (SELECT id, MIN(label) AS component FROM walk GROUP BY id)
"""


def _neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    from databricks_etl_spark.operators.graph import connected_components

    d = read_table(spark, sf_dir, "documents")
    pairs = DD.jaccard_pairs(d, 0.5, ngram=1, max_df=100)
    return connected_components(pairs, "id_a", "id_b")


@query(
    "q123_dup_clusters",
    oracle=f"""
        WITH RECURSIVE {_PAIRS_05}
        SELECT id AS doc_id, component FROM cc
    """,
)
def q123_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: unigram-Jaccard pairs (≥0.5, df-capped —
    same index as q43) closed under connectivity by distributed
    min-label propagation with pointer jumping
    (:func:`~databricks_etl_spark.operators.graph.connected_components`).
    Component = min reachable doc_id — deterministic, seedless, and
    exactly reproduced by the oracle's recursive-CTE closure, making
    the ITERATIVE operator hash-checkable, not just rows-only. This is
    the step that turns pair emission into "keep one survivor per
    duplicate group" even when similarity is not transitive."""
    return _neardup_components(spark, sf_dir).select(
        F.col("id").alias("doc_id"), "component"
    )


@query(
    "q124_cluster_survivors",
    oracle=f"""
        WITH RECURSIVE {_PAIRS_05}
        SELECT doc_id,
               CASE WHEN cc.id IS NOT NULL THEN TRUE ELSE FALSE END
                   AS was_clustered
        FROM documents LEFT JOIN cc ON documents.doc_id = cc.id
        WHERE cc.id IS NULL OR cc.id = cc.component
    """,
)
def q124_cluster_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup APPLICATION of q123: the corpus with every non-
    canonical cluster member removed (survivor = the cluster's min
    doc_id; untouched docs pass through, flagged FALSE). One anti-ish
    left join against the component labels — the final step of the
    near-dup pipeline a training-data run would ship."""
    comps = _neardup_components(spark, sf_dir)
    d = read_table(spark, sf_dir, "documents").select("doc_id")
    return (
        d.join(comps, d.doc_id == comps.id, "left")
        .filter(F.col("id").isNull() | (F.col("id") == F.col("component")))
        .select(
            "doc_id", F.col("id").isNotNull().alias("was_clustered")
        )
    )


def _simhash_md5_sql() -> str:
    """Generate the q163 oracle: 16 nibble extractions, 64 bit-vote
    sums, and two 32-bit signature assemblies — the same expression
    tree the Spark side builds, rendered as ANSI SQL."""
    nibbles = ", ".join(
        f"instr('0123456789abcdef', substr(h, {k}, 1)) - 1 AS n{k}"
        for k in range(1, 17)
    )
    votes = ", ".join(
        f"SUM(CASE WHEN ((n{k} >> {b}) & 1) = 1 THEN 1 ELSE -1 END) AS v_{k}_{b}"
        for k in range(1, 17)
        for b in range(4)
    )

    def assemble(chars: range) -> str:
        terms = []
        for idx, k in enumerate(chars):
            for b in range(4):
                shift = 4 * (7 - idx) + b
                terms.append(
                    f"CASE WHEN v_{k}_{b} > 0 THEN (CAST(1 AS BIGINT) << {shift}) "
                    f"ELSE 0 END"
                )
        return " + ".join(terms)

    return f"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS tok
            FROM documents
        ),
        h AS (SELECT doc_id, md5(tok) AS h FROM tok),
        n AS (SELECT doc_id, {nibbles} FROM h),
        v AS (SELECT doc_id, {votes} FROM n GROUP BY doc_id)
        SELECT doc_id,
               CAST({assemble(range(1, 9))} AS BIGINT) AS sig_hi,
               CAST({assemble(range(9, 17))} AS BIGINT) AS sig_lo
        FROM v
    """


@query("q163_simhash_md5_oracled", oracle=_simhash_md5_sql(), bench=True)
def q163_simhash_md5_oracled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash with an ENGINE-INDEPENDENT hash family, hash-checked
    bit-for-bit: the same frequency-weighted bit-vote construction as
    q46, but votes come from md5 (identical hex in Spark and DuckDB)
    instead of the engine-seeded xxhash64 — so the dedup ladder's
    signature semantics are driver-PROVEN, not just locally asserted.
    The 64-bit signature is emitted as two 32-bit halves (sig_hi from
    md5 chars 1–8, sig_lo from 9–16; both positive — no sign-bit
    ambiguity across engines). Same plan shape as q46: 64 map-side-
    combinable vote sums, one shuffle on doc_id, signature assembled
    from vote signs with literal shifts. q46 stays the fast path at
    scale (one xxhash64 vs 16 nibble extractions per token); this
    query is its cross-engine proof."""
    from databricks_etl_spark.operators.text import tokens_col

    # r16: the 16-nibble / 64-vote / 2-assembly tree is compiled from
    # SQL STRINGS (selectExpr / one F.expr per aggregate) instead of
    # ~600 py4j Column constructions — the lane's bench wall was
    # dominated by Python-side DataFrame BUILD time, not execution
    # (profiled; OPTIMIZATION_r16.md). Shapes and fold order are
    # byte-identical to the former Column form AND to the oracle
    # generator above.
    d = read_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(tokens_col("text")).alias("tok"))
    h = toks.withColumn("h", F.md5("tok"))
    n = h.selectExpr(
        "doc_id",
        *[
            f"instr('0123456789abcdef', substring(h, {k}, 1)) - 1 AS n{k}"
            for k in range(1, 17)
        ],
    )
    v = n.groupBy("doc_id").agg(
        *[
            F.expr(
                f"SUM(CASE WHEN ((n{k} >> {b}) & 1) = 1"
                f" THEN 1 ELSE -1 END) AS v_{k}_{b}"
            )
            for k in range(1, 17)
            for b in range(4)
        ]
    )

    def assemble(chars: range) -> str:
        terms = ["CAST(0 AS BIGINT)"]
        for idx, k in enumerate(chars):
            for b in range(4):
                shift = 4 * (7 - idx) + b
                terms.append(
                    f"(CASE WHEN v_{k}_{b} > 0 THEN"
                    f" shiftleft(CAST(1 AS BIGINT), {shift})"
                    f" ELSE CAST(0 AS BIGINT) END)"
                )
        return " + ".join(terms)

    return v.selectExpr(
        "doc_id",
        f"CAST({assemble(range(1, 9))} AS BIGINT) AS sig_hi",
        f"CAST({assemble(range(9, 17))} AS BIGINT) AS sig_lo",
    )


@query("q169_pagerank_dupgraph", oracle=None)
def q169_pagerank_dupgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup similarity graph (q44's exact
    3-gram pairs as undirected edges): rank ≈ how central a document
    is in its duplication neighborhood — the centrality-based survivor
    choice (keep the most-connected copy) that complements q123/q124's
    connected-components clustering. Power iteration with dangling-
    mass redistribution (total rank conserved). Float-sum order makes
    exact cross-engine hashing inappropriate → rows-only; conservation
    /positivity/hub invariants in tests/test_graph.py."""
    from databricks_etl_spark.operators.graph import pagerank

    d = read_table(spark, sf_dir, "documents")
    pairs = DD.jaccard_pairs(d, 0.05, ngram=3, max_df=100)
    edges = pairs.select(
        F.col("id_a").alias("src"), F.col("id_b").alias("dst")
    ).union(pairs.select(F.col("id_b").alias("src"), F.col("id_a").alias("dst")))
    pr = pagerank(edges, iterations=10, damping=0.85)
    return pr.select("node", F.round("rank", 6).alias("rank")).orderBy("node")
