"""Round-13 lanes: graph-based ANN, executed reclustering, streaming
attribution retractions.

The graph-ANN family (q506–q509) completes the similarity ladder
(brute-force q47 → LSH q48 → IVF q68 → PQ q352 → graph): a
deterministic small-world search with every lane oracled the q68→q116
way — the full-beam variant provably equals exact top-k over the
reachable component (a recursive SQL CTE replays the walk), the greedy
beam's recall is bracket-gated against q47's truth, and inserts extend
a frozen graph (the q384 discipline).

Reference parity: the reference corpus (gbaliarda/databricks-etl,
transform.py/pre_analysis.py) has no vector surface; these extend
SURVEY.md §2.12 exactly as the earlier ANN rungs did.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.operators import graph_ann as GA
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_DOT = (
    "list_sum(list_transform(range(1, len({a}) + 1), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
)


def _dot_sql(a: str, b: str) -> str:
    return _DOT.format(a=a, b=b)


_Q506_M = 8  # graph out-degree


def _edges_cte() -> str:
    """The kNN edge relation both engines agree on: exact top-M cosine
    per node, 6dp round, (sim DESC, dst ASC) tiebreak — q47's total
    order applied to every node as a query.  MATERIALIZED per the
    recursive-CTE inlining gotcha (CLAUDE.md)."""
    return f"""
    v AS MATERIALIZED (
        SELECT vec_id, embedding,
               sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
        FROM embeddings
    ),
    s AS MATERIALIZED (
        SELECT a.vec_id AS src, b.vec_id AS dst,
               round({_dot_sql('a.embedding', 'b.embedding')}
                     / (a.nrm * b.nrm), 6) AS sim
        FROM v a JOIN v b ON a.vec_id <> b.vec_id
    ),
    e AS MATERIALIZED (
        SELECT src, dst, sim,
               CAST(row_number() OVER (
                   PARTITION BY src ORDER BY sim DESC, dst
               ) AS BIGINT) AS rank
        FROM s QUALIFY rank <= {_Q506_M}
    )
    """


# one graph per (session, sf_dir): the build is shared by the four
# lanes; localCheckpoint freezes it so reuse never recomputes the
# all-pairs scoring (and the frozen artifact is exactly what the
# incremental lane's contract requires)
_EDGE_CACHE: dict[tuple[int, str], DataFrame] = {}


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (id(spark), sf_dir)
    if key not in _EDGE_CACHE:
        e = read_table(spark, sf_dir, "embeddings")
        _EDGE_CACHE[key] = GA.build_knn_graph(
            e, _Q506_M
        ).localCheckpoint()
    return _EDGE_CACHE[key]


def _q506_oracle() -> str:
    return f"""
        WITH {_edges_cte()}
        SELECT e.rank,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_reciprocal,
               round(CAST(SUM(CAST(e.sim AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_sim
        FROM e LEFT JOIN e r ON r.src = e.dst AND r.dst = e.src
        GROUP BY e.rank
    """


@query("q506_knn_graph_build_audit", oracle=_q506_oracle())
def q506_knn_graph_build_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BUILD audit of the kNN graph behind the graph-ANN rung: each
    node's out-edges are its exact top-{_Q506_M} cosine neighbors
    (6dp, dst-ascending tiebreak — q47's total order), and the audit
    reports, per rank slot, the edge count, how many edges are
    RECIPROCAL (the reverse edge exists at any rank — the
    navigability measure HNSW's heuristic maximizes), and the exact
    decimal mean similarity.  Falling reciprocity by rank is the
    expected signature of a healthy kNN graph; a rank slot whose
    count ≠ n_nodes or whose mean_sim drifts flags a broken build.

    Scale shape: the exact build is the truth construction (blocked
    broadcast passes, like q47's baseline); production builds swap in
    IVF-cell candidates (operators.graph_ann.build_knn_graph's
    ``candidates`` arg) and this audit is unchanged.  The reciprocity
    join is edge-to-edge on (dst, src) — linear in N×M."""
    e = _edges(spark, sf_dir)
    rev = e.select(
        F.col("dst").alias("src"), F.col("src").alias("dst"),
        F.lit(1).alias("__rev"),
    )
    return (
        e.join(rev, ["src", "dst"], "left")
        .groupBy("rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.sum(F.coalesce(F.col("__rev"), F.lit(0)))
            .cast("long")
            .alias("n_reciprocal"),
            F.round(
                F.sum(F.col("sim").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sim"),
        )
    )


_Q507_ENTRY = 0
_Q507_K = 10


def _q507_oracle() -> str:
    return f"""
        WITH RECURSIVE {_edges_cte()},
        reach AS (
            SELECT CAST({_Q507_ENTRY} AS BIGINT) AS node
            UNION
            SELECT e.dst FROM e JOIN reach ON e.src = reach.node
        ),
        q AS (
            SELECT vec_id AS qid, embedding AS qe,
                   sqrt({_dot_sql('embedding', 'embedding')}) AS qn
            FROM embeddings WHERE vec_id < 5
        ),
        c AS (
            SELECT v.vec_id AS nid, v.embedding AS ce, v.nrm AS cn
            FROM v JOIN reach ON v.vec_id = reach.node
        ),
        scored AS (
            SELECT qid, nid,
                   round({_dot_sql('qe', 'ce')} / (qn * cn), 6)
                       AS cosine_sim
            FROM q, c WHERE qid <> nid
        ),
        r AS (
            SELECT qid AS query_id, nid AS neighbor_id, cosine_sim,
                   CAST(row_number() OVER (
                       PARTITION BY qid
                       ORDER BY cosine_sim DESC, nid
                   ) AS BIGINT) AS rank
            FROM scored
        )
        SELECT query_id, neighbor_id, rank, cosine_sim,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM reach) AS n_reached
        FROM r WHERE rank <= {_Q507_K}
    """


@query("q507_graph_reachable_topk", oracle=_q507_oracle())
def q507_graph_reachable_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FULL-BEAM graph search — the provable-equality lane: with an
    unbounded beam, greedy search visits exactly the entry point's
    reachable component, so its top-k IS exact top-k restricted to
    that component.  The Spark side walks the graph (iterative
    frontier BFS with visited anti-joins — q497's Pregel-superstep
    shape, run to the fixed point) and scores the reachable set
    exactly; the oracle replays the same walk as a recursive CTE over
    the same deterministic edge relation.  ``n_reached`` pins
    connectivity: at this corpus one node is unreachable from entry
    {_Q507_ENTRY}, and the search provably returns the true top-k
    over the other N−1 — the audit a graph index ships with.

    This is the TRUTH construction (like q47's brute force); the
    production query path is q508's bounded beam."""
    emb = read_table(spark, sf_dir, "embeddings")
    edges = _edges(spark, sf_dir)
    reach = GA.reachable_set(edges, _Q507_ENTRY)
    scored = GA.score_against_queries(
        reach, emb, emb.filter(F.col("vec_id") < 5)
    )
    n_reached = reach.agg(
        F.count(F.lit(1)).cast("long").alias("n_reached")
    )
    return GA.topk(scored, _Q507_K).crossJoin(F.broadcast(n_reached))


_Q508_BEAM = 32
_Q508_HOPS = 8


@query(
    "q508_graph_beam_recall_gate",
    oracle="""
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               TRUE AS graph_min_recall_ge_080,
               TRUE AS graph_mean_recall_ge_088
        FROM embeddings WHERE vec_id < 5
    """,
)
def q508_graph_beam_recall_gate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GREEDY BEAM search quality as a hash-checked artifact (the
    q145 bracket discipline): beam={_Q508_BEAM}, hops={_Q508_HOPS},
    entry 0, explicit (sim DESC, id ASC) tiebreak at every admission.
    Recall@10 against the exact q47 truth is computed in-Spark and
    emitted as tolerance brackets the oracle states as constants —
    measured min 0.9 / mean ≥0.94 at sf0.001, sf0.01 AND sf0.1, so
    the gates (min ≥ 0.80, mean ≥ 0.88) hold with margin; any
    regression in the walk (a tiebreak change, a beam-admission bug)
    flips a boolean and the driver hash catches it.

    Scale shape: per-hop state is ≤ |queries|×beam×m rows (broadcast
    side); the edge relation is joined by key.  The beam walk does
    ZERO corpus scans after the entry scoring — the whole point of a
    graph index at 100 TB."""
    emb = read_table(spark, sf_dir, "embeddings")
    edges = _edges(spark, sf_dir)
    q = emb.filter(F.col("vec_id") < 5)
    approx = GA.beam_search(
        emb, edges, q, _Q507_K, beam=_Q508_BEAM, hops=_Q508_HOPS,
        entry=_Q507_ENTRY,
    )
    from databricks_etl_spark.operators.similarity import cosine_topk

    exact = cosine_topk(emb, q, _Q507_K)
    hits = (
        exact.select("query_id", "neighbor_id")
        .join(
            approx.select("query_id", "neighbor_id"),
            ["query_id", "neighbor_id"],
        )
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    recalls = (
        exact.select("query_id").distinct()
        .join(hits, "query_id", "left")
        .select(
            "query_id",
            (F.coalesce(F.col("n_hit"), F.lit(0)) / F.lit(_Q507_K)).alias(
                "recall"
            ),
        )
    )
    return recalls.agg(
        F.count(F.lit(1)).cast("long").alias("n_queries"),
        (F.min("recall") >= 0.80).alias("graph_min_recall_ge_080"),
        (F.avg("recall") >= 0.88).alias("graph_mean_recall_ge_088"),
    )


_Q509_SLICE = "0123"  # md5 first hex in this set → insert batch (~1/4)


def _q509_oracle() -> str:
    return f"""
        WITH base AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
            FROM embeddings
            WHERE strpos('{_Q509_SLICE}',
                  substr(md5('gi:' || CAST(vec_id AS VARCHAR)), 1, 1)) = 0
        ),
        ins AS MATERIALIZED (
            SELECT vec_id, embedding,
                   sqrt({_dot_sql('embedding', 'embedding')}) AS nrm
            FROM embeddings
            WHERE strpos('{_Q509_SLICE}',
                  substr(md5('gi:' || CAST(vec_id AS VARCHAR)), 1, 1)) > 0
        ),
        scored AS (
            SELECT i.vec_id AS src, b.vec_id AS dst,
                   round({_dot_sql('i.embedding', 'b.embedding')}
                         / (i.nrm * b.nrm), 6) AS sim
            FROM ins i JOIN base b ON i.vec_id <> b.vec_id
        ),
        new_edges AS (
            SELECT src, dst, sim,
                   CAST(row_number() OVER (
                       PARTITION BY src ORDER BY sim DESC, dst
                   ) AS BIGINT) AS rank
            FROM scored QUALIFY rank <= {_Q506_M}
        )
        SELECT rank,
               CAST(COUNT(*) AS BIGINT) AS n_edges,
               round(CAST(SUM(CAST(sim AS DECIMAL(28,6))) AS DOUBLE)
                     / COUNT(*), 6) AS mean_sim,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n_base_nodes,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM ins) AS n_inserted
        FROM new_edges GROUP BY rank
    """


@query("q509_graph_incremental_insert", oracle=_q509_oracle())
def q509_graph_incremental_insert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL insert into a frozen kNN graph (the q384
    frozen-artifact discipline applied to the graph rung): the base
    graph (vectors outside a deterministic md5 quarter-slice) is
    built once and never touched; each arriving vector searches the
    BASE corpus for its top-{_Q506_M} neighbors and links out —
    base nodes' own edge lists stay byte-identical (re-linking them
    is the periodic rebuild q424 prices for IVF cells, not the
    insert path).  The audit reports the inserted edges per rank
    slot with exact decimal mean similarity, plus the frozen/insert
    populations.

    Scale shape: one pass of the base corpus per insert batch with
    the batch broadcast (inserts are small relative to the corpus by
    definition); per-insert top-M is a bounded window."""
    emb = read_table(spark, sf_dir, "embeddings")
    is_ins = (
        F.instr(
            F.lit(_Q509_SLICE),
            F.substring(
                F.md5(F.concat(F.lit("gi:"), F.col("vec_id").cast("string"))),
                1,
                1,
            ),
        )
        > 0
    )
    base = emb.filter(~is_ins)
    ins = emb.filter(is_ins)
    # score (insert, base) pairs: base streams, insert batch broadcasts
    scored = GA._scored_pairs(base, ins, id_col="vec_id",
                              vec_col="embedding").select(
        F.col("dst").alias("src"),  # insert node
        F.col("src").alias("dst"),  # frozen base neighbor
        "sim",
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    new_edges = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _Q506_M)
    )
    counts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_base_nodes")
    ).crossJoin(
        ins.agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
    )
    return (
        new_edges.groupBy("rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.round(
                F.sum(F.col("sim").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sim"),
        )
        .select(F.col("rank").cast("long").alias("rank"), "n_edges",
                "mean_sim")
        .crossJoin(F.broadcast(counts))
    )
