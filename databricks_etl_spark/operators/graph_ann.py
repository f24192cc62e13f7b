"""Graph-based ANN: deterministic small-world search over a kNN graph.

The fourth rung of the similarity ladder (brute-force q47 → LSH q48 →
IVF q68 → PQ q352 → **graph**): production vector stacks (HNSW,
DiskANN, NSG) answer queries by greedy walks over a fixed-degree
neighbor graph instead of scanning cells.  This module implements the
same contract with every source of nondeterminism removed so the
results are hash-checkable across engines:

- **Build**: each node's out-edges are its exact top-``m`` cosine
  neighbors (ties broken by neighbor id ascending on the 6dp-rounded
  similarity — the q47 total order).  The default builder scores
  blocked all-pairs (one broadcast-bounded block of the corpus per
  pass — the exact-truth construction, quadratic like every exact kNN
  build); at scale the caller passes a ``candidates`` relation from a
  subquadratic generator (IVF cell co-membership, LSH band buckets —
  the q68/q387 rungs) and the graph contract is unchanged.
- **Full-beam search** (= BFS reachability + exact scoring of the
  reachable set): provably equal to exact top-k restricted to the
  entry point's reachable component — the oracle-side truth a
  recursive SQL CTE can replay.
- **Greedy beam search**: bounded beam, bounded hops, explicit
  (similarity DESC, id ASC) tiebreak at every admission — the
  production query path whose recall the gate lane brackets.

Reference parity: the reference corpus (gbaliarda/databricks-etl,
notebooks transform.py / pre_analysis.py) has no vector search at all —
this extends SURVEY.md §2.12's similarity mandate the same way the
LSH/IVF/PQ rungs did.

Scale shape: the edge relation is ``N×m`` rows (linear in corpus).
Query-side state (beam, visited, frontier) is bounded by
``|queries| × beam × m × hops`` — broadcast-sized at any corpus scale;
the per-hop joins touch the edge relation by key only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from databricks_etl_spark.operators.similarity import dot, norm


def _scored_pairs(
    corpus: DataFrame,
    block: DataFrame,
    *,
    id_col: str,
    vec_col: str,
) -> DataFrame:
    """Score every (corpus row, block row) pair: 6dp cosine.

    The block side is broadcast (callers keep it size-bounded); the
    corpus side streams — one pass per block, never an unbounded
    cartesian."""
    c = corpus.select(
        F.col(id_col).alias("src"),
        F.col(vec_col).alias("__cv"),
        norm(F.col(vec_col)).alias("__cn"),
    )
    b = block.select(
        F.col(id_col).alias("dst"),
        F.col(vec_col).alias("__bv"),
        norm(F.col(vec_col)).alias("__bn"),
    )
    return (
        c.crossJoin(F.broadcast(b))
        .filter(F.col("src") != F.col("dst"))
        .select(
            "src",
            "dst",
            F.round(
                dot(F.col("__cv"), F.col("__bv"))
                / (F.col("__cn") * F.col("__bn")),
                6,
            ).alias("sim"),
        )
    )


def build_knn_graph(
    corpus: DataFrame,
    m: int = 8,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    candidates: DataFrame | None = None,
) -> DataFrame:
    """Fixed-degree neighbor lists: (src, dst, sim, rank), rank ≤ m.

    Default is the exact build (blocked all-pairs — the truth
    construction, like q47's brute force).  Pass ``candidates`` (a
    (src, dst) relation from IVF cells / LSH bands) for the
    subquadratic scale path; edges are then the top-m *within the
    candidate set*, same schema, same tiebreak."""
    if candidates is not None:
        c = corpus.select(
            F.col(id_col).alias("src"),
            F.col(vec_col).alias("__sv"),
            norm(F.col(vec_col)).alias("__sn"),
        )
        d = corpus.select(
            F.col(id_col).alias("dst"),
            F.col(vec_col).alias("__dv"),
            norm(F.col(vec_col)).alias("__dn"),
        )
        scored = (
            candidates.filter(F.col("src") != F.col("dst"))
            .join(c, "src")
            .join(d, "dst")
            .select(
                "src",
                "dst",
                F.round(
                    dot(F.col("__sv"), F.col("__dv"))
                    / (F.col("__sn") * F.col("__dn")),
                    6,
                ).alias("sim"),
            )
        )
    else:
        scored = _scored_pairs(
            corpus, corpus, id_col=id_col, vec_col=vec_col
        )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= m)
        .select("src", "dst", "sim", F.col("rank").cast("long").alias("rank"))
    )


def reachable_set(
    edges: DataFrame,
    entry: int,
    *,
    max_hops: int = 64,
) -> DataFrame:
    """All nodes reachable from ``entry`` over directed edges — the
    full-beam frontier (one column ``node``), computed as iterative
    frontier BFS with a visited anti-join per hop (the q497 Pregel
    superstep shape).  Runs to the fixed point (empty frontier) or
    ``max_hops``, whichever first; each hop localCheckpoints the
    visited set so lineage stays flat.

    This is the audit/truth construction: at 100 TB the reachable set
    is the whole component, so callers use :func:`beam_search` for
    serving and this for oracle parity + connectivity audits."""
    spark = edges.sparkSession
    visited = spark.createDataFrame([(entry,)], "node long").localCheckpoint()
    frontier = visited
    for _ in range(max_hops):
        nxt = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", "src")), "src"
            )
            .select(F.col("dst").alias("node"))
            .distinct()
            .join(F.broadcast(visited), "node", "left_anti")
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt).localCheckpoint()
        frontier = nxt
    return visited


def score_against_queries(
    nodes: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact 6dp cosine of every (query, node) pair, node ids taken
    from ``nodes.node`` — (query_id, neighbor_id, cosine_sim), self
    pairs excluded.  Queries broadcast; nodes filter the corpus by
    semi-join (never materializing vectors driver-side)."""
    c = (
        corpus.join(
            nodes.withColumnRenamed("node", id_col), id_col, "left_semi"
        )
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            norm(F.col(vec_col)).alias("__cn"),
        )
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        norm(F.col(vec_col)).alias("__qn"),
    )
    return (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cosine_sim"),
        )
    )


def topk(scored: DataFrame, k: int) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine_sim) — the q47 total order
    applied to any scored pair relation."""
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            F.col("rank").cast("long").alias("rank"),
            "cosine_sim",
        )
    )


def beam_search(
    corpus: DataFrame,
    edges: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    beam: int = 16,
    hops: int = 6,
    entry: int = 0,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Greedy beam search over the kNN graph — the production query
    path: start every query at ``entry``, each hop expands the beam
    members not yet expanded, scores the newly reached nodes exactly,
    and re-admits the global top-``beam`` per query with the explicit
    (sim DESC, id ASC) tiebreak.  Fixed ``hops`` iterations (a beam
    that stops improving simply stops producing new admissions), then
    exact top-k over everything visited.

    Deterministic end to end: the only order used anywhere is the 6dp
    similarity with id tiebreak.  State per query is ≤ beam×m×hops
    rows — broadcast-sized regardless of corpus size."""
    qids = queries.select(F.col(id_col).alias("query_id"))
    # visited/scored state: (query_id, neighbor_id, cosine_sim).
    # Self pairs STAY in the walk state (a query that is also the
    # entry must still walk); they are filtered at the final top-k.
    ent = corpus.sparkSession.createDataFrame([(entry,)], "node long")
    visited = (
        corpus.join(
            ent.withColumnRenamed("node", id_col), id_col, "left_semi"
        )
        .select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("__cv"),
            norm(F.col(vec_col)).alias("__cn"),
        )
        .crossJoin(
            F.broadcast(
                queries.select(
                    F.col(id_col).alias("query_id"),
                    F.col(vec_col).alias("__qv"),
                    norm(F.col(vec_col)).alias("__qn"),
                )
            )
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(
                dot(F.col("__qv"), F.col("__cv"))
                / (F.col("__qn") * F.col("__cn")),
                6,
            ).alias("cosine_sim"),
        )
        .localCheckpoint()
    )
    # nothing expanded yet — hop 1 expands the entry itself
    expanded = qids.select(
        "query_id", F.lit(None).cast("long").alias("node")
    ).filter(F.lit(False)).localCheckpoint()
    for _ in range(hops):
        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine_sim"), F.asc("neighbor_id")
        )
        beam_now = (
            visited.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= beam)
            .select("query_id", F.col("neighbor_id").alias("node"))
        )
        frontier = beam_now.join(
            expanded, ["query_id", "node"], "left_anti"
        ).localCheckpoint()
        if frontier.isEmpty():
            break
        expanded = expanded.unionByName(frontier).localCheckpoint()
        cand = (
            edges.join(
                F.broadcast(frontier.withColumnRenamed("node", "src")),
                "src",
            )
            .select("query_id", F.col("dst").alias("node"))
            .distinct()
            .join(
                visited.select(
                    "query_id", F.col("neighbor_id").alias("node")
                ),
                ["query_id", "node"],
                "left_anti",
            )
        )
        # score the new arrivals per query: bounded candidate set →
        # broadcast against the corpus vectors they name
        newly = (
            cand.join(
                corpus.select(
                    F.col(id_col).alias("node"),
                    F.col(vec_col).alias("__cv"),
                    norm(F.col(vec_col)).alias("__cn"),
                ),
                "node",
            )
            .join(
                F.broadcast(
                    queries.select(
                        F.col(id_col).alias("query_id"),
                        F.col(vec_col).alias("__qv"),
                        norm(F.col(vec_col)).alias("__qn"),
                    )
                ),
                "query_id",
            )
            .select(
                "query_id",
                F.col("node").alias("neighbor_id"),
                F.round(
                    dot(F.col("__qv"), F.col("__cv"))
                    / (F.col("__qn") * F.col("__cn")),
                    6,
                ).alias("cosine_sim"),
            )
        )
        visited = visited.unionByName(newly).localCheckpoint()
    return topk(
        visited.filter(F.col("neighbor_id") != F.col("query_id")), k
    )
