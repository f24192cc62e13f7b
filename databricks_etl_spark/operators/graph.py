"""Distributed connected components over a pair/edge relation — the
clustering step of a dedup pipeline (near-dup PAIRS from
:mod:`~databricks_etl_spark.operators.dedup` become duplicate
CLUSTERS, so "keep one survivor per cluster" is well-defined even when
similarity is not transitive: a~b, b~c, a̸~c must still land in one
group).

Reference scope: the reference engine has no graph operator; this is
part of the LLM-training-data extension surface (SURVEY.md §2.12 —
dedup needs cluster formation, not just pair emission).

Algorithm: iterative min-label propagation with pointer-jumping
compression, expressed entirely in DataFrame ops (no RDDs, no GraphX
dependency):

- each node starts labelled with itself;
- every round, a node takes the min of its label and its neighbours'
  labels (one join + one map-combinable min-aggregate on the edge
  key);
- a pointer-jumping step then replaces each label by ITS label
  (labels joined to themselves), halving chain depth — together the
  rounds needed are O(log diameter), not O(diameter), the same
  doubling idea as the large-star/small-star MapReduce algorithm
  (Kiveris et al., "Connected Components in MapReduce and Beyond",
  SoCC'14);
- convergence is a driver-side 1-row aggregate (count of changed
  labels) per round — the standard Pregel-style iterate-until-fixed-
  point driver loop; the per-round data stays distributed.

Scale notes: every round's join shuffles on node id — at 100 TB the
edge list is hash-partitioned once and the labels reuse that
partitioning; ``localCheckpoint`` truncates the lineage each round so
the plan does not grow with iteration count (without it, round k
replays rounds 1..k-1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "id_a",
    dst: str = "id_b",
    *,
    max_iter: int = 25,
) -> DataFrame:
    """(node ``id`` → ``component``) for every node appearing in
    ``edges``; ``component`` is the MINIMUM node id reachable from the
    node — fully deterministic, no seed, no tie to break.

    Raises ``RuntimeError`` if the fixed point is not reached within
    ``max_iter`` rounds (pointer jumping makes that ~log2 of the
    largest component's diameter — 25 covers any realistic dup graph).
    """
    sym = (
        edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
        .union(edges.select(F.col(dst).alias("u"), F.col(src).alias("v")))
        .distinct()
    )
    labels = (
        sym.select(F.col("u").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint(eager=True)
    )
    sym = sym.localCheckpoint(eager=True)

    for _ in range(max_iter):
        # min over self + neighbours' current labels
        nbr = (
            sym.join(labels, sym.v == labels.id)
            .groupBy(F.col("u").alias("id"))
            .agg(F.min("component").alias("nbr_min"))
        )
        stepped = (
            labels.join(nbr, "id", "left")
            .select(
                "id",
                F.least(
                    "component", F.coalesce("nbr_min", "component")
                ).alias("component"),
            )
        )
        # pointer jumping: label <- label's label (path halving)
        parents = stepped.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        jumped = (
            stepped.join(parents, stepped.component == parents.p_id, "left")
            .select(
                "id",
                F.coalesce("p_comp", "component").alias("component"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            labels.select("id", F.col("component").alias("old"))
            .join(jumped, "id")
            .filter(F.col("old") != F.col("component"))
            .count()
        )
        labels = jumped
        if changed == 0:
            return labels
    raise RuntimeError(f"connected_components: no fixed point in {max_iter} rounds")


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 10,
    damping: float = 0.85,
) -> DataFrame:
    """Distributed PageRank by power iteration over an edge relation —
    pure DataFrame ops (no RDDs/GraphX): each round every node sends
    rank/out_degree along its out-edges (one join keyed on ``src``),
    contributions are map-side-combinable SUMs on ``dst``, and dangling
    nodes' mass is redistributed uniformly via a 1-row broadcast scalar
    (so total rank is conserved each round — asserted in tests).

    Returns (node, rank) for every node appearing as src or dst.
    Deterministic up to float addition order (seedless but sums are
    order-dependent) → registered rows-only; the invariants
    (conservation, positivity, hub-dominance on a planted graph) live
    in tests/test_graph.py.

    Scale: identical shuffle profile to one groupBy per iteration, all
    keyed on node id — at 100 TB pre-partition edges by ``src`` once
    and every round reuses it; ``localCheckpoint`` each round keeps the
    plan from growing with iteration count (same lineage rule as
    :func:`connected_components`).
    """
    # materialize the loop-invariant relations ONCE: edges may be an
    # expensive upstream plan (near-dup pair generation), and nodes /
    # out_deg would otherwise be recomputed from it every iteration
    edges = edges.select(src, dst).localCheckpoint(eager=True)
    nodes = (
        edges.select(F.col(src).alias("node"))
        .union(edges.select(F.col(dst).alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_nodes = nodes.count()
    if n_nodes == 0:
        # empty graph: no nodes, no ranks — not a ZeroDivisionError
        # from the uniform 1/n initialization
        return nodes.withColumn("rank", F.lit(0.0))
    out_deg = (
        edges.groupBy(src)
        .agg(F.count(F.lit(1)).alias("out_deg"))
        .localCheckpoint(eager=True)
    )
    ranks = nodes.withColumn("rank", F.lit(1.0 / n_nodes))
    for _ in range(iterations):
        # dangling mass as a 1-row aggregate folded in via broadcast
        # cross join — no per-iteration driver collect blocking the loop
        dangling = (
            ranks.join(out_deg, ranks["node"] == out_deg[src], "left_anti")
            .agg(F.coalesce(F.sum("rank"), F.lit(0.0)).alias("dm"))
        )
        contrib = (
            edges.join(ranks, edges[src] == ranks["node"])
            .join(out_deg, src)
            .select(F.col(dst).alias("node"), (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("node")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "node",
                (
                    F.lit((1.0 - damping) / n_nodes)
                    + F.lit(damping) * F.col("dm") / F.lit(float(n_nodes))
                    + F.lit(damping) * F.coalesce("in_sum", F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    return ranks
