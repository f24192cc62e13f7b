"""Connected-components operator: planted-graph structure tests.

The registered queries (q123/q124) hash-check the operator against a
recursive-CTE oracle on the real corpus, but the corpus's dup graph is
a single clique — these tests plant the shapes that actually stress
label propagation: long chains (diameter >> 1, exercises pointer
jumping), multiple components, and disconnected singleton pairs.
"""

from __future__ import annotations

import pytest

from databricks_etl_spark.operators.graph import connected_components


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    rows = connected_components(df, "id_a", "id_b").collect()
    return {r["id"]: r["component"] for r in rows}


def test_chain_collapses_to_min(spark):
    # 0-1-2-...-19: one path, diameter 19 — needs pointer jumping to
    # converge inside the 25-round budget
    got = _cc(spark, [(i, i + 1) for i in range(19)])
    assert got == {i: 0 for i in range(20)}


def test_multiple_components_and_reversed_edges(spark):
    got = _cc(spark, [(5, 3), (3, 9), (20, 21), (40, 30)])
    assert got == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 30: 30, 40: 30}


def test_clique_plus_bridge(spark):
    clique = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    got = _cc(spark, clique + [(3, 10), (10, 11)])
    assert set(got.values()) == {0}
    assert len(got) == 6


def test_max_iter_guard(spark):
    df = spark.createDataFrame([(i, i + 1) for i in range(40)], "id_a long, id_b long")
    with pytest.raises(RuntimeError):
        connected_components(df, "id_a", "id_b", max_iter=1)


def test_pagerank_invariants_on_planted_star(spark):
    """On a star graph (hub ↔ 5 spokes, directed both ways): total
    rank is conserved at 1, all ranks positive, and the hub dominates
    every spoke. On a dangling chain, mass is redistributed, not lost."""
    from pyspark.sql import functions as F

    from databricks_etl_spark.operators.graph import pagerank

    spokes = list(range(1, 6))
    star = [(0, s) for s in spokes] + [(s, 0) for s in spokes]
    edges = spark.createDataFrame(star, "src long, dst long")
    pr = {r["node"]: r["rank"] for r in pagerank(edges, iterations=15).collect()}
    assert abs(sum(pr.values()) - 1.0) < 1e-9
    assert all(v > 0 for v in pr.values())
    assert all(pr[0] > pr[s] for s in spokes)
    # symmetric spokes must tie exactly
    assert len({round(pr[s], 12) for s in spokes}) == 1

    # dangling node: 2 -> nothing; conservation must still hold
    chain = spark.createDataFrame([(0, 1), (1, 2)], "src long, dst long")
    pr2 = {r["node"]: r["rank"] for r in pagerank(chain, iterations=15).collect()}
    assert abs(sum(pr2.values()) - 1.0) < 1e-9
    assert pr2[2] == max(pr2.values())  # sink accumulates


def test_pagerank_uniform_on_cycle(spark):
    """A directed cycle is perfectly symmetric: every node's rank must
    be exactly 1/n at every iteration count."""
    from databricks_etl_spark.operators.graph import pagerank

    n = 6
    cyc = spark.createDataFrame([(i, (i + 1) % n) for i in range(n)], "src long, dst long")
    pr = {r["node"]: r["rank"] for r in pagerank(cyc, iterations=7).collect()}
    assert all(abs(v - 1.0 / n) < 1e-12 for v in pr.values())
