"""Invariant and equivalence tests for the round-4b query wave —
properties the oracle-parity hash can't express: one-sided Bloom
error, sweep-line equivalence to a brute-force replay, weighted-
average bounds, probability normalization, and planted survivorship
arithmetic."""

from __future__ import annotations

import pandas as pd

from databricks_etl_spark.plans.queries_round4b import (
    q185_triangle_census,
    q186_bloom_membership_gate,
    q187_max_concurrent_intervals,
    q189_changelog_compaction,
    q191_event_transition_matrix,
    q192_decile_lift,
    q195_snapshot_diff,
    q197_ewma_revenue,
    q198_quantile_normalization,
    q202_weighted_sample_ht,
)
from databricks_etl_spark.sources.readers import read_table


def test_triangle_census_vs_bruteforce(spark, duck, sf_dir):
    """q185's joined triangle count must equal a driver-side brute
    force over the (small at sf0.01) candidate edge list."""
    from databricks_etl_spark.plans.queries_round4 import (
        q173_band_collision_candidates,
    )

    edges = (
        q173_band_collision_candidates(spark, sf_dir)
        .select("id_a", "id_b")
        .toPandas()
    )
    adj: dict[int, set[int]] = {}
    for a, b in edges.itertuples(index=False):
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    tri = 0
    for a, b in edges.itertuples(index=False):
        tri += len(adj[a] & adj[b] & {x for x in adj[a] if x > b})
    wedges = sum(len(v) * (len(v) - 1) // 2 for v in adj.values())
    row = q185_triangle_census(spark, sf_dir).collect()[0]
    assert row.n_edges == len(edges)
    assert row.n_triangles == tri
    assert row.n_wedges == wedges
    if row.global_clustering is not None:
        assert 0.0 <= row.global_clustering <= 1.0


def test_bloom_one_sided_error(spark, sf_dir, smoke_sf_dir):
    """Bloom filters never false-negative: every true member must hit,
    at both tested scale factors."""
    for d in (smoke_sf_dir, sf_dir):
        row = q186_bloom_membership_gate(spark, d).collect()[0]
        assert row.n_false_negatives == 0
        assert row.n_bloom_hits == row.n_members + row.n_false_positives
        assert row.n_members <= row.n_bloom_hits <= row.n_probes


def test_max_concurrency_vs_bruteforce_sweep(spark, smoke_sf_dir):
    """q187's windowed sweep must match an explicit pandas replay of
    the same +1/-1 point process."""
    e = read_table(spark, smoke_sf_dir, "events").select("event_type", "ts").toPandas()
    expected = {}
    for etype, g in e.groupby("event_type"):
        pts = pd.concat(
            [
                pd.DataFrame({"t": g.ts, "d": 1}),
                pd.DataFrame({"t": g.ts + pd.Timedelta(minutes=5), "d": -1}),
            ]
        )
        net = pts.groupby("t")["d"].sum().sort_index()
        run = net.cumsum()
        peak = int(run.max())
        expected[etype] = (peak, run[run == peak].index.min())
    got = {
        r.event_type: (r.peak_concurrency, pd.Timestamp(r.peak_at))
        for r in q187_max_concurrent_intervals(spark, smoke_sf_dir).collect()
    }
    assert got == expected


def test_changelog_compaction_survivorship(spark, smoke_sf_dir):
    """Planted arithmetic: tombstones delete exactly the keys
    divisible by 7; survivors' last op is I for single-version keys,
    U otherwise; version counts are 1 + key % 3."""
    o = read_table(spark, smoke_sf_dir, "orders").select("o_orderkey").toPandas()
    keys = set(o.o_orderkey)
    out = q189_changelog_compaction(spark, smoke_sf_dir).toPandas()
    assert set(out.o_orderkey) == {k for k in keys if k % 7 != 0}
    for r in out.itertuples(index=False):
        assert r.n_versions == 1 + r.o_orderkey % 3
        assert r.last_op == ("I" if r.o_orderkey % 3 == 0 else "U")


def test_transition_matrix_rows_normalize(spark, sf_dir):
    out = q191_event_transition_matrix(spark, sf_dir).toPandas()
    sums = out.groupby("prev_type")["p_next"].sum()
    # each row of the matrix is a probability distribution (6-dp rounding)
    assert ((sums - 1.0).abs() < 1e-4).all()
    assert (out.n_transitions > 0).all()


def test_decile_lift_partitions_population(spark, sf_dir):
    c = read_table(spark, sf_dir, "customer")
    out = q192_decile_lift(spark, sf_dir).toPandas()
    assert len(out) == 10
    assert out.n_customers.sum() == c.count()
    assert out.n_customers.max() - out.n_customers.min() <= 1  # ntile balance
    # population-weighted mean lift is 1 by construction
    w = (out.lift * out.n_customers).sum() / out.n_customers.sum()
    assert abs(w - 1.0) < 1e-3


def test_snapshot_diff_accounts_for_every_key(spark, smoke_sf_dir):
    o = read_table(spark, smoke_sf_dir, "orders").select("o_orderkey").toPandas()
    keys = o.o_orderkey
    out = q195_snapshot_diff(spark, smoke_sf_dir).toPandas().set_index("diff_status")
    n_old = (keys % 10 != 3).sum()
    n_new = (keys % 10 != 7).sum()
    n_both = ((keys % 10 != 3) & (keys % 10 != 7)).sum()
    assert out.loc["added", "n_rows"] == n_new - n_both
    assert out.loc["removed", "n_rows"] == n_old - n_both
    assert out.n_rows.sum() == n_old + n_new - n_both
    # changed rows decompose into the two planted mutations
    assert (
        out.loc["changed", "n_price_changed"] + out.loc["changed", "n_status_changed"]
        >= out.loc["changed", "n_rows"]
    )


def test_ewma_warmup_and_bounds(spark, sf_dir):
    out = q197_ewma_revenue(spark, sf_dir).toPandas()
    assert out.ewma.notna().all()
    # a weighted average of daily revenues can never leave the range
    # of the contributing values; spot-check per series the global
    # bound min(daily) <= ewma <= max(daily)
    for _, g in out.groupby("priority"):
        assert (g.ewma >= g.daily_rev.min() - 1e-6).all()
        assert (g.ewma <= g.daily_rev.max() + 1e-6).all()
        first = g.sort_values("day").iloc[0]
        assert abs(first.ewma - round(first.daily_rev, 6)) < 1e-6  # warm-up day 1


def test_quantile_normalization_is_uniform(spark, sf_dir):
    out = q198_quantile_normalization(spark, sf_dir).toPandas()
    for _, g in out.groupby("c_mktsegment"):
        assert g.qnorm.min() == 0.0
        assert g.qnorm.max() == 1.0
        # strictly monotone in rank → all values distinct
        assert g.qnorm.is_unique


def test_weighted_sample_ht_accuracy(spark, sf_dir):
    out = q202_weighted_sample_ht(spark, sf_dir).toPandas()
    assert (out.n_sampled > 0).all()
    assert (out.n_sampled < out.n_total).all()
    # Horvitz-Thompson over ~20k rows per flag: within 10%
    assert (out.ht_rel_err.abs() < 0.10).all()


def test_pagerank_fixed_point_vs_python_replay(spark, smoke_sf_dir):
    """q213's integer fixed-point update replayed exactly in pure
    Python over the same candidate edges must reproduce every rank
    bit-for-bit (integer arithmetic has one right answer — this is
    what makes the iterative algorithm oracle-checkable at all)."""
    from databricks_etl_spark.plans.queries_round4 import (
        q173_band_collision_candidates,
    )
    from databricks_etl_spark.plans.queries_round4b import (
        _PR_ITERS,
        _PR_SCALE,
        _PR_TELEPORT,
        q213_pagerank_fixed_point,
    )

    pairs = (
        q173_band_collision_candidates(spark, smoke_sf_dir)
        .select("id_a", "id_b")
        .toPandas()
    )
    edges = []
    for a, b in pairs.itertuples(index=False):
        edges += [(a, b), (b, a)]
    deg: dict[int, int] = {}
    for u, _ in edges:
        deg[u] = deg.get(u, 0) + 1
    rank = {u: _PR_SCALE for u in deg}
    for _ in range(_PR_ITERS):
        contrib: dict[int, int] = {}
        for u, v in edges:
            contrib[v] = contrib.get(v, 0) + rank[u] // deg[u]
        rank = {v: _PR_TELEPORT + (85 * c) // 100 for v, c in contrib.items()}
    got = {
        r.doc_id: r.rank_fp
        for r in q213_pagerank_fixed_point(spark, smoke_sf_dir).collect()
    }
    assert got == rank
    assert all(v >= _PR_TELEPORT for v in got.values())
