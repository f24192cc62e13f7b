"""Property-based checks (SURVEY.md §5.2-4) over seeded random
row-sets: profile metrics bounded in [0,100]; set-operation algebra
(union/subtract/intersect identities); dedup idempotence.

Deterministic seeds (no flaky generation); three seeds per property.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from databricks_etl_spark.operators import relational as R
from databricks_etl_spark.operators.profile import completeness, integrity, uniqueness

SEEDS = [0, 1, 2]


def _random_df(spark, seed: int, n: int = 200):
    rng = np.random.default_rng(seed)
    rows = [
        (
            int(rng.integers(0, 50)),
            float(rng.normal()) if rng.random() > 0.2 else None,
            str(rng.integers(0, 5)),
        )
        for _ in range(n)
    ]
    return spark.createDataFrame(rows, "k long, v double, c string")


@pytest.mark.parametrize("seed", SEEDS)
def test_profile_metrics_bounded(spark, seed):
    df = _random_df(spark, seed)
    for metric_df, col in [
        (completeness(df), "pct_complete"),
        (uniqueness(df), "pct_unique"),
        (integrity(df, {"k": F.col("k") >= 0, "v": F.col("v") < 100}), "pct_valid"),
    ]:
        for r in metric_df.collect():
            assert 0.0 <= r[col] <= 100.0


@pytest.mark.parametrize("seed", SEEDS)
def test_set_algebra(spark, seed):
    a = _random_df(spark, seed).select("k").distinct()
    b = _random_df(spark, seed + 100).select("k").distinct()
    union = R.union_distinct(a, b)
    inter = R.intersect_rows(a, b)
    a_minus_b = R.subtract_rows(a, b)
    # |A∪B| = |A| + |B| - |A∩B|
    assert union.count() == a.count() + b.count() - inter.count()
    # A = (A∖B) ∪ (A∩B), disjointly
    assert a_minus_b.count() + inter.count() == a.count()
    assert R.intersect_rows(a_minus_b, b).count() == 0
    # subtract is EXCEPT DISTINCT: (A∖B)∖B = A∖B
    assert sorted(map(tuple, R.subtract_rows(a_minus_b, b).collect())) == sorted(
        map(tuple, a_minus_b.collect())
    )


@pytest.mark.parametrize("seed", SEEDS)
def test_dedup_idempotent_and_minimal(spark, seed):
    df = _random_df(spark, seed)
    once = R.dedup_keep_first(df, ["k"], [F.col("c"), F.col("v").asc_nulls_last()])
    twice = R.dedup_keep_first(once, ["k"], [F.col("c"), F.col("v").asc_nulls_last()])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))
    assert once.count() == df.select("k").distinct().count()


def test_shingles_matches_python_reference(spark):
    """The array-native shingle operator must emit exactly the n-grams
    a straightforward Python sliding window produces, for assorted
    token counts around the n boundary (0, 1, n-1, n, n+1, many) and
    for n in {2, 3, 4} — locks the round-3 window→transform rewrite."""
    from databricks_etl_spark.operators.text import shingles

    texts = [
        (0, ""),
        (1, "one"),
        (2, "one two"),
        (3, "one two three"),
        (4, "alpha beta gamma delta"),
        (5, "a b c d e f g h"),
        (6, "  Mixed   CASE  spacing\ttabs  here  "),
    ]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    import re

    for n in (2, 3, 4):
        got = sorted(
            (r["doc_id"], r["shingle"]) for r in shingles(df, n).collect()
        )
        want = []
        for doc_id, text in texts:
            toks = re.split(r"\s+", text.strip().lower())
            want += [
                (doc_id, " ".join(toks[i : i + n]))
                for i in range(len(toks) - n + 1)
            ]
        assert got == sorted(want), f"n={n}"


@pytest.mark.parametrize("seed", SEEDS)
def test_containment_dominates_jaccard(spark, seed):
    """Algebra of the round-5 containment operator against Jaccard on
    the SAME random corpora: for every pair, max(C(a→b), C(b→a)) ≥
    J(a,b) (containment divides by one set, Jaccard by the union), and
    both lie in (0, 1]. Verified pairwise by joining the two operator
    outputs at threshold 0."""
    from databricks_etl_spark.operators import dedup as DD

    rng = np.random.default_rng(seed)
    vocab = [f"w{i}" for i in range(30)]
    rows = [
        (i, " ".join(rng.choice(vocab, size=int(rng.integers(4, 25)))))
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cont = {
        (r.id_a, r.id_b): (r.cont_ab, r.cont_ba)
        for r in DD.containment_pairs(df, 0.0, ngram=3).collect()
    }
    jac = {
        (r.id_a, r.id_b): r.jaccard
        for r in DD.jaccard_pairs(df, 0.0, ngram=3).collect()
    }
    assert set(cont) == set(jac)  # same candidate pairs from the same index
    assert len(cont) > 0
    for pair, (cab, cba) in cont.items():
        j = jac[pair]
        assert 0.0 < j <= 1.0
        assert 0.0 < cab <= 1.0 and 0.0 < cba <= 1.0
        assert max(cab, cba) >= j - 1e-9, (pair, cab, cba, j)


@pytest.mark.parametrize("seed", SEEDS)
def test_interval_union_matches_bruteforce(spark, seed):
    """interval_union_stats vs a plain-Python sweep over random
    integer intervals (heavy overlap, touching edges, duplicates):
    island counts and union lengths must match exactly per key."""
    from databricks_etl_spark.operators.intervals import interval_union_stats

    rng = np.random.default_rng(seed)
    rows = []
    rid = 0
    for k in range(8):
        for _ in range(int(rng.integers(1, 40))):
            s = int(rng.integers(0, 300))
            rows.append((k, rid, s, s + int(rng.integers(1, 60))))
            rid += 1
    df = spark.createDataFrame(rows, "k long, rid long, s long, e long")
    got = {
        r.k: (r.n_islands, r.covered)
        for r in interval_union_stats(df, "k", "s", "e", "rid").collect()
    }

    expect = {}
    by_k = {}
    for k, _, s, e in rows:
        by_k.setdefault(k, []).append((s, e))
    for k, ivs in by_k.items():
        ivs.sort()
        islands = []
        for s, e in ivs:
            if islands and s <= islands[-1][1]:
                islands[-1][1] = max(islands[-1][1], e)
            else:
                islands.append([s, e])
        expect[k] = (len(islands), sum(e - s for s, e in islands))
    assert got == expect


@pytest.mark.parametrize("seed", SEEDS)
def test_approx_bucket_invariants_random(spark, seed):
    """Random data through assign_approx_buckets: every row is
    assigned exactly one bucket in 1..k, no rows are lost, and
    bucket value-ranges are ordered and disjoint — for any seed."""
    from databricks_etl_spark.operators.quantile_bucket import (
        assign_approx_buckets,
        size_audit,
    )

    rng = np.random.default_rng(seed)
    rows = [(float(x),) for x in rng.normal(size=500)]
    df = spark.createDataFrame(rows, "v double")
    assigned = assign_approx_buckets(df, "v", 7)
    got = assigned.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("v").alias("lo"),
        F.max("v").alias("hi"),
    ).collect()
    assert sum(r.n for r in got) == 500
    assert all(1 <= r.bucket <= 7 for r in got)
    ordered = sorted(got, key=lambda r: r.bucket)
    for prev, cur in zip(ordered, ordered[1:]):
        assert prev.hi <= cur.lo
    audit = size_audit(df, "v", 7).collect()[0]
    assert audit.n_total == 500
    assert audit.buckets_ordered and audit.sizes_within_tol


@pytest.mark.parametrize("seed", SEEDS)
def test_incremental_band_join_equals_full_banding(spark, seed):
    """Property: the incremental join (delta vs corpus index + delta
    self-join) emits EXACTLY the full-corpus banding pairs restricted
    to pairs touching the delta — for random corpora and batches."""
    from databricks_etl_spark.operators import dedup as DD
    from databricks_etl_spark.operators import text as TX
    from databricks_etl_spark.plans.queries_round4 import _band_buckets

    rng = np.random.default_rng(seed)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta"]

    def doc():
        return " ".join(rng.choice(vocab, size=8))

    corpus_rows = [(i, doc()) for i in range(30)]
    batch_rows = [(1000 + i, doc()) for i in range(10)]
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    batch = spark.createDataFrame(batch_rows, "doc_id long, text string")
    both = corpus.unionByName(batch)

    cb = _band_buckets(spark, "", shingle_set=TX.shingles(corpus, 3).distinct())
    bb = _band_buckets(spark, "", shingle_set=TX.shingles(batch, 3).distinct())
    inc = {
        (r.id_a, r.id_b): r.n_shared_bands
        for r in DD.incremental_band_join(bb, cb).collect()
    }

    # full recompute over the union, restricted to pairs touching batch
    ub = _band_buckets(spark, "", shingle_set=TX.shingles(both, 3).distinct())
    a = ub.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
    c = ub.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
    full = (
        a.join(c, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    expected = {
        (r.id_a, r.id_b): r.n for r in full if r.id_b >= 1000
    }
    assert inc == expected


@pytest.mark.parametrize("seed", SEEDS)
def test_exact_substring_guarantee_random(spark, seed):
    """Random-corpus property for the decontamination stride math:
    every planted shared span of length >= L + stride - 1 (= 31) is
    detected at any alignment; docs with no planted span share no
    24-gram with the benchmark (26-letter random text, collision
    probability ~26^-24 per pair — deterministic seeds, no flake)."""
    from databricks_etl_spark.operators.text import exact_substring_hits

    rng = np.random.default_rng(seed)
    alpha = np.array(list("abcdefghijklmnopqrstuvwxyz"))

    def rand_text(n):
        return "".join(rng.choice(alpha, size=n))

    span = rand_text(int(rng.integers(31, 60)))
    bench_rows = [(1000, rand_text(30) + span + rand_text(30))]
    corpus_rows, planted = [], set()
    for i in range(20):
        base = rand_text(int(rng.integers(40, 200)))
        if rng.random() < 0.5:
            pos = int(rng.integers(0, len(base)))
            corpus_rows.append((i, base[:pos] + span + base[pos:]))
            planted.add(i)
        else:
            corpus_rows.append((i, base))
    corpus = spark.createDataFrame(corpus_rows, "doc_id long, text string")
    bench = spark.createDataFrame(bench_rows, "bench_id long, text string")
    got = {
        r.doc_id
        for r in exact_substring_hits(corpus, bench, length=24, stride=8).collect()
    }
    assert got == planted, (got, planted)


@pytest.mark.parametrize("seed", SEEDS)
def test_semdedup_dominance_properties(spark, seed):
    """Random-vector properties of the dominated-member prune: exactly
    one output row per vector; every pruned member has a same-cell
    dominator with rounded cosine >= tau; the top-priority member of
    each cell is never pruned (verified against a numpy recompute)."""
    from databricks_etl_spark.operators.similarity import semdedup_prune

    rng = np.random.default_rng(seed)
    n, dim, tau = 60, 8, 0.8
    vecs_np = rng.normal(size=(n, dim))
    # plant some near-clones so the prune actually fires
    for j in range(0, n, 7):
        vecs_np[j + 1 if j + 1 < n else 0] = vecs_np[j] * (
            1.0 + 0.001 * rng.random()
        )
    quality_np = np.round(rng.random(n), 3)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in vecs_np[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    quality = spark.createDataFrame(
        [(i, float(quality_np[i])) for i in range(n)],
        "vec_id long, quality_score double",
    )
    cents = spark.createDataFrame(
        [(0, [1.0] + [0.0] * (dim - 1)), (1, [0.0, 1.0] + [0.0] * (dim - 2)),
         (2, [0.0, 0.0, 1.0] + [0.0] * (dim - 3))],
        "cid int, centroid array<double>",
    )
    rows = semdedup_prune(vecs, cents, quality, tau).collect()
    assert len(rows) == n and len({r.vec_id for r in rows}) == n

    cells = {r.vec_id: r.cell_id for r in rows}
    pruned = {r.vec_id for r in rows if r.pruned}
    norms = np.linalg.norm(vecs_np, axis=1)

    def sim(i, j):
        return round(float(vecs_np[i] @ vecs_np[j]) / (norms[i] * norms[j]), 6)

    for i in range(n):
        doms = [
            j for j in range(n)
            if j != i and cells[j] == cells[i] and sim(i, j) >= tau
            and (quality_np[j] > quality_np[i]
                 or (quality_np[j] == quality_np[i] and j < i))
        ]
        assert (i in pruned) == bool(doms), (i, doms)


@pytest.mark.parametrize("seed", SEEDS)
def test_exact_ntile_matches_global_ntile(spark, seed):
    """exact_ntile (two-phase distributed rank) must be BIT-IDENTICAL
    to F.ntile over a global window — for any k, on tie-heavy skewed
    data, ascending or descending, with more partitions than rows or
    more buckets than rows."""
    from pyspark.sql import Window

    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    rng = np.random.default_rng(seed)
    rows = [
        (int(v), int(i))
        for i, v in enumerate(rng.choice([1, 1, 1, 2, 3, 7], size=997))
    ]
    df = spark.createDataFrame(rows, "v int, uid int")
    for k, order in [
        (5, ["v", "uid"]),
        (997, ["v", "uid"]),
        (4, [F.desc("v"), F.col("uid")]),
    ]:
        got = exact_ntile(df, order, k, n_parts=16, out_col="b").select(
            "v", "uid", "b"
        )
        worder = [F.col(c) if isinstance(c, str) else c for c in order]
        want = df.select(
            "v", "uid", F.ntile(k).over(Window.orderBy(*worder)).alias("b")
        )
        assert (
            got.exceptAll(want).count() + want.exceptAll(got).count() == 0
        ), (seed, k)
    # more buckets than rows on a tiny frame: ntile(rn) = rn
    tiny = spark.createDataFrame([(i, i) for i in range(3)], "v int, uid int")
    got = {
        r.b
        for r in exact_ntile(tiny, ["v", "uid"], 9, out_col="b").collect()
    }
    assert got == {1, 2, 3}


@pytest.mark.slow
def test_exact_ntile_scale_gate(spark):
    """The kernel at volume: 2M tie-heavy rows (only 7 distinct leading
    values — the worst case for any range partitioner that can't split
    inside tie runs) must bucket exactly like the global-window ntile,
    with per-bucket sizes differing by at most one. This is the planted
    scale gate for the r12 global-ntile retirement."""
    from databricks_etl_spark.operators.quantile_bucket import exact_ntile

    n = 2_000_000
    df = spark.range(n).select(
        (F.col("id") % 7).cast("int").alias("v"), F.col("id").alias("uid")
    )
    got = exact_ntile(df, ["v", "uid"], 10, n_parts=64, out_col="b")
    sizes = {
        r["b"]: r["n"]
        for r in got.groupBy("b").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1
    assert sum(sizes.values()) == n
    # bucket transitions must respect the composite order:
    # max key of bucket i < min key of bucket i+1
    keyed = got.select(
        "b", (F.col("v").cast("long") * n + F.col("uid")).alias("k")
    )
    bounds = keyed.groupBy("b").agg(
        F.min("k").alias("lo"), F.max("k").alias("hi")
    ).collect()
    bounds.sort(key=lambda x: x["b"])
    for a, c in zip(bounds, bounds[1:]):
        assert a["hi"] < c["lo"]


def test_q466_interleave_matches_python_reference(spark):
    """The shared Morton-code generator (used by the z-order, depth and
    recluster lanes) against a bit-twiddling reference, over the full
    corner set and random pairs."""
    import random

    from databricks_etl_spark.plans.queries_round12 import _q466_interleave

    def ref(x, y):
        z = 0
        for i in range(8):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    random.seed(11)
    pairs = [(0, 0), (255, 255), (255, 0), (0, 255), (1, 2)] + [
        (random.randrange(256), random.randrange(256)) for _ in range(50)
    ]
    df = spark.createDataFrame(pairs, "qx long, qy long")
    got = {
        (r["qx"], r["qy"]): r["z"]
        for r in df.select(
            "qx", "qy", F.expr(_q466_interleave("qx", "qy", "DIV")).alias("z")
        ).collect()
    }
    for x, y in pairs:
        assert got[(x, y)] == ref(x, y), (x, y)


# --- round-13 kernels: seeded random properties -------------------------


@pytest.mark.parametrize("seed", SEEDS)
def test_skyline_matches_bruteforce_random(spark, seed):
    """skyline_2d vs the dominance definition on seeded random integer
    point sets (with planted duplicates and tie-heavy coordinates)."""
    from databricks_etl_spark.operators.skyline import skyline_2d

    rng = np.random.default_rng(seed)
    pts = [
        (i, int(rng.integers(0, 12)), int(rng.integers(0, 12)))
        for i in range(150)
    ]
    df = spark.createDataFrame(pts, "rid long, d1 long, d2 long")
    got = sorted(
        (r["rid"], r["d1"], r["d2"])
        for r in skyline_2d(df, "d1", "d2", n_parts=5).collect()
    )
    want = sorted(
        (i, a, b)
        for i, a, b in pts
        if not any(
            (qa >= a and qb >= b and (qa > a or qb > b))
            for _, qa, qb in pts
        )
    )
    assert got == want


@pytest.mark.parametrize("seed", SEEDS)
def test_exact_cumsum_matches_window_random(spark, seed):
    """exact_cumsum vs the SQL running-sum window on seeded random
    integral frames with heavy ties in the leading order column."""
    from pyspark.sql import Window

    from databricks_etl_spark.operators.quantile_bucket import exact_cumsum

    rng = np.random.default_rng(seed)
    rows = [
        (i, int(rng.integers(0, 6)), int(rng.integers(1, 100)))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "rid long, k long, w long")
    got = exact_cumsum(
        df, ["k", "rid"], "w", n_parts=7, out_col="c"
    ).select("rid", F.col("c").cast("long").alias("c"))
    win = Window.orderBy("k", "rid").rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = df.select("rid", F.sum("w").over(win).alias("c"))
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


@pytest.mark.parametrize("seed", SEEDS)
def test_graph_full_beam_recall_is_one_random(spark, seed):
    """On a seeded random vector set, full-beam graph search from any
    reachable entry returns exactly the reachable-restricted top-k
    (the q507 identity, property-tested on non-testdata vectors)."""
    from databricks_etl_spark.operators import graph_ann as GA

    rng = np.random.default_rng(seed)
    vecs = [
        (i, [float(x) for x in rng.normal(size=8)]) for i in range(60)
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
    edges = GA.build_knn_graph(df, 4).localCheckpoint()
    q = df.filter(F.col("vec_id") < 2)
    full = GA.beam_search(df, edges, q, 5, beam=60, hops=32, entry=0)
    reach = GA.reachable_set(edges, 0)
    truth = GA.topk(GA.score_against_queries(reach, df, q), 5)
    assert full.exceptAll(truth).count() == 0
    assert truth.exceptAll(full).count() == 0
