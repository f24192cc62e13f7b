"""Round-14 unit tests: streaming graph-ANN maintenance (q576)
invariants beyond the oracle-parity suite — hostile slicing and
exactly-once replay, the q385/q390 twin discipline applied to the
graph rung."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest
from pyspark.sql import Window

import databricks_etl_spark.plans.queries_round13 as r13
import databricks_etl_spark.plans.queries_round14 as r14
from databricks_etl_spark.sources.readers import read_table


def _collect_sorted(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.slow
def test_q576_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Drain ≡ q509's one-shot insert under a hostile 13-way slicing
    of the arriving vectors (most epochs land a handful of nodes)."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(
        q["q509_graph_incremental_insert"](spark, smoke_sf_dir)
    )
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(
        q["q576_streaming_graph_insert"](spark, smoke_sf_dir)
    )
    assert drained == batch


@pytest.mark.slow
def test_q576_replay_is_idempotent(spark, smoke_sf_dir, tmp_path):
    """Re-delivering an epoch leaves the drain unchanged: the sink is
    keyed on __epoch with dynamic partition overwrite, so a retried
    micro-batch overwrites its own partition instead of duplicating
    candidate edges (and the drain's re-rank would repair even a
    duplicated candidate set)."""
    emb = read_table(spark, smoke_sf_dir, "embeddings")
    is_ins = (
        F.instr(
            F.lit(r13._Q509_SLICE),
            F.substring(
                F.md5(
                    F.concat(F.lit("gi:"), F.col("vec_id").cast("string"))
                ),
                1,
                1,
            ),
        )
        > 0
    )
    base = emb.filter(~is_ins).localCheckpoint()
    ins = emb.filter(is_ins).localCheckpoint()
    path = str(tmp_path / "candidates")
    shutil.rmtree(path, ignore_errors=True)
    for ep in range(3):
        r14._q576_ingest(base, ins.filter(F.col("vec_id") % 3 == ep), ep, path)
    first = _collect_sorted(r14._q576_drain(spark, path))
    # retry epoch 1 (same payload — the exactly-once contract)
    r14._q576_ingest(base, ins.filter(F.col("vec_id") % 3 == 1), 1, path)
    second = _collect_sorted(r14._q576_drain(spark, path))
    assert first == second
    assert len(first) > 0


def test_q577_topk_shape_and_monotonicity(spark, smoke_sf_dir):
    """Every query returns exactly top-k rows, ranks 1..k, maxsim
    non-increasing in rank (the total-order contract)."""
    from databricks_etl_spark.plans.registry import queries

    rows = queries()["q577_maxsim_late_interaction"](
        spark, smoke_sf_dir
    ).collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r["qid"], []).append(r)
    assert by_q
    for qid, rs in by_q.items():
        rs.sort(key=lambda r: r["rank"])
        assert [r["rank"] for r in rs] == list(range(1, len(rs) + 1))
        assert len(rs) == 10
        sims = [r["maxsim"] for r in rs]
        assert sims == sorted(sims, reverse=True)


def test_q577_maxsim_dominates_fixed_assignment(spark, smoke_sf_dir):
    """The defining MaxSim dominance: Σ_qc max_dc sim(qc, dc) is ≥ the
    sum under ANY fixed chunk assignment — here each query chunk
    scored against the document's FIRST chunk.  (Note the bound that
    does NOT hold: the single best pair sim can exceed MaxSim when
    other query chunks contribute negative maxes — signed feature-hash
    cosines live in [-1, 1].)"""
    from databricks_etl_spark.operators.similarity import cosine
    from databricks_etl_spark.plans.queries_round14 import (
        _q577_relations,
        _q577_scores,
    )

    cemb, qcemb = _q577_relations(spark, smoke_sf_dir)
    wfirst = Window.partitionBy("doc_id").orderBy("chunk_idx")
    first_chunk = (
        cemb.withColumn("__rk", F.row_number().over(wfirst))
        .filter(F.col("__rk") == 1)
        .select("doc_id", "ce")
    )
    fixed = (
        first_chunk.join(F.broadcast(qcemb), F.lit(True))
        .select(
            "qid",
            "doc_id",
            F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        )
        .groupBy("qid", "doc_id")
        .agg(
            F.sum(F.col("sim").cast("decimal(28,6)"))
            .cast("double")
            .alias("fixed_sum")
        )
    )
    sc = _q577_scores(spark, smoke_sf_dir)
    bad = (
        sc.join(fixed, ["qid", "doc_id"])
        .filter(F.col("maxsim") < F.col("fixed_sum") - 1e-9)
        .count()
    )
    assert bad == 0


def test_q578_overlap_bounds(spark, smoke_sf_dir):
    """Overlap is in [0, 10]; top1_agree matches the id columns."""
    from databricks_etl_spark.plans.registry import queries

    rows = queries()["q578_maxsim_vs_pooled_eval"](
        spark, smoke_sf_dir
    ).collect()
    assert rows
    for r in rows:
        assert 0 <= r["overlap_at_10"] <= 10
        assert r["top1_agree"] == (r["maxsim_top1"] == r["pooled_top1"])


def test_q581_rank_conservation_and_positivity(spark, smoke_sf_dir):
    """Every node's final micro-rank ≥ the teleport floor, and the
    total mass never exceeds n·base (integer truncation only loses
    mass, never creates it)."""
    from databricks_etl_spark.plans.queries_round14 import (
        _Q581_BASE,
        _Q581_TELE,
    )
    from databricks_etl_spark.plans.registry import queries

    rows = queries()["q581_pagerank_integer"](spark, smoke_sf_dir).collect()
    assert rows
    for r in rows:
        assert r["r_micro"] >= _Q581_TELE
        assert r["r_micro"] <= len(rows) * _Q581_BASE * 100  # sanity
    ranks = [r["rank_pos"] for r in sorted(rows, key=lambda x: x["rank_pos"])]
    assert ranks == list(range(1, len(rows) + 1))
    micro = [r["r_micro"] for r in sorted(rows, key=lambda x: x["rank_pos"])]
    assert micro == sorted(micro, reverse=True)


@pytest.mark.slow
def test_q583_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Streaming MaxSim drain ≡ q577's batch ranking under a hostile
    13-way slicing of document arrival."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(q["q577_maxsim_late_interaction"](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(
        q["q583_streaming_maxsim_retrieval"](spark, smoke_sf_dir)
    )
    assert drained == batch


@pytest.mark.slow
def test_q585_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Streaming PageRank drain ≡ q581's batch ranking under a hostile
    13-way order-grain slicing (plus landed-state-only rebuild: the
    drain reads edges AND nodes from the sink, never the source)."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(q["q581_pagerank_integer"](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(q["q585_streaming_pagerank"](spark, smoke_sf_dir))
    assert drained == batch


def test_q584_delta_consistency(spark, smoke_sf_dir):
    """The movers card is self-consistent: delta = after - before,
    |delta| non-increasing in rank, ranks 1..k."""
    from databricks_etl_spark.plans.registry import queries

    rows = sorted(
        queries()["q584_pagerank_edge_delta"](spark, smoke_sf_dir).collect(),
        key=lambda r: r["rank_pos"],
    )
    assert rows
    assert [r["rank_pos"] for r in rows] == list(range(1, len(rows) + 1))
    deltas = [abs(r["delta_micro"]) for r in rows]
    assert deltas == sorted(deltas, reverse=True)
    for r in rows:
        assert r["delta_micro"] == r["r_after"] - r["r_before"]


def test_q587_runs_are_maximal_and_disjoint(spark, smoke_sf_dir):
    """Backfill ranges are non-overlapping, non-adjacent (else they'd
    be one run), and every claimed hour really has no purchase."""
    from databricks_etl_spark.plans.registry import queries

    rows = sorted(
        queries()["q587_backfill_plan"](spark, smoke_sf_dir).collect(),
        key=lambda r: r["start_hour_epoch"],
    )
    assert rows
    prev_end = None
    for r in rows:
        assert r["n_hours"] == r["end_hour_epoch"] - r["start_hour_epoch"] + 1
        if prev_end is not None:
            assert r["start_hour_epoch"] > prev_end + 1  # maximality
        prev_end = r["end_hour_epoch"]
    e = read_table(spark, smoke_sf_dir, "events")
    day = F.datediff(
        F.col("ts").cast("date"), F.lit("1970-01-01").cast("date")
    )
    present = {
        x["h"]
        for x in e.filter(F.col("event_type") == "purchase")
        .select((day.cast("long") * 24 + F.hour("ts").cast("long")).alias("h"))
        .distinct()
        .collect()
    }
    for r in rows:
        for h in range(r["start_hour_epoch"], r["end_hour_epoch"] + 1):
            assert h not in present


def test_q590_concurrency_vs_bruteforce(spark, smoke_sf_dir):
    """The sweep's per-day max equals the brute-force count of
    overlapping sessions evaluated at every state-change second."""
    from databricks_etl_spark.plans.queries_round13 import _Q575_GAP_S
    from databricks_etl_spark.plans.registry import queries

    card = {
        r["day_epoch"]: r["max_concurrency"]
        for r in queries()["q590_concurrency_profile"](
            spark, smoke_sf_dir
        ).collect()
    }
    e = read_table(spark, smoke_sf_dir, "events").select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("ep")
    )
    w = Window.partitionBy("user_id").orderBy("ep", "event_id")
    sess = (
        e.withColumn(
            "new_sess",
            F.when(
                F.lag("ep").over(w).isNull()
                | (F.col("ep") - F.lag("ep").over(w) > _Q575_GAP_S),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "sess_id",
            F.sum("new_sess").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy("user_id", "sess_id")
        .agg(F.min("ep").alias("s"), F.max("ep").alias("t"))
    )
    ivals = [(r["s"], r["t"]) for r in sess.collect()]
    points = sorted({s for s, _ in ivals} | {t + 1 for _, t in ivals})
    brute = {}
    for p in points:
        c = sum(1 for s, t in ivals if s <= p <= t)
        d = p // 86400
        brute[d] = max(brute.get(d, 0), c)
    assert card == brute


@pytest.mark.slow
def test_q594_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Streaming backfill drain ≡ q587's batch plan under a hostile
    13-way slicing (late batches close gaps and split runs — the
    drain must converge to the batch truth regardless)."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(q["q587_backfill_plan"](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(
        q["q594_streaming_backfill_monitor"](spark, smoke_sf_dir)
    )
    assert drained == batch


@pytest.mark.slow
def test_q598_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Streaming safety-stock drain ≡ q582's batch card under a
    hostile 13-way order-grain slicing (day totals must merge across
    epochs before the moment fold)."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(q["q582_safety_stock_reorder"](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(
        q["q598_streaming_safety_stock"](spark, smoke_sf_dir)
    )
    assert drained == batch


def test_q596_cusum_closed_form_equals_recursion(spark, smoke_sf_dir):
    """The windowed closed form S_t = cum_t − min(0, min prefix cum)
    equals the textbook recursion S_t = max(0, S_{t−1} + x_t − μ − k),
    replayed in plain Python over the collected daily grid."""
    from databricks_etl_spark.plans.queries_round14 import _Q596_K_CENTS
    from databricks_etl_spark.plans.registry import queries

    rows = sorted(
        queries()["q596_cusum_change_detection"](
            spark, smoke_sf_dir
        ).collect(),
        key=lambda r: r["day_epoch"],
    )
    assert rows
    n = len(rows)
    mu = sum(r["day_cents"] for r in rows) // n
    s = 0
    for r in rows:
        s = max(0, s + r["day_cents"] - mu - _Q596_K_CENTS)
        assert s == r["cusum_cents"], (r["day_epoch"], s, r["cusum_cents"])


def test_q601_additivity_matches_q600(spark, smoke_sf_dir):
    """Theil additivity: Σ(within contributions) + Σ(between terms)
    equals q600's total Theil T up to the documented 9dp per-term
    rounding (each side rounds at a different term grain)."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    total = q["q600_theil_index"](spark, smoke_sf_dir).collect()[0][
        "theil_t"
    ]
    rows = q["q601_theil_decomposition"](spark, smoke_sf_dir).collect()
    decomposed = sum(r["within_contrib"] + r["between_term"] for r in rows)
    assert abs(decomposed - total) < 1e-4, (decomposed, total)


@pytest.mark.slow
def test_q605_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Streaming revenue-bridge drain ≡ q586's batch waterfall under
    a hostile 13-way order-grain slicing (the gross-movement
    denominator re-prices at drain)."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(q["q586_revenue_bridge"](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(
        q["q605_streaming_revenue_bridge"](spark, smoke_sf_dir)
    )
    assert drained == batch


@pytest.mark.slow
def test_q606_hostile_slicing_matches_batch(spark, smoke_sf_dir, monkeypatch):
    """Streaming kNN eval drain ≡ q595's batch card under a hostile
    13-way corpus slicing — the per-epoch top-k candidate state must
    provably contain the global top-k."""
    from databricks_etl_spark.plans.registry import queries

    q = queries()
    batch = _collect_sorted(q["q595_knn_classifier_eval"](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(
        q["q606_streaming_knn_eval"](spark, smoke_sf_dir)
    )
    assert drained == batch
