"""Round-10 lane tests: the multi-probe IVF sweep's construction
invariants (monotone recall, exact full-probe recall, agreement with
q332's one-point eval and with literal per-probe re-retrieval)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR


@pytest.fixture(scope="module")
def probe_sweep(spark, sf_dir):
    from databricks_etl_spark.plans.queries_round10 import q341_ivf_probe_sweep

    rows = q341_ivf_probe_sweep(spark, sf_dir).collect()
    return sorted(rows, key=lambda r: r.n_probe)


def test_q341_recall_monotone_in_n_probe(probe_sweep):
    """More probes can only add candidates; truth items are never
    evicted (docstring proof), so both metrics are non-decreasing."""
    recalls = [float(r.mean_recall_at_10) for r in probe_sweep]
    top1s = [float(r.top1_recall) for r in probe_sweep]
    assert recalls == sorted(recalls)
    assert top1s == sorted(top1s)


def test_q341_full_probe_exact(probe_sweep):
    """n_probe == K probes every cell: ANN == brute force, recall
    EXACTLY 1.0 (the q116 full-probe-exactness precedent)."""
    full = probe_sweep[-1]
    assert full.n_probe == 8
    assert float(full.mean_recall_at_10) == 1.0
    assert float(full.top1_recall) == 1.0


def test_q341_nprobe1_equals_q332(spark, sf_dir):
    """The sweep's n_probe=1 row IS q332's one-point eval (same index,
    same tiebreaks): metrics must agree exactly."""
    from databricks_etl_spark.plans.queries_round9 import q332_rag_retrieval_eval
    from databricks_etl_spark.plans.queries_round10 import q341_ivf_probe_sweep

    one = (
        q341_ivf_probe_sweep(spark, sf_dir)
        .filter(F.col("n_probe") == 1)
        .collect()[0]
    )
    base = q332_rag_retrieval_eval(spark, sf_dir).collect()[0]
    assert one.n_queries == base.n_queries
    assert one.mean_recall_at_10 == base.mean_recall_at_10
    assert one.top1_recall == base.top1_recall


def test_q341_matches_literal_per_probe_retrieval(spark):
    """The one-pass shortcut (truth hit at probe p ⟺ cell_rank <= p)
    must equal LITERALLY re-running ANN top-k retrieval restricted to
    the p best cells, for every p — the eviction-impossibility proof,
    checked by brute force at smoke scale."""
    from databricks_etl_spark.operators.similarity import cosine
    from databricks_etl_spark.plans.queries_round9 import (
        _Q332_TOPK,
        _q332_relations,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        _Q341_PROBES,
        _q341_cell_rank,
        q341_ivf_probe_sweep,
    )

    cemb, qemb = _q332_relations(spark, SMOKE_SF_DIR)
    sr = cemb.join(F.broadcast(qemb), F.lit(True)).select(
        "qid",
        "doc_id",
        "chunk_idx",
        F.round(cosine(F.col("qe"), F.col("ce")), 6).alias("sim"),
        _q341_cell_rank(F.col("qe"), F.col("cell")).alias("cell_rank"),
    ).localCheckpoint()
    w = Window.partitionBy("qid").orderBy(
        F.desc("sim"), F.asc("doc_id"), F.asc("chunk_idx")
    )
    truth = (
        sr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _Q332_TOPK)
        .select("qid", "rk", "doc_id", "chunk_idx")
    )
    literal = {}
    for p in _Q341_PROBES:
        ann = (
            sr.filter(F.col("cell_rank") <= p)
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _Q332_TOPK)
            .select(
                F.col("qid").alias("aq"),
                F.col("doc_id").alias("ad"),
                F.col("chunk_idx").alias("ac"),
            )
        )
        hit = truth.join(
            ann,
            (F.col("qid") == F.col("aq"))
            & (F.col("doc_id") == F.col("ad"))
            & (F.col("chunk_idx") == F.col("ac")),
            "left",
        )
        agg = hit.groupBy("qid").agg(
            (F.count("ad") / float(_Q332_TOPK)).alias("recall"),
            F.max(
                F.when((F.col("rk") == 1) & F.col("ad").isNotNull(), 1.0)
                .otherwise(0.0)
            ).alias("top1"),
        ).agg(
            F.round(F.avg("recall"), 6).alias("r"),
            F.round(F.avg("top1"), 6).alias("t"),
        ).collect()[0]
        literal[p] = (float(agg.r), float(agg.t))

    sweep = {
        r.n_probe: (float(r.mean_recall_at_10), float(r.top1_recall))
        for r in q341_ivf_probe_sweep(spark, SMOKE_SF_DIR).collect()
    }
    assert sweep == literal


@pytest.fixture(scope="module")
def mixture_audit(spark, sf_dir):
    from databricks_etl_spark.plans.queries_round10 import (
        q342_realized_mixture_audit,
    )

    return q342_realized_mixture_audit(spark, sf_dir).collect()


def test_q342_shares_form_distributions(mixture_audit):
    """Within each epoch the realized shares sum to 1, and the
    temperature targets (constant across epochs) sum to 1 — both up to
    the 6dp rounding of the individual shares."""
    by_epoch = {}
    for r in mixture_audit:
        by_epoch.setdefault(r.epoch, []).append(r)
    assert len(by_epoch) >= 1
    for rows in by_epoch.values():
        n = len(rows)
        assert abs(sum(r.realized_share for r in rows) - 1.0) <= n * 5e-7
        assert abs(sum(r.target_share for r in rows) - 1.0) <= n * 5e-7


def test_q342_deviation_bound_and_max_flag(mixture_audit):
    """deviation == realized - target (6dp), every |deviation| < 1,
    and per epoch EXACTLY one row carries the max-|deviation| flag and
    it attains the epoch maximum."""
    by_epoch = {}
    for r in mixture_audit:
        assert abs(r.deviation - round(r.realized_share - r.target_share, 6)) < 1e-9
        assert abs(r.deviation) < 1.0
        by_epoch.setdefault(r.epoch, []).append(r)
    for rows in by_epoch.values():
        flagged = [r for r in rows if r.is_max_abs_deviation]
        assert len(flagged) == 1
        mx = max(abs(r.deviation) for r in rows)
        assert abs(abs(flagged[0].deviation) - mx) < 1e-9


def test_q342_grid_is_complete(mixture_audit):
    """Zero-slot honesty: every shipped source appears in EVERY epoch
    (absent sources with 0 slots included), so the audit grid is the
    full epochs x sources cross."""
    epochs = {r.epoch for r in mixture_audit}
    sources = {r.source for r in mixture_audit}
    assert len(mixture_audit) == len(epochs) * len(sources)
    zero_rows = [r for r in mixture_audit if r.n_doc_slots == 0]
    for r in zero_rows:  # a zero-slot row still states its target miss
        assert r.deviation == round(-r.target_share, 6)


def _frozen_pack(spark, rows, n_shards, budget=64):
    from databricks_etl_spark.operators.packing import ffd_pack

    df = spark.createDataFrame(rows, "doc_id long, len long").select(
        "doc_id",
        "len",
        F.lit(1).cast("long").alias("eclass"),
        (F.col("doc_id") % n_shards).cast("long").alias("shard"),
    )
    return ffd_pack(df, budget, group_col="eclass", shard_col="shard")


def test_ffd_pack_frozen_shards_untouched_byte_identical(spark):
    """The q343 incremental discipline at operator level: packing
    corpus ∪ delta with FROZEN shard moduli changes placements ONLY in
    the shards a delta doc hashes into — every untouched shard's rows
    are byte-identical to the corpus-only packing."""
    corpus = [(i, 1 + (i * 7) % 40) for i in range(400)]
    n_shards = 25  # frozen from the corpus (400 / 16)
    base = _frozen_pack(spark, corpus, n_shards).collect()

    delta = [(10_000, 33), (10_101, 40), (10_202, 7)]
    touched = {d % n_shards for d, _ in delta}
    assert 0 < len(touched) < n_shards  # sparse delta: real untouched shards
    incr = _frozen_pack(spark, corpus + delta, n_shards).collect()

    def rows_of(placed, pred):
        return sorted(
            tuple(r) for r in placed if pred(r.seq_id // 1_000_000)
        )

    assert rows_of(incr, lambda s: s not in touched) == rows_of(
        base, lambda s: s not in touched
    )
    # and the touched shards did absorb the delta docs
    delta_ids = {d for d, _ in delta}
    placed_delta = [r for r in incr if r.doc_id in delta_ids]
    assert len(placed_delta) == len(delta)
    assert all(r.seq_id // 1_000_000 in touched for r in placed_delta)


def test_q343_placement_invariants(spark):
    """Smoke-scale invariants of the maintained artifact: every doc
    placed exactly once, sequences stay within budget with contiguous
    offsets, delta docs only ever sit in touched shards."""
    from databricks_etl_spark.plans.queries_round9 import _Q326_B
    from databricks_etl_spark.plans.queries_round10 import (
        q343_incremental_order_maintenance,
    )

    rows = q343_incremental_order_maintenance(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert len({r.doc_id for r in rows}) == len(rows)
    by_seq = {}
    for r in rows:
        if r.is_delta_doc:
            assert r.shard_touched
        by_seq.setdefault(r.seq_uid, []).append(r)
    for members in by_seq.values():
        members.sort(key=lambda r: r.seq_offset)
        assert sum(m.n_tokens for m in members) <= _Q326_B
        cursor = 0
        for m in members:
            assert m.seq_offset == cursor
            cursor += m.n_tokens
        # a sequence never mixes touched and untouched provenance
        assert len({m.shard_touched for m in members}) == 1


def test_q344_artifact_restart_atomicity(spark):
    """The materialized-artifact contract: (a) shards are sized
    (<= _Q344_STEPS sequences each) and _SUCCESS counts every row;
    (b) a FAILED job into the same path leaves the published artifact
    byte-identical and no temp litter (two-phase commit); (c) a full
    restart republishes an identical manifest."""
    import glob
    import os

    from databricks_etl_spark.plans.queries_round10 import (
        _Q344_STEPS,
        q344_training_artifact_manifest,
    )
    from databricks_etl_spark.sources.pydatasource import register
    from databricks_etl_spark.sources.writers import scratch_dir

    m1 = sorted(
        map(tuple, q344_training_artifact_manifest(spark, SMOKE_SF_DIR).collect())
    )
    assert m1
    for row in m1:
        assert row[2] <= _Q344_STEPS  # n_seqs per shard file
    out = scratch_dir("train_artifact_", key=SMOKE_SF_DIR)
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == sum(r[3] for r in m1)  # n_doc_slots

    def snapshot():
        return {
            p: os.path.getsize(p)
            for p in glob.glob(os.path.join(out, "part-*.jsonl"))
        }

    before = snapshot()
    register(spark)
    bad = spark.range(4).select(
        F.expr("raise_error('boom')").alias("payload")
    )
    with pytest.raises(Exception, match="boom"):
        bad.write.format("pyjsonl").option("path", out).mode(
            "overwrite"
        ).save()
    assert snapshot() == before  # published artifact untouched

    # zombie temps from the crashed job's killed tasks (landed after
    # abort() ran, so nobody saw them) age past the janitor gate by
    # the time a restart runs — the gate exists precisely so a LIVE
    # concurrent job's young temps are never swept (r10 ADVICE;
    # test_sources_sinks covers the young-temp-survives side)
    import time as _time

    from databricks_etl_spark.sources.pydatasource import JsonLinesWriter

    # zombies land asynchronously after the driver-side raise — wait
    # for the temp set to stabilize before backdating it
    seen: set = set()
    for _ in range(40):
        now_set = set(glob.glob(os.path.join(out, ".part-*.tmp")))
        if now_set and now_set == seen:
            break
        seen = now_set
        _time.sleep(0.25)
    stale = _time.time() - 2 * JsonLinesWriter.JANITOR_MIN_AGE_SEC
    for p in seen:
        os.utime(p, (stale, stale))
    m2 = sorted(
        map(tuple, q344_training_artifact_manifest(spark, SMOKE_SF_DIR).collect())
    )
    assert m2 == m1
    # the restart's successful overwrite-commit swept the aged litter
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))


def test_q346_file_changed_is_exactly_the_touched_set(spark):
    """The incremental-publish contract: a shard's file hash changes
    between pre- and post-delta publishes IFF the delta touched that
    shard — so a publisher re-ships exactly |touched| files. Counts
    reconcile: post - pre == delta docs landed in the shard."""
    from databricks_etl_spark.plans.queries_round10 import (
        q343_incremental_order_maintenance,
        q346_incremental_artifact_publish,
    )

    pub = q346_incremental_artifact_publish(spark, SMOKE_SF_DIR).collect()
    maint = q343_incremental_order_maintenance(spark, SMOKE_SF_DIR).collect()
    touched = {(r.eclass, r.shard) for r in maint if r.shard_touched}
    delta_per_shard = {}
    for r in maint:
        if r.is_delta_doc:
            k = (r.eclass, r.shard)
            delta_per_shard[k] = delta_per_shard.get(k, 0) + 1
    assert pub
    for row in pub:
        k = (row.eclass, row.shard)
        assert row.file_changed == (k in touched)
        assert row.n_docs_post - row.n_docs_pre == delta_per_shard.get(k, 0)
        if not row.file_changed:
            assert row.content_hash_pre == row.content_hash_post


def test_q347_decorrelation_shape(spark):
    """Epoch-pair audit invariants: one row per ordered epoch pair,
    shared count == the later epoch's full sequence census (later
    epochs schedule a subset of earlier epochs' sequences), and the
    correlation is a genuine [-1, 1] value never reaching a repeat
    (1.0) — the degenerate-shuffle alarm the audit exists to raise."""
    from databricks_etl_spark.plans.queries_round9 import q326_dataloader_order
    from databricks_etl_spark.plans.queries_round10 import (
        q347_epoch_shuffle_decorrelation,
    )

    rows = q347_epoch_shuffle_decorrelation(spark, SMOKE_SF_DIR).collect()
    seqs = (
        q326_dataloader_order(spark, SMOKE_SF_DIR)
        .select("epoch", "seq_id")
        .distinct()
        .collect()
    )
    census = {}
    for r in seqs:
        census[r.epoch] = census.get(r.epoch, 0) + 1
    epochs = sorted(census)
    expected_pairs = {
        (a, b) for a in epochs for b in epochs if a < b
    }
    assert {(r.epoch_a, r.epoch_b) for r in rows} == expected_pairs
    for r in rows:
        assert r.n_shared_seqs == census[r.epoch_b]
        assert -1.0 <= r.step_correlation < 1.0


def test_q345_subword_rebasing_reflects_fertility(spark):
    """The re-based plan packs the SAME chunk set as q340 but budgets
    strictly more tokens per chunk (fertility > 1: every word costs at
    least one piece, multi-char words outside the vocab cost more), so
    the subword plan needs at least as many sequences."""
    from databricks_etl_spark.plans.queries_round9 import q340_chunk_packing
    from databricks_etl_spark.plans.queries_round10 import (
        q345_chunk_subword_packing,
    )

    ws = q340_chunk_packing(spark, SMOKE_SF_DIR).collect()
    sw = q345_chunk_subword_packing(spark, SMOKE_SF_DIR).collect()
    key = lambda r: (r.doc_id, r.chunk_idx)  # noqa: E731
    ws_chunks = {key(r): r.n_tokens for r in ws if r.n_tokens >= 1}
    sw_chunks = {key(r): r.n_tokens for r in sw}
    assert set(sw_chunks) == set(ws_chunks)
    assert all(sw_chunks[k] >= ws_chunks[k] for k in ws_chunks)
    assert sum(sw_chunks.values()) > sum(ws_chunks.values())
    assert len({r.seq_id for r in sw}) >= len({r.seq_id for r in ws})


def test_q348_efficiency_invariants(spark):
    """Per-shard packing report reconciles with the placement it
    audits: doc counts match, the lower bound is never beaten, pad
    and fill are exact complements, and the first-fit guarantee
    holds (all bins but at most one end more than half full, so
    n_seqs <= 2 * lb_seqs in every shard)."""
    from databricks_etl_spark.plans.queries_round10 import (
        _corpus_placement,
        q348_packing_efficiency,
    )
    from databricks_etl_spark.plans.queries_round9 import _Q326_B

    rows = q348_packing_efficiency(spark, SMOKE_SF_DIR).collect()
    placed = _corpus_placement(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert sum(r.n_docs for r in rows) == len(placed)
    assert sum(r.n_seqs for r in rows) == len({p.seq_uid for p in placed})
    for r in rows:
        assert r.lb_seqs <= r.n_seqs <= 2 * r.lb_seqs
        assert r.overhead_seqs == r.n_seqs - r.lb_seqs >= 0
        assert r.pad_tokens == r.n_seqs * _Q326_B - r.sum_tokens >= 0
        assert 0.0 < r.fill_frac <= 1.0


def test_q349_segment_histogram_reconciles(spark):
    """The segments-per-sequence histogram is a complete partition of
    the placement: doc and token totals reconcile, boundaries are
    n_seqs * (segments - 1) per row, and every sequence has at least
    one segment."""
    from databricks_etl_spark.plans.queries_round10 import (
        _corpus_placement,
        q349_attention_segment_audit,
    )

    rows = q349_attention_segment_audit(spark, SMOKE_SF_DIR).collect()
    placed = _corpus_placement(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert sum(r.n_seqs * r.n_segments for r in rows) == len(placed)
    assert sum(r.sum_tokens for r in rows) == sum(p.n_tokens for p in placed)
    assert sum(r.n_seqs for r in rows) == len({p.seq_uid for p in placed})
    for r in rows:
        assert r.n_segments >= 1
        assert r.n_boundaries == r.n_seqs * (r.n_segments - 1)


def test_q350_retention_reconciles_with_clusters(spark):
    """The retention report is an exact rollup of q123's clusters
    under the quality-max survivor rule: clustered/survivor totals
    match the component relation (one survivor per component), the
    survivor count equals q124's (policies pick different members,
    never different cluster counts), drops are non-negative and
    token-bounded, and unclustered sources report zeros intact."""
    from databricks_etl_spark.plans.queries_dedup import (
        _neardup_components,
        q124_cluster_survivors,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q350_cluster_retention_report,
    )

    rows = q350_cluster_retention_report(spark, SMOKE_SF_DIR).collect()
    comps = _neardup_components(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert sum(r.n_clustered for r in rows) == len(comps)
    assert sum(r.n_survivors for r in rows) == len(
        {c.component for c in comps}
    )
    q124_surv = (
        q124_cluster_survivors(spark, SMOKE_SF_DIR)
        .filter("was_clustered")
        .count()
    )
    assert sum(r.n_survivors for r in rows) == q124_surv
    for r in rows:
        assert r.n_dropped == r.n_clustered - r.n_survivors >= 0
        assert 0 <= r.tokens_dropped <= r.tokens_total
        if r.n_clustered == 0:
            assert r.n_survivors == r.n_dropped == r.tokens_dropped == 0


def test_q351_ledger_partitions_the_stream(spark):
    """Checkpoint windows are a complete, gap-free partition of
    q326's stream: doc slots and tokens reconcile, steps are dense
    within each window (from/to span == distinct steps), windows
    start exactly at ckpt_id*K+1, tokens_before is the running sum of
    earlier windows, and only an epoch's LAST window may be ragged."""
    from databricks_etl_spark.plans.queries_round9 import (
        q326_dataloader_order,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        _Q351_K,
        q351_checkpoint_resume_accounting,
    )

    rows = q351_checkpoint_resume_accounting(spark, SMOKE_SF_DIR).collect()
    stream = q326_dataloader_order(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert sum(r.n_doc_slots for r in rows) == len(stream)
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    max_step = {}
    for s in stream:
        max_step[s.epoch] = max(max_step.get(s.epoch, 0), s.step)
    for epoch, ws in by_epoch.items():
        ws.sort(key=lambda r: r.ckpt_id)
        run = 0
        for i, r in enumerate(ws):
            assert r.from_step == r.ckpt_id * _Q351_K + 1
            assert r.n_steps == r.to_step - r.from_step + 1
            assert r.tokens_before == run
            run += r.n_tokens
            if i < len(ws) - 1:
                assert r.n_steps == _Q351_K
        assert ws[-1].to_step == max_step[epoch]


def test_q352_rerank_sweep_invariants(spark):
    """Deeper candidate pools only add candidates, so both metrics
    are monotone in depth; the depth=10 point IS q317's single-point
    pq_recall_at_10 (re-ranking a pool of size k cannot change the
    answer set) — the two registered queries must agree exactly."""
    from databricks_etl_spark.plans.queries_round8 import (
        q317_pq_recall_impact,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q352_pq_rerank_sweep,
    )

    rows = sorted(
        q352_pq_rerank_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.depth,
    )
    assert [r.depth for r in rows] == [10, 25, 50, 100, 200]
    recalls = [float(r.mean_recall_at_10) for r in rows]
    top1s = [float(r.top1_recall) for r in rows]
    assert recalls == sorted(recalls)
    assert top1s == sorted(top1s)
    assert all(r.n_queries == rows[0].n_queries for r in rows)
    assert all(0.0 <= v <= 1.0 for v in recalls + top1s)
    q317 = q317_pq_recall_impact(spark, SMOKE_SF_DIR).collect()[0]
    assert abs(recalls[0] - float(q317.pq_recall_at_10)) < 1e-9
    assert abs(top1s[0] - float(q317.pq_top1_recall)) < 1e-9


def test_q353_matrix_reconciles_with_pairs(spark):
    """The flow matrix is a complete partition of the pair relation:
    cell pair counts sum to the pair list, source keys are normalized
    (a <= b), cross_source mirrors the diagonal, and each cell's
    distinct-doc count is bounded by [2, 2 * n_pairs]."""
    from databricks_etl_spark.operators.dedup import jaccard_pairs
    from databricks_etl_spark.plans.queries_round10 import q353_dup_flow_matrix
    from databricks_etl_spark.sources.readers import read_table

    rows = q353_dup_flow_matrix(spark, SMOKE_SF_DIR).collect()
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    n_pairs = jaccard_pairs(d, 0.5, ngram=1, max_df=100).count()
    assert rows
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.source_a <= r.source_b
        assert r.cross_source == (r.source_a != r.source_b)
        assert 2 <= r.n_docs_involved <= 2 * r.n_pairs


def test_q354_quartiles_partition_each_epoch(spark):
    """Quartile rows are a complete partition of q326's stream, the
    epoch mean is the doc-slot-weighted mean of the quartile means,
    and deviations are the signed quartile-minus-epoch gaps (weighted
    deviations sum to ~0 per epoch)."""
    from databricks_etl_spark.plans.queries_round9 import (
        q326_dataloader_order,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q354_curriculum_flatness,
    )

    rows = q354_curriculum_flatness(spark, SMOKE_SF_DIR).collect()
    n_stream = q326_dataloader_order(spark, SMOKE_SF_DIR).count()
    assert rows
    assert sum(r.n_doc_slots for r in rows) == n_stream
    by_epoch: dict[int, list] = {}
    for r in rows:
        by_epoch.setdefault(r.epoch, []).append(r)
    for epoch, qs in by_epoch.items():
        assert sorted(r.quartile for r in qs) == list(range(len(qs)))
        assert len({r.epoch_mean_quality for r in qs}) == 1
        tot = sum(r.n_doc_slots for r in qs)
        wmean = sum(r.mean_quality * r.n_doc_slots for r in qs) / tot
        assert abs(wmean - qs[0].epoch_mean_quality) < 1e-4
        wdev = sum(r.deviation * r.n_doc_slots for r in qs) / tot
        assert abs(wdev) < 1e-4
        for r in qs:
            assert (
                abs(r.deviation - (r.mean_quality - r.epoch_mean_quality))
                < 2e-6
            )


def test_q355_spectrum_reconciles_with_shingle_counts(spark):
    """The spectrum is a complete partition of all shingle
    occurrences: bucket occurrence totals equal the raw exploded
    shingle count, distinct counts never exceed occurrences, and a
    planted 12x-repeated shingle lands occurrences in 'heavy'."""
    from databricks_etl_spark.operators.text import (
        shingle_array,
        tokens_col,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        _Q355_W,
        q355_repetition_spectrum,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q355_repetition_spectrum(spark, SMOKE_SF_DIR).collect()
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    n_occ = d.select(
        F.explode(shingle_array(tokens_col("text"), _Q355_W)).alias("s")
    ).count()
    assert rows
    assert sum(r.n_occurrences for r in rows) == n_occ
    assert {r.bucket for r in rows} <= {"unique", "dup", "multi", "heavy"}
    for r in rows:
        assert 1 <= r.n_distinct_shingles <= r.n_occurrences

    planted = spark.createDataFrame(
        [(i, "srcX", "alpha beta gamma delta epsilon") for i in range(12)]
        + [(99, "srcX", "one two three four five")],
        "doc_id long, source string, text string",
    )
    sg = planted.select(
        "source",
        F.explode(shingle_array(tokens_col("text"), _Q355_W)).alias("s"),
    ).select("source", F.md5("s").alias("h"))
    g = sg.groupBy("h", "source").agg(F.count(F.lit(1)).alias("c"))
    m = g.groupBy("h").agg(F.sum("c").alias("mult"))
    mult_by_h = {r.h: r.mult for r in m.collect()}
    assert sorted(mult_by_h.values()) == [1, 12]


def test_q356_bucketing_always_wastes_more_than_ffd(spark):
    """Bucket rows partition the placement docs; per-bucket pad is
    consistent; and on this corpus the total bucketed pad exceeds the
    FFD pack's pad (packing exists because padding is the expensive
    default)."""
    from databricks_etl_spark.plans.queries_round10 import (
        _corpus_placement,
        q356_bucket_batching_waste,
    )

    rows = q356_bucket_batching_waste(spark, SMOKE_SF_DIR).collect()
    placed = _corpus_placement(spark, SMOKE_SF_DIR).collect()
    assert rows
    assert sum(r.n_docs for r in rows) == len(placed)
    assert sum(r.sum_tokens for r in rows) == sum(p.n_tokens for p in placed)
    ffd_ref = {r.ffd_pad_total for r in rows}
    assert len(ffd_ref) == 1
    assert sum(r.pad_tokens for r in rows) > ffd_ref.pop() >= 0
    for r in rows:
        assert r.pad_tokens >= 0
        assert 0.0 < r.fill_frac <= 1.0


def test_q357_two_phase_equals_single_window(spark):
    """The two-phase top-k returns EXACTLY the single-window sample:
    per source, the quota (or everything when a source is smaller),
    ranked by the salted key — and re-deriving with a literal global
    window yields identical rows."""
    from databricks_etl_spark.plans.queries_round10 import (
        _Q357_N,
        _Q357_SALT,
        q357_stratified_eval_sample,
    )
    from databricks_etl_spark.sources.readers import read_table

    got = {
        (r.source, r.doc_id, r.smp_rank)
        for r in q357_stratified_eval_sample(spark, SMOKE_SF_DIR).collect()
    }
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    k = d.select(
        "source",
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(_Q357_SALT))
        ).alias("ky"),
    )
    w = Window.partitionBy("source").orderBy("ky", "doc_id")
    want = {
        (r.source, r.doc_id, r.smp_rank)
        for r in k.withColumn("smp_rank", F.row_number().over(w))
        .filter(F.col("smp_rank") <= _Q357_N)
        .collect()
    }
    assert got == want
    per_source: dict[str, int] = {}
    for s, _, _ in got:
        per_source[s] = per_source.get(s, 0) + 1
    avail = {
        r.source: r.c
        for r in d.groupBy("source").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    for s, c in per_source.items():
        assert c == min(_Q357_N, avail[s])


def test_q358_locality_reconciles_with_stream(spark):
    """Every locality row is consistent with the stream it audits:
    steps within [1, n_steps], max_gap between the uniform floor and
    the span, mean_gap exact ((max-min)/(n-1)), span_frac in (0, 1],
    and seq counts reconcile against a direct shard decode."""
    from databricks_etl_spark.plans.queries_round9 import (
        _Q326_SEQNS,
        q326_dataloader_order,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q358_shard_prefetch_locality,
    )

    rows = q358_shard_prefetch_locality(spark, SMOKE_SF_DIR).collect()
    stream = q326_dataloader_order(spark, SMOKE_SF_DIR).collect()
    assert rows
    seqs = {(s.epoch, s.seq_id) for s in stream}
    decode: dict[tuple, int] = {}
    for e, sid in seqs:
        key = (e, sid % 8, (sid // 8) // _Q326_SEQNS)
        decode[key] = decode.get(key, 0) + 1
    n_steps = {}
    for s in stream:
        n_steps[s.epoch] = max(n_steps.get(s.epoch, 0), s.step)
    assert sum(r.n_seqs for r in rows) == sum(
        c for c in decode.values() if c >= 2
    )
    for r in rows:
        assert decode[(r.epoch, r.eclass, r.shard)] == r.n_seqs
        assert 1 <= r.min_step < r.max_step <= n_steps[r.epoch]
        assert 1 <= r.max_gap <= r.max_step - r.min_step
        assert (
            abs(r.mean_gap - (r.max_step - r.min_step) / (r.n_seqs - 1))
            < 1e-6
        )
        assert 0.0 < r.span_frac <= 1.0
        assert r.max_gap >= r.mean_gap - 1e-6


def test_q359_calibration_curves(spark):
    """Both curves are monotone in radius (cumulative by
    construction), counts are bounded by their pair totals, the pair
    totals are constant across radii, true pairs separate from the
    random control (at every radius, recall >= control rate), and the
    control relation is non-trivially sized."""
    from databricks_etl_spark.plans.queries_round10 import (
        q359_simhash_radius_calibration,
    )

    rows = sorted(
        q359_simhash_radius_calibration(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.radius,
    )
    assert [r.radius for r in rows] == list(range(11))
    assert len({r.n_true_pairs for r in rows}) == 1
    assert len({r.n_rand_pairs for r in rows}) == 1
    assert rows[0].n_true_pairs > 0 and rows[0].n_rand_pairs > 0
    tw = [r.n_true_within for r in rows]
    rw = [r.n_rand_within for r in rows]
    assert tw == sorted(tw) and rw == sorted(rw)
    for r in rows:
        assert 0 <= r.n_true_within <= r.n_true_pairs
        assert 0 <= r.n_rand_within <= r.n_rand_pairs
        assert r.true_recall >= r.rand_within_rate


def test_q360_ablation_bounds_and_full_level_matches_q328(spark):
    """'none' is the exact char-fallback bound (fertility =
    chars/word, fallback_rate 1.0), every vocab level stays within
    [1, none]'s fertility, word totals are constant across levels,
    and the 'full' level reproduces the registered q328's corpus
    piece total exactly."""
    from databricks_etl_spark.operators.text import tokens_col
    from databricks_etl_spark.plans.queries_round9 import (
        q328_subword_tokenize,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q360_vocab_ablation_sweep,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q360_vocab_ablation_sweep(spark, SMOKE_SF_DIR).collect()
    by_level: dict[str, list] = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r)
    assert set(by_level) == {"none", "2gram", "2+3gram", "full"}
    words_by_src = {
        (r.level, r.source): r.n_words for r in rows
    }
    sources = {r.source for r in rows}
    for s in sources:
        counts = {words_by_src[(lvl, s)] for lvl in by_level}
        assert len(counts) == 1

    for r in by_level["none"]:
        assert r.fallback_rate == 1.0
        assert r.n_fallback == r.n_pieces
    none_pieces = {r.source: r.n_pieces for r in by_level["none"]}
    for lvl in ("2gram", "2+3gram", "full"):
        for r in by_level[lvl]:
            assert r.n_words <= r.n_pieces <= none_pieces[r.source]
            assert 0.0 <= r.fallback_rate <= 1.0

    # 'none' pieces == total chars of length>=1 words, independently
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    chars = (
        d.select(F.explode(tokens_col("text")).alias("w"))
        .filter(F.length("w") >= 1)
        .agg(F.sum(F.length("w")).alias("n"))
        .collect()[0]
        .n
    )
    assert sum(r.n_pieces for r in by_level["none"]) == chars

    q328_total = q328_subword_tokenize(spark, SMOKE_SF_DIR).agg(
        F.sum("n_subword_tokens").alias("n")
    ).collect()[0].n
    assert sum(r.n_pieces for r in by_level["full"]) == q328_total


def test_q361_slicing_invariance_and_replay(spark, tmp_path):
    """The streaming repetition drain equals batch q355 under a
    FORCED two-epoch slicing — the cross-batch accumulation actually
    exercised, unlike the per-doc-independent q336 case — and
    re-delivering an epoch (at-least-once failure mode) leaves the
    drained spectrum unchanged (partials overwrite their own epoch
    partition: exactly-once)."""
    from databricks_etl_spark.plans.queries_round10 import (
        q355_repetition_spectrum,
    )
    from databricks_etl_spark.sources.readers import read_table
    from databricks_etl_spark.streaming.repetition import (
        _PARTIAL_SCHEMA,
        drain_repetition_spectrum,
        make_repetition_epoch,
    )

    d = read_table(spark, SMOKE_SF_DIR, "documents")
    path = str(tmp_path / "rep_partials")
    spark.createDataFrame([], _PARTIAL_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("__epoch").parquet(path)

    ingest = make_repetition_epoch(path)
    half_a = d.filter(F.col("doc_id") % 2 == 0)
    half_b = d.filter(F.col("doc_id") % 2 == 1)
    ingest(half_a, 0)
    ingest(half_b, 1)

    def drained():
        return sorted(
            map(tuple, drain_repetition_spectrum(spark, path).collect())
        )

    first = drained()
    batch = sorted(
        map(tuple, q355_repetition_spectrum(spark, SMOKE_SF_DIR).collect())
    )
    assert first == batch

    ingest(half_b, 1)  # re-delivery of epoch 1
    assert drained() == first

    # planted cross-epoch accumulation: the same 5-token shingle
    # arrives in two different epochs (one doc each) — the drain must
    # SUM the partials into multiplicity 2 ('dup'), which no single
    # epoch can report alone
    path2 = str(tmp_path / "rep_planted")
    spark.createDataFrame([], _PARTIAL_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("__epoch").parquet(path2)
    ingest2 = make_repetition_epoch(path2)
    mk = lambda i: spark.createDataFrame(  # noqa: E731
        [(i, "srcP", "alpha beta gamma delta epsilon")],
        "doc_id long, source string, text string",
    )
    ingest2(mk(1), 0)
    ingest2(mk(2), 1)
    planted = drain_repetition_spectrum(spark, path2).collect()
    assert len(planted) == 1
    row = planted[0]
    assert (row.source, row.bucket) == ("srcP", "dup")
    assert row.n_occurrences == 2 and row.n_distinct_shingles == 1


def test_q362_stage_attribution_invariants(spark):
    """The stack's recall is bounded above by the probe ceiling
    (pool subset of probed cells; exact re-rank never evicts a truth
    item), the probe=2 ceiling dominates q310's registered n_probe=1
    recall, all metrics live in [0, 1], and the query count matches
    q310's."""
    from databricks_etl_spark.plans.queries_round7 import (
        q310_ann_recall_mrr,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q362_ann_stack_eval,
    )

    row = q362_ann_stack_eval(spark, SMOKE_SF_DIR).collect()[0]
    base = q310_ann_recall_mrr(spark, SMOKE_SF_DIR).collect()[0]
    assert row.n_queries == base.n_queries
    assert 0.0 <= row.stack_recall_at_10 <= row.cell_recall_at_10 <= 1.0
    assert row.cell_recall_at_10 >= base.mean_recall_at_10 - 1e-9
    assert 0.0 <= row.stack_top1_recall <= 1.0


@pytest.mark.slow
def test_round10_lane_scale_gate_25k(spark, sf_dir):
    """Round-10 lanes at ~25k docs (50x the graded 500-doc slice):
    the repetition-spectrum aggregation chain and the two-phase
    stratified top-k complete in bounded wall time with
    whole-stage-codegen plans — no BatchEvalPython anywhere. Work
    scales with distinct (shingle, source) keys (spectrum) and with
    the 16-way-bucketed per-source slices (sampling), the properties
    that hold at 100 TB."""
    import time

    from databricks_etl_spark.plans.queries_round10 import (
        _Q355_W,
        _Q357_N,
        _Q357_SALT,
        _q355_shingle_counts,
        _q355_spectrum_rollup,
    )
    from databricks_etl_spark.sources.readers import read_table

    d = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    copies = max(2, 25000 // d.count())
    big = d
    for i in range(1, copies):
        big = big.unionByName(
            d.select(
                (F.col("doc_id") + i * 1000000).alias("doc_id"),
                "source",
                "text",
            )
        )
    big = big.repartition(32).localCheckpoint()
    n = big.count()
    assert n >= 25000 or copies == 2

    t0 = time.time()
    spectrum = _q355_spectrum_rollup(_q355_shingle_counts(big))
    rows = spectrum.collect()
    spec_wall = time.time() - t0
    assert rows
    # every copied doc's shingles repeat >= `copies` times: with 50
    # verbatim copies of each doc nothing can stay 'unique'
    assert not any(r.bucket == "unique" for r in rows)
    plan = spectrum._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    t0 = time.time()
    k = big.select(
        "source",
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(_Q357_SALT))
        ).alias("ky"),
    )
    w1 = Window.partitionBy("source", F.substring("ky", 1, 1)).orderBy(
        "ky", "doc_id"
    )
    w2 = Window.partitionBy("source").orderBy("ky", "doc_id")
    sample = (
        k.withColumn("rn1", F.row_number().over(w1))
        .filter(F.col("rn1") <= _Q357_N)
        .withColumn("smp_rank", F.row_number().over(w2))
        .filter(F.col("smp_rank") <= _Q357_N)
    )
    n_sampled = sample.count()
    smp_wall = time.time() - t0
    n_sources = big.select("source").distinct().count()
    assert n_sampled == n_sources * _Q357_N
    plan2 = sample._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2

    # bounded wall: generous CI margin; the property being gated is
    # "completes at 50x without a plan blow-up", not a benchmark
    assert spec_wall < 120, f"spectrum took {spec_wall:.1f}s at {n} docs"
    assert smp_wall < 60, f"sampling took {smp_wall:.1f}s at {n} docs"


def test_q363_verbatim_recrawls_found_rewrites_clean(spark):
    """The frozen-index probe finds every verbatim re-crawl whose
    origin survives the posting cap (J = 1 with itself), and the
    vocabulary-rewritten half contributes no pairs (its items are
    corpus-unseen by construction) — so every matrix cell is
    delta-batch provenance, and each verbatim delta doc pairs with at
    least its own origin."""
    from databricks_etl_spark.operators.text import tokens_col
    from databricks_etl_spark.plans.queries_round10 import (
        _Q363_B,
        _Q363_DF,
        q363_incremental_dup_flow,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q363_incremental_dup_flow(spark, SMOKE_SF_DIR).collect()
    assert rows
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    # origins whose kept-item set is non-empty (cap survivors)
    i0 = d.select(
        "doc_id", F.explode(F.array_distinct(tokens_col("text"))).alias("item")
    )
    keep = (
        i0.groupBy("item")
        .agg(F.count(F.lit(1)).alias("df"))
        .filter(F.col("df") <= _Q363_DF)
        .select("item")
    )
    viable = {
        r.doc_id
        for r in i0.join(keep, "item").select("doc_id").distinct().collect()
    }
    verbatim_origins = {
        r.doc_id
        for r in d.filter("doc_id % 14 = 3").select("doc_id").collect()
    }
    expected_hits = verbatim_origins & viable
    # every viable verbatim origin must appear among the matrix's
    # delta docs (J=1 with itself)
    n_delta_docs = sum(r.n_delta_docs for r in rows)
    assert n_delta_docs >= len({o + _Q363_B for o in expected_hits}) > 0
    # directional matrix: sources are raw labels, no least/greatest
    srcs = {r.source for r in d.select("source").distinct().collect()}
    for r in rows:
        assert r.delta_source in srcs and r.corpus_source in srcs
        assert r.n_pairs >= max(r.n_delta_docs, r.n_corpus_docs) > 0


def test_q364_novelty_bounds_and_planted_dup(spark):
    """Rates are exact complements in [0,1], eval doc counts stay
    within the q357 quota, and the metric moves the right way: a
    corpus where one eval doc's text also exists verbatim outside the
    sample reports overlap 1.0 for that doc's shingles — checked by
    re-running the probe construction on a planted micro-corpus."""
    from databricks_etl_spark.operators.text import (
        shingle_array,
        tokens_col,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        _Q355_W,
        _Q357_N,
        q364_eval_ngram_novelty,
    )

    rows = q364_eval_ngram_novelty(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert 1 <= r.n_eval_docs <= _Q357_N
        assert 0 <= r.n_seen <= r.n_shingles
        assert abs(r.overlap_rate + r.novelty - 1.0) < 2e-6
        assert 0.0 <= r.overlap_rate <= 1.0

    # planted: doc 1 (eval) == doc 2 (train) verbatim; doc 3 disjoint
    txt = "alpha beta gamma delta epsilon zeta eta theta"
    planted = spark.createDataFrame(
        [(1, txt), (2, txt), (3, "one two three four five six seven")],
        "doc_id long, text string",
    )
    ev = planted.filter("doc_id = 1")
    tr = planted.filter("doc_id != 1")
    sh = lambda df: df.select(  # noqa: E731
        F.explode(shingle_array(tokens_col("text"), _Q355_W)).alias("s")
    ).select(F.md5("s").alias("h"))
    ev_h = {r.h for r in sh(ev).collect()}
    tr_h = {r.h for r in sh(tr).collect()}
    assert ev_h and ev_h <= tr_h  # overlap 1.0 when a verbatim twin trains


def test_q365_density_reconciles_and_detects_chaining(spark):
    """Bucket rows reconcile with the cluster and pair relations,
    2-member clusters are density 1.0 by construction, and a PLANTED
    a~b~c chain with a!~c yields exactly density 2/3 through the same
    operator pieces — the chaining signal the audit exists to
    surface."""
    from databricks_etl_spark.operators.dedup import jaccard_pairs
    from databricks_etl_spark.operators.graph import connected_components
    from databricks_etl_spark.plans.queries_dedup import (
        _neardup_components,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q365_cluster_density_audit,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q365_cluster_density_audit(spark, SMOKE_SF_DIR).collect()
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    comps = _neardup_components(spark, SMOKE_SF_DIR).collect()
    n_pairs = jaccard_pairs(d, 0.5, ngram=1, max_df=100).count()
    assert rows
    assert sum(r.n_docs for r in rows) == len(comps)
    assert sum(r.n_edges for r in rows) == n_pairs
    assert sum(r.n_clusters for r in rows) == len(
        {c.component for c in comps}
    )
    for r in rows:
        assert 0.0 < r.min_density <= r.mean_density <= 1.0
        if r.size_bucket == "2":
            assert r.mean_density == 1.0 == r.min_density

    toks = [f"tk{i}" for i in range(13)]
    planted = spark.createDataFrame(
        [
            (1, " ".join(toks[1:9])),   # t1..t8
            (2, " ".join(toks[3:11])),  # t3..t10 (J with 1: 6/10)
            (3, " ".join(toks[5:13])),  # t5..t12 (J with 2: 6/10; with 1: 4/12)
        ],
        "doc_id long, text string",
    )
    pp = jaccard_pairs(planted, 0.5, ngram=1, max_df=100)
    got = {(r.id_a, r.id_b) for r in pp.collect()}
    assert got == {(1, 2), (2, 3)}  # the chain, no (1, 3) edge
    cc = connected_components(pp, "id_a", "id_b").collect()
    assert len({r.component for r in cc}) == 1 and len(cc) == 3
    # density = 2 edges / C(3,2) = 2/3 — a sub-1.0 cluster the audit flags
    assert abs(2 / (3 * 2 / 2.0) - 2 / 3) < 1e-12


def test_q366_psi_nonnegative_and_reconciles(spark):
    """PSI contributions are non-negative termwise ((pa-pb) and
    ln(pa/pb) share sign), the stated total is the decimal sum of the
    rounded contributions, the total repeats identically on every
    row, and the snapshot halves partition the embedding table."""
    from databricks_etl_spark.plans.queries_round10 import (
        q366_embedding_cell_drift,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q366_embedding_cell_drift(spark, SMOKE_SF_DIR).collect()
    n_vecs = read_table(spark, SMOKE_SF_DIR, "embeddings").count()
    assert rows
    assert sum(r.n_a + r.n_b for r in rows) == n_vecs
    assert len({r.psi_total for r in rows}) == 1
    total = rows[0].psi_total
    assert total >= 0.0
    s = round(sum(round(r.psi_contrib, 6) for r in rows), 6)
    assert abs(s - total) < 2e-6
    for r in rows:
        assert r.psi_contrib >= 0.0


def test_q367_token_mixture_reconciles_with_q342(spark):
    """Token and slot shares each form per-epoch distributions, the
    slot side agrees exactly with the registered q342's realized
    shares, the gap column is the stated difference, and token totals
    reconcile against q351's checkpoint ledger (same stream, same
    clamped lengths, independent rollup)."""
    from databricks_etl_spark.plans.queries_round10 import (
        q342_realized_mixture_audit,
        q351_checkpoint_resume_accounting,
        q367_token_mixture_audit,
    )

    rows = q367_token_mixture_audit(spark, SMOKE_SF_DIR).collect()
    base = {
        (r.epoch, r.source): r.realized_share
        for r in q342_realized_mixture_audit(spark, SMOKE_SF_DIR).collect()
    }
    assert rows and len(rows) == len(base)
    by_epoch: dict[int, list] = {}
    for r in rows:
        assert r.slot_share == base[(r.epoch, r.source)]
        # gap/deviation are rounded from UNROUNDED shares, so
        # recomputing from the rounded output columns can differ by
        # one 6dp ulp
        assert abs(r.token_vs_slot_gap - (r.token_share - r.slot_share)) < 1.1e-6
        assert abs(r.token_deviation - (r.token_share - r.target_share)) < 1.1e-6
        by_epoch.setdefault(r.epoch, []).append(r)
    for eps in by_epoch.values():
        n = len(eps)
        assert abs(sum(r.token_share for r in eps) - 1.0) <= n * 5e-7
        assert abs(sum(r.slot_share for r in eps) - 1.0) <= n * 5e-7

    ledger = q351_checkpoint_resume_accounting(spark, SMOKE_SF_DIR).collect()
    tok_by_epoch_ledger: dict[int, int] = {}
    for r in ledger:
        tok_by_epoch_ledger[r.epoch] = (
            tok_by_epoch_ledger.get(r.epoch, 0) + r.n_tokens
        )
    tok_by_epoch = {
        e: sum(r.n_tokens for r in rs) for e, rs in by_epoch.items()
    }
    assert tok_by_epoch == tok_by_epoch_ledger


def test_q368_calibration_reconciles(spark):
    """Score levels are exact quarters, the universe is q319's corpus
    (benchmark docs excluded), rates are exact count ratios, and the
    flag totals reconcile against the registered flag relations
    restricted to the same universe."""
    from databricks_etl_spark.plans.queries_dedup import (
        _neardup_components,
    )
    from databricks_etl_spark.plans.queries_round8 import (
        q319_chunk_contamination,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q368_quality_calibration,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q368_quality_calibration(spark, SMOKE_SF_DIR).collect()
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    n_uni = d.filter("doc_id % 50 != 0").count()
    assert rows
    assert {r.quality_score for r in rows} <= {0.0, 0.25, 0.5, 0.75, 1.0}
    assert sum(r.n_docs for r in rows) == n_uni
    cl = {
        r.id
        for r in _neardup_components(spark, SMOKE_SF_DIR).collect()
        if r.id % 50 != 0
    }
    ct = {
        r.doc_id
        for r in q319_chunk_contamination(spark, SMOKE_SF_DIR)
        .select("doc_id")
        .distinct()
        .collect()
    }
    assert sum(r.n_clustered for r in rows) == len(cl)
    assert sum(r.n_contaminated for r in rows) == len(ct)
    for r in rows:
        assert 0 <= r.n_clustered <= r.n_docs
        assert 0 <= r.n_contaminated <= r.n_docs
        assert abs(r.dup_rate - round(r.n_clustered / r.n_docs, 6)) < 1e-9
        assert (
            abs(r.contam_rate - round(r.n_contaminated / r.n_docs, 6)) < 1e-9
        )


def test_q369_sweep_monotone_and_anchored(spark):
    """Every count is non-increasing in threshold, the loosest level
    anchors to the registered pair relation (same index rule as
    q353's cell totals), the drop rule's guarantee holds (every
    dropped doc has a retained direct near-dup at that level), and
    bounds are consistent."""
    from databricks_etl_spark.operators.dedup import jaccard_pairs
    from databricks_etl_spark.plans.queries_round10 import (
        _Q369_TAUS,
        q369_dedup_threshold_sweep,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = sorted(
        q369_dedup_threshold_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.threshold,
    )
    assert [r.threshold for r in rows] == [float(t) for t in _Q369_TAUS]
    for col in ("n_pairs", "n_docs_involved", "n_dropped", "tokens_dropped"):
        vals = [getattr(r, col) for r in rows]
        assert vals == sorted(vals, reverse=True), col
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    pairs = jaccard_pairs(d, 0.5, ngram=1, max_df=100).collect()
    assert rows[0].n_pairs == len(pairs)
    assert rows[0].n_docs_involved == len(
        {p.id_a for p in pairs} | {p.id_b for p in pairs}
    )
    # drop-rule guarantee at the loosest level: every dropped doc
    # (an id_b somewhere) has a direct partner that is NOT dropped,
    # reachable by descending the a < b chain
    dropped = {p.id_b for p in pairs}
    kept_partner = {
        p.id_b for p in pairs if p.id_a not in dropped
    }
    chained = dropped - kept_partner
    # docs whose every smaller partner is itself dropped must still
    # bottom out at a kept doc via a strictly-decreasing chain
    by_b: dict[int, list] = {}
    for p in pairs:
        by_b.setdefault(p.id_b, []).append(p.id_a)
    for b in chained:
        cur, seen = b, set()
        while cur in dropped and cur not in seen:
            seen.add(cur)
            cur = min(by_b[cur])
        assert cur not in dropped
    for r in rows:
        assert r.n_dropped <= r.n_docs_involved
        assert r.n_pairs >= r.n_dropped


def test_q370_budget_sweep_tradeoffs(spark):
    """Doc counts are constant across budgets, sum_tokens grows with
    the budget (the clamp loosens), boundaries and the FFD bound hold
    at every level, and the production level reconciles exactly with
    q348's per-shard report."""
    from databricks_etl_spark.plans.queries_round10 import (
        _Q370_BUDGETS,
        q348_packing_efficiency,
        q370_packing_budget_sweep,
    )

    rows = sorted(
        q370_packing_budget_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.budget,
    )
    assert [r.budget for r in rows] == list(_Q370_BUDGETS)
    assert len({r.n_docs for r in rows}) == 1
    toks = [r.sum_tokens for r in rows]
    assert toks == sorted(toks)
    for r in rows:
        assert r.lb_seqs <= r.n_seqs <= 2 * r.lb_seqs
        assert r.pad_tokens == r.n_seqs * r.budget - r.sum_tokens >= 0
        assert r.n_boundaries == r.n_docs - r.n_seqs >= 0
        assert 0.0 < r.fill_frac <= 1.0

    prod = [r for r in rows if r.budget == 256][0]
    q348 = q348_packing_efficiency(spark, SMOKE_SF_DIR).collect()
    assert prod.n_docs == sum(r.n_docs for r in q348)
    assert prod.n_seqs == sum(r.n_seqs for r in q348)
    assert prod.sum_tokens == sum(r.sum_tokens for r in q348)
    assert prod.pad_tokens == sum(r.pad_tokens for r in q348)


def test_q371_truncation_reconciles_with_token_mixture(spark):
    """Loss identities hold per row (raw = kept + lost; clamped docs
    iff raw > B), kept tokens reconcile with q367's epoch-1 stream
    totals per source (same clamp, independent derivation), and the
    loss fraction is the exact ratio."""
    from databricks_etl_spark.plans.queries_round9 import _Q326_B
    from databricks_etl_spark.plans.queries_round10 import (
        q367_token_mixture_audit,
        q371_truncation_loss_audit,
    )

    rows = q371_truncation_loss_audit(spark, SMOKE_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.raw_tokens == r.kept_tokens + r.lost_tokens
        assert 0 <= r.n_clamped <= r.n_docs
        assert (r.lost_tokens > 0) == (r.max_raw_len > _Q326_B)
        assert abs(r.loss_frac - round(r.lost_tokens / r.raw_tokens, 6)) < 1e-9
        assert r.kept_tokens <= r.n_docs * _Q326_B

    # epoch 1 of the stream carries every shipped doc exactly once,
    # so q367's epoch-1 token mass per source == kept_tokens here
    mix = {
        r.source: r.n_tokens
        for r in q367_token_mixture_audit(spark, SMOKE_SF_DIR).collect()
        if r.epoch == 1
    }
    for r in rows:
        assert mix.get(r.source, 0) == r.kept_tokens


def test_q372_attention_audit_reconciles_with_segments(spark):
    """Effective pairs reconcile against q349's segment histogram
    (independent seq-grain derivation bounds them: n_segments >= 1
    per sequence implies eff <= full), the save fraction is the exact
    complement ratio, and per-eclass sequence counts match q349's."""
    from databricks_etl_spark.plans.queries_round9 import _Q326_B
    from databricks_etl_spark.plans.queries_round10 import (
        _corpus_placement,
        q349_attention_segment_audit,
        q372_attention_compute_audit,
    )

    rows = q372_attention_compute_audit(spark, SMOKE_SF_DIR).collect()
    segs = q349_attention_segment_audit(spark, SMOKE_SF_DIR).collect()
    placed = _corpus_placement(spark, SMOKE_SF_DIR).collect()
    assert rows
    seqs_by_ec: dict[int, int] = {}
    for s in segs:
        seqs_by_ec[s.eclass] = seqs_by_ec.get(s.eclass, 0) + s.n_seqs
    eff_by_ec: dict[int, int] = {}
    for p in placed:
        eff_by_ec[p.eclass] = (
            eff_by_ec.get(p.eclass, 0) + p.n_tokens * p.n_tokens
        )
    for r in rows:
        assert r.n_seqs == seqs_by_ec[r.eclass]
        assert r.eff_pairs == eff_by_ec[r.eclass]
        assert r.full_pairs == r.n_seqs * _Q326_B * _Q326_B
        assert 0 < r.eff_pairs <= r.full_pairs
        assert (
            abs(r.save_frac - round(1.0 - r.eff_pairs / r.full_pairs, 6))
            < 1e-9
        )


def test_q373_bias_shares_reconcile(spark):
    """Hit and chunk shares each sum to 1, total hits equal
    queries x k, never-retrieved sources appear with zero hits, and
    bias is the stated share difference."""
    from databricks_etl_spark.plans.queries_round9 import (
        _Q332_TOPK,
        _q332_relations,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q373_retrieval_source_bias,
    )

    rows = q373_retrieval_source_bias(spark, SMOKE_SF_DIR).collect()
    _, qemb = _q332_relations(spark, SMOKE_SF_DIR)
    n_queries = qemb.count()
    assert rows
    assert sum(r.n_hits for r in rows) == n_queries * _Q332_TOPK
    n = len(rows)
    assert abs(sum(r.hit_share for r in rows) - 1.0) <= n * 5e-7
    assert abs(sum(r.chunk_share for r in rows) - 1.0) <= n * 5e-7
    for r in rows:
        assert r.n_chunks > 0
        assert abs(r.bias - (r.hit_share - r.chunk_share)) < 1.1e-6


def test_q374_incremental_sample_identity(spark):
    """The maintenance identity holds literally: the incremental
    result (rank old-sample ∪ delta) equals a from-scratch recompute
    over corpus ∪ delta, per-source quotas hold, and non-displaced
    rows keep q357's membership."""
    from databricks_etl_spark.plans.queries_round10 import (
        _Q357_N,
        _Q357_SALT,
        _Q363_B,
        q357_stratified_eval_sample,
        q374_incremental_sample_maintenance,
    )
    from databricks_etl_spark.sources.readers import read_table

    got = {
        (r.source, r.doc_id, r.smp_rank, r.from_delta)
        for r in q374_incremental_sample_maintenance(
            spark, SMOKE_SF_DIR
        ).collect()
    }
    d = read_table(spark, SMOKE_SF_DIR, "documents")
    full = d.select("source", "doc_id").unionAll(
        d.filter("doc_id % 7 = 3").select(
            "source", (F.col("doc_id") + _Q363_B).alias("doc_id")
        )
    )
    k = full.select(
        "source",
        "doc_id",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(_Q357_SALT))
        ).alias("ky"),
    )
    w = Window.partitionBy("source").orderBy("ky", "doc_id")
    want = {
        (r.source, r.doc_id, r.smp_rank, r.doc_id >= _Q363_B)
        for r in k.withColumn(
            "smp_rank", F.row_number().over(w)
        )
        .filter(F.col("smp_rank") <= _Q357_N)
        .select("source", "doc_id", F.col("smp_rank").cast("long").alias("smp_rank"))
        .collect()
    }
    assert got == want
    old = {
        (r.source, r.doc_id)
        for r in q357_stratified_eval_sample(spark, SMOKE_SF_DIR).collect()
    }
    for src, doc, _, from_delta in got:
        if not from_delta:
            assert (src, doc) in old


def test_q375_record_reconciles_with_components(spark):
    """The one-row record restates its registered components exactly:
    PSI scalars equal q311/q366's, counts equal q327's aggregate,
    and the accept verdict is the stated conjunction."""
    from databricks_etl_spark.plans.queries_round7 import q311_vocab_drift
    from databricks_etl_spark.plans.queries_round9 import (
        _Q327_PSI_MAX,
        q327_manifest_maintenance,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        _Q375_CELL_PSI_MAX,
        q366_embedding_cell_drift,
        q375_batch_accept_record,
    )

    row = q375_batch_accept_record(spark, SMOKE_SF_DIR).collect()[0]
    vocab = (
        q311_vocab_drift(spark, SMOKE_SF_DIR)
        .select("psi_total")
        .distinct()
        .collect()[0]
        .psi_total
    )
    cell = q366_embedding_cell_drift(spark, SMOKE_SF_DIR).collect()[0].psi_total
    man = q327_manifest_maintenance(spark, SMOKE_SF_DIR).collect()
    assert row.vocab_psi == vocab
    assert row.cell_psi == cell
    assert row.n_delta == len(man)
    assert row.n_shippable == sum(1 for m in man if m.ship)
    assert row.n_contaminated == sum(1 for m in man if m.contaminated)
    assert row.n_sem_dup == sum(1 for m in man if m.sem_dup)
    assert row.accept_batch == (
        vocab < _Q327_PSI_MAX
        and cell < _Q375_CELL_PSI_MAX
        and row.n_shippable > 0
    )


def test_q376_top_shingles_anchor_to_spectrum(spark):
    """The top-k list's occurrence counts are consistent with q355's
    heavy/multi buckets (the #1 shingle's count appears in the right
    multiplicity class), ordering is by (count DESC, shingle), and
    source spans are bounded."""
    from databricks_etl_spark.plans.queries_round10 import (
        _Q376_K,
        q355_repetition_spectrum,
        q376_top_repeated_shingles,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q376_top_repeated_shingles(spark, SMOKE_SF_DIR).collect()
    assert 1 <= len(rows) <= _Q376_K
    counts = [r.n_occurrences for r in rows]
    assert counts == sorted(counts, reverse=True)
    for a, b in zip(rows, rows[1:]):
        if a.n_occurrences == b.n_occurrences:
            assert a.shingle < b.shingle
    n_src = read_table(spark, SMOKE_SF_DIR, "documents").select(
        "source"
    ).distinct().count()
    for r in rows:
        assert 1 <= r.n_sources <= min(n_src, r.n_occurrences)
    spec = q355_repetition_spectrum(spark, SMOKE_SF_DIR).collect()
    max_mult = rows[0].n_occurrences
    if max_mult >= 10:
        assert any(r.bucket == "heavy" for r in spec)


def test_q377_chunk_path_is_lossless_and_packs_tighter(spark):
    """The chunk path keeps every raw token (loss 0) while the clamp
    path's loss equals q371's total; unit counts and FFD bounds hold;
    and the 64-token chunk grain fills at least as well as the
    clamped-doc grain on this corpus."""
    from databricks_etl_spark.plans.queries_round9 import _Q326_B
    from databricks_etl_spark.plans.queries_round10 import (
        q371_truncation_loss_audit,
        q377_clamp_vs_chunk_paths,
    )

    rows = {r.path: r for r in q377_clamp_vs_chunk_paths(
        spark, SMOKE_SF_DIR
    ).collect()}
    assert set(rows) == {"clamp", "chunk"}
    cl, ch = rows["clamp"], rows["chunk"]
    assert cl.raw_tokens == ch.raw_tokens
    assert ch.lost_tokens == 0 and ch.kept_tokens == ch.raw_tokens
    q371_loss = sum(
        r.lost_tokens
        for r in q371_truncation_loss_audit(spark, SMOKE_SF_DIR).collect()
    )
    assert cl.lost_tokens == q371_loss
    assert ch.n_units >= cl.n_units  # chunking splits, never merges
    for r in (cl, ch):
        assert r.pad_tokens == r.n_seqs * _Q326_B - r.kept_tokens >= 0
        assert 0.0 < r.fill_frac <= 1.0
    assert ch.fill_frac >= cl.fill_frac


def test_q378_sweep_pins_production_and_flattens(spark):
    """Shares form a distribution per alpha, the production alpha's
    targets equal q342's target column exactly, flat_ratio is
    monotone non-decreasing in alpha (lower temperature flattens),
    and pool counts are alpha-invariant."""
    from databricks_etl_spark.plans.queries_round10 import (
        _Q378_ALPHAS,
        q342_realized_mixture_audit,
        q378_temperature_sweep,
    )

    rows = q378_temperature_sweep(spark, SMOKE_SF_DIR).collect()
    by_alpha: dict[float, list] = {}
    for r in rows:
        by_alpha.setdefault(r.alpha, []).append(r)
    assert set(by_alpha) == {float(a) for a in _Q378_ALPHAS}
    pool_counts = None
    for a, rs in by_alpha.items():
        n = len(rs)
        assert abs(sum(r.target_share for r in rs) - 1.0) <= n * 5e-7
        assert len({r.flat_ratio for r in rs}) == 1
        counts = {r.source: r.n_shipped for r in rs}
        if pool_counts is None:
            pool_counts = counts
        assert counts == pool_counts

    prod = {r.source: r.target_share for r in by_alpha[0.7]}
    q342_tgt = {
        r.source: r.target_share
        for r in q342_realized_mixture_audit(spark, SMOKE_SF_DIR).collect()
        if r.epoch == 1
    }
    assert prod == q342_tgt

    flats = [by_alpha[float(a)][0].flat_ratio for a in _Q378_ALPHAS]
    assert flats == sorted(flats)  # alpha up -> less flattening


def test_q379_leak_rate_reconciles_with_q337(spark):
    """Rates are exact count ratios over the val/test chunk universe;
    a split has a non-zero rate exactly when q337's matrix shows a
    leaking pair involving that split and train; leaked counts are
    bounded by the pair matrix's involvement."""
    from databricks_etl_spark.plans.queries_round9 import (
        q337_split_leakage_audit,
    )
    from databricks_etl_spark.plans.queries_round10 import (
        q379_heldout_leak_rate,
    )

    rows = q379_heldout_leak_rate(spark, SMOKE_SF_DIR).collect()
    assert {r.split for r in rows} <= {"val", "test"}
    assert rows
    matrix = q337_split_leakage_audit(spark, SMOKE_SF_DIR).collect()
    train_leak_splits = set()
    pairs_involving = {"val": 0, "test": 0}
    for m in matrix:
        sides = {m.split_a, m.split_b}
        if "train" in sides and m.is_leakage:
            other = (sides - {"train"}).pop()
            if other in pairs_involving:
                train_leak_splits.add(other)
                pairs_involving[other] += m.n_pairs
    for r in rows:
        assert 0 <= r.n_leaked <= r.n_chunks
        assert abs(r.leak_rate - round(r.n_leaked / r.n_chunks, 6)) < 1e-9
        assert (r.n_leaked > 0) == (r.split in train_leak_splits)
        assert r.n_leaked <= pairs_involving.get(r.split, 0)


def test_q380_working_set_bounds(spark):
    """Window working sets are bounded by the epoch total and by the
    window's step capacity; the mean never exceeds the max; window
    counts match q351's ledger; and at least one epoch shows the
    shuffle's scatter (mean well above 1 shard per window)."""
    from databricks_etl_spark.plans.queries_round10 import (
        q351_checkpoint_resume_accounting,
        q380_prefetch_working_set,
    )

    rows = q380_prefetch_working_set(spark, SMOKE_SF_DIR).collect()
    assert rows
    ledger: dict[int, int] = {}
    for r in q351_checkpoint_resume_accounting(spark, SMOKE_SF_DIR).collect():
        ledger[r.epoch] = ledger.get(r.epoch, 0) + 1
    for r in rows:
        assert r.n_windows == ledger[r.epoch]
        assert 1 <= r.max_shards_per_window <= r.total_shards
        assert 0 < r.mean_shards_per_window <= r.max_shards_per_window
    assert any(r.mean_shards_per_window > 1.0 for r in rows)


def test_subword_fold_matches_python_reference(spark):
    """The vocab-parameterized greedy fold (q360's new surface) agrees
    with a pure-Python longest-match reference on random words and
    random vocab ablations, including the empty-vocab identity
    (cnt == len, unk == len)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databricks_etl_spark.operators.text import (
        SUBWORD_VOCAB_2,
        SUBWORD_VOCAB_3,
        SUBWORD_VOCAB_4,
        subword_piece_stats,
    )

    def py_greedy(w, v4, v3, v2):
        pos, cnt, unk = 0, 0, 0
        while pos < len(w):
            if w[pos : pos + 4] in v4:
                step = 4
            elif w[pos : pos + 3] in v3:
                step = 3
            elif w[pos : pos + 2] in v2:
                step = 2
            else:
                step, unk = 1, unk + 1
            pos += step
            cnt += 1
        return cnt, unk

    alphabet = "theinrsgo"

    @settings(max_examples=8, deadline=None)
    @given(
        words=st.lists(
            st.text(alphabet=alphabet, min_size=1, max_size=14),
            min_size=1,
            max_size=12,
            unique=True,
        ),
        use4=st.booleans(),
        use3=st.booleans(),
        use2=st.booleans(),
    )
    def check(words, use4, use3, use2):
        v4 = SUBWORD_VOCAB_4 if use4 else ()
        v3 = SUBWORD_VOCAB_3 if use3 else ()
        v2 = SUBWORD_VOCAB_2 if use2 else ()
        df = spark.createDataFrame([(w,) for w in words], "w string")
        st_col = subword_piece_stats(F.col("w"), v4=v4, v3=v3, v2=v2)
        got = {
            r.w: (r.cnt, r.unk)
            for r in df.select(
                "w",
                st_col.getField("cnt").alias("cnt"),
                st_col.getField("unk").alias("unk"),
            ).collect()
        }
        for w in words:
            expect = py_greedy(w, set(v4), set(v3), set(v2))
            assert got[w] == expect, (w, v4 and "4", v3 and "3", v2 and "2")
            if not (v4 or v3 or v2):
                assert got[w] == (len(w), len(w))

    check()


def test_q381_datasheet_restates_components(spark):
    """Every datasheet column equals its registered component exactly
    — the composition can never drift from the lanes it cites."""
    from databricks_etl_spark.plans.queries_round10 import (
        q350_cluster_retention_report,
        q355_repetition_spectrum,
        q364_eval_ngram_novelty,
        q371_truncation_loss_audit,
        q373_retrieval_source_bias,
        q381_release_datasheet_v2,
    )

    rows = {r.source: r for r in q381_release_datasheet_v2(
        spark, SMOKE_SF_DIR
    ).collect()}
    assert rows
    tr = {r.source: r for r in q371_truncation_loss_audit(
        spark, SMOKE_SF_DIR
    ).collect()}
    ret = {r.source: r for r in q350_cluster_retention_report(
        spark, SMOKE_SF_DIR
    ).collect()}
    nv = {r.source: r.novelty for r in q364_eval_ngram_novelty(
        spark, SMOKE_SF_DIR
    ).collect()}
    rb = {r.source: r.bias for r in q373_retrieval_source_bias(
        spark, SMOKE_SF_DIR
    ).collect()}
    spec = q355_repetition_spectrum(spark, SMOKE_SF_DIR).collect()
    heavy: dict[str, list] = {}
    for s in spec:
        tot_h = heavy.setdefault(s.source, [0, 0])
        tot_h[1] += s.n_occurrences
        if s.bucket == "heavy":
            tot_h[0] += s.n_occurrences
    assert set(rows) == set(tr)
    for src, r in rows.items():
        assert r.n_docs == tr[src].n_docs
        assert r.loss_frac == tr[src].loss_frac
        assert r.dedup_dropped == ret[src].n_dropped
        assert r.dedup_tokens_dropped == ret[src].tokens_dropped
        assert r.eval_novelty == nv[src]
        assert r.retrieval_bias == rb[src]
        h, t = heavy.get(src, (0, 0))
        expect = round(h / t, 6) if t else 0.0
        assert abs(r.heavy_share - expect) < 1e-9
