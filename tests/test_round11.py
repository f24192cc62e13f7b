"""Round-11 lane tests: BPE merge induction (learner vs pure-Python
reference, replace-last fold equivalence, learned-vocab fertility
reconciliation) and the round's incremental/skew/streaming lanes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SMOKE_SF_DIR


# ---------------------------------------------------------------------------
# pure-Python reference BPE (the index-skipping textbook loop)
# ---------------------------------------------------------------------------


def _py_merge_pass(syms, l, r):
    out, i = [], 0
    while i < len(syms):
        if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
            out.append(l + r)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


def _py_bpe(word_freqs, k):
    segs = {w: list(w) for w in word_freqs}
    merges = []
    for step in range(1, k + 1):
        counts = {}
        for w, f in word_freqs.items():
            s = segs[w]
            for i in range(len(s) - 1):
                counts[(s[i], s[i + 1])] = counts.get((s[i], s[i + 1]), 0) + f
        if not counts:
            break
        (l, r), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((step, l, r, l + r, cnt))
        segs = {w: _py_merge_pass(s, l, r) for w, s in segs.items()}
    return merges


def test_bpe_merge_fold_matches_python_reference(spark):
    """The Spark replace-last ``aggregate`` fold applies one merge pair
    exactly like the textbook left-to-right index-skipping loop, on
    random symbol sequences including the overlap traps (aaaa with
    (a,a); ababab with (a,b)); a fused symbol is strictly longer than
    its left side, so replace-last can never double-fuse."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databricks_etl_spark.operators.text import _bpe_merge_fold

    sym = st.sampled_from(["a", "b", "ab", "ba", "c"])

    @settings(max_examples=8, deadline=None)
    @given(
        seqs=st.lists(
            st.lists(sym, min_size=1, max_size=12),
            min_size=1,
            max_size=10,
        ),
        pair=st.tuples(sym, sym),
    )
    def check(seqs, pair):
        l, r = pair
        df = spark.createDataFrame(
            [(i, s) for i, s in enumerate(seqs)],
            "i long, syms array<string>",
        )
        got = {
            row.i: list(row.out)
            for row in df.select(
                "i",
                F.aggregate(
                    "syms",
                    F.array().cast("array<string>"),
                    _bpe_merge_fold(l, r),
                ).alias("out"),
            ).collect()
        }
        for i, s in enumerate(seqs):
            assert got[i] == _py_merge_pass(s, l, r), (s, l, r)

    check()


def test_bpe_learner_matches_python_reference_on_fixture(spark):
    """Full learner vs the pure-Python reference on a handcrafted
    corpus that exercises overlap (aaaa), frequency weighting
    (repeated words), and lexicographic tie-breaks."""
    from databricks_etl_spark.operators.text import learn_bpe_merge_list

    docs = [
        "aaaa abab low lower lowest",
        "low low newer newest wider",
        "abab abab aaaa er er",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs)], "doc_id long, text string"
    )
    wf: dict[str, int] = {}
    for t in docs:
        for w in t.split():
            wf[w] = wf.get(w, 0) + 1
    for k in (1, 4, 8):
        assert learn_bpe_merge_list(df, k) == _py_bpe(wf, k)


def test_q382_merge_table_invariants(spark):
    """Structural invariants of the learned table on sf0.001: steps
    are 1..n consecutive, merged is the concatenation, and the best
    pair count is non-increasing (a merge can only create pairs whose
    occurrence sets are subsets of existing ones, so the running max
    never rises — the classic BPE monotonicity)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q382_bpe_merge_induction,
    )

    rows = sorted(
        q382_bpe_merge_induction(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.step,
    )
    assert rows, "corpus must yield at least one merge"
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    for r in rows:
        assert r.merged == r.left_sym + r.right_sym
        assert r.pair_count > 0
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    # learned symbols compound: at least one merge's left or right side
    # is itself a previously merged token (multi-char)
    assert any(len(r.left_sym) > 1 or len(r.right_sym) > 1 for r in rows)


def test_bpe_vocab_blocks_regroup():
    from databricks_etl_spark.operators.text import bpe_vocab_blocks

    merges = [
        (1, "e", "r", "er", 9),
        (2, "m", "er", "mer", 5),
        (3, "mer", "s", "mers", 3),
        (4, "mers", "x", "mersx", 2),  # len 5 — dropped (max width 4)
        (5, "a", "t", "at", 2),
    ]
    v4, v3, v2 = bpe_vocab_blocks(merges)
    assert v4 == ("mers",)
    assert v3 == ("mer",)
    assert v2 == ("at", "er")


def test_q383_reconciles_with_q328_word_stream(spark):
    """q383's per-source word counts must equal q328's per-doc word
    counts rolled up by source — the two lanes share one token stream,
    so the learned-vocab re-base cannot silently change the words it
    tokenizes. Fertility is bounded below by 1 and above by the
    all-fallback worst case (every piece 1 char)."""
    from databricks_etl_spark.plans.queries_round9 import q328_subword_tokenize
    from databricks_etl_spark.plans.queries_round11 import (
        q383_learned_vocab_fertility,
    )
    from databricks_etl_spark.sources.readers import read_table

    got = {
        r.source: r for r in q383_learned_vocab_fertility(
            spark, SMOKE_SF_DIR
        ).collect()
    }
    src = read_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "source"
    )
    expect = {
        r.source: r.n_words
        for r in q328_subword_tokenize(spark, SMOKE_SF_DIR)
        .join(src, "doc_id")
        .groupBy("source")
        .agg(F.sum("n_words").alias("n_words"))
        .collect()
    }
    assert set(got) == set(expect)
    for s, row in got.items():
        assert row.n_words == expect[s]
        assert row.n_pieces >= row.n_words  # >= 1 piece per word
        assert 0 <= row.n_unk <= row.n_pieces
        assert row.fertility >= 1.0


# ---------------------------------------------------------------------------
# q384 — incremental ANN index maintenance
# ---------------------------------------------------------------------------


def test_q384_incremental_equals_rebuild_and_untouched_cells_identical(spark):
    """On a crafted batch where every base vector sits exactly on one
    comb centroid and the delta lands only in cell 0: the incremental
    manifest (base manifest ⊕ delta manifest) equals the from-scratch
    rebuild over base ∪ delta EXACTLY, and cells 1..7 — which receive
    no delta — keep byte-identical manifest rows. The frozen-quantizer
    argument made mechanical."""
    from databricks_etl_spark.plans.queries_round11 import (
        _q384_index,
        _q384_manifest,
    )

    base_rows = [
        (j, [1.0 if i % 8 == j else 0.0 for i in range(64)])
        for j in range(8)
    ]
    delta_rows = [
        (100 + t, [0.9 if i % 8 == 0 else 0.0 for i in range(64)])
        for t in range(2)
    ]
    schema = "vec_id long, embedding array<double>"
    base = spark.createDataFrame(base_rows, schema)
    delta = spark.createDataFrame(delta_rows, schema)
    full = spark.createDataFrame(base_rows + delta_rows, schema)

    mb = {
        r.cell_id: (r.n, r.h)
        for r in _q384_manifest(_q384_index(base), "n", "h").collect()
    }
    md = {
        r.cell_id: (r.n, r.h)
        for r in _q384_manifest(_q384_index(delta), "n", "h").collect()
    }
    mf = {
        r.cell_id: (r.n, r.h)
        for r in _q384_manifest(_q384_index(full), "n", "h").collect()
    }
    assert set(mb) == set(range(8))  # one base vector per cell
    assert set(md) == {0}  # delta confined to cell 0
    # incremental combine == from-scratch rebuild, cell by cell
    for cid in range(8):
        dn, dh = md.get(cid, (0, 0))
        assert mf[cid] == (mb[cid][0] + dn, mb[cid][1] + dh), cid
    # untouched cells byte-identical (not just count-identical)
    for cid in range(1, 8):
        assert mf[cid] == mb[cid], cid


def test_q384_manifest_reconciles_with_base_index(spark):
    """The registered query's per-cell rows reconcile with a base-only
    manifest on sf0.001: counts and content hashes are exactly
    base ⊕ delta (hash additivity is what lets a 100 TB maintenance
    job publish without re-reading the corpus postings)."""
    from databricks_etl_spark.plans.queries_round11 import (
        _q384_delta,
        _q384_index,
        _q384_manifest,
        q384_incremental_ann_index,
    )
    from databricks_etl_spark.sources.readers import read_table

    base = read_table(spark, SMOKE_SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    mb = {
        r.cell_id: (r.n, r.h)
        for r in _q384_manifest(_q384_index(base), "n", "h").collect()
    }
    md = {
        r.cell_id: (r.n, r.h)
        for r in _q384_manifest(
            _q384_index(_q384_delta(base)), "n", "h"
        ).collect()
    }
    got = {
        r.cell_id: r
        for r in q384_incremental_ann_index(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == set(mb) | set(md)
    for cid, row in got.items():
        bn, bh = mb.get(cid, (0, 0))
        dn, dh = md.get(cid, (0, 0))
        assert row.n_vectors == bn + dn
        assert row.n_delta == dn
        assert row.content_hash == bh + dh
    assert sum(r.n_delta for r in got.values()) > 0


# ---------------------------------------------------------------------------
# q385 — streaming incremental dup-flow
# ---------------------------------------------------------------------------


def test_q385_slicing_invariance_and_replay(spark, tmp_path):
    """The streaming dup-flow drain equals batch q363 under a FORCED
    two-epoch slicing of the delta docs, and re-delivering an epoch
    (at-least-once failure mode) leaves the drained matrix unchanged
    (pairs overwrite their own epoch partition: exactly-once). The
    frozen index is built once and shared by both epochs — the
    production shape."""
    from databricks_etl_spark.plans.queries_round10 import (
        q363_incremental_dup_flow,
    )
    from databricks_etl_spark.sources.readers import read_table
    from databricks_etl_spark.streaming.dupflow import (
        _PAIRS_SCHEMA,
        build_frozen_index,
        drain_dup_flow,
        make_dupflow_epoch,
    )

    d = read_table(spark, SMOKE_SF_DIR, "documents")
    path = str(tmp_path / "dupflow_pairs")
    spark.createDataFrame([], _PAIRS_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("__epoch").parquet(path)

    index = build_frozen_index(spark, SMOKE_SF_DIR)
    ingest = make_dupflow_epoch(path, index)
    ingest(d.filter(F.col("doc_id") % 2 == 0), 0)
    ingest(d.filter(F.col("doc_id") % 2 == 1), 1)

    def drained():
        return sorted(map(tuple, drain_dup_flow(spark, path).collect()))

    first = drained()
    batch = sorted(
        map(
            tuple,
            q363_incremental_dup_flow(spark, SMOKE_SF_DIR).collect(),
        )
    )
    assert first == batch
    assert first  # the synthesized verbatim re-crawls guarantee pairs

    ingest(d.filter(F.col("doc_id") % 2 == 1), 1)  # epoch-1 re-delivery
    assert drained() == first


# ---------------------------------------------------------------------------
# q386 — fail-closed release gate
# ---------------------------------------------------------------------------


def test_q386_releases_on_shipped_corpus_and_planted_violations_flip(spark):
    """Default thresholds RELEASE the shipped corpus at sf0.001 with
    zero violations; tightening any single knob past the observed
    values plants a violation and flips the verdict to HOLD with the
    violation attributed to the right check."""
    from databricks_etl_spark.plans.queries_round11 import (
        q386_release_gate,
        release_gate,
    )

    row = q386_release_gate(spark, SMOKE_SF_DIR).collect()[0]
    assert row.verdict == "RELEASE"
    assert row.n_violations == 0
    assert row.n_sources > 0 and row.n_splits > 0

    # one plant per input relation (datasheet / splits); the remaining
    # knobs share the datasheet rollup's CASE pattern verbatim
    plants = {
        "max_leak": ("viol_leak", {"max_leak": -1.0}),
        "min_novelty": ("viol_novelty", {"min_novelty": 1.01}),
    }
    for name, (col, kw) in plants.items():
        r = release_gate(spark, SMOKE_SF_DIR, **kw).collect()[0]
        assert r.verdict == "HOLD", name
        assert getattr(r, col) > 0, name
        assert r.n_violations == getattr(r, col), name  # only that check

    # chaining knob: the sf0.001 '10+' cluster is a perfect clique
    # (min_density 1.0), so a floor above 1.0 is the plant
    r = release_gate(spark, SMOKE_SF_DIR, min_density=1.01).collect()[0]
    assert r.verdict == "HOLD" and r.viol_chaining > 0


def test_q386_fails_closed_on_empty_inputs(spark):
    """An empty datasheet or split universe must HOLD even with zero
    violations — the fail-closed contract, checked at the kernel
    grain by rebuilding the verdict expression over empty inputs."""
    from pyspark.sql import functions as F

    # simulate the combine with empty aggregates: n_sources = 0
    ds = spark.createDataFrame(
        [], "source string, eval_novelty double"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_sources"),
        F.coalesce(
            F.sum(F.when(F.col("eval_novelty") < 0.8, 1).otherwise(0)),
            F.lit(0),
        )
        .cast("long")
        .alias("viol_novelty"),
    )
    row = ds.collect()[0]
    assert row.n_sources == 0 and row.viol_novelty == 0
    # and the gate's verdict rule holds: zero violations but zero
    # sources is NOT a release
    verdict = (
        "RELEASE" if row.viol_novelty == 0 and row.n_sources > 0 else "HOLD"
    )
    assert verdict == "HOLD"


# ---------------------------------------------------------------------------
# q387 — skew-hardened (salted) chunk banding
# ---------------------------------------------------------------------------


def test_q387_salted_path_equals_plain_join_everywhere_hot(spark):
    """With hot_threshold=1 EVERY bucket takes the salted path — the
    strongest equality setting: the fully-salted candidate relation
    matches q330's plain-join output pair for pair on sf0.001, and
    the executed plan carries the salt join keys (the mechanism,
    named)."""
    from databricks_etl_spark.plans.queries_round9 import (
        _q330_score,
        _q330_sig_bands,
        q330_chunk_minhash_neardup,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        salted_band_candidates,
    )

    sig, bands = _q330_sig_bands(spark, SMOKE_SF_DIR)
    salted = _q330_score(
        salted_band_candidates(bands, hot_threshold=1), sig
    )
    got = sorted(map(tuple, salted.collect()))
    expect = sorted(
        map(tuple, q330_chunk_minhash_neardup(spark, SMOKE_SF_DIR).collect())
    )
    assert got == expect
    assert got  # sf0.001 has true chunk near-dups
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__bsalt" in plan and "__tsalt" in plan


@pytest.mark.slow
def test_q387_planted_hot_band_100x_median(spark):
    """The adversarial fixture the verdict asked for: 200 boilerplate
    copies put one (band, band_hash) bucket at >= 100x the median
    bucket load. The salted two-phase join must (a) classify exactly
    that bucket's keys as hot, (b) reproduce the plain join's pairs
    EXACTLY (hashes unchanged), and (c) complete in bounded wall with
    a whole-stage-codegen plan (no BatchEvalPython)."""
    import time

    from databricks_etl_spark.plans.queries_round9 import (
        _q330_sig_bands_df,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        salted_band_candidates,
    )
    from databricks_etl_spark.sources.readers import read_table

    d = read_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "text"
    )
    boiler = " ".join(f"boiler{i % 17} tok{i}" for i in range(15))
    planted = d.unionByName(
        spark.range(200).select(
            (F.col("id") + 5_000_000).alias("doc_id"),
            F.lit(boiler).alias("text"),
        )
    ).localCheckpoint()

    _, bands = _q330_sig_bands_df(planted)
    bands = bands.localCheckpoint()  # same input to both forms
    sizes = sorted(
        r.n
        for r in bands.groupBy("band", "bh")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    median = sizes[len(sizes) // 2]
    assert sizes[-1] >= 100 * median, (sizes[-1], median)

    pair_cols = ["doc_a", "chunk_a", "doc_b", "chunk_b"]

    def plain(b):
        a = b.select(
            F.col("doc_id").alias("doc_a"),
            F.col("chunk_idx").alias("chunk_a"),
            "band",
            "bh",
        )
        bb = b.select(
            F.col("doc_id").alias("doc_b"),
            F.col("chunk_idx").alias("chunk_b"),
            "band",
            "bh",
        )
        return (
            a.join(bb, ["band", "bh"])
            .filter(F.col("doc_a") < F.col("doc_b"))
            .groupBy(*pair_cols)
            .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
        )

    t0 = time.time()
    salted = salted_band_candidates(bands)
    got = sorted(map(tuple, salted.collect()))
    salted_wall = time.time() - t0
    expect = sorted(map(tuple, plain(bands).collect()))
    assert got == expect
    # the boilerplate clique is present: 200-choose-2 pairs at least
    assert len(got) >= 200 * 199 // 2
    plan = salted._jdf.queryExecution().executedPlan().toString()
    assert "__bsalt" in plan and "__tsalt" in plan
    assert "BatchEvalPython" not in plan
    assert salted_wall < 120, f"salted join took {salted_wall:.1f}s"


# ---------------------------------------------------------------------------
# q388 — sampled-truth probe sweep (bench twin)
# ---------------------------------------------------------------------------


def test_q388_curve_invariants_and_q341_agreement(spark):
    """The sampled-truth curve keeps q341's structural guarantees —
    monotone recall in n_probe, EXACT 1.0 at full probe — and scores
    the same query set; the sampled truth is a strict subset of the
    scored pass, so the per-level recall may differ from q341's but
    the probe levels and query counts must match."""
    from databricks_etl_spark.plans.queries_round10 import (
        _Q341_PROBES,
        _Q332_K,
        q341_ivf_probe_sweep,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        q388_ivf_probe_sweep_sampled,
    )

    got = sorted(
        q388_ivf_probe_sweep_sampled(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.n_probe,
    )
    full = sorted(
        q341_ivf_probe_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in got] == list(_Q341_PROBES)
    assert [r.n_queries for r in got] == [r.n_queries for r in full]
    recalls = [r.mean_recall_at_10 for r in got]
    assert recalls == sorted(recalls)
    assert got[-1].n_probe == _Q332_K
    assert got[-1].mean_recall_at_10 == 1.0
    assert got[-1].top1_recall == 1.0


# ---------------------------------------------------------------------------
# q389 — merge-depth compression curve
# ---------------------------------------------------------------------------


def test_q389_curve_monotone_and_pinned_to_python_reference(spark):
    """n_pieces is non-increasing in merge depth, depth 0 is exactly
    the frequency-weighted character total (compression 1.0), and the
    full-depth row equals the pure-Python reference BPE's segmentation
    totals on the same word frequencies."""
    import duckdb

    from databricks_etl_spark.plans.queries_round11 import (
        _Q382_K,
        _Q389_DEPTHS,
        q389_merge_depth_curve,
    )

    rows = sorted(
        q389_merge_depth_curve(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.depth,
    )
    assert [r.depth for r in rows] == sorted(_Q389_DEPTHS)
    pieces = [r.n_pieces for r in rows]
    assert pieces == sorted(pieces, reverse=True)
    assert rows[0].compression_vs_chars == 1.0

    con = duckdb.connect()
    wf = dict(
        con.execute(
            f"""SELECT w, COUNT(*) FROM (
                 SELECT unnest(string_split_regex(lower(trim(text)),
                     '\\s+')) AS w
                 FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet'))
               WHERE length(w) >= 1 GROUP BY 1"""
        ).fetchall()
    )
    segs = {w: list(w) for w in wf}
    for _, l, r, _, _ in _py_bpe(wf, _Q382_K):
        segs = {w: _py_merge_pass(s, l, r) for w, s in segs.items()}
    expect_full = sum(len(s) * wf[w] for w, s in segs.items())
    assert rows[-1].n_pieces == expect_full
    expect_chars = sum(len(w) * f for w, f in wf.items())
    assert rows[0].n_pieces == expect_chars


# ---------------------------------------------------------------------------
# q390 — streaming ANN index maintenance
# ---------------------------------------------------------------------------


def test_q390_slicing_invariance_and_replay(spark, tmp_path):
    """The streaming manifest drain equals batch q384 under a FORCED
    two-epoch slicing of the vector stream (additive partials summed
    across epochs), and re-delivering an epoch leaves the drained
    manifest unchanged (partials overwrite their own partition:
    exactly-once)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q384_incremental_ann_index,
    )
    from databricks_etl_spark.sources.readers import read_table
    from databricks_etl_spark.streaming.annindex import (
        _PARTIAL_SCHEMA,
        drain_ann_index,
        make_annindex_epoch,
    )

    e = read_table(spark, SMOKE_SF_DIR, "embeddings").select(
        "vec_id", "embedding"
    )
    path = str(tmp_path / "annidx_partials")
    spark.createDataFrame([], _PARTIAL_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("__epoch").parquet(path)

    ingest = make_annindex_epoch(path)
    ingest(e.filter(F.col("vec_id") % 2 == 0), 0)
    ingest(e.filter(F.col("vec_id") % 2 == 1), 1)

    def drained():
        return sorted(
            map(
                tuple,
                drain_ann_index(spark, SMOKE_SF_DIR, path).collect(),
            )
        )

    first = drained()
    batch = sorted(
        map(
            tuple,
            q384_incremental_ann_index(spark, SMOKE_SF_DIR).collect(),
        )
    )
    assert first == batch
    assert sum(r[2] for r in first) > 0  # deltas present

    ingest(e.filter(F.col("vec_id") % 2 == 1), 1)  # epoch-1 re-delivery
    assert drained() == first


# ---------------------------------------------------------------------------
# q391 — vocabulary stability under a crawl delta
# ---------------------------------------------------------------------------


def test_q391_alignment_semantics_and_python_reference(spark):
    """The aligned table's flags are internally consistent
    (prefix_agree is the running AND of step_agree; base columns
    reproduce q382's merge table exactly), and the augmented run
    matches the pure-Python reference BPE over the corpus ∪ delta
    word frequencies — so the drift the lane reports is real
    vocabulary drift, not implementation drift."""
    import duckdb

    from databricks_etl_spark.plans.queries_round11 import (
        _Q382_K,
        _Q391_B,
        q382_bpe_merge_induction,
        q391_vocab_stability_delta,
    )

    rows = sorted(
        q391_vocab_stability_delta(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.step,
    )
    assert [r.step for r in rows] == list(range(1, len(rows) + 1))
    run = 1
    for r in rows:
        assert r.step_agree in (0, 1)
        run = run and r.step_agree
        assert r.prefix_agree == run
    base = {
        r.step: (r.left_sym, r.right_sym, r.pair_count)
        for r in q382_bpe_merge_induction(spark, SMOKE_SF_DIR).collect()
    }
    for r in rows:
        assert (r.base_left, r.base_right, r.base_count) == base[r.step]

    con = duckdb.connect()
    wf = dict(
        con.execute(
            f"""SELECT w, COUNT(*) FROM (
                 SELECT unnest(string_split_regex(lower(trim(
                     CASE WHEN rn = 0 THEN text
                          WHEN doc_id % 14 = 3 THEN text
                          ELSE array_to_string(list_transform(
                              string_split_regex(lower(trim(text)), '\\s+'),
                              t -> substr(md5(t), 1, 8)), ' ')
                     END)), '\\s+')) AS w
                 FROM (
                   SELECT doc_id, text, 0 AS rn
                   FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet')
                   UNION ALL
                   SELECT doc_id, text, 1
                   FROM read_parquet('{SMOKE_SF_DIR}/documents.parquet')
                   WHERE doc_id % 7 = 3
                 ))
               WHERE length(w) >= 1 GROUP BY 1"""
        ).fetchall()
    )
    expect = {
        m[0]: (m[1], m[2], m[4]) for m in _py_bpe(wf, _Q382_K)
    }
    for r in rows:
        assert (r.delta_left, r.delta_right, r.delta_count) == expect[r.step]


# ---------------------------------------------------------------------------
# q392 — packing re-based on learned-vocab lengths
# ---------------------------------------------------------------------------


def test_q392_packs_every_doc_once_and_conserves_learned_tokens(spark):
    """FFD invariants on the learned-length pack: every document
    placed exactly once, per-sequence sums within budget, and the
    clamped length total equals the learned-vocab piece total (q383's
    per-source n_pieces summed) after the same clamp — the
    length-source hand-off conserved end to end."""
    from databricks_etl_spark.plans.queries_round8 import _Q313_B
    from databricks_etl_spark.plans.queries_round11 import (
        _q392_learned_lens,
        q383_learned_vocab_fertility,
        q392_learned_vocab_packing,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q392_learned_vocab_packing(spark, SMOKE_SF_DIR).collect()
    n_docs = read_table(spark, SMOKE_SF_DIR, "documents").count()
    assert len(rows) == n_docs
    assert len({r.doc_id for r in rows}) == n_docs
    per_seq: dict = {}
    for r in rows:
        per_seq.setdefault(r.seq_id, 0)
        per_seq[r.seq_id] += r.n_tokens
    assert all(v <= _Q313_B for v in per_seq.values())

    lens = {r.doc_id: r.len for r in _q392_learned_lens(
        spark, SMOKE_SF_DIR
    ).collect()}
    assert sum(r.n_tokens for r in rows) == sum(
        min(v, _Q313_B) for v in lens.values()
    )
    # the unclamped learned-length total reconciles with q383
    assert sum(lens.values()) == sum(
        r.n_pieces
        for r in q383_learned_vocab_fertility(spark, SMOKE_SF_DIR).collect()
    )


# ---------------------------------------------------------------------------
# q393 — tokenizer release datasheet
# ---------------------------------------------------------------------------


def test_q393_every_column_pinned_to_component_lane(spark):
    """The q381 discipline: each datasheet column equals its component
    lane's own rollup on sf0.001 — merge/vocab counts to q382,
    full-depth pieces/compression to q389, fertility/unk to q383's
    totals, stability prefix to q391's running flag."""
    from databricks_etl_spark.plans.queries_round11 import (
        _Q382_K,
        q382_bpe_merge_induction,
        q383_learned_vocab_fertility,
        q389_merge_depth_curve,
        q391_vocab_stability_delta,
        q393_tokenizer_datasheet,
    )

    row = q393_tokenizer_datasheet(spark, SMOKE_SF_DIR).collect()[0]
    merges = q382_bpe_merge_induction(spark, SMOKE_SF_DIR).collect()
    assert row.n_merges == len(merges)
    for width, col in ((2, row.n_vocab2), (3, row.n_vocab3), (4, row.n_vocab4)):
        assert col == len({m.merged for m in merges if len(m.merged) == width})
    deep = [
        r
        for r in q389_merge_depth_curve(spark, SMOKE_SF_DIR).collect()
        if r.depth == _Q382_K
    ][0]
    assert row.n_pieces_full == deep.n_pieces
    assert row.compression_full == deep.compression_vs_chars
    f = q383_learned_vocab_fertility(spark, SMOKE_SF_DIR).collect()
    tp, tw, tu = (
        sum(r.n_pieces for r in f),
        sum(r.n_words for r in f),
        sum(r.n_unk for r in f),
    )
    assert row.fertility == round(tp / tw, 6)
    assert row.unk_rate == round(tu / tp, 6)
    stab = q391_vocab_stability_delta(spark, SMOKE_SF_DIR).collect()
    assert row.stable_prefix == sum(r.prefix_agree for r in stab)
    assert 0 <= row.stable_prefix <= row.n_merges


# ---------------------------------------------------------------------------
# q394 — vocabulary sensitivity to cleaning
# ---------------------------------------------------------------------------


def test_q394_raw_side_pins_to_q382_and_flags_consistent(spark):
    """The raw columns reproduce q382's merge table exactly; the clean
    run matches a direct learner run over the shipped pool; flags are
    the running AND."""
    from databricks_etl_spark.operators.text import learn_bpe_merge_list
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        _Q382_K,
        q382_bpe_merge_induction,
        q394_vocab_cleaning_sensitivity,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = sorted(
        q394_vocab_cleaning_sensitivity(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.step,
    )
    base = {
        r.step: (r.left_sym, r.right_sym, r.pair_count)
        for r in q382_bpe_merge_induction(spark, SMOKE_SF_DIR).collect()
    }
    run = 1
    for r in rows:
        assert (r.raw_left, r.raw_right, r.raw_count) == base[r.step]
        run = run and r.step_agree
        assert r.prefix_agree == run

    d = read_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "text"
    )
    ship = (
        q312_training_manifest(spark, SMOKE_SF_DIR)
        .filter("ship")
        .select("doc_id")
    )
    direct = learn_bpe_merge_list(d.join(ship, "doc_id"), _Q382_K)
    assert [(r.step, r.clean_left, r.clean_right, r.clean_count) for r in rows] == [
        (s, l, rr, c) for (s, l, rr, _m, c) in direct
    ]


# ---------------------------------------------------------------------------
# q395 — tokenizer release gate
# ---------------------------------------------------------------------------


def test_q395_releases_and_planted_violations_flip(spark):
    """Defaults RELEASE the shipped corpus at sf0.001 with zero
    violations; tightening any knob past the observed card plants a
    violation and flips the verdict (each knob exercises a distinct
    CASE arm of the same rollup)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q395_tokenizer_gate,
        tokenizer_gate,
    )

    row = q395_tokenizer_gate(spark, SMOKE_SF_DIR).collect()[0]
    assert row.verdict == "RELEASE" and row.n_violations == 0

    # the card rides the session learner cache, so each plant is cheap
    for kw in (
        {"min_merges": 11},
        {"max_fertility": 1.0},
        {"max_unk": 0.1},
        {"max_compression": 0.5},
        {"min_stable": 11},
    ):
        r = tokenizer_gate(spark, SMOKE_SF_DIR, **kw).collect()[0]
        assert r.verdict == "HOLD" and r.n_violations == 1, kw


@pytest.mark.slow
def test_bpe_learner_duplication_invariance_25k(spark):
    """BPE at 50x corpus duplication: verbatim copies scale every
    pair count by the copy factor and change NOTHING else — the
    merge table at ~25k docs must equal the 500-doc table with
    counts multiplied, and the learner's wall stays bounded (its
    per-iteration work rides the DISTINCT-word relation, which
    duplication leaves untouched — the 100 TB argument made
    mechanical)."""
    import time

    from databricks_etl_spark.operators.text import learn_bpe_merge_list
    from databricks_etl_spark.plans.queries_round11 import _Q382_K
    from databricks_etl_spark.sources.readers import read_table

    d = read_table(spark, SMOKE_SF_DIR, "documents").select(
        "doc_id", "text"
    )
    base = learn_bpe_merge_list(d, _Q382_K)
    copies = max(2, 25000 // d.count())
    big = d
    for i in range(1, copies):
        big = big.unionByName(
            d.select(
                (F.col("doc_id") + i * 1000000).alias("doc_id"), "text"
            )
        )
    big = big.repartition(32).localCheckpoint()
    t0 = time.time()
    scaled = learn_bpe_merge_list(big, _Q382_K)
    wall = time.time() - t0
    assert scaled == [
        (s, l, r, m, c * copies) for (s, l, r, m, c) in base
    ]
    assert wall < 180, f"learner took {wall:.1f}s at {copies}x"


# ---------------------------------------------------------------------------
# q396 — graded nDCG@10 probe sweep
# ---------------------------------------------------------------------------


def test_q396_table_pins_to_textbook_ndcg_arithmetic():
    """The embedded 30-entry contribution table IS (2^g - 1) /
    log2(pos+1) to 9dp, and IDCG is the decimal sum of the ideal
    prefix's own entries — so the no-runtime-logs discipline cannot
    drift from the textbook formula it freezes."""
    import math
    from decimal import Decimal

    from databricks_etl_spark.plans.queries_round11 import (
        _Q396_AT,
        _Q396_IDCG,
        _Q396_TAB,
    )

    for g in (1, 2, 3):
        for p in range(1, _Q396_AT + 1):
            want = (2**g - 1) / math.log2(p + 1)
            got = float(_Q396_TAB[(g - 1) * _Q396_AT + (p - 1)])
            assert abs(got - want) < 1e-9, (g, p, got, want)
    ideal = [3] * 3 + [2] * (_Q396_AT - 3)
    assert Decimal(_Q396_IDCG) == sum(
        Decimal(_Q396_TAB[(g - 1) * _Q396_AT + i]) for i, g in enumerate(ideal)
    )


def test_q396_curve_invariants_and_python_rederivation(spark):
    """nDCG@10 is monotone in n_probe (the pointwise-exchange
    argument) and EXACTLY 1.0 at full probe; and the lane's windowed
    ANN-position formulation agrees with an independent Python
    re-derivation (explicit filter -> order -> enumerate loop) of
    per-query DCG from the same truth prefix."""
    from decimal import Decimal

    from databricks_etl_spark.plans.queries_round10 import (
        _Q332_K,
        _Q341_PROBES,
        _q341_truth,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        _Q396_AT,
        _Q396_IDCG,
        _Q396_TAB,
        _Q396_TOPN,
        q396_ivf_ndcg_sweep,
    )

    got = sorted(
        q396_ivf_ndcg_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in got] == list(_Q341_PROBES)
    curve = [r.mean_ndcg_at_10 for r in got]
    assert curve == sorted(curve)
    assert got[-1].n_probe == _Q332_K
    assert got[-1].mean_ndcg_at_10 == 1.0

    truth = _q341_truth(spark, SMOKE_SF_DIR, topk=_Q396_TOPN).collect()
    byq: dict = {}
    for r in truth:
        byq.setdefault(r.qid, []).append((r.rk, r.cell_rank))
    for n_probe, want_mean in zip([r.n_probe for r in got], curve):
        ndcgs = []
        for rows in byq.values():
            retrieved = sorted(rk for rk, cr in rows if cr <= n_probe)
            dcg = Decimal(0)
            for pos, rk in enumerate(retrieved[:_Q396_AT], start=1):
                g = 3 if rk <= 3 else (2 if rk <= 10 else 1)
                dcg += Decimal(_Q396_TAB[(g - 1) * _Q396_AT + (pos - 1)])
            ndcgs.append(round(float(dcg) / float(_Q396_IDCG), 6))
        assert round(sum(ndcgs) / len(ndcgs), 6) == want_mean, n_probe


def test_q341_truth_topk_default_is_prefix_of_deeper_pass(spark):
    """The topk kwarg only EXTENDS the ranked prefix: the default
    depth-10 truth is row-for-row the rk<=10 slice of the depth-20
    pass (the byte-identical-at-default discipline for q396's shared
    kernel)."""
    from databricks_etl_spark.plans.queries_round10 import _q341_truth
    from databricks_etl_spark.plans.queries_round11 import _Q396_TOPN

    base = {
        (r.qid, r.rk, r.cell_rank)
        for r in _q341_truth(spark, SMOKE_SF_DIR).collect()
    }
    deep = {
        (r.qid, r.rk, r.cell_rank)
        for r in _q341_truth(spark, SMOKE_SF_DIR, topk=_Q396_TOPN).collect()
        if r.rk <= 10
    }
    assert base == deep


# ---------------------------------------------------------------------------
# q397 — quality-policy survivor election
# ---------------------------------------------------------------------------


def test_q397_election_invariants(spark):
    """Exactly one survivor per cluster; the survivor's quality is the
    cluster max (gap 0 for it, >= 0 for every member); cluster ids
    and membership agree with q123."""
    from databricks_etl_spark.plans.queries_dedup import q123_dup_clusters
    from databricks_etl_spark.plans.queries_round11 import (
        q397_quality_survivor_election,
    )

    rows = q397_quality_survivor_election(spark, SMOKE_SF_DIR).collect()
    assert rows
    byc: dict = {}
    for r in rows:
        byc.setdefault(r.cluster_id, []).append(r)
    for cid, members in byc.items():
        kept = [r for r in members if r.is_kept]
        assert len(kept) == 1, cid
        k = kept[0]
        assert k.kept_doc_id == k.doc_id and k.quality_gap == 0.0
        assert len(members) == members[0].cluster_size
        for r in members:
            assert r.kept_doc_id == k.doc_id
            assert r.quality_gap >= 0.0
            assert r.quality_score <= k.quality_score
    q123 = {
        (r.doc_id, r.component)
        for r in q123_dup_clusters(spark, SMOKE_SF_DIR).collect()
    }
    assert {(r.doc_id, r.cluster_id) for r in rows} == q123


def test_q397_planted_quality_beats_min_id(spark, tmp_path):
    """A planted cluster where the LOWEST id has the LOWEST quality:
    the id policy (q124) would keep doc 1, the quality policy must
    keep doc 2 — proving the election is by score, not by label."""
    import pandas as pd

    t1 = "alpha beta gamma delta"            # 4 tokens: fails len>=5
    t2 = "alpha beta gamma delta the"        # 5 tokens + stopword
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 50],
            "text": [t1, t2, "zzz qqq"],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [len(t1), len(t2), 7],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    from databricks_etl_spark.plans.queries_round11 import (
        q397_quality_survivor_election,
    )

    rows = q397_quality_survivor_election(spark, str(tmp_path)).collect()
    assert {r.doc_id for r in rows} == {1, 2}
    kept = {r.doc_id: r.is_kept for r in rows}
    assert kept == {1: False, 2: True}
    gaps = {r.doc_id: r.quality_gap for r in rows}
    assert gaps[2] == 0.0 and gaps[1] > 0.0


# ---------------------------------------------------------------------------
# q398 — token-budget water-filling
# ---------------------------------------------------------------------------


def _py_waterfill(caps: dict, budget: int):
    """Independent reference: exact rational water-filling with the
    same integer weights and floor division."""
    import math

    w = {s: math.floor(math.sqrt(c) * 1_000_000) for s, c in caps.items()}
    order = sorted(caps, key=lambda s: (caps[s] / w[s], s))
    sat, c_sat = set(), 0
    for i, s in enumerate(order):
        w_suffix = sum(w[t] for t in order[i:])
        if (budget - c_sat) * w[s] >= caps[s] * w_suffix:
            sat.add(s)
            c_sat += caps[s]
        else:
            break  # prefix property
    w_unsat = sum(w[t] for t in caps if t not in sat)
    return {
        s: caps[s] if s in sat else (budget - c_sat) * w[s] // w_unsat
        for s in caps
    }


def test_q398_matches_python_reference_and_invariants(spark):
    from databricks_etl_spark.plans.queries_round11 import (
        q398_token_budget_waterfill,
    )

    rows = q398_token_budget_waterfill(spark, SMOKE_SF_DIR).collect()
    caps = {r.source: r.cap_tokens for r in rows}
    budget = sum(caps.values()) // 2
    want = _py_waterfill(caps, budget)
    got = {r.source: r.alloc_tokens for r in rows}
    assert got == want
    for r in rows:
        assert r.alloc_tokens <= r.cap_tokens
        assert r.saturated == (r.alloc_tokens == r.cap_tokens) or (
            not r.saturated
        )
    n_unsat = sum(1 for r in rows if not r.saturated)
    spent = sum(got.values())
    assert spent <= budget
    assert budget - spent < n_unsat + 1


def test_q398_planted_tiny_source_saturates(spark, tmp_path):
    """sqrt-temperature upweights small sources: a 3-token source next
    to a huge one must SATURATE (alloc == its full capacity) while the
    big source stays level-bound — the branch the uniform testdata
    never exercises."""
    import pandas as pd

    big = " ".join(f"tok{i}" for i in range(400))
    pdf = pd.DataFrame(
        {
            "doc_id": [1, 2, 3],
            "text": ["tiny doc here", big, big],
            "lang": ["en"] * 3,
            "source": ["small", "big", "big"],
            "n_chars": [13, len(big), len(big)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    from databricks_etl_spark.plans.queries_round11 import (
        q398_token_budget_waterfill,
    )

    rows = {
        r.source: r
        for r in q398_token_budget_waterfill(spark, str(tmp_path)).collect()
    }
    assert rows["small"].saturated and not rows["big"].saturated
    assert rows["small"].alloc_tokens == rows["small"].cap_tokens == 3
    assert rows["big"].alloc_tokens < rows["big"].cap_tokens
    budget = (3 + 2 * 400) // 2
    assert rows["small"].alloc_tokens + rows["big"].alloc_tokens <= budget


# ---------------------------------------------------------------------------
# q399 — attrition funnel
# ---------------------------------------------------------------------------


def test_q399_funnel_pins_to_q312_ship_and_is_monotone(spark):
    """Stage-5 survival IS q312's ship verdict (count-identical);
    counts are nonincreasing; per-stage drops reconcile raw ->
    shipped."""
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        _Q399_STAGES,
        q399_attrition_funnel,
    )

    rows = sorted(
        q399_attrition_funnel(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.stage,
    )
    assert [(r.stage, r.stage_name) for r in rows] == list(_Q399_STAGES)
    docs = [r.n_docs for r in rows]
    toks = [r.n_tokens for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert sum(r.n_dropped_here for r in rows) == docs[0] - docs[-1]
    assert rows[0].doc_survival == 1.0 and rows[0].token_survival == 1.0

    man = q312_training_manifest(spark, SMOKE_SF_DIR)
    n_ship = man.filter("ship").count()
    assert rows[-1].n_docs == n_ship
    assert rows[0].n_docs == man.count()


# ---------------------------------------------------------------------------
# q400 — shipping-plan water-fill
# ---------------------------------------------------------------------------


def test_q400_capacities_are_shipped_tokens_and_kernel_shared(spark):
    """q400's capacities equal per-source token sums over exactly
    q312's shipped docs, and its allocation equals the shared Python
    reference on those capacities — the kernel cannot differ from
    q398's."""
    from pyspark.sql import functions as SF

    from databricks_etl_spark.operators.text import tokens_col
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        q400_shipping_plan_waterfill,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = q400_shipping_plan_waterfill(spark, SMOKE_SF_DIR).collect()
    caps = {r.source: r.cap_tokens for r in rows}

    d = read_table(spark, SMOKE_SF_DIR, "documents")
    ship = (
        q312_training_manifest(spark, SMOKE_SF_DIR)
        .filter("ship")
        .select("doc_id")
    )
    want_caps = {
        r.source: r.nt
        for r in d.join(ship, "doc_id")
        .groupBy("source")
        .agg(SF.sum(SF.size(tokens_col("text"))).alias("nt"))
        .collect()
    }
    assert caps == want_caps
    budget = sum(caps.values()) // 2
    assert {r.source: r.alloc_tokens for r in rows} == _py_waterfill(
        caps, budget
    )


# ---------------------------------------------------------------------------
# q401 — per-source attrition breakdown
# ---------------------------------------------------------------------------


def test_q401_rolls_up_to_q399_funnel(spark):
    """Summing the per-source breakdown over sources at each stage
    reproduces q399's corpus funnel exactly; every source emits all
    six stages."""
    from collections import defaultdict

    from databricks_etl_spark.plans.queries_round11 import (
        _Q399_STAGES,
        q399_attrition_funnel,
        q401_attrition_by_source,
    )

    per = q401_attrition_by_source(spark, SMOKE_SF_DIR).collect()
    stages_per_source: dict = defaultdict(set)
    docs = defaultdict(int)
    toks = defaultdict(int)
    for r in per:
        stages_per_source[r.source].add(r.stage)
        docs[r.stage] += r.n_docs
        toks[r.stage] += r.n_tokens
    assert all(
        s == {i for i, _ in _Q399_STAGES}
        for s in stages_per_source.values()
    )
    funnel = q399_attrition_funnel(spark, SMOKE_SF_DIR).collect()
    assert {r.stage: r.n_docs for r in funnel} == dict(docs)
    assert {r.stage: r.n_tokens for r in funnel} == dict(toks)


# ---------------------------------------------------------------------------
# q402 — gate-ablation attribution
# ---------------------------------------------------------------------------


def test_q402_reconciles_with_manifest_and_funnel(spark):
    """Flag counts re-derived in Python from q312's manifest match;
    the distinct-flagged count (NOT the sum of n_flagged — the
    difference is overlap) equals the funnel's total raw->shipped
    drop."""
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        q399_attrition_funnel,
        q402_gate_ablation_attribution,
    )

    got = {
        r.gate: r
        for r in q402_gate_ablation_attribution(spark, SMOKE_SF_DIR).collect()
    }
    assert set(got) == {
        "quality",
        "decontam",
        "semdedup",
        "multimodal",
        "drift",
    }
    man = q312_training_manifest(spark, SMOKE_SF_DIR).collect()
    fails = {
        "quality": lambda r: not r.quality_ok,
        "decontam": lambda r: r.contaminated,
        "semdedup": lambda r: r.sem_dup,
        "multimodal": lambda r: r.multimodal_dup,
        "drift": lambda r: not r.drift_gate_ok,
    }
    for g, pred in fails.items():
        flagged = [r for r in man if pred(r)]
        assert got[g].n_flagged == len(flagged), g
        n_unique = sum(
            1
            for r in flagged
            if sum(p(r) for p in fails.values()) == 1
        )
        assert got[g].n_unique == n_unique, g
        assert got[g].n_unique <= got[g].n_flagged

    n_dropped_distinct = sum(
        1 for r in man if any(p(r) for p in fails.values())
    )
    funnel = sorted(
        q399_attrition_funnel(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.stage,
    )
    assert n_dropped_distinct == funnel[0].n_docs - funnel[-1].n_docs
    assert sum(r.n_flagged for r in got.values()) >= n_dropped_distinct


# ---------------------------------------------------------------------------
# q403 — plan realization
# ---------------------------------------------------------------------------


def test_q403_plan_rows_are_q400_and_arithmetic_consistent(spark):
    """(source, cap, alloc) is row-identical to the registered q400
    (shared kernel + shared pool); rate/realization arithmetic is
    self-consistent; doc-hash sampling never exceeds the pool."""
    from databricks_etl_spark.plans.queries_round11 import (
        _Q403_PPM,
        q400_shipping_plan_waterfill,
        q403_plan_realization,
    )

    rows = q403_plan_realization(spark, SMOKE_SF_DIR).collect()
    plan = {
        r.source: (r.cap_tokens, r.alloc_tokens)
        for r in q400_shipping_plan_waterfill(spark, SMOKE_SF_DIR).collect()
    }
    assert {
        r.source: (r.cap_tokens, r.alloc_tokens) for r in rows
    } == plan
    for r in rows:
        assert r.rate_ppm == r.alloc_tokens * _Q403_PPM // r.cap_tokens
        assert 0 <= r.rate_ppm <= _Q403_PPM
        assert r.realized_tokens <= r.cap_tokens
        if r.rate_ppm == _Q403_PPM:
            assert r.realized_tokens == r.cap_tokens
        want = round(
            (r.realized_tokens - r.alloc_tokens) / r.alloc_tokens, 6
        )
        assert abs(r.rel_error - want) < 1e-9


# ---------------------------------------------------------------------------
# q404 — chunk-grain realization and the grain effect
# ---------------------------------------------------------------------------


def test_q404_reconciles_with_q403_plan(spark):
    """Both grains share the identical plan columns; chunk capacity
    partitions doc capacity exactly (window == stride)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q403_plan_realization,
        q404_plan_realization_chunks,
    )

    a = {
        r.source: r for r in q403_plan_realization(spark, SMOKE_SF_DIR).collect()
    }
    b = {
        r.source: r
        for r in q404_plan_realization_chunks(spark, SMOKE_SF_DIR).collect()
    }
    assert set(a) == set(b)
    for s in a:
        assert (a[s].cap_tokens, a[s].alloc_tokens, a[s].rate_ppm) == (
            b[s].cap_tokens,
            b[s].alloc_tokens,
            b[s].rate_ppm,
        )
        assert b[s].realized_chunks >= a[s].realized_docs * 0  # present
        assert b[s].realized_tokens <= b[s].cap_tokens


def test_q404_planted_long_docs_grain_effect(spark):
    """The grain claim, proven where it applies: one 2048-token doc
    per source at a ~half rate realizes 0%-or-200% of its allocation
    at DOC grain (all-or-nothing), while chunk grain (32 x 64-token
    draws) lands within a tight band — both grains driven through
    the production `_q403_realized` kernel with the production keep
    hash."""
    from pyspark.sql import functions as SF

    from databricks_etl_spark.operators.text import (
        chunk_tokens,
        tokens_col,
    )
    from databricks_etl_spark.plans.queries_round10 import _md5_mod_col
    from databricks_etl_spark.plans.queries_round11 import (
        _Q403_PPM,
        _Q404_W,
        _q398_waterfill,
        _q403_realized,
    )

    text = " ".join(f"w{i}" for i in range(2048))
    docs = spark.createDataFrame(
        [(i, text, f"s{i}") for i in range(1, 5)],
        ["doc_id", "text", "source"],
    )
    shp = docs.select(
        "doc_id",
        "source",
        "text",
        SF.size(tokens_col("text")).cast("long").alias("nt"),
    ).localCheckpoint()
    cap = shp.groupBy("source").agg(
        SF.sum("nt").cast("long").alias("cap_tokens")
    )
    pl = _q398_waterfill(cap).select(
        "source",
        "cap_tokens",
        "alloc_tokens",
        SF.expr(f"(alloc_tokens * {_Q403_PPM}) DIV cap_tokens").alias(
            "rate_ppm"
        ),
    )
    doc_units = shp.withColumn(
        "__k",
        _md5_mod_col(
            SF.concat(SF.lit("alloc:"), SF.col("doc_id").cast("string"))
        )
        % _Q403_PPM,
    )
    chunk_units = (
        chunk_tokens(shp.select("doc_id", "text"), _Q404_W, _Q404_W)
        .join(shp.select("doc_id", "source"), "doc_id")
        .select(
            "source",
            SF.col("n_chunk_tokens").cast("long").alias("nt"),
            (
                _md5_mod_col(
                    SF.concat(
                        SF.lit("alloc:"),
                        SF.col("doc_id").cast("string"),
                        SF.lit(":"),
                        SF.col("chunk_idx").cast("string"),
                    )
                )
                % _Q403_PPM
            ).alias("__k"),
        )
    )
    doc_err = [
        abs(r.rel_error)
        for r in _q403_realized(doc_units, pl, "realized_docs").collect()
    ]
    chunk_err = [
        abs(r.rel_error)
        for r in _q403_realized(
            chunk_units, pl, "realized_chunks"
        ).collect()
    ]
    # doc grain: each single-doc source realizes 0 or its whole
    # capacity (~2x the half-budget alloc) — |err| ~= 1 either way
    assert all(e > 0.8 for e in doc_err)
    # chunk grain: 32 draws per source concentrate near the rate
    assert sum(chunk_err) / len(chunk_err) < 0.5
    assert sum(chunk_err) / len(chunk_err) < sum(doc_err) / len(doc_err)


# ---------------------------------------------------------------------------
# q405 — impact-ordered BM25 pruning
# ---------------------------------------------------------------------------


def test_q405_full_level_exact_and_shares(spark):
    from databricks_etl_spark.plans.queries_round11 import (
        _Q405_LEVELS,
        q405_bm25_impact_pruning,
    )

    rows = sorted(
        q405_bm25_impact_pruning(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.lvl,
    )
    assert [r.lvl for r in rows] == list(_Q405_LEVELS)
    assert rows[-1].overlap_at_10 == 1.0
    assert rows[-1].kept_postings == rows[-1].total_postings
    kept = [r.kept_postings for r in rows]
    assert kept == sorted(kept)
    for r in rows:
        # ceil cutoff: retained share always >= the nominal level
        assert r.retained_share >= r.lvl / 100.0 - 1e-9


def test_q405_planted_broad_match_lost_to_pruning(spark, tmp_path):
    """A doc matching all 4 query terms ONCE each tops the full
    ranking (4 unsaturated contributions beat any single saturated
    one) but every one of its postings ranks below the 25% cutoff —
    impact pruning drops it and overlap@10 falls below 1.0. The
    failure mode impact-ordered indexes are known for, planted."""
    import pandas as pd

    from databricks_etl_spark.plans.queries_round11 import (
        q405_bm25_impact_pruning,
    )

    terms = ["data", "model", "training", "quality"]
    docs = []
    did = 0
    for t in terms:
        for tf in (16, 15, 14, 13, 12, 11, 2, 2):
            did += 1
            toks = [t] * tf + [f"f{did}x{i}" for i in range(64 - tf)]
            docs.append((did, " ".join(toks)))
    did += 1
    toks = terms + [f"f{did}x{i}" for i in range(60)]
    docs.append((did, " ".join(toks)))  # the broad match
    pdf = pd.DataFrame(
        {
            "doc_id": [d for d, _ in docs],
            "text": [t for _, t in docs],
            "lang": ["en"] * len(docs),
            "source": ["s"] * len(docs),
            "n_chars": [len(t) for _, t in docs],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.lvl: r
        for r in q405_bm25_impact_pruning(spark, str(tmp_path)).collect()
    }
    assert rows[100].overlap_at_10 == 1.0
    assert rows[25].overlap_at_10 < 1.0


# ---------------------------------------------------------------------------
# q406 — sampled-truth nDCG twin
# ---------------------------------------------------------------------------


def test_q406_keeps_q396_invariants_on_the_slice(spark):
    from databricks_etl_spark.plans.queries_round10 import (
        _Q332_K,
        _Q341_PROBES,
    )
    from databricks_etl_spark.plans.queries_round11 import (
        q396_ivf_ndcg_sweep,
        q406_ivf_ndcg_sweep_sampled,
    )

    got = sorted(
        q406_ivf_ndcg_sweep_sampled(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.n_probe,
    )
    full = sorted(
        q396_ivf_ndcg_sweep(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.n_probe,
    )
    assert [r.n_probe for r in got] == list(_Q341_PROBES)
    assert [r.n_queries for r in got] == [r.n_queries for r in full]
    curve = [r.mean_ndcg_at_10 for r in got]
    assert curve == sorted(curve)
    assert got[-1].n_probe == _Q332_K
    assert got[-1].mean_ndcg_at_10 == 1.0


# ---------------------------------------------------------------------------
# q407 — streaming plan realization
# ---------------------------------------------------------------------------


def test_q407_slicing_invariance_and_replay(spark, tmp_path):
    """The streaming drain equals batch q403 under a FORCED two-epoch
    slicing of the document stream, and re-delivering an epoch leaves
    the drained report unchanged (partials overwrite their own
    partition: exactly-once)."""
    from databricks_etl_spark.plans.queries_round11 import (
        _q403_pool_plan,
        q403_plan_realization,
    )
    from databricks_etl_spark.sources.readers import read_table
    from databricks_etl_spark.streaming.planrealize import (
        _PARTIAL_SCHEMA,
        drain_plan_realization,
        make_realize_epoch,
    )

    shp, pl = _q403_pool_plan(spark, SMOKE_SF_DIR)
    pl = pl.localCheckpoint()
    ship_ids = shp.select("doc_id")
    rates = pl.select("source", "rate_ppm")

    d = read_table(spark, SMOKE_SF_DIR, "documents")
    path = str(tmp_path / "planrealize_partials")
    spark.createDataFrame([], _PARTIAL_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("__epoch").parquet(path)

    ingest = make_realize_epoch(path, ship_ids, rates)
    ingest(d.filter(F.col("doc_id") % 2 == 0), 0)
    ingest(d.filter(F.col("doc_id") % 2 == 1), 1)

    def drained():
        return sorted(
            map(
                tuple,
                drain_plan_realization(spark, path, pl).collect(),
            )
        )

    first = drained()
    batch = sorted(
        map(tuple, q403_plan_realization(spark, SMOKE_SF_DIR).collect())
    )
    assert first == batch
    assert sum(r[4] for r in first) > 0  # realized docs present

    ingest(d.filter(F.col("doc_id") % 2 == 1), 1)  # epoch-1 re-delivery
    assert drained() == first


# ---------------------------------------------------------------------------
# q408 — shipping-plan gate
# ---------------------------------------------------------------------------


def test_q408_releases_and_planted_violations_flip(spark):
    """RELEASE at production thresholds on the shipped corpus; each
    knob flipped through the kwarg surface turns the verdict and
    increments exactly its own violation counter."""
    from databricks_etl_spark.plans.queries_round11 import shipping_gate

    base = shipping_gate(spark, SMOKE_SF_DIR).collect()[0]
    assert base.verdict == "RELEASE" and base.n_violations == 0
    assert (base.n_stages, base.n_levels) == (6, 4)
    assert base.n_sources > 0

    flips = [
        ({"min_survival": 1.01}, "viol_survival"),
        ({"max_abs_err": -0.01}, "viol_realization"),
        ({"min_overlap": 1.01}, "viol_pruning"),
    ]
    for kw, col in flips:
        r = shipping_gate(spark, SMOKE_SF_DIR, **kw).collect()[0]
        assert r.verdict == "HOLD", kw
        assert getattr(r, col) > 0, kw
        others = {
            "viol_survival",
            "viol_realization",
            "viol_pruning",
            "viol_infeasible",
        } - {col}
        assert all(getattr(r, c) == 0 for c in others), kw


def test_q398_waterfill_property_random_capacities(spark):
    """The closed-form windowed kernel equals the explicit iterative
    reference on random skewed capacity profiles — including
    multi-source saturation prefixes the uniform testdata never
    produces — and always spends within the floor-division bound of
    the budget."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databricks_etl_spark.plans.queries_round11 import _q398_waterfill

    @settings(max_examples=8, deadline=None)
    @given(
        caps=st.lists(
            st.integers(min_value=1, max_value=100_000),
            min_size=1,
            max_size=6,
        )
    )
    def check(caps):
        named = {f"s{i}": c for i, c in enumerate(caps)}
        cap_df = spark.createDataFrame(
            list(named.items()), "source string, cap_tokens long"
        )
        rows = _q398_waterfill(cap_df).collect()
        budget = sum(named.values()) // 2
        want = _py_waterfill(named, budget)
        got = {r.source: r.alloc_tokens for r in rows}
        assert got == want, (named, budget)
        spent = sum(got.values())
        n_unsat = sum(1 for r in rows if not r.saturated)
        assert spent <= budget
        assert budget - spent < n_unsat + 1

    check()


# ---------------------------------------------------------------------------
# q409 — floored water-fill
# ---------------------------------------------------------------------------


def test_q409_bounds_budget_and_python_reference(spark):
    """Every allocation lands in [floor, cap]; spending stays within
    the floor-division bound of the budget; and the residual fill
    equals the iterative reference on the residual capacities."""
    from databricks_etl_spark.plans.queries_round11 import (
        q409_floored_waterfill,
    )

    rows = q409_floored_waterfill(spark, SMOKE_SF_DIR).collect()
    assert rows
    budget = sum(r.cap_tokens for r in rows) // 2
    floors = {r.source: r.cap_tokens // 10 for r in rows}
    res_caps = {r.source: r.cap_tokens - floors[r.source] for r in rows}
    want = _py_waterfill(res_caps, budget - sum(floors.values()))
    for r in rows:
        assert floors[r.source] <= r.alloc_tokens <= r.cap_tokens
        assert r.alloc_tokens == floors[r.source] + want[r.source]
    spent = sum(r.alloc_tokens for r in rows)
    n_unsat = sum(1 for r in rows if not r.saturated)
    assert spent <= budget
    assert budget - spent < n_unsat + 1


def test_q409_planted_giant_cannot_starve_tiny_floor(spark, tmp_path):
    """A giant source next to a tiny one: the unfloored plan gives
    the tiny source whatever the level says, the floored plan never
    hands it less than its 10% quota — and the giant's allocation
    shrinks to pay for it."""
    import pandas as pd

    from databricks_etl_spark.plans.queries_round11 import (
        q398_token_budget_waterfill,
        q409_floored_waterfill,
    )

    big = " ".join(f"tok{i}" for i in range(800))
    tiny = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, 12)),
            "text": [big] * 10 + [tiny],
            "lang": ["en"] * 11,
            "source": ["big"] * 10 + ["tiny"],
            "n_chars": [len(big)] * 10 + [len(tiny)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    flo = {
        r.source: r
        for r in q409_floored_waterfill(spark, str(tmp_path)).collect()
    }
    base = {
        r.source: r
        for r in q398_token_budget_waterfill(
            spark, str(tmp_path)
        ).collect()
    }
    assert flo["tiny"].floor_tokens == 1  # 10 tokens // 10
    assert flo["tiny"].alloc_tokens >= flo["tiny"].floor_tokens
    # floors redirect budget: the giant pays for every quota
    assert flo["big"].alloc_tokens <= base["big"].alloc_tokens
    b = (8000 + 10) // 2
    assert (
        sum(r.alloc_tokens for r in flo.values()) <= b
    )


# ---------------------------------------------------------------------------
# q410 — repeat-factor planner
# ---------------------------------------------------------------------------


def test_q410_budget_is_one_pass_and_temperature_direction(spark):
    """Total planned tokens stay within one corpus pass; on the
    (near-uniform) corpus the smallest source plans the highest
    repeat factor and the largest the lowest (the sqrt-temperature
    direction)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q410_repeat_factor_plan,
    )

    rows = q410_repeat_factor_plan(spark, SMOKE_SF_DIR).collect()
    total = sum(r.corpus_tokens for r in rows)
    spent = sum(r.alloc_tokens for r in rows)
    assert spent <= total // 4 * 4 // 4 + total  # sanity: bounded
    assert spent <= total  # one-pass budget (floor-division slack)
    by_size = sorted(rows, key=lambda r: r.corpus_tokens)
    assert by_size[0].epochs >= by_size[-1].epochs
    for r in rows:
        assert r.epochs <= 4.0 + 1e-9


def test_q410_planted_tiny_source_repeats_giant_subsampled(spark, tmp_path):
    """A tiny source next to a giant one plans MULTIPLE epochs (up to
    the 4x ceiling) while the giant trains on a fraction of one —
    the upsampling behavior the unfloored single-pass plan cannot
    express."""
    import pandas as pd

    from databricks_etl_spark.plans.queries_round11 import (
        q410_repeat_factor_plan,
    )

    big = " ".join(f"tok{i}" for i in range(900))
    tiny = "alpha beta gamma delta epsilon zeta eta theta"
    pdf = pd.DataFrame(
        {
            "doc_id": list(range(1, 13)),
            "text": [big] * 11 + [tiny],
            "lang": ["en"] * 12,
            "source": ["big"] * 11 + ["tiny"],
            "n_chars": [len(big)] * 11 + [len(tiny)],
        }
    )
    pdf.to_parquet(tmp_path / "documents.parquet")
    rows = {
        r.source: r
        for r in q410_repeat_factor_plan(spark, str(tmp_path)).collect()
    }
    assert rows["tiny"].epochs > 1.0
    assert rows["big"].epochs < 1.0
    assert rows["tiny"].epochs <= 4.0
    if rows["tiny"].saturated:
        assert rows["tiny"].epochs == 4.0


# ---------------------------------------------------------------------------
# q411 — weighted sampling without replacement
# ---------------------------------------------------------------------------


def test_q411_matches_python_aes_reference(spark):
    """The selected set and ranks equal a pure-Python A-ES reference
    (same md5-mod uniform, same 9dp-rounded ln(u)/w key), keys are
    negative and monotone in rank, and the draw is deterministic
    across invocations."""
    import hashlib
    import math

    from databricks_etl_spark.operators.text import quality_features
    from databricks_etl_spark.plans.queries_round11 import (
        _Q411_K,
        _Q411_MOD,
        q411_weighted_sample_noreplace,
    )
    from databricks_etl_spark.sources.readers import read_table

    rows = sorted(
        q411_weighted_sample_noreplace(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert len(rows) == _Q411_K
    assert [r.rank for r in rows] == list(range(1, _Q411_K + 1))
    keys = [r.sample_key for r in rows]
    assert all(k <= 0 for k in keys)
    assert keys == sorted(keys, reverse=True)

    d = read_table(spark, SMOKE_SF_DIR, "documents")
    qf = {
        r.doc_id: r.quality_score
        for r in quality_features(d).select(
            "doc_id", "quality_score"
        ).collect()
    }
    ref = []
    for doc_id, qs in qf.items():
        w = int(qs * 4 + 1)
        h = hashlib.md5(f"wsample:{doc_id}".encode()).hexdigest()
        u = (int(h[:12], 16) % _Q411_MOD + 1.0) / (_Q411_MOD + 1.0)
        ref.append((round(math.log(u) / w, 9), doc_id, w))
    ref.sort(key=lambda t: (-t[0], t[1]))
    want = [(d_, w_) for _, d_, w_ in ref[:_Q411_K]]
    assert [(r.doc_id, r.weight) for r in rows] == want

    again = sorted(
        q411_weighted_sample_noreplace(spark, SMOKE_SF_DIR).collect(),
        key=lambda r: r.rank,
    )
    assert [tuple(r) for r in again] == [tuple(r) for r in rows]


# ---------------------------------------------------------------------------
# q412 — JL distortion audit
# ---------------------------------------------------------------------------


def test_q412_matches_numpy_reference(spark):
    """The distortion envelope equals a numpy reference computing the
    same literal-matrix projection over the same md5 slice (tolerance
    only for summation-order ulps under the 6dp rounds)."""
    import hashlib

    import numpy as np

    from databricks_etl_spark.plans.queries_round11 import (
        _Q412_BAND,
        _Q412_K,
        _Q412_S,
        q412_jl_distortion_audit,
    )
    from databricks_etl_spark.sources.readers import read_table

    got = q412_jl_distortion_audit(spark, SMOKE_SF_DIR).collect()[0]

    vecs = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in read_table(spark, SMOKE_SF_DIR, "embeddings").collect()
        if hashlib.md5(f"jl:{r.vec_id}".encode()).hexdigest()[0] == "0"
    }
    assert got.n_vecs == len(vecs)
    S = np.array(_Q412_S, dtype=np.float64)
    ys = {k: S @ v / np.sqrt(_Q412_K) for k, v in vecs.items()}
    ids = sorted(vecs)
    ratios = []
    for i, va in enumerate(ids):
        for vb in ids[i + 1 :]:
            d2 = float(np.sum((vecs[va] - vecs[vb]) ** 2))
            if d2 > 0:
                p2 = float(np.sum((ys[va] - ys[vb]) ** 2))
                ratios.append(round(p2 / d2, 6))
    assert got.n_pairs == len(ratios)
    assert abs(got.mean_ratio - round(sum(ratios) / len(ratios), 6)) < 1e-4
    assert abs(got.min_ratio - min(ratios)) < 1e-4
    assert abs(got.max_ratio - max(ratios)) < 1e-4
    share = sum(1 for r in ratios if abs(r - 1.0) <= _Q412_BAND) / len(
        ratios
    )
    assert abs(got.share_in_band - round(share, 6)) < 1e-4


# ---------------------------------------------------------------------------
# q413 — compressed-vector retrieval recall
# ---------------------------------------------------------------------------


def test_q413_discriminates_structured_from_isotropic(spark, tmp_path):
    """On well-separated clusters the 16-dim projection preserves the
    top-10 (recall high); on the near-isotropic testdata it cannot
    (recall low) — the go/no-go discriminates instead of flattering."""
    import numpy as np
    import pandas as pd

    from databricks_etl_spark.plans.queries_round11 import (
        q413_jl_retrieval_recall,
    )

    rng = np.random.default_rng(7)
    bases = rng.normal(0, 10.0, size=(4, 64))
    rows = []
    for vid in range(48):
        c = vid % 4
        rows.append(
            (
                vid,
                (bases[c] + rng.normal(0, 0.05, size=64)).astype(
                    "float32"
                ).tolist(),
                c,
            )
        )
    pd.DataFrame(rows, columns=["vec_id", "embedding", "label"]).to_parquet(
        tmp_path / "embeddings.parquet"
    )
    got = q413_jl_retrieval_recall(spark, str(tmp_path)).collect()[0]
    assert got.n_queries == 20
    assert got.mean_recall_at_10 >= 0.8

    iso = q413_jl_retrieval_recall(spark, SMOKE_SF_DIR).collect()[0]
    assert iso.n_queries == 20
    assert iso.mean_recall_at_10 < got.mean_recall_at_10


# ---------------------------------------------------------------------------
# q414/q415 — interleave + batch-mixing kernels on planted streams
# ---------------------------------------------------------------------------


def test_q414_blocked_vs_alternating_streams(spark):
    """AAAABBBB is one run per source with three self-adjacencies each;
    ABABABAB is four runs per source with zero — the kernel must tell
    them apart (that's the audit's whole job)."""
    from databricks_etl_spark.plans.queries_round11 import _interleave_audit

    def steps(srcs):
        return spark.createDataFrame(
            [(1, i + 1, s) for i, s in enumerate(srcs)],
            "epoch long, step long, source string",
        )

    blocked = {
        r["source"]: r
        for r in _interleave_audit(steps("AAAABBBB")).collect()
    }
    assert blocked["A"]["n_runs"] == 1 and blocked["B"]["n_runs"] == 1
    assert blocked["A"]["self_adj_pairs"] == 3
    assert blocked["A"]["mean_run_len"] == 4.0
    # share^2 * pairs = 0.25 * 7 = 1.75; 3 observed → clumping > 1
    assert blocked["A"]["clumping_ratio"] > 1.5

    alt = {
        r["source"]: r
        for r in _interleave_audit(steps("ABABABAB")).collect()
    }
    assert alt["A"]["n_runs"] == 4 and alt["A"]["self_adj_pairs"] == 0
    assert alt["A"]["mean_run_len"] == 1.0
    assert alt["A"]["clumping_ratio"] == 0.0


def test_q415_single_source_batch_flags_low_mixing(spark):
    """A batch served entirely from one source has entropy 0 and trips
    the dominance alarm; a 50/50 batch sits at ln 2 and does not."""
    import math

    from databricks_etl_spark.plans.queries_round11 import _batch_mixing

    # one epoch, 4 steps/batch: batch 0 all src A, batch 1 even A/B
    rows = [(1, s, s) for s in range(1, 9)]  # doc_id == step
    ordr = spark.createDataFrame(
        rows, "epoch long, step long, doc_id long"
    )
    lens = spark.createDataFrame(
        [(d, "A" if d <= 4 or d % 2 == 1 else "B", 10) for d in range(1, 9)],
        "doc_id long, source string, len long",
    )
    out = {
        r["batch"]: r for r in _batch_mixing(ordr, lens, 4).collect()
    }
    assert out[0]["entropy_nats"] == 0.0 and out[0]["low_mixing"]
    assert out[0]["top_share"] == 1.0 and out[0]["top_source"] == "A"
    assert abs(out[1]["entropy_nats"] - math.log(2.0)) < 1e-6
    assert not out[1]["low_mixing"]


def test_q416_spacing_consistent_per_eclass(spark):
    """Every eclass-e sequence replays once per epoch 1..e, so each
    consecutive-epoch pair row of one eclass covers the SAME sequence
    population, and gaps are positive on the global axis."""
    from databricks_etl_spark.plans.queries_round11 import (
        q416_replay_spacing_audit,
    )

    rows = q416_replay_spacing_audit(spark, SMOKE_SF_DIR).collect()
    assert rows, "multi-epoch eclasses exist at the smoke scale"
    by_ec = {}
    for r in rows:
        assert r["epoch_to"] == r["epoch_from"] + 1
        assert 0 < r["min_gap"] <= r["mean_gap"] <= r["max_gap"]
        by_ec.setdefault(r["eclass"], set()).add(r["n_seqs"])
        assert r["epoch_from"] < r["eclass"]
    for ec, ns in by_ec.items():
        assert len(ns) == 1, f"eclass {ec} pair rows disagree on n_seqs"


def test_q417_plan_partitions_days_and_bounds_overflow(spark):
    """The compaction plan must cover every daily file exactly once,
    keep splits time-contiguous (split ranges ordered by split_id,
    non-overlapping), and overflow the row target by less than one
    file (floor-binning never splits a file)."""
    from databricks_etl_spark.plans.queries_round11 import (
        _Q417_TGT,
        q417_compaction_plan,
    )
    from databricks_etl_spark.sources.readers import read_table

    e = read_table(spark, SMOKE_SF_DIR, "events").select(
        "event_type", F.to_date("ts").alias("d")
    )
    daily = e.groupBy("event_type", "d").count().collect()
    n_days = {}
    max_file = {}
    for r in daily:
        n_days[r["event_type"]] = n_days.get(r["event_type"], 0) + 1
        max_file[r["event_type"]] = max(
            max_file.get(r["event_type"], 0), r["count"]
        )

    plan = q417_compaction_plan(spark, SMOKE_SF_DIR).collect()
    got_files = {}
    for r in plan:
        et = r["event_type"]
        got_files[et] = got_files.get(et, 0) + r["n_files"]
        assert r["split_rows"] < _Q417_TGT + max_file[et]
        assert r["over_target"] == (r["split_rows"] > _Q417_TGT)
        assert r["first_day"] <= r["last_day"]
    assert got_files == n_days
    for et in n_days:
        spl = sorted(
            (r for r in plan if r["event_type"] == et),
            key=lambda r: r["split_id"],
        )
        for a, b in zip(spl, spl[1:]):
            assert a["last_day"] < b["first_day"], "splits overlap"


# ---------------------------------------------------------------------------
# q418 — dataloader gate: planted violations flip, empty stream holds
# ---------------------------------------------------------------------------


def _planted_stream(spark, *, epochs=2):
    """Adversarial stream: 8 one-doc steps per epoch, AAAA then BBBB,
    IDENTICAL order every epoch — blocked batches AND perfectly
    correlated replays."""
    rows = [
        (e, s, s, s) for e in range(1, epochs + 1) for s in range(1, 9)
    ]
    ordr = spark.createDataFrame(
        rows, "epoch long, step long, seq_id long, doc_id long"
    )
    lens = spark.createDataFrame(
        [(d, "A" if d <= 4 else "B", 10) for d in range(1, 9)],
        "doc_id long, source string, len long",
    )
    return ordr, lens


def test_q418_ships_production_and_holds_planted(spark):
    from databricks_etl_spark.plans.queries_round11 import (
        _q418_gate,
        q418_dataloader_gate,
    )

    prod = q418_dataloader_gate(spark, SMOKE_SF_DIR).collect()[0]
    assert prod["verdict"] == "SHIP" and prod["check_decorrelation"]

    ordr, lens = _planted_stream(spark)
    bad = _q418_gate(ordr, lens).collect()[0]
    # identical epoch orders → corr 1.0; two-source blocked batch → ln 2
    assert not bad["check_decorrelation"]
    assert bad["max_abs_step_corr"] == 1.0
    assert not bad["check_mixing"]
    assert bad["verdict"] == "HOLD"


def test_q418_each_knob_flips_alone(spark):
    """One threshold at a time, against the healthy production stream
    (the q386 discipline: every planted violation isolates its
    check)."""
    from databricks_etl_spark.plans.queries_round11 import (
        _capped_doc_lens,
        _q418_gate,
        q326_order_checkpointed,
    )

    ordr = q326_order_checkpointed(spark, SMOKE_SF_DIR)
    lens = _capped_doc_lens(spark, SMOKE_SF_DIR)
    base = _q418_gate(ordr, lens).collect()[0]
    assert base["verdict"] == "SHIP"

    r = _q418_gate(ordr, lens, min_entropy=99.0).collect()[0]
    assert not r["check_mixing"] and r["verdict"] == "HOLD"
    assert r["check_clumping"] and r["check_decorrelation"]

    r = _q418_gate(ordr, lens, max_clump=0.0).collect()[0]
    assert not r["check_clumping"] and r["verdict"] == "HOLD"
    assert r["check_mixing"] and r["check_decorrelation"]

    r = _q418_gate(ordr, lens, max_corr=0.0).collect()[0]
    assert not r["check_decorrelation"] and r["verdict"] == "HOLD"


def test_q418_empty_stream_holds(spark):
    from databricks_etl_spark.plans.queries_round11 import _q418_gate

    ordr = spark.createDataFrame(
        [], "epoch long, step long, seq_id long, doc_id long"
    )
    lens = spark.createDataFrame([], "doc_id long, source string, len long")
    r = _q418_gate(ordr, lens).collect()[0]
    assert r["verdict"] == "HOLD"
    assert not r["check_nonempty"]
    assert not r["check_mixing"] and not r["check_clumping"]


# ---------------------------------------------------------------------------
# q419/q420/q421 — compaction tradeoff, incremental and streaming twins
# ---------------------------------------------------------------------------


def test_q419_tradeoff_bounds(spark):
    """Zone-pruned scans of the compacted layout can only over-read
    (amplification >= 1) and compaction can only reduce touched file
    handles — both directions of the tradeoff bounded row by row."""
    from databricks_etl_spark.plans.queries_round11 import (
        q419_compaction_pruning_tradeoff,
    )

    rows = q419_compaction_pruning_tradeoff(spark, SMOKE_SF_DIR).collect()
    assert rows
    seen = set()
    for r in rows:
        seen.add(r["window_id"])
        assert r["rows_scanned_after"] >= r["rows_useful"]
        assert r["read_amplification"] >= 1.0
        assert r["n_splits_after"] <= r["n_files_before"]
        assert 0.0 <= r["files_saved_share"] < 1.0
    assert seen == {1, 2, 3, 4}


def test_q420_untouched_splits_byte_identical(spark):
    """Splits that receive no delta day must replay the persisted
    plan's rows verbatim — the incremental path never rewrites
    history (the q343 untouched-shard pin, at the layout grain)."""
    from databricks_etl_spark.plans.queries_round11 import (
        _q420_parts,
        q420_incremental_compaction,
    )
    from tests.conftest import PARITY_SF_DIR

    # sf0.01: ~2000 rows/type → ~8 splits, so pre-cutoff splits exist
    # (at sf0.001 every type fits ONE split and everything is touched)
    out = q420_incremental_compaction(spark, PARITY_SF_DIR).collect()
    persisted = {
        (r["event_type"], r["split_id"]): r
        for r in _q420_parts(spark, PARITY_SF_DIR)["persisted"].collect()
    }
    untouched = [r for r in out if not r["split_touched"]]
    assert untouched and any(r["split_touched"] for r in out)
    for r in untouched:
        p = persisted[(r["event_type"], r["split_id"])]
        assert (
            r["n_files"],
            r["split_rows"],
            r["first_day"],
            r["last_day"],
            r["over_target"],
        ) == (
            p["n_files"],
            p["split_rows"],
            p["first_day"],
            p["last_day"],
            p["over_target"],
        )


def test_q421_slicing_invariance_and_replay(spark, tmp_path):
    """The streaming drain equals batch q417 under a FORCED two-epoch
    slicing of the event stream, and re-delivering an epoch leaves the
    drained manifest unchanged (exactly-once partials)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q417_compaction_plan,
    )
    from databricks_etl_spark.sources.readers import read_table
    from databricks_etl_spark.streaming.compaction import (
        _PARTIAL_SCHEMA,
        drain_compaction_plan,
        make_compaction_epoch,
    )

    e = read_table(spark, SMOKE_SF_DIR, "events")
    path = str(tmp_path / "compaction_partials")
    spark.createDataFrame([], _PARTIAL_SCHEMA).write.mode(
        "overwrite"
    ).partitionBy("__epoch").parquet(path)

    ingest = make_compaction_epoch(path)
    ingest(e.filter(F.col("event_id") % 2 == 0), 0)
    ingest(e.filter(F.col("event_id") % 2 == 1), 1)

    def drained():
        return sorted(
            map(tuple, drain_compaction_plan(spark, path).collect())
        )

    first = drained()
    batch = sorted(
        map(tuple, q417_compaction_plan(spark, SMOKE_SF_DIR).collect())
    )
    assert first == batch
    ingest(e.filter(F.col("event_id") % 2 == 1), 1)  # replay epoch 1
    assert drained() == first


# ---------------------------------------------------------------------------
# q422/q423 — rewrite blast radius and dup-exposure invariants
# ---------------------------------------------------------------------------


def test_q422_alignment_bounds_blast_radius(spark):
    """Week-aligned binning must never rewrite MORE than global
    floor-binning, costs extra splits (boundary breaks), and its
    blast radius is bounded by one week's splits; global rewrites
    shrink monotonically as the late day moves later."""
    from databricks_etl_spark.plans.queries_round11 import (
        q422_late_data_rewrite_cost,
    )

    rows = q422_late_data_rewrite_cost(spark, SMOKE_SF_DIR).collect()
    assert rows
    by_et = {}
    for r in rows:
        assert r["n_splits_aligned"] >= r["n_splits_global"]
        assert r["rewrite_share_aligned"] <= r["rewrite_share_global"]
        assert r["n_rewritten_aligned"] <= r["n_splits_aligned"]
        by_et.setdefault(r["event_type"], []).append(
            (r["late_day"], r["n_rewritten_global"])
        )
    for et, seq in by_et.items():
        seq.sort()
        rewrites = [n for _, n in seq]
        assert rewrites == sorted(rewrites, reverse=True), (
            f"{et}: later late-days must rewrite fewer global splits"
        )


def test_q423_exposure_nonvacuous_and_bounded(spark):
    """The shipped pool DOES contain q123 near-dup cluster pairs (the
    gate prunes semantic dups, not text-Jaccard clusters), so the
    audit must report pairs; shares and distances obey their
    definitions (dist 0 = both docs packed into one sequence)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q423_dup_exposure_audit,
    )
    from tests.conftest import PARITY_SF_DIR

    rows = q423_dup_exposure_audit(spark, PARITY_SF_DIR).collect()
    assert rows, "sf0.01 ships a 16-member Jaccard cluster"
    for r in rows:
        assert 0 < r["n_pairs"]
        assert 0 <= r["n_close_pairs"] <= r["n_pairs"]
        assert 0.0 <= r["close_share"] <= 1.0
        assert 0 <= r["min_dist"] <= r["mean_dist"]


# ---------------------------------------------------------------------------
# q424 — IVF rebalance: conservation, neutrality, planted hot cell
# ---------------------------------------------------------------------------


def test_q424_conserves_vectors_and_splits_above_target(spark):
    from databricks_etl_spark.plans.queries_round11 import (
        _Q424_CELLS,
        q424_ivf_cell_rebalance,
    )
    from databricks_etl_spark.sources.readers import read_table
    from tests.conftest import PARITY_SF_DIR

    n_vecs = read_table(spark, PARITY_SF_DIR, "embeddings").count()
    s = -(-n_vecs // _Q424_CELLS)
    rows = q424_ivf_cell_rebalance(spark, PARITY_SF_DIR).collect()
    assert sum(r["n_vectors"] for r in rows) == n_vecs
    by_cell = {}
    for r in rows:
        by_cell.setdefault(r["cell_id"], []).append(r)
    for cell, subs in by_cell.items():
        n_cell = sum(r["n_vectors"] for r in subs)
        want = -(-n_cell // s)
        assert len(subs) == want, (cell, len(subs), want)
        assert all(r["was_split"] == (want > 1) for r in subs)
        assert sorted(r["subcell_id"] for r in subs) == list(range(want))


def test_q424_planted_hot_cell_splits_bounded(spark):
    """A 100x-hot cell (vectors planted AT centroid 0) must split into
    ceil(n/S) subcells whose sizes stay near S — the manifest a
    serving tier can actually open one bounded task per file for."""
    from databricks_etl_spark.plans.queries_round7 import _Q285_CENTS
    from databricks_etl_spark.plans.queries_round11 import _q424_rebalance

    hot = 400
    c0 = list(_Q285_CENTS[0])
    rows = [(i, c0) for i in range(hot)]
    # a handful of cold vectors at the other centroids
    rows += [(1000 + j, list(_Q285_CENTS[j])) for j in range(1, 8)]
    vecs = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>"
    )
    out = _q424_rebalance(vecs).collect()
    n = hot + 7
    s = -(-n // 8)  # ceil(407/8) = 51
    hot_subs = [r for r in out if r["cell_id"] == 0]
    assert len(hot_subs) == -(-hot // s)
    assert all(r["was_split"] for r in hot_subs)
    assert sum(r["n_vectors"] for r in hot_subs) == hot
    assert max(r["n_vectors"] for r in hot_subs) < 3 * s
    cold = [r for r in out if r["cell_id"] != 0]
    assert all(not r["was_split"] and r["subcell_id"] == 0 for r in cold)


# ---------------------------------------------------------------------------
# q425 — layout gate: discriminates by scale, knobs flip alone
# ---------------------------------------------------------------------------


def test_q425_ships_parity_holds_smoke(spark):
    """sf0.01 ships with margins; sf0.001's one-split-per-type layout
    pays ~99x day-query amplification and must HOLD — the gate's
    whole value is that it can say 'do not compact yet'."""
    from databricks_etl_spark.plans.queries_round11 import q425_layout_gate
    from tests.conftest import PARITY_SF_DIR

    ok = q425_layout_gate(spark, PARITY_SF_DIR).collect()[0]
    assert ok["verdict"] == "SHIP"
    assert ok["check_overflow"] and ok["check_amplification"]

    tiny = q425_layout_gate(spark, SMOKE_SF_DIR).collect()[0]
    assert tiny["verdict"] == "HOLD"
    assert not tiny["check_amplification"]
    assert tiny["max_read_amplification"] > 50
    assert tiny["check_overflow"] and tiny["check_rewrite"]


def test_q425_each_knob_flips_alone(spark):
    from databricks_etl_spark.plans.queries_round11 import (
        _daily_files,
        _q425_gate,
    )
    from tests.conftest import PARITY_SF_DIR

    files = _daily_files(spark, PARITY_SF_DIR)
    r = _q425_gate(spark, files, max_overflow=0.0).collect()[0]
    assert not r["check_overflow"] and r["verdict"] == "HOLD"
    assert r["check_amplification"] and r["check_rewrite"]

    r = _q425_gate(spark, files, max_amp=1.0).collect()[0]
    assert not r["check_amplification"] and r["verdict"] == "HOLD"
    assert r["check_overflow"] and r["check_rewrite"]

    r = _q425_gate(spark, files, max_rewrite=0.0).collect()[0]
    assert not r["check_rewrite"] and r["verdict"] == "HOLD"


def test_q425_empty_layout_holds(spark):
    from databricks_etl_spark.plans.queries_round11 import _q425_gate

    files = spark.createDataFrame(
        [], "event_type string, d date, rws long"
    )
    r = _q425_gate(spark, files).collect()[0]
    assert r["verdict"] == "HOLD" and not r["check_nonempty"]
    assert not r["check_overflow"]


def test_q426_datasheet_consistent_with_components(spark):
    """Every datasheet number must equal the component lane it lifts
    from — the card may summarize, never re-derive differently."""
    from databricks_etl_spark.plans.queries_round11 import (
        q412_jl_distortion_audit,
        q413_jl_retrieval_recall,
        q424_ivf_cell_rebalance,
        q426_ann_index_datasheet,
    )
    from tests.conftest import PARITY_SF_DIR

    card = q426_ann_index_datasheet(spark, PARITY_SF_DIR).collect()[0]
    reb = q424_ivf_cell_rebalance(spark, PARITY_SF_DIR).collect()
    assert card["n_vectors"] == sum(r["n_vectors"] for r in reb)
    assert card["n_subcells"] == len(reb)
    assert card["n_cells"] == len({r["cell_id"] for r in reb})
    assert card["max_subcell_rows"] == max(r["n_vectors"] for r in reb)
    env = q412_jl_distortion_audit(spark, PARITY_SF_DIR).collect()[0]
    assert card["jl_share_in_band"] == env["share_in_band"]
    rec = q413_jl_retrieval_recall(spark, PARITY_SF_DIR).collect()[0]
    assert card["recall10_compressed"] == rec["mean_recall_at_10"]


def test_q427_config_monotone_and_sufficient(spark):
    """Higher recall targets can only cost more probes; every selected
    config actually clears its target; cost is the probed cell
    share."""
    from databricks_etl_spark.plans.queries_round11 import (
        _Q424_CELLS,
        q427_serving_config_selection,
    )
    from tests.conftest import PARITY_SF_DIR

    rows = sorted(
        q427_serving_config_selection(spark, PARITY_SF_DIR).collect(),
        key=lambda r: r["target_recall"],
    )
    assert [r["target_recall"] for r in rows] == [0.5, 0.75, 0.9, 0.99]
    assert all(r["reachable"] for r in rows)
    probes = [r["n_probe"] for r in rows]
    assert probes == sorted(probes)
    for r in rows:
        assert r["achieved_recall"] >= r["target_recall"]
        assert r["probed_cell_share"] == round(
            r["n_probe"] / _Q424_CELLS, 6
        )


def test_q428_watermark_dropped_share_monotone(spark):
    """Dropped share shrinks (weakly) as the watermark widens, never
    exceeds the out-of-order share, and both are valid shares."""
    from databricks_etl_spark.plans.queries_round11 import (
        q428_watermark_demand_audit,
    )
    from tests.conftest import PARITY_SF_DIR

    rows = q428_watermark_demand_audit(spark, PARITY_SF_DIR).collect()
    assert rows
    by_et = {}
    for r in rows:
        assert 0.0 <= r["dropped_share"] <= r["out_of_order_share"] <= 1.0
        assert r["n_dropped"] <= r["n_events"]
        by_et.setdefault(r["event_type"], []).append(
            (r["watermark_minutes"], r["dropped_share"])
        )
    for et, seq in by_et.items():
        seq.sort()
        shares = [s for _, s in seq]
        assert shares == sorted(shares, reverse=True), et


def test_q429_lossless_everywhere_and_redundancy_bounded(spark):
    """Stride reassembly must reconstruct every doc exactly — zero
    boundary loss is the claim the whole chunk layer rides; the
    overlap redundancy is bounded by (window/stride - 1)."""
    from databricks_etl_spark.plans.queries_round11 import (
        q429_chunk_reassembly_fidelity,
    )
    from tests.conftest import PARITY_SF_DIR

    rows = q429_chunk_reassembly_fidelity(spark, PARITY_SF_DIR).collect()
    assert rows
    for r in rows:
        assert r["all_lossless"]
        assert r["n_lossless_docs"] == r["n_docs"]
        assert r["chunk_tokens_total"] >= r["n_tokens_total"]
        assert 0.0 <= r["redundancy_share"] <= 1.0  # W/S - 1 = 1.0


def test_q430_go_at_parity_no_go_at_smoke(spark):
    """All five surfaces pass at sf0.01 → GO; sf0.001's layout gate
    fires (over-compaction) → NO_GO with exactly that surface
    failing."""
    from databricks_etl_spark.plans.queries_round11 import q430_launch_gate
    from tests.conftest import PARITY_SF_DIR

    go = q430_launch_gate(spark, PARITY_SF_DIR).collect()[0]
    assert go["launch"] == "GO" and go["n_pass"] == 5

    nogo = q430_launch_gate(spark, SMOKE_SF_DIR).collect()[0]
    assert nogo["launch"] == "NO_GO"
    assert nogo["layout_verdict"] == "HOLD"
    assert nogo["n_pass"] == 4


# ---------------------------------------------------------------------------
# two-phase prefix kernels vs pure-Python references (random streams)
# ---------------------------------------------------------------------------


def test_file_prefix_sums_matches_python_reference(spark):
    """The bucketed two-phase exclusive prefix sum must equal the
    sequential reference on random day/row layouts — including gaps
    in the day axis and a frozen base offset."""
    import datetime as _dt
    import random

    from databricks_etl_spark.plans.queries_round11 import (
        _file_prefix_sums,
    )

    for seed in (0, 1, 2):
        rng = random.Random(seed)
        rows = []
        ref = {}
        for et in ("a", "b"):
            days = sorted(
                rng.sample(range(0, 120), rng.randint(3, 40))
            )
            cum = 0
            for dd in days:
                r = rng.randint(1, 500)
                d = _dt.date(2024, 1, 1) + _dt.timedelta(days=dd)
                rows.append((et, d, r))
                ref[(et, d)] = cum
                cum += r
        files = spark.createDataFrame(
            rows, "event_type string, d date, rws long"
        )
        got = {
            (r["event_type"], r["d"]): r["cum_before"]
            for r in _file_prefix_sums(files).collect()
        }
        assert got == ref, f"seed {seed}"

        base = spark.createDataFrame(
            [("a", 1000), ("b", 7)], "event_type string, base long"
        )
        got_b = {
            (r["event_type"], r["d"]): r["cum_before"]
            for r in _file_prefix_sums(files, base_offsets=base).collect()
        }
        off = {"a": 1000, "b": 7}
        assert got_b == {
            k: v + off[k[0]] for k, v in ref.items()
        }, f"seed {seed} base"


def test_q428_running_max_matches_python_reference(spark):
    """The two-phase running max must label exactly the events a
    sequential scan labels late, on random shuffled timestamps."""
    import random

    from databricks_etl_spark.plans.queries_round11 import (
        q428_watermark_demand_audit,  # noqa: F401  (import sanity)
    )
    from databricks_etl_spark.plans.registry import QUERIES

    # drive the registered lane against a planted parquet dir
    import datetime as _dt
    import tempfile

    rng = random.Random(42)
    base = _dt.datetime(2024, 1, 1)
    rows = []
    for et in ("x", "y"):
        ts_list = [
            base + _dt.timedelta(seconds=rng.randint(0, 10_000))
            for _ in range(300)
        ]
        for i, ts in enumerate(ts_list):
            rows.append((len(rows), ts, 1, et, 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long,"
        " event_type string, value double, props string",
    )
    d = tempfile.mkdtemp(prefix="q428_prop_")
    df.coalesce(1).write.mode("overwrite").parquet(f"{d}/tmp")
    import glob as _g
    import shutil as _sh

    part = _g.glob(f"{d}/tmp/part-*.parquet")[0]
    _sh.copy(part, f"{d}/events.parquet")

    out = {
        (r["event_type"], r["watermark_minutes"]): r
        for r in QUERIES["q428_watermark_demand_audit"]
        .fn(spark, d)
        .collect()
    }
    # sequential reference
    by_et = {}
    for eid, ts, _u, et, _v, _p in sorted(rows):
        by_et.setdefault(et, []).append(ts)
    import math

    for et, seq in by_et.items():
        rm = None
        ooo = 0
        late_s = []
        for ts in seq:
            if rm is not None and ts < rm:
                ooo += 1
                late_s.append(
                    math.floor(rm.timestamp()) - math.floor(ts.timestamp())
                )
            else:
                late_s.append(0)
            rm = ts if rm is None else max(rm, ts)
        for w in (1, 5, 30, 120):
            r = out[(et, w)]
            assert r["n_events"] == len(seq)
            assert r["out_of_order_share"] == round(ooo / len(seq), 6)
            assert r["n_dropped"] == sum(
                1 for s in late_s if s > w * 60
            ), (et, w)
            assert r["max_lateness_seconds"] == max(late_s)


def test_q431_recommendation_is_minimal_and_sufficient(spark):
    """The recommended watermark must clear the SLO, and no smaller
    candidate may — minimality proven against the full q428 audit."""
    from databricks_etl_spark.plans.queries_round11 import (
        _Q431_MAX_DROP,
        q428_watermark_demand_audit,
        q431_watermark_recommendation,
    )
    from tests.conftest import PARITY_SF_DIR

    aud = {}
    for r in q428_watermark_demand_audit(spark, PARITY_SF_DIR).collect():
        aud[(r["event_type"], r["watermark_minutes"])] = r[
            "dropped_share"
        ]
    recs = q431_watermark_recommendation(spark, PARITY_SF_DIR).collect()
    assert recs
    cands = sorted({w for _, w in aud})
    for r in recs:
        if not r["satisfiable"]:
            assert all(
                aud[(r["event_type"], w)] > _Q431_MAX_DROP for w in cands
            )
            continue
        rec = r["recommended_watermark_minutes"]
        assert aud[(r["event_type"], rec)] <= _Q431_MAX_DROP
        assert r["expected_dropped_share"] == aud[(r["event_type"], rec)]
        for w in cands:
            if w < rec:
                assert aud[(r["event_type"], w)] > _Q431_MAX_DROP


def test_q432_arrow_path_quarantines_corrupt_payloads(spark):
    """One corrupt (or NULL) payload must NULL its features, never
    kill the Arrow batch — q57's hygiene contract on the mapInArrow
    path."""
    from databricks_etl_spark.operators import multimodal as MM

    good = MM.generate_bmp_payloads(
        spark.createDataFrame([(7,), (8,)], "doc_id long")
    )
    bad = spark.createDataFrame(
        [(99, bytearray(b"not a bmp")), (100, None)],
        "doc_id long, payload binary",
    )
    out = {
        r["doc_id"]: r
        for r in MM.decode_features_arrow(
            good.unionByName(bad)
        ).collect()
    }
    assert out[7]["width"] is not None and out[8]["mean_b"] is not None
    assert out[99]["width"] is None and out[99]["n_bytes"] == 9
    assert out[100]["width"] is None and out[100]["n_bytes"] is None
