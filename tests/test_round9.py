"""Round-9 tests: the dataloader-order capstone's invariants (the
exact guarantees a training run replays against), grouped FFD packing,
incremental manifest maintenance, the subword tokenizer, chunk-grain
MinHash, and the retrieval-eval lane."""

from __future__ import annotations

import pyspark.sql.functions as F

from databricks_etl_spark.sources.readers import read_table


def test_q326_dataloader_order_invariants(spark, sf_dir):
    """The capstone contract: (a) every shipped doc appears exactly
    epochs(source) times, once per epoch 1..epochs; (b) no benchmark
    doc (doc_id % 50 == 0) ever appears; (c) per epoch, steps are a
    dense 1..n_sequences permutation at sequence grain; (d) two
    independent runs are byte-identical (the determinism a resumable
    training job relies on)."""
    from databricks_etl_spark.plans.registry import queries
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
        q323_epoch_allocation,
    )

    qs = queries()
    rows = qs["q326_dataloader_order"](spark, sf_dir).collect()
    assert rows, "dataloader order is empty"

    # (b) benchmark exclusion
    assert all(r.doc_id % 50 != 0 for r in rows)

    # (a) exact epoch multiplicity per shipped doc — and nothing else
    ship = {
        r.doc_id
        for r in q312_training_manifest(spark, sf_dir).filter("ship").collect()
    }
    epochs_by_source = {
        r.source: r.epochs
        for r in q323_epoch_allocation(spark, sf_dir).collect()
    }
    src = {
        r.doc_id: r.source
        for r in read_table(spark, sf_dir, "documents")
        .select("doc_id", "source")
        .collect()
    }
    seen: dict[int, list[int]] = {}
    for r in rows:
        seen.setdefault(r.doc_id, []).append(r.epoch)
    assert set(seen) == ship
    for doc_id, eps in seen.items():
        want = epochs_by_source[src[doc_id]]
        assert sorted(eps) == list(range(1, want + 1)), (doc_id, eps, want)

    # (c) steps are dense 1..n_seqs per epoch, constant per sequence
    per_epoch_seqs: dict[int, dict[int, int]] = {}
    for r in rows:
        d = per_epoch_seqs.setdefault(r.epoch, {})
        assert d.setdefault(r.seq_id, r.step) == r.step
    for epoch, seqs in per_epoch_seqs.items():
        steps = sorted(seqs.values())
        assert steps == list(range(1, len(seqs) + 1)), epoch

    # epochs shuffle differently (MINSTD key is epoch-dependent)
    if len(per_epoch_seqs) > 1:
        e1, e2 = sorted(per_epoch_seqs)[:2]
        common = set(per_epoch_seqs[e1]) & set(per_epoch_seqs[e2])
        assert any(
            per_epoch_seqs[e1][s] != per_epoch_seqs[e2][s] for s in common
        )

    # (d) byte-stability
    again = qs["q326_dataloader_order"](spark, sf_dir).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_ffd_pack_rejects_unencodable_shard_size(spark):
    """The r8-ADVICE guard: shard_size above the seq_id bin namespace
    would let within-shard bins collide across shards — rejected up
    front, alongside the existing bounds."""
    import pytest as _pytest

    from databricks_etl_spark.operators.packing import _SEQ_NS, ffd_pack

    docs = spark.createDataFrame([(1, 10)], "doc_id long, len long")
    with _pytest.raises(ValueError):
        ffd_pack(docs, 128, _SEQ_NS + 1)
    with _pytest.raises(ValueError):
        ffd_pack(docs, 128, 0)
    assert ffd_pack(docs, 128, _SEQ_NS).count() == 1  # boundary is legal


def test_ffd_pack_grouped_invariants(spark):
    """Grouped FFD: every doc placed once, budget respected per
    (group, seq), sequences never mix groups, and the grouped result
    for a single group equals the ungrouped packing of that group."""
    from databricks_etl_spark.operators.packing import ffd_pack

    rows = [(i, (i * 37) % 90 + 10, i % 3 + 1) for i in range(1, 301)]
    docs = spark.createDataFrame(rows, "doc_id long, len long, g long")
    out = ffd_pack(docs, 128, 32, group_col="g").collect()

    assert sorted(r.doc_id for r in out) == [r[0] for r in rows]
    by_seq: dict[tuple[int, int], int] = {}
    groups_of_seq: dict[int, set[int]] = {}
    for r in out:
        by_seq[(r.g, r.seq_id)] = by_seq.get((r.g, r.seq_id), 0) + r.n_tokens
        groups_of_seq.setdefault(r.seq_id, set()).add(r.g)
    assert all(total <= 128 for total in by_seq.values())
    # (g, seq_id) is the composite key; a seq_id reused across groups
    # must never receive docs from two groups under the same group key
    for (g, _sid), _ in by_seq.items():
        assert g in groups_of_seq[_sid]

    one = docs.filter("g = 2").select("doc_id", "len")
    solo = {
        (r.doc_id, r.seq_id, r.seq_offset)
        for r in ffd_pack(one, 128, 32).collect()
    }
    grouped = {
        (r.doc_id, r.seq_id, r.seq_offset)
        for r in out
        if r.g == 2
    }
    assert solo == grouped


def test_subword_greedy_longest_match(spark):
    """The fold implements longest-match-first exactly: hand-computed
    consumptions for known words, 1-char fallback for OOV characters,
    and the fertility bound 1 <= pieces <= length(word)."""
    from databricks_etl_spark.operators.text import subword_count

    # "nation" -> "na"? no ("na" not in V2) -> n,a? Walk it by hand:
    # pos1 "nati"X "nat"X "na"X -> "n"(1); pos2 "atio"X "ati"OK(3);
    # pos5 "on"OK(2) => 3 pieces
    # "the" -> "the"(3) => 1 piece; "thex" -> "the"+"x" => 2
    # "zzz" -> z,z,z => 3 (all OOV); "ingestion" -> "inge"X "ing"(3)
    #   + "esti"X "est"(3) + "on"(2) => 3 pieces
    cases = {
        "nation": 3,
        "the": 1,
        "thex": 2,
        "zzz": 3,
        "ingestion": 3,
        "a": 1,
    }
    df = spark.createDataFrame([(w,) for w in cases], "w string")
    got = {
        r.w: r.p
        for r in df.select("w", subword_count(F.col("w")).alias("p")).collect()
    }
    assert got == cases

    import random

    rng = random.Random(9)
    words = [
        "".join(rng.choice("abcdefghijklmnopqrstuvwxyz.!")
                for _ in range(rng.randint(1, 30)))
        for _ in range(200)
    ]
    df2 = spark.createDataFrame([(w,) for w in words], "w string")
    for r in df2.select("w", subword_count(F.col("w")).alias("p")).collect():
        assert 1 <= r.p <= len(r.w), r


def test_subword_fertility_vs_whitespace(spark, sf_dir):
    """Subword counts dominate whitespace counts (every word is >= 1
    piece) and the fertility ratio is >= 1 wherever defined — the
    invariant that makes the q329 re-based packing strictly tighter
    than q313's whitespace budget."""
    from databricks_etl_spark.plans.registry import queries

    rows = queries()["q328_subword_tokenize"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.n_subword_tokens >= r.n_words, r
        if r.pieces_per_word is not None:
            assert r.pieces_per_word >= 1.0, r


def test_chunk_minhash_vs_exact_jaccard(spark, sf_dir):
    """The md5-MinHash chunk twin scored against EXACT shingle
    Jaccard (computed independently in Python): every near-verbatim
    cross-doc chunk pair (exact J >= 0.9) is detected — the recall a
    masking pipeline relies on — 8/8-component pairs are high-J in
    truth, no reported pair is junk, and the seeded LSH lane agrees
    on the near-verbatim set. Deterministic: md5 hashes and the
    testdata are both fixed."""
    import itertools

    from databricks_etl_spark.operators.text import chunk_tokens
    from databricks_etl_spark.plans.queries_round8 import _Q318_S, _Q318_W
    from databricks_etl_spark.plans.registry import queries

    qs = queries()
    d = read_table(spark, sf_dir, "documents")
    ch = (
        chunk_tokens(d, _Q318_W, _Q318_S)
        .filter(F.col("n_chunk_tokens") >= 3)
        .select("doc_id", "chunk_idx", "chunk_text")
        .collect()
    )

    def shingles(t: str) -> set[str]:
        w = t.split(" ")
        return {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    S = {(r.doc_id, r.chunk_idx): shingles(r.chunk_text) for r in ch}

    def jac(ka, kb) -> float:
        a, b = S[ka], S[kb]
        return len(a & b) / len(a | b)

    truth = set()
    for ka, kb in itertools.combinations(sorted(S), 2):
        if ka[0] != kb[0] and jac(ka, kb) >= 0.9:
            truth.add((ka, kb))
    assert truth, "testdata has near-verbatim cross-doc chunks"

    g330 = qs["q330_chunk_minhash_neardup"](spark, sf_dir).collect()
    det = {((r.doc_a, r.chunk_a), (r.doc_b, r.chunk_b)) for r in g330}
    assert truth <= det  # 100% recall on near-verbatim pairs
    for r in g330:
        assert r.doc_a < r.doc_b and 4 <= r.n_matching <= 8, r
        j = jac((r.doc_a, r.chunk_a), (r.doc_b, r.chunk_b))
        assert j > 0.1, (r, j)  # no junk pairs
        if r.n_matching == 8:
            assert j >= 0.5, (r, j)

    g331 = qs["q331_chunk_lsh_pairs"](spark, sf_dir).collect()
    assert g331 and all(r.doc_a != r.doc_b for r in g331)
    lsh = {((r.doc_a, r.chunk_a), (r.doc_b, r.chunk_b)) for r in g331}
    assert lsh & truth


def test_minhash_lsh_survives_empty_shingle_rows(spark):
    """Regression (found via the chunk lane): Catalyst may evaluate
    the LSH hash UDF ahead of the empty-shingle filter, and
    MinHashLSHModel rejects all-zero vectors — rows too short to
    shingle must neither crash the join nor appear in its output."""
    from databricks_etl_spark.operators.dedup import minhash_lsh_pairs

    rows = [
        ("a", "alpha beta gamma delta epsilon"),
        ("b", "alpha beta gamma delta epsilon"),
        ("c", "too short"),
        ("d", ""),
        ("e", "x y"),
    ]
    df = spark.createDataFrame(rows, "k string, text string")
    got = minhash_lsh_pairs(df, threshold=0.5, id_col="k").collect()
    ids = {r.id_a for r in got} | {r.id_b for r in got}
    assert ids == {"a", "b"}


def test_q332_retrieval_eval_bounds(spark, sf_dir):
    """The retrieval eval covers every benchmark query with a nonzero
    embedding, reports recall in (0, 1] bounds, and shows the
    n_probe=1 IVF trade-off: nontrivial recall, but not free — the
    cell restriction must actually restrict (some query's truth set
    crosses cells at this SF)."""
    from databricks_etl_spark.plans.registry import queries

    row = queries()["q332_rag_retrieval_eval"](spark, sf_dir).collect()[0]
    n_bench = (
        read_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 50 == 0)
        .count()
    )
    assert row.n_queries == n_bench
    assert 0.0 < row.mean_recall_at_10 <= 1.0
    assert 0.0 <= row.top1_recall <= 1.0
    assert row.mean_recall_at_10 > 0.3  # the index is useful...
    assert row.mean_recall_at_10 < 1.0  # ...and the restriction real


def test_q336_slicing_invariance_and_replay(spark, sf_dir, tmp_path):
    """The streaming decontamination drain equals batch q319 under a
    FORCED two-epoch slicing, and re-delivering an epoch (Structured
    Streaming's at-least-once failure mode) leaves the sink unchanged
    — the exactly-once contract the epoch-partitioned sink provides."""
    from databricks_etl_spark.plans.queries_round7 import _XL, _XS
    from databricks_etl_spark.plans.queries_round8 import _Q318_S, _Q318_W
    from databricks_etl_spark.plans.registry import queries
    from databricks_etl_spark.streaming.decontam import make_decontam_epoch

    d = read_table(spark, sf_dir, "documents")
    corpus = d.filter(F.col("doc_id") % 50 != 0)
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"),
        F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ").alias(
            "text"
        ),
    )
    path = str(tmp_path / "dc_hits")
    spark.createDataFrame(
        [], "ckey string, bench_id long, n_grams_hit long, __epoch int"
    ).write.mode("overwrite").partitionBy("__epoch").parquet(path)

    ingest = make_decontam_epoch(
        path, bench, window=_Q318_W, stride=_Q318_S,
        length=_XL, gram_stride=_XS,
    )
    half_a = corpus.filter(F.col("doc_id") % 2 == 0)
    half_b = corpus.filter(F.col("doc_id") % 2 == 1)
    ingest(half_a, 0)
    ingest(half_b, 1)

    def drained():
        hits = spark.read.schema(
            "ckey string, bench_id long, n_grams_hit long, __epoch int"
        ).parquet(path)
        k = F.split(F.col("ckey"), ":")
        return sorted(
            map(
                tuple,
                hits.select(
                    k.getItem(0).cast("long"),
                    k.getItem(1).cast("long"),
                    "bench_id",
                    "n_grams_hit",
                ).collect(),
            )
        )

    first = drained()
    batch = sorted(
        map(
            tuple,
            queries()["q319_chunk_contamination"](spark, sf_dir).collect(),
        )
    )
    assert first == batch

    ingest(half_b, 1)  # re-delivery of epoch 1
    assert drained() == first


def test_q333_containment_directional(spark, sf_dir):
    """Containment is a valid ratio (0, 1], directional (a small doc
    inside a big one scores higher toward the big one), and every
    reported doc actually has q330 chunk pairs."""
    from databricks_etl_spark.plans.registry import queries

    qs = queries()
    rows = qs["q333_partial_overlap_docs"](spark, sf_dir).collect()
    assert rows
    pair_docs = set()
    for r in qs["q330_chunk_minhash_neardup"](spark, sf_dir).collect():
        pair_docs |= {r.doc_a, r.doc_b}
    for r in rows:
        assert 0.0 < r.containment <= 1.0, r
        assert 1 <= r.n_overlap_chunks <= r.n_chunks, r
        assert r.doc_id in pair_docs and r.other_doc in pair_docs, r


def test_q334_plan_stream_reconcile(spark, sf_dir):
    """Every shipping source's realized epochs equal its planned
    epochs — the audit column is true across the board (a false row
    means packing or the shuffle dropped/duplicated work)."""
    from databricks_etl_spark.plans.registry import queries

    rows = queries()["q334_epoch_token_accounting"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.epochs_consistent, r
        assert r.total_doc_slots >= r.epochs_planned, r


def test_q337_leakage_matrix_accounts_for_all_pairs(spark, sf_dir):
    """The split-leakage matrix partitions q330's pair set exactly
    (counts sum to the pair count), flags precisely the off-diagonal
    cells, and at this SF actually finds leakage — the failure mode
    doc-level split hygiene cannot see."""
    from databricks_etl_spark.plans.registry import queries

    qs = queries()
    n_pairs = len(qs["q330_chunk_minhash_neardup"](spark, sf_dir).collect())
    rows = qs["q337_split_leakage_audit"](spark, sf_dir).collect()
    assert sum(r.n_pairs for r in rows) == n_pairs
    for r in rows:
        assert r.is_leakage == (r.split_a != r.split_b), r
    assert any(r.is_leakage for r in rows)


def test_ffd_pack_grouped_property(spark):
    """Property test over random length distributions: grouped FFD
    always places every doc exactly once, never overfills a sequence,
    and keeps within-sequence segments contiguous from offset 0."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from databricks_etl_spark.operators.packing import ffd_pack

    @settings(max_examples=5, deadline=None)
    @given(
        lens=st.lists(st.integers(1, 300), min_size=1, max_size=60),
        budget=st.integers(16, 256),
    )
    def check(lens, budget):
        rows = [(i + 1, ln, (i % 2) + 1) for i, ln in enumerate(lens)]
        docs = spark.createDataFrame(rows, "doc_id long, len long, g long")
        out = ffd_pack(docs, budget, 16, group_col="g").collect()
        assert sorted(r.doc_id for r in out) == [r[0] for r in rows]
        seqs: dict[tuple[int, int], list] = {}
        for r in out:
            seqs.setdefault((r.g, r.seq_id), []).append(
                (r.seq_offset, r.n_tokens)
            )
        for segs in seqs.values():
            segs.sort()
            pos = 0
            for off, n in segs:
                assert off == pos  # contiguous from 0, no holes
                pos += n
            assert pos <= budget

    check()


import pytest


@pytest.mark.slow
def test_round9_lane_scale_gate_25k(spark, sf_dir):
    """Round-9 lanes at ~25k docs (50x the graded 500-doc slice):
    the subword fold and the chunk-MinHash signature build complete
    in bounded wall time with whole-stage-codegen plans — no
    BatchEvalPython anywhere (both are pure JVM expression lanes; the
    only sanctioned Python is the FFD Arrow fold, gated elsewhere).
    Work scales with DISTINCT words (subword) and chunks (MinHash),
    the properties that hold at 100 TB."""
    import time

    from databricks_etl_spark.operators.text import (
        chunk_tokens,
        shingle_array,
        subword_doc_counts,
        tokens_col,
    )

    d = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    copies = max(2, 25000 // d.count())
    big = d
    for i in range(1, copies):
        big = big.unionByName(
            d.select((F.col("doc_id") + i * 1000000).alias("doc_id"), "text")
        )
    big = big.repartition(32).localCheckpoint()
    n = big.count()

    t0 = time.time()
    sw = subword_doc_counts(big)
    assert sw.count() == n
    sw_wall = time.time() - t0
    plan = sw._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan

    t0 = time.time()
    sig = (
        chunk_tokens(big, 64, 32)
        .filter(F.col("n_chunk_tokens") >= 3)
        .select(
            "doc_id",
            "chunk_idx",
            F.explode(
                F.array_distinct(
                    shingle_array(tokens_col("chunk_text"), 3)
                )
            ).alias("s"),
        )
        .groupBy("doc_id", "chunk_idx")
        .agg(
            *[
                F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("s")))).alias(
                    f"h{i}"
                )
                for i in range(8)
            ]
        )
    )
    n_sigs = sig.count()
    mh_wall = time.time() - t0
    assert n_sigs >= n  # every doc has at least one >=3-token chunk here
    plan2 = sig._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan2

    # generous ceilings — the gate catches quadratic regressions, not
    # machine noise (r8 multimodal precedent: single-digit seconds)
    assert sw_wall < 120, sw_wall
    assert mh_wall < 120, mh_wall


def test_q327_corpus_never_rescored(spark, sf_dir):
    """Incremental maintenance emits ONLY new/changed rows across its
    two relations: q327 verdict rows are exactly the delta batch (the
    verbatim half — re-ingested crawl — always flags sem_dup: it
    collides with its own source at sim 1.0); q335 touched rows are
    prior shipped survivors a delta doc actually collides with,
    carrying collision counts and NO verdict columns (the corpus is
    not re-scored), and no untouched corpus doc ever appears."""
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
    )
    from databricks_etl_spark.plans.queries_round9 import (
        _B327,
        q327_manifest_maintenance,
        q335_manifest_touched_survivors,
    )

    new = q327_manifest_maintenance(spark, sf_dir).collect()
    d = read_table(spark, sf_dir, "documents")
    delta_src = {
        r.doc_id
        for r in d.filter(F.col("doc_id") % 5 == 1).select("doc_id").collect()
    }
    assert {r.doc_id for r in new} == {i + _B327 for i in delta_src}
    # all verdicts are scored (non-null) — no corpus rows mixed in
    for r in new:
        assert None not in (r.contaminated, r.sem_dup, r.quality_ok, r.ship), r
        if (r.doc_id - _B327) % 10 == 1:  # verbatim half
            assert r.sem_dup and r.n_new_collisions >= 1, r

    touched = q335_manifest_touched_survivors(spark, sf_dir).collect()
    shipped = {
        r.doc_id
        for r in q312_training_manifest(spark, sf_dir).filter("ship").collect()
    }
    assert touched, "verbatim deltas guarantee at least one touched survivor"
    assert set(touched[0].asDict()) == {"doc_id", "n_new_collisions"}
    for r in touched:
        assert r.doc_id in shipped, r
        assert r.n_new_collisions >= 1, r
