"""Round-8 tests: the training-set manifest capstone (q312) through
the two-phase-commit jsonl sink and back, plus the sequence-packing,
source-mixing, product-quantization, and chunking lanes' invariants."""

from __future__ import annotations

import glob
import os

import pyspark.sql.functions as F

from databricks_etl_spark.sources import pydatasource as PDS
from databricks_etl_spark.sources.readers import read_table


def test_training_manifest_sink_roundtrip(spark, sf_dir, tmp_path):
    """The q312 manifest is the pipeline-of-record artifact: it must
    (a) cover every corpus doc exactly once and no benchmark doc,
    (b) have `ship` consistent with its own gate columns row-by-row,
    (c) survive the two-phase-commit jsonl sink byte-faithfully."""
    from databricks_etl_spark.plans.registry import queries

    manifest = queries()["q312_training_manifest"](spark, sf_dir)
    rows = manifest.collect()

    d = read_table(spark, sf_dir, "documents")
    n_corpus = d.filter((F.col("doc_id") % 50) != 0).count()
    assert len(rows) == n_corpus
    assert len({r.doc_id for r in rows}) == len(rows)
    assert all(r.doc_id % 50 != 0 for r in rows)

    # ship is exactly the conjunction of its stated gates
    for r in rows:
        assert r.ship == (
            (not r.contaminated)
            and (not r.sem_dup)
            and (not r.multimodal_dup)
            and r.quality_ok
            and r.drift_gate_ok
        ), r
    # the manifest is non-degenerate at this SF: some docs ship, some don't
    shipped = sum(1 for r in rows if r.ship)
    assert 0 < shipped < len(rows)

    out = str(tmp_path / "manifest_jsonl")
    PDS.register(spark)
    manifest.write.format("pyjsonl").option("path", out).mode("overwrite").save()
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == len(rows)

    back = spark.read.json(out).select(*manifest.columns)
    a = sorted(map(tuple, rows))
    b = sorted(map(tuple, back.collect()))
    assert a == b


def _pack(spark, rows, budget, shard_size):
    from databricks_etl_spark.operators.packing import ffd_pack

    df = spark.createDataFrame(rows, "doc_id long, len long")
    return ffd_pack(df, budget, shard_size).collect()


def test_ffd_pack_invariants(spark):
    """The packing contract: every doc placed exactly once, no
    sequence over budget, segments within a sequence contiguous from
    offset 0, and the whole plan bit-deterministic across reruns."""
    import random

    rng = random.Random(8)
    rows = [(i, rng.randint(1, 200)) for i in range(300)]
    budget, shard = 256, 64
    placed = _pack(spark, rows, budget, shard)

    assert sorted(p.doc_id for p in placed) == [r[0] for r in rows]
    lens = dict(rows)
    by_seq = {}
    for p in placed:
        assert p.n_tokens == min(lens[p.doc_id], budget)
        by_seq.setdefault(p.seq_id, []).append(p)
    for seq, members in by_seq.items():
        members.sort(key=lambda p: p.seq_offset)
        total = sum(p.n_tokens for p in members)
        assert total <= budget, (seq, total)
        # FFD fills bins front-to-back: contiguous from 0
        cursor = 0
        for p in members:
            assert p.seq_offset == cursor, (seq, p)
            cursor += p.n_tokens

    rerun = _pack(spark, rows, budget, shard)
    assert sorted(map(tuple, placed)) == sorted(map(tuple, rerun))


def test_ffd_pack_overlong_doc_clamped(spark):
    """A doc longer than the budget occupies one full sequence alone
    (clamped length), never corrupting neighbors' offsets."""
    placed = _pack(spark, [(1, 999), (2, 10), (3, 10)], 64, 128)
    one = next(p for p in placed if p.doc_id == 1)
    assert one.n_tokens == 64 and one.seq_offset == 0
    others = [p for p in placed if p.doc_id != 1]
    assert all(p.seq_id != one.seq_id for p in others)


def test_ffd_pack_validates_args(spark):
    import pytest as _pytest

    from databricks_etl_spark.operators.packing import ffd_pack

    df = spark.createDataFrame([(1, 5)], "doc_id long, len long")
    with _pytest.raises(ValueError):
        ffd_pack(df, 0)
    with _pytest.raises(ValueError):
        ffd_pack(df, 64, 0)


def test_ffd_pack_skewed_residues_raise_not_collide(spark, monkeypatch):
    """Shard sizing bounds bins per shard only IN EXPECTATION: if every
    doc_id lands on one residue class mod n_shards, a single shard gets
    the whole corpus and its bin count can exceed the seq_id namespace.
    The fold must fail loudly (both engines would otherwise collide
    seq_ids identically, invisible to the oracle). _SEQ_NS is shrunk so
    the overflow is reachable at test size; cloudpickle captures the
    patched global by value into the executor-side fold."""
    import pytest as _pytest
    from py4j.protocol import Py4JJavaError

    from databricks_etl_spark.operators import packing

    monkeypatch.setattr(packing, "_SEQ_NS", 4)
    # n=6 docs, shard_size=3 -> n_shards=2, but every doc_id is even:
    # shard 0 holds all 6 docs, each full-budget -> 6 bins > 3 allowed.
    rows = [(2 * i, 64) for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, len long")
    from pyspark.errors.exceptions.base import PySparkException

    with _pytest.raises((Py4JJavaError, PySparkException), match="collide"):
        packing.ffd_pack(df, 64, 3).collect()


def test_chunk_tokens_coverage_and_overlap(spark):
    """The chunking contract (the q318 stride guarantee, mirroring the
    round-7 gram-stride test): chunk i starts at token i*stride, every
    token is covered, consecutive chunks overlap by window - stride
    tokens, and tail chunks are short but present."""
    import pytest as _pytest

    from databricks_etl_spark.operators.text import chunk_tokens

    text = " ".join(f"t{i}" for i in range(100))
    df = spark.createDataFrame([(1, text)], "doc_id long, text string")
    got = sorted(chunk_tokens(df, 64, 32).collect(), key=lambda r: r.chunk_idx)
    # starts: 0, 32, 64, 96 (96 < 100) — 4 chunks
    assert [r.chunk_start_token for r in got] == [0, 32, 64, 96]
    assert [r.n_chunk_tokens for r in got] == [64, 64, 36, 4]
    toks = text.split()
    for r in got:
        expect = toks[r.chunk_start_token : r.chunk_start_token + 64]
        assert r.chunk_text.split() == expect
    # overlap: chunk k shares its last window-stride tokens with k+1
    assert got[0].chunk_text.split()[32:] == got[1].chunk_text.split()[:32]
    # every token covered
    covered = set()
    for r in got:
        covered.update(
            range(r.chunk_start_token, r.chunk_start_token + r.n_chunk_tokens)
        )
    assert covered == set(range(100))

    with _pytest.raises(ValueError):
        chunk_tokens(df, 4, 8)  # stride > window
    with _pytest.raises(ValueError):
        chunk_tokens(df, 4, 0)


import pytest


@pytest.mark.slow
def test_multimodal_codec_scale_gate_25k(spark, sf_dir):
    """The image/audio codec lanes at 25k payloads (the BENCH_NOTES
    demonstration, 125x the graded 200-payload slice): both lanes
    complete with one row per payload and the executed plan is the
    Arrow batch path — MapInPandas, never row-at-a-time
    BatchEvalPython."""
    from databricks_etl_spark.operators import multimodal as MM

    d = read_table(spark, sf_dir, "documents").select("doc_id")
    copies = max(2, 25000 // d.count())  # 25k payloads at any base SF
    big = d
    for i in range(1, copies):
        big = big.unionByName(
            d.select((F.col("doc_id") + i * 1000000).alias("doc_id"))
        )
    big = big.repartition(32)
    n = big.count()
    assert n >= 25000 or copies == 2

    ah = MM.image_ahash(MM.generate_bmp_payloads(big))
    assert ah.count() == n
    plan = ah._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan and "BatchEvalPython" not in plan

    afp = MM.audio_fingerprints(MM.generate_wav_payloads(big))
    assert afp.count() == n
    plan2 = afp._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan2 and "BatchEvalPython" not in plan2


def test_chunk_contamination_names_the_chunk(spark, sf_dir):
    """Every q319 (doc, bench) pair is a doc-level pair under the SAME
    normalization — chunk granularity refines, never invents. The
    reference set is a doc-level exact_substring_hits recomputation on
    the whitespace-collapsed case-folded text q319 uses (q283 itself
    grams the RAW text, so it is not a superset by construction: case
    folding can legitimately surface pairs q283 never reports — the
    r8 ADVICE asymmetry), with corpus-side stride 1 so every chunk
    gram offset is also a sampled doc offset."""
    import pyspark.sql.functions as F

    from databricks_etl_spark.operators.text import exact_substring_hits
    from databricks_etl_spark.plans.queries_round7 import _XL
    from databricks_etl_spark.plans.registry import queries
    from databricks_etl_spark.sources.readers import read_table

    qs = queries()
    d = read_table(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    corpus = d.filter(F.col("doc_id") % 50 != 0).select(
        "doc_id", norm.alias("text")
    )
    bench = d.filter(F.col("doc_id") % 50 == 0).select(
        F.col("doc_id").alias("bench_id"), norm.alias("text")
    )
    doc_hits = {
        (r.doc_id, r.bench_id)
        for r in exact_substring_hits(
            corpus, bench, length=_XL, stride=1
        ).collect()
    }
    chunk_hits = qs["q319_chunk_contamination"](spark, sf_dir).collect()
    chunk_pairs = {(r.doc_id, r.bench_id) for r in chunk_hits}
    assert chunk_pairs <= doc_hits
    # spans short enough to fit a chunk window are found at chunk level
    assert len(chunk_pairs) > 0
    assert all(r.chunk_idx >= 0 and r.n_grams_hit >= 1 for r in chunk_hits)
