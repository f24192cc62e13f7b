"""Structural invariants for the training-data prep queries (their
value-level correctness is oracle-checked; these pin the semantics the
hashes can't express)."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.plans.queries_llmprep import (
    _BUDGET,
    _CHUNK,
    _STRIDE,
    q139_doc_chunking,
    q140_sequence_packing,
    q142_vocab_oov,
)
from databricks_etl_spark.sources.readers import read_table


def test_chunking_covers_every_token(spark, smoke_sf_dir):
    """Union of [start, start+len) intervals covers [0, n_tokens);
    consecutive chunks overlap by CHUNK - STRIDE (except the tail)."""
    chunks = q139_doc_chunking(spark, smoke_sf_dir)
    d = read_table(spark, smoke_sf_dir, "documents").select(
        "doc_id",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n"),
    )
    per_doc = chunks.groupBy("doc_id").agg(
        F.max(F.col("chunk_id") * _STRIDE + F.col("n_chunk_tokens")).alias("covered"),
        F.count(F.lit(1)).alias("n_chunks"),
    )
    j = per_doc.join(d, "doc_id").collect()
    assert j
    for r in j:
        assert r["covered"] == r["n"], r  # full coverage, no gap past the end
        # starts are 0, STRIDE, ... <= n-1  →  floor((n-1)/STRIDE) + 1
        assert r["n_chunks"] == (max(r["n"] - 1, 0) // _STRIDE) + 1, r


def test_packing_offsets_are_consistent(spark, smoke_sf_dir):
    """stream_offset is the running sum of preceding docs in the shard
    and bin_id = floor(offset / BUDGET); offsets are dense (no holes:
    next offset = prev offset + prev n_tokens)."""
    rows = (
        q140_sequence_packing(spark, smoke_sf_dir)
        .orderBy("lang", "doc_id")
        .collect()
    )
    assert rows
    by_lang: dict[str, list] = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r)
    for lang, rs in by_lang.items():
        off = 0
        for r in rs:
            assert r["stream_offset"] == off, (lang, r)
            assert r["bin_id"] == off // _BUDGET
            off += r["n_tokens"]


def test_oov_rate_bounds_and_vocab_coverage(spark, smoke_sf_dir):
    out = q142_vocab_oov(spark, smoke_sf_dir).collect()
    assert out
    for r in out:
        assert 0 <= r["n_oov"] <= r["n_tokens"]
        assert 0.0 <= r["oov_rate"] <= 1.0
    # a top-100 vocab over a zipfy corpus must cover the majority of
    # token mass (at the smoke SF it can cover everything → oov 0)
    tot = sum(r["n_tokens"] for r in out)
    oov = sum(r["n_oov"] for r in out)
    assert 0.0 <= oov / tot < 0.5
