"""Round-14 unit tests: streaming graph-ANN maintenance (q576)
invariants beyond the oracle-parity suite — hostile slicing and
exactly-once replay, the q385/q390 twin discipline applied to the
graph rung."""

from __future__ import annotations

import shutil

import pyspark.sql.functions as F
import pytest

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
