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
