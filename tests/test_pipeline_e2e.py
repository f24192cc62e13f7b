"""End-to-end library composition: the daily-ingestion pipeline a user
of this engine would actually run, chained from the operator library —
validity filter → exact dedup (keep-first) → quality gate → MAD length
outlier cut → deterministic split assignment → two-phase-commit jsonl
sink → read-back. Every stage is individually oracled/tested
elsewhere; this locks that they COMPOSE (schemas line up, NULL
policies agree, determinism survives the chain)."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from databricks_etl_spark.operators import dedup as DD
from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.operators.stats import group_mad
from databricks_etl_spark.sources import pydatasource as PDS
from databricks_etl_spark.sources.readers import read_table


def _split_col():
    h = F.md5(F.col("doc_id").cast("string"))
    nib = lambda k: F.instr(F.lit("0123456789abcdef"), F.substring(h, k, 1)) - 1  # noqa: E731
    v = nib(1) * 16 + nib(2)
    return F.when(v < 204, "train").when(v < 230, "val").otherwise("test")


def test_ingestion_pipeline_composes(spark, sf_dir, tmp_path):
    d = read_table(spark, sf_dir, "documents")
    raw = d.union(
        d.select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            "text", "lang", "source", "n_chars",
        )
    )

    # 1. validity
    valid = raw.filter((F.col("n_chars") >= 150) & F.col("lang").isNotNull())
    # 2. exact dedup, deterministic survivor
    uniq = DD.dedup_exact(valid, ["text"], "doc_id")
    # 3. quality gate
    scored = TX.quality_features(uniq.select("doc_id", "text")).join(
        uniq.select("doc_id", "lang", "source"), "doc_id"
    )
    good = scored.filter(F.col("quality_score") >= 0.5)
    # 4. robust per-language length cut (|len - med| <= 3 MAD)
    mm = group_mad(
        good.select("lang", "doc_id", F.col("n_tokens").alias("v")),
        "lang", "v", tiebreak="doc_id",
    )
    kept = (
        good.join(mm, "lang")
        .filter(F.abs(F.col("n_tokens") - F.col("median")) <= 3 * F.col("mad"))
    )
    # 5. deterministic split + 6. two-phase-commit sink
    final = kept.select("doc_id", "lang", "source", _split_col().alias("split"))
    out = str(tmp_path / "corpus_jsonl")
    PDS.register(spark)
    final.write.format("pyjsonl").option("path", out).mode("append").save()

    # read-back: exact row fidelity through the custom sink
    back = spark.read.json(out)
    assert back.count() == final.count() > 0
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))
    a = sorted(map(tuple, final.collect()))
    b = sorted(
        (r.doc_id, r.lang, r.source, r.split)
        for r in back.select("doc_id", "lang", "source", "split").collect()
    )
    assert a == b

    # pipeline invariants: monotone funnel, dedup really deduped,
    # split is total and per-doc unique
    assert raw.count() >= valid.count() >= uniq.count() >= good.count() >= kept.count()
    assert uniq.count() == valid.select("text").distinct().count()
    assert final.select("doc_id").distinct().count() == final.count()
    assert set(r.split for r in back.select("split").distinct().collect()) <= {
        "train", "val", "test",
    }

    # determinism: the whole chain reruns bit-identically
    rerun = sorted(map(tuple, final.collect()))
    assert rerun == a


def test_ingestion_report_scorecard_to_sink(spark, sf_dir, tmp_path):
    """The capstone report pipeline (r5 verdict #8): clean → dedup →
    audit → sink → read-back. The cleaned, deduped corpus feeds the
    q246 per-source scorecard (near-dup × contamination × quality),
    the report lands through the two-phase-commit Python DataSource
    jsonl sink, and the read-back must hash-equal the in-memory
    report — proving the full EP1–EP3+north-star chain end to end
    through a real custom sink."""
    import hashlib

    from databricks_etl_spark.plans.registry import queries

    # clean + dedup rungs (same stages the corpus pipeline runs)
    d = read_table(spark, sf_dir, "documents")
    valid = d.filter(F.col("text").isNotNull() & (F.col("n_chars") > 0))
    uniq = DD.dedup_exact(valid, ["text"], "doc_id")
    assert uniq.count() == valid.select("text").distinct().count()

    # audit: the composed per-source scorecard (independently oracled)
    report = queries()["q246_source_scorecard"](spark, sf_dir)
    cols = report.columns
    assert report.count() > 0

    out = str(tmp_path / "ingestion_report")
    PDS.register(spark)
    report.write.format("pyjsonl").option("path", out).mode("overwrite").save()

    # two-phase commit held: finalized parts + _SUCCESS only
    assert not glob.glob(os.path.join(out, ".part-*.tmp"))
    with open(os.path.join(out, "_SUCCESS")) as f:
        assert int(f.read()) == report.count()

    # read-back hash equality (canonical row ordering, 6dp ratios are
    # already rounded by the query itself)
    def canon_hash(df):
        rows = sorted(
            tuple(str(r[c]) for c in cols) for r in df.collect()
        )
        return hashlib.md5(repr(rows).encode()).hexdigest()

    back = spark.read.json(out).select(
        *[F.col(c).cast(t) for c, t in report.dtypes]
    )
    assert canon_hash(back) == canon_hash(report)
