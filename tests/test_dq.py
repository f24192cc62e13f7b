"""Unit tests for the declarative DQ operator: planted violations
produce the exact metric fractions, NULLs count as violations, the
suite fuses into one scan, and referential checks report orphans."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators import dq


def _plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString().split(
        "== Initial Plan =="
    )[0]


def test_planted_violations_exact_metrics(spark):
    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 50.0), (2, "z", None), (4, "a", -1.0)],
        "id INT, cat STRING, v DOUBLE",
    )
    out = {
        r.check_name: r
        for r in dq.expect(
            df,
            "t",
            [
                dq.unique("id"),
                dq.in_domain("cat", ["a", "b"]),
                dq.in_range("v", 0, 100),
                dq.not_null("v"),
            ],
        ).collect()
    }
    assert out["id_unique"].metric == 0.75 and not out["id_unique"].passed
    assert out["cat_in_domain"].metric == 0.75 and not out["cat_in_domain"].passed
    # NULL v counts as a violation of the range check, not a skip
    assert out["v_in_range"].metric == 0.5 and not out["v_in_range"].passed
    assert out["v_complete"].metric == 0.75 and not out["v_complete"].passed
    assert all(r.tbl == "t" for r in out.values())


def test_clean_table_passes(spark):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "id INT, cat STRING")
    out = dq.expect(
        df, "t", [dq.unique("id"), dq.in_domain("cat", ["a", "b"])]
    ).collect()
    assert all(r.passed and r.metric == 1.0 for r in out)


def test_suite_fuses_into_single_scan(spark, smoke_sf_dir):
    """N checks must not become N scans — the fused aggregate is the
    operator's scale contract."""
    from databricks_etl_spark.sources.readers import read_table

    o = read_table(spark, smoke_sf_dir, "orders")
    report = dq.expect(
        o,
        "orders",
        [
            dq.unique("o_orderkey"),
            dq.in_domain("o_orderstatus", ["P", "O", "F"]),
            dq.in_range("o_totalprice", 0, 10**6),
            dq.not_null("o_orderdate"),
            dq.matches("o_orderpriority", r"^\d-"),
        ],
    )
    assert _plan(report).count("Scan parquet") == 1


def test_references_reports_orphans(spark):
    child = spark.createDataFrame([(1,), (2,), (9,), (9,)], "k INT")
    parent = spark.createDataFrame([(1,), (2,)], "p INT")
    r = dq.expect_references(child, "k", parent, "p", "c").collect()[0]
    assert r.metric == 0.5 and not r.passed
    ok = dq.expect_references(
        child.filter(F.col("k") < 3), "k", parent, "p", "c"
    ).collect()[0]
    assert ok.metric == 1.0 and ok.passed


def test_references_null_child_key_is_not_orphan(spark):
    """NOT IN semantics (r4 ADVICE): a NULL child key never counts as
    an orphan — completeness is not_null's job — but it DOES stay in
    the denominator, so the resolved fraction reflects all rows."""
    child = spark.createDataFrame([(1,), (None,), (9,), (2,)], "k INT")
    parent = spark.createDataFrame([(1,), (2,)], "p INT")
    r = dq.expect_references(child, "k", parent, "p", "c").collect()[0]
    assert r.metric == 0.75 and not r.passed  # 1 orphan (9), NULL excluded
    clean = dq.expect_references(
        child.filter((F.col("k") != 9) | F.col("k").isNull()),
        "k", parent, "p", "c",
    ).collect()[0]
    assert clean.metric == 1.0 and clean.passed  # NULL alone can't fail it


def test_empty_table_fails_every_check(spark):
    """A zero-row scan must not green-light the gate (r4 ADVICE): every
    check on an empty table reports passed=false, metric NULL."""
    empty = spark.createDataFrame([], "id INT, cat STRING")
    out = dq.expect(
        empty, "t", [dq.unique("id"), dq.in_domain("cat", ["a"])]
    ).collect()
    assert len(out) == 2
    assert all(not r.passed and r.metric is None for r in out)
    parent = spark.createDataFrame([(1,)], "p INT")
    fk = dq.expect_references(
        empty.select(F.col("id").alias("k")), "k", parent, "p", "c"
    ).collect()[0]
    assert not fk.passed and fk.metric is None
