"""Edge-case tests for the as-of join operator (ADVICE round 1):
NULL payloads in matching right rows must propagate (not carry an
older value forward), and ties among right rows sharing an identical
(key, ts) must resolve deterministically.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators.asof import asof_join


def _left(spark):
    return spark.createDataFrame(
        [("k", 10), ("k", 20), ("k", 30)], "id string, ts long"
    )


def test_asof_null_payload_overwrites(spark):
    """A later right row whose payload is NULL is still 'the most
    recent state' — it must overwrite the older non-NULL value, the
    row-join semantics DuckDB ASOF JOIN has."""
    right = spark.createDataFrame(
        [("k", 5, 100), ("k", 15, None)], "id string, ts long, price int"
    )
    out = {
        r["ts"]: r["price"]
        for r in asof_join(
            _left(spark), right, on="id", left_ts="ts", right_ts="ts",
            payload_cols=["price"],
        ).collect()
    }
    assert out[10] == 100
    assert out[20] is None  # NULL payload at ts=15 overwrites 100
    assert out[30] is None


def test_asof_equal_ts_tie_deterministic(spark):
    """Two right rows at the identical (key, ts): the winner is the
    greatest payload struct — stable across partitionings/runs."""
    right = spark.createDataFrame(
        [("k", 10, 1), ("k", 10, 2)], "id string, ts long, v int"
    )
    for _ in range(3):
        out = {
            r["ts"]: r["v"]
            for r in asof_join(
                _left(spark).repartition(7), right.repartition(5),
                on="id", left_ts="ts", right_ts="ts", payload_cols=["v"],
            ).collect()
        }
        assert out == {10: 2, 20: 2, 30: 2}


def test_asof_no_match_yields_nulls(spark):
    right = spark.createDataFrame([("k", 25, 7)], "id string, ts long, v int")
    out = {
        r["ts"]: r["v"]
        for r in asof_join(
            _left(spark), right, on="id", left_ts="ts", right_ts="ts",
            payload_cols=["v"],
        ).collect()
    }
    assert out == {10: None, 20: None, 30: 7}


def test_asof_multi_payload_from_same_row(spark):
    """All payload columns must come from the SAME right row (struct
    fill), never mixed across rows column-by-column."""
    right = spark.createDataFrame(
        [("k", 5, 1, None), ("k", 15, None, 2)],
        "id string, ts long, a int, b int",
    )
    out = {
        r["ts"]: (r["a"], r["b"])
        for r in asof_join(
            _left(spark), right, on="id", left_ts="ts", right_ts="ts",
            payload_cols=["a", "b"],
        ).collect()
    }
    assert out[10] == (1, None)
    assert out[20] == (None, 2)  # not (1, 2): fields never mix rows
    assert out[30] == (None, 2)


def test_asof_forward_strict_after_tolerance_and_tiebreak(spark):
    """Forward as-of edge semantics the fixture can't guarantee to hit:
    a right row at EXACTLY the left ts is not a match (strict >), a
    right row at exactly ts+tolerance IS (inclusive <=), one just past
    it is not, and equal-timestamp right rows resolve to the least
    payload struct (id tiebreak)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from databricks_etl_spark.operators.asof import asof_join_forward

    base = dt.datetime(2024, 1, 1)
    s = dt.timedelta(seconds=1)
    left = spark.createDataFrame(
        [
            (1, 10, base),            # match at +tol exactly
            (1, 11, base + 500 * s),  # no right row within tol
            (2, 20, base),            # equal-ts right must NOT match; later one does
            (3, 30, base),            # two rights at same ts → least id wins
        ],
        "user_id long, click_id long, cts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, 100, base + 30 * s),   # exactly +tolerance for click 10
            (2, 200, base),            # equal ts → excluded (strict after)
            (2, 201, base + 31 * s),   # past tolerance → excluded
            (3, 302, base + 5 * s),
            (3, 301, base + 5 * s),    # same ts as 302 → 301 wins (least id)
        ],
        "user_id long, purchase_id long, pts timestamp",
    )
    out = asof_join_forward(
        left, right, on="user_id", left_ts="cts", right_ts="pts",
        payload_cols=["purchase_id"], tolerance_seconds=30,
    )
    got = {r["click_id"]: r["purchase_id"] for r in out.collect()}
    assert got == {10: 100, 11: None, 20: None, 30: 301}
    assert out.count() == left.count()  # left rows preserved
