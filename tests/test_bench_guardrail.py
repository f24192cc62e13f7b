"""Bench regressions caught in-round, not by the next judge.

Two gates (r4 verdict #8 + #2):
- the warm wall-clock of the headline set at sf0.01 stays under an
  intentionally LOOSE committed ceiling (concurrent pytest load
  inflates timings ~25%, so the ceiling is ~60% above a loaded
  measurement — this catches a 2x regression, not a 10% drift);
- the stdout JSON line bench.py would print fits the driver's
  2,000-char capture even with worst-case timing widths (BENCH_r04
  parsed: null was exactly this failure).
"""

from __future__ import annotations

import json
import time

from databricks_etl_spark.plans.registry import bench_queries

# Committed ceiling for the 23-query warm total at sf0.01. Measured
# 14.7s clean on the round-5 box and set; re-baselined round 17 after
# the sanctioned q353->q581 bench rotation (q581 is the deliberately
# heavy iterative-graph slot) and cross-round box drift pushed a clean
# run to 29.5s. Concurrent full-suite load adds ~25%. Loose by design:
# this catches a 2x regression in-round, not a 10% drift.
_WARM_CEILING_SEC = 48.0


def test_headline_warm_total_under_ceiling(spark, sf_dir):
    qs = bench_queries()
    assert len(qs) >= 23, "headline set shrank"
    for fn in qs.values():  # warm pass: JIT + file listing
        fn(spark, sf_dir).count()
    t0 = time.perf_counter()
    for fn in qs.values():
        fn(spark, sf_dir).count()
    total = time.perf_counter() - t0
    assert total < _WARM_CEILING_SEC, (
        f"headline warm total {total:.1f}s exceeds {_WARM_CEILING_SEC}s "
        "ceiling — a bench regression landed this round"
    )


def test_bench_stdout_line_fits_driver_capture():
    """Reconstruct the line bench.py prints with worst-case timing
    widths (4 digits + 2 decimals per query — a 2.7 h single-query
    wall, far beyond anything the warm-ceiling test or the driver's
    2x budget would survive, so the width bound is vacuous-safe) —
    must stay <1,900 chars so the driver's 2,000-char tail capture
    always parses it."""
    names = list(bench_queries())
    worst = {n: 9999.99 for n in names}
    line = json.dumps(
        {
            "metric": "headline_queries_wall_clock",
            "value": 99999.99,
            "unit": "sec",
            "queries": worst,
            "queries_warm": {n: 9999.9 for n in names},  # bench emits warm @1dp
            "warm_total": 99999.99,
            "sf": 0.1,
            "load1": 999.9,
            "attempt": 99,
        }
    )
    assert len(line) < 1900, (
        f"bench line would be {len(line)} chars — trim the headline set "
        "or move fields to stderr"
    )
    # the width cap binds at the current set size: the headline set can
    # only ROTATE, not grow (r11 ADVICE — make the constraint explicit)
    assert len(names) <= 23, (
        f"headline set grew to {len(names)} — rotate a veteran out "
        "instead of adding (the 1,900-char capture line is at capacity)"
    )


import os
import subprocess
import sys

import pytest


@pytest.mark.slow  # boots its own JVM (~40s)
def test_bench_cli_contract_end_to_end():
    """The driver's actual invocation: `python bench.py` must put ONE
    parseable JSON line as the LAST stdout line (Spark logs may only
    go to stderr), with the contract keys, under the capture budget."""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(
        os.environ,
        SPARK_GRAFT_SF_DIR="/root/testdata/sf0.001",
        SPARK_GRAFT_BENCH_ONLY="q16_tpch_q1_pricing_summary,q01_revenue_by_nation",
    )
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=repo,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    last = out.stdout.strip().splitlines()[-1]
    assert len(last) < 1900
    d = json.loads(last)
    for k in [
        "metric", "value", "unit", "queries", "queries_warm", "warm_total",
        "sf", "load1", "attempt",
    ]:
        assert k in d, k
    assert d["unit"] == "sec" and d["sf"] == 0.001
    assert d["attempt"] >= 1 and d["load1"] >= 0.0
    assert set(d["queries"]) == {
        "q16_tpch_q1_pricing_summary", "q01_revenue_by_nation",
    }
