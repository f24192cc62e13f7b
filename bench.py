#!/usr/bin/env python
"""Benchmark harness — driver contract.

Runs the headline queries (registry entries flagged ``bench=True``) at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full materialization with a count-style action
(collect of aggregated output), never a raw collect.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_etl_spark.plans.registry import bench_queries
from databricks_etl_spark.session import get_spark

_REPO = os.path.dirname(os.path.abspath(__file__))


def _previous_round_warm() -> tuple[str, dict[str, float]] | None:
    """Per-query warm timings from the newest driver-recorded
    BENCH_r{N}.json, so every bench run reports its own drift vs the
    previous round (VERDICT r3 asked for deltas in the JSON itself)."""
    arts = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))
    if not arts:
        return None
    try:
        with open(arts[-1]) as f:
            parsed = json.load(f).get("parsed") or {}
        prev = parsed.get("queries_warm") or {}
        return (os.path.basename(arts[-1]), {k: float(v) for k, v in prev.items()})
    except (json.JSONDecodeError, TypeError, ValueError):
        return None


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("databricks_etl_spark_bench")

    qs = bench_queries()
    # bisect hook: SPARK_GRAFT_BENCH_ONLY=q01_...,q16_... restricts the
    # headline set (used to separate per-query regressions from
    # whole-JVM session effects — more queries per session means more
    # JIT/GC/cached-relation pressure on every timing)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        qs = {k: v for k, v in qs.items() if k in keep}
    # Warm every headliner once so the timed pass measures data work,
    # not whole-stage-codegen JIT / file-listing (~0.4-1.4s per query
    # first-run tax on this JVM).
    for fn in qs.values():
        fn(spark, sf_dir).count()

    timings: dict[str, float] = {}
    warm: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        df = fn(spark, sf_dir)
        n = df.count()
        timings[name] = round(time.perf_counter() - t0, 4)
        assert n >= 0
        # steady-state: second run skips codegen JIT + file-listing —
        # the number that scales with data volume
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        warm[name] = round(time.perf_counter() - t0, 4)
    total = round(sum(timings.values()), 2)
    # The driver captures only the LAST ~2000 chars of stdout; round 4's
    # line outgrew that (BENCH_r04 parsed: null). Keep the stdout line
    # compact (2-decimal timings, no delta block) and hard-assert the
    # budget; full-precision detail + round-over-round deltas go to
    # stderr, which the driver ignores.
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        "queries_warm": {k: round(v, 2) for k, v in warm.items()},
        "warm_total": round(sum(warm.values()), 2),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    detail = {"queries": timings, "queries_warm": warm}
    prev = _previous_round_warm()
    if prev is not None:
        prev_name, prev_warm = prev
        common = sorted(set(warm) & set(prev_warm))
        if common:
            detail["warm_delta_vs"] = prev_name
            detail["warm_delta_pct"] = {
                k: round((warm[k] - prev_warm[k]) / prev_warm[k] * 100.0, 1)
                for k in common
            }
            detail["warm_total_common"] = round(sum(warm[k] for k in common), 4)
            detail["warm_total_common_prev"] = round(
                sum(prev_warm[k] for k in common), 4
            )
    print(json.dumps(detail), file=sys.stderr)
    line = json.dumps(out)
    assert len(line) < 1900, f"bench line {len(line)} chars exceeds driver capture"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
