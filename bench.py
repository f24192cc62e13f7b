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

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_etl_spark.plans.registry import bench_queries
from databricks_etl_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    spark = get_spark("databricks_etl_spark_bench")

    qs = bench_queries()
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
    total = round(sum(timings.values()), 4)
    print(
        json.dumps(
            {
                "metric": "headline_queries_wall_clock",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_warm": warm,
                "warm_total": round(sum(warm.values()), 4),
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
