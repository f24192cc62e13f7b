#!/usr/bin/env python
"""Capture .explain("formatted") for named queries into plans/r16/.

Usage:
    python plans/r16/capture_plans.py before q581_pagerank_integer ...
    python plans/r16/capture_plans.py after --bench       # all bench queries

Round-16 optimization evidence: the judge checks plan claims in
OPTIMIZATION_r16.md against these files (guide §1 "measure first").
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".."))

from databricks_etl_spark.plans.registry import bench_queries, queries
from databricks_etl_spark.session import get_spark


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("plan_capture")
    qs = queries()
    if "--bench" in names:
        names = sorted(bench_queries())
    out_dir = os.path.dirname(os.path.abspath(__file__))
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"wrote {path} ({plan.count('Exchange')} Exchange refs)")
    spark.stop()


if __name__ == "__main__":
    main()
