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
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from databricks_etl_spark.plans.registry import bench_queries
from databricks_etl_spark.session import get_spark

_REPO = os.path.dirname(os.path.abspath(__file__))


def _previous_round_warm() -> tuple[str, dict[str, float], float | None] | None:
    """Per-query warm timings (and machine load, if recorded) from the
    newest driver-recorded BENCH_r{N}.json, so every bench run reports
    its own drift vs the previous round (VERDICT r3 asked for deltas in
    the JSON itself; VERDICT r6 asked that deltas only be trusted
    between like-loaded runs)."""
    arts = sorted(glob.glob(os.path.join(_REPO, "BENCH_r*.json")))
    if not arts:
        return None
    try:
        with open(arts[-1]) as f:
            parsed = json.load(f).get("parsed") or {}
        prev = parsed.get("queries_warm") or {}
        load = parsed.get("load1")
        return (
            os.path.basename(arts[-1]),
            {k: float(v) for k, v in prev.items()},
            float(load) if load is not None else None,
        )
    except (json.JSONDecodeError, TypeError, ValueError):
        return None


def _attempt_number(sf_dir: str) -> int:
    """1-based count of bench invocations for this (sf_dir, day) —
    scratch state in /tmp, NOT the repo. The r6 capture's tail recorded
    a retried run on a badly loaded machine; stamping the attempt makes
    retries visible in the artifact instead of inferred from tails."""
    import datetime

    key = f"{sf_dir}:{datetime.date.today().isoformat()}"
    # UID-namespaced so two users on a shared machine never collide on
    # (or lose tracking to) each other's scratch file.
    uid = os.getuid() if hasattr(os, "getuid") else 0
    path = os.path.join(
        tempfile.gettempdir(), f"spark_graft_bench_attempts_{uid}.json"
    )
    try:
        with open(path) as f:
            state = json.load(f)
    except (OSError, json.JSONDecodeError):
        state = {}
    n = int(state.get(key, 0)) + 1
    today = key.rsplit(":", 1)[-1]
    # keep every key for TODAY (different sf_dirs count independently);
    # prune stale days
    state = {k: v for k, v in state.items() if k.endswith(today)}
    state[key] = n
    try:
        with open(path, "w") as f:
            json.dump(state, f)
    except OSError:
        pass
    return n


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    load_start = os.getloadavg()
    attempt = _attempt_number(sf_dir)
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
    load_end = os.getloadavg()
    # ambient load BEFORE this process spun up its executors: the
    # 1-min average at start. The r6 round-over-round "+17% regression"
    # was a loaded machine; this makes that visible in the artifact.
    out = {
        "metric": "headline_queries_wall_clock",
        "value": total,
        "unit": "sec",
        "queries": {k: round(v, 2) for k, v in timings.items()},
        # warm at 1 decimal: keeps the worst-case line under the 1900-
        # char driver budget with the r7 load telemetry added; full
        # precision is in the stderr detail block
        "queries_warm": {k: round(v, 1) for k, v in warm.items()},
        "warm_total": round(sum(warm.values()), 2),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "load1": round(load_start[0], 1),
        "attempt": attempt,
    }
    detail = {
        "queries": timings,
        "queries_warm": warm,
        "load_start": [round(x, 2) for x in load_start],
        "load_end": [round(x, 2) for x in load_end],
        "attempt": attempt,
    }
    prev = _previous_round_warm()
    if prev is not None:
        prev_name, prev_warm, prev_load = prev
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
            # like-loaded gate: deltas are only comparable when both
            # captures started at similar ambient load (±8 on the 1-min
            # average for this 32-cpu box ≈ ±25% of capacity)
            if prev_load is None:
                detail["warm_delta_caveat"] = (
                    f"{prev_name} carries no load telemetry — treat "
                    "deltas as unconfirmed"
                )
            elif abs(load_start[0] - prev_load) > 8.0:
                detail["warm_delta_caveat"] = (
                    f"load mismatch (cur {load_start[0]:.1f} vs prev "
                    f"{prev_load:.1f}) — deltas not like-loaded"
                )
    print(json.dumps(detail), file=sys.stderr)
    line = json.dumps(out)
    assert len(line) < 1900, f"bench line {len(line)} chars exceeds driver capture"
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
