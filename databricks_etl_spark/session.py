"""SparkSession factory.

The reference notebooks run on a managed Databricks runtime and never
configure Spark themselves (session is ambient). Here the session is
explicit, and tuned for correctness-vs-oracle and scale:

- AQE on (runtime join-strategy switch, skew-join split, partition
  coalescing) — the "no hand-scheduling" rule from SURVEY.md §4.2.
- UTC session timezone so timestamp semantics match the DuckDB oracle.
- Arrow on for any pandas boundary (Pandas UDFs, ``toPandas``).
- ``spark.sql.shuffle.partitions`` sized to local cores; on a real
  cluster this is overridden by AQE coalescing anyway.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "databricks_etl_spark", *, cpus: int | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``cpus`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or 32.
    """
    n = cpus or DEFAULT_SHUFFLE_PARTITIONS
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # AQE's runtime SortMergeJoin→ShuffledHashJoin rewrite (guide
        # §3.1) stays at the upstream default (0 = off): measured at
        # sf0.1 it REGRESSED the sort-merge bench lanes (q185 2.9→4.0s,
        # q130 2.0→3.1s warm with the rewrite bounded at 64m) — the
        # per-partition hash-table builds cost more than the small
        # sorts they replace at this partition size. Knob kept for
        # cluster profiles where partitions are 100MB+.
        .config(
            "spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold",
            os.environ.get("SPARK_GRAFT_SHJ_LOCALMAP_MAX", "0"),
        )
        # AQE coalescePartitions.parallelismFirst stays at the upstream
        # default (true). A/B'd on the full bench + targeted lanes
        # (r17, VERDICT #10): false (respect the 64 MB advisory size)
        # helped the many-tiny-stage lanes ~10% (q131 1.43->1.26,
        # q312/q457/q581 in the clean full-bench pair) but REGRESSED
        # q523's two-phase quantile path ~30% (2.52->3.33 repeat
        # median) — net ambiguous under this box's noise, so the
        # upstream default keeps the known-good q523 shape. Knob kept
        # for cluster profiles where the advisory size is meaningful.
        .config(
            "spark.sql.adaptive.coalescePartitions.parallelismFirst",
            os.environ.get("SPARK_GRAFT_AQE_PARALLELISM_FIRST", "true"),
        )
        # Whole-stage-codegen fallback bound aligned with the JVM JIT:
        # HotSpot refuses to JIT methods over 8000 bytecodes
        # (-XX:DontCompileHugeMethods), so a generated method bigger
        # than that runs as INTERPRETED BYTECODE — measured 2-4x slower
        # than Spark's own expression interpreter on the 32-dim
        # retrieval kernels (q388 scored pass 2.7s -> 1.1s with the
        # bound). Spark's default (65535) keeps codegen for methods the
        # JIT will never compile; 8000 falls back exactly where
        # compiled execution cannot happen. Scale-independent: the
        # check is on generated-code size, not data size.
        .config(
            "spark.sql.codegen.hugeMethodLimit",
            os.environ.get("SPARK_GRAFT_HUGE_METHOD_LIMIT", "8000"),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
