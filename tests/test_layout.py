"""Z-order layout: morton key correctness and real partition pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from databricks_etl_spark.operators.layout import (
    interleave_bits,
    morton_key,
    tiles_covering_box,
)
from databricks_etl_spark.sources.readers import read_table


def test_interleave_bits_known_values():
    # x=0b11, y=0b01 → bits: x0→b0, y0→b1, x1→b2, y1→b3 = 0b0111
    assert interleave_bits(3, 1, 2) == 0b0111
    assert interleave_bits(0, 0, 8) == 0
    assert interleave_bits(255, 255, 8) == 0xFFFF


def test_morton_key_matches_driver_twin(spark):
    df = spark.range(512).select(
        (F.col("id") % 16).alias("x"), (F.col("id") / 16).cast("long").alias("y")
    )
    got = df.select("x", "y", morton_key(F.col("x"), F.col("y"), 5).alias("m")).collect()
    for r in got:
        assert r["m"] == interleave_bits(r["x"], r["y"], 5), (r["x"], r["y"])


def test_tiles_covering_box_aligned_and_unaligned():
    # aligned 2x2 tile box at tile_bits=3 (tile cell = 32 wide)
    t = tiles_covering_box((64, 127), (32, 95), bits=8, tile_bits=3)
    assert len(t) == 4 and t == sorted(set(t))
    # unaligned box still covers the straddled tiles
    t2 = tiles_covering_box((60, 70), (30, 40), bits=8, tile_bits=3)
    assert {interleave_bits(tx, ty, 3) for tx in (1, 2) for ty in (0, 1)} == set(t2)


def test_q148_prunes_partitions_and_matches_direct_filter(spark, smoke_sf_dir, tmp_path):
    """The written tile layout must (1) show PartitionFilters on the
    tile column in the physical plan — proof Catalyst prunes
    directories rather than scanning everything — and (2) return
    exactly the rows a direct (unpruned) box filter returns."""
    from databricks_etl_spark.operators.layout import morton_key as mk

    o = read_table(spark, smoke_sf_dir, "orders")
    x = (F.col("o_custkey") % 256).cast("long")
    y = F.floor(F.unix_timestamp("o_orderdate") / F.lit(86400)).cast("long") % 256
    laid = o.select("o_orderkey", x.alias("x"), y.alias("y")).withColumn(
        "tile", F.shiftright(mk(F.col("x"), F.col("y"), 8), 10)
    )
    out = str(tmp_path / "z")
    laid.repartition(4, "tile").write.partitionBy("tile").parquet(out)

    tiles = tiles_covering_box((64, 127), (32, 95), bits=8, tile_bits=3)
    pruned = (
        spark.read.parquet(out)
        .filter(F.col("tile").isin(tiles))
        .filter(F.col("x").between(64, 127) & F.col("y").between(32, 95))
    )
    direct = laid.filter(F.col("x").between(64, 127) & F.col("y").between(32, 95))
    assert sorted(r["o_orderkey"] for r in pruned.collect()) == sorted(
        r["o_orderkey"] for r in direct.collect()
    )

    ep = pruned._jdf.queryExecution().executedPlan()
    plan = ep.toString()
    assert "PartitionFilters" in plan and "tile" in plan.split("PartitionFilters", 1)[1][:200]

    # pruning physically skipped directories: the scan's numPartitions
    # metric (post-collect) must be the covering-tile count, not the
    # total tile count written (inputFiles() would lie — it lists the
    # relation's files BEFORE partition pruning)
    import os

    total_tiles = sum(1 for e in os.listdir(out) if e.startswith("tile="))
    assert total_tiles > len(tiles), "fixture too small to prove pruning"

    def leaves(node):
        n = node.children().size()
        if n == 0:
            return [node]
        got = []
        for i in range(n):
            got += leaves(node.children().apply(i))
        return got

    scans = [x for x in leaves(ep) if "FileSourceScan" in x.getClass().getSimpleName()]
    assert scans, f"no file scan leaf in plan:\n{plan}"
    num_parts = scans[0].metrics().apply("numPartitions").value()
    assert num_parts <= len(tiles), f"scanned {num_parts} dirs, expected <= {len(tiles)}"
