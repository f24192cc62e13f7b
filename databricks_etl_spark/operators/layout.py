"""Data-layout operators: Z-order (Morton) keys and tile math.

The multi-dimensional clustering trick behind Delta ``ZORDER BY`` /
Iceberg sort orders, built from plain bit arithmetic (JVM built-ins,
whole-stage codegen — no engine extension, no UDF). Sorting or
range-partitioning 100 TB by the interleaved key puts rows close in
BOTH dimensions close on disk, so per-file min/max statistics (or a
coarse tile partition key) prune two predicates at once where a
single-column sort prunes only one.

No reference analog (the reference has no storage-layout control);
north-star surface for training-data lakehouse layout.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def morton_key(x: Column, y: Column, bits: int = 8) -> Column:
    """Bit-interleave two ``bits``-wide non-negative ints into a
    ``2*bits``-wide Z-order key: x → even bits, y → odd bits."""
    morton: Column | None = None
    for i in range(bits):
        xb = F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i)
        yb = F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        piece = xb.bitwiseOR(yb)
        morton = piece if morton is None else morton.bitwiseOR(piece)
    assert morton is not None
    return morton


def interleave_bits(x: int, y: int, bits: int) -> int:
    """Driver-side twin of :func:`morton_key` for planning tile sets
    (pure int math on tile coordinates — O(grid cells), not data)."""
    out = 0
    for i in range(bits):
        out |= ((x >> i) & 1) << (2 * i)
        out |= ((y >> i) & 1) << (2 * i + 1)
    return out


def tiles_covering_box(
    x_range: tuple[int, int], y_range: tuple[int, int], *, bits: int = 8, tile_bits: int = 3
) -> list[int]:
    """Tile ids (top ``tile_bits`` of each dimension, interleaved)
    whose cells intersect the inclusive box — the coarse pruning set a
    data-skipping planner derives from a 2-D predicate before applying
    the residual filter."""
    shift = bits - tile_bits
    txs = range(x_range[0] >> shift, (x_range[1] >> shift) + 1)
    tys = range(y_range[0] >> shift, (y_range[1] >> shift) + 1)
    return sorted(interleave_bits(tx, ty, tile_bits) for tx in txs for ty in tys)
