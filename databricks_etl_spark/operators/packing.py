"""Sequence packing for training dataloaders: first-fit-decreasing
bin-packing of documents into fixed-token-budget sequences.

FFD is an inherently sequential fold (each placement depends on every
earlier one), so it is the sanctioned ``applyInPandas`` case: the fold
runs Arrow-batched inside fixed-size PLANNING SHARDS that pack
independently and in parallel — the standard 100 TB compromise (one
global FFD would serialize the cluster). Sharding is ``doc_id % S``
with S sized so each shard holds ~``shard_size`` docs: deterministic,
shuffle-free beyond the one groupBy, and the waste bound degrades only
by <= 1 partial sequence per shard vs global FFD. Inside a shard the
classic (length DESC, doc_id ASC) FFD total order applies, so the plan
is bit-reproducible on any partitioning/engine — a DuckDB recursive
CTE states the identical placement (plans/queries_round8.py).

NOTE: this module deliberately has no ``from __future__ import
annotations`` (pandas-UDF machinery breaks under it — CLAUDE.md).

No reference counterpart (the reference has no training-data
machinery); extends SURVEY.md §2.12.
"""

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_SEQ_NS = 1_000_000  # seq_id = shard * _SEQ_NS + within-shard bin (1-based)


def ffd_pack(
    docs: DataFrame,
    budget: int,
    shard_size: int = 128,
    *,
    id_col: str = "doc_id",
    len_col: str = "len",
    group_col: str = None,
    shard_col: str = None,
) -> DataFrame:
    """Pack ``docs`` (``id_col``, ``len_col`` token counts) into
    sequences of capacity ``budget`` via per-shard FFD.

    Returns one row per document: (doc_id, seq_id, seq_offset,
    n_tokens) with the invariants a training dataloader relies on —
    every doc placed exactly once, per-sequence token sums never
    exceed ``budget``, and segments within a sequence are contiguous
    from offset 0 (FFD fills bins front-to-back). Lengths are clamped
    to ``budget`` (an over-long doc occupies a full sequence; the
    chunking lane is the upstream fix for those).

    With ``group_col`` (an integral column), each group packs into its
    OWN sequences — sequences never mix groups, ``seq_id`` is unique
    only within a group, and the group column is carried through the
    output. Shard moduli are sized per group from a broadcast count
    relation, so the grouped path has NO driver-side action at all
    (the ungrouped path keeps its single sanctioned scalar count).
    The dataloader capstone packs per epoch-class this way, so a
    sequence replays a uniform number of epochs.

    With ``shard_col`` (an integral column), the caller supplies the
    planning-shard assignment and NO modulus is derived from counts —
    the incremental-maintenance path: a persisted packing's shard
    moduli are part of the artifact, so a delta re-pack must reuse the
    FROZEN moduli (re-deriving them from the grown corpus would move
    every doc's shard and re-pack the world). The caller owns the
    seq_id-namespace bound in this mode (shard values and per-shard
    doc counts are theirs); _ffd still hard-fails before a collision.
    """
    if budget < 1 or not (1 <= shard_size <= _SEQ_NS):
        raise ValueError(
            f"ffd_pack requires budget >= 1 and 1 <= shard_size <= "
            f"{_SEQ_NS} (seq_id packs the within-shard bin below the "
            f"shard multiplier; docs per shard — and hence bins — are "
            f"bounded by shard_size only in expectation under uniform "
            f"doc_id residues, so _ffd re-asserts the bound per shard), "
            f"got budget={budget} shard_size={shard_size}"
        )
    import pandas as pd

    head = [F.col(group_col).cast("long").alias(group_col)] if group_col else []
    sel = docs.select(
        *head,
        F.col(id_col).cast("long").alias("doc_id"),
        F.least(F.col(len_col), F.lit(budget)).cast("long").alias("len"),
        *(
            [F.col(shard_col).cast("long").alias("shard")]
            if shard_col is not None
            else []
        ),
    )
    if shard_col is not None:
        it = sel
    elif group_col is None:
        n = docs.count()  # one scalar to size the shard modulus
        n_shards = max(1, math.ceil(n / shard_size))
        it = sel.withColumn("shard", (F.col("doc_id") % n_shards).cast("long"))
    else:
        cnt = sel.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n"))
        it = (
            sel.join(F.broadcast(cnt), group_col)
            .withColumn(
                "shard",
                (
                    F.col("doc_id") % F.ceil(F.col("__n") / F.lit(shard_size))
                ).cast("long"),
            )
            .drop("__n")
        )
    gcols = ([group_col] if group_col else []) + ["shard"]
    out_cols = ([group_col] if group_col else []) + [
        "doc_id",
        "seq_id",
        "seq_offset",
        "n_tokens",
    ]
    schema = ", ".join(f"{c} long" for c in out_cols)

    def _ffd(pdf):
        pdf = pdf.sort_values(["len", "doc_id"], ascending=[False, True])
        shard = int(pdf["shard"].iloc[0])
        extra = (int(pdf[group_col].iloc[0]),) if group_col else ()
        residuals = []
        out = []
        for doc_id, ln in zip(pdf["doc_id"], pdf["len"]):
            ln = int(ln)
            j = next((i for i, r in enumerate(residuals) if r >= ln), None)
            if j is None:
                # seq_id packs bin j+1 (1-based) into the _SEQ_NS slots
                # below the shard multiplier; shard sizing only bounds
                # bins IN EXPECTATION (skewed doc_id residues can
                # overfill a shard), so fail loudly before seq_ids
                # would collide across shards — identically on both
                # engines, where the oracle could not catch it.
                if len(residuals) + 1 >= _SEQ_NS:
                    raise ValueError(
                        f"ffd_pack: shard {shard} needs more than "
                        f"{_SEQ_NS - 1} bins (skewed {id_col} residues); "
                        f"seq_ids would collide across shards — lower "
                        f"shard_size or re-key {id_col}"
                    )
                residuals.append(budget - ln)
                j = len(residuals) - 1
                off = 0
            else:
                off = budget - residuals[j]
                residuals[j] -= ln
            out.append((*extra, int(doc_id), shard * _SEQ_NS + j + 1, off, ln))
        return pd.DataFrame(out, columns=out_cols)

    return it.groupBy(*gcols).applyInPandas(_ffd, schema)
