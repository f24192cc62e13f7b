"""Round-14 lanes.

All lanes here register ``defer=True``: the round-14 driver window is
already exactly filled by the round-13b backlog (q529–q575), so these
queue for the round-15 window — parity-proven at sf0.01 and
vanilla-session driver-simmed locally meanwhile (the same discipline
the round-13b lanes followed).

Reference parity: the reference corpus (gbaliarda/databricks-etl,
notebooks etl.py / transform.py / pre_analysis.py) has none of these
surfaces — they extend SURVEY.md §2.12's similarity/streaming mandate
(streaming graph maintenance) and the retrieval ladder (late
interaction).
"""

from __future__ import annotations

import shutil

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

import databricks_etl_spark.plans.queries_round13 as _r13
from databricks_etl_spark.operators import graph_ann as GA
from databricks_etl_spark.plans.registry import QUERIES, query
from databricks_etl_spark.sources.readers import read_table
from databricks_etl_spark.sources.writers import scratch_dir

# ---------------------------------------------------------------------------
# q576 — STREAMING graph-ANN maintenance (twin of q509)
# ---------------------------------------------------------------------------
#
# The one asymmetry left in the similarity ladder after round 13: IVF
# has build → incremental → streaming (q384 → q390); the graph rung had
# build (q506) and incremental insert (q509) but no streaming lane.
# Here the q509 insert slice ARRIVES as a stream: each micro-batch
# scores its vectors against the FROZEN base corpus and lands its
# candidate edges in an epoch-idempotent sink (dynamic partition
# overwrite keyed on __epoch — re-delivering an epoch overwrites its
# own partition, the q131 exactly-once discipline); the drain re-ranks
# the landed candidates per inserted node and emits q509's audit card.
# Drain ≡ q509 under ANY slicing: base nodes' edge lists are frozen by
# contract, so per-batch scoring is embarrassingly associative and the
# drain's re-rank is the only global step.


def _q576_ingest(
    base: DataFrame, batch: DataFrame, epoch_id: int, path: str
) -> None:
    """Land one epoch's candidate edges against the frozen base.

    Top-m per inserted node WITHIN the batch (each node arrives in
    exactly one epoch, so the batch-local top-m already contains the
    node's global top-m; the drain re-rank is then a no-op on clean
    delivery and a repair on duplicated delivery)."""
    scored = GA._scored_pairs(
        base, batch, id_col="vec_id", vec_col="embedding"
    ).select(
        F.col("dst").alias("src"),  # inserted node
        F.col("src").alias("dst"),  # frozen base neighbor
        "sim",
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _r13._Q506_M)
        .select("src", "dst", "sim")
        .withColumn("__epoch", F.lit(int(epoch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__epoch")
        .parquet(path)
    )


def _q576_drain(spark: SparkSession, path: str) -> DataFrame:
    """Re-rank landed candidates per inserted node → final edges."""
    landed = (
        spark.read.schema("src long, dst long, sim double, __epoch int")
        .parquet(path)
        .drop("__epoch")
    )
    w = Window.partitionBy("src").orderBy(F.desc("sim"), F.asc("dst"))
    return (
        landed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _r13._Q506_M)
    )


def _q576_oracle() -> str:
    # exact twin of the incremental insert: the stream lands the same
    # edges q509 computes in one shot
    return QUERIES["q509_graph_incremental_insert"].oracle


@query("q576_streaming_graph_insert", oracle=_q576_oracle(), defer=True)
def q576_streaming_graph_insert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q509's incremental graph insert under STREAMING arrival — the
    maintenance path a production vector index actually runs: the
    base graph is frozen (its nodes' edge lists stay byte-identical —
    re-linking is the priced periodic rebuild, q424), each micro-batch
    of arriving vectors scores against the base corpus and lands its
    per-node candidate edges in an epoch-idempotent sink, and the
    drain re-ranks per node and re-prices the audit card.  Drain ≡
    q509's oracle under any slicing (per-node work is epoch-local;
    the re-rank repairs duplicated delivery).

    Scale shape: one base-corpus pass per epoch with the batch
    broadcast (bounded — inserts are small relative to the corpus by
    definition); landed state is |inserts|×m rows; the drain is one
    keyed window + the m-row audit aggregate."""
    emb = read_table(spark, sf_dir, "embeddings")
    is_ins = (
        F.instr(
            F.lit(_r13._Q509_SLICE),
            F.substring(
                F.md5(
                    F.concat(F.lit("gi:"), F.col("vec_id").cast("string"))
                ),
                1,
                1,
            ),
        )
        > 0
    )
    base = emb.filter(~is_ins).localCheckpoint()
    ins = emb.filter(is_ins)
    root = scratch_dir("graphins_stream_", key=sf_dir)
    shutil.rmtree(root, ignore_errors=True)
    path = f"{root}/candidates"
    k = _r13._STREAM_EPOCHS  # read at call time: tests raise it
    for ep in range(k):
        _q576_ingest(
            base, ins.filter(F.col("vec_id") % k == ep), ep, path
        )
    new_edges = _q576_drain(spark, path)
    counts = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_base_nodes")
    ).crossJoin(
        ins.agg(F.count(F.lit(1)).cast("long").alias("n_inserted"))
    )
    return (
        new_edges.groupBy("rank")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.round(
                F.sum(F.col("sim").cast("decimal(28,6)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("mean_sim"),
        )
        .select(
            F.col("rank").cast("long").alias("rank"), "n_edges", "mean_sim"
        )
        .crossJoin(F.broadcast(counts))
    )
