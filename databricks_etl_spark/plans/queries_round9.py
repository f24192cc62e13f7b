r"""Round-9 queries: the dataloader-order capstone (the deterministic
epoch-by-epoch training stream composing the q312 manifest, q323 epoch
budgets, grouped FFD packing and MINSTD shuffle keys), incremental
manifest maintenance (delta docs scored against the persisted corpus
index without re-scoring the corpus), a greedy longest-match subword
tokenizer with a packing re-run on subword lengths, chunk-grain MinHash
near-dup, and a RAG retrieval-eval lane (VERDICT r8 #2/#3/#4/#5/#7).

No reference counterpart: the reference notebooks (pre_analysis.py /
pre_process.py / transform.py) have no training-data machinery at all;
these extend the engine's north-star LLM-data surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from dataclasses import replace as _replace

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import QUERIES, query
from databricks_etl_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# q326 — dataloader-order capstone: the epoch-by-epoch training stream
# ---------------------------------------------------------------------------

_Q326_B = 256  # token budget per sequence (q313's)
_Q326_P = 128  # planning-shard size (q313's)
_Q326_SEQNS = 1_000_000  # operators.packing._SEQ_NS
_Q326_BKTS = 64  # step-rank bucket fan-out (distributed dense rank)
_MINSTD_P = 1_000_000_007


def _q326_oracle() -> str:
    from databricks_etl_spark.plans.queries_round7 import _Q291_TOKS

    o312 = QUERIES["q312_training_manifest"].oracle
    o323 = QUERIES["q323_epoch_allocation"].oracle
    fit = (
        "list_filter(range(1, len(p.res) + 1), "
        "jj -> p.res[jj] >= i.len)[1]"
    )
    return f"""
        WITH RECURSIVE
        ship AS (SELECT doc_id FROM ({o312}) WHERE ship),
        ep AS (SELECT source, epochs FROM ({o323})),
        base AS (
            SELECT d.doc_id, least({_Q291_TOKS}, {_Q326_B}) AS len,
                   e.epochs AS eclass
            FROM documents d
            JOIN ship ON d.doc_id = ship.doc_id
            JOIN ep e ON d.source = e.source
        ),
        sc AS (
            SELECT eclass, CAST(ceil(COUNT(*) / {_Q326_P}.0) AS BIGINT) AS s
            FROM base GROUP BY 1
        ),
        it AS (
            SELECT b.doc_id, b.len, b.eclass, b.doc_id % sc.s AS shard,
                   row_number() OVER (
                       PARTITION BY b.eclass, b.doc_id % sc.s
                       ORDER BY b.len DESC, b.doc_id) AS k
            FROM base b JOIN sc ON b.eclass = sc.eclass
        ),
        pack AS (
            SELECT eclass, shard, CAST(0 AS BIGINT) AS k,
                   CAST([] AS BIGINT[]) AS res,
                   CAST(NULL AS BIGINT) AS doc_id,
                   CAST(NULL AS BIGINT) AS bin,
                   CAST(NULL AS BIGINT) AS off
            FROM (SELECT DISTINCT eclass, shard FROM it)
            UNION ALL
            SELECT i.eclass, i.shard, i.k,
                   CASE WHEN {fit} IS NULL
                        THEN list_append(p.res, {_Q326_B} - i.len)
                        ELSE list_transform(range(1, len(p.res) + 1),
                             jj -> CASE WHEN jj = {fit}
                                        THEN p.res[jj] - i.len
                                        ELSE p.res[jj] END)
                   END,
                   i.doc_id,
                   COALESCE({fit}, len(p.res) + 1),
                   CASE WHEN {fit} IS NULL THEN 0
                        ELSE {_Q326_B} - p.res[{fit}]
                   END
            FROM pack p
            JOIN it i ON i.eclass = p.eclass AND i.shard = p.shard
                     AND i.k = p.k + 1
        ),
        placed AS (
            SELECT p.eclass, p.doc_id,
                   (p.shard * {_Q326_SEQNS} + p.bin) * 8 + p.eclass
                       AS seq_uid,
                   p.off
            FROM pack p WHERE p.k >= 1
        ),
        es AS (
            SELECT seq_uid, unnest(range(1, eclass + 1)) AS epoch
            FROM (SELECT DISTINCT eclass, seq_uid FROM placed)
        ),
        kb AS (
            SELECT epoch, seq_uid, uk, uk % {_Q326_BKTS} AS bucket
            FROM (
                SELECT epoch, seq_uid,
                       ((seq_uid % {_MINSTD_P}) * 48271 + epoch * 7919)
                           % {_MINSTD_P} AS uk
                FROM es
            )
        ),
        pre AS (
            SELECT epoch, bucket,
                   COALESCE(SUM(c) OVER (
                       PARTITION BY epoch ORDER BY bucket
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                   ), 0) AS offs
            FROM (SELECT epoch, bucket, COUNT(*) AS c FROM kb GROUP BY 1, 2)
        ),
        stepped AS (
            SELECT k.epoch, k.seq_uid,
                   p.offs + row_number() OVER (
                       PARTITION BY k.epoch, k.bucket
                       ORDER BY k.uk, k.seq_uid) AS step
            FROM kb k JOIN pre p ON k.epoch = p.epoch AND k.bucket = p.bucket
        )
        SELECT CAST(s.epoch AS BIGINT) AS epoch,
               CAST(s.step AS BIGINT) AS step,
               CAST(s.seq_uid AS BIGINT) AS seq_id,
               pl.doc_id,
               CAST(pl.off AS BIGINT) AS seq_offset
        FROM stepped s JOIN placed pl ON s.seq_uid = pl.seq_uid
    """


@query("q326_dataloader_order", oracle=None)  # oracle set below
def q326_dataloader_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dataloader-order capstone: the exact (epoch, step, seq_id,
    doc_id, seq_offset) stream a training dataloader replays,
    composing the lanes the engine already proves — q312's ship
    verdicts (what trains), q323's per-source epoch budgets (how many
    times), grouped FFD packing (how docs pack into sequences) and
    q315's MINSTD key discipline (the deterministic epoch shuffle).

    Docs are packed PER EPOCH-CLASS (``ffd_pack(group_col=...)``):
    every doc in a sequence shares the same epoch count, so the whole
    sequence replays uniformly in epochs 1..eclass and each shipped
    doc appears exactly epochs(source) times — the capstone invariant.
    seq_id = (shard * 1e6 + bin) * 8 + eclass stays collision-free at
    any shard count because the eclass lives in the LOW three bits,
    not above the shard field.

    The per-epoch step numbering is a distributed dense rank, never a
    single-task window: sequences land in {_Q326_BKTS} MINSTD-keyed
    buckets, a tiny (epochs x buckets) count relation provides
    broadcast prefix offsets, and step = prefix + row_number within
    (epoch, bucket) — the global permutation a dataloader needs,
    computed {_Q326_BKTS}-ways parallel per epoch. The permutation is
    ordered by (bucket, key, seq_id): deterministic, engine-identical
    (pure modular arithmetic), and epoch-dependent so no two epochs
    replay the same order. Every composition join is keyed on doc_id
    or seq_id; component costs dominate by design."""
    from databricks_etl_spark.operators.packing import ffd_pack
    from databricks_etl_spark.operators.text import tokens_col
    from databricks_etl_spark.plans.queries_round8 import (
        q312_training_manifest,
        q323_epoch_allocation,
    )

    ship = q312_training_manifest(spark, sf_dir).filter("ship").select("doc_id")
    ep = q323_epoch_allocation(spark, sf_dir).select("source", "epochs")
    d = read_table(spark, sf_dir, "documents")
    base = (
        d.join(ship, "doc_id")
        .join(F.broadcast(ep), "source")
        .select(
            "doc_id",
            F.size(tokens_col("text")).cast("long").alias("len"),
            F.col("epochs").cast("long").alias("eclass"),
        )
    )
    packed = ffd_pack(base, _Q326_B, _Q326_P, group_col="eclass")
    placed = packed.select(
        "eclass",
        "doc_id",
        (F.col("seq_id") * 8 + F.col("eclass")).alias("seq_uid"),
        "seq_offset",
    )
    es = (
        placed.select("eclass", "seq_uid")
        .distinct()
        .select(
            "seq_uid",
            F.explode(
                F.sequence(F.lit(1).cast("long"), F.col("eclass"))
            ).alias("epoch"),
        )
    )
    uk = (
        (F.col("seq_uid") % _MINSTD_P) * 48271 + F.col("epoch") * 7919
    ) % _MINSTD_P
    kb = es.withColumn("uk", uk).withColumn(
        "bucket", F.col("uk") % _Q326_BKTS
    )
    cnts = kb.groupBy("epoch", "bucket").agg(F.count(F.lit(1)).alias("c"))
    wpre = (
        Window.partitionBy("epoch")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    pre = cnts.select(
        "epoch", "bucket", F.coalesce(F.sum("c").over(wpre), F.lit(0)).alias("offs")
    )
    wrn = Window.partitionBy("epoch", "bucket").orderBy("uk", "seq_uid")
    stepped = (
        kb.join(F.broadcast(pre), ["epoch", "bucket"])
        .select(
            "epoch",
            "seq_uid",
            (F.col("offs") + F.row_number().over(wrn)).cast("long").alias("step"),
        )
    )
    return stepped.join(placed, "seq_uid").select(
        F.col("epoch").cast("long").alias("epoch"),
        "step",
        F.col("seq_uid").alias("seq_id"),
        "doc_id",
        "seq_offset",
    )


QUERIES["q326_dataloader_order"] = _replace(
    QUERIES["q326_dataloader_order"], oracle=_q326_oracle()
)
