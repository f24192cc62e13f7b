r"""Round-8 queries: the training-set manifest capstone (ONE per-doc
ship/no-ship verdict composing the round-7 decontamination / SemDeDup /
multimodal / quality / drift lanes), the sequence-packing planner that
FIXES the padding waste q291 measures, temperature-weighted source
mixing, a product-quantization audit, and chunk-level contamination
(VERDICT r7 #2/#3/#4/#5/#7).

No reference counterpart: the reference notebooks (pre_analysis.py /
pre_process.py / transform.py) have no training-data machinery at all;
these extend the engine's north-star LLM-data surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.plans.registry import QUERIES, query
from databricks_etl_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# q312 — training-set manifest capstone (ship/no-ship per document)
# ---------------------------------------------------------------------------

_Q312_QUALITY_MIN = 0.5  # composite quality-score ship floor
_Q312_PSI_MAX = 0.25  # corpus-level vocab-drift alarm (PSI >= 0.25 holds)


def _q312_oracle() -> str:
    """The manifest oracle literally embeds the component queries'
    own (already driver-green) oracle SQL as subqueries — the deepest
    form of "every input is oracled": the composition can never drift
    from the lanes it claims to compose. DuckDB scopes each nested
    WITH to its subquery, so CTE names never collide."""
    from databricks_etl_spark.plans.queries_round7 import _quality_sql

    o283 = QUERIES["q283_exact_contamination_pairs"].oracle
    o285 = QUERIES["q285_semdedup_fixed_centroids"].oracle
    o309 = QUERIES["q309_multimodal_dedup_verdict"].oracle
    o311 = QUERIES["q311_vocab_drift"].oracle
    return f"""
        WITH {_quality_sql()},
        hit AS (SELECT DISTINCT doc_id FROM ({o283})),
        sem AS (SELECT vec_id, pruned FROM ({o285})),
        mm AS (SELECT doc_id, any_dup FROM ({o309})),
        gate AS (SELECT DISTINCT psi_total FROM ({o311}))
        SELECT c.doc_id,
               (hit.doc_id IS NOT NULL) AS contaminated,
               COALESCE(sem.pruned, FALSE) AS sem_dup,
               COALESCE(mm.any_dup, FALSE) AS multimodal_dup,
               q.quality_score,
               COALESCE(q.quality_score >= {_Q312_QUALITY_MIN}, FALSE)
                   AS quality_ok,
               (gate.psi_total < {_Q312_PSI_MAX}) AS drift_gate_ok,
               (hit.doc_id IS NULL
                AND NOT COALESCE(sem.pruned, FALSE)
                AND NOT COALESCE(mm.any_dup, FALSE)
                AND COALESCE(q.quality_score >= {_Q312_QUALITY_MIN}, FALSE)
                AND gate.psi_total < {_Q312_PSI_MAX}) AS ship
        FROM (SELECT doc_id FROM documents WHERE doc_id % 50 != 0) c
        LEFT JOIN hit ON c.doc_id = hit.doc_id
        LEFT JOIN sem ON c.doc_id = sem.vec_id
        LEFT JOIN mm ON c.doc_id = mm.doc_id
        LEFT JOIN q ON c.doc_id = q.doc_id
        CROSS JOIN gate
    """


@query("q312_training_manifest", oracle=None)  # oracle set below
def q312_training_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pipeline-of-record manifest a 100 TB training run actually
    emits: ONE row per corpus document (benchmark docs, doc_id % 50
    == 0, never ship by construction) with every gate the round-7
    lanes established — exact-substring benchmark contamination
    (q283), SemDeDup semantic-duplicate prune verdict (q285),
    cross-modal duplicate verdict (q309; docs without payloads are
    clean by definition), the composite quality floor (q84/q258's
    score >= 0.5), and the corpus-level vocabulary-drift circuit
    breaker (q311's PSI < 0.25, one broadcast scalar) — folded into a
    final ``ship`` boolean. Composition is by CALLING the registered
    component queries, so the manifest can never drift from the lanes
    it audits; each component is individually driver-green, and the
    oracle embeds their oracle SQL verbatim as subqueries. Plan:
    every join is keyed on doc_id (the gate is a 1-row broadcast);
    component costs dominate, the composition itself adds only
    doc-count-sized hash joins."""
    from databricks_etl_spark.plans.queries_round7 import (
        q283_exact_contamination_pairs,
        q285_semdedup_fixed_centroids,
        q309_multimodal_dedup_verdict,
        q311_vocab_drift,
    )

    d = read_table(spark, sf_dir, "documents")
    corpus = d.filter((F.col("doc_id") % 50) != 0).select("doc_id")
    cont = (
        q283_exact_contamination_pairs(spark, sf_dir)
        .select("doc_id")
        .distinct()
        .withColumn("__hit", F.lit(True))
    )
    sem = q285_semdedup_fixed_centroids(spark, sf_dir).select(
        F.col("vec_id").alias("doc_id"), F.col("pruned").alias("__sem")
    )
    mm = q309_multimodal_dedup_verdict(spark, sf_dir).select(
        "doc_id", F.col("any_dup").alias("__mm")
    )
    qual = TX.quality_features(d).select("doc_id", "quality_score")
    gate = q311_vocab_drift(spark, sf_dir).select("psi_total").distinct()

    contaminated = F.coalesce(F.col("__hit"), F.lit(False))
    sem_dup = F.coalesce(F.col("__sem"), F.lit(False))
    multimodal_dup = F.coalesce(F.col("__mm"), F.lit(False))
    quality_ok = F.coalesce(
        F.col("quality_score") >= _Q312_QUALITY_MIN, F.lit(False)
    )
    drift_ok = F.col("psi_total") < _Q312_PSI_MAX
    return (
        corpus.join(cont, "doc_id", "left")
        .join(sem, "doc_id", "left")
        .join(mm, "doc_id", "left")
        .join(qual, "doc_id", "left")
        .crossJoin(F.broadcast(gate))
        .select(
            "doc_id",
            contaminated.alias("contaminated"),
            sem_dup.alias("sem_dup"),
            multimodal_dup.alias("multimodal_dup"),
            "quality_score",
            quality_ok.alias("quality_ok"),
            drift_ok.alias("drift_gate_ok"),
            (
                ~contaminated
                & ~sem_dup
                & ~multimodal_dup
                & quality_ok
                & drift_ok
            ).alias("ship"),
        )
    )


from dataclasses import replace as _replace  # noqa: E402

QUERIES["q312_training_manifest"] = _replace(
    QUERIES["q312_training_manifest"], oracle=_q312_oracle()
)


# ---------------------------------------------------------------------------
# q313/q314 — sequence-packing planner (fixes the waste q291 measures)
# ---------------------------------------------------------------------------

_Q313_B = 256  # token budget per training sequence
_Q313_P = 128  # planning-shard size (docs per independent FFD fold)

# first index of a residual bin that fits the item, else NULL — the
# first-fit probe, shared across every recursive-term use below
_Q313_FIT = "list_filter(range(1, len(p.res) + 1), jj -> p.res[jj] >= i.len)[1]"


def _q313_oracle() -> str:
    from databricks_etl_spark.plans.queries_round7 import _Q291_TOKS

    return f"""
        WITH RECURSIVE
        t AS (SELECT doc_id, least({_Q291_TOKS}, {_Q313_B}) AS len
              FROM documents),
        sc AS (SELECT CAST(ceil(COUNT(*) / {_Q313_P}.0) AS BIGINT) AS s
               FROM t),
        it AS (
            SELECT doc_id, len, doc_id % sc.s AS shard,
                   row_number() OVER (PARTITION BY doc_id % sc.s
                                      ORDER BY len DESC, doc_id) AS k
            FROM t, sc
        ),
        pack AS (
            SELECT shard, CAST(0 AS BIGINT) AS k,
                   CAST([] AS BIGINT[]) AS res,
                   CAST(NULL AS BIGINT) AS doc_id,
                   CAST(NULL AS BIGINT) AS bin,
                   CAST(NULL AS BIGINT) AS off
            FROM (SELECT DISTINCT shard FROM it)
            UNION ALL
            SELECT i.shard, i.k,
                   CASE WHEN {_Q313_FIT} IS NULL
                        THEN list_append(p.res, {_Q313_B} - i.len)
                        ELSE list_transform(range(1, len(p.res) + 1),
                             jj -> CASE WHEN jj = {_Q313_FIT}
                                        THEN p.res[jj] - i.len
                                        ELSE p.res[jj] END)
                   END,
                   i.doc_id,
                   COALESCE({_Q313_FIT}, len(p.res) + 1),
                   CASE WHEN {_Q313_FIT} IS NULL THEN 0
                        ELSE {_Q313_B} - p.res[{_Q313_FIT}]
                   END
            FROM pack p JOIN it i ON i.shard = p.shard AND i.k = p.k + 1
        )
        SELECT p.doc_id,
               CAST(p.shard * 1000000 + p.bin AS BIGINT) AS seq_id,
               CAST(p.off AS BIGINT) AS seq_offset,
               CAST(i.len AS BIGINT) AS n_tokens
        FROM pack p JOIN it i ON p.shard = i.shard AND p.k = i.k
        WHERE p.k >= 1
    """


@query("q313_sequence_packing", oracle=None)  # oracle set below
def q313_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sequence-packing PLANNER that fixes the padding waste q291
    measures: first-fit-decreasing bin-packing of documents into
    fixed-256-token training sequences, emitting (doc_id, seq_id,
    seq_offset, n_tokens). FFD runs inside ~128-doc planning shards
    (``doc_id % S``) that pack independently — the parallel-at-100TB
    compromise (a single global FFD fold would serialize the cluster;
    the waste bound degrades by <= 1 partial sequence per shard) —
    with the stated (length DESC, doc_id ASC) total order inside each
    shard, so the placement is deterministic on any partitioning. The
    fold itself is the sanctioned Arrow-batched ``applyInPandas``
    case (operators/packing.py); the oracle states the identical
    placement with a per-shard simultaneous recursive CTE carrying
    each shard's residual list."""
    from databricks_etl_spark.operators.packing import ffd_pack
    from databricks_etl_spark.operators.text import tokens_col

    d = read_table(spark, sf_dir, "documents")
    t = d.select("doc_id", F.size(tokens_col("text")).cast("long").alias("len"))
    return ffd_pack(t, _Q313_B, _Q313_P)


QUERIES["q313_sequence_packing"] = _replace(
    QUERIES["q313_sequence_packing"], oracle=_q313_oracle()
)


@query("q314_packing_efficiency", oracle=None)  # oracle set below
def q314_packing_efficiency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The packed-efficiency audit closing q291's loop: ONE row
    comparing the FFD plan's realized waste (padding = unfilled
    capacity across its sequences) against q291's single-bucket
    pad-to-max baseline — the before/after a dataloader change ships
    with. Composes the two registered queries (q313 placements, q291
    baseline) so the audit can never drift from the plans it scores;
    integer sums, two non-negative 6dp ratios."""
    from databricks_etl_spark.plans.queries_round7 import (
        q291_padding_waste_audit,
    )

    p = q313_sequence_packing(spark, sf_dir)
    agg = p.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.countDistinct("seq_id").cast("long").alias("n_seqs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    ).select(
        F.lit(_Q313_B).cast("long").alias("budget"),
        "n_docs",
        "n_seqs",
        "total_tokens",
        F.round(
            (F.col("n_seqs") * _Q313_B - F.col("total_tokens")).cast("double")
            / (F.col("n_seqs") * _Q313_B),
            6,
        ).alias("packed_waste_ratio"),
    )
    base = (
        q291_padding_waste_audit(spark, sf_dir)
        .filter(F.col("n_buckets_cfg") == 1)
        .select(F.col("waste_ratio").alias("baseline_waste_ratio"))
    )
    return agg.crossJoin(F.broadcast(base))


def _q314_oracle() -> str:
    o313 = _q313_oracle()
    o291 = QUERIES["q291_padding_waste_audit"].oracle
    return f"""
        WITH p AS (SELECT * FROM ({o313})),
        agg AS (
            SELECT CAST({_Q313_B} AS BIGINT) AS budget,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(COUNT(DISTINCT seq_id) AS BIGINT) AS n_seqs,
                   CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
            FROM p
        )
        SELECT a.budget, a.n_docs, a.n_seqs, a.total_tokens,
               round(CAST(a.n_seqs * {_Q313_B} - a.total_tokens AS DOUBLE)
                     / (a.n_seqs * {_Q313_B}), 6) AS packed_waste_ratio,
               b.waste_ratio AS baseline_waste_ratio
        FROM agg a
        CROSS JOIN (SELECT waste_ratio FROM ({o291})
                    WHERE n_buckets_cfg = 1) b
    """


QUERIES["q314_packing_efficiency"] = _replace(
    QUERIES["q314_packing_efficiency"], oracle=_q314_oracle()
)
