"""Similarity-search queries over ``embeddings`` (SURVEY.md §2.12).

The exact brute-force top-k is fully oracle-paired: cosine is computed
as a sequential double fold on both engines (bit-identical — verified;
DuckDB's builtin ``list_cosine_similarity`` is float32 and does NOT
match). LSH re-rank is rows-only (seeded projections).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import similarity as SIM
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table


def _dot_sql(a: str, b: str) -> str:
    return (
        f"list_sum(list_transform(range(1, len({a}) + 1), "
        f"i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)))"
    )


@query(
    "q47_cosine_topk_bruteforce",
    oracle=f"""
        WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
             c AS (SELECT vec_id AS nid, embedding AS ce FROM embeddings),
             s AS (
                SELECT qid, nid,
                       round({_dot_sql('qe', 'ce')}
                             / (sqrt({_dot_sql('qe', 'qe')}) * sqrt({_dot_sql('ce', 'ce')})),
                             6) AS cosine_sim
                FROM q, c WHERE qid <> nid
             ),
             r AS (
                SELECT qid AS query_id, nid AS neighbor_id, cosine_sim,
                       row_number() OVER (
                           PARTITION BY qid ORDER BY cosine_sim DESC, nid
                       ) AS rank
                FROM s
             )
        SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cosine_sim
        FROM r WHERE rank <= 10
    """,
    bench=True,
)
def q47_cosine_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ANN baseline: brute-force cosine top-10 for 5 query
    vectors. Queries broadcast; corpus scanned once; per-query window
    top-k. Linear in corpus size — the correct exact baseline the LSH
    variant (q48) approximates."""
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.cosine_topk(e, e.filter(F.col("vec_id") < 5), 10)


@query("q48_ann_lsh_topk", oracle=None)
def q48_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate NN: BucketedRandomProjection LSH candidates + exact
    cosine re-rank of candidates only (the scale path — equi-join on
    bucket hashes instead of cross product). Seeded → rows-only;
    recall-vs-exact invariant in tests."""
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.brp_lsh_neighbors(e, e.filter(F.col("vec_id") < 5), 10)


@query("q68_ann_ivf_topk", oracle=None)
def q68_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat ANN: KMeans coarse quantizer → probe the n_probe
    nearest cells → exact cosine re-rank inside cells only (the
    third rung of the similarity ladder: brute-force → LSH → IVF).
    Rows-only; recall-vs-exact asserted in tests."""
    e = read_table(spark, sf_dir, "embeddings")
    return SIM.ivf_topk(e, e.filter(F.col("vec_id") < 5), 10)


@query(
    "q49_label_centroid_similarity",
    oracle="""
        WITH dims AS (
            SELECT label, i AS dim,
                   CAST(SUM(CAST(embedding[i] AS DECIMAL(28,12))) AS DOUBLE)
                       / COUNT(*) AS mean_v
            FROM embeddings, range(1, 65) t(i)
            GROUP BY label, i
        ),
        pairs AS (
            SELECT a.label AS label_a, b.label AS label_b,
                   CAST(SUM(CAST(a.mean_v * b.mean_v AS DECIMAL(28,12))) AS DOUBLE) AS dot_ab,
                   CAST(SUM(CAST(a.mean_v * a.mean_v AS DECIMAL(28,12))) AS DOUBLE) AS dot_aa,
                   CAST(SUM(CAST(b.mean_v * b.mean_v AS DECIMAL(28,12))) AS DOUBLE) AS dot_bb
            FROM dims a JOIN dims b ON a.dim = b.dim
            WHERE a.label < b.label
            GROUP BY a.label, b.label
        )
        SELECT label_a, label_b,
               round(dot_ab / (sqrt(dot_aa) * sqrt(dot_bb)), 6) AS centroid_cos
        FROM pairs
    """,
)
def q49_label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid vectors (exact decimal per-dim means) and
    pairwise centroid cosine — the clustering-sanity metric. Decimal
    accumulation makes the double results bit-identical across engines
    regardless of row/partition order."""
    e = read_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("dim0", "v")
    ).select("label", (F.col("dim0") + 1).alias("dim"), "v")
    per_dim = dims.groupBy("label", "dim").agg(
        (F.sum(F.col("v").cast("decimal(28,12)")).cast("double") / F.count(F.lit(1))).alias(
            "mean_v"
        )
    )
    a = per_dim.select(
        F.col("label").alias("label_a"), "dim", F.col("mean_v").alias("va")
    )
    b = per_dim.select(
        F.col("label").alias("label_b"), "dim", F.col("mean_v").alias("vb")
    )
    pairs = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(
            F.sum((F.col("va") * F.col("vb")).cast("decimal(28,12)")).cast("double").alias("dot_ab"),
            F.sum((F.col("va") * F.col("va")).cast("decimal(28,12)")).cast("double").alias("dot_aa"),
            F.sum((F.col("vb") * F.col("vb")).cast("decimal(28,12)")).cast("double").alias("dot_bb"),
        )
    )
    return pairs.select(
        "label_a",
        "label_b",
        F.round(F.col("dot_ab") / (F.sqrt("dot_aa") * F.sqrt("dot_bb")), 6).alias("centroid_cos"),
    )
