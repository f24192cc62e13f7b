r"""Round-5c: the per-source scorecard — the composed feed-health
report (VERDICT r4 #7's drill-down composition) joining three audits
the repo proves separately into ONE oracled query: LSH near-dup
implication (q173/q174), benchmark contamination (q152/q227), and the
token quality gate (q228). This is the table a crawl operator actually
pages on: one row per feed with all three failure modes side by side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.plans.queries_round4 import _BANDS_SQL, _band_buckets
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"


@query(
    "q246_source_scorecard",
    oracle=f"""
        WITH {_BANDS_SQL},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
            FROM b a JOIN b c
              ON a.band = c.band AND a.band_hash = c.band_hash
             AND a.doc_id < c.doc_id
        ),
        nd AS (SELECT id_a AS doc_id FROM cand UNION SELECT id_b FROM cand),
        tt4 AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        g4 AS (
            SELECT doc_id,
                   list_distinct(list_transform(range(1, len(toks) - 2),
                       i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                            || ' ' || toks[i+3])) AS gs
            FROM tt4 WHERE len(toks) >= 4
        ),
        e4 AS (SELECT doc_id, unnest(gs) AS g FROM g4),
        ev AS (SELECT DISTINCT g FROM e4 WHERE doc_id % 50 = 0),
        cont AS (
            SELECT DISTINCT e4.doc_id FROM e4 JOIN ev USING (g)
            WHERE e4.doc_id % 50 <> 0
        ),
        q AS (
            SELECT doc_id FROM tt4 WHERE len(toks) >= 30
        )
        SELECT d.source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(COUNT(nd.doc_id) AS BIGINT) AS n_neardup,
               round(CAST(COUNT(nd.doc_id) AS DOUBLE) / COUNT(*), 6)
                   AS neardup_rate,
               CAST(COUNT(cont.doc_id) AS BIGINT) AS n_contaminated,
               round(CAST(COUNT(cont.doc_id) AS DOUBLE) / COUNT(*), 6)
                   AS contamination_rate,
               CAST(COUNT(q.doc_id) AS BIGINT) AS n_quality,
               round(CAST(COUNT(q.doc_id) AS DOUBLE) / COUNT(*), 6)
                   AS quality_rate
        FROM documents d
        LEFT JOIN nd ON d.doc_id = nd.doc_id
        LEFT JOIN cont ON d.doc_id = cont.doc_id
        LEFT JOIN q ON d.doc_id = q.doc_id
        GROUP BY d.source
    """,
)
def q246_source_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-feed health scorecard: near-dup implication rate (LSH band
    collisions, q173's candidates), benchmark-contamination rate
    (shared 4-grams with the held-out eval slice, q152's audit), and
    token-quality pass rate — three independently-proven audits
    composed into one report keyed by ingestion source. A feed that is
    re-crawling itself, scraping the eval set, or shipping short spam
    shows up as one bad row.

    Plan: three doc-level flag relations (each a bucketed/posting-
    capped build the individual queries plan-audit), then ONE grouped
    rollup over documents with three membership left-joins — flags are
    doc_id-keyed and far smaller than the corpus, so AQE broadcasts
    them while they fit; at 100 TB they become shuffle joins on the
    same doc_id key. 20 rows out."""
    d = read_table(spark, sf_dir, "documents")

    b = _band_buckets(spark, sf_dir)
    a = b.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
    c = b.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
    cand = (
        a.join(c, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    nd = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select("id_b"))
        .distinct()
        .withColumn("__nd", F.lit(1))
    )

    grams = TX.shingles(d, 4).distinct().withColumnRenamed("shingle", "g")
    ev = grams.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    cont = (
        grams.filter(F.col("doc_id") % 50 != 0)
        .join(ev, "g")
        .select("doc_id")
        .distinct()
        .withColumn("__ct", F.lit(1))
    )

    q = (
        d.select("doc_id", F.size(TX.tokens_col("text")).alias("n_toks"))
        .filter(F.col("n_toks") >= 30)
        .select("doc_id")
        .withColumn("__q", F.lit(1))
    )

    n = F.count(F.lit(1))
    return (
        d.select("doc_id", "source")
        .join(nd, "doc_id", "left")
        .join(cont, "doc_id", "left")
        .join(q, "doc_id", "left")
        .groupBy("source")
        .agg(
            n.cast("long").alias("n_docs"),
            F.count("__nd").cast("long").alias("n_neardup"),
            F.round(F.count("__nd").cast("double") / n, 6).alias("neardup_rate"),
            F.count("__ct").cast("long").alias("n_contaminated"),
            F.round(F.count("__ct").cast("double") / n, 6).alias(
                "contamination_rate"
            ),
            F.count("__q").cast("long").alias("n_quality"),
            F.round(F.count("__q").cast("double") / n, 6).alias("quality_rate"),
        )
    )
