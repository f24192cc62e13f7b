"""Text-analysis queries over ``documents`` (SURVEY.md §2.12), all
oracle-paired: the Spark side uses only JVM built-ins, the oracle
recomputes the identical expressions in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_STOP_ALL = ", ".join(
    f"'{w}'" for ws in TX.STOPWORDS.values() for w in ws
)


@query(
    "q36_text_token_counts",
    oracle=f"""
        SELECT doc_id,
               CAST(length(text) AS BIGINT) AS n_chars,
               CAST(len({_TOKS}) AS BIGINT) AS n_tokens
        FROM documents
    """,
)
def q36_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (whitespace tokenizer) — one scan, no UDF."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.length("text").cast("long").alias("n_chars"),
        TX.token_count("text").cast("long").alias("n_tokens"),
    )


@query(
    "q37_text_quality",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, text,
                   length(text) AS nc,
                   len({_TOKS}) AS nt,
                   len(list_filter({_TOKS}, t -> t IN ({_STOP_ALL}))) AS nstop,
                   length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS npunct
            FROM documents
        )
        SELECT doc_id,
               CAST(nc AS BIGINT) AS n_chars,
               CAST(nt AS BIGINT) AS n_tokens,
               round(CAST(nc - (nt - 1) AS DOUBLE) / nt, 6) AS mean_tok_len,
               round(CAST(npunct AS DOUBLE) / nc, 6) AS punct_ratio,
               round(CAST(nstop AS DOUBLE) / nt, 6) AS stop_ratio,
               CAST(
                 (CASE WHEN nt BETWEEN 5 AND 1000 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN CAST(npunct AS DOUBLE)/nc < 0.1 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN CAST(nstop AS DOUBLE)/nt > 0.01 THEN 0.25 ELSE 0.0 END)
               + (CASE WHEN CAST(nc - (nt-1) AS DOUBLE)/nt BETWEEN 2.0 AND 12.0
                       THEN 0.25 ELSE 0.0 END) AS DOUBLE) AS quality_score
        FROM t
    """,
)
def q37_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality scoring: length / punctuation / stopword signals + a
    composite filter score — the pre-training heuristic-filter shape."""
    return TX.quality_features(read_table(spark, sf_dir, "documents"))


_LANG_SCORES = ",\n".join(
    f"len(list_filter({_TOKS}, t -> t IN ({', '.join(repr(w) for w in ws)}))) AS s_{lang}"
    for lang, ws in TX.STOPWORDS.items()
)


@query(
    "q38_lang_id",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, {_LANG_SCORES}
            FROM documents
        )
        SELECT CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                    WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                    WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                    WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                    ELSE 'fr' END AS lang_pred,
               COUNT(*) AS n_docs
        FROM s
        GROUP BY lang_pred
    """,
)
def q38_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic (stopword vote, deterministic lexicographic
    tie-break), aggregated to predicted-language counts."""
    d = read_table(spark, sf_dir, "documents")
    return TX.lang_id(d).groupBy("lang_pred").agg(F.count(F.lit(1)).alias("n_docs"))


@query(
    "q39_term_frequency",
    oracle=f"""
        SELECT token, COUNT(*) AS freq
        FROM (SELECT unnest({_TOKS}) AS token FROM documents)
        GROUP BY token
        ORDER BY freq DESC, token
        LIMIT 30
    """,
)
def q39_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term frequency (explode → partial+final hash agg) with
    deterministic top-30. The canonical word-count shuffle shape."""
    tf = TX.term_frequency(read_table(spark, sf_dir, "documents"))
    return tf.orderBy(F.desc("freq"), F.asc("token")).limit(30)


@query(
    "q40_doc_fingerprint",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks,
                   md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS md5_fp
            FROM documents
            WHERE doc_id < 100
        )
        SELECT doc_id, md5_fp,
               list_min(list_transform(range(1, len(toks) - 1),
                        i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])))
                   AS min_shingle_fp
        FROM t
    """,
)
def q40_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document fingerprinting: md5 of normalized text (exact-dup key)
    + min-of-md5(3-shingle) (1-permutation MinHash)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return TX.doc_fingerprint(d)


@query(
    "q82_tfidf_top_terms",
    oracle=f"""
        WITH tok AS (
            SELECT doc_id, unnest(list_distinct({_TOKS})) AS token,
                   len({_TOKS}) AS n_toks
            FROM documents
        ),
        tf AS (
            SELECT t.doc_id, t.token,
                   CAST(len(list_filter({_TOKS}, x -> x = t.token)) AS DOUBLE)
                       / t.n_toks AS tf
            FROM tok t JOIN documents d ON t.doc_id = d.doc_id
        ),
        idf AS (
            SELECT token,
                   ln((SELECT COUNT(*) FROM documents) / CAST(COUNT(*) AS DOUBLE)) AS idf
            FROM tok GROUP BY token
        ),
        scored AS (
            SELECT tf.doc_id, tf.token, round(tf.tf * idf.idf, 6) AS tfidf
            FROM tf JOIN idf USING (token)
        ),
        ranked AS (
            SELECT doc_id, token, tfidf,
                   row_number() OVER (
                       PARTITION BY doc_id ORDER BY tfidf DESC, token
                   ) AS rk
            FROM scored
        )
        SELECT doc_id, token, tfidf, CAST(rk AS BIGINT) AS rk
        FROM ranked WHERE rk <= 3 AND doc_id < 100
    """,
)
def q82_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF top-3 terms per document: explode → per-(doc,term) TF,
    corpus DF → IDF (ln N/df), per-doc rank window. The canonical
    keyword-extraction shuffle shape; rounded to 6dp for libm parity.
    """
    d = read_table(spark, sf_dir, "documents")
    n_docs = d.count()  # scalar; the oracle embeds it as a subquery
    toks = d.select("doc_id", F.explode(TX.tokens_col("text")).alias("token"))
    tf = (
        toks.groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("n"))
        .join(
            toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_toks")), "doc_id"
        )
        .select("doc_id", "token", (F.col("n").cast("double") / F.col("n_toks")).alias("tf"))
    )
    idf = (
        toks.select("doc_id", "token")
        .distinct()
        .groupBy("token")
        .agg(F.log(F.lit(float(n_docs)) / F.count(F.lit(1))).alias("idf"))
    )
    scored = tf.join(idf, "token").select(
        "doc_id", "token", F.round(F.col("tf") * F.col("idf"), 6).alias("tfidf")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("token"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter((F.col("rk") <= 3) & (F.col("doc_id") < 100))
    )


@query(
    "q83_langid_confusion",
    oracle=f"""
        WITH s AS (
            SELECT doc_id, lang, {_LANG_SCORES}
            FROM documents
        ),
        p AS (
            SELECT lang,
                   CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                        WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                        WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                        WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                        ELSE 'fr' END AS lang_pred
            FROM s
        )
        SELECT lang, lang_pred, COUNT(*) AS n
        FROM p GROUP BY lang, lang_pred
    """,
)
def q83_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID confusion matrix (true label × heuristic prediction)
    — the evaluation cross-tab for the q38 classifier."""
    d = read_table(spark, sf_dir, "documents")
    pred = TX.lang_id(d).join(d.select("doc_id", "lang"), "doc_id")
    return pred.groupBy("lang", "lang_pred").agg(F.count(F.lit(1)).alias("n"))


@query(
    "q84_training_data_prep",
    oracle=f"""
        WITH q AS (
            SELECT doc_id, text, source,
                   len({_TOKS}) AS nt,
                   len(list_filter({_TOKS}, t -> t IN ({_STOP_ALL}))) AS nstop,
                   length(text) - length(regexp_replace(text, '[!-/:-@\\[-`{{-~]', '', 'g')) AS npunct,
                   length(text) AS nc
            FROM documents
        ),
        scored AS (
            SELECT doc_id, text, source,
                   (CASE WHEN nt BETWEEN 5 AND 1000 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN CAST(npunct AS DOUBLE)/nc < 0.1 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN CAST(nstop AS DOUBLE)/nt > 0.01 THEN 0.25 ELSE 0.0 END)
                 + (CASE WHEN CAST(nc - (nt-1) AS DOUBLE)/nt BETWEEN 2.0 AND 12.0
                         THEN 0.25 ELSE 0.0 END) AS score,
                   nt
            FROM q
        ),
        kept AS (
            SELECT MIN(doc_id) AS doc_id, MIN(source) AS src_of_min, text,
                   MIN(nt) AS nt
            FROM scored
            WHERE score >= 0.75
            GROUP BY text
        )
        SELECT s.source,
               COUNT(*) AS n_docs,
               CAST(SUM(k.nt) AS BIGINT) AS total_tokens
        FROM kept k JOIN scored s ON k.doc_id = s.doc_id
        GROUP BY s.source
    """,
)
def q84_training_data_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capstone composition — the minimal pre-training data pipeline:
    quality-filter (score ≥ 0.75) → exact dedup keep-min-id → per-source
    corpus stats. Every stage is an already-oracled operator; this
    checks they compose without semantic drift. Scale shape: one scan +
    one content-key shuffle + one small agg."""
    from databricks_etl_spark.operators.dedup import dedup_exact

    d = read_table(spark, sf_dir, "documents")
    q = TX.quality_features(d).select("doc_id", "n_tokens", "quality_score")
    kept = (
        d.join(q, "doc_id")
        .filter(F.col("quality_score") >= 0.75)
        .select("doc_id", "text", "source", "n_tokens")
    )
    deduped = dedup_exact(kept, ["text"], "doc_id")
    return deduped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
    )


@query(
    "q41_bottom_k_sketch",
    oracle="""
        WITH t AS (
            SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS toks
            FROM documents WHERE doc_id < 50
        ),
        sh AS (
            SELECT DISTINCT doc_id,
                   unnest(list_transform(range(1, len(toks) - 1),
                          i -> md5(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))) AS h
            FROM t
        ),
        rn AS (
            SELECT doc_id, h,
                   row_number() OVER (PARTITION BY doc_id ORDER BY h) AS rn
            FROM sh
        )
        SELECT doc_id, array_to_string(list_sort(list(h)), ',') AS sketch_str
        FROM rn WHERE rn <= 8
        GROUP BY doc_id
    """,
)
def q41_bottom_k_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bottom-k MinHash sketch (k smallest md5(shingle) per doc) — the
    deterministic, oracle-checkable MinHash variant; sketch overlap
    estimates Jaccard (SURVEY.md §2.12 dedup ladder)."""
    d = read_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    sk = TX.bottom_k_sketch(d, 8)
    return sk.select("doc_id", F.concat_ws(",", "sketch").alias("sketch_str"))


@query(
    "q130_bigram_coherence",
    bench=True,
    oracle=rf"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        tok AS (
            SELECT doc_id, unnest(toks) AS w1 FROM t
        ),
        big AS (
            SELECT doc_id,
                   unnest(toks[1:len(toks)-1]) AS w1,
                   unnest(toks[2:len(toks)]) AS w2
            FROM t WHERE len(toks) >= 2
        ),
        c1 AS (SELECT w1, COUNT(*) AS c1 FROM tok GROUP BY 1),
        c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY 1, 2)
        SELECT big.doc_id,
               COUNT(*) AS n_bigrams,
               round(CAST(SUM(c2.c2) AS DOUBLE) / CAST(SUM(c1.c1) AS DOUBLE), 6)
                   AS coherence
        FROM big JOIN c2 USING (w1, w2) JOIN c1 USING (w1)
        GROUP BY big.doc_id
    """,
)
def q130_bigram_coherence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-style quality signal with exact arithmetic: per-doc corpus-
    bigram conditional-mass score (see
    :func:`~databricks_etl_spark.operators.text.bigram_coherence` for
    why this replaces log-perplexity cross-engine). Hash-exact: integer
    count sums, one 6dp-rounded division."""
    d = read_table(spark, sf_dir, "documents")
    return TX.bigram_coherence(d)
