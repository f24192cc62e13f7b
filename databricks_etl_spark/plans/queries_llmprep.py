"""Training-data preparation queries (SURVEY.md §2.12 extension):
chunking, sequence packing, PII redaction, vocabulary/OOV — the
operators between "cleaned corpus" and "tokenized shards" in an LLM
data pipeline, each expressed in pure built-ins and hash-checked
against the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

_CHUNK, _STRIDE = 50, 40


@query(
    "q139_doc_chunking",
    oracle=rf"""
        WITH t AS (
            SELECT doc_id, {_TOKS} AS toks FROM documents
        ),
        c AS (
            SELECT doc_id,
                   unnest(range(0, len(toks), {_STRIDE})) AS start,
                   toks
            FROM t
        )
        SELECT doc_id,
               CAST(start / {_STRIDE} AS BIGINT) AS chunk_id,
               CAST(len(toks[start + 1 : start + {_CHUNK}]) AS INTEGER)
                   AS n_chunk_tokens,
               md5(array_to_string(toks[start + 1 : start + {_CHUNK}], ' '))
                   AS chunk_md5
        FROM c
    """,
)
def q139_doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking (window {_CHUNK} tokens,
    stride {_STRIDE} — overlapping context-window prep): chunk starts
    come from an in-row ``sequence`` explode, the chunk itself from
    ``slice`` — per-document work only, embarrassingly parallel, no
    shuffle at all. Chunk content is hash-checked (md5 of the joined
    tokens) so the oracle verifies the text, not just the counts."""
    d = read_table(spark, sf_dir, "documents")
    toks = F.split(F.lower(F.trim("text")), r"\s+")
    t = d.select("doc_id", toks.alias("toks"))
    starts = F.sequence(
        F.lit(0), F.greatest(F.size("toks") - 1, F.lit(0)), F.lit(_STRIDE)
    )
    c = t.select("doc_id", "toks", F.explode(starts).alias("start"))
    chunk = F.slice("toks", F.col("start") + 1, _CHUNK)
    return c.select(
        "doc_id",
        (F.col("start") / _STRIDE).cast("bigint").alias("chunk_id"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.concat_ws(" ", chunk)).alias("chunk_md5"),
    )


_BUDGET = 512


@query(
    "q140_sequence_packing",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, lang, len({_TOKS}) AS n_tokens FROM documents
        ),
        s AS (
            SELECT doc_id, lang, n_tokens,
                   SUM(n_tokens) OVER (
                       PARTITION BY lang ORDER BY doc_id
                   ) AS cum
            FROM t
        )
        SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(floor((cum - n_tokens) / {_BUDGET}) AS BIGINT) AS bin_id,
               CAST(cum - n_tokens AS BIGINT) AS stream_offset
        FROM s
    """,
)
def q140_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing, concatenate-then-cut style: within each
    language shard, documents are laid on a token stream in doc_id
    order and a doc's bin is the {_BUDGET}-token block its START
    offset falls in — the deterministic streaming formulation of
    packing (what actual pretraining shards do), not NP-hard bin
    packing. The running sum partitions by shard (lang), so the
    window parallelizes; at 100 TB shards are the unit of packing
    anyway (a global stream would serialize ingestion)."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "lang",
        F.size(F.split(F.lower(F.trim("text")), r"\s+")).alias("n_tokens"),
    )
    w = Window.partitionBy("lang").orderBy("doc_id")
    s = t.withColumn("cum", F.sum("n_tokens").over(w))
    off = F.col("cum") - F.col("n_tokens")
    return s.select(
        "doc_id",
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.floor(off / _BUDGET).cast("bigint").alias("bin_id"),
        off.cast("bigint").alias("stream_offset"),
    )


_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_LONGNUM = "[0-9]{3,}"


@query(
    "q141_pii_redaction",
    oracle=rf"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '{_EMAIL}')) AS INTEGER)
                   AS n_emails,
               CAST(len(regexp_extract_all(text, '{_LONGNUM}')) AS INTEGER)
                   AS n_longnums,
               md5(regexp_replace(regexp_replace(text, '{_EMAIL}', '<EMAIL>', 'g'),
                                  '{_LONGNUM}', '<NUM>', 'g')) AS redacted_md5
        FROM documents
    """,
)
def q141_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style redaction pass (emails, long digit runs → tags) —
    the privacy scrub before corpus release, pure ``regexp_replace``
    (JVM regex, no UDF; Spark replaces all matches by default, the
    oracle passes the 'g' flag — same result, hash-checked on the
    redacted text). Counts come from ``regexp_extract_all`` so the
    match sets themselves are verified, per-document, no shuffle."""
    d = read_table(spark, sf_dir, "documents")
    red = F.regexp_replace(
        F.regexp_replace("text", _EMAIL, "<EMAIL>"), _LONGNUM, "<NUM>"
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all("text", F.lit(_EMAIL))).alias("n_emails"),
        F.size(F.regexp_extract_all("text", F.lit(_LONGNUM))).alias("n_longnums"),
        F.md5(red).alias("redacted_md5"),
    )


_VOCAB = 100


@query(
    "q142_vocab_oov",
    oracle=rf"""
        WITH tok AS (
            SELECT doc_id, unnest({_TOKS}) AS w FROM documents
        ),
        cnt AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY 1),
        vocab AS (
            SELECT w FROM (
                SELECT w, row_number() OVER (ORDER BY c DESC, w) AS rk
                FROM cnt
            ) WHERE rk <= {_VOCAB}
        )
        SELECT doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_oov,
               round(CAST(SUM(CASE WHEN vocab.w IS NULL THEN 1 ELSE 0 END)
                          AS DOUBLE) / COUNT(*), 6) AS oov_rate
        FROM tok LEFT JOIN vocab USING (w)
        GROUP BY doc_id
    """,
)
def q142_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary build + out-of-vocabulary rate: top-{_VOCAB} tokens
    by corpus frequency (deterministic count-then-token tiebreak),
    then each document's OOV fraction via a broadcast left join of
    its token stream against the vocab — the coverage metric that
    sizes a tokenizer. Scale: the vocab is tiny (broadcast); the only
    shuffles are the corpus count and the per-doc regroup, both
    map-combinable — but the vocab RANK here is a global row_number
    over every distinct token, so this exact form is the sf-bounded
    BASELINE; the 100 TB path builds the vocab with q251's
    TakeOrderedAndProject top-K (no global sort)."""
    d = read_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w"),
    )
    cnt = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    rk = Window.orderBy(F.col("c").desc(), F.col("w"))
    vocab = (
        cnt.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _VOCAB)
        .select("w", F.lit(True).alias("in_vocab"))
    )
    return (
        tok.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
            F.round(
                F.sum(F.when(F.col("in_vocab").isNull(), 1).otherwise(0))
                / F.count(F.lit(1)),
                6,
            ).alias("oov_rate"),
        )
    )
