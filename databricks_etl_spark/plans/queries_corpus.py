r"""Corpus-hygiene queries (round 3): the pre-training data filters a
100 TB text pipeline runs between crawl and tokenizer.

Boilerplate phrase detection, benchmark-contamination audit, staged
quality funnel, and within-document repetition (Gopher-style) filters —
each fully DuckDB-oracled over the ``documents`` table. No reference
analog (the reference is a tabular ETL pipeline); north-star surface.

All tokenizations mirror the repo-wide rule: whitespace split of
lower(trim(text)) — ``string_split_regex(lower(trim(text)), '\s+')``
in the oracles, :func:`databricks_etl_spark.operators.text.tokens_col`
in Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"

# distinct word-4-grams per document, as a DuckDB CTE body
_GRAMS4 = f"""
    t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
    g AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(toks) - 2),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
                        || ' ' || toks[i+3])) AS gs
        FROM t WHERE len(toks) >= 4
    ),
    e AS (SELECT doc_id, unnest(gs) AS g FROM g)
"""


def _grams4(d: DataFrame) -> DataFrame:
    """Distinct (doc_id, 4-gram) pairs — Spark twin of ``_GRAMS4``."""
    return TX.shingles(d, 4).distinct().withColumnRenamed("shingle", "g")


@query(
    "q151_boilerplate_phrases",
    bench=True,
    oracle=f"""
        WITH {_GRAMS4},
        dfreq AS (SELECT g, COUNT(*) AS df FROM e GROUP BY 1),
        boiler AS (SELECT g FROM dfreq WHERE df >= 3),
        per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM e GROUP BY 1),
        hits AS (
            SELECT e.doc_id, COUNT(*) AS n_boiler
            FROM e JOIN boiler USING (g) GROUP BY 1
        )
        SELECT p.doc_id, p.n_grams,
               COALESCE(h.n_boiler, 0) AS n_boiler,
               round(CAST(COALESCE(h.n_boiler, 0) AS DOUBLE) / p.n_grams, 6)
                   AS boiler_ratio
        FROM per_doc p LEFT JOIN hits h ON p.doc_id = h.doc_id
    """,
)
def q151_boilerplate_phrases(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate detection: a word-4-gram appearing in ≥3 distinct
    documents is corpus boilerplate (nav text, license headers,
    templated spam); each document is scored by the fraction of its
    distinct 4-grams that are boilerplate — the doc-level signal C4-
    style cleaners threshold on. Two hash shuffles (gram df, per-doc
    rollup), both on bounded keys; at 100 TB the gram id would be a
    64-bit hash instead of the string (same plan shape)."""
    d = read_table(spark, sf_dir, "documents")
    e = _grams4(d)
    boiler = (
        e.groupBy("g").agg(F.count(F.lit(1)).alias("df")).filter(F.col("df") >= 3)
    )
    per_doc = e.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        e.join(boiler.select("g"), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_boiler"))
    )
    return per_doc.join(hits, "doc_id", "left").select(
        "doc_id",
        "n_grams",
        F.coalesce("n_boiler", F.lit(0)).alias("n_boiler"),
        F.round(
            F.coalesce("n_boiler", F.lit(0)).cast("double") / F.col("n_grams"), 6
        ).alias("boiler_ratio"),
    )


@query(
    "q152_contamination_audit",
    oracle=f"""
        WITH {_GRAMS4},
        ev AS (SELECT DISTINCT g FROM e WHERE doc_id % 50 = 0),
        corpus AS (SELECT doc_id, g FROM e WHERE doc_id % 50 != 0),
        per_doc AS (SELECT doc_id, COUNT(*) AS n_grams FROM corpus GROUP BY 1),
        hits AS (
            SELECT corpus.doc_id, COUNT(*) AS n_contaminated
            FROM corpus JOIN ev USING (g) GROUP BY 1
        )
        SELECT h.doc_id, p.n_grams, h.n_contaminated,
               round(CAST(h.n_contaminated AS DOUBLE) / p.n_grams, 6)
                   AS contamination_ratio
        FROM hits h JOIN per_doc p ON h.doc_id = p.doc_id
    """,
)
def q152_contamination_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination audit: overlap of training documents
    with a held-out eval set (here: every 50th doc plays the
    benchmark) measured as shared distinct word-4-grams — the n-gram
    decontamination check run before any pre-training corpus ships.
    Only contaminated docs are emitted (doc, gram counts, ratio). The
    eval gram set scales with the corpus (every 50th doc), so no
    hard broadcast hint — AQE broadcasts it while small; the corpus
    side never shuffles its text, only gram hits."""
    d = read_table(spark, sf_dir, "documents")
    e = _grams4(d)
    ev = e.filter(F.col("doc_id") % 50 == 0).select("g").distinct()
    corpus = e.filter(F.col("doc_id") % 50 != 0)
    per_doc = corpus.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_grams"))
    hits = (
        corpus.join(ev, "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    return hits.join(per_doc, "doc_id").select(
        "doc_id",
        "n_grams",
        "n_contaminated",
        F.round(
            F.col("n_contaminated").cast("double") / F.col("n_grams"), 6
        ).alias("contamination_ratio"),
    )


@query(
    "q153_quality_funnel",
    oracle=f"""
        WITH f AS (
            SELECT lang = 'en' AS c1,
                   lang = 'en' AND length(text) >= 200 AS c2,
                   lang = 'en' AND length(text) >= 200
                       AND len({_TOKS}) >= 30 AS c3,
                   lang = 'en' AND length(text) >= 200
                       AND len({_TOKS}) >= 30
                       AND CAST(len(list_distinct({_TOKS})) AS DOUBLE)
                           / len({_TOKS}) >= 0.5 AS c4
            FROM documents
        )
        SELECT 's0_all' AS stage, COUNT(*) AS n_docs FROM f
        UNION ALL SELECT 's1_lang_en', CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        UNION ALL SELECT 's2_len_ge_200', CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        UNION ALL SELECT 's3_toks_ge_30', CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) FROM f
        UNION ALL SELECT 's4_uniq_ge_050', CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) FROM f
    """,
)
def q153_quality_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged quality-filter funnel: how many documents survive each
    cumulative filter (language → length → token count → lexical
    diversity) — the per-stage yield report every corpus build emits
    so a mis-tuned filter is caught before it silently drops half the
    data. ONE scan computes all stage flags as conditional sums
    (map-side combine; no per-stage rescans), then the 1-row aggregate
    unpivots to (stage, n_docs) rows."""
    d = read_table(spark, sf_dir, "documents")
    toks = TX.tokens_col("text")
    c1 = F.col("lang") == "en"
    c2 = c1 & (F.length("text") >= 200)
    c3 = c2 & (F.size(toks) >= 30)
    c4 = c3 & (
        F.size(F.array_distinct(toks)).cast("double") / F.size(toks) >= 0.5
    )
    agg = d.agg(
        F.count(F.lit(1)).alias("n0"),
        F.sum(c1.cast("long")).alias("n1"),
        F.sum(c2.cast("long")).alias("n2"),
        F.sum(c3.cast("long")).alias("n3"),
        F.sum(c4.cast("long")).alias("n4"),
    )
    return agg.select(
        F.expr(
            "stack(5, 's0_all', n0, 's1_lang_en', n1, 's2_len_ge_200', n2, "
            "'s3_toks_ge_30', n3, 's4_uniq_ge_050', n4) AS (stage, n_docs)"
        )
    )


@query(
    "q154_repetition_filters",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        uni AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY 1, 2
        ),
        u AS (
            SELECT doc_id, MAX(c) AS top_cnt, CAST(SUM(c) AS BIGINT) AS n_tokens
            FROM uni GROUP BY 1
        ),
        b AS (
            SELECT doc_id,
                   len(bg) AS n_bigrams,
                   len(list_distinct(bg)) AS n_distinct_bigrams
            FROM (
                SELECT doc_id,
                       list_transform(range(1, len(toks)),
                           i -> toks[i] || ' ' || toks[i+1]) AS bg
                FROM t WHERE len(toks) >= 2
            )
        ),
        r AS (
            SELECT u.doc_id, u.n_tokens,
                   round(CAST(u.top_cnt AS DOUBLE) / u.n_tokens, 6)
                       AS top_unigram_share,
                   round(1 - CAST(b.n_distinct_bigrams AS DOUBLE) / b.n_bigrams, 6)
                       AS dup_bigram_frac
            FROM u JOIN b ON u.doc_id = b.doc_id
        )
        SELECT doc_id, n_tokens, top_unigram_share, dup_bigram_frac,
               top_unigram_share > 0.1 OR dup_bigram_frac > 0.2
                   AS flagged_repetitive
        FROM r
    """,
)
def q154_repetition_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style within-document repetition filters: top-unigram
    share and duplicate-bigram fraction, plus the composite flag a
    pre-training cleaner would drop on — catches degenerate/looping
    text that length and punctuation heuristics (q37) miss. The flag
    is computed from the ROUNDED ratios in both engines so the
    boolean can never straddle a float boundary differently."""
    d = read_table(spark, sf_dir, "documents")
    r = TX.repetition_features(d)
    return r.select(
        "doc_id",
        "n_tokens",
        "top_unigram_share",
        "dup_bigram_frac",
        (
            (F.col("top_unigram_share") > 0.1) | (F.col("dup_bigram_frac") > 0.2)
        ).alias("flagged_repetitive"),
    )


@query(
    "q164_map_functions",
    oracle=f"""
        WITH tf AS (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest({_TOKS}) AS tok FROM documents)
            GROUP BY 1, 2
        )
        SELECT doc_id,
               COUNT(*) AS n_terms,
               CAST(COUNT(*) FILTER (c >= 3) AS BIGINT) AS n_frequent,
               COALESCE(array_to_string(
                   list_sort(list(tok || ':' || c) FILTER (c >= 3)), ','
               ), '') AS frequent_terms
        FROM tf GROUP BY doc_id
    """,
)
def q164_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed columns end to end: per-document term-frequency MAP
    built with ``map_from_entries``, thresholded with ``map_filter``,
    and read back out via ``map_entries`` — the Spark map-function
    surface (maps are how feature dictionaries and sparse vectors ride
    in columns). Maps have no cross-engine wire order, so the oracle
    compares a canonical serialization (sorted ``term:count`` strings)
    plus size aggregates — semantics checked, representation-free.
    collect_list order nondeterminism is irrelevant: map content is a
    set, and the serialization sorts."""
    d = read_table(spark, sf_dir, "documents")
    tf = (
        d.select("doc_id", F.explode(TX.tokens_col("text")).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    m = tf.groupBy("doc_id").agg(
        F.map_from_entries(F.collect_list(F.struct("tok", "c"))).alias("m")
    )
    filt = F.map_filter("m", lambda k, v: v >= 3)
    return m.select(
        "doc_id",
        F.size("m").cast("long").alias("n_terms"),
        F.size(filt).cast("long").alias("n_frequent"),
        F.array_join(
            F.array_sort(
                F.transform(
                    F.map_entries(filt),
                    lambda e: F.concat_ws(":", e["key"], e["value"]),
                )
            ),
            ",",
        ).alias("frequent_terms"),
    )


@query(
    "q166_regexp_extract_all",
    oracle=r"""
        WITH n AS (
            SELECT doc_id,
                   list_transform(regexp_extract_all(text, '[0-9]+'),
                                  x -> TRY_CAST(x AS BIGINT)) AS nums
            FROM documents
        )
        SELECT doc_id,
               CAST(len(nums) AS BIGINT) AS n_numbers,
               CAST(len(list_distinct(nums)) AS BIGINT) AS n_distinct_numbers,
               list_max(nums) AS max_number
        FROM n
    """,
)
def q166_regexp_extract_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``regexp_extract_all`` as a columnar extractor: pull every
    integer literal out of each document and profile them (count,
    distinct, max) — the structured-signal-from-raw-text shape (dates,
    ids, prices) that complements q141's redaction (which removes) by
    EXTRACTING. Element-wise ``try_cast`` inside the lambda keeps a
    pathological 30-digit token a NULL instead of an ANSI overflow
    error. Empty matches → empty array → NULL max, mirrored exactly.
    NULLs (overflowed casts) are dropped BEFORE the distinct count:
    DuckDB's ``list_distinct`` removes NULLs while Spark's
    ``array_distinct`` keeps one, so the filter makes both engines
    count only castable values (tests/test_corpus_queries.py locks
    the 30-digit-token case)."""
    d = read_table(spark, sf_dir, "documents")
    # idx=0 (whole match): Spark's default idx=1 raises on a group-less
    # pattern the moment a row actually matches — latent until data
    # contains digits (tests/test_corpus_queries.py plants some)
    nums = F.transform(
        F.regexp_extract_all("text", F.lit("[0-9]+"), F.lit(0)),
        lambda x: x.try_cast("bigint"),
    )
    n = d.select("doc_id", nums.alias("nums"))
    non_null = F.filter("nums", lambda x: x.isNotNull())
    return n.select(
        "doc_id",
        F.size("nums").cast("long").alias("n_numbers"),
        F.size(F.array_distinct(non_null)).cast("long").alias("n_distinct_numbers"),
        F.array_max("nums").alias("max_number"),
    )


@query(
    "q167_mixture_reweighting",
    oracle=f"""
        WITH per AS (
            SELECT lang, source, COUNT(*) AS n_docs,
                   CAST(SUM(len({_TOKS})) AS BIGINT) AS n_tokens
            FROM documents GROUP BY 1, 2
        ),
        tot AS (
            SELECT CAST(SUM(n_docs) AS BIGINT) AS total_docs,
                   COUNT(DISTINCT lang) AS n_langs
            FROM per
        ),
        lang_tot AS (
            SELECT lang, CAST(SUM(n_docs) AS BIGINT) AS lang_docs
            FROM per GROUP BY 1
        )
        SELECT p.lang, p.source, p.n_docs, p.n_tokens,
               round(CAST(l.lang_docs AS DOUBLE) / t.total_docs, 6) AS lang_share,
               round((1.0 / t.n_langs)
                     / (CAST(l.lang_docs AS DOUBLE) / t.total_docs), 6) AS weight,
               round(p.n_docs * round((1.0 / t.n_langs)
                     / (CAST(l.lang_docs AS DOUBLE) / t.total_docs), 6), 6)
                   AS expected_docs
        FROM per p
        JOIN lang_tot l ON p.lang = l.lang
        CROSS JOIN tot t
    """,
)
def q167_mixture_reweighting(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting: compute per-language sampling
    weights that rebalance the corpus to a UNIFORM language mixture
    (weight = target_share / actual_share), reported per (lang,
    source) cell with document and token masses — the
    domain/language-rebalancing pass every pre-training data recipe
    applies before sampling. The two scalar totals ride a 1-row
    broadcast cross join (the repo's scalar-aggregate pattern — no
    row explosion); expected_docs multiplies the ROUNDED weight in
    both engines so the product can't straddle a float boundary."""
    d = read_table(spark, sf_dir, "documents")
    per = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(TX.tokens_col("text"))).cast("long").alias("n_tokens"),
    )
    tot = per.agg(
        F.sum("n_docs").cast("long").alias("total_docs"),
        F.countDistinct("lang").alias("n_langs"),
    )
    lang_tot = per.groupBy("lang").agg(F.sum("n_docs").cast("long").alias("lang_docs"))
    j = per.join(lang_tot, "lang").crossJoin(F.broadcast(tot))
    share = F.col("lang_docs").cast("double") / F.col("total_docs")
    weight = F.round((F.lit(1.0) / F.col("n_langs")) / share, 6)
    return j.select(
        "lang",
        "source",
        "n_docs",
        "n_tokens",
        F.round(share, 6).alias("lang_share"),
        weight.alias("weight"),
        F.round(F.col("n_docs") * weight, 6).alias("expected_docs"),
    )
