"""Round-4 breadth queries: the LSH banding ladder made fully
cross-engine-checkable, corpus-pipeline derivatives (shard balance,
chunk fill, novelty, prefix dedup), and operator-surface breadth
(bitwise/boolean aggregates, try-arithmetic, string/date/regexp
function families).

Theme: everything here is hash-checked against DuckDB — including the
banded candidate GENERATION itself (q172/q173), previously only
provable as plan shape. No reference analog beyond §2's function rows
(the reference is a fixed 3-notebook pipeline); the dedup/corpus
queries extend SURVEY.md §2.12, the function families extend §2.8.

Determinism rules followed throughout (README): identical aliases both
sides, md5 (not engine-seeded hashes) for any cross-engine fingerprint,
MINSTD portable hash for bucketing, round(·, 6) on every ratio,
explicit tiebreakers, timestamps-not-dates in outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.operators import text as TX
from databricks_etl_spark.operators.sampling import hash_bucket
from databricks_etl_spark.plans.registry import query
from databricks_etl_spark.sources.readers import read_table

_TOKS = r"string_split_regex(lower(trim(text)), '\s+')"
_N_BANDS = 4

def _bands_sql_over(src: str) -> str:
    """The md5-banding CTE chain over an arbitrary (doc_id, text)
    source relation — shared with the incremental-maintenance queries
    (queries_round6), which band a corpus ∪ batch union."""
    return f"""
        t AS (SELECT doc_id, {_TOKS} AS toks FROM {src}),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i : i + 2], ' ') AS shingle
            FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
                  FROM t WHERE len(toks) >= 3)
        ),
        hh AS (SELECT doc_id, md5(shingle) AS h FROM sh),
        w AS (
            SELECT doc_id,
                   {", ".join(f"min(substr(h, {8 * b + 1}, 8)) AS b{b}" for b in range(_N_BANDS))}
            FROM hh GROUP BY doc_id
        ),
        b AS (
            {" UNION ALL ".join(f"SELECT doc_id, {b} AS band, b{b} AS band_hash FROM w" for b in range(_N_BANDS))}
        )
"""


_BANDS_SQL = _bands_sql_over("documents")


def _band_buckets(
    spark: SparkSession, sf_dir: str, shingle_set: DataFrame | None = None
) -> DataFrame:
    """(doc_id, band, band_hash): md5-banded MinHash — ONE md5 per
    distinct 3-gram shingle, split into 4 disjoint 8-hex-char (32-bit)
    slices, band b's value = per-doc min over slice b (the standard
    split-one-strong-hash-into-k-hashes construction — Kirsch-
    Mitzenmacher-style — so banding costs one hash per shingle, not
    one per shingle per band; measured ~15% faster warm at sf0.1 than
    the previous md5('b|shingle') form, with identical collision
    statistics). Unlike the seeded ``pyspark.ml`` family (q45), md5 is
    engine-portable, so the banding itself is oracle-checkable. One
    shuffle: the per-doc 4-column min-aggregate (map-side combinable,
    carries 4 hashes/doc/partition — no 4× explode row blowup);
    the band unpivot afterwards is shuffle-free."""
    if shingle_set is None:
        d = read_table(spark, sf_dir, "documents")
        # r17 (guide §2.4 "remove shuffles outright"): NO distinct —
        # MIN is multiplicity-invariant, so duplicate (doc, shingle)
        # rows cannot change any band minimum and the distinct's full
        # shuffle+sort of the biggest string relation in the plan buys
        # nothing. md5 now runs per occurrence instead of per distinct
        # shingle (cheap, map-side); the only shuffle left is the
        # map-combined per-doc aggregate. Bit-identical output —
        # the oracle keeps its distinct, same minima. Profiled on
        # q185: the banding pass dominated the lane (1.85 s of 2.58 s
        # noop median at sf0.1).
        sh = TX.shingles(d, 3)
    else:
        # caller shares one materialized (doc_id, shingle) relation
        # across several ladder rungs (q240) — skip the corpus pass
        sh = shingle_set
    hh = sh.select("doc_id", F.md5("shingle").alias("h"))
    # min over the NUMERIC value of each 8-hex-char slice, not the
    # string: fixed-width lowercase hex is order-isomorphic to its
    # integer value ('0'-'9' < 'a'-'f' lexicographically AND
    # numerically), so the minimum is the same element — but a LONG
    # min has a mutable aggregation buffer, so the per-doc aggregate
    # runs as a map-combinable HashAggregate instead of Sort +
    # SortAggregate over the whole shingle-hash relation (r16: the
    # two sorts were the top cost in q255's profile). The hex string
    # is re-materialized per-doc afterwards (lpad/hex/lower), bit-
    # identical to the former substring.
    wide = hh.groupBy("doc_id").agg(
        *[
            F.min(
                F.conv(F.substring("h", 8 * b + 1, 8), 16, 10).cast("long")
            ).alias(f"b{b}")
            for b in range(_N_BANDS)
        ]
    )
    stack_args = ", ".join(
        f"{b}, lpad(lower(hex(b{b})), 8, '0')" for b in range(_N_BANDS)
    )
    return wide.select(
        "doc_id",
        F.expr(f"stack({_N_BANDS}, {stack_args}) AS (band, band_hash)"),
    ).select("doc_id", F.col("band").cast("int").alias("band"), "band_hash")


@query(
    "q172_lsh_band_buckets",
    oracle=f"""
        WITH {_BANDS_SQL}
        SELECT doc_id, band, band_hash FROM b
    """,
)
def q172_lsh_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band signatures, bit-for-bit cross-engine (the deterministic
    twin of q45's seeded MinHashLSH, same relationship q163's md5
    SimHash has to q46): every (doc, band) bucket key is hash-checked,
    so a banding regression — wrong shingle set, wrong band salt,
    wrong min — is caught by the driver, not just by plan-shape tests.
    100 TB: identical shuffle profile to a grouped min-aggregate."""
    return _band_buckets(spark, sf_dir)


@query(
    "q173_band_collision_candidates",
    oracle=f"""
        WITH {_BANDS_SQL}
        SELECT a.doc_id AS id_a, c.doc_id AS id_b,
               CAST(COUNT(*) AS BIGINT) AS n_shared_bands
        FROM b a JOIN b c
          ON a.band = c.band AND a.band_hash = c.band_hash
         AND a.doc_id < c.doc_id
        GROUP BY 1, 2
    """,
)
def q173_band_collision_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE LSH candidate-generation step, hash-checked end to end: a
    bucketed equi-join of band signatures against themselves — docs
    collide exactly when a band's min-hash matches, with collision
    probability ≈ Jaccard per band (the banding theorem). This is the
    operation the 100 TB-safe claim rests on (candidates come from
    bucket joins, never an all-pairs product), now proven by value
    hash rather than plan audit alone. ~500 docs → ~490 candidate
    pairs at sf0.01: linear in corpus, as the scale gate demands."""
    b = _band_buckets(spark, sf_dir)
    a = b.select(F.col("doc_id").alias("id_a"), "band", "band_hash")
    c = b.select(F.col("doc_id").alias("id_b"), "band", "band_hash")
    return (
        a.join(c, ["band", "band_hash"])
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )


@query(
    "q174_neardup_rate_by_source",
    oracle=f"""
        WITH {_BANDS_SQL},
        cand AS (
            SELECT DISTINCT a.doc_id AS id_a, c.doc_id AS id_b
            FROM b a JOIN b c
              ON a.band = c.band AND a.band_hash = c.band_hash
             AND a.doc_id < c.doc_id
        ),
        flagged AS (
            SELECT id_a AS doc_id FROM cand
            UNION SELECT id_b FROM cand
        )
        SELECT d.source,
               COUNT(*) AS n_docs,
               CAST(COUNT(f.doc_id) AS BIGINT) AS n_flagged,
               round(CAST(COUNT(f.doc_id) AS DOUBLE) / COUNT(*), 6) AS flag_rate
        FROM documents d LEFT JOIN flagged f ON d.doc_id = f.doc_id
        GROUP BY d.source
    """,
)
def q174_neardup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-health rollup over the candidate graph: per ingestion
    source, how many documents are implicated in at least one LSH
    band collision — the per-feed dup-rate dashboard a crawl pipeline
    watches (a feed whose flag_rate jumps is re-crawling itself).
    Composition proof: banding (q172) → candidates (q173) → relational
    rollup, all in one hash-checked plan."""
    cand = q173_band_collision_candidates(spark, sf_dir)
    flagged = (
        cand.select(F.col("id_a").alias("doc_id"))
        .union(cand.select("id_b"))
        .distinct()
        .withColumn("__flag", F.lit(1))
    )
    d = read_table(spark, sf_dir, "documents")
    return (
        d.join(flagged, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count("__flag").cast("long").alias("n_flagged"),
            F.round(
                F.count("__flag").cast("double") / F.count(F.lit(1)), 6
            ).alias("flag_rate"),
        )
    )


@query(
    "q175_shard_balance",
    oracle=f"""
        WITH t AS (
            SELECT ((doc_id % 1000000007) * 48271) % 1000000007 % 16 AS shard,
                   len({_TOKS}) AS n_toks
            FROM documents
        ),
        per AS (
            SELECT CAST(shard AS INT) AS shard,
                   COUNT(*) AS n_docs,
                   CAST(SUM(n_toks) AS BIGINT) AS n_tokens
            FROM t GROUP BY 1
        ),
        g AS (SELECT CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS mean_tokens FROM per)
        SELECT shard, n_docs, n_tokens,
               round(n_tokens / g.mean_tokens, 6) AS balance_ratio
        FROM per, g
    """,
)
def q175_shard_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-shard assignment audit: documents land in 16 shards by
    the portable MINSTD hash (q125's reproducible-subset machinery
    applied to sharding), and each shard's token mass is compared to
    the mean — the balance check run before writing webdataset-style
    shards, because a skewed shard serializes the epoch at 100 TB.
    Zero-shuffle assignment (hash evaluates in the scan), one
    map-combinable aggregate; the mean rides a whole-relation window
    over the 16 aggregated rows — NOT a second aggregate branch, which
    would re-scan documents (plan-audited single-scan in
    tests/test_plan_audit.py)."""
    from pyspark.sql import Window

    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        hash_bucket(F.col("doc_id"), 16).alias("shard"),
        F.size(TX.tokens_col("text")).alias("n_toks"),
    )
    per = t.groupBy(F.col("shard").cast("int").alias("shard")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
    )
    w = Window.partitionBy()
    mean_tokens = (
        F.sum("n_tokens").over(w).cast("double") / F.count(F.lit(1)).over(w)
    )
    return per.select(
        "shard",
        "n_docs",
        "n_tokens",
        F.round(F.col("n_tokens") / mean_tokens, 6).alias("balance_ratio"),
    )


@query(
    "q176_chunk_fill_stats",
    oracle=rf"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        c AS (
            SELECT doc_id, len(toks) AS n_tokens,
                   CAST(start / 40 AS BIGINT) AS chunk_id,
                   len(toks[start + 1 : start + 50]) AS chunk_len
            FROM (SELECT doc_id, toks, unnest(range(0, len(toks), 40)) AS start
                  FROM t)
        )
        SELECT doc_id,
               CAST(MAX(n_tokens) AS BIGINT) AS n_tokens,
               CAST(COUNT(*) AS BIGINT) AS n_chunks,
               CAST(arg_max(chunk_len, chunk_id) AS BIGINT) AS last_chunk_tokens,
               round(AVG(CAST(chunk_len AS DOUBLE)) / 50, 6) AS mean_fill
        FROM c GROUP BY doc_id
    """,
)
def q176_chunk_fill_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window utilization audit over q139's chunking scheme
    (50-token windows, stride 40): per document, how many chunks, how
    full the ragged last chunk is, and the mean fill fraction — the
    numbers that decide whether a packing pass (q140) is worth its
    shuffle before training. Same chunk relation as q139, aggregated
    instead of emitted."""
    d = read_table(spark, sf_dir, "documents")
    base = d.select("doc_id", TX.tokens_col("text").alias("toks"))
    chunks = base.select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.explode(
            F.sequence(F.lit(0), F.size("toks") - 1, F.lit(40))
        ).alias("start"),
        "toks",
    ).select(
        "doc_id",
        "n_tokens",
        (F.col("start") / 40).cast("long").alias("chunk_id"),
        F.size(F.slice("toks", F.col("start") + 1, 50)).alias("chunk_len"),
    )
    return chunks.groupBy("doc_id").agg(
        F.max("n_tokens").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_chunks"),
        F.max_by("chunk_len", "chunk_id").cast("long").alias("last_chunk_tokens"),
        F.round(F.avg(F.col("chunk_len").cast("double")) / 50, 6).alias("mean_fill"),
    )


@query(
    "q177_bitwise_aggregates",
    oracle="""
        SELECT o_orderpriority,
               CAST(bit_and(o_orderkey) AS BIGINT) AS key_bit_and,
               CAST(bit_or(o_orderkey) AS BIGINT) AS key_bit_or,
               CAST(bit_xor(o_orderkey) AS BIGINT) AS key_bit_xor,
               CAST(bit_count(bit_or(o_orderkey)) AS BIGINT) AS or_popcount
        FROM orders GROUP BY o_orderpriority
    """,
)
def q177_bitwise_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitwise aggregate family (bit_and/bit_or/bit_xor + popcount of
    the OR) — the bitmap-index building blocks (presence masks, XOR
    parity checks for replication audits). Commutative/associative →
    map-side combinable, fully deterministic on any partitioning."""
    o = read_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.bit_and("o_orderkey").cast("long").alias("key_bit_and"),
        F.bit_or("o_orderkey").cast("long").alias("key_bit_or"),
        F.bit_xor("o_orderkey").cast("long").alias("key_bit_xor"),
        F.bit_count(F.bit_or("o_orderkey")).cast("long").alias("or_popcount"),
    )


@query(
    "q178_boolean_aggregates",
    oracle="""
        SELECT l_returnflag,
               bool_and(l_discount <= 0.08) AS all_discount_moderate,
               bool_or(l_quantity >= 49) AS any_bulk_line,
               CAST(count_if(l_tax > 0.04) AS BIGINT) AS n_high_tax,
               CAST(count_if(l_returnflag = 'R' AND l_quantity < 5) AS BIGINT)
                   AS n_small_returns
        FROM lineitem GROUP BY l_returnflag
    """,
)
def q178_boolean_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean aggregate family (bool_and / bool_or / count_if) — the
    assertion-style data-quality rollups (\"every row satisfies X\",
    \"any row violates Y\") that complement the profile operators
    (A9-A11) with short-circuitable semantics. Map-side combinable."""
    li = read_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.bool_and(F.col("l_discount") <= 0.08).alias("all_discount_moderate"),
        F.bool_or(F.col("l_quantity") >= 49).alias("any_bulk_line"),
        F.count_if(F.col("l_tax") > 0.04).cast("long").alias("n_high_tax"),
        F.count_if(
            (F.col("l_returnflag") == "R") & (F.col("l_quantity") < 5)
        ).cast("long").alias("n_small_returns"),
    )


@query(
    "q179_string_function_breadth",
    oracle="""
        SELECT p_partkey,
               split_part(p_type, ' ', 1) AS type_head,
               translate(p_name, 'aeiou', 'AEIOU') AS name_novowel,
               lpad(CAST(p_partkey AS VARCHAR), 10, '0') AS key_padded,
               repeat(left(p_brand, 2), 2) AS brand_echo,
               right(p_name, 5) AS name_tail,
               contains(p_name, 'green') AS is_green
        FROM part
    """,
)
def q179_string_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String-function surface in one scan-local pass: split_part,
    translate, lpad, repeat, left/right, contains — the
    normalization/formatting toolbox (all JVM-side codegen, no UDF,
    no shuffle; every expression pushes into the scan projection)."""
    p = read_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.split_part(F.col("p_type"), F.lit(" "), F.lit(1)).alias("type_head"),
        F.translate("p_name", "aeiou", "AEIOU").alias("name_novowel"),
        F.lpad(F.col("p_partkey").cast("string"), 10, "0").alias("key_padded"),
        F.repeat(F.left(F.col("p_brand"), F.lit(2)), 2).alias("brand_echo"),
        F.right(F.col("p_name"), F.lit(5)).alias("name_tail"),
        F.contains(F.col("p_name"), F.lit("green")).alias("is_green"),
    )


@query(
    "q180_try_arithmetic",
    oracle="""
        SELECT o_orderkey,
               CASE WHEN o_orderkey % 2 = 1
                    THEN CAST(o_totalprice AS DOUBLE) END AS half_safe_div,
               CASE WHEN o_orderkey = 0 THEN 0
                    WHEN o_orderkey = 1 THEN 9223372036854775807
               END AS overflow_guarded
        FROM orders
    """,
)
def q180_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-mode try_* arithmetic (F9's NULL-on-error cast policy
    extended to expressions): division by a zero denominator and
    BIGINT multiply overflow both yield NULL instead of failing the
    job — the semantics a 100 TB pipeline needs, where one poisoned
    row must not kill a stage. The oracle states the same algebra with
    explicit CASE guards (DuckDB would raise on the raw ops)."""
    o = read_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.try_divide(
            F.col("o_totalprice").cast("double"), (F.col("o_orderkey") % 2).cast("double")
        ).alias("half_safe_div"),
        F.try_multiply(
            F.col("o_orderkey"), F.lit(9223372036854775807).cast("long")
        ).alias("overflow_guarded"),
    )


@query(
    "q181_date_function_breadth",
    oracle="""
        SELECT o_orderkey,
               CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP)
                   AS quarter_start_ts,
               CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP)
                   AS month_end_ts,
               CAST(make_date(CAST(year(o_orderdate) AS INT),
                              CAST(month(o_orderdate) AS INT), 1) AS TIMESTAMP)
                   AS month_start_ts,
               CAST(quarter(o_orderdate) AS BIGINT) AS q,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
               CAST(dayofweek(o_orderdate) AS BIGINT) AS dow_sun0
        FROM orders
    """,
)
def q181_date_function_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar-function surface (F1-F7's family completed):
    date_trunc to quarter, last_day, make_date, quarter/dayofyear, and
    day-of-week NORMALIZED to Sunday=0 — Spark counts Sunday=1 while
    DuckDB counts Sunday=0, exactly the cross-engine convention trap
    this repo's determinism rules exist to neutralize; outputs are
    timestamps, never dates (README rule)."""
    o = read_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        F.date_trunc("quarter", d).alias("quarter_start_ts"),
        F.last_day(d).cast("timestamp").alias("month_end_ts"),
        F.make_date(F.year(d), F.month(d), F.lit(1))
        .cast("timestamp")
        .alias("month_start_ts"),
        F.quarter(d).cast("long").alias("q"),
        F.dayofyear(d).cast("long").alias("doy"),
        (F.dayofweek(d) - 1).cast("long").alias("dow_sun0"),
    )


@query(
    "q182_regexp_breadth",
    oracle=r"""
        SELECT doc_id,
               CAST(len(regexp_extract_all(text, '[aeiou]+')) AS BIGINT)
                   AS n_vowel_runs,
               regexp_extract(text, '\bs[a-z]+') AS first_s_word,
               regexp_replace(left(text, 40), '^(\w+) (\w+)', '\2 \1')
                   AS head_swapped
        FROM documents
    """,
)
def q182_regexp_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regexp surface beyond extraction (q141 redacts, q166 extracts):
    regexp_count, regexp_substr (NULL on miss → coalesced to '' to
    match DuckDB's empty-string convention), and a backreference
    swap — note the dialect trap: Spark backrefs are ``$1``, DuckDB's
    are ``\\1``; the pair here is the worked example. Scan-local."""
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_count("text", F.lit("[aeiou]+")).cast("long").alias("n_vowel_runs"),
        F.coalesce(
            F.regexp_substr("text", F.lit(r"\bs[a-z]+")), F.lit("")
        ).alias("first_s_word"),
        F.regexp_replace(
            F.left(F.col("text"), F.lit(40)), r"^(\w+) (\w+)", r"$2 $1"
        ).alias("head_swapped"),
    )


@query(
    "q183_ngram_novelty",
    oracle=f"""
        WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
        sh AS (
            SELECT DISTINCT doc_id,
                   array_to_string(toks[i : i + 2], ' ') AS shingle
            FROM (SELECT doc_id, toks, unnest(range(1, len(toks) - 1)) AS i
                  FROM t WHERE len(toks) >= 3)
        ),
        first_seen AS (
            SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY shingle
        )
        SELECT s.doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_shingles,
               CAST(COUNT(*) FILTER (f.first_doc = s.doc_id) AS BIGINT) AS n_novel,
               round(CAST(COUNT(*) FILTER (f.first_doc = s.doc_id) AS DOUBLE)
                     / COUNT(*), 6) AS novelty_rate
        FROM sh s JOIN first_seen f ON s.shingle = f.shingle
        GROUP BY s.doc_id
    """,
)
def q183_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram novelty scoring: for each document (in doc_id ingestion
    order), the fraction of its distinct 3-gram shingles never seen in
    any earlier document — the incremental-crawl signal that separates
    fresh content from recombinated boilerplate (a near-zero novelty
    doc is a remix even if no single pair-wise Jaccard flags it).
    Two map-combinable aggregates + one shuffle join on the shingle
    key; at 100 TB first_seen is exactly the inverted index the
    near-dup pass (q44) already builds."""
    d = read_table(spark, sf_dir, "documents")
    sh = TX.shingles(d, 3).distinct()
    first_seen = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first_seen, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_shingles"),
            F.count_if(F.col("first_doc") == F.col("doc_id"))
            .cast("long")
            .alias("n_novel"),
            F.round(
                F.count_if(F.col("first_doc") == F.col("doc_id")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("novelty_rate"),
        )
    )


@query(
    "q184_prefix_dedup_survivorship",
    oracle=f"""
        WITH t AS (
            SELECT doc_id, source,
                   md5(array_to_string(({_TOKS})[1:5], ' ')) AS prefix_key
            FROM documents
        ),
        keep AS (SELECT prefix_key, MIN(doc_id) AS survivor FROM t GROUP BY 1)
        SELECT t.source,
               COUNT(*) AS n_docs,
               CAST(COUNT(*) FILTER (t.doc_id = k.survivor) AS BIGINT)
                   AS n_survivors,
               round(CAST(COUNT(*) FILTER (t.doc_id = k.survivor) AS DOUBLE)
                     / COUNT(*), 6) AS survival_rate
        FROM t JOIN keep k ON t.prefix_key = k.prefix_key
        GROUP BY t.source
    """,
)
def q184_prefix_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-fingerprint dedup survivorship: documents sharing the
    same first-5-token md5 (the cheap URL-boilerplate/mirror detector
    run BEFORE full near-dup) are collapsed keep-first (min doc_id,
    deterministic), reported as per-source survival rates — the
    per-feed dedup loss accounting every ingest report carries. Same
    keep-first semantics as q42, keyed on a normalized prefix instead
    of the whole body."""
    d = read_table(spark, sf_dir, "documents")
    t = d.select(
        "doc_id",
        "source",
        F.md5(
            F.concat_ws(" ", F.slice(TX.tokens_col("text"), 1, 5))
        ).alias("prefix_key"),
    )
    keep = t.groupBy("prefix_key").agg(F.min("doc_id").alias("survivor"))
    return (
        t.join(keep, "prefix_key")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.count_if(F.col("doc_id") == F.col("survivor"))
            .cast("long")
            .alias("n_survivors"),
            F.round(
                F.count_if(F.col("doc_id") == F.col("survivor")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("survival_rate"),
        )
    )
