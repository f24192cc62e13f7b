"""Deduplication operators (north-star extension, SURVEY.md §2.12):
exact, n-gram Jaccard, bottom-k MinHash, MinHashLSH, SimHash.

Scale ladder (cheapest first):
1. :func:`dedup_exact` — one hash-shuffle on the content key.
2. :func:`jaccard_pairs` — exact set-similarity via shingle self-join;
   scalable shape (inverted index join) but O(sum of posting-list²)
   worst case → use on bounded candidate sets.
3. :func:`minhash_lsh_pairs` — ``pyspark.ml`` MinHashLSH banding:
   candidate generation is hash-bucket equi-join, the 100 TB path.
4. :func:`simhash64` — 64-bit SimHash; near-dups share band prefixes.

(1), (2) and bottom-k sketches are exactly SQL-expressible (oracle
checked); LSH/SimHash use seeded hashes → rows-only driver checks +
invariant tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from databricks_etl_spark.operators.text import shingles, tokens_col


def dedup_exact(
    df: DataFrame, content_cols: list[str], id_col: str
) -> DataFrame:
    """Exact dedup on content columns, keeping the smallest id —
    deterministic (hard part (c)): survivors are reproducible, unlike
    ``dropDuplicates``. One shuffle on the content key."""
    w = Window.partitionBy(*content_cols).orderBy(id_col)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def token_sets(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, token) with per-doc distinct tokens — the unigram inverted
    index."""
    return df.select(
        id_col, F.explode(F.array_distinct(tokens_col(text_col))).alias("token")
    )


def jaccard_pairs(
    df: DataFrame,
    threshold: float,
    *,
    ngram: int = 1,
    items: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via inverted-index self-join.

    shared(a,b) = |S_a ∩ S_b| from the index join; |S_a ∪ S_b| =
    |S_a| + |S_b| - shared. Emits (id_a < id_b, jaccard) above
    ``threshold``. Jaccard is an exact int/int division → identical
    across engines (rounded to 6dp for hash stability).

    ``max_df`` is the 100 TB guard: a token appearing in k documents
    contributes k² rows to the self-join, so one stop-token-like item
    can blow up the candidate set quadratically. With ``max_df`` set,
    items with document frequency > max_df are dropped from the index
    *and* from the set sizes (standard near-dup practice: similarity
    over non-ubiquitous features), bounding the join at
    O(Σ min(df, max_df)²). The df filter is one extra groupBy on the
    same ``item`` key the self-join shuffles on — no new shuffle key.
    """
    derived = items is None
    if derived:
        if ngram == 1:
            items = token_sets(df, text_col, id_col).withColumnRenamed(
                "token", "item"
            )
        else:
            items = shingles(df, ngram, text_col, id_col).select(
                id_col, F.col("shingle").alias("item")
            ).distinct()
    if max_df is not None:
        keep = (
            items.groupBy("item")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("item")
        )
        items = items.join(keep, "item").select(id_col, "item")
    # the (id, item) index is consumed THREE times (both self-join
    # sides + set sizes); when WE derived it from raw text, a lazy
    # localCheckpoint computes the tokenize/shingle pass once instead
    # of per consumer (r16: q255's plan showed four copies of the keep
    # subtree). When the CALLER passed a pre-built items relation it
    # is already materialized upstream (q240/q255 share one shingle
    # checkpoint across ladder rungs) — a second item-grain
    # materialization of the df-filtered copy costs more than the
    # aggregate+join recompute it saves (r17: q255 warm regression,
    # BENCH_r16 per_query −27%), so the sharing decision stays with
    # the caller.
    if derived:
        items = items.localCheckpoint(eager=False)
    sizes = items.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = items.select(F.col(id_col).alias("id_a"), "item")
    b = items.select(F.col(id_col).alias("id_b"), "item")
    shared = (
        a.join(b, "item")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    jac = F.col("shared").cast("double") / (
        F.col("size_a") + F.col("size_b") - F.col("shared")
    )
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(jac, 6).alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    threshold: float,
    *,
    ngram: int = 3,
    items: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = None,
) -> DataFrame:
    """Asymmetric containment near-dup pairs: C(a→b) = |S_a ∩ S_b| /
    |S_a|. Catches SUBSET duplication Jaccard misses — a short doc
    fully quoted inside a long one has high containment but low
    Jaccard (|union| is dominated by the long doc). The standard
    second rung of a dedup ladder after symmetric Jaccard.

    Emits (id_a < id_b, cont_ab, cont_ba) where either direction
    clears ``threshold``. Same inverted-index plan and ``max_df``
    posting-cap scale guard as :func:`jaccard_pairs` — identical
    shuffle profile, one extra division per candidate pair.
    """
    derived = items is None
    if derived:
        if ngram == 1:
            items = token_sets(df, text_col, id_col).withColumnRenamed(
                "token", "item"
            )
        else:
            items = shingles(df, ngram, text_col, id_col).select(
                id_col, F.col("shingle").alias("item")
            ).distinct()
    if max_df is not None:
        keep = (
            items.groupBy("item")
            .agg(F.count(F.lit(1)).alias("__df"))
            .filter(F.col("__df") <= max_df)
            .select("item")
        )
        items = items.join(keep, "item").select(id_col, "item")
    # same sharing rule as jaccard_pairs: materialize the 3-consumer
    # index only when derived from raw text here; a caller-passed
    # relation is already shared upstream (see jaccard_pairs comment).
    if derived:
        items = items.localCheckpoint(eager=False)
    sizes = items.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    a = items.select(F.col(id_col).alias("id_a"), "item")
    b = items.select(F.col(id_col).alias("id_b"), "item")
    shared = (
        a.join(b, "item")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("set_size").alias("size_b"))
    cab = F.round(F.col("shared").cast("double") / F.col("size_a"), 6)
    cba = F.round(F.col("shared").cast("double") / F.col("size_b"), 6)
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", cab.alias("cont_ab"), cba.alias("cont_ba"))
        .filter((F.col("cont_ab") >= threshold) | (F.col("cont_ba") >= threshold))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    *,
    threshold: float = 0.6,
    num_hashes: int = 16,
    num_features: int = 1 << 18,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Approximate near-dup pairs via ``pyspark.ml`` MinHashLSH.

    Pipeline: distinct word ``shingle_n``-gram shingles → HashingTF
    binary vectors → MinHashLSH(seed) → ``approxSimilarityJoin``
    (bucketed equi-join on band hashes — candidate generation never
    goes quadratic *in the corpus*). Distance is (1 - estimated
    Jaccard); rows-only oracle (seeded hash family is not
    SQL-reproducible).

    Shingles, not unigrams, are the 100 TB-safe feature set: unigram
    token SETS over a bounded vocabulary converge (any two long docs
    share most words), so the TRUE near-dup pair count — which no LSH
    can undercut — goes quadratic. 3-gram shingles are position-
    sensitive and effectively unique per phrase, keeping true pairs
    (and therefore output + distance work) near-linear; the scale gate
    in tests/test_dedup_similarity.py locks a ≤4× wall ratio on a 16×
    corpus, which the unigram formulation fails by ~16×. Same
    granularity as the exact 3-gram Jaccard twin (q44).

    The input is hash-repartitioned to the cluster's parallelism first:
    the LSH explode+self-join otherwise inherits
    ``spark.sql.shuffle.partitions`` tasks per stage, which is ~10×
    slower when partitions vastly outnumber rows-per-core (measured);
    on a real cluster the same call keeps every core busy.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from databricks_etl_spark.operators.text import shingle_array

    parallelism = df.sparkSession.sparkContext.defaultParallelism
    # materialize the token array behind a projection boundary first —
    # inlining tokens_col into shingle_array's lambda would re-run the
    # regex split once per element_at (same rule as text.shingles)
    # Rows with an EMPTY shingle set are filtered out — but Catalyst
    # may reorder the LSH model's hash UDF (deterministic) ahead of
    # this filter inside a merged predicate, and MinHashLSHModel
    # refuses all-zero vectors. Substituting a sentinel singleton for
    # empty sets makes the UDF total on every row it can possibly see;
    # the filter still drops those rows from every result, so two
    # empty inputs can never pair via the shared sentinel.
    sh = F.array_distinct(shingle_array(F.col("__toks"), shingle_n))
    toks = (
        df.repartition(parallelism, id_col)
        .select(id_col, tokens_col(text_col).alias("__toks"))
        .select(id_col, sh.alias("__sh"))
        .select(
            id_col,
            F.when(F.size("__sh") > 0, F.col("__sh"))
            .otherwise(F.array(F.lit("\x00empty")))
            .alias("toks"),
            F.size("__sh").alias("__n"),
        )
        .filter(F.col("__n") > 0)
        .drop("__n")
    )
    tf = HashingTF(inputCol="toks", outputCol="features", numFeatures=num_features, binary=True)
    feats = tf.transform(toks).select(id_col, "features")
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=42)
    model = lsh.fit(feats)
    # r17 (guide §2.4): pre-hash ONCE and hand the same relation to
    # both self-join sides — approxSimilarityJoin only transforms a
    # side that lacks the output column, so without this each side
    # re-ran the whole tokenize→shingle→TF→minhash pipeline (the
    # banding lanes' residual cost, OPTIMIZATION_r16 "not yet").
    # Projected to (id, features, hashes) before the lazy checkpoint so
    # the materialization never carries the shingle-string array.
    hashed = model.transform(feats).localCheckpoint(eager=False)
    pairs = model.approxSimilarityJoin(hashed, hashed, 1.0 - threshold, distCol="dist")
    return pairs.select(
        F.col(f"datasetA.{id_col}").alias("id_a"),
        F.col(f"datasetB.{id_col}").alias("id_b"),
        (1 - F.col("dist")).alias("est_jaccard"),
    ).filter(F.col("id_a") < F.col("id_b"))


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash per document: xxhash64(token) bit-votes.

    Pure built-ins, vectorized across bits: one aggregate with 64
    per-bit vote sums (``SUM(CASE (h >> i) & 1 ...)``) — all map-side
    combinable, so the shuffle carries ~one 64-column row per doc per
    input partition instead of the 64×-row-blowup an
    ``explode(sequence(0,63))`` formulation pays. The signature is
    re-assembled from the vote signs with literal shifts (bit 63's
    ``shiftleft`` is the sign bit — the sum lands exactly on the
    two's-complement value, no overflow). Near-dup docs differ in few
    bits (compare via hamming distance). Seeded engine hash →
    rows-only oracle; bit-identical to the exploded formulation.
    """
    toks = df.select(id_col, F.explode(tokens_col(text_col)).alias("tok"))
    h = toks.withColumn("h", F.xxhash64("tok"))
    votes = h.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.expr(f"(h >> {i}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"__b{i}")
            for i in range(64)
        ]
    )
    terms = [
        F.expr(
            f"CASE WHEN __b{i} > 0 THEN shiftleft(CAST(1 AS BIGINT), {i}) "
            f"ELSE CAST(0 AS BIGINT) END"
        )
        for i in range(64)
    ]
    sig = terms[0]
    for t in terms[1:]:
        sig = sig + t
    return votes.select(id_col, sig.cast("long").alias("simhash"))


def incremental_band_join(
    batch_bands: DataFrame,
    corpus_bands: DataFrame,
    *,
    id_col: str = "doc_id",
    max_bucket: int | None = None,
) -> DataFrame:
    """Incremental near-dup maintenance: candidates for a NEW batch
    against an EXISTING corpus band index — the production shape at
    100 TB, where re-banding the whole corpus per ingest is a
    non-starter. Inputs are (id, band, band_hash) relations (the q172
    construction, ``plans/queries_round4._band_buckets``); the corpus
    side is the *persisted* index — its documents are never re-read,
    re-shingled, or re-hashed.

    Emits (id_a, id_b, n_shared_bands, cross_corpus) for every pair
    that TOUCHES the batch: batch×corpus collisions (cross_corpus
    true) plus batch×batch collisions (false) — corpus×corpus pairs
    are by definition already known to the index owner and never
    recomputed. id_a < id_b always.

    Scale: two band-bucket equi-joins (delta×index, delta×delta).
    The delta side is small by definition, so the delta×index join
    broadcasts the batch bands when they fit; candidate volume is
    bounded by band-bucket collisions exactly as in the full-corpus
    ladder, never |batch|×|corpus|.

    ``max_bucket`` is the hot-bucket guard (the band-join analog of
    ``jaccard_pairs``'s ``max_df`` posting cap): a band bucket holding
    s docs contributes O(s²) candidate pairs, and mass-duplicated
    boilerplate (cookie banners, license headers) concentrates
    thousands of docs into ONE bucket — quadratic join work that no
    banding theorem bounds, because the true-duplicate set really is
    quadratic. With ``max_bucket`` set, buckets whose TOTAL size
    (index + delta) exceeds the cap are excluded from candidate
    generation — standard near-dup practice: giant collision clusters
    are boilerplate, routed to a dedicated boilerplate handler (q151)
    rather than pairwise-verified. The cap check is one counting
    aggregate on the same (band, band_hash) key the joins shuffle on.
    """
    a = batch_bands.select(
        F.col(id_col).alias("_ba"), "band", "band_hash"
    )
    c = corpus_bands.select(
        F.col(id_col).alias("_cb"), "band", "band_hash"
    )
    if max_bucket is not None:
        sizes = (
            a.select("band", "band_hash")
            .unionByName(c.select("band", "band_hash"))
            .groupBy("band", "band_hash")
            .agg(F.count(F.lit(1)).alias("__s"))
            .filter(F.col("__s") <= max_bucket)
            .select("band", "band_hash")
        )
        a = a.join(sizes, ["band", "band_hash"])
        c = c.join(sizes, ["band", "band_hash"])
    cross = (
        a.join(c, ["band", "band_hash"])
        .select(
            F.least("_ba", "_cb").alias("id_a"),
            F.greatest("_ba", "_cb").alias("id_b"),
            F.lit(True).alias("cross_corpus"),
        )
        .filter(F.col("id_a") != F.col("id_b"))
    )
    b2 = a.select(F.col("_ba").alias("_bb"), "band", "band_hash")
    within = (
        a.join(b2, ["band", "band_hash"])
        .filter(F.col("_ba") < F.col("_bb"))
        .select(
            F.col("_ba").alias("id_a"),
            F.col("_bb").alias("id_b"),
            F.lit(False).alias("cross_corpus"),
        )
    )
    return (
        cross.unionByName(within)
        .groupBy("id_a", "id_b", "cross_corpus")
        .agg(F.count(F.lit(1)).cast("long").alias("n_shared_bands"))
    )
