"""Text-analysis operators over the ``documents`` table (north-star
extension, SURVEY.md §2.12): tokenization, token counting, quality
scoring, language-ID heuristic, term frequency, shingling, and
document fingerprinting.

Everything here is built from JVM-side ``pyspark.sql.functions``
(split/transform/filter/aggregate + window shingling) — no Python UDFs
— so the hot path stays inside whole-stage codegen and each operator
has an exact ANSI-SQL oracle. At 100 TB the explode-based operators
(term frequency, shingles) shuffle on high-cardinality keys, which is
the intended scalable shape (hash-partitioned, AQE-coalesced).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword-vote
# heuristic. Deliberately small and ASCII so the same literal lists are
# embeddable in the SQL oracle.
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it"),
    "es": ("el", "la", "de", "y", "que", "en", "un", "una"),
    "fr": ("le", "la", "de", "et", "que", "en", "un", "une"),
    "de": ("der", "die", "das", "und", "zu", "in", "ein", "ist"),
}

PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation, identical in Java & RE2


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization of lower-cased text."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.lower(F.trim(c)), r"\s+")


def with_tokens(df: DataFrame, text_col: str = "text", out: str = "tokens") -> DataFrame:
    return df.withColumn(out, tokens_col(text_col))


def token_count(text: Column | str) -> Column:
    """Token count (whitespace tokenizer)."""
    return F.size(tokens_col(text))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document quality signals: length, token count, mean token
    length, punctuation ratio, stopword ratio, and a composite
    ``quality_score`` in [0,1].

    The score mirrors common pre-training heuristic filters (length in
    range, low punctuation, some stopwords) — each signal is a pure
    column expression, one scan, no UDFs.
    """
    text = F.col(text_col)
    toks = tokens_col(text_col)
    n_chars = F.length(text)
    n_tokens = F.size(toks)
    stop = [w for ws in STOPWORDS.values() for w in ws]
    n_stop = F.size(F.filter(toks, lambda t: t.isin(*stop)))
    n_punct = n_chars - F.length(F.regexp_replace(text, PUNCT_RE, ""))
    # try_divide: an empty-string doc (n_chars = 0) reports NULL ratios
    # and scores 0, instead of DIVIDE_BY_ZERO killing the scan under
    # Spark 4 ANSI (NULL < 0.1 is false, so every score branch misses)
    punct_ratio = F.try_divide(n_punct.cast("double"), n_chars)
    stop_ratio = F.try_divide(n_stop.cast("double"), n_tokens)
    mean_tok_len = F.try_divide(
        (n_chars - (n_tokens - 1)).cast("double"), n_tokens
    )
    score = (
        F.when(n_tokens.between(5, 1000), F.lit(0.25)).otherwise(0.0)
        + F.when(punct_ratio < 0.1, F.lit(0.25)).otherwise(0.0)
        + F.when(stop_ratio > 0.01, F.lit(0.25)).otherwise(0.0)
        + F.when(mean_tok_len.between(2.0, 12.0), F.lit(0.25)).otherwise(0.0)
    )
    return df.select(
        "doc_id",
        n_chars.cast("long").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(mean_tok_len, 6).alias("mean_tok_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        score.alias("quality_score"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-vote language ID: count hits per language's stoplist,
    argmax with deterministic tie-break on language code; 'und'
    (undetermined) when no list scores.

    One scan, pure expressions. (A real system would use char-trigram
    profiles; the *shape* — per-language score columns + greatest — is
    the same and equally SQL-expressible.)
    """
    toks = tokens_col(text_col)

    def _score(ws: tuple[str, ...]) -> Column:
        # single-arg lambda only: a 2-arg lambda would be treated as
        # (element, index) by F.filter
        return F.size(F.filter(toks, lambda t: t.isin(*ws)))

    scores = {lang: _score(ws) for lang, ws in STOPWORDS.items()}
    # argmax with lexicographic tiebreak: compare (score, rev_rank) pairs
    pred = F.lit("und")
    best = F.lit(0)
    for lang in sorted(STOPWORDS):  # later langs win only on strictly-greater
        pred = F.when(scores[lang] > best, F.lit(lang)).otherwise(pred)
        best = F.when(scores[lang] > best, scores[lang]).otherwise(best)
    return df.select("doc_id", pred.alias("lang_pred"))


def term_frequency(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus term frequency: explode tokens → hash-aggregate.

    Scale shape: partial (map-side) count per token, then one shuffle on
    token — the canonical word-count; skewed head tokens are exactly
    what AQE skew handling + partial aggregation absorb."""
    return (
        df.select(F.explode(tokens_col(text_col)).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def shingles(df: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Word n-gram shingles, array-native — identical semantics in
    ANSI SQL, no UDF, and (since round 3) ZERO shuffle: the n-gram at
    each position is assembled inside a ``transform`` lambda over a
    position sequence, then exploded. The previous posexplode + lead
    WINDOW formulation shuffled and sorted every token by doc — a
    whole extra stage this per-row expression doesn't pay (measured
    ~4× faster on the sf0.1 boilerplate query).

    Returns (id_col, shingle), one row per position (non-distinct),
    position order preserved; docs with fewer than ``n`` tokens emit
    nothing — both exactly as before.

    The token array is materialized through a projection FIRST: the
    lambda references ``__toks`` as a bound column, not the split()
    expression — inlining the tokenizer into every element_at would
    re-run the regex split n times per position per row (measured 10×
    slower)."""
    base = df.select(id_col, tokens_col(text_col).alias("__toks"))
    return base.select(
        id_col, F.explode(shingle_array(F.col("__toks"), n)).alias("shingle")
    )


def shingle_array(toks: Column, n: int) -> Column:
    """Array of word n-gram shingles from a pre-materialized token
    array column (the per-row expression :func:`shingles` explodes;
    exposed separately so set-valued consumers — MinHash featurization
    — can keep the array form without paying the explode)."""
    if n == 1:
        return toks
    idx = F.when(
        F.size(toks) >= n, F.sequence(F.lit(1), F.size(toks) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + k).cast("int")) for k in range(n)]
        ),
    )


def md5_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact-dedup fingerprint only: (doc_id, md5_fp) where ``md5_fp``
    is md5 of whitespace-normalized lower-cased text. Scan-local (no
    shuffle) — consumers that need just the exact key (q339's dup-rate
    card) use this instead of :func:`doc_fingerprint`, whose shingle
    side pays a corpus-wide explode+groupBy Spark cannot prune away.
    """
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), r"\s+", " ")
    return df.select("doc_id", F.md5(norm).alias("md5_fp"))


def doc_fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprints, both SQL-exact:

    - ``md5_fp``: md5 of whitespace-normalized lower-cased text
      (exact-dedup key);
    - ``min_shingle_fp``: lexicographic min of md5(3-gram shingle) — a
      1-permutation MinHash; equal fingerprints ⇒ likely near-dups.
    """
    sh = shingles(df, 3, text_col)
    minfp = sh.groupBy("doc_id").agg(F.min(F.md5("shingle")).alias("min_shingle_fp"))
    return md5_fingerprint(df, text_col).join(minfp, "doc_id", "left")


def bottom_k_sketch(df: DataFrame, k: int = 8, text_col: str = "text") -> DataFrame:
    """Bottom-k MinHash sketch: the k smallest md5(shingle) values per
    doc, as a sorted array. Jaccard between two docs is estimated by
    overlap of sketches — the classic bottom-k estimator, fully
    deterministic and SQL-expressible (vs. seeded-permutation MinHash).
    """
    sh = shingles(df, 3, text_col).select("doc_id", F.md5("shingle").alias("h")).distinct()
    w = Window.partitionBy("doc_id").orderBy("h")
    return (
        sh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("h")).alias("sketch"))
    )


def bigram_coherence(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Corpus-bigram coherence score per document — an LM-style text
    quality signal with EXACT arithmetic (the reason it is not a log
    perplexity: cross-engine ``log()`` is not guaranteed bit-identical,
    but integer count sums and one final 6dp-rounded division are).

    score(d) = Σ_i c2(w_i, w_{i+1}) / Σ_i c1(w_i) over d's bigrams,
    where c2/c1 are corpus bigram/unigram occurrence counts: how much
    of the mass following each token the document's actual next token
    captures, averaged. Repetitive/templated text scores high; random
    token salads score near the background rate — same direction as a
    perplexity filter, deterministic enough to hash-check.

    Scale: two map-combinable count aggregates (token, bigram) +
    two broadcast-friendly joins back to the per-doc bigram stream;
    everything shuffles on token-ish keys, no row blowup beyond the
    token grain. The bigram stream is built ARRAY-NATIVELY (zip_with
    of the token array with its tail — the repetition_features
    pattern) instead of posexplode + an ordered per-doc lead window:
    adjacent-pair extraction needs no cross-row state, so the two
    window Exchange+Sort passes the old form paid are gone, and the
    pair stream is materialized once (lazy localCheckpoint) for its
    two consumers (corpus bigram counts + the per-doc join-back)
    instead of re-tokenizing the corpus per consumer."""
    toks = tokens_col(text_col)
    n1 = F.size(toks) - 1
    pairs = F.zip_with(
        F.slice(toks, 1, n1),
        F.slice(toks, 2, n1),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    big = (
        df.filter(F.size(toks) >= 2)
        .select(id_col, F.explode(pairs).alias("p"))
        .select(id_col, F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .localCheckpoint(eager=False)
    )
    tok = df.select(id_col, F.explode(toks).alias("w1"))
    c1 = tok.groupBy("w1").agg(F.count(F.lit(1)).alias("c1"))
    c2 = big.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    return (
        big.join(c2, ["w1", "w2"])
        .join(c1, "w1")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.sum("c2") / F.sum("c1"), 6).alias("coherence"),
        )
    )


def repetition_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Within-document repetition signals — the filter family (popularized
    by the Gopher/MassiveText data-quality rules) that catches boilerplate
    and degenerate machine-generated text which length/punctuation
    heuristics (:func:`quality_features`) miss:

    - ``top_unigram_share``: count of the most frequent token / total
      tokens (degenerate docs repeat one token);
    - ``dup_bigram_frac``: 1 - distinct/total bigrams (looping text
      re-uses the same word pairs).

    Unigram mode needs a per-(doc, token) count → one hash-shuffle on
    (doc_id, token); bigram stats are computed array-natively
    (``zip_with`` of the token array with its tail — zero shuffle).
    Docs with fewer than 2 tokens are excluded (bigrams undefined).
    """
    toks = tokens_col(text_col)
    n = F.size(toks)
    uni = (
        df.select("doc_id", F.explode(toks).alias("tok"))
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"), F.sum("c").alias("n_tokens"))
    )
    bg = F.zip_with(
        F.slice(toks, 1, n - 1),
        F.slice(toks, 2, n - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    big = df.filter(n >= 2).select(
        "doc_id",
        F.size(bg).alias("n_bigrams"),
        F.size(F.array_distinct(bg)).alias("n_distinct_bigrams"),
    )
    return uni.join(big, "doc_id").select(
        "doc_id",
        "n_tokens",
        F.round(F.col("top_cnt").cast("double") / F.col("n_tokens"), 6).alias(
            "top_unigram_share"
        ),
        F.round(
            1 - F.col("n_distinct_bigrams").cast("double") / F.col("n_bigrams"), 6
        ).alias("dup_bigram_frac"),
    )


def char_grams(
    df: DataFrame,
    length: int,
    stride: int = 1,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    out: str = "gram",
) -> DataFrame:
    """Distinct fixed-length CHARACTER grams per document, sampled at
    ``stride`` offsets (1 = every position). Map-side only: sequence +
    transform + array_distinct + explode, no shuffle until a consumer
    joins — the building block of exact-substring decontamination.

    Documents shorter than ``length`` contribute nothing (and the
    ``sequence`` bounds stay legal)."""
    if length < 1 or stride < 1:
        raise ValueError(
            f"char_grams requires length >= 1 and stride >= 1, "
            f"got length={length} stride={stride}"
        )
    pos = F.sequence(
        F.lit(1), F.length(text_col) - F.lit(length - 1), F.lit(stride)
    )
    return (
        df.filter(F.length(text_col) >= length)
        .select(
            id_col,
            F.explode(
                F.array_distinct(
                    F.transform(pos, lambda i: F.col(text_col).substr(i, F.lit(length)))
                )
            ).alias(out),
        )
    )


def exact_substring_hits(
    corpus: DataFrame,
    bench: DataFrame,
    *,
    length: int = 24,
    stride: int = 8,
    corpus_id: str = "doc_id",
    bench_id: str = "bench_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact-substring benchmark contamination: for every (corpus doc,
    benchmark doc) pair sharing a VERIFIED exact character gram, the
    count of corpus-side grams hit — the reference-free twin of a
    suffix-array decontamination scan (n-gram lanes q152/q227 catch
    paraphrase-level overlap; this catches verbatim copies).

    Guarantee: the benchmark side grams EVERY offset (stride 1) while
    the corpus side samples every ``stride`` offsets, so any exact
    common substring of ``length + stride - 1`` chars or more contains
    a corpus gram entirely and is always detected.

    Scale shape (100 TB corpus, small benchmark suite): corpus grams
    carry an 8-byte ``xxhash64`` instead of shuffling gram strings;
    the benchmark's (id, hash) set and its raw texts are BROADCAST, so
    the corpus is scanned once map-side with zero shuffle of corpus
    text. Hash collisions are then removed by the verify step — a
    ``contains`` probe of the candidate gram against the benchmark
    text (by construction a true gram always passes: the benchmark
    side enumerated every offset)."""
    cg = char_grams(corpus, length, stride, text_col=text_col, id_col=corpus_id)
    cg = cg.withColumn("__h", F.xxhash64("gram"))
    bg = (
        char_grams(bench, length, 1, text_col=text_col, id_col=bench_id)
        .select(bench_id, F.xxhash64("gram").alias("__h"))
        .distinct()
    )
    cand = cg.join(F.broadcast(bg), "__h")
    btxt = bench.select(bench_id, F.col(text_col).alias("__btext"))
    verified = cand.join(F.broadcast(btxt), bench_id).filter(
        F.contains(F.col("__btext"), F.col("gram"))
    )
    return verified.groupBy(corpus_id, bench_id).agg(
        F.count(F.lit(1)).cast("long").alias("n_grams_hit")
    )


# Fixed literal subword vocabulary for the greedy longest-match
# tokenizer — deliberately small, lowercase-ASCII, and grouped by piece
# length so the same literal lists embed in the SQL oracle (the q285
# fixed-centroid discipline applied to tokenization). Any character not
# starting a vocab piece is consumed as a 1-char piece, so every word
# tokenizes totally.
SUBWORD_VOCAB_4: tuple[str, ...] = (
    "tion", "ment", "able", "ness", "ight", "ough", "ance", "ware",
)
SUBWORD_VOCAB_3: tuple[str, ...] = (
    "ing", "ion", "ent", "the", "and", "ati", "ere", "ter",
    "est", "ers", "pre", "con", "com", "for", "int", "sub",
)
SUBWORD_VOCAB_2: tuple[str, ...] = (
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "es",
    "or", "te", "ed", "st", "ar", "nd", "to", "it", "ou", "is",
    "le", "al", "de", "se", "ti", "ra",
)


def subword_piece_stats(
    w: Column,
    *,
    v4: tuple[str, ...] | None = None,
    v3: tuple[str, ...] | None = None,
    v2: tuple[str, ...] | None = None,
) -> Column:
    """Greedy longest-match consumption stats for word ``w`` as a
    struct ``(cnt, unk)``: total subword pieces and how many of them
    were the 1-char FALLBACK (no vocab piece matched — the OOV-rate
    analog for subword tokenizers; the vocabulary has no 1-char
    entries, so every single-char consumption is a fallback).

    Classic left-to-right longest-match-first tokenization (the
    WordPiece/BPE *inference* rule) against the fixed literal
    vocabulary above: at each position try a 4-char piece, then
    3, then 2, else consume 1 char. Expressed as a pure ``aggregate``
    fold over character positions — position ``pos`` carries the next
    unconsumed offset, and iterations past the final position are
    no-ops (each real step consumes >= 1 char, so length(w)
    iterations always suffice). Whole-stage-codegen JVM expression,
    no UDF; a DuckDB recursive CTE states the identical consumption
    (plans/queries_round9.py).

    ``v4``/``v3``/``v2`` override the vocabulary blocks (None = the
    module constants; an EMPTY tuple drops that block entirely — the
    vocab-ablation hook queries_round10's q360 sweeps)."""
    v4 = SUBWORD_VOCAB_4 if v4 is None else v4
    v3 = SUBWORD_VOCAB_3 if v3 is None else v3
    v2 = SUBWORD_VOCAB_2 if v2 is None else v2

    def _step(acc: Column, _: Column) -> Column:
        pos, cnt = acc.getField("pos"), acc.getField("cnt")
        unk = acc.getField("unk")
        # longest-match CASE over the non-empty blocks only, widest
        # first (isin() requires at least one literal)
        ml = None
        for width, vocab in ((4, v4), (3, v3), (2, v2)):
            if vocab:
                cond = w.substr(pos, F.lit(width)).isin(*vocab)
                ml = (
                    F.when(cond, F.lit(width))
                    if ml is None
                    else ml.when(cond, F.lit(width))
                )
        ml = F.lit(1) if ml is None else ml.otherwise(F.lit(1))
        return F.when(pos > F.length(w), acc).otherwise(
            F.struct(
                (pos + ml).alias("pos"),
                (cnt + F.lit(1)).alias("cnt"),
                (unk + F.when(ml == 1, F.lit(1)).otherwise(F.lit(0))).alias(
                    "unk"
                ),
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.struct(
            F.lit(1).alias("pos"), F.lit(0).alias("cnt"), F.lit(0).alias("unk")
        ),
        _step,
        lambda acc: F.struct(
            acc.getField("cnt").alias("cnt"), acc.getField("unk").alias("unk")
        ),
    )


def subword_count(w: Column) -> Column:
    """Number of greedy longest-match subword pieces in word ``w``
    (the ``cnt`` field of :func:`subword_piece_stats`)."""
    return subword_piece_stats(w).getField("cnt")


def subword_doc_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document subword token counts under :func:`subword_count`.

    Tokenizes each DISTINCT word once (the vocabulary is tiny next to
    the corpus, so the fold runs |vocab(corpus)| times, not |tokens|
    times) and joins the piece counts back to the exploded token
    stream — the q82 TF-IDF shuffle shape, hash-partitioned on the
    word. Returns (doc_id, n_words, n_subword_tokens,
    pieces_per_word); empty documents report 0/0/NULL."""
    tok = df.select(
        "doc_id", F.explode(tokens_col(text_col)).alias("w")
    ).filter(F.length("w") >= 1)
    wc = (
        tok.select("w")
        .distinct()
        .select("w", subword_count(F.col("w")).alias("pieces"))
    )
    per = (
        tok.join(wc, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("pieces").cast("long").alias("n_subword_tokens"),
        )
    )
    return df.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_words", F.lit(0)).cast("long").alias("n_words"),
        F.coalesce("n_subword_tokens", F.lit(0))
        .cast("long")
        .alias("n_subword_tokens"),
        F.round(
            F.try_divide(
                F.col("n_subword_tokens").cast("double"), F.col("n_words")
            ),
            6,
        ).alias("pieces_per_word"),
    )


def _bpe_merge_fold(l: str, r: str):
    """Replace-last merge fold for one learned BPE pair ``(l, r)``:
    scanning the symbol array left to right, whenever the last emitted
    symbol is ``l`` and the current symbol is ``r``, the two fuse into
    ``l || r``. This is exactly the classic left-to-right
    non-overlapping merge pass: a fused symbol is strictly longer than
    ``l``, so it can never immediately fuse again as the LEFT side of
    the same pair — the property that makes replace-last equivalent to
    the index-skipping loop (property-tested against a pure-Python
    reference in tests/test_round11.py)."""
    merged = F.array(F.lit(l + r))

    def stepf(acc: Column, s: Column) -> Column:
        hit = (
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(l))
            & (s == F.lit(r))
        )
        return F.when(
            hit,
            F.concat(
                F.slice(acc, 1, F.greatest(F.size(acc) - 1, F.lit(0))),
                merged,
            ),
        ).otherwise(F.concat(acc, F.array(s)))

    return stepf


def learn_bpe_merge_list(
    df: DataFrame, k: int = 10, text_col: str = "text"
) -> list[tuple[int, str, str, str, int]]:
    """LEARN a byte-pair-encoding merge table from the corpus — the
    vocabulary-induction step (Sennrich et al. 2016) upstream of the
    greedy inference tokenizer :func:`subword_piece_stats`. Returns
    ``[(step, left, right, merged, pair_count), ...]`` with at most
    ``k`` merges, chosen by max frequency-weighted adjacent-pair count
    with the deterministic tiebreak (count DESC, left ASC, right ASC).

    Distribution shape (the q213 bounded-fixed-point discipline): the
    ONLY corpus-sized pass is the initial word count; every iteration
    then operates on the DISTINCT-word relation (vocabulary-bounded —
    ~10^7 rows at 100 TB, hash-partitioned by word), as one pure
    aggregation (pair explode + groupBy sum) whose single argmax row
    is the per-iteration driver traffic. The re-segmentation is a
    whole-stage-codegen ``aggregate`` fold (no UDF); ``localCheckpoint``
    truncates the k-deep lineage so plan size stays O(1) per step.
    There are exactly ``k`` bounded iterations and k 1-row collects —
    no driver loop over data (S10 policy: the CMS-top-k precedent).

    No reference counterpart (the reference notebooks have no
    tokenizer); north-star SURVEY.md §2.12 surface."""
    merges, _ = bpe_learn(df, k, text_col)
    return merges


def bpe_learn(
    df: DataFrame, k: int = 10, text_col: str = "text"
) -> tuple[list[tuple[int, str, str, str, int]], list[DataFrame]]:
    """The learner core: returns ``(merges, segs)`` where ``segs[j]``
    is the (w, f, syms) segmentation after the first ``j`` merges —
    ``segs[0]`` is the character split. Each snapshot is already
    ``localCheckpoint``'d by the loop, so keeping the references costs
    nothing extra; the q389 merge-depth curve aggregates over them.
    See :func:`learn_bpe_merge_list` for semantics and scale shape."""
    tok = df.select(F.explode(tokens_col(text_col)).alias("w")).filter(
        F.length("w") >= 1
    )
    words = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("f"))
    seg = words.select(
        "w",
        "f",
        F.transform(
            F.sequence(F.lit(1), F.length("w")),
            lambda i: F.col("w").substr(i, F.lit(1)),
        ).alias("syms"),
    ).localCheckpoint()
    segs: list[DataFrame] = [seg]
    merges: list[tuple[int, str, str, str, int]] = []
    for step in range(1, k + 1):
        pairs = (
            seg.filter(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.transform(
                        F.sequence(F.lit(1), F.size("syms") - 1),
                        lambda j: F.struct(
                            F.element_at("syms", j).alias("l"),
                            F.element_at("syms", j + 1).alias("r"),
                        ),
                    )
                ).alias("p"),
                "f",
            )
            .select(F.col("p.l").alias("l"), F.col("p.r").alias("r"), "f")
            .groupBy("l", "r")
            .agg(F.sum("f").cast("long").alias("cnt"))
        )
        best = pairs.orderBy(F.desc("cnt"), "l", "r").limit(1).collect()
        if not best:
            break  # every word is a single symbol — vocabulary exhausted
        l, r, cnt = best[0].l, best[0].r, int(best[0].cnt)
        merges.append((step, l, r, l + r, cnt))
        seg = seg.select(
            "w",
            "f",
            F.aggregate(
                "syms", F.array().cast("array<string>"), _bpe_merge_fold(l, r)
            ).alias("syms"),
        ).localCheckpoint()
        segs.append(seg)
    return merges, segs


def learn_bpe_merges(
    df: DataFrame, k: int = 10, text_col: str = "text"
) -> DataFrame:
    """:func:`learn_bpe_merge_list` as a DataFrame relation
    (step, left_sym, right_sym, merged, pair_count)."""
    return df.sparkSession.createDataFrame(
        learn_bpe_merge_list(df, k, text_col),
        "step long, left_sym string, right_sym string, "
        "merged string, pair_count long",
    )


def bpe_vocab_blocks(
    merges: list[tuple[int, str, str, str, int]],
) -> tuple[tuple[str, ...], tuple[str, ...], tuple[str, ...]]:
    """Regroup a learned merge table into the (v4, v3, v2) literal
    blocks :func:`subword_piece_stats` consumes: distinct merged
    tokens of length 4/3/2, each block sorted. Learned pieces longer
    than 4 chars are dropped (the greedy tokenizer's max piece width);
    1-char pieces cannot occur (a merge is >= 2 chars)."""
    by_len: dict[int, set[str]] = {2: set(), 3: set(), 4: set()}
    for _, _, _, merged, _ in merges:
        if len(merged) in by_len:
            by_len[len(merged)].add(merged)
    return (
        tuple(sorted(by_len[4])),
        tuple(sorted(by_len[3])),
        tuple(sorted(by_len[2])),
    )


def chunk_tokens(
    df: DataFrame,
    window: int,
    stride: int,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split documents into overlapping fixed-token windows with stable
    chunk ids — the pre-embedding step every RAG / pretraining pipeline
    runs before vectors or packing. Chunk ``i`` covers tokens
    ``[i*stride, i*stride + window)`` of the canonical whitespace
    tokenization (case-folded, the same stream every text lane here
    uses); starts enumerate ``0, stride, 2*stride, ...`` while they
    fall inside the document, so tail chunks may be short but every
    token is covered and any span of <= ``stride`` + overlap tokens
    lands whole in some chunk.

    Map-side only (sequence + explode + slice, no shuffle); returns
    (id, chunk_idx, chunk_start_token, n_chunk_tokens, chunk_text)."""
    if window < 1 or stride < 1 or stride > window:
        raise ValueError(
            f"chunk_tokens requires 1 <= stride <= window, "
            f"got window={window} stride={stride}"
        )
    toks = tokens_col(text_col)
    st = df.select(
        id_col, toks.alias("__toks")
    ).select(
        id_col,
        "__toks",
        F.explode(
            F.sequence(F.lit(0), F.size("__toks") - 1, F.lit(stride))
        ).alias("__p"),
    )
    piece = F.slice(F.col("__toks"), F.col("__p") + 1, window)
    return st.select(
        id_col,
        (F.col("__p") / stride).cast("long").alias("chunk_idx"),
        F.col("__p").cast("long").alias("chunk_start_token"),
        F.size(piece).cast("long").alias("n_chunk_tokens"),
        F.array_join(piece, " ").alias("chunk_text"),
    )
