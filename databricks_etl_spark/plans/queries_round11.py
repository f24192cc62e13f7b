r"""Round-11 queries: distributed BPE merge INDUCTION — learning the
subword vocabulary from the corpus instead of tokenizing against a
given one (VERDICT r10 #2) — plus the round's incremental-ANN,
skew-hardening, streaming and release-gate lanes.

No reference counterpart: the reference notebooks (pre_analysis.py /
pre_process.py / transform.py) have no tokenizer machinery; these
extend the engine's north-star LLM-data surface (SURVEY.md §2.12).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import QUERIES, query
from databricks_etl_spark.sources.readers import read_table

# oracles below embed round-9/10 oracle SQL via the registry, so a
# DIRECT import of this module must register those rounds first
import databricks_etl_spark.plans.queries_round10  # noqa: E402,F401  isort: skip

# ---------------------------------------------------------------------------
# q382 — BPE merge induction: LEARN the vocabulary from the corpus
# ---------------------------------------------------------------------------

_Q382_K = 10  # learned merges; bounded fixed-point iteration count


def _bpe_chain_sql(k: int) -> str:
    """The k-step BPE learning recursion, UNROLLED as a CTE chain (one
    (pairs, argmax, re-segment) triple per step) — the honest DuckDB
    statement of the same fixed point the Spark learner iterates.
    Every ``bpe_seg_i`` / ``bpe_best_i`` is ``AS MATERIALIZED``: the
    re-segmentation is a recursive CTE that references both, and DuckDB
    inlines (re-evaluates!) non-materialized CTEs referenced from a
    recursive term — unmaterialized, step i would recompute the entire
    chain below it once per recursion depth (the q326 gotcha,
    CLAUDE.md). Must sit inside a WITH RECURSIVE chain; exposes
    ``bpe_vt`` (doc_id, w), ``bpe_words`` (w, f), ``bpe_seg_{k}`` (the
    final segmentation) and ``bpe_merges`` (step, l, r, cnt)."""
    parts = [
        """bpe_tok AS (
            SELECT doc_id,
                   unnest(string_split_regex(lower(trim(text)), '\\s+')) AS w
            FROM documents
        ),
        bpe_vt AS MATERIALIZED (
            SELECT doc_id, w FROM bpe_tok WHERE length(w) >= 1
        ),
        bpe_words AS MATERIALIZED (
            SELECT w, CAST(COUNT(*) AS BIGINT) AS f FROM bpe_vt GROUP BY 1
        ),
        bpe_seg_0 AS MATERIALIZED (
            SELECT w, f,
                   list_transform(generate_series(1, length(w)),
                                  i -> substr(w, i, 1)) AS syms
            FROM bpe_words
        )"""
    ]
    for i in range(k):
        parts.append(f"""bpe_pr_{i} AS (
            SELECT unnest(list_transform(generate_series(1, len(syms) - 1),
                       j -> struct_pack(l := syms[j], r := syms[j + 1]))) AS p,
                   f
            FROM bpe_seg_{i} WHERE len(syms) >= 2
        ),
        bpe_best_{i} AS MATERIALIZED (
            SELECT p.l AS l, p.r AS r, CAST(SUM(f) AS BIGINT) AS cnt
            FROM bpe_pr_{i} GROUP BY 1, 2
            ORDER BY cnt DESC, l, r LIMIT 1
        ),
        bpe_rs_{i} AS (
            SELECT s.w, s.f, s.syms, 1 AS j, CAST([] AS VARCHAR[]) AS out
            FROM bpe_seg_{i} s
            UNION ALL
            SELECT t.w, t.f, t.syms,
                   t.j + CASE WHEN t.j < len(t.syms)
                                   AND t.syms[t.j] = b.l
                                   AND t.syms[t.j + 1] = b.r
                              THEN 2 ELSE 1 END,
                   list_append(t.out,
                       CASE WHEN t.j < len(t.syms)
                                 AND t.syms[t.j] = b.l
                                 AND t.syms[t.j + 1] = b.r
                            THEN b.l || b.r ELSE t.syms[t.j] END)
            FROM bpe_rs_{i} t, bpe_best_{i} b WHERE t.j <= len(t.syms)
        ),
        bpe_seg_{i + 1} AS MATERIALIZED (
            SELECT w, f, out AS syms FROM bpe_rs_{i} WHERE j > len(syms)
        )""")
    union = "\n            UNION ALL\n".join(
        f"            SELECT CAST({i + 1} AS BIGINT) AS step, l, r, cnt"
        f" FROM bpe_best_{i}"
        for i in range(k)
    )
    parts.append(f"""bpe_merges AS MATERIALIZED (
{union}
        )""")
    return ",\n        ".join(parts)


def _q382_oracle() -> str:
    return f"""
        WITH RECURSIVE
        {_bpe_chain_sql(_Q382_K)}
        SELECT step, l AS left_sym, r AS right_sym,
               l || r AS merged, cnt AS pair_count
        FROM bpe_merges
    """


@query("q382_bpe_merge_induction", oracle=_q382_oracle())
def q382_bpe_merge_induction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEARN the BPE merge table from the corpus — the vocabulary-
    induction step every real pipeline runs before it can tokenize,
    and the one tokenizer operator this engine consumed but never
    produced (q328/q360 tokenize against GIVEN vocabularies). Classic
    frequency-weighted byte-pair encoding (Sennrich et al. 2016):
    start from characters, repeatedly fuse the most frequent adjacent
    symbol pair (ties broken count DESC, left ASC, right ASC), k
    bounded iterations. Returns the ordered merge table
    (step, left_sym, right_sym, merged, pair_count).

    Scale shape (operators/text.learn_bpe_merge_list): one corpus-
    sized word-count pass, then every iteration is a pure aggregation
    over the DISTINCT-word relation (vocabulary-bounded, hash-
    partitioned by word) with a single argmax row as driver traffic —
    the q213 bounded-fixed-point discipline; re-segmentation is a
    whole-stage-codegen replace-last ``aggregate`` fold, lineage
    truncated per step. The oracle states the identical fixed point as
    an unrolled CTE chain whose per-step re-segmentation is a
    per-word recursive walk; Spark's fold and the oracle's walk are
    both property-tested against a pure-Python reference BPE
    (tests/test_round11.py)."""
    from databricks_etl_spark.operators.text import learn_bpe_merges

    d = read_table(spark, sf_dir, "documents")
    return learn_bpe_merges(d, _Q382_K)


# ---------------------------------------------------------------------------
# q383 — corpus fertility under the LEARNED vocabulary
# ---------------------------------------------------------------------------


def _q383_oracle() -> str:
    return f"""
        WITH RECURSIVE
        {_bpe_chain_sql(_Q382_K)},
        lv4 AS MATERIALIZED (
            SELECT DISTINCT l || r AS p FROM bpe_merges
            WHERE length(l || r) = 4
        ),
        lv3 AS MATERIALIZED (
            SELECT DISTINCT l || r AS p FROM bpe_merges
            WHERE length(l || r) = 3
        ),
        lv2 AS MATERIALIZED (
            SELECT DISTINCT l || r AS p FROM bpe_merges
            WHERE length(l || r) = 2
        ),
        tk AS (
            SELECT w, 1 AS pos, 0 AS cnt, 0 AS unk FROM bpe_words
            UNION ALL
            SELECT t.w,
                   t.pos + CASE WHEN v4.p IS NOT NULL THEN 4
                                WHEN v3.p IS NOT NULL THEN 3
                                WHEN v2.p IS NOT NULL THEN 2
                                ELSE 1 END,
                   t.cnt + 1,
                   t.unk + CASE WHEN v4.p IS NULL AND v3.p IS NULL
                                     AND v2.p IS NULL
                                THEN 1 ELSE 0 END
            FROM tk t
            LEFT JOIN lv4 v4 ON v4.p = substr(t.w, t.pos, 4)
            LEFT JOIN lv3 v3 ON v3.p = substr(t.w, t.pos, 3)
            LEFT JOIN lv2 v2 ON v2.p = substr(t.w, t.pos, 2)
            WHERE t.pos <= length(t.w)
        ),
        wc AS (SELECT w, cnt, unk FROM tk WHERE pos > length(w)),
        per AS (
            SELECT d.source,
                   CAST(COUNT(*) AS BIGINT) AS n_words,
                   CAST(SUM(wc.cnt) AS BIGINT) AS n_pieces,
                   CAST(SUM(wc.unk) AS BIGINT) AS n_unk
            FROM bpe_vt v
            JOIN wc USING (w)
            JOIN documents d USING (doc_id)
            GROUP BY 1
        )
        SELECT source, n_words, n_pieces, n_unk,
               round(CAST(n_pieces AS DOUBLE) / n_words, 6) AS fertility,
               round(CAST(n_unk AS DOUBLE) / n_pieces, 6) AS unk_rate
        FROM per
    """


@query("q383_learned_vocab_fertility", oracle=_q383_oracle())
def q383_learned_vocab_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q328 RE-BASED on the LEARNED vocabulary: tokenize the corpus
    with the greedy longest-match inference tokenizer
    (operators/text.subword_piece_stats — the production kernel, via
    its q360 vocab-override hooks) against the merge table q382 just
    induced, and report per-source fertility (pieces per word) and
    fallback rate (share of 1-char fallback pieces — the OOV analog).
    Closes the learn -> tokenize loop: the vocabulary blocks are the
    learned merged tokens regrouped by piece length
    (operators/text.bpe_vocab_blocks), so the tokenizer the pipeline
    ships and the vocabulary it learned cannot drift apart.

    Scale shape: the learner's k bounded iterations (q382), then the
    q328 shuffle shape — each DISTINCT word tokenizes once via the
    codegen fold, piece stats join back to the exploded token stream
    hash-partitioned on the word, rollup is per-source-bounded. The
    learned merge table itself is k driver-side rows (bounded, S10).
    Oracle: the identical unrolled learning chain + the consumption
    recursion with the vocab JOINED from the learned merge relation
    (the literal-IN form of q328's oracle, vocab-from-data instead of
    vocab-from-constants)."""
    from databricks_etl_spark.operators.text import (
        bpe_vocab_blocks,
        learn_bpe_merge_list,
        subword_piece_stats,
        tokens_col,
    )

    d = read_table(spark, sf_dir, "documents")
    v4, v3, v2 = bpe_vocab_blocks(learn_bpe_merge_list(d, _Q382_K))
    tok = d.select(
        "doc_id", "source", F.explode(tokens_col("text")).alias("w")
    ).filter(F.length("w") >= 1)
    wc = (
        tok.select("w")
        .distinct()
        .select(
            "w",
            subword_piece_stats(F.col("w"), v4=v4, v3=v3, v2=v2).alias("st"),
        )
    )
    return (
        tok.join(wc, "w")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_words"),
            F.sum("st.cnt").cast("long").alias("n_pieces"),
            F.sum("st.unk").cast("long").alias("n_unk"),
        )
        .select(
            "source",
            "n_words",
            "n_pieces",
            "n_unk",
            F.round(
                F.col("n_pieces").cast("double") / F.col("n_words"), 6
            ).alias("fertility"),
            F.round(
                F.col("n_unk").cast("double") / F.col("n_pieces"), 6
            ).alias("unk_rate"),
        )
    )
