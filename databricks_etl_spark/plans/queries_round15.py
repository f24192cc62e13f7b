"""Round-15 lanes.

The first ~19 lanes here register non-deferred: the round-15 driver
window is q01 + the 30-lane round-14 queue (24 own-oracle + 6 twins),
leaving 19 free slots that these fill by registration order.  Lanes
past the window budget register ``defer=True`` and queue for round 16
(the discipline VERDICT r13 #2 established).

Families extended this round:

- classifier-eval ladder (q607 exact AUC) → exact AVERAGE PRECISION
  (q608), Brier score + calibration decomposition (q609), and the
  binned precision/recall curve (q626);
- rank statistics (q593 Mann–Whitney) → Wilcoxon signed-rank on
  PAIRED samples (q610) and Kruskal–Wallis across k groups (q611);
- moment statistics (q527 OLS, q35 Pearson) → one-way ANOVA (q612)
  and partial correlation (q613); autocorrelation function (q614);
- finance/ops cards (q586 revenue bridge) → price–volume–mix
  decomposition (q615), feature-engineering audits WoE/IV (q616) and
  smoothed target encoding with a held-out MSE gate (q617), decision
  stump induction (q618);
- graph family (q581 PageRank, q514 CC, q497 BFS, q185 triangles) →
  weighted SSSP (q619), k-core peeling (q620), link-prediction
  scoring (q621), label-propagation communities (deferred);
- forecasting (q218 seasonal naive, q541 EWMA) → Holt linear trend
  in exact integer micro-units (q622);
- text-ML (q544 unigram logprob) → naive-Bayes language-ID confusion
  card (q623); categorical association (q208 chi-sq) → Cramér's V
  matrix (q625).

Reference parity: the reference corpus (gbaliarda/databricks-etl,
notebooks etl.py / transform.py / pre_analysis.py) has none of these
surfaces — they extend SURVEY.md §2's analytics/ML-pipeline mandate.

Cross-engine determinism: every float tail is ONE portable expression
string evaluated from exact integers on both engines (the q600/q601
9dp-term → DECIMAL(28,9)-sum discipline for transcendental/rational
sums); integer arithmetic uses Spark ``DIV`` / DuckDB ``//`` on
non-negative operands only; md5-based splits follow q593/q163.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from databricks_etl_spark.plans.registry import QUERIES, query
from databricks_etl_spark.sources.readers import read_table

# ---------------------------------------------------------------------------
# q608 — exact average precision of the quality score as an en-detector
# ---------------------------------------------------------------------------
#
# The ranking-eval complement of q607's AUC: AUC asks "are positives
# ranked above negatives on average?", AP asks "how good is the TOP of
# the ranking?" — the metric retrieval evals (q310 MRR, q332 RAG)
# report.  AP = (1/P)·Σ_{positives at rank k} precision@k over the
# deterministic total order (score DESC, doc_id ASC).  Every
# precision@k is an exact integer ratio j/k; terms are 9dp-rounded and
# decimal-summed so the value hash is row-order independent.

_Q608_AP = "round(CAST(s AS DOUBLE) / np, 6)"


def _q608_oracle() -> str:
    q37 = QUERIES["q37_text_quality"].oracle
    return f"""
        WITH q37 AS MATERIALIZED ({q37}),
        scored AS MATERIALIZED (
            SELECT d.doc_id,
                   CAST(q37.quality_score * 4 AS BIGINT) AS s4,
                   d.lang = 'en' AS pos
            FROM q37 JOIN documents d ON q37.doc_id = d.doc_id
        ),
        ranked AS (
            SELECT pos, CAST(row_number() OVER (
                       ORDER BY s4 DESC, doc_id) AS BIGINT) AS rn
            FROM scored
        ),
        pranked AS (
            SELECT rn, CAST(row_number() OVER (ORDER BY rn)
                       AS BIGINT) AS j
            FROM ranked WHERE pos
        ),
        card AS (
            SELECT CAST(SUM(CAST(round(CAST(j AS DOUBLE) / rn, 9)
                       AS DECIMAL(28,9))) AS DECIMAL(28,9)) AS s,
                   CAST(COUNT(*) AS BIGINT) AS np
            FROM pranked
        ),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM scored)
        SELECT tot.n AS n_ranked, card.np AS n_positive,
               {_Q608_AP} AS ap
        FROM card, tot
    """


@query("q608_exact_average_precision", oracle=_q608_oracle())
def q608_exact_average_precision(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT AVERAGE PRECISION of q37's quality score as an English
    detector — the top-of-ranking eval metric next to q607's AUC:
    AP = (1/P)·Σ_{rel k} precision@k under the total order
    (score DESC, doc_id ASC).  Ranks are computed by the
    :func:`exact_cumsum` two-phase distributed rank (no global-sort
    window); each precision@k = j/k is an exact integer ratio
    evaluated by an identical IEEE division on both engines,
    9dp-rounded, decimal-summed, divided by P once at the edge.

    Scale shape: two range-partitioned rank passes (full corpus, then
    positives only) + one 1-row card — no global window, no driver
    data beyond the ≤64 per-partition offsets."""
    from databricks_etl_spark.operators import text as TX
    from databricks_etl_spark.operators.quantile_bucket import exact_cumsum

    d = read_table(spark, sf_dir, "documents")
    scored = (
        TX.quality_features(d)
        .select(
            "doc_id",
            (F.col("quality_score") * 4).cast("long").alias("s4"),
        )
        .join(
            d.select("doc_id", (F.col("lang") == "en").alias("pos")),
            "doc_id",
        )
        .withColumn("s4neg", -F.col("s4"))
        .withColumn("one", F.lit(1).cast("long"))
        .localCheckpoint()
    )
    ranked = exact_cumsum(scored, ["s4neg", "doc_id"], "one", out_col="rn")
    pos = ranked.filter(F.col("pos")).localCheckpoint()
    pranked = exact_cumsum(pos, ["s4neg", "doc_id"], "one", out_col="j")
    card = pranked.select(
        F.round(
            F.col("j").cast("double") / F.col("rn").cast("double"), 9
        )
        .cast("decimal(28,9)")
        .alias("term")
    ).agg(
        F.sum("term").cast("decimal(28,9)").alias("s"),
        F.count(F.lit(1)).cast("long").alias("np"),
    )
    tot = scored.agg(F.count(F.lit(1)).cast("long").alias("n"))
    return card.crossJoin(tot).select(
        F.col("n").alias("n_ranked"),
        F.col("np").alias("n_positive"),
        F.expr(_Q608_AP).alias("ap"),
    )


# ---------------------------------------------------------------------------
# q609 — Brier score + calibration decomposition of the en-detector
# ---------------------------------------------------------------------------
#
# The PROBABILITY-quality complement of q607/q608's ranking quality:
# map the quarter-unit quality score to a predicted probability
# p = s4·25 percent and score it against the true label with the Brier
# score, decomposed over the score grain (≤5 calibration bins) into
# reliability − resolution + uncertainty (Murphy 1973, public).  Every
# bin mean is an exact integer ratio; bin terms are 9dp-rounded and
# decimal-summed.

_Q609_BRIER = "round(CAST(sq AS DOUBLE) / (CAST(n AS DOUBLE) * 10000), 6)"
_Q609_RELT = (
    "round(CAST(nb AS DOUBLE)"
    " * pow(CAST(p AS DOUBLE) / 100 - CAST(pb AS DOUBLE) / nb, 2), 9)"
)
_Q609_REST = (
    "round(CAST(nb AS DOUBLE)"
    " * pow(CAST(pb AS DOUBLE) / nb - CAST(ptot AS DOUBLE) / n, 2), 9)"
)
_Q609_EDGE = "round(CAST(s AS DOUBLE) / n, 6)"
_Q609_UNC = (
    "round((CAST(ptot AS DOUBLE) / n)"
    " * (1 - CAST(ptot AS DOUBLE) / n), 6)"
)


def _q609_oracle() -> str:
    q37 = QUERIES["q37_text_quality"].oracle
    return f"""
        WITH q37 AS MATERIALIZED ({q37}),
        scored AS MATERIALIZED (
            SELECT CAST(q37.quality_score * 4 AS BIGINT) * 25 AS p,
                   CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
            FROM q37 JOIN documents d ON q37.doc_id = d.doc_id
        ),
        tot AS MATERIALIZED (
            SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(y) AS BIGINT) AS ptot,
                   CAST(SUM((p - 100 * y) * (p - 100 * y))
                        AS BIGINT) AS sq
            FROM scored
        ),
        bins AS MATERIALIZED (
            SELECT p, CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(y) AS BIGINT) AS pb
            FROM scored GROUP BY 1
        ),
        parts AS (
            SELECT CAST(SUM(CAST({_Q609_RELT} AS DECIMAL(28,9)))
                        AS DECIMAL(28,9)) AS srel,
                   CAST(SUM(CAST({_Q609_REST} AS DECIMAL(28,9)))
                        AS DECIMAL(28,9)) AS sres,
                   CAST(COUNT(*) AS BIGINT) AS n_bins
            FROM bins, tot
        )
        SELECT tot.n AS n_scored, tot.ptot AS n_positive,
               parts.n_bins AS n_bins,
               {_Q609_BRIER} AS brier,
               {_Q609_EDGE.replace("s ", "srel ")} AS reliability,
               {_Q609_EDGE.replace("s ", "sres ")} AS resolution,
               {_Q609_UNC} AS uncertainty
        FROM tot, parts
    """


@query("q609_brier_calibration", oracle=_q609_oracle())
def q609_brier_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BRIER SCORE + Murphy calibration decomposition of the quality
    score read as P(english) — is the detector CALIBRATED, not just
    well-ranked (q607/q608)?  Brier = mean (p−y)² over exact integer
    percent units; reliability and resolution decompose it over the
    ≤5-cell score grain with exact bin ratios (9dp terms,
    decimal-summed); uncertainty = ȳ(1−ȳ).  The Murphy identity
    brier = reliability − resolution + uncertainty is pinned in
    tests.

    Scale shape: one corpus scan → 1-row moments + a ≤5-row bin
    relation; everything downstream is arithmetic on two tiny
    relations."""
    from databricks_etl_spark.operators import text as TX

    d = read_table(spark, sf_dir, "documents")
    scored = (
        TX.quality_features(d)
        .select(
            "doc_id",
            ((F.col("quality_score") * 4).cast("long") * 25).alias("p"),
        )
        .join(
            d.select(
                "doc_id",
                F.when(F.col("lang") == "en", 1)
                .otherwise(0)
                .cast("long")
                .alias("y"),
            ),
            "doc_id",
        )
        .localCheckpoint()
    )
    tot = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("ptot"),
        F.sum(
            (F.col("p") - 100 * F.col("y"))
            * (F.col("p") - 100 * F.col("y"))
        )
        .cast("long")
        .alias("sq"),
    )
    bins = scored.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("nb"),
        F.sum("y").cast("long").alias("pb"),
    )
    parts = bins.crossJoin(F.broadcast(tot)).select(
        F.expr(_Q609_RELT).cast("decimal(28,9)").alias("relt"),
        F.expr(_Q609_REST).cast("decimal(28,9)").alias("rest"),
    ).agg(
        F.sum("relt").cast("decimal(28,9)").alias("srel"),
        F.sum("rest").cast("decimal(28,9)").alias("sres"),
        F.count(F.lit(1)).cast("long").alias("n_bins"),
    )
    return tot.crossJoin(parts).select(
        F.col("n").alias("n_scored"),
        F.col("ptot").alias("n_positive"),
        "n_bins",
        F.expr(_Q609_BRIER).alias("brier"),
        F.expr(_Q609_EDGE.replace("s ", "srel ")).alias("reliability"),
        F.expr(_Q609_EDGE.replace("s ", "sres ")).alias("resolution"),
        F.expr(_Q609_UNC).alias("uncertainty"),
    )


# ---------------------------------------------------------------------------
# q610 — Wilcoxon signed-rank test on paired year-over-year spend
# ---------------------------------------------------------------------------
#
# The PAIRED complement of q593's independent-samples Mann–Whitney:
# customers active in both 1999 and 2000 form natural pairs; the test
# asks whether the within-customer spend CHANGE is symmetric around
# zero without assuming normality.  Midranks of |d| ride the q593/q607
# doubled-midrank construction on the |d| value grain — W⁺ stays an
# exact integer in doubled units.

_Q610_Y0, _Q610_Y1 = 1999, 2000

_Q610_Z = (
    "round((CAST(w2p AS DOUBLE) / 2 - CAST(n AS DOUBLE) * (n + 1) / 4)"
    " / sqrt(CAST(n AS DOUBLE) * (n + 1) * (2 * n + 1) / 24), 6)"
)


def _q610_oracle() -> str:
    return f"""
        WITH spend AS MATERIALIZED (
            SELECT o_custkey,
                   CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE))
                                      = {_Q610_Y0}
                            THEN CAST(round(o_totalprice * 100, 0)
                                      AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS c0,
                   CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE))
                                      = {_Q610_Y1}
                            THEN CAST(round(o_totalprice * 100, 0)
                                      AS BIGINT) ELSE 0 END)
                        AS BIGINT) AS c1
            FROM orders
            WHERE year(CAST(o_orderdate AS DATE))
                  IN ({_Q610_Y0}, {_Q610_Y1})
            GROUP BY 1
            HAVING SUM(CASE WHEN year(CAST(o_orderdate AS DATE))
                                 = {_Q610_Y0} THEN 1 ELSE 0 END) > 0
               AND SUM(CASE WHEN year(CAST(o_orderdate AS DATE))
                                 = {_Q610_Y1} THEN 1 ELSE 0 END) > 0
        ),
        d AS MATERIALIZED (
            SELECT c1 - c0 AS d, abs(c1 - c0) AS ad
            FROM spend WHERE c1 <> c0
        ),
        grain AS MATERIALIZED (
            SELECT ad,
                   CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS cp,
                   CAST(COUNT(*) AS BIGINT) AS ct
            FROM d GROUP BY 1
        ),
        ranked AS (
            SELECT ad, cp, ct,
                   SUM(ct) OVER (ORDER BY ad
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM grain
        ),
        card AS (
            SELECT CAST(SUM(cp * (2 * cum - ct + 1)) AS BIGINT) AS w2p,
                   CAST(SUM(ct) AS BIGINT) AS n
            FROM ranked
        )
        SELECT n AS n_pairs, w2p AS w2_pos,
               CAST(n * (n + 1) - w2p AS BIGINT) AS w2_neg,
               {_Q610_Z} AS z_approx
        FROM card
    """


@query("q610_wilcoxon_signed_rank", oracle=_q610_oracle())
def q610_wilcoxon_signed_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WILCOXON SIGNED-RANK on paired year-over-year customer spend —
    the paired complement of q593's Mann–Whitney: for customers
    active in both {_Q610_Y0} and {_Q610_Y1}, rank |Δspend| with
    midranks (doubled-midrank construction on the |d| grain, exact
    BIGINT throughout) and sum the ranks of the positive changes.
    W⁺ + W⁻ = n(n+1)/2 is pinned in tests; z is one portable float
    expression from the exact integers.

    Scale shape: customer-grain rollup → |d| value grain →
    exact_cumsum ordered fold → 1-row card."""
    from databricks_etl_spark.operators.quantile_bucket import exact_cumsum

    o = read_table(spark, sf_dir, "orders")
    yr = F.year(F.col("o_orderdate").cast("date"))
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("long")
    spend = (
        o.filter(yr.isin(_Q610_Y0, _Q610_Y1))
        .groupBy("o_custkey")
        .agg(
            F.sum(F.when(yr == _Q610_Y0, cents).otherwise(0))
            .cast("long")
            .alias("c0"),
            F.sum(F.when(yr == _Q610_Y1, cents).otherwise(0))
            .cast("long")
            .alias("c1"),
            F.sum(F.when(yr == _Q610_Y0, 1).otherwise(0)).alias("k0"),
            F.sum(F.when(yr == _Q610_Y1, 1).otherwise(0)).alias("k1"),
        )
        .filter((F.col("k0") > 0) & (F.col("k1") > 0))
    )
    d = spend.filter(F.col("c1") != F.col("c0")).select(
        (F.col("c1") - F.col("c0")).alias("d"),
        F.abs(F.col("c1") - F.col("c0")).alias("ad"),
    )
    grain = d.groupBy("ad").agg(
        F.sum(F.when(F.col("d") > 0, 1).otherwise(0))
        .cast("long")
        .alias("cp"),
        F.count(F.lit(1)).cast("long").alias("ct"),
    )
    ranked = exact_cumsum(grain, ["ad"], "ct", out_col="cum")
    card = ranked.agg(
        F.sum(F.col("cp") * (2 * F.col("cum") - F.col("ct") + 1))
        .cast("long")
        .alias("w2p"),
        F.sum("ct").cast("long").alias("n"),
    )
    return card.select(
        F.col("n").alias("n_pairs"),
        F.col("w2p").alias("w2_pos"),
        (F.col("n") * (F.col("n") + 1) - F.col("w2p"))
        .cast("long")
        .alias("w2_neg"),
        F.expr(_Q610_Z).alias("z_approx"),
    )


# ---------------------------------------------------------------------------
# q611 — Kruskal–Wallis H across order-priority groups
# ---------------------------------------------------------------------------
#
# The k-group generalization of q593 (Mann–Whitney is its k=2 case):
# do order values differ by priority class?  Global midranks over the
# cents value grain (doubled units, exact BIGINT), per-group doubled
# rank sums, H and its tie-corrected form as portable float
# expressions from exact integers.

_Q611_TERM = (
    "round(CAST(r2g AS DOUBLE) * r2g / (4 * CAST(ng AS DOUBLE)), 9)"
)
_Q611_H = (
    "round(12 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1))"
    " - 3 * (CAST(n AS DOUBLE) + 1), 6)"
)
_Q611_HC = (
    "round((12 * CAST(s AS DOUBLE) / (CAST(n AS DOUBLE) * (n + 1))"
    " - 3 * (CAST(n AS DOUBLE) + 1))"
    " / (1 - CAST(t AS DOUBLE)"
    " / (CAST(n AS DOUBLE) * n * n - n)), 6)"
)
_Q611_MR = "round(CAST(r2g AS DOUBLE) / (2 * CAST(ng AS DOUBLE)), 6)"


def _q611_oracle() -> str:
    return f"""
        WITH v AS MATERIALIZED (
            SELECT o_orderpriority AS grp,
                   CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
            FROM orders
        ),
        grain AS MATERIALIZED (
            SELECT cents, CAST(COUNT(*) AS BIGINT) AS ct
            FROM v GROUP BY 1
        ),
        ranked AS MATERIALIZED (
            SELECT cents, ct,
                   SUM(ct) OVER (ORDER BY cents
                       ROWS UNBOUNDED PRECEDING) AS cum
            FROM grain
        ),
        gsum AS MATERIALIZED (
            SELECT v.grp,
                   CAST(SUM(2 * r.cum - r.ct + 1) AS BIGINT) AS r2g,
                   CAST(COUNT(*) AS BIGINT) AS ng
            FROM v JOIN ranked r ON v.cents = r.cents
            GROUP BY 1
        ),
        tots AS (
            SELECT CAST(SUM(ng) AS BIGINT) AS n,
                   CAST(SUM(CAST({_Q611_TERM} AS DECIMAL(28,9)))
                        AS DECIMAL(28,9)) AS s
            FROM gsum
        ),
        ties AS (
            SELECT CAST(SUM(ct * ct * ct - ct) AS BIGINT) AS t
            FROM grain
        )
        SELECT g.grp AS priority, g.ng AS n_orders,
               g.r2g AS r2_sum, {_Q611_MR} AS mean_rank,
               {_Q611_H} AS h_stat, {_Q611_HC} AS h_tie_corrected
        FROM gsum g, tots, ties
    """


@query("q611_kruskal_wallis", oracle=_q611_oracle())
def q611_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KRUSKAL–WALLIS H across the five order-priority classes — the
    k-group rank ANOVA (q593's Mann–Whitney generalized): global
    midranks over the order-value cents grain in exact doubled
    BIGINT units, per-group rank sums, H and its tie-corrected form
    evaluated once from the exact integers.  Output: one row per
    priority with its rank-sum card plus the shared H columns
    (constant across rows by construction — pinned in tests).

    Scale shape: value-grain rollup → exact_cumsum ordered fold →
    one keyed join back to the (grp, cents) grain → 5-row group
    relation; H is arithmetic over two 1-row relations."""
    from databricks_etl_spark.operators.quantile_bucket import exact_cumsum

    o = read_table(spark, sf_dir, "orders")
    v = o.select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias(
            "cents"
        ),
    ).localCheckpoint()
    grain = v.groupBy("cents").agg(
        F.count(F.lit(1)).cast("long").alias("ct")
    )
    ranked = exact_cumsum(grain, ["cents"], "ct", out_col="cum")
    gsum = (
        v.join(ranked, "cents")
        .groupBy("grp")
        .agg(
            F.sum(2 * F.col("cum") - F.col("ct") + 1)
            .cast("long")
            .alias("r2g"),
            F.count(F.lit(1)).cast("long").alias("ng"),
        )
        .localCheckpoint()
    )
    tots = gsum.select(
        "ng", F.expr(_Q611_TERM).cast("decimal(28,9)").alias("term")
    ).agg(
        F.sum("ng").cast("long").alias("n"),
        F.sum("term").cast("decimal(28,9)").alias("s"),
    )
    ties = ranked.agg(
        F.sum(F.col("ct") * F.col("ct") * F.col("ct") - F.col("ct"))
        .cast("long")
        .alias("t")
    )
    return (
        gsum.crossJoin(F.broadcast(tots))
        .crossJoin(F.broadcast(ties))
        .select(
            F.col("grp").alias("priority"),
            F.col("ng").alias("n_orders"),
            F.col("r2g").alias("r2_sum"),
            F.expr(_Q611_MR).alias("mean_rank"),
            F.expr(_Q611_H).alias("h_stat"),
            F.expr(_Q611_HC).alias("h_tie_corrected"),
        )
    )
