"""Round-16 unit tests: invariants for the AR(2) backtest, the
semantic-decontamination rung (including the planted paraphrase
fixture pinning the cell-blocking trade), sampled harmonic
centrality, and the IRLS logistic fit — beyond the oracle-parity
suite."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest

from databricks_etl_spark.plans.registry import queries


def _one(df):
    rows = df.collect()
    assert len(rows) == 1
    return rows[0]


# --- q657 AR(2) backtest ---------------------------------------------------


def test_q657_ar2_card_consistency(spark, smoke_sf_dir):
    """The eval set is exactly the days with two predecessors; both
    SAE sums are nonnegative exact integers; the verdict column is
    literally the SAE comparison; |phi| stays in the stationary
    ballpark for near-white daily revenue."""
    r = _one(queries()["q657_ar2_backtest"](spark, smoke_sf_dir))
    assert r["n_eval"] == r["n_days"] - 2
    assert r["sae_ar_cents"] >= 0 and r["sae_persistence_cents"] >= 0
    assert r["ar_beats_persistence"] == (
        r["sae_ar_cents"] < r["sae_persistence_cents"]
    )
    assert abs(r["phi1"]) < 1 and abs(r["phi2"]) < 1


# --- q658 semantic decontamination ----------------------------------------


def test_q658_rate_card_shape(spark, smoke_sf_dir):
    """Every source's contaminated count is bounded by its doc count
    and the rate is the exact ratio."""
    rows = queries()["q658_semantic_decontamination"](
        spark, smoke_sf_dir
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert 0 <= r["n_semantic_contaminated"] <= r["n_docs"]
        assert r["semantic_contamination_rate"] == pytest.approx(
            r["n_semantic_contaminated"] / r["n_docs"], abs=1e-6
        )


def test_q658_planted_paraphrase_hit_and_cross_cell_miss(spark):
    """The contract of the cell-blocked verify: a near-identical
    (paraphrase-level) training embedding in the SAME cell as an eval
    embedding is flagged; an equally-similar pair split ACROSS cells
    is missed — the documented IVF blocking trade, pinned so a future
    'optimization' can't silently change recall semantics."""
    from databricks_etl_spark.operators import similarity as SIM
    from databricks_etl_spark.plans.queries_round16 import _q658_hits
    from databricks_etl_spark.plans.queries_round7 import _Q285_CENTS

    dim = len(_Q285_CENTS[0])

    def vec(*pairs):
        v = [0.0] * dim
        for cid, w in pairs:
            for i in range(dim):
                if i % len(_Q285_CENTS) == cid:
                    v[i] += w
        return v

    rows = [
        # eval doc 50 sits at centroid 0; training doc 3 is a near
        # copy (same cell, cosine ~1) -> must be flagged
        (50, vec((0, 1.0))),
        (3, vec((0, 1.0), (1, 0.05))),
        # eval doc 100 leans centroid 2; training doc 7 is similar
        # (cosine ~0.7 > tau) but leans centroid 3 -> different cell,
        # missed by construction
        (100, vec((2, 1.0), (3, 0.7))),
        (7, vec((2, 0.7), (3, 1.0))),
    ]
    e = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = spark.createDataFrame(
        list(enumerate(_Q285_CENTS)), "cid int, centroid array<double>"
    )
    cells = SIM.assign_cells(e, cents)
    asg = {r["vec_id"]: r["cell_id"] for r in cells.collect()}
    assert asg[50] == asg[3]  # planted same-cell pair
    assert asg[100] != asg[7]  # planted cross-cell pair
    # the cross-cell pair really is above tau — the miss is blocking,
    # not similarity
    sim = _one(
        e.filter(F.col("vec_id") == 100)
        .crossJoin(
            e.filter(F.col("vec_id") == 7).select(
                F.col("embedding").alias("bemb")
            )
        )
        .select(SIM.cosine(F.col("embedding"), F.col("bemb")).alias("s"))
    )["s"]
    assert sim >= 0.35
    hits = sorted(r["vec_id"] for r in _q658_hits(cells).collect())
    assert hits == [3]


# --- q659 sampled harmonic centrality -------------------------------------


def test_q659_harmonic_bounds_and_order(spark, smoke_sf_dir):
    """Each 1/d term is at most 1, so harmonic <= n_sources_reaching;
    ranks are 1..k in non-increasing harmonic order."""
    rows = queries()["q659_harmonic_centrality_sampled"](
        spark, smoke_sf_dir
    ).collect()
    assert 0 < len(rows) <= 20
    assert [r["rank_pos"] for r in rows] == list(range(1, len(rows) + 1))
    hs = [r["harmonic"] for r in rows]
    assert hs == sorted(hs, reverse=True)
    for r in rows:
        assert 0 < r["harmonic"] <= r["n_sources_reaching"] + 1e-9


# --- q660 logistic IRLS ----------------------------------------------------


def test_q660_confusion_and_fit(spark, smoke_sf_dir):
    """Confusion cells partition the corpus; accuracy is their exact
    ratio; three Newton steps from beta=0 must beat the uninformed
    model's log-loss ln(2) on this corpus (the fit converges — the
    parity suite pins the exact values)."""
    r = _one(queries()["q660_logistic_irls"](spark, smoke_sf_dir))
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == r["n_docs"]
    assert r["accuracy"] == pytest.approx(
        (r["tp"] + r["tn"]) / r["n_docs"], abs=1e-6
    )
    assert 0 < r["log_loss"] < math.log(2)
    assert abs(r["beta0"]) < 10 and abs(r["beta1"]) < 10


# --- q661 price indices ----------------------------------------------------


def test_q661_fisher_bracketing(spark, smoke_sf_dir):
    """Fisher is the geometric mean of Laspeyres and Paasche, so it
    lies between them; all three indices are positive."""
    r = _one(queries()["q661_price_indices"](spark, smoke_sf_dir))
    lo = min(r["laspeyres"], r["paasche"])
    hi = max(r["laspeyres"], r["paasche"])
    assert 0 < lo <= r["fisher"] + 1e-6
    assert r["fisher"] <= hi + 1e-6
    assert r["fisher"] == pytest.approx(
        math.sqrt(r["laspeyres"] * r["paasche"]), abs=5e-6
    )
    assert r["n_parts_matched"] > 0


# --- q662 Gini -------------------------------------------------------------


def test_q662_gini_bounds(spark, smoke_sf_dir):
    """Gini lives in [0, 1 - 1/n] for nonnegative data."""
    rows = queries()["q662_gini_by_nation"](spark, smoke_sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert -1e-9 <= r["gini"] <= 1 - 1 / r["n_customers"] + 1e-6


def test_q662_gini_degenerate_all_equal(spark):
    """The grain formula must yield exactly 0 for an all-equal
    distribution — checked through the same expression the lane
    uses (2*sum(i*x) reconstruction on a tiny planted grain)."""
    from databricks_etl_spark.plans.queries_round16 import _Q662_G

    df = spark.createDataFrame(
        [(1, 4, 100 * 4, 100 * (2 * 4 * 0 + 4 * 5))],
        "nk int, n long, sx long, s2ix long",
    )
    r = _one(df.select(F.expr(_Q662_G).alias("g")))
    assert r["g"] == 0.0


# --- q663 Jensen–Shannon divergence ---------------------------------------


def test_q663_jsd_bounds(spark, smoke_sf_dir):
    """JSD is symmetric-bounded: 0 <= jsd <= ln 2; bits twin is the
    nats value / ln 2."""
    rows = queries()["q663_js_divergence_by_source"](
        spark, smoke_sf_dir
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert -1e-9 <= r["jsd_nats"] <= math.log(2) + 1e-9
        assert r["jsd_bits"] == pytest.approx(
            r["jsd_nats"] / math.log(2), abs=5e-6
        )


# --- q664 Zipf slope -------------------------------------------------------


def test_q664_zipf_slope_negative(spark, smoke_sf_dir):
    """Frequency decreases with rank by construction of the ranking,
    so the fitted ln-ln slope must be negative and the intercept
    (C ≈ top-rank frequency scale) positive."""
    r = _one(queries()["q664_zipf_slope"](spark, smoke_sf_dir))
    assert r["zipf_slope"] < 0
    assert r["zipf_c"] > 0
    assert r["vocab_size"] > 1


# --- q665 Mann–Kendall ------------------------------------------------------


def test_q665_mk_bounds(spark, smoke_sf_dir):
    """|S| is bounded by the pair count n(n-1)/2; the variance is
    positive; the trend verdict matches the z cut."""
    r = _one(queries()["q665_mann_kendall_trend"](spark, smoke_sf_dir))
    n = r["n_months"]
    assert abs(r["s_statistic"]) <= n * (n - 1) // 2
    assert r["var_s_x18"] > 0
    expected = (
        "increasing"
        if r["z_score"] > 1.96
        else "decreasing" if r["z_score"] < -1.96 else "no_trend"
    )
    assert r["trend"] == expected


# --- q666 Jarque–Bera -------------------------------------------------------


def test_q666_jb_consistency(spark, smoke_sf_dir):
    """JB recomposes from the reported skewness/kurtosis; the
    near-uniform quantity column must reject normality with platykurtic
    shape (negative excess kurtosis ~ -1.2 for uniform)."""
    rows = queries()["q666_jarque_bera"](spark, smoke_sf_dir).collect()
    assert len(rows) == 3
    for r in rows:
        jb = r["n_items"] * (
            r["skewness"] ** 2 / 6 + r["excess_kurtosis"] ** 2 / 24
        )
        assert r["jb_statistic"] == pytest.approx(jb, rel=1e-3)
        assert r["excess_kurtosis"] < 0  # uniform-ish => platykurtic
        assert r["normality_rejected"] == (r["jb_statistic"] > 5.991464547107979)


# --- q667 process capability ------------------------------------------------


def test_q667_cpk_dominated_by_cp(spark, smoke_sf_dir):
    """Cpk <= Cp always (centering can only lose capability); sigma
    positive; verdict matches the 1.33 cut."""
    rows = queries()["q667_process_capability"](
        spark, smoke_sf_dir
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["sigma_qty"] > 0
        assert r["cpk"] <= r["cp"] + 1e-6
        assert r["capable"] == (r["cpk"] >= 1.33)


# --- q668 Brown–Forsythe ----------------------------------------------------


def test_q668_bf_card(spark, smoke_sf_dir):
    """Three groups; the doubled medians are positive and the F stat
    nonnegative; verdict matches the cut."""
    r = _one(queries()["q668_brown_forsythe"](spark, smoke_sf_dir))
    assert r["k_groups"] == 3
    assert min(r["med2_a"], r["med2_n"], r["med2_r"]) > 0
    assert r["bf_f_stat"] >= 0
    assert r["equal_spread_rejected"] == (r["bf_f_stat"] > 2.9957)


# --- streaming twins: hostile-slicing drains (q576/q627 discipline) --------


import databricks_etl_spark.plans.queries_round13 as r13  # noqa: E402


def _collect_sorted(df):
    return sorted(map(tuple, df.collect()))


_TWINS = [
    ("q669_streaming_ar2_backtest", "q657_ar2_backtest"),
    (
        "q670_streaming_semantic_decontamination",
        "q658_semantic_decontamination",
    ),
    (
        "q671_streaming_harmonic_centrality",
        "q659_harmonic_centrality_sampled",
    ),
    ("q672_streaming_logistic_irls", "q660_logistic_irls"),
    ("q673_streaming_js_divergence", "q663_js_divergence_by_source"),
    ("q674_streaming_mann_kendall", "q665_mann_kendall_trend"),
    ("q675_streaming_jarque_bera", "q666_jarque_bera"),
    ("q676_streaming_brown_forsythe", "q668_brown_forsythe"),
]


@pytest.mark.parametrize("twin,primary", _TWINS)
def test_round16_hostile_slicing_matches_batch(
    spark, smoke_sf_dir, monkeypatch, twin, primary
):
    """Every round-16 streaming drain ≡ its batch primary under a
    hostile 13-way slicing (partials split across epochs; the grain
    merges repair them)."""
    q = queries()
    batch = _collect_sorted(q[primary](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(q[twin](spark, smoke_sf_dir))
    assert drained == batch


# --- q677 KS two-sample -----------------------------------------------------


def test_q677_ks_bounds(spark, smoke_sf_dir):
    """D is a probability-scale gap in [0,1]; the verdict matches the
    critical-value comparison at the reported precision."""
    r = _one(queries()["q677_ks_two_sample"](spark, smoke_sf_dir))
    assert 0 <= r["d_stat"] <= 1
    assert r["crit_95"] > 0
    assert r["n_a"] > 0 and r["n_r"] > 0
    # at 6dp the reported values agree with the verdict direction
    if abs(r["d_stat"] - r["crit_95"]) > 1e-5:
        assert r["equal_dist_rejected"] == (r["d_stat"] > r["crit_95"])


# --- q678 Friedman ----------------------------------------------------------


def test_q678_friedman_rank_identity(spark, smoke_sf_dir):
    """Doubled within-block ranks sum to n*k*(k+1) across treatments
    (each block contributes 2*(1+2+3)=12); chi2 is nonnegative."""
    r = _one(queries()["q678_friedman_test"](spark, smoke_sf_dir))
    n, k = r["n_blocks"], r["k_treatments"]
    total = r["rank2_sum_y0"] + r["rank2_sum_y1"] + r["rank2_sum_y2"]
    assert total == n * k * (k + 1)
    assert r["friedman_chi2"] >= 0


# --- q679 Cochran Q ---------------------------------------------------------


def test_q679_cochran_bounds(spark, smoke_sf_dir):
    """Successes bounded by n*k; Q nonnegative; verdict matches cut."""
    r = _one(queries()["q679_cochran_q"](spark, smoke_sf_dir))
    assert 0 < r["n_successes"] <= r["n_customers"] * r["k_periods"]
    assert r["cochran_q"] >= 0
    assert r["propensity_change_rejected_null"] == (
        r["cochran_q"] > 5.991464547107979
    ) or abs(r["cochran_q"] - 5.991464547107979) < 1e-5


# --- q680 PSI ---------------------------------------------------------------


def test_q680_psi_card(spark, smoke_sf_dir):
    """PSI is nonnegative (it is a symmetrized KL); the verdict
    follows the 0.1/0.25 industry cutoffs."""
    r = _one(queries()["q680_psi_stability"](spark, smoke_sf_dir))
    assert r["psi"] >= 0
    v = (
        "stable"
        if r["psi"] < 0.1
        else "moderate_shift" if r["psi"] < 0.25 else "shifted"
    )
    assert r["stability_verdict"] == v
    assert r["n_bins"] == 7


# --- q685 ECE / q686 gains -------------------------------------------------


def test_q685_ece_bounds(spark, smoke_sf_dir):
    """ECE is a weighted mean of per-bin gaps, so ECE <= MCE; both in
    [0,1]."""
    r = _one(
        queries()["q685_expected_calibration_error"](spark, smoke_sf_dir)
    )
    assert 0 <= r["ece"] <= r["mce"] + 1e-6
    assert r["mce"] <= 1
    assert r["n_bins"] >= 1


def test_q686_gains_table_shape(spark, smoke_sf_dir):
    """Equal-depth deciles (sizes differ by <=1), cumulative gain is
    monotone and reaches 1, decile-1..10 all present, and the lift
    identity holds per row."""
    rows = sorted(
        queries()["q686_gains_table"](spark, smoke_sf_dir).collect(),
        key=lambda r: r["decile"],
    )
    assert [r["decile"] for r in rows] == list(range(1, 11))
    sizes = [r["n_docs"] for r in rows]
    assert max(sizes) - min(sizes) <= 1
    gains = [r["cum_gain"] for r in rows]
    assert gains == sorted(gains)
    assert gains[-1] == pytest.approx(1.0, abs=1e-6)
    n = sum(sizes)
    p = sum(r["n_positive"] for r in rows)
    for r in rows:
        assert r["lift"] == pytest.approx(
            (r["n_positive"] / r["n_docs"]) / (p / n), abs=1e-5
        )


# --- streaming twins q681-q684 ---------------------------------------------


_TWINS_B = [
    ("q681_streaming_ks_two_sample", "q677_ks_two_sample"),
    ("q682_streaming_friedman", "q678_friedman_test"),
    ("q683_streaming_cochran_q", "q679_cochran_q"),
    ("q684_streaming_psi", "q680_psi_stability"),
]


@pytest.mark.parametrize("twin,primary", _TWINS_B)
def test_round16_hostile_slicing_matches_batch_b(
    spark, smoke_sf_dir, monkeypatch, twin, primary
):
    """The second twin batch: drain ≡ batch primary under a hostile
    13-way slicing."""
    q = queries()
    batch = _collect_sorted(q[primary](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(q[twin](spark, smoke_sf_dir))
    assert drained == batch


# --- batch 6: RMST / randomness screens / SRM -------------------------------


def test_q687_rmst_bounds(spark, smoke_sf_dir):
    """RMST is an area under a [0,1] step curve on [0, tau], so
    0 <= rmst <= tau."""
    r = _one(queries()["q687_rmst"](spark, smoke_sf_dir))
    assert 0 <= r["rmst_days"] <= r["tau_days"]
    assert r["n_event_times"] > 0


def test_q688_turning_points_bounds(spark, smoke_sf_dir):
    """T is bounded by the interior point count n-2; verdict matches
    the z cut."""
    r = _one(queries()["q688_turning_points"](spark, smoke_sf_dir))
    assert 0 <= r["n_turning_points"] <= r["n_months"] - 2
    assert r["randomness_rejected"] == (abs(r["z_score"]) > 1.96)


def test_q689_runs_bounds(spark, smoke_sf_dir):
    """Median split is near-even; runs between 1 and n; verdict
    matches the cut."""
    r = _one(queries()["q689_runs_test"](spark, smoke_sf_dir))
    n = r["n_above"] + r["n_below"]
    assert abs(r["n_above"] - r["n_below"]) <= 1  # exact median split
    assert 1 <= r["n_runs"] <= n
    assert r["randomness_rejected"] == (abs(r["z_score"]) > 1.96)


def test_q690_grubbs_card(spark, smoke_sf_dir):
    """G is positive and the flag matches the fixed screen cut."""
    r = _one(queries()["q690_grubbs_screen"](spark, smoke_sf_dir))
    assert r["grubbs_g"] > 0
    assert r["outlier_flagged"] == (r["grubbs_g"] > 3.5)
    assert r["outlier_cents"] > 0


def test_q691_srm_card(spark, smoke_sf_dir):
    """Arms partition the customer table; chi2 nonnegative; the md5
    half-split must NOT trip the guardrail on a healthy assignment."""
    r = _one(queries()["q691_srm_guardrail"](spark, smoke_sf_dir))
    assert r["n_arm_a"] > 0 and r["n_arm_b"] > 0
    assert r["srm_chi2"] >= 0
    assert r["srm_detected"] == (r["srm_chi2"] > 3.841458820694124)


_TWINS_C = [
    ("q692_streaming_turning_points", "q688_turning_points"),
    ("q693_streaming_runs_test", "q689_runs_test"),
]


@pytest.mark.parametrize("twin,primary", _TWINS_C)
def test_round16_hostile_slicing_matches_batch_c(
    spark, smoke_sf_dir, monkeypatch, twin, primary
):
    """Third twin batch: drain ≡ batch primary under hostile 13-way
    slicing."""
    q = queries()
    batch = _collect_sorted(q[primary](spark, smoke_sf_dir))
    monkeypatch.setattr(r13, "_STREAM_EPOCHS", 13)
    drained = _collect_sorted(q[twin](spark, smoke_sf_dir))
    assert drained == batch
