"""Law tests for the round-7 second-session operators: the planted/organic
behavior contracts the oracle hash can't see (a hash match proves both
engines agree — these prove they agree on the RIGHT thing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from modforms_db_spark.registry import get_registry

from tests.conftest import SF_DIR


def _run(spark, name, sf=SF_DIR):
    return get_registry()[name].builder(spark, sf).toPandas()


# -- sequential testing ------------------------------------------------


def test_sprt_verdicts_and_stopping(spark):
    df = _run(spark, "q_sprt_monitor").set_index("stream")
    assert df.loc["null_5pct", "decision"] == "accept_h0"
    assert df.loc["alt_10pct", "decision"] == "reject_h0"
    assert df.loc["organic_purchase", "decision"] == "reject_h0"
    # sequential tests stop sooner the further truth is from H0
    assert (
        df.loc["organic_purchase", "n_decide"]
        < df.loc["alt_10pct", "n_decide"]
    )
    # a decision row's LLR must sit outside the corridor
    from modforms_db_spark.operators.aggregates import _SPRT_A

    decided = df[df["decision"] != "undecided"]
    assert (decided["llr8_decide"].abs() >= _SPRT_A).all()


def test_obf_null_never_crosses_and_bounds_decrease(spark):
    df = _run(spark, "q_group_sequential_obf")
    null = df[df["scope"] == "null"]
    assert not null["crossed"].any()
    bounds = df.sort_values("look")["bound"].drop_duplicates().tolist()
    assert bounds == sorted(bounds, reverse=True)  # OBF spends late
    planted = df[df["scope"] == "planted"].sort_values("look")
    # once crossed, the design stops — the final look must be crossed
    # whenever any earlier look was (z grows with information here)
    if planted["crossed"].any():
        assert planted.iloc[-1]["crossed"]


# -- randomness / normality / heteroscedasticity ----------------------


def test_runs_test_branches(spark):
    df = _run(spark, "q_runs_test").set_index("stream")
    assert df.loc["ramp_planted", "reject"] and df.loc["ramp_planted", "r_runs"] == 2
    assert df.loc["zigzag_planted", "reject"]
    assert df.loc["zigzag_planted", "z4"] > 0 > df.loc["ramp_planted", "z4"]
    organic = df.drop(index=["ramp_planted", "zigzag_planted"])
    assert not organic["reject"].any()


def test_jarque_bera_three_regimes(spark):
    df = _run(spark, "q_jarque_bera").set_index("scope")
    assert not df.loc["binomial_planted", "reject"]
    assert df.loc["organic_value", "reject"]
    assert df.loc["uniform_planted", "reject"]
    # opposite kurtosis tails
    assert df.loc["organic_value", "exkurt4"] > 0
    assert df.loc["uniform_planted", "exkurt4"] < 0
    # SF-invariant panel
    assert (df["n"] == 1000).all()


def test_breusch_pagan_branches(spark):
    df = _run(spark, "q_breusch_pagan").set_index("scope")
    assert df.loc["planted", "heteroscedastic"]
    assert not df.loc["organic", "heteroscedastic"]


def test_spc_xbar_flags_only_planted_shift(spark):
    df = _run(spark, "q_spc_xbar")
    organic = df[df["scope"] == "organic"]
    assert not organic["out_of_control"].any()
    planted17 = df[(df["scope"] == "planted") & (df["d"] == 17)]
    assert planted17["out_of_control"].all()
    # limits bracket the center line ordering
    assert (df["lcl4"] < df["ucl4"]).all()


# -- causal shelf -------------------------------------------------------


def test_matching_recovers_tau_where_naive_fails(spark):
    row = _run(spark, "q_matching_att").iloc[0]
    tau = 5.0
    assert abs(row["att2"] - tau) < 1.5
    assert row["naive_diff2"] - tau > 10  # confounding bias is large
    assert 0 < row["n_matched"] <= row["n_treated"]


def test_mediation_branches(spark):
    df = _run(spark, "q_mediation_sobel").set_index("scope")
    assert df.loc["planted", "mediated"]
    assert not df.loc["null", "mediated"]
    # b is large in BOTH panels — the trap the test exists to avoid
    assert df.loc["null", "b4"] > 1.5
    assert abs(df.loc["planted", "a4"] - 10.0) < 2.0


def test_event_study_shape(spark):
    df = _run(spark, "q_event_study")
    p = df[df["scope"] == "planted"].set_index("tau")["mean_abnormal4"]
    assert p.loc[0] > 40000 and p.loc[1] > 15000
    # flat pre-trend: nothing before tau=0 approaches the jump
    assert p.loc[[-3, -2, -1]].abs().max() < p.loc[0] / 10


# -- uncertainty / distributional A/B ----------------------------------


def test_conformal_coverage_near_nominal(spark):
    df = _run(spark, "q_conformal_interval")
    for _, r in df.iterrows():
        nominal = (100 - r["alpha_pct"]) / 100.0
        # guaranteed >= nominal in expectation; allow small-sample slack
        assert r["coverage4"] > nominal - 0.05, r
        assert r["qhat_dollars2"] > 0


def test_qte_constant_shift_signature(spark):
    df = _run(spark, "q_quantile_treatment_effect")
    null = df[df["scope"] == "null"].set_index("p")["qte2"]
    shifted = df[df["scope"] == "shifted"].set_index("p")["qte2"]
    for p in (25, 50, 90):
        assert abs((shifted.loc[p] - null.loc[p]) - 20.0) < 1e-9


# -- embeddings ---------------------------------------------------------


def test_lof_planted_outlier_separates(spark):
    df = _run(spark, "q_lof_panel")
    planted = df[df["q_id"] == -1]
    organic = df[df["q_id"] != -1]
    assert planted["outlier"].all() and planted["lof4"].iloc[0] > 2.5
    assert not organic["outlier"].any()
    assert organic["lof4"].max() < 1.3


def test_cluster_validity_contrast(spark):
    df = _run(spark, "q_cluster_validity").set_index("scope")
    assert df.loc["planted", "ch4"] > 100 * df.loc["organic", "ch4"]
    assert df.loc["planted", "db4"] < df.loc["organic", "db4"] / 10


def test_reco_coverage_bounds(spark):
    row = _run(spark, "q_reco_coverage").iloc[0]
    assert 0 < row["coverage4"] <= 1
    assert 0 <= row["exposure_gini4"] <= 1
    assert 1 <= row["mean_list_labels4"] <= 5


# -- privacy / curation -------------------------------------------------


def test_t_closeness_planted_leak_only(spark):
    df = _run(spark, "q_t_closeness")
    leak = df[df["group_id"] == "LEAK_planted"]
    organic = df[df["group_id"] != "LEAK_planted"]
    assert leak["violates"].all() and leak["t4"].iloc[0] > 0.4
    assert not organic["violates"].any()


def test_curriculum_pool_tracks_competence(spark):
    df = _run(spark, "q_curriculum_competence").sort_values("t")
    # pool grows monotonically and ends at the full corpus
    assert df["pool_n"].is_monotonic_increasing
    assert df.iloc[-1]["pool_frac4"] == 1.0
    # pool_frac tracks c(t) = sqrt(t/5) within rounding of the rank grid
    for _, r in df.iterrows():
        assert abs(r["pool_frac4"] - (r["t"] / 5.0) ** 0.5) < 0.01
    assert df["hardest"].is_monotonic_increasing


def test_ipf_margins_converge(spark):
    import pandas as pd

    df = _run(spark, "q_ipf_raking")
    n_total = df["n"].sum()
    col_target = n_total / df["c_mktsegment"].nunique()
    col_margins = df.groupby("c_mktsegment")["w4"].sum()
    # column margins exact (to r4 accumulation) after a column step
    assert (abs(col_margins - col_target) < 0.1).all()
    row_target = n_total / df["c_nationkey"].nunique()
    row_margins = df.groupby("c_nationkey")["w4"].sum()
    # row margins approximately converged after 3 rounds
    assert (abs(row_margins - row_target) / row_target < 0.05).all()


def test_canary_audit_gate_specificity(spark):
    df = _run(spark, "q_canary_audit").set_index("family")
    clean = df.loc["clean"]
    assert (
        clean["n_injected"]
        == clean["after_dedup"]
        == clean["after_repfilter"]
        == clean["after_decontam"]
    )
    assert df.loc["duplicate", "after_dedup"] * 2 == df.loc["duplicate", "n_injected"]
    assert df.loc["repetitive", "after_repfilter"] == 0
    assert df.loc["repetitive", "after_dedup"] == df.loc["repetitive", "n_injected"]
    assert df.loc["leaked", "after_decontam"] == 0
    assert df.loc["leaked", "after_repfilter"] == df.loc["leaked", "n_injected"]


def test_wasserstein_shift_dominates(spark):
    df = _run(spark, "q_wasserstein_drift").set_index("scope")
    w_null = df.loc["null", "w1_dollars4"]
    w_shift = df.loc["shifted", "w1_dollars4"]
    assert abs(w_shift - 20.0) < w_null  # the shift dominates
    assert w_null < 5  # hash-split noise, priced in dollars


def test_markov_attribution_shares(spark):
    df = _run(spark, "q_markov_attribution")
    assert len(df) == 4
    assert abs(df["share4"].sum() - 1.0) < 0.01
    assert (df["removal_effect4"] > 0).all()  # every channel carries paths
    assert (df["p_removed4"] < df["removal_effect4"] * 0 + 1).all()


def test_tail_dependence_branches(spark):
    df = _run(spark, "q_tail_dependence").set_index("scope")
    assert df.loc["dependent", "tail_dependent"]
    assert not df.loc["independent", "tail_dependent"]
    # independent lambda_U floors at the tail mass q = 0.05, not 0
    assert 0.0 <= df.loc["independent", "lambda_u4"] < 0.15
    assert abs(df.loc["dependent", "lambda_u4"] - 0.30) < 0.05


def test_meta_analysis_heterogeneity_flag(spark):
    df = _run(spark, "q_meta_analysis").set_index("scope")
    assert df.loc["planted", "heterogeneous"]
    assert not df.loc["organic", "heterogeneous"]
    assert df.loc["organic", "i2_4"] < 0.5
    assert df.loc["planted", "q_het4"] > df.loc["organic", "q_het4"]


def test_fairness_flags_only_biased_group(spark):
    df = _run(spark, "q_fairness_parity")
    uniform = df[df["scope"] == "uniform_gate"]
    assert uniform["passes_80pct"].all()
    biased = df[df["scope"] == "biased_gate"].set_index("lang")
    assert not biased.loc["de", "passes_80pct"]
    others = biased.drop(index="de")
    assert others["passes_80pct"].all()
    # the biased gate also degrades de's TPR (equalized-odds view)
    assert biased.loc["de", "tpr4"] < others["tpr4"].min()


def test_ljung_box_branches(spark):
    df = _run(spark, "q_ljung_box").set_index("stream")
    assert df.loc["randomwalk_planted", "reject"]
    organic = df.drop(index="randomwalk_planted")
    assert not organic["reject"].any()
    assert df.loc["randomwalk_planted", "lb4"] > 5 * organic["lb4"].max()


def test_ht_systematic_pps_beats_poisson_srs(spark):
    df = _run(spark, "q_ht_estimator").set_index("method")
    # fixed-size systematic pps with a perfect size measure: ~1/n0 error
    assert df.loc["pps", "rel_err4"] < 0.02
    # Poisson SRS carries per-row AND size noise
    assert df.loc["pps", "rel_err4"] < df.loc["srs", "rel_err4"]
    # systematic selection is fixed-size by construction (n0 +- 1)
    assert abs(df.loc["pps", "n_sampled"] - 100) <= 1


def test_pr_auc_vs_roc_relationship(spark):
    pr = _run(spark, "q_pr_auc").set_index("source")
    roc = _run(spark, "q_roc_auc").set_index("source")
    both = pr.join(roc[["auc"]], how="inner").dropna()
    # AP is bounded (0, 1]; and must beat the random baseline
    # (prevalence) wherever ROC-AUC does better than chance
    for src, r in both.iterrows():
        prev = r["n_pos"] / (r["n_pos"] + r["n_neg"])
        assert 0 < r["ap"] <= 1
        if r["auc"] > 0.55:
            assert r["ap"] > prev, (src, r["ap"], prev)


def test_brier_murphy_identity_components(spark):
    df = _run(spark, "q_brier_decomposition")
    # all three components live in their ranges; reliability small for a
    # roughly calibrated score, uncertainty = p(1-p) <= 0.25
    assert (df["reliability4"] >= 0).all()
    assert (df["resolution4"] >= 0).all()
    assert (df["uncertainty4"] <= 0.25 + 1e-9).all()
    # resolution can never exceed uncertainty (Murphy bound)
    assert (df["resolution4"] <= df["uncertainty4"] + 1e-4).all()


def test_binseg_recovers_both_boundaries(spark):
    df = _run(spark, "q_changepoint_binseg")
    planted = df[df["stream"] == "shifts_planted"]
    assert sorted(planted["cp_d"].tolist()) == [10, 20]
    assert (planted["rel_gain4"] > 0.45).all()
    # organic streams emit nothing — the honest negative
    assert (df["stream"] == "shifts_planted").all()


def test_qini_rises_then_flattens_above_baseline(spark):
    df = _run(spark, "q_uplift_qini").sort_values("decile")
    # above the random-targeting line strictly inside the curve
    mid = df[(df["decile"] >= 2) & (df["decile"] <= 9)]
    assert (mid["qini4"] > mid["random_baseline4"]).all()
    # effect concentrates in the top 3 deciles: by decile 3 the curve
    # is already near its plateau
    q3 = df[df["decile"] == 3]["qini4"].iloc[0]
    qmax = df["qini4"].max()
    assert q3 > 0.75 * qmax
    # endpoint equals the baseline endpoint by construction
    last = df[df["decile"] == 10]
    assert abs(last["qini4"].iloc[0] - last["random_baseline4"].iloc[0]) < 1e-9
