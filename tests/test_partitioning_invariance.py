"""Partitioning-invariance: the repo's central determinism claim.

Operator docstrings repeatedly assert "decimal-cast sums make the
result accumulation-order-insensitive".  This suite puts that claim
under load: each query runs twice with DIFFERENT shuffle-partition
counts (different partition boundaries → different accumulation
orders → different task interleavings) and the stringified results
must be IDENTICAL — the same bar the driver's value hash applies
between engines, applied here between partitionings.

A float aggregate that slipped through without decimal staging passes
the oracle test by luck (same partitioning each run) but fails here.
"""

from __future__ import annotations

import pytest

from fame2pygen_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# queries whose plans carry float aggregation / iteration — the ones
# where accumulation order could leak if an operator regressed
SENSITIVE = [
    "s12_chain_index",
    "s14_convert_formula",
    "x06_text_profile",
    "x53_corr",
    "x63_weighted_quantiles",
    "x71_concentration",
    "x83_incremental_agg",
    "x95_prorate",
    "x97_decayed_agg",
    "x98_bigram_surprisal",
    "x100_seasonal",
    "x101_embedding_cov",
    "x108_cuped",
    "x110_pca_power",
    "x114_pq_encode",
    "x119_spearman",
    "x121_rfm",
    "x124_source_scorecard",
    "x126_incremental_dedup",
    "x210_page_hinkley",
    "x211_retrieval_eval",
    "x212_drift_dashboard",
    "x213_chi_square",
    "x214_anova",
    "x215_logrank",
    "x217_kruskal_wallis",
    "x218_mann_kendall",
    "x219_cochran_armitage",
    "x220_mcnemar",
    "x221_jackknife",
    "x222_delta_method",
    "x223_mde",
    "x224_gains",
    "x225_brown_forsythe",
    "x226_icc",
    "x227_cronbach",
    "x228_randomization",
    "x229_durbin_watson",
    "x230_periodicity",
    "x231_cluster_quality",
    "x235_ppr",
    "x236_ar1",
    "x237_welch",
    "x239_did",
    "x240_mahalanobis",
    "x241_watermark",
    "x243_bloom_fpr",
    "x245_pq_search",
    "x246_ivfpq",
    "x247_self_bleu",
    "x248_ams_join_size",
    "x249_als_step",
    "x250_kmeanspp",
    "x251_mantel_haenszel",
    "x254_cooks_distance",
    "x255_hill_tail",
    "x256_msprt",
    "x259_mase",
    "x261_nb_confusion",
    "x263_mix_shift",
    "x265_tail_dependence",
    "x266_pacf",
    "x268_segmented_trend",
    "x269_hitting_prob",
    "x270_brier",
    "x271_meta_analysis",
    "x272_threshold_sweep",
    "x274_text_tiling",
    "x275_strength",
    "x276_block_bootstrap",
    "x277_yuen",
    "x280_ipw_ate",
    "x281_bayes_ab",
    "x282_jl_audit",
    "x283_query_likelihood",
    "x284_rdd",
    "x287_backtest",
    "x291_tornqvist",
    "x292_henderson",
    "x293_growth_contrib",
    "x294_ljung_box",
    "x295_vocab_richness",
    "x296_runs_test",
    "x297_cochran_q",
    "x298_bartlett",
    "x299_friedman",
    "x301_mmd_rff",
    "x302_energy_distance",
    "x303_cv_folds",
    "x304_hbos",
    "x306_unimax",
    "x308_kcenter",
    "x310_qini",
    "x314_ucb",
    "x315_best_arm",
    "x316_geo_cells",
    "x317_geo_radius",
    "x318_isotonic",
    "x319_stupid_backoff",
    "x320_croston",
    "x321_hoeffding_racing",
    "x322_seq_patterns",
    "x323_dtw",
    "x324_event_study",
    "x325_fellegi_sunter",
    "x327_fs_em_weights",
    "x328_jaro_winkler",
    "x329_ransac",
    "x330_hodges_lehmann",
    "x331_gumbel",
    "x335_bandpass",
    "x336_hp_filter",
    "x337_chow_break",
    "x338_hurst",
    "x339_perm_entropy",
    "x340_sampen",
    "x341_lof",
    "x342_gmm_step",
    "x343_stump",
    "x344_logistic_newton",
    "x351_granger",
    "x352_coint",
    "x353_breusch_pagan",
    "x354_jarque_bera",
    "x355_kalman",
    "x356_smooth_disagg",
    "x357_theta",
    "x360_psm_match",
    "x361_rdd",
    "x362_twfe",
    "x363_oaxaca",
    "x364_gini",
    "x365_cvm",
    "x366_rbo",
    "x367_iv_wald",
    "x368_procrustes",
    "x369_matryoshka",
    "x370_competing_risks",
    "x371_newsvendor",
    "x372_haar",
    "x373_shapley_r2",
    "x377_savgol",
    "x378_goertzel",
    "x382_sa_quality",
    "x384_elementary_idx",
    "x385_simpsons",
    "x386_bursts",
    "p06_panel_statespace",
    "x390_isotonic",
    "x391_matrix_profile",
    "x392_quantile_sketch",
    "x398_lz76",
    "x399_conformal",
    "x400_tpch_q3",
    "x401_tpch_q5",
    "x402_tpch_q10",
    "x403_reconcile",
    "x404_changepoints",
    "x406_jonckheere",
    "x407_kendall",
    "x408_james_stein",
    "x409_breslow_day",
    "x410_newey_west",
    "x411_pretraining_capstone",
    "x412_tpch_q1",
    "x413_tpch_q18",
    "x414_tpch_q21",
    "x416_tpch_q4",
    "x417_tpch_q16",
    "x418_tpch_q22",
    "x419_quality_canonical",
    "x421_tpch_q2",
    "x423_tpch_q15",
    "x424_tpch_q3",
    "x425_tpch_q11",
    "x426_tpch_q17",
    "x427_tpch_q19",
    "x428_tpch_q5",
    "x429_tpch_q7",
    "x430_tpch_q8",
    "x431_tpch_q20",
    "p07_panel_dedup",
    "p08_panel_ann",
    "p09_panel_vocab",
    "p10_panel_graph",
    "p11_panel_survivors",
    "p12_panel_ivf",
]


def snapshot(spark, name: str):
    df = QUERIES[name](spark, SF)
    cols = sorted(df.columns)
    rows = [
        tuple(str(r[c]) for c in cols) for r in df.collect()
    ]
    rows.sort()
    return cols, rows


@pytest.mark.parametrize("name", SENSITIVE)
def test_result_is_partitioning_invariant(spark, name):
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = snapshot(spark, name)
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = snapshot(spark, name)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a[0] == b[0]
    assert a[1] == b[1], f"{name}: results differ across partitionings"
