"""Registry-order insurance: the round driver hash-checks only the
FIRST 50 ``queries()`` entries, so the window must contain every
SURVEY §2 reference-surface query and one representative per
extension family.  A refactor that reshuffles dict construction
silently demotes queries to the weaker rows-only check — this pins
the invariant."""

from __future__ import annotations

from fame2pygen_spark.queries import CHECKED_WINDOW, ORACLES, QUERIES

SECTION2 = [
    "s01_projection_arithmetic", "e01_lag_lead", "e06_pct_diff",
    "s08_conditional", "s09_lsum_exists", "s07_date_window",
    "s06_point_in_time", "s16_first_last", "s04_scalar_broadcast",
    "s05_dynamic_lookup", "e08_math_funcs", "e13_min_max",
    "e17_dateof_sentinel", "s10_shift_pct_forward", "s11_backcast",
    "s12_chain_index", "s13_fishvol", "s14_convert_down",
    "s14_convert_up", "s14_convert_formula", "s14_convert_business",
    "s14_convert_holiday", "s17_nlrx", "s20_local_db",
    "flagship_pricing_summary",
]

FAMILY_REPS = {
    "dedup": "x01_dedup_exact",
    "near_dedup": "x03_dedup_minhash_lsh",
    "ann": "x05_similarity_topk",
    "text": "x06_text_profile",
    "clustering": "x09_dedup_clusters",
    "streaming": "x10_events_hourly",
    "multimodal": "x12_multimodal_binary",
    "curation": "x14_curation_pipeline",
    "mixing": "x17_corpus_mixing",
    "decontam": "x19_decontamination",
    "pii": "x20_pii_scrub",
    "web": "x23_url_domains",
    "stream_join": "x24_stream_join",
    "temporal": "x25_asof_join",
    "sketch": "x55_skew_profile",
    "quality": "x96_dq_report",
    "maintenance": "x99_cdc_apply",
    "behavior": "x31_funnel",
    "olap": "x40_revenue_rollup",
    "linkage": "x43_fuzzy_match",
    "panel": "p01_panel_pct",
}


def test_window_is_the_registry_prefix():
    assert list(QUERIES)[: len(CHECKED_WINDOW)] == CHECKED_WINDOW
    assert len(CHECKED_WINDOW) == 50


def test_section2_inside_checked_window():
    missing = [n for n in SECTION2 if n not in CHECKED_WINDOW]
    assert not missing, missing


def test_family_reps_inside_checked_window():
    missing = {
        fam: n for fam, n in FAMILY_REPS.items() if n not in CHECKED_WINDOW
    }
    assert not missing, missing


def test_registry_complete_and_oracled():
    # 101 entries through round 2; round-3 additions (x72+) append to
    # the tail without disturbing the driver-checked first-50 window
    assert len(QUERIES) >= 113
    assert set(QUERIES) == set(ORACLES)
    # reorder must not drop or duplicate anything
    assert len(set(QUERIES)) == len(QUERIES)
