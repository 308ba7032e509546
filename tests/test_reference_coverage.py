"""Registry-wide verification-layer CLASSIFICATION — the forcing
function that keeps the independent-reference story complete.

Three layers verify every entry: (1) the DuckDB oracle gate
(tools/check.py, the driver), (2) targeted plan/property pytest, and
(3) for bespoke math, a non-engine recomputation in
test_independent_reference_values.py (plus the older numpy-parity
suites). The r4 Heaps-law bug proved layer 1 alone cannot catch a
shared misreading when the SAME HAND wrote both the Spark query and
its SQL oracle from the same (mis)understanding — so every entry must
fall into exactly one of these classes, and this test fails the
moment a new entry is registered without a conscious classification:

- **referenced** — its name appears in one of the REFERENCE_SUITES,
  which recompute results from genuinely different formulations
  (pandas/numpy/hashlib/union-find/pure-Python traces, mostly loaded
  without Spark).
- **CROSS_ENGINE_SQL** — the entry contains no bespoke math authored
  in this repo: both sides delegate to two independent engines'
  implementations of public SQL semantics (TPC-H/DS shapes, join /
  window / set-op / subquery forms, scalar-function surfaces,
  Structured Streaming windows vs batch SQL). A shared misreading
  would have to be shared by Spark's and DuckDB's own engine authors,
  which is exactly the independence layer 3 buys elsewhere.
- **PROPERTY_PINNED** — approximate/sketch/hash entries whose oracle
  deliberately pins only wide bounds (the sketch-accuracy ADVICE
  lesson: never hard-pin an approximation as a constant-true oracle
  column); the TIGHT accuracy/recall property lives in the named
  pytest, verified here to exist.
- **CONTRACT_SELF_CHECK** — entries that emit their mathematical
  GUARANTEES as boolean columns computed in-entry against exact
  values, with the exact values cross-engine-gated (count-min
  never-underestimates, histogram mass conservation, PCA
  orthogonality, Misra-Gries exactness below the tracked bound).

Stale names in any hand list fail too — classification can't rot.
"""

from __future__ import annotations

import re
from pathlib import Path

from hive_release_spark.queries import REGISTRY

TESTS = Path(__file__).resolve().parent

REFERENCE_SUITES = (
    "test_independent_reference_values.py",
    "test_ml_sql.py",
    "test_r5_stats.py",
    "test_stats_tests.py",
    "test_fixture_margins.py",
    "test_sketches.py",
    "test_llm.py",
)

# entry -> (suite file, test function) carrying the tight property
PROPERTY_PINNED = {
    "dedup_minhash_lsh": ("test_llm.py", "test_minhash_lsh_recall_vs_exact"),
    "dedup_simhash": ("test_llm.py", "test_simhash_near_dups_have_low_hamming"),
    "fn_misc_xpath": ("test_functions.py", "test_misc_xpath_remainder_properties"),
    "agg_hll_union": ("test_sketches.py", "test_rolling_active_sketch_merge_within_2pct"),
    "agg_hll_intersect_estimate": ("test_sketches.py", "test_hll_intersect_estimate_within_5pct_of_union"),
    "events_rolling_active_sketch": ("test_sketches.py", "test_rolling_active_sketch_merge_within_2pct"),
    "stream_distinct_sketch": ("test_sketches.py", "test_daily_distinct_sketch_within_2pct"),
    "agg_bloom_filter": ("test_sketches.py", "test_no_false_negatives_and_fpp_bound"),
    "agg_percentile_approx_contract": ("test_sketches.py", "test_percentile_approx_tracks_exact"),
}

CONTRACT_SELF_CHECK = frozenset({
    "agg_histogram_numeric",
    "agg_count_min_contract",
    "agg_approx_top_k_contract",
    "emb_pca_contract",
})

CROSS_ENGINE_SQL = frozenset("""
agg_bool_family agg_collect agg_cube agg_distinct agg_filter_clause
agg_grouping_id agg_grouping_sets agg_listagg agg_min_max_by
agg_mode_deterministic agg_percentile agg_pivot agg_regr agg_rollup
agg_stats agg_unpivot distinct_rows ds_channel_rollup
ds_cross_channel_customers ds_frequent_buyers ds_hierarchy_rank
ds_late_delivery_chain ds_returns_adjusted_spend ds_sales_deviation_rank
ds_spend_growth_pairs ds_three_channel_ratio ds_time_bucket_counts
ds_topk_per_group ds_week_over_week ds_worst_return_ratios
ds_year_over_year_spend fn_array_surface fn_bitwise fn_collation_ci
fn_complex_types fn_conditional fn_datetime fn_datetime_misc
fn_decimal_arith fn_gap_tier fn_hash fn_hof_surface fn_json fn_map_hof
fn_map_surface fn_mask fn_math fn_misc_surface fn_numeric_repr
fn_parse_url fn_regex fn_sql_macro fn_str_to_map fn_string fn_string2
fn_trig fn_try_family fn_union_type fn_variant_json
join_asof_nearest join_broadcast_part join_cross
join_full_outer join_left_anti join_left_outer join_left_semi
join_merge_hint join_pure_theta join_right_outer
join_shuffle_hash_hint join_theta_residual join_unique
limit_offset_page q10_returned_items q11_important_parts
q12_shipmode_priority q13_customer_distribution q14_promo_effect
q15_top_supplier q16_supplier_cnt q17_small_quantity_revenue
q18_large_orders q19_disjunctive_revenue q1_pricing_summary
q20_excess_suppliers q21_waiting_suppliers q22_dormant_customers
q2_min_cost_supplier q3_shipping_priority q4_order_priority
q5_local_supplier_volume q6_forecast_revenue q7_volume_shipping
q8_market_share q9_product_profit rollup_multires sample_bucket
sample_fraction scan_filter_project script_transform setop_except
setop_except_all setop_intersect setop_intersect_all setop_union
setop_union_by_name setop_union_distinct sort_null_ordering
source_sequencefile_roundtrip
source_xml_roundtrip sql_group_order_all sql_lateral_alias
sql_named_window sql_pipe_syntax sql_qualify_filter
sql_recursive_calendar sql_select_except sql_values_inline
stream_dedup_first stream_session stream_session_dynamic stream_sliding
stream_static_join stream_stream_full_join stream_stream_join
stream_stream_left_join stream_tumbling stream_tumbling_live
stream_watermark_late_drop subquery_in subquery_not_in
subquery_scalar_correlated topk_orders udtf_explode_map
udtf_explode_wordcount udtf_inline udtf_posexplode udtf_python
udtf_stack window_exclude_current window_first_last
window_ignore_nulls window_lead_lag window_range_frame
window_range_interval window_ranking window_rows_frame
window_share_of_total
""".split())


def _mentioned() -> set[str]:
    names = set(REGISTRY)
    hit: set[str] = set()
    for f in REFERENCE_SUITES:
        txt = (TESTS / f).read_text()
        for n in names - hit:
            if re.search(r"\b" + re.escape(n) + r"\b", txt):
                hit.add(n)
    return hit


def test_every_entry_is_classified():
    mentioned = _mentioned()
    # vacuity guard: the scan finding almost nothing means the regex or
    # file list broke, not that coverage collapsed
    assert len(mentioned) > 150, len(mentioned)
    hand = CROSS_ENGINE_SQL | set(PROPERTY_PINNED) | CONTRACT_SELF_CHECK
    unclassified = set(REGISTRY) - mentioned - hand
    assert not unclassified, (
        "new registry entries need a conscious verification-layer "
        f"classification (see module docstring): {sorted(unclassified)}"
    )


def test_classification_lists_are_current():
    mentioned = _mentioned()
    names = set(REGISTRY)
    for label, group in (
        ("CROSS_ENGINE_SQL", CROSS_ENGINE_SQL),
        ("PROPERTY_PINNED", set(PROPERTY_PINNED)),
        ("CONTRACT_SELF_CHECK", CONTRACT_SELF_CHECK),
    ):
        stale = set(group) - names
        assert not stale, f"stale names in {label}: {sorted(stale)}"
        # an entry that GAINED an independent reference must be pruned
        # from the hand list so the classification stays honest
        overlap = set(group) & mentioned
        assert not overlap, (
            f"{label} entries now covered by a reference suite — "
            f"remove them from the list: {sorted(overlap)}"
        )
    assert not CROSS_ENGINE_SQL & set(PROPERTY_PINNED)
    assert not CROSS_ENGINE_SQL & CONTRACT_SELF_CHECK
    assert not set(PROPERTY_PINNED) & CONTRACT_SELF_CHECK


def test_property_pinned_tests_exist():
    for name, (suite, testfn) in PROPERTY_PINNED.items():
        txt = (TESTS / suite).read_text()
        assert re.search(rf"def {testfn}\b", txt), (
            f"{name}: pinning test {suite}::{testfn} not found"
        )
