"""propose_window (tools/witness_ledger.py, VERDICT r7 #6): the
deterministic rotation rule behind DRIVER_WINDOW, exercised across all
three regimes with injected ledgers so the post-drain branch is
verified BEFORE the registry actually drains at r8."""

from __future__ import annotations

import json

from hive_release_spark.queries import REGISTRY
from tools.witness_ledger import (
    REQUIRED_FAMILIES,
    WINDOW_SIZE,
    _round_of,
    correctness_files,
    propose_window,
)

NAMES = list(REGISTRY)


def test_backlog_saturated_regime():
    """>= 50 never-witnessed: every slot drains the backlog in registry
    order, contract-changed entries first."""
    rounds = {n: 3 for n in NAMES[100:]}  # first 100 never witnessed
    changed = NAMES[150]  # witnessed entry with a declared change
    w = propose_window(contract_changed=[changed], rounds=rounds)
    assert len(w) == WINDOW_SIZE
    assert w[0] == changed
    assert w[1:] == NAMES[:49]


# The r8 transition-regime window as committed and driver-recorded
# (CORRECTNESS_r08.json): the whole 45-entry never-witnessed backlog in
# registry order + the 5 stalest-family reps.  A HISTORICAL constant —
# the regime test below re-derives it from an injected r1–r7 ledger so
# it stays green forever (VERDICT r8 "What's wrong" #2: the original
# test pinned the LIVE ledger and rotted the moment r8's file landed).
R8_WINDOW = (
    "graph_local_clustering", "graph_adamic_adar",
    "graph_jaccard_neighbors", "graph_assortativity",
    "orders_monthly_percentiles", "timeseries_rolling_corr",
    "timeseries_ewma", "timeseries_theil_sen", "timeseries_holt",
    "timeseries_gap_fill", "timeseries_backtest_naive",
    "join_asof_forward", "timeseries_croston", "timeseries_holt_winters",
    "stats_ks_two_sample", "stats_mann_whitney", "stats_chi_square",
    "timeseries_autocorr", "timeseries_cross_corr", "stats_subsample_ci",
    "stats_power_two_proportions", "agg_approx_top_k_contract",
    "dq_freshness_lag", "retention_halflife_fit", "stats_anova_oneway",
    "stats_spearman_corr", "stats_fdr_bh", "stats_randomization_test",
    "stats_weibull_fit", "stats_qq_deciles", "sample_stratified_neyman",
    "events_fano_factor", "dq_outlier_tukey_fences", "stats_granger_lite",
    "stats_simpson_check", "ml_linear_regression",
    "ml_naive_bayes_langid", "ml_decision_stump", "ml_knn_label_accuracy",
    "ml_item_item_cf", "ml_markov_next_event", "ml_basket_rules",
    "ml_boosted_stumps", "ml_regression_calibration",
    "ml_regression_kfold_cv",
    "ptf_apply_in_pandas_zscore", "sample_bucket", "scan_filter_project",
    "q4_order_priority", "udtf_explode_wordcount",
)


def test_transition_regime_reproduces_r8_window():
    """The transition regime (0 < backlog < 50, first hit at r8) is
    pinned against the INJECTED immutable r1–r7 ledger: the proposal
    must be exactly the window r8 committed and the driver recorded —
    the whole 45-entry backlog + 5 stalest-family reps.  Registry
    entries added after r8 (e.g. the judge-invited r9
    source_sequencefile_roundtrip) are masked as r7-fresh so they can
    claim neither a backlog nor a fill slot; without the mask any
    later addition would perturb a proposal about a round that already
    happened."""
    r7_rounds: dict[str, int] = {}
    r8_seen: set[str] = set()
    for path in correctness_files():
        r = _round_of(path)
        if r > 8:
            continue
        with open(path) as f:
            names = list(json.load(f))
        r8_seen.update(names)
        if r <= 7:
            for n in names:
                r7_rounds[n] = max(r, r7_rounds.get(n, 0))
    for n in NAMES:
        if n not in r8_seen:
            r7_rounds[n] = 7  # post-r8 addition: mask as latest-fresh
    proposal = propose_window(contract_changed=[], rounds=r7_rounds)
    assert sorted(proposal) == sorted(R8_WINDOW)
    backlog = [n for n in R8_WINDOW[:45] if n not in r7_rounds]
    assert len(backlog) == 45  # the whole historical backlog windowed


def test_post_drain_regime_emits_valid_r9_window():
    """Fully drained ledger (every entry witnessed, the r8 window
    fresh in the latest round): the proposal must (a) fill 50 slots,
    (b) never re-record a latest-round row, (c) cover every required
    family that has a non-fresh member, (d) fill remaining slots
    oldest-witness-first."""
    from hive_release_spark.queries import DRIVER_WINDOW

    latest = 8
    rounds = {n: min((hash(n) % 6) + 1, 7) for n in NAMES}
    for n in DRIVER_WINDOW:
        rounds[n] = latest  # the r8 window is fresh
    w = propose_window(contract_changed=[], rounds=rounds)
    assert len(w) == WINDOW_SIZE
    assert len(set(w)) == WINDOW_SIZE
    fresh = [n for n in w if rounds[n] >= latest]
    assert not fresh, f"window re-records latest-round rows: {fresh}"

    window_tags = {t for n in w for t in REGISTRY[n].tags}
    coverable = {
        fam for fam in REQUIRED_FAMILIES
        if any(
            fam in REGISTRY[n].tags and rounds[n] < latest for n in NAMES
        )
    }
    missing = coverable - window_tags
    assert not missing, f"post-drain window misses coverable families: {missing}"

    # oldest-first fill: the window must contain every eligible entry
    # with the minimum witness round (they can't be skipped while
    # newer entries get slots)
    eligible = [n for n in NAMES if rounds[n] < latest]
    oldest_round = min(rounds[n] for n in eligible)
    oldest = [n for n in eligible if rounds[n] == oldest_round]
    if len(oldest) <= WINDOW_SIZE - len(REQUIRED_FAMILIES):
        left_out = [n for n in oldest if n not in w]
        assert not left_out, f"oldest-witnessed entries skipped: {left_out}"


def test_contract_changed_claims_first_slots_post_drain():
    rounds = {n: 5 for n in NAMES}
    changed = [NAMES[10], NAMES[200]]
    w = propose_window(contract_changed=changed, rounds=rounds)
    assert w[:2] == changed


def test_sole_member_family_fresh_in_latest_round_is_skipped():
    """scan has one member (scan_filter_project); when it is fresh in
    the latest round, the proposal must not burn a slot re-recording
    it and must not crash on the uncoverable family."""
    latest = 9
    rounds = {n: 2 for n in NAMES}
    rounds["scan_filter_project"] = latest
    # make SOMETHING else fresh too so latest_round detection is robust
    rounds["q1_pricing_summary"] = latest
    w = propose_window(contract_changed=[], rounds=rounds)
    assert "scan_filter_project" not in w
    assert "q1_pricing_summary" not in w
    assert len(w) == WINDOW_SIZE


def test_oversized_contract_changed_is_clamped():
    rounds = {n: 5 for n in NAMES}
    w = propose_window(contract_changed=NAMES[:60], rounds=rounds)
    assert len(w) == WINDOW_SIZE
    assert w == NAMES[:50]
