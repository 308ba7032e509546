"""propose_window (tools/witness_ledger.py, VERDICT r7 #6): the
deterministic rotation rule behind DRIVER_WINDOW, exercised across all
three regimes with injected ledgers so the post-drain branch is
verified BEFORE the registry actually drains at r8."""

from __future__ import annotations

from hive_release_spark.queries import REGISTRY
from tools.witness_ledger import (
    REQUIRED_FAMILIES,
    WINDOW_SIZE,
    propose_window,
    witness_rounds,
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


def test_transition_regime_matches_committed_r8_window():
    """The committed r8 DRIVER_WINDOW is exactly the real-ledger
    proposal: the whole 45-entry backlog + 5 stalest-family reps."""
    from hive_release_spark.queries import DRIVER_WINDOW

    proposal = propose_window()
    assert sorted(proposal) == sorted(DRIVER_WINDOW)
    real = witness_rounds()
    backlog = [n for n in NAMES if n not in real]
    assert set(backlog) <= set(proposal)


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
