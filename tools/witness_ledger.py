"""Driver-witness ledger: per-entry latest driver-witness rounds from
CORRECTNESS_r*.json (the driver records only the first 50 ``queries()``
entries per round; ``DRIVER_WINDOW`` rotates through this ledger —
VERDICT r4 "Next round" #1/#4, r7 #1/#6).

Usage:  python tools/witness_ledger.py [--window] [--propose]

Prints the never-witnessed names one per line (registry order), then a
summary.  ``--window`` validates the committed DRIVER_WINDOW against
``propose_window()``; ``--propose`` prints the proposed next window.

``propose_window()`` is the single deterministic rotation rule, covering
all three regimes the rounds move through:

1. **Backlog-saturated** (never-witnessed >= 50): every slot goes to the
   backlog in registry order, except declared CONTRACT_CHANGED entries,
   which share first claim (ADVICE r6-2 "red OR contract-changed").
2. **Transition** (0 < backlog < 50, first hit at r8): the whole backlog
   is windowed, then the free slots go to family representatives — the
   §2 families absent from the window's tags, ranked stalest-first
   (oldest freshest-witness round), one rep each (the family member with
   the oldest witness, registry order tie-break).  With fewer free slots
   than missing families, the stalest families win the slots; the rest
   wait for the post-drain regime where 50 slots are free.
3. **Post-drain** (backlog == 0, r9+): CONTRACT_CHANGED first, then one
   rep per required family missing from the window so far (stalest
   family first), then oldest-witness-first fill — never re-recording an
   entry witnessed in the latest round (that row is already fresh).
"""

from __future__ import annotations

import glob
import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_release_spark.queries import (  # noqa: E402
    CONTRACT_CHANGED,
    DRIVER_WINDOW,
    REGISTRY,
)

ROOT = Path(__file__).resolve().parent.parent

# One §2 subsection family per tag — kept in sync with
# tests/test_entry_contract.py's required set.
REQUIRED_FAMILIES = {
    "scan", "agg", "topk", "join", "outer", "window", "setop",
    "functions", "udtf", "ptf", "script",
    "streaming", "session_window",
    "dedup", "neardup", "similarity", "ann", "text", "multimodal",
    "sample", "tpch", "sketch",
}

WINDOW_SIZE = 50


def _round_of(path: str) -> int:
    return int(re.search(r"r(\d+)", Path(path).name).group(1))


def correctness_files() -> list[str]:
    """CORRECTNESS_r*.json paths sorted by parsed round number (a raw
    lexicographic sort would put r100 before r99 — ADVICE r7-4)."""
    return sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json")), key=_round_of)


def witness_rounds() -> dict[str, int]:
    """name -> latest round with a driver row (absent = never witnessed)."""
    rounds: dict[str, int] = {}
    for path in correctness_files():
        r = _round_of(path)
        with open(path) as f:
            for name in json.load(f):
                rounds[name] = max(r, rounds.get(name, 0))
    return rounds


def witnessed_names() -> set[str]:
    return set(witness_rounds())


def propose_window(
    contract_changed: list[str] | None = None,
    rounds: dict[str, int] | None = None,
) -> list[str]:
    """The deterministic next DRIVER_WINDOW (see module docstring).

    ``rounds`` (name -> latest witness round) defaults to the real
    ledger from CORRECTNESS_r*.json; tests inject synthetic ledgers to
    exercise the regimes (e.g. the post-drain branch before any round
    has actually drained)."""
    if contract_changed is None:
        contract_changed = list(CONTRACT_CHANGED)
    if rounds is None:
        rounds = witness_rounds()
    latest_round = max(rounds.values(), default=0)
    names = list(REGISTRY)
    order = {n: i for i, n in enumerate(names)}
    backlog = [n for n in names if n not in rounds]

    window: list[str] = [n for n in contract_changed if n in REGISTRY]
    for n in backlog:
        if len(window) >= WINDOW_SIZE:
            break
        if n not in window:
            window.append(n)
    if len(window) >= WINDOW_SIZE:
        return window[:WINDOW_SIZE]

    def family_members(fam: str) -> list[str]:
        return [n for n in names if fam in REGISTRY[n].tags]

    # stalest missing families first: rank by the family's freshest
    # driver witness (a family is only as fresh as its newest row)
    covered = {t for n in window for t in REGISTRY[n].tags}
    missing = sorted(
        (fam for fam in REQUIRED_FAMILIES - covered),
        key=lambda fam: (
            max((rounds.get(n, 0) for n in family_members(fam)), default=0),
            fam,
        ),
    )
    for fam in missing:
        if len(window) >= WINDOW_SIZE:
            break
        if fam in covered:
            # an earlier rep's secondary tags already covered this
            # family — don't waste a slot on a redundant rep
            continue
        members = sorted(
            (
                n for n in family_members(fam)
                if n not in window and rounds.get(n, 0) < latest_round
            ),
            key=lambda n: (rounds.get(n, 0), order[n]),
        )
        # a family whose every member is fresh in the latest round
        # simply skips this rotation — re-recording a fresh row
        # would waste the slot
        if members:
            window.append(members[0])
            covered |= set(REGISTRY[members[0]].tags)

    # oldest-witness-first fill (post-drain regime); skip rows already
    # fresh in the latest round — re-recording them wastes the slot
    fill = sorted(
        (
            n for n in names
            if n not in window and rounds.get(n, 0) < latest_round
        ),
        key=lambda n: (rounds.get(n, 0), order[n]),
    )
    for n in fill:
        if len(window) >= WINDOW_SIZE:
            break
        window.append(n)
    # an oversized CONTRACT_CHANGED list could overfill the window
    # before any slot budgeting runs — never emit more than 50
    return window[:WINDOW_SIZE]


def main() -> None:
    rounds = witness_rounds()
    never = [n for n in REGISTRY if n not in rounds]
    for n in never:
        print(n)
    print(
        f"-- registry {len(REGISTRY)}, witnessed"
        f" {len(set(rounds) & set(REGISTRY))}, never-witnessed {len(never)}",
        file=sys.stderr,
    )
    if "--propose" in sys.argv:
        print("-- proposed next window:", file=sys.stderr)
        for n in propose_window():
            print(f"  {n}", file=sys.stderr)
    if "--window" in sys.argv:
        missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
        assert not missing, f"window names not in registry: {missing}"
        assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)), "window dupes"
        proposed = propose_window()
        extra = sorted(set(DRIVER_WINDOW) - set(proposed))
        absent = sorted(set(proposed) - set(DRIVER_WINDOW))
        assert not extra and not absent, (
            "window deviates from the rotation rule —"
            f" unexpected {extra}, missing {absent}. If a new "
            "CORRECTNESS_r*.json just landed (even uncommitted in the "
            "working tree), this is the INTENDED rotation tripwire: "
            "rotate DRIVER_WINDOW to `--propose`'s output (ADVICE r8-5)"
        )
        print(f"-- window OK ({len(DRIVER_WINDOW)} slots)", file=sys.stderr)


if __name__ == "__main__":
    main()
