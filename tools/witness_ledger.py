"""Driver-witness ledger: which registry entries have NO row in any
CORRECTNESS_r*.json yet (the driver records only the first 50
``queries()`` entries per round; ``DRIVER_WINDOW`` rotates to drain
this set — VERDICT r4 "Next round" #1/#4).

Usage:  python tools/witness_ledger.py [--window]

Prints the never-witnessed names one per line (registry order), then a
summary.  ``--window`` additionally checks that the current
DRIVER_WINDOW is exactly: (a) all in-registry, (b) drawn from the
never-witnessed set when that set is >= 50 (the rotation rule in
queries/__init__.py).
"""

from __future__ import annotations

import glob
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_release_spark.queries import (  # noqa: E402
    CONTRACT_CHANGED,
    DRIVER_WINDOW,
    REGISTRY,
)

ROOT = Path(__file__).resolve().parent.parent


def witnessed_names() -> set[str]:
    names: set[str] = set()
    for path in sorted(glob.glob(str(ROOT / "CORRECTNESS_r*.json"))):
        with open(path) as f:
            data = json.load(f)
        if isinstance(data, dict):
            names |= set(data.keys())
    return names


def main() -> None:
    seen = witnessed_names()
    never = [n for n in REGISTRY if n not in seen]
    for n in never:
        print(n)
    print(
        f"-- registry {len(REGISTRY)}, witnessed {len(seen & set(REGISTRY))},"
        f" never-witnessed {len(never)}",
        file=sys.stderr,
    )
    if "--window" in sys.argv:
        missing = [n for n in DRIVER_WINDOW if n not in REGISTRY]
        assert not missing, f"window names not in registry: {missing}"
        assert len(DRIVER_WINDOW) == len(set(DRIVER_WINDOW)), "window dupes"
        if len(never) >= 50:
            # ADVICE r6-2: contract-changed entries share first claim
            # with never-witnessed ones ("red OR contract-changed").
            outside = [
                n for n in DRIVER_WINDOW
                if n in seen and n not in CONTRACT_CHANGED
            ]
            assert not outside, (
                "never-witnessed backlog >= 50 but window wastes slots on "
                f"already-witnessed entries: {outside}"
            )
        print(f"-- window OK ({len(DRIVER_WINDOW)} slots)", file=sys.stderr)


if __name__ == "__main__":
    main()
