"""Doc-rot guard: every query name COVERAGE.md claims must exist in the
registry, and every registry entry must be claimed somewhere in
COVERAGE.md — the judge-facing map stays truthful."""

from __future__ import annotations

import re
from pathlib import Path

from hive_release_spark.queries import REGISTRY

COVERAGE = Path(__file__).resolve().parent.parent / "COVERAGE.md"


def _claimed_names() -> set[str]:
    text = COVERAGE.read_text()
    ticked = set(re.findall(r"`([a-z0-9_]+)`", text))
    return {t for t in ticked if t in REGISTRY or "_" in t}


def test_claimed_queries_exist():
    text = COVERAGE.read_text()
    # names written as Q `name` must be real registry entries
    q_refs = set(re.findall(r"Q `([a-z0-9_]+)`", text))
    missing = q_refs - set(REGISTRY)
    assert not missing, f"COVERAGE.md claims nonexistent queries: {missing}"


def test_registry_entries_are_documented():
    text = COVERAGE.read_text()
    undocumented = {name for name in REGISTRY if f"`{name}`" not in text}
    assert not undocumented, f"registry entries missing from COVERAGE.md: {undocumented}"
