"""Driver-contract smoke: __spark_entry__ loaded standalone (the way the
driver does) must expose entry/queries/oracle_sql consistently."""

from __future__ import annotations

import importlib.util
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _load():
    spec = importlib.util.spec_from_file_location(
        "__spark_entry__", str(REPO / "__spark_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_entry_returns_rows_with_stable_schema(spark):
    mod = _load()
    df = mod.entry(spark)
    assert df.columns == [
        "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price",
        "sum_disc_price", "sum_charge", "avg_qty", "avg_price",
        "avg_disc", "count_order",
    ]
    assert len(df.collect()) > 0


def test_oracle_keys_subset_of_queries(spark):
    mod = _load()
    qs, osql = mod.queries(), mod.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 90
    # every callable takes (spark, sf_dir)
    import inspect

    for fn in qs.values():
        assert len(inspect.signature(fn).parameters) == 2

def test_driver_window_spans_every_survey_family():
    """The driver records only the first 50 queries() entries; pin the
    window invariants. Family coverage (VERDICT r01 next-round #1) is
    required only while slots are free: when the never-driver-witnessed
    backlog is >= 50, the r4 verdict's rotation rule takes precedence —
    EVERY slot goes to the backlog (a family whose members are all
    already witnessed keeps its latest driver row as authoritative) and
    a family-rep slot would just delay draining the ledger.

    ADVICE r6-2 extension: an already-witnessed entry whose CONTRACT
    changed since its last driver row (declared in CONTRACT_CHANGED)
    shares first claim with the backlog — "red OR contract-changed" —
    so the r4/r5 'contract changed, witness first' discipline holds
    even while the backlog saturates the window."""
    from hive_release_spark.queries import (
        CONTRACT_CHANGED,
        DRIVER_WINDOW,
        REGISTRY,
        queries,
    )
    from tools.witness_ledger import witnessed_names

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    assert set(DRIVER_WINDOW) <= set(REGISTRY)
    assert list(queries())[:50] == DRIVER_WINDOW
    # contract-changed declarations must themselves be windowed —
    # declaring one and not witnessing it would defeat the rule
    assert set(CONTRACT_CHANGED) <= set(DRIVER_WINDOW)

    # ... and must EXPIRE once witnessed (ADVICE r7-3): when the
    # latest CORRECTNESS file already records an entry, its declared
    # contract change has been driver-witnessed — a stale declaration
    # would let future windows waste slots while the backlog waits.
    # This goes red the moment the driver lands the next CORRECTNESS
    # file, forcing the list to be cleared (or repopulated with that
    # round's own changes) at rotation time — same forcing-function
    # pattern as the window-rotation tripwire above.
    import glob
    import json
    from pathlib import Path

    latest = sorted(glob.glob(str(REPO / "CORRECTNESS_r*.json")))[-1]
    with open(latest) as f:
        latest_names = set(json.load(f))
    stale = [n for n in CONTRACT_CHANGED if n in latest_names]
    assert not stale, (
        f"CONTRACT_CHANGED entries already witnessed in {Path(latest).name} "
        f"— clear them at rotation: {stale}"
    )

    seen = witnessed_names()
    never = [n for n in REGISTRY if n not in seen]
    if len(never) >= 50:
        # backlog saturates the window: no slot may be wasted on an
        # already-witnessed entry unless its contract changed
        wasted = [
            n for n in DRIVER_WINDOW
            if n in seen and n not in CONTRACT_CHANGED
        ]
        assert not wasted, f"backlog >= 50 but window re-records: {wasted}"
    else:
        window_tags = {t for n in DRIVER_WINDOW for t in REGISTRY[n].tags}
        # one representative per §2 subsection family
        required = {
            "scan", "agg", "topk", "join", "outer", "window", "setop",
            "functions", "udtf", "ptf", "script",
            "streaming", "session_window",
            "dedup", "neardup", "similarity", "ann", "text", "multimodal",
            "sample", "tpch", "sketch",
        }
        missing = required - window_tags
        assert not missing, f"driver window misses families: {missing}"

    # the window should be dominated by oracle-gated queries
    oracled = sum(1 for n in DRIVER_WINDOW if REGISTRY[n].oracle is not None)
    assert oracled >= 42
