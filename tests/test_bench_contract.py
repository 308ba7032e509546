"""bench.py contract: every headline name resolves in the registry and
the set stays free of rows-only entries (a bench query must be one the
correctness gate also covers)."""

from __future__ import annotations


def test_headline_names_resolve_and_are_oracled():
    from bench import HEADLINE
    from hive_release_spark.queries import REGISTRY

    missing = [n for n in HEADLINE if n not in REGISTRY]
    assert not missing, missing
    unoracled = [n for n in HEADLINE if REGISTRY[n].oracle is None]
    assert not unoracled, unoracled
    assert len(set(HEADLINE)) == len(HEADLINE)


def test_final_summary_line_fits_driver_tail():
    """r5: the r4 detail line outgrew the driver's stdout-tail window
    (BENCH_r04 "parsed": null), so bench.py now prints a compact
    summary as the FINAL line. Pin its worst-case size well under a
    conservative tail budget so adding headline queries can't silently
    regrow it past the parser again."""
    import json

    from bench import HEADLINE

    worst = json.dumps(
        {
            "metric": "headline_queries_total_sec",
            "value": 9999.999,
            "unit": "sec",
            "queries": {n: 999.99 for n in HEADLINE},
            "sf": 0.1,
            "n_queries": len(HEADLINE),
            "rotating_total_sec": 9999.999,
            "n_rotating": 40,
            "skew": {"plain": 999.999, "salted": 999.999, "aqe": 999.999},
            "skew_max_rows": {
                "plain": 99999999, "salted": 99999999, "aqe": 99999999
            },
        },
        separators=(",", ":"),
    )
    assert len(worst) < 1600, len(worst)


def test_rotating_leg_names_resolve_disjoint_from_headline():
    from bench import HEADLINE, ROTATING_LEG
    from hive_release_spark.queries import REGISTRY

    missing = [n for n in ROTATING_LEG if n not in REGISTRY]
    assert not missing, missing
    assert len(set(ROTATING_LEG)) == len(ROTATING_LEG)
    overlap = set(ROTATING_LEG) & set(HEADLINE)
    assert not overlap, overlap
    assert 30 <= len(ROTATING_LEG) <= 50
