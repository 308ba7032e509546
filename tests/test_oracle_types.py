"""Oracle output-representation contract (VERDICT r3 "What's wrong" #3).

Both r3 driver-red rows were representation divergences the local
fetchall() gate could not see:

  * ``q12_shipmode_priority`` — an uncast integer ``sum()`` in the oracle
    returns DuckDB HUGEINT, which the driver's pandas canonicalizer
    renders float64 while Spark's side is int64: equal values, unequal
    hashes.
  * ``tokenize_word_ids`` — a raw ARRAY<INT> output column is unhashable
    under the driver's ``sort_values``-over-all-columns canonicalizer.

These tests pin BOTH classes out of every oracle, structurally:

  1. run every registered oracle against sf0.001 on DuckDB and assert no
     output column is HUGEINT / LIST / STRUCT / MAP typed;
  2. unit-test ``testing.driver_frames_match`` so the driver-mirror gate
     in ``testing.compare_query`` keeps catching both classes if a new
     query reintroduces them.

The full value-level sweep (Spark vs DuckDB, both gates) lives in
``tools/check.py``; this file is the fast footer-level pin.
"""

from __future__ import annotations

import pandas as pd
import pytest

from hive_release_spark import testing

SF_DIR = "/root/testdata/sf0.001"

_BANNED_TYPE_FRAGMENTS = ("HUGEINT", "[]", "STRUCT", "MAP(", "LIST")


def _oracles():
    import __spark_entry__ as mod

    return sorted(mod.oracle_sql().items())


@pytest.mark.parametrize("name,sql", _oracles(), ids=[n for n, _ in _oracles()])
def test_oracle_output_types_are_driver_canonicalizable(name, sql):
    con = testing.duckdb_con(SF_DIR)
    try:
        rel = con.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            for frag in _BANNED_TYPE_FRAGMENTS:
                assert frag not in t, (
                    f"{name}.{col} is {t}: the driver's pandas canonicalizer "
                    "renders HUGEINT as float64 (hash-mismatch vs Spark int64) "
                    "and cannot sort LIST/STRUCT cells — CAST or stringify it "
                    "in the oracle (and mirror in the Spark query)"
                )
    finally:
        con.close()


def test_driver_frames_match_flags_int_vs_float():
    """The q12 class: same values, int64 vs float64 — must fail."""
    a = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"k": ["a", "b"], "n": pd.array([1.0, 2.0], dtype="float64")})
    ok, why = testing.driver_frames_match(a, b)
    assert not ok and "dtype kind mismatch" in why


def test_driver_frames_match_flags_list_cells():
    """The tokenize_word_ids class: list-valued cells — must fail."""
    a = pd.DataFrame({"k": [1, 2], "ids": [[1, 2], [3]]})
    b = pd.DataFrame({"k": [1, 2], "ids": [[1, 2], [3]]})
    ok, why = testing.driver_frames_match(a, b)
    assert not ok and "unsortable" in why


def test_driver_frames_match_tolerates_int_width():
    """int32 vs int64 renders identically — must pass (r1-green queries
    like scan_filter_project mix widths)."""
    a = pd.DataFrame({"n": pd.array([1, 2], dtype="int64")})
    b = pd.DataFrame({"n": pd.array([1, 2], dtype="int32")})
    ok, why = testing.driver_frames_match(a, b)
    assert ok, why


def test_driver_frames_match_hugeint_end_to_end():
    """DuckDB's uncast integer sum() really does come back HUGEINT →
    float64 in pandas, and the gate really does catch it."""
    import duckdb

    con = duckdb.connect()
    try:
        rel = con.sql("SELECT sum(CASE WHEN i % 2 = 0 THEN 1 ELSE 0 END) AS n FROM range(10) t(i)")
        assert "HUGEINT" in str(rel.types[0]).upper()
        dpd = rel.df()
        spd = pd.DataFrame({"n": pd.array([5], dtype="int64")})
        ok, why = testing.driver_frames_match(spd, dpd)
        assert not ok and "dtype kind mismatch" in why
    finally:
        con.close()


def test_rows_only_window_entries_are_driver_canonicalizable(spark):
    """Rows-only entries have no oracle to catch a representation
    problem, and we cannot assume the driver's rows-only path skips
    pandas canonicalization — so their OUTPUT columns must also be
    scalar (no ARRAY/STRUCT/MAP), same rule as oracle outputs. r5: the
    check covers EVERY rows-only entry in the registry, not just the
    current DRIVER_WINDOW — the r5 window is 100% oracle-gated (the
    never-witnessed backlog saturates it), and any rows-only entry is
    a future window's candidate."""
    from hive_release_spark.queries import REGISTRY

    rows_only = [n for n, q in REGISTRY.items() if q.oracle is None]
    assert rows_only, "registry unexpectedly has no rows-only entries"
    for name in rows_only:
        df = REGISTRY[name].fn(spark, SF_DIR)
        bad = [c for c, t in df.dtypes if any(x in t for x in ("array", "struct", "map"))]
        assert not bad, f"{name} outputs complex-typed columns {bad}"
