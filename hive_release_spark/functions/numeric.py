"""Numeric robustness helpers (r10 NaN/Inf axis).

A 100 TB corpus carries IEEE specials (NaN, +/-Inf) from upstream
division and sensor noise. Cross-engine exact statistics are only
DEFINED over finite values — Spark and DuckDB diverge on specials in
percentiles (DuckDB's quantile_cont/disc interpolate through them
non-obviously), DuckDB's variance family refuses Inf outright, and the
engines render specials differently as strings ('NaN'/'Infinity' in
Spark and Hive vs 'nan'/'inf' in DuckDB).

The adjudicated contract (tests/test_empty_input.py §nan-axis):
statistics aggregate over FINITE measurements; a non-finite value is
treated exactly like SQL NULL inside the aggregate argument — ignored
by the aggregate, without disturbing row counts or genuine NULL
semantics. ``finite(c)`` is the Spark side of that device; its DuckDB
oracle twin is ``CASE WHEN isfinite(x) THEN x END``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite(c: Column | str) -> Column:
    """``c`` when finite, else NULL.

    NULL in -> NULL out (the ``when`` condition is NULL for NULL
    input), so wrapping an aggregate argument changes nothing for
    NULL-bearing data — only NaN/Inf rows stop poisoning the
    aggregate. Oracle twin: ``CASE WHEN isfinite(x) THEN x END``.
    """
    c = F.col(c) if isinstance(c, str) else c
    return F.when(~F.isnan(c) & (F.abs(c) != F.lit(_INF)), c)


# DuckDB renders double specials as 'nan'/'inf'/'-inf'; Hive (and
# Spark) render Java's 'NaN'/'Infinity'/'-Infinity'. Oracles that cast
# doubles to strings wrap the cast in this to pin the HIVE rendering.
# Safe textually: no finite double's decimal rendering contains the
# substring 'inf' or 'nan'.
HIVE_RENDER_SQL = (
    "replace(replace(CAST({x} AS VARCHAR), 'inf', 'Infinity'), "
    "'nan', 'NaN')"
)


def hive_render(x: str) -> str:
    """DuckDB SQL fragment rendering double expression ``x`` as Hive
    would ('NaN'/'Infinity'/'-Infinity')."""
    return HIVE_RENDER_SQL.format(x=x)
