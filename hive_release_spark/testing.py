"""Shared oracle-comparison helpers (used by tools/check.py and tests/).

Mirrors the driver's t2 gate: column-name set, row count, and
order-insensitive exact values (floats must be exactly equal — rounding
discipline is the query author's job, see queries/registry.py).
"""

from __future__ import annotations

import datetime as dt
import math
from decimal import Decimal

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def canon(v):
    if v is None:
        return None
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(canon(x) for x in v)
    return v


def sort_key(row):
    return tuple((x is None, str(type(x).__name__), x if x is not None else 0) for x in row)


def rows_match(a, b) -> tuple[bool, str]:
    if len(a) != len(b):
        return False, f"row count {len(a)} vs {len(b)}"
    for i, (ra, rb) in enumerate(zip(a, b)):
        for j, (va, vb) in enumerate(zip(ra, rb)):
            if va is None and vb is None:
                continue
            if isinstance(va, float) and isinstance(vb, float):
                if va == vb:
                    continue
                if math.isclose(va, vb, rel_tol=1e-9, abs_tol=1e-9):
                    return False, f"float mismatch row {i} col {j}: {va!r} vs {vb!r} (close)"
                return False, f"value mismatch row {i} col {j}: {va!r} vs {vb!r}"
            if va != vb:
                return False, f"value mismatch row {i} col {j}: {va!r} vs {vb!r}"
    return True, ""


def compare_query(spark, con, fn, oracle: str, sf_dir: str) -> tuple[bool, str]:
    """Run one (spark_fn, oracle_sql) pair and compare. Returns (ok, why).

    Two gates, both must pass:

    1. the exact fetchall() gate (Python-native values, strictest value
       semantics — Decimal/float exactness, list round-trips);
    2. the DRIVER-MIRROR gate: both sides fetched as pandas frames
       (DuckDB via ``.df()``, like the driver), columns sorted by name,
       rows ``sort_values``-sorted over all columns, then compared with
       representation sensitivity (dtype KIND must agree — the driver's
       value hash distinguishes int64 1 from float64 1.0, the whole r3
       ``q12_shipmode_priority`` failure; list/struct-valued cells make
       ``sort_values`` raise, the r3 ``tokenize_word_ids`` failure).

    Gate 2 exists so that local green IMPLIES driver green: any oracle
    whose uncast integer ``sum()`` comes back HUGEINT (pandas float64),
    or whose output carries a raw ARRAY/STRUCT column, fails HERE first.
    """
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    collected = sdf.collect()
    srows = [tuple(canon(r[c]) for c in scols) for r in collected]
    srows.sort(key=sort_key)
    cur = con.execute(oracle)
    dcols_raw = [d[0] for d in cur.description]
    drows_raw = cur.fetchall()
    dorder = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
    dcols = sorted(dcols_raw)
    if scols != dcols:
        return False, f"schema {scols} vs {dcols}"
    drows = [tuple(canon(r[i]) for i in dorder) for r in drows_raw]
    drows.sort(key=sort_key)
    ok, why = rows_match(srows, drows)
    if not ok:
        return ok, why
    # Gate 2: driver-mirror pandas comparison.
    import pandas as pd

    spd = pd.DataFrame.from_records(
        [tuple(r[c] for c in scols) for r in collected], columns=scols
    )
    # Re-infer dtypes the way a driver-side Arrow/JDBC collect would:
    # from_records leaves int columns int64, floats float64, strings object.
    dpd = con.execute(oracle).df()
    return driver_frames_match(spd, dpd)


_KIND_GROUP = {
    "i": "int",
    "u": "int",
    "b": "bool",
    "f": "float",
    "M": "datetime",
    "m": "timedelta",
    "O": "object",
}


def _pd_canon(df):
    """Mirror the driver's canonicalizer: columns sorted by name, rows
    sorted over ALL columns (``sort_values`` — raises TypeError on
    unhashable list/dict cells exactly like the driver did in r3)."""
    df = df[sorted(df.columns)].copy()
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(
            drop=True
        )
    return df


def driver_frames_match(spd, dpd) -> tuple[bool, str]:
    """Compare two pandas frames the way the driver's hash gate would.

    Representation-sensitive on numeric KIND (int vs float vs bool) and
    intolerant of unhashable cells; normalizes only what the driver's
    green history proves it tolerates (datetime64 resolution ns/us,
    date objects vs datetime64 midnight)."""
    import numpy as np
    import pandas as pd

    if sorted(spd.columns) != sorted(dpd.columns):
        return False, f"driver-canon schema {sorted(spd.columns)} vs {sorted(dpd.columns)}"
    try:
        spd = _pd_canon(spd)
    except TypeError as e:
        return False, f"driver-canon unsortable Spark column (raw ARRAY/STRUCT?): {e}"
    try:
        dpd = _pd_canon(dpd)
    except TypeError as e:
        return False, f"driver-canon unsortable oracle column (raw LIST/STRUCT?): {e}"
    if len(spd) != len(dpd):
        return False, f"driver-canon rows {len(spd)} vs {len(dpd)}"
    if len(spd) == 0:
        # No rows → from_records leaves every column object-typed; dtype
        # comparison is meaningless (and the driver's hash of an empty
        # frame is dtype-free in practice).
        return True, ""
    for c in spd.columns:
        a, b = spd[c], dpd[c]
        ka = _KIND_GROUP.get(a.dtype.kind, a.dtype.kind)
        kb = _KIND_GROUP.get(b.dtype.kind, b.dtype.kind)
        # date objects (Spark DateType collects as datetime.date in an
        # object column) vs DuckDB's datetime64 DATE: normalize both to
        # ISO date strings when either side is date-like objects.
        if "object" in (ka, kb) and {ka, kb} != {"object"}:
            for i, (va, vb) in enumerate(zip(a, b)):
                ia, ib = _date_like_iso(va), _date_like_iso(vb)
                if ia != ib:
                    return False, f"driver-canon value mismatch col {c} row {i}: {va!r} vs {vb!r}"
            continue
        if ka != kb:
            return (
                False,
                f"driver-canon dtype kind mismatch col {c}: {a.dtype} vs {b.dtype}"
                " (HUGEINT sum? cast the oracle)",
            )
        if ka == "float":
            an, bn = a.to_numpy(dtype="float64"), b.to_numpy(dtype="float64")
            same = (an == bn) | (np.isnan(an) & np.isnan(bn))
            if not same.all():
                i = int(np.argmin(same))
                return False, f"driver-canon float mismatch col {c} row {i}: {an[i]!r} vs {bn[i]!r}"
        elif ka == "datetime":
            av, bv = pd.to_datetime(a), pd.to_datetime(b)
            if av.dt.tz is not None:
                av = av.dt.tz_localize(None)
            if bv.dt.tz is not None:
                bv = bv.dt.tz_localize(None)
            av = av.astype("datetime64[ns]").reset_index(drop=True)
            bv = bv.astype("datetime64[ns]").reset_index(drop=True)
            if not av.equals(bv):
                return False, f"driver-canon datetime mismatch col {c}"
        elif ka == "object":
            # in an OBJECT column a float NaN is pandas notation for a
            # missing value in a non-float column (e.g. DuckDB's .df()
            # renders a NULL BOOLEAN as NaN while Spark's collect gives
            # None) — but ONLY when the column genuinely holds no float
            # data.  Normalize NaN -> None per SIDE, and only on a side
            # whose non-null values contain no real float: a mixed-type
            # object column with genuine floats keeps NaN distinct from
            # NULL so a true NaN-vs-NULL divergence still fails here
            # (gate 1's fetchall comparison already distinguishes them;
            # this keeps gate 2 equally honest).
            def _all_non_float(col):
                return not any(
                    isinstance(v, float) and not math.isnan(v) for v in col
                )

            norm_a, norm_b = _all_non_float(a), _all_non_float(b)
            for i, (va, vb) in enumerate(zip(a, b)):
                if isinstance(va, (list, dict, set, np.ndarray)) or isinstance(
                    vb, (list, dict, set, np.ndarray)
                ):
                    return False, f"driver-canon unhashable cell col {c} row {i}"
                if norm_a and isinstance(va, float) and math.isnan(va):
                    va = None
                if norm_b and isinstance(vb, float) and math.isnan(vb):
                    vb = None
                # NaT is unambiguous pandas missing-notation for a
                # datetime cell (there is no "genuine NaT" distinct
                # from SQL NULL in either engine's results) — seen when
                # an ALL-NULL timestamp column comes back object-dtyped
                # on one side (r10 all-NULL axis); normalize both sides
                if va is pd.NaT:
                    va = None
                if vb is pd.NaT:
                    vb = None
                if canon(va) != canon(vb):
                    return False, f"driver-canon value mismatch col {c} row {i}: {va!r} vs {vb!r}"
        else:
            # int/bool: value comparison only — width (int32 vs int64) is
            # driver-tolerated (values render identically); kind is not.
            an, bn = a.to_numpy(), b.to_numpy()
            same = an == bn
            if not same.all():
                i = int(same.argmin())
                return False, f"driver-canon value mismatch col {c} row {i}: {an[i]!r} vs {bn[i]!r}"
    return True, ""


def _date_like_iso(v):
    """ISO-string a date/datetime-ish value for cross-dtype comparison."""
    import pandas as pd

    if v is None or (isinstance(v, float) and math.isnan(v)) or v is pd.NaT:
        return None
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    if isinstance(v, dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, dt.date):
        return dt.datetime(v.year, v.month, v.day).isoformat()
    return str(v)
