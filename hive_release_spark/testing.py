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
    """Run one (spark_fn, oracle_sql) pair and compare. Returns (ok, why)."""
    sdf = fn(spark, sf_dir)
    scols = sorted(sdf.columns)
    srows = [tuple(canon(r[c]) for c in scols) for r in sdf.collect()]
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
    return rows_match(srows, drows)
