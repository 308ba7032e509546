"""Local correctness harness mimicking the driver's t2 gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB, then compares: column-name set, row count, and order-insensitive
values (floats to 1e-9 relative). Queries without an oracle get a
rows-only smoke run.

Usage: python tools/check.py [name_substring ...]
"""

from __future__ import annotations

import datetime as dt
import math
import sys
import time
from decimal import Decimal
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb  # noqa: E402

SF_DIR = "/root/testdata/sf0.01"
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings".split()
)


def _canon(v):
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
        return tuple(_canon(x) for x in v)
    return v


def _rows_match(a, b) -> tuple[bool, str]:
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
                    # close but not equal → would FAIL an exact hash
                    return False, f"float mismatch row {i} col {j}: {va!r} vs {vb!r} (close)"
                return False, f"value mismatch row {i} col {j}: {va!r} vs {vb!r}"
            if va != vb:
                return False, f"value mismatch row {i} col {j}: {va!r} vs {vb!r}"
    return True, ""


def _sort_key(row):
    return tuple((x is None, str(type(x).__name__), x if x is not None else 0) for x in row)


def main() -> int:
    patterns = sys.argv[1:]
    import __spark_entry__ as mod
    from hive_release_spark.session import get_session

    spark = get_session(master="local[8]", shuffle_partitions=8, hive_parity=False)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = mod.queries()
    oracles = mod.oracle_sql()
    if patterns:
        qs = {k: v for k, v in qs.items() if any(p in k for p in patterns)}

    n_pass = n_fail = 0
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            scols = sorted(sdf.columns)
            srows = [tuple(_canon(r[c]) for c in scols) for r in sdf.collect()]
            srows.sort(key=_sort_key)
        except Exception as e:
            print(f"FAIL {name}: spark error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
            continue
        try:
            cur = con.execute(oracles[name])
            dcols_raw = [d[0] for d in cur.description]
            drows_raw = cur.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        dorder = sorted(range(len(dcols_raw)), key=lambda i: dcols_raw[i])
        dcols = sorted(dcols_raw)
        if scols != dcols:
            print(f"FAIL {name}: schema {scols} vs {dcols}")
            n_fail += 1
            continue
        drows = [tuple(_canon(r[i]) for i in dorder) for r in drows_raw]
        drows.sort(key=_sort_key)
        ok, why = _rows_match(srows, drows)
        if ok:
            print(f"PASS {name} ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {why}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail / {len(qs)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
