"""Local correctness harness mimicking the driver's t2 gate.

Runs every ``queries()`` entry at sf0.01 on Spark AND its ``oracle_sql()``
on DuckDB, then compares via hive_release_spark.testing. Queries without
an oracle get a rows-only smoke run.

Usage: python tools/check.py [name_substring ...]

The per-entry timings it prints double as a registry-wide performance
screen: run with SPARK_GRAFT_CHECK_SF=/root/testdata/sf0.1, sort the
[N.Ns] suffixes, and investigate outliers by splitting the Spark side
(fn().collect()) from the DuckDB side (con.execute(oracle)) — the r7
screen caught an interpreted-HOF signature stage and two recursive
oracles re-inlining their base CTE this way.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from hive_release_spark import testing  # noqa: E402

# Override with SPARK_GRAFT_CHECK_SF=/root/testdata/sf0.001 to sweep the
# whole gate at another scale (tiny-data edge cases, scale-consistency).
import os  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_CHECK_SF", "/root/testdata/sf0.01")


def main() -> int:
    patterns = sys.argv[1:]
    import __spark_entry__ as mod
    from hive_release_spark.session import get_session

    # SPARK_GRAFT_CHECK_PARITY=1 sweeps the gate under the Hive-parity
    # session (ANSI off, wrap-around int arithmetic) — every query must
    # pass under BOTH settings (the default mirrors the driver's ANSI-on
    # standalone session).
    # SPARK_GRAFT_CHECK_PARTITIONS sweeps the gate at another shuffle
    # partitioning (e.g. a prime like 13) — results must be identical
    # under ANY partitioning (the README determinism claim).
    # SPARK_GRAFT_CHECK_AQE=0 / SPARK_GRAFT_CHECK_CODEGEN=0 sweep the
    # gate with adaptive execution or whole-stage codegen disabled —
    # results must be invariant to the physical-execution strategy
    # (an AQE-off mismatch means a query leans on runtime re-planning
    # for CORRECTNESS; a codegen-off mismatch means the compiled and
    # interpreted expression paths disagree, a Spark-bug detector).
    extra = {"spark.ui.showConsoleProgress": "false"}
    if os.environ.get("SPARK_GRAFT_CHECK_AQE") == "0":
        extra["spark.sql.adaptive.enabled"] = "false"
    if os.environ.get("SPARK_GRAFT_CHECK_CODEGEN") == "0":
        extra["spark.sql.codegen.wholeStage"] = "false"
    spark = get_session(
        master="local[8]",
        shuffle_partitions=int(os.environ.get("SPARK_GRAFT_CHECK_PARTITIONS", "8")),
        hive_parity=os.environ.get("SPARK_GRAFT_CHECK_PARITY") == "1",
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")
    con = testing.duckdb_con(SF_DIR)

    qs = mod.queries()
    oracles = mod.oracle_sql()
    if patterns:
        qs = {k: v for k, v in qs.items() if any(p in k for p in patterns)}

    from hive_release_spark.operators.cache import pipeline_scope

    n_pass = n_fail = 0
    # each entry runs inside pipeline_scope (same rationale as
    # bench.py's r9 adoption): call-time persists are released before
    # the NEXT entry, so a 362-entry sweep neither accumulates executor
    # storage nor lets the CacheManager substitute an earlier entry's
    # live InMemoryRelation into a later entry's plan — the sweep
    # checks clean-session behavior, the thing the driver sees.
    for name, fn in qs.items():
        t0 = time.time()
        try:
            with pipeline_scope():
                if name not in oracles:
                    n = fn(spark, SF_DIR).count()
                    print(
                        f"ok   {name}: rows-only ({n} rows) "
                        f"[{time.time()-t0:.1f}s]"
                    )
                    n_pass += 1
                    continue
                ok, why = testing.compare_query(
                    spark, con, fn, oracles[name], SF_DIR
                )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: error: {type(e).__name__}: {str(e)[:300]}")
            n_fail += 1
            continue
        if ok:
            print(f"PASS {name} [{time.time()-t0:.1f}s]")
            n_pass += 1
        else:
            print(f"FAIL {name}: {why}")
            n_fail += 1

    print(f"\n{n_pass} pass, {n_fail} fail / {len(qs)} queries")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
