"""Registry-wide physical-plan anti-pattern sweep.

Every registry entry's plan at sf0.001 is scanned for the two
operators that mark a does-not-scale query:

- ``CartesianProduct`` — an un-broadcast cross join; O(n*m) row pairs
  with no pruning. The repo's cross-join entries ride
  BroadcastNestedLoopJoin (tiny side broadcast) instead; the one
  entry whose SEMANTICS are a cross join (join_cross) is allowlisted
  for the day Catalyst's size estimates tip it over — everything else
  appearing here is a bug.
- ``BatchEvalPython`` — a row-at-a-time (non-Arrow) Python UDF, the
  10-100x slow path. The package's Python escape hatches are all
  Arrow-batched (pandas_udf / mapInPandas / applyInPandas, which plan
  as ArrowEvalPython / MapInPandas / FlatMapGroupsInPandas);
  udtf_python is the deliberate Python-UDTF extension-surface demo
  (Spark 4 plans UDTFs as BatchEvalPythonUDTF — there is no Arrow
  UDTF mode) and is the only allowed hit.

The per-entry plan/property tests pin the POSITIVE shapes (broadcasts,
pushdowns, partial aggs); this sweep pins the repo-wide NEGATIVE
guarantee the scale story rests on, so a regression in ANY of the 361
entries — including ones no targeted plan test covers — fails loudly.
Building 361 plans costs ~2 min (a handful of entries run driver-loop
jobs at plan-build time); that is the price of the blanket guarantee.
"""

from __future__ import annotations

from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

# entry -> patterns it is allowed to contain, with the reason above
ALLOWED = {
    "udtf_python": {"BatchEvalPython"},   # deliberate Python-UDTF surface
    "join_cross": {"CartesianProduct"},   # semantically a cross join
}

PATTERNS = ("CartesianProduct", "BatchEvalPython")


def test_no_cartesian_or_rowwise_python_anywhere(spark):
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple"
    )
    violations: dict[str, list[str]] = {}
    for name, q in REGISTRY.items():
        plan = q.fn(spark, SF_SMOKE)._jdf.queryExecution().explainString(mode)
        hits = [
            p for p in PATTERNS
            if p in plan and p not in ALLOWED.get(name, set())
        ]
        if hits:
            violations[name] = hits
    assert not violations, (
        "plan anti-patterns found (un-broadcast cross join or "
        f"row-at-a-time Python UDF): {violations}"
    )
