"""The golden-result gate: every registered query vs its DuckDB oracle at
sf0.001 (the driver re-runs the same comparison at sf0.01). Analogue of
Hive's clientpositive golden-file corpus (SURVEY.md §5.1) with computed
rather than stored goldens."""

from __future__ import annotations

import pytest

from hive_release_spark import testing
from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

ALL = sorted(REGISTRY)


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, oracle_con, name):
    q = REGISTRY[name]
    if q.oracle is None:
        # rows-only contract: must run and return a well-formed result
        df = q.fn(spark, SF_SMOKE)
        assert df.columns, name
        assert df.count() >= 0
        return
    ok, why = testing.compare_query(spark, oracle_con, q.fn, q.oracle, SF_SMOKE)
    assert ok, f"{name}: {why}"
