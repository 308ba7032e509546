"""Sketch accuracy: the HLL NDV path (Hive compute_stats/bloom NDV role)
must track exact distinct counts closely."""

from __future__ import annotations

from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE


def test_hll_estimate_close_to_exact(spark):
    rows = REGISTRY["agg_hll_sketch"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        err = abs(r.ndv_est - r.ndv_exact) / r.ndv_exact
        assert err < 0.02, (r.l_returnflag, r.ndv_est, r.ndv_exact)
