"""Sketch accuracy: the HLL NDV path (Hive compute_stats/bloom NDV role)
must track exact distinct counts closely."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_ORACLE


def test_hll_estimate_close_to_exact(spark):
    """The query now emits the error bound AS oracle-pinned booleans
    (r3 conversion); assert they hold and the exact NDV is sane."""
    rows = REGISTRY["agg_hll_sketch"].fn(spark, SF_ORACLE).collect()
    assert rows
    for r in rows:
        assert r.hll_within_2pct, (r.l_returnflag, r.ndv_exact)
        assert r.hllpp_within_5pct, (r.l_returnflag, r.ndv_exact)
        assert r.ndv_exact > 0


class TestBloomFilter:
    """bloom_filter_build / in_bloom_filter: exact contract of an
    approximate structure — zero false negatives, bounded false positives,
    deterministic across builds."""

    def test_no_false_negatives_and_fpp_bound(self, spark):
        from hive_release_spark.functions.hive import bloom_filter_build, in_bloom_filter

        present = spark.range(0, 1000).select(F.col("id").alias("x"))
        absent = spark.range(50_000, 51_000).select(F.col("id").alias("x"))
        bf = bloom_filter_build(present, "x", expected_entries=1000, fpp=0.03)

        hits = present.select(in_bloom_filter(F.col("x"), bf).alias("h"))
        assert hits.filter(~F.col("h")).count() == 0  # never a false negative

        fp = absent.select(in_bloom_filter(F.col("x"), bf).alias("h")).filter("h").count()
        assert fp / 1000 < 0.03 * 3, f"false-positive rate {fp/1000} way over fpp"

    def test_deterministic_build(self, spark):
        from hive_release_spark.functions.hive import bloom_filter_build

        df = spark.range(0, 500).select(F.col("id").alias("x"))
        a = bloom_filter_build(df, "x", expected_entries=500)
        b = bloom_filter_build(df, "x", expected_entries=500)
        assert a == b

    def test_bloom_filter_scalar_stub_redirects(self):
        import pytest

        from hive_release_spark.functions import FUNCTION_REGISTRY

        with pytest.raises(NotImplementedError, match="bloom_filter_build"):
            FUNCTION_REGISTRY["bloom_filter"]("x", 100)


def test_percentile_approx_tracks_exact(spark):
    """percentile_approx (Hive GenericUDAFPercentileApprox → Spark
    same-name sketch) must stay within 1% relative error of the exact
    percentile on the lineitem price column."""
    from hive_release_spark.catalog import load_table
    from tests.conftest import SF_ORACLE

    li = load_table(spark, SF_ORACLE, "lineitem")
    r = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.percentile_approx("l_extendedprice", 0.5, 10000).alias("approx"),
    ).collect()[0]
    assert abs(r.approx - r.exact) / r.exact < 0.01
