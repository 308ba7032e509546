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


class TestTightSketchAccuracy:
    """The tight empirical accuracy claims for the HLL-backed entries
    whose ORACLES now pin only a wide 6σ sanity bound (r5, ADVICE #4:
    an oracle column that bakes in '±2%' couples driver green to the
    sketch's default lgConfigK — a fixture or Spark-default change
    could flip it with no code defect). The accuracy property lives
    HERE instead: recompute estimate vs exact and assert the tight
    bound (2% per-window / 5%-of-union for inclusion-exclusion)."""

    def test_daily_distinct_sketch_within_2pct(self, spark):
        from hive_release_spark.catalog import load_table

        ev = load_table(spark, SF_ORACLE, "events")
        rows = (
            ev.groupBy(F.window("ts", "1 day"))
            .agg(
                F.countDistinct("user_id").alias("exact"),
                F.hll_sketch_estimate(
                    F.hll_sketch_agg("user_id")
                ).alias("est"),
            )
            .collect()
        )
        assert rows
        for r in rows:
            assert abs(r.est - r.exact) <= 0.02 * r.exact, (
                r["window"], r.exact, r.est,
            )

    def test_rolling_active_sketch_merge_within_2pct(self, spark):
        from hive_release_spark.catalog import load_table

        ev = load_table(spark, SF_ORACLE, "events").select(
            F.to_date("ts").alias("day"), "user_id"
        )
        daily = ev.groupBy("day").agg(
            F.hll_sketch_agg("user_id").alias("sk")
        )
        days = daily.select(F.col("day").alias("obs_day"))
        merged = (
            daily.select(
                F.explode(
                    F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
                ).alias("obs_day"),
                "sk",
            )
            .join(F.broadcast(days), "obs_day")
            .groupBy("obs_day")
            .agg(
                F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est")
            )
        )
        exact = (
            ev.distinct()
            .select(
                F.explode(
                    F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
                ).alias("obs_day"),
                "user_id",
            )
            .join(F.broadcast(days), "obs_day")
            .groupBy("obs_day")
            .agg(F.countDistinct("user_id").alias("exact"))
        )
        rows = exact.join(merged, "obs_day").collect()
        assert rows
        for r in rows:
            assert abs(r.est - r.exact) <= 0.02 * r.exact, (
                r.obs_day, r.exact, r.est,
            )

    def test_hll_intersect_estimate_within_5pct_of_union(self, spark):
        from hive_release_spark.catalog import load_table

        li = load_table(spark, SF_ORACLE, "lineitem")
        a = li.filter(F.col("l_returnflag") == "N")
        b = li.filter(F.col("l_returnflag") == "R")
        sk = (
            a.agg(F.hll_sketch_agg("l_partkey").alias("sk_a"))
            .crossJoin(b.agg(F.hll_sketch_agg("l_partkey").alias("sk_b")))
            .select(
                F.hll_sketch_estimate("sk_a").alias("est_a"),
                F.hll_sketch_estimate("sk_b").alias("est_b"),
                F.hll_sketch_estimate(
                    F.hll_union("sk_a", "sk_b")
                ).alias("est_u"),
            )
            .collect()[0]
        )
        exact = (
            a.select("l_partkey")
            .distinct()
            .join(b.select("l_partkey").distinct(), "l_partkey")
            .count()
        )
        est_i = sk.est_a + sk.est_b - sk.est_u
        assert abs(est_i - exact) <= 0.05 * sk.est_u, (exact, est_i, sk)


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
