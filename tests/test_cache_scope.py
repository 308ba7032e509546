"""pipeline_scope (operators/cache.py, VERDICT r7 #5): call-time
persists issued by registry operators are released at scope exit,
without touching caches created outside the scope."""

from __future__ import annotations

from conftest import SF_SMOKE

from hive_release_spark.operators.cache import pipeline_scope


def _cache_manager(spark):
    return spark._jsparkSession.sharedState().cacheManager()


def _storage_rdd_count(spark) -> int:
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def test_scoped_run_leaves_cache_empty(spark):
    """The VERDICT-named contract: running cache-using registry
    entries inside the scope leaves both the CacheManager (plan
    substitution) and executor storage (memory) empty on exit."""
    from hive_release_spark.queries import REGISTRY

    spark.catalog.clearCache()
    assert _cache_manager(spark).isEmpty()

    with pipeline_scope() as tracked:
        # both entries persist shared frames at CALL time (graph edge
        # list / minhash signature base) and return lazy results
        rows = REGISTRY["graph_adamic_adar"].fn(spark, SF_SMOKE).collect()
        assert rows
        rows = REGISTRY["dedup_minhash_lsh"].fn(spark, SF_SMOKE).collect()
        assert rows is not None
        assert tracked, "expected call-time persists to be tracked"
        assert not _cache_manager(spark).isEmpty()

    assert _cache_manager(spark).isEmpty()
    assert _storage_rdd_count(spark) == 0


def test_outside_caches_survive_the_scope(spark):
    """Unlike spark.catalog.clearCache(), the scope releases ONLY what
    was persisted inside it."""
    spark.catalog.clearCache()
    outside = spark.range(100).persist()
    outside.count()
    try:
        with pipeline_scope():
            inside = spark.range(50).persist()
            assert inside.count() == 50
        assert outside.storageLevel.useMemory, "outside cache was released"
        assert inside.storageLevel.useMemory is False
    finally:
        outside.unpersist(blocking=True)
    assert _cache_manager(spark).isEmpty()


def test_persist_methods_restored_after_exception(spark):
    from pyspark.sql import DataFrame

    orig_persist = DataFrame.persist
    orig_cache = DataFrame.cache
    leaked = spark.range(10)
    try:
        with pipeline_scope():
            leaked = leaked.persist()
            leaked.count()
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert DataFrame.persist is orig_persist
    assert DataFrame.cache is orig_cache
    # the failed pipeline's cache was still released
    assert leaked.storageLevel.useMemory is False


def test_unpersist_inside_scope_is_fine(spark):
    with pipeline_scope():
        df = spark.range(20).persist()
        df.count()
        df.unpersist(blocking=True)
    # exit-time second unpersist is a no-op, no error
    assert _storage_rdd_count(spark) == 0
