"""DDL passthrough (SURVEY.md §2.J): databases, CTAS, external +
partitioned tables, MSCK, ANALYZE→CBO stats, views, SHOW/DESCRIBE/
TRUNCATE."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from hive_release_spark import ddl


@pytest.fixture()
def db(spark):
    name = "hrs_test_db"
    ddl.create_database(spark, name)
    yield name
    ddl.drop_database(spark, name)


def test_ctas_describe_truncate(spark, db):
    ddl.create_table_as(
        spark, f"{db}.t1", "SELECT id, id * 2 AS dbl FROM range(10)"
    )
    assert spark.table(f"{db}.t1").count() == 10
    cols = {r.col_name for r in ddl.describe(spark, f"{db}.t1").collect()}
    assert {"id", "dbl"} <= cols
    ddl.truncate(spark, f"{db}.t1")
    assert spark.table(f"{db}.t1").count() == 0


def test_external_table(spark, db, tmp_path):
    p = str(tmp_path / "ext")
    spark.range(5).write.parquet(p)
    ddl.create_external_table(spark, f"{db}.ext", p)
    assert spark.table(f"{db}.ext").count() == 5


def test_msck_repair_discovers_partitions(spark, db, tmp_path):
    p = str(tmp_path / "part_tbl")
    spark.range(4).withColumn("ds", F.lit("a")).write.partitionBy("ds").parquet(p)
    spark.sql(
        f"CREATE TABLE {db}.pt (id BIGINT) USING parquet PARTITIONED BY (ds STRING) LOCATION '{p}'"
    )
    # new partition written outside the catalog
    spark.range(3).withColumn("ds", F.lit("b")).write.mode("append").partitionBy(
        "ds"
    ).parquet(p)
    ddl.msck_repair(spark, f"{db}.pt")
    got = {r.ds for r in spark.table(f"{db}.pt").select("ds").distinct().collect()}
    assert got == {"a", "b"}


def test_analyze_feeds_cbo_stats(spark, db):
    ddl.create_table_as(spark, f"{db}.stats_t", "SELECT id FROM range(100)")
    ddl.analyze(spark, f"{db}.stats_t", ["id"])
    desc = ddl.describe(spark, f"{db}.stats_t").collect()
    txt = "\n".join(f"{r.col_name} {r.data_type}" for r in desc)
    assert "Statistics" in txt  # table-level stats recorded


def test_views_and_show(spark, db):
    ddl.create_view(spark, f"{db}.v1", "SELECT 1 AS one")
    assert spark.table(f"{db}.v1").collect()[0].one == 1
    tables = {r.tableName for r in ddl.show_tables(spark, db).collect()}
    assert "v1" in tables


def test_explain_passthrough(spark):
    plan = ddl.explain(spark, "SELECT id FROM range(10) WHERE id > 5")
    assert "Range" in plan


def test_materialized_view_create_and_refresh(spark, tmp_path):
    """Hive 2.3 MV semantics: materialized at creation, stale until an
    explicit REBUILD re-runs the stored definition."""
    from hive_release_spark import ddl

    spark.sql("CREATE DATABASE IF NOT EXISTS mv_db")
    try:
        src = str(tmp_path / "src")
        spark.range(0, 10).write.parquet(src)
        ddl.create_external_table(spark, "mv_db.src_t", src)
        ddl.create_materialized_view(
            spark, "mv_db.mv_sum", "SELECT count(*) AS n FROM mv_db.src_t"
        )
        assert spark.table("mv_db.mv_sum").collect()[0].n == 10

        spark.range(100, 105).write.mode("append").parquet(src)
        spark.sql("REFRESH TABLE mv_db.src_t")
        # stale until refreshed — the 2.3 contract (no auto maintenance)
        assert spark.table("mv_db.mv_sum").collect()[0].n == 10
        ddl.refresh_materialized_view(spark, "mv_db.mv_sum")
        assert spark.table("mv_db.mv_sum").collect()[0].n == 15
    finally:
        spark.sql("DROP DATABASE IF EXISTS mv_db CASCADE")


def test_alter_table_add_columns_and_rename(spark, tmp_path):
    from hive_release_spark import ddl

    spark.sql("CREATE DATABASE IF NOT EXISTS alter_db")
    try:
        ddl.create_table_as(spark, "alter_db.t1", "SELECT 1 AS a")
        ddl.add_columns(spark, "alter_db.t1", {"b": "STRING", "c": "DOUBLE"})
        assert [f.name for f in spark.table("alter_db.t1").schema.fields] == ["a", "b", "c"]
        ddl.rename_table(spark, "alter_db.t1", "alter_db.t2")
        assert spark.table("alter_db.t2").count() == 1
    finally:
        spark.sql("DROP DATABASE IF EXISTS alter_db CASCADE")


def test_materialized_view_incremental_refresh(spark, tmp_path):
    """Incremental REBUILD: after appending one day to the base, a
    partition-scoped refresh of that day must (a) make the MV equal the
    full recompute and (b) leave every other MV partition's files
    untouched — the nightly-refresh-touches-one-day contract."""
    import glob

    spark.sql("CREATE DATABASE IF NOT EXISTS mvi_db")
    try:
        base = "mvi_db.base_events"
        mv = "mvi_db.mv_daily"
        spark.createDataFrame(
            [("2026-01-01", 1, 10.0), ("2026-01-01", 2, 5.0), ("2026-01-02", 3, 7.0)],
            "dt STRING, id BIGINT, val DOUBLE",
        ).write.saveAsTable(base)
        ddl.create_partitioned_materialized_view(
            spark,
            mv,
            f"SELECT round(sum(val), 2) AS total, count(*) AS n, dt FROM {base} GROUP BY dt",
            partition_col="dt",
        )
        loc = (
            spark.sql(f"DESCRIBE TABLE EXTENDED {mv}")
            .filter("col_name = 'Location'")
            .first()["data_type"]
        ).replace("file:", "")
        day1 = glob.glob(os.path.join(loc, "dt=2026-01-01", "part-*"))
        before = {f: os.path.getmtime(f) for f in day1}
        assert before

        # late data lands in day 2 only
        spark.createDataFrame(
            [("2026-01-02", 4, 3.0)], "dt STRING, id BIGINT, val DOUBLE"
        ).write.mode("append").saveAsTable(base)
        ddl.refresh_materialized_view_incremental(spark, mv, ["2026-01-02"])

        got = {
            r.dt: (r.total, r.n) for r in spark.table(mv).collect()
        }
        assert got == {"2026-01-01": (15.0, 2), "2026-01-02": (10.0, 2)}
        after = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(loc, "dt=2026-01-01", "part-*"))}
        assert after == before, "untouched day-1 partition was rewritten"
    finally:
        spark.sql("DROP DATABASE IF EXISTS mvi_db CASCADE")
