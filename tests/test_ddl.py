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
