"""DML join-rewrites (UPDATE/DELETE/MERGE/multi-insert) on copy-on-write
parquet tables — SURVEY.md §2.B ACID mapping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_release_spark.operators import dml


@pytest.fixture()
def table(spark, tmp_path):
    path = str(tmp_path / "t")
    spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "id BIGINT, name STRING, val DOUBLE",
    ).write.parquet(path)
    return path


def test_update(spark, table):
    dml.update_table(spark, table, {"val": F.col("val") * 2}, F.col("id") <= 2)
    got = {r.id: r.val for r in spark.read.parquet(table).collect()}
    assert got == {1: 20.0, 2: 40.0, 3: 30.0, 4: 40.0}


def test_delete(spark, table):
    dml.delete_from(spark, table, F.col("val") > 25)
    got = sorted(r.id for r in spark.read.parquet(table).collect())
    assert got == [1, 2]


def test_merge_upsert(spark, table):
    source = spark.createDataFrame(
        [(2, "B", 99.0), (5, "e", 50.0)], "id BIGINT, name STRING, val DOUBLE"
    )
    dml.merge_into(
        spark,
        table,
        source,
        on=["id"],
        matched_update={"val": F.col("src.val"), "name": F.col("src.name")},
        not_matched_insert=True,
    )
    got = {r.id: (r.name, r.val) for r in spark.read.parquet(table).collect()}
    assert got == {
        1: ("a", 10.0),
        2: ("B", 99.0),
        3: ("c", 30.0),
        4: ("d", 40.0),
        5: ("e", 50.0),
    }


def test_merge_cardinality_violation(spark, table):
    dup_source = spark.createDataFrame(
        [(2, "x", 1.0), (2, "y", 2.0)], "id BIGINT, name STRING, val DOUBLE"
    )
    with pytest.raises(ValueError, match="cardinality"):
        dml.merge_into(spark, table, dup_source, on=["id"], not_matched_insert=True)


def test_multi_insert(spark, table, tmp_path):
    df = spark.read.parquet(table)
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    dml.multi_insert(
        df,
        [
            (out1, lambda d: d.filter(F.col("val") >= 25).select("id")),
            (out2, lambda d: d.groupBy().agg(F.sum("val").alias("total"))),
        ],
    )
    assert sorted(r.id for r in spark.read.parquet(out1).collect()) == [3, 4]
    assert spark.read.parquet(out2).collect()[0].total == 100.0


def test_insert_into_append(spark, table):
    rows = spark.createDataFrame([(9, "z", 90.0)], "id BIGINT, name STRING, val DOUBLE")
    dml.insert_into(spark, table, rows)
    assert spark.read.parquet(table).count() == 5
