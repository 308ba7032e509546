"""Hive-2.3 semantic-parity checks (SURVEY.md §7.6 watch list): the
knobs the session factory's ``hive_parity=True`` mode controls, and the
semantics that hold either way."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from tests.conftest import SF_SMOKE


@pytest.fixture()
def ansi_off(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    yield
    spark.conf.set("spark.sql.ansi.enabled", old)


@pytest.fixture()
def ansi_on(spark):
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    yield
    spark.conf.set("spark.sql.ansi.enabled", old)


def test_division_by_zero_hive_mode_yields_null(spark, ansi_off):
    """Hive: x/0 → NULL (no error)."""
    r = spark.sql("SELECT 1 / 0 AS q, CAST('abc' AS INT) AS c").collect()[0]
    assert r.q is None and r.c is None


def test_division_by_zero_ansi_mode_errors(spark, ansi_on):
    with pytest.raises(Exception):
        spark.sql("SELECT 1 / 0").collect()


def test_int_division_returns_double(spark, ansi_off):
    """Hive `/` on ints returns double (SURVEY §7.6.2); `div` is the
    integer form."""
    r = spark.sql("SELECT 7 / 2 AS q, 7 div 2 AS d").collect()[0]
    assert r.q == 3.5 and isinstance(r.q, float)
    assert r.d == 3


def test_int_overflow_wraps_in_hive_mode(spark, ansi_off):
    r = spark.sql(
        "SELECT CAST(2147483647 AS INT) + CAST(1 AS INT) AS v"
    ).collect()[0]
    assert r.v == -2147483648  # wraps like Hive/Java


def test_null_ordering_defaults(spark):
    """Hive + Spark both default NULLS FIRST for ASC, NULLS LAST for
    DESC (SURVEY §7.6.5) — verified, not assumed."""
    df = spark.createDataFrame([(1,), (None,), (2,)], "x INT")
    asc = [r.x for r in df.orderBy("x").collect()]
    desc = [r.x for r in df.orderBy(F.col("x").desc()).collect()]
    assert asc == [None, 1, 2]
    assert desc == [2, 1, None]


def test_timestamp_is_wall_clock(spark):
    """Hive TIMESTAMP is timezone-less; parquet NTZ inference + UTC
    session give wall-clock round-trips (SURVEY §7.6.1)."""
    li = load_table(spark, SF_SMOKE, "lineitem")
    r = li.select(F.min("l_shipdate").alias("m")).collect()[0]
    assert r.m.tzinfo is None


def test_string_number_implicit_compare(spark, ansi_off):
    """Hive compares string vs number numerically ('10' > 9)."""
    r = spark.sql("SELECT '10' > 9 AS gt").collect()[0]
    assert r.gt is True
