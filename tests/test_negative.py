"""Negative corpus (SURVEY.md §5: Hive's clientnegative analogue) —
bad queries must fail with diagnosable errors, not wrong answers."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException

from hive_release_spark.catalog import load_table, register_views
from tests.conftest import SF_SMOKE


def test_unresolved_column(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(AnalysisException) as e:
        li.select("no_such_column").collect()
    assert "no_such_column" in str(e.value)


def test_unresolved_table(spark):
    with pytest.raises(AnalysisException):
        spark.sql("SELECT * FROM definitely_not_a_table_xyz").collect()


def test_bad_function_arity(spark):
    register_views(spark, SF_SMOKE, ("region",))
    with pytest.raises(AnalysisException):
        spark.sql("SELECT substr() FROM region").collect()


def test_ambiguous_column(spark):
    a = load_table(spark, SF_SMOKE, "nation")
    b = load_table(spark, SF_SMOKE, "nation")
    j = a.join(b, a.n_regionkey == b.n_regionkey)
    with pytest.raises(AnalysisException):
        j.select("n_nationkey").collect()


def test_cartesian_requires_explicit_cross(spark):
    """Hive CrossProductCheck analogue: an accidental cartesian via a
    trivially-true condition is still planned, but a bare join with no
    condition errors without crossJoin."""
    a = load_table(spark, SF_SMOKE, "region")
    b = load_table(spark, SF_SMOKE, "nation")
    # df.join without condition defaults to inner-with-no-keys → error at
    # analysis unless spark.sql.crossJoin.enabled / explicit crossJoin
    out = a.crossJoin(b)
    assert out.count() == 125  # the explicit form works


def test_type_mismatch_array_op(spark):
    li = load_table(spark, SF_SMOKE, "lineitem")
    with pytest.raises(AnalysisException):
        li.select(F.array_contains("l_quantity", 1)).collect()
