"""Constraint-validation operator (operators/quality.py): the checks
must actually DETECT injected violations — a clean-fixture oracle alone
would pass a check that always returns zero."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_release_spark.operators import quality as Q


def _dirty(spark):
    fact = spark.createDataFrame(
        [
            (1, 10, "a"),
            (2, 10, "b"),
            (2, 20, None),   # duplicate PK + null attr
            (3, None, "c"),  # null FK (NOT an orphan by SQL semantics)
            (4, 99, "d"),    # orphan FK
        ],
        "id BIGINT, cust BIGINT, attr STRING",
    )
    dim = spark.createDataFrame([(10,), (20,)], "c BIGINT")
    return fact, dim


def test_dq_summary_detects_injected_violations(spark):
    fact, dim = _dirty(spark)
    row = Q.dq_summary(
        fact, pk=["id"], not_null=["cust", "attr"], fks=[("cust", dim, "c")]
    ).first()
    assert row.n_rows == 5
    assert row.null_cust == 1 and row.null_attr == 1
    assert row.dup_keys == 1 and row.dup_excess_rows == 1
    assert row.orphans_cust == 1  # only id=4; the NULL FK is excluded


def test_fk_orphans_rows_and_pk_duplicates(spark):
    fact, dim = _dirty(spark)
    orphans = Q.fk_orphans(fact, "cust", dim, "c")
    assert [r.id for r in orphans.collect()] == [4]
    dups = Q.pk_duplicates(fact, ["id"]).collect()
    assert [(r.id, r.n) for r in dups] == [(2, 2)]


def test_dq_summary_clean_table_is_all_zero(spark):
    fact = spark.createDataFrame([(1, 10), (2, 20)], "id BIGINT, cust BIGINT")
    dim = spark.createDataFrame([(10,), (20,)], "c BIGINT")
    row = Q.dq_summary(fact, pk=["id"], not_null=["cust"], fks=[("cust", dim, "c")]).first()
    assert (row.n_rows, row.null_cust, row.dup_keys, row.dup_excess_rows, row.orphans_cust) == (
        2, 0, 0, 0, 0,
    )
