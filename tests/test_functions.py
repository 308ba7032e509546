"""Hive function-surface unit tests (SURVEY.md §2.H) — the
FunctionRegistry export and the gap implementations."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_release_spark.functions import (
    FUNCTION_REGISTRY,
    create_union,
    extract_union,
    in_file,
    mask_first_n,
    mask_show_last_n,
    replicate_rows,
    sort_array_by,
)


def test_registry_size_and_callables():
    assert len(FUNCTION_REGISTRY) >= 200
    assert all(callable(v) for v in FUNCTION_REGISTRY.values())


def test_same_name_tier_evaluates(spark):
    df = spark.createDataFrame([("Hello World", -3, 2.25)], "s STRING, i INT, d DOUBLE")
    r = df.select(
        FUNCTION_REGISTRY["upper"]("s").alias("u"),
        FUNCTION_REGISTRY["abs"]("i").alias("a"),
        FUNCTION_REGISTRY["ceil"]("d").alias("c"),
        FUNCTION_REGISTRY["concat_ws"](F.lit("-"), "s", "s").alias("cw"),
        FUNCTION_REGISTRY["pmod"]("i", F.lit(5)).alias("p"),
    ).collect()[0]
    assert r.u == "HELLO WORLD" and r.a == 3 and r.c == 3 and r.p == 2
    assert r.cw == "Hello World-Hello World"


def test_hive_stddev_variance_are_population_forms(spark):
    """Hive stddev/variance = population; Spark same-names = sample.
    The registry must serve Hive semantics."""
    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x DOUBLE")
    r = df.agg(
        FUNCTION_REGISTRY["stddev"]("x").alias("sd"),
        FUNCTION_REGISTRY["variance"]("x").alias("v"),
        FUNCTION_REGISTRY["std"]("x").alias("std"),
    ).collect()[0]
    # population variance of {1,2,3} = 2/3; sample would be 1.0
    assert abs(r.v - 2 / 3) < 1e-12
    assert abs(r.sd - (2 / 3) ** 0.5) < 1e-12
    assert r.std == r.sd


def test_div_truncates_toward_zero(spark):
    df = spark.createDataFrame([(7, 2), (-7, 2)], "a INT, b INT")
    got = [r.q for r in df.select(FUNCTION_REGISTRY["div"]("a", "b").alias("q")).collect()]
    assert got == [3, -3]


def test_mask_family(spark):
    df = spark.createDataFrame([("Cust1234Secret",)], "s STRING")
    r = df.select(
        mask_first_n("s", 4).alias("mf"),
        mask_show_last_n("s", 6).alias("msl"),
    ).collect()[0]
    assert r.mf == "Xxxx1234Secret"
    assert r.msl.endswith("Secret") and not r.msl.startswith("Cust")


def test_union_type_roundtrip(spark):
    df = spark.createDataFrame([(1,)], "x INT")
    r = df.select(
        extract_union(create_union(F.lit(0), F.col("x"), F.lit("s")), 0).alias("v0"),
        extract_union(create_union(F.lit(1), F.col("x"), F.lit("s")), 1).alias("v1"),
        extract_union(create_union(F.lit(0), F.col("x"), F.lit("s"))).alias("full"),
    ).collect()[0]
    assert r.v0 == 1 and r.v1 == "s" and r.full.tag == 0


def test_replicate_rows(spark):
    df = spark.createDataFrame([(3, "a")], "n INT, v STRING")
    out = df.select(replicate_rows("n", "v").alias("r"))
    assert out.count() == 3


def test_sort_array_by(spark):
    df = spark.createDataFrame([(1,)], "x INT")
    arr = F.array(
        F.named_struct(F.lit("k"), F.lit(3), F.lit("v"), F.lit("c")),
        F.named_struct(F.lit("k"), F.lit(1), F.lit("v"), F.lit("a")),
        F.named_struct(F.lit("k"), F.lit(2), F.lit("v"), F.lit("b")),
    )
    r = df.select(sort_array_by(arr, "k").alias("s")).collect()[0]
    assert [e.v for e in r.s] == ["a", "b", "c"]


def test_in_file(spark, tmp_path):
    f = tmp_path / "allow.txt"
    f.write_text("alpha\nbeta\n")
    df = spark.createDataFrame([("alpha",), ("gamma",)], "s STRING")
    got = [r.ok for r in df.select(in_file("s", str(f)).alias("ok")).collect()]
    assert got == [True, False]

class TestInFileLargeFiles:
    """r01 VERDICT #6: in_file on a big file must not inline a
    10k-element literal into the plan."""

    @pytest.fixture()
    def needle_file_10k(self, tmp_path):
        p = tmp_path / "needles.txt"
        p.write_text("\n".join(f"Customer#{i:09d}" for i in range(0, 10000, 2)) + "\n")
        return str(p)

    def test_in_file_filter_plan_is_broadcast_semi_join(self, spark, needle_file_10k):
        from hive_release_spark.functions.hive import in_file_filter

        df = spark.createDataFrame(
            [(f"Customer#{i:09d}",) for i in range(10)], "c_name STRING"
        )
        out = in_file_filter(df, "c_name", needle_file_10k)
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
        assert plan.count("Customer#") == 0, "file lines leaked into the plan"
        assert sorted(r.c_name for r in out.collect()) == [
            f"Customer#{i:09d}" for i in range(0, 10, 2)
        ]

    def test_in_file_column_form_large_file_no_plan_bloat(self, spark, needle_file_10k):
        fn = FUNCTION_REGISTRY["in_file"]
        df = spark.createDataFrame(
            [(f"Customer#{i:09d}",) for i in range(10)], "c_name STRING"
        )
        out = df.filter(fn("c_name", needle_file_10k))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert len(plan) < 20_000, f"plan bloated to {len(plan)} chars"
        assert sorted(r.c_name for r in out.collect()) == [
            f"Customer#{i:09d}" for i in range(0, 10, 2)
        ]

    def test_in_file_small_file_literal_fast_path(self, spark, tmp_path):
        p = tmp_path / "small.txt"
        p.write_text("alpha\nbeta\n")
        fn = FUNCTION_REGISTRY["in_file"]
        df = spark.createDataFrame([("alpha",), ("gamma",)], "s STRING")
        out = df.filter(fn("s", str(p)))
        plan = out._jdf.queryExecution().optimizedPlan().toString()
        assert "pythonudf" not in plan.lower(), plan
        assert [r.s for r in out.collect()] == ["alpha"]


def test_xpath_family_executes(spark):
    """§2.H XML family (Hive xpath* UDFs → same-named Spark SQL fns):
    executed, not just registry-name-checked (DuckDB has no XPath, so no
    oracle query — fixed expectations here instead)."""
    df = spark.createDataFrame(
        [('<a><b>one</b><b>two</b><c>3</c></a>',)], "x STRING"
    )
    r = df.select(
        FUNCTION_REGISTRY["xpath"]("x", F.lit("a/b/text()")).alias("all_b"),
        FUNCTION_REGISTRY["xpath_string"]("x", F.lit("a/b")).alias("first_b"),
        FUNCTION_REGISTRY["xpath_int"]("x", F.lit("a/c")).alias("c_int"),
        FUNCTION_REGISTRY["xpath_boolean"]("x", F.lit("a/d")).alias("has_d"),
    ).collect()[0]
    assert r.all_b == ["one", "two"]
    assert r.first_b == "one"
    assert r.c_int == 3
    assert r.has_d is False


def test_sentences_executes(spark):
    """Hive GenericUDFSentences → Spark sentences(): tokenizes into
    array<array<string>> per sentence."""
    df = spark.createDataFrame([("Hello there. How are you",)], "s STRING")
    r = df.select(FUNCTION_REGISTRY["sentences"]("s").alias("sent")).collect()[0]
    assert r.sent == [["Hello", "there"], ["How", "are", "you"]]


def test_misc_xpath_remainder_properties(spark):
    """The rows-only `fn_misc_xpath` entry (r5 split of
    fn_misc_surface) carries its semantics here instead of a DuckDB
    oracle: soundex shape (letter + 3 digits), crc32 range (unsigned
    32-bit), xxhash64 determinism (same input -> same hash, distinct
    inputs overwhelmingly distinct), and the xpath/sentences columns'
    exact values on known inputs (covered above)."""
    from hive_release_spark.queries import REGISTRY
    from tests.conftest import SF_ORACLE

    rows = REGISTRY["fn_misc_xpath"].fn(spark, SF_ORACLE).collect()
    assert rows
    import re

    for r in rows:
        assert r.xp == "x"  # constant-input xpath_string pin
        assert re.fullmatch(r"[A-Z]\d{3}", r.sdx), r.sdx
        assert 0 <= r.crc <= 0xFFFFFFFF
        assert " | " in r.sents or r.sents  # flattened, sortable string
    # xxhash64 stability: re-running yields identical hashes
    again = {x.p_partkey: x.xx64 for x in
             REGISTRY["fn_misc_xpath"].fn(spark, SF_ORACLE).collect()}
    assert {x.p_partkey: x.xx64 for x in rows} == again
    # hash cardinality tracks the hashed column's (p_name repeats
    # heavily in the fixture: equal names MUST collide, distinct names
    # overwhelmingly must not)
    docs = REGISTRY["fn_misc_xpath"].fn(spark, SF_ORACLE)
    n_names, n_hashes = docs.agg(
        F.countDistinct("sdx").alias("a"), F.countDistinct("xx64").alias("b")
    ).collect()[0]
    assert n_hashes >= n_names  # xx64 at least as discriminating as soundex
