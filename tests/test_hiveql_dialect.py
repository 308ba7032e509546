"""HiveQL dialect passthrough: the Hive-specific SQL syntax a migrating
user would paste must parse and run in Spark SQL unchanged (SURVEY.md
§3: 'the engine's job is the surface')."""

from __future__ import annotations

from hive_release_spark.catalog import register_views
from tests.conftest import SF_SMOKE


def _sql(spark, q):
    register_views(spark, SF_SMOKE)
    return spark.sql(q)


def test_lateral_view_explode_syntax(spark):
    df = _sql(
        spark,
        """
        SELECT doc_id, word
        FROM documents LATERAL VIEW explode(split(text, ' ')) t AS word
        WHERE doc_id < 3
        """,
    )
    assert df.count() > 0


def test_lateral_view_outer(spark):
    df = _sql(
        spark,
        """
        SELECT r_regionkey, x
        FROM region LATERAL VIEW OUTER explode(array()) t AS x
        """,
    )
    # OUTER keeps rows whose generator is empty
    assert df.count() == 5


def test_distribute_sort_cluster_by(spark):
    a = _sql(spark, "SELECT l_suppkey FROM lineitem DISTRIBUTE BY l_suppkey SORT BY l_suppkey")
    b = _sql(spark, "SELECT l_suppkey FROM lineitem CLUSTER BY l_suppkey")
    assert a.count() == b.count() == 6000


def test_left_semi_join_syntax(spark):
    df = _sql(
        spark,
        """
        SELECT c_custkey FROM customer LEFT SEMI JOIN orders
        ON customer.c_custkey = orders.o_custkey
        """,
    )
    assert 0 < df.count() <= 150


def test_hive_hint_syntax(spark):
    df = _sql(
        spark,
        """
        SELECT /*+ BROADCAST(nation) */ n_name, count(*) AS n
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name
        """,
    )
    assert df.count() == 25


def test_backtick_identifiers_and_double_quoted_strings(spark):
    df = _sql(spark, 'SELECT `c_custkey`, "literal" AS s FROM customer LIMIT 3')
    assert df.collect()[0].s == "literal"


def test_set_and_show_conf(spark):
    spark.sql("SET spark.sql.shuffle.partitions")
    df = _sql(spark, "SHOW FUNCTIONS LIKE 'concat*'")
    assert df.count() >= 2
