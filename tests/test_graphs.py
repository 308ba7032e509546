"""Graph-operator tests (llm/graph.py): PageRank invariants + plan
pins, triangle-count ground truth on a hand-built graph, and the new
analytics entries' plan claims (broadcast day list, WindowGroupLimit
sampling pushdown)."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from hive_release_spark.llm import graph
from hive_release_spark.queries.analytics3 import (
    events_rolling_active_users,
    sample_weighted,
)
from tests.conftest import SF_SMOKE


def _plan(df, mode: str = "formatted") -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a long, doc_b long")


def test_pagerank_uniform_on_regular_graph(spark):
    # a 4-cycle is 2-regular: PageRank must stay exactly uniform (0.25)
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (1, 4)])
    out = graph.pagerank(pairs, iters=3).collect()
    assert len(out) == 4
    for r in out:
        assert r.degree == 2
        assert abs(r.pagerank - 0.25) < 1e-9


def test_pagerank_mass_conserved_and_hub_ranked(spark):
    # star: hub 1 with leaves 2,3,4 — hub must outrank leaves; total
    # mass stays 1 (symmetric graph has no dangling leak)
    pairs = _pairs(spark, [(1, 2), (1, 3), (1, 4)])
    rows = {r.doc_id: r for r in graph.pagerank(pairs, iters=5).collect()}
    assert rows[1].pagerank > rows[2].pagerank
    assert rows[2].pagerank == rows[3].pagerank == rows[4].pagerank
    assert abs(sum(r.pagerank for r in rows.values()) - 1.0) < 1e-4


def test_pagerank_empty_graph(spark):
    out = graph.pagerank(_pairs(spark, []))
    assert out.columns == ["doc_id", "degree", "pagerank"]
    assert out.count() == 0


def test_triangle_stats_ground_truth(spark):
    # K4 has 4 triangles, 6 edges, 12 wedges, coefficient exactly 1.0
    k4 = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)]
    row = graph.triangle_stats(_pairs(spark, k4)).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)
    assert row.clustering_coeff == 1.0
    # path graph 1-2-3: one wedge, no triangle, coefficient 0
    row = graph.triangle_stats(_pairs(spark, [(1, 2), (2, 3)])).collect()[0]
    assert (row.n_triangles, row.clustering_coeff) == (0, 0.0)


def test_rolling_active_users_broadcasts_day_list(spark):
    plan = _plan(events_rolling_active_users(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" in plan
    # the explode fan-out must NOT trigger a join of two shuffled sides
    assert "SortMergeJoin" not in plan


def test_rolling_active_users_matches_naive_window(spark):
    ev = load_table(spark, SF_SMOKE, "events").select(
        F.to_date("ts").alias("day"), "user_id"
    )
    naive = {
        (r.day, r.active_7d)
        for r in ev.alias("d")
        .select("day")
        .distinct()
        .join(
            ev.distinct().alias("u"),
            (F.col("u.day") >= F.date_sub(F.col("d.day"), 6))
            & (F.col("u.day") <= F.col("d.day")),
        )
        .groupBy("d.day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .collect()
    }
    fast = {
        (r.day, r.active_7d)
        for r in events_rolling_active_users(spark, SF_SMOKE).collect()
    }
    assert fast == naive


def test_sample_weighted_pushes_partial_topk(spark):
    # WindowGroupLimit partial top-k must run before the lang exchange
    plan = _plan(sample_weighted(spark, SF_SMOKE))
    assert "WindowGroupLimit" in plan


def test_sample_weighted_prefers_heavy_docs(spark):
    # A-ES with weight w: inclusion probability rises with w. Sanity:
    # the sampled docs' mean n_chars should exceed the corpus mean
    # (weights in the fixture span a wide range).
    docs = load_table(spark, SF_SMOKE, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    sample_mean = (
        sample_weighted(spark, SF_SMOKE).agg(F.avg("n_chars")).collect()[0][0]
    )
    assert sample_mean > corpus_mean


def test_groups_frame_single_data_exchange(spark):
    """The GROUPS emulation must share ONE suppkey exchange between the
    dense_rank and frame windows (the output sort exchange aside) — no
    peer-collapse groupBy, no fan-back join."""
    from hive_release_spark.queries.windows import window_groups_frame

    plan = _plan(window_groups_frame(spark, SF_SMOKE), "simple")
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


def test_channel_rollup_scans_each_fact_once(spark):
    """q5/q77 shape: one Expand serves every grouping-sets level; each
    fact file appears exactly once in the plan."""
    from hive_release_spark.queries.tpcds import ds_channel_rollup

    plan = _plan(ds_channel_rollup(spark, SF_SMOKE), "simple")
    assert plan.count("orders.parquet") == 1
    assert plan.count("lineitem.parquet") == 1
    assert plan.count("Expand") == 1


def test_asof_nearest_single_key_exchange(spark):
    """Nearest must cost the same single key exchange as backward —
    the second direction is a window pass, not a second shuffle."""
    from hive_release_spark.queries.timeseries import join_asof_nearest

    plan = _plan(join_asof_nearest(spark, SF_SMOKE), "simple")
    assert "Join" not in plan  # union + windows, no join operator
    assert "CartesianProduct" not in plan
    # union-window exchange + the right-side (custkey, orderdate) dedup
    # exchange — exactly the backward variant's footprint
    assert plan.count("Exchange hashpartitioning") == 2
