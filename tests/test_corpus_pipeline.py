"""Corpus-assembly operator semantics beyond the oracle gate
(SURVEY.md §2.L round 4): decontamination, packing, mixing, sharding,
stratified sampling — invariants the SQL hash-compare can't express
(recall/subset properties, budget bounds, nesting, determinism)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from hive_release_spark.llm import pipeline
from tests.conftest import SF_SMOKE


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMOKE, "documents")


class TestDecontaminate:
    def test_eval_doc_in_train_is_always_flagged(self, spark, docs):
        # a doc that IS an eval doc shares all its grams — must be flagged
        eval_df = docs.filter(F.col("doc_id") % 7 == 0)
        out = pipeline.decontaminate(docs, eval_df, n=3)
        self_rows = out.filter(F.col("doc_id") % 7 == 0)
        assert self_rows.filter(~F.col("contaminated")).count() == 0

    def test_short_docs_never_flagged(self, spark):
        train = spark.createDataFrame(
            [(1, "one two"), (2, "a b c d e f")], "doc_id long, text string"
        )
        eval_df = spark.createDataFrame([(9, "one two")], "doc_id long, text string")
        out = pipeline.decontaminate(train, eval_df, n=3).collect()
        # doc 1 has < n tokens -> empty gram set -> clean by definition
        by_id = {r.doc_id: r.contaminated for r in out}
        assert by_id[1] is False and by_id[2] is False
        assert len(out) == 2  # every train doc gets a row

    def test_plan_broadcasts_eval_side(self, spark, docs):
        eval_df = docs.filter(F.col("doc_id") % 41 == 0)
        train = docs.filter(F.col("doc_id") % 41 != 0)
        plan = pipeline.decontaminate(train, eval_df, n=3)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan  # 100 TB side never shuffles for the probe


class TestPackSequences:
    def test_bins_follow_cumsum_exactly(self, spark, docs):
        rows = pipeline.pack_sequences(docs, budget=256, n_shards=4).collect()
        by_shard: dict[int, list] = {}
        for r in sorted(rows, key=lambda r: (r.shard, r.doc_id)):
            by_shard.setdefault(r.shard, []).append(r)
        for shard, rs in by_shard.items():
            cum = 0
            for r in rs:
                assert r.tokens_before == cum
                assert r.pack_id == cum // 256
                cum += r.n_tokens

    def test_pack_ids_contiguous_from_zero(self, spark, docs):
        out = pipeline.pack_sequences(docs, budget=256, n_shards=4)
        per_shard = out.groupBy("shard").agg(
            F.min("pack_id").alias("lo"),
            F.max("pack_id").alias("hi"),
            F.count_distinct("pack_id").alias("n"),
        )
        for r in per_shard.collect():
            assert r.lo == 0 and r.n == r.hi + 1  # no empty pack in the middle


class TestDomainMix:
    def test_copy_counts_match_python_model(self, spark, docs):
        weights = {"src0": 2.5, "src1": 0.25}
        out = pipeline.resample_by_weight(docs, weights)
        got = {
            (r.doc_id, r.domain): r.n for r in
            out.groupBy("doc_id", "domain").agg(F.count("*").alias("n")).collect()
        }
        for row in docs.select("doc_id", "source").collect():
            w = weights.get(row.source, 1.0)
            extra = 1 if (row.doc_id * 2654435761) % 1000 < round((w - int(w)) * 1000) else 0
            expect = int(w) + extra
            assert got.get((row.doc_id, row.source), 0) == expect

    def test_zero_weight_drops_domain(self, spark, docs):
        out = pipeline.resample_by_weight(docs, {"src0": 0.0})
        assert out.filter(F.col("domain") == "src0").count() == 0

    def test_copy_idx_dense(self, spark, docs):
        out = pipeline.resample_by_weight(docs, {"src0": 3.0})
        per_doc = out.filter(F.col("domain") == "src0").groupBy("doc_id").agg(
            F.count("*").alias("n"), F.max("copy_idx").alias("mx"), F.min("copy_idx").alias("mn")
        )
        assert per_doc.filter((F.col("n") != 3) | (F.col("mx") != 3) | (F.col("mn") != 1)).count() == 0


class TestShuffleShards:
    def test_positions_dense_per_shard(self, spark, docs):
        out = pipeline.shuffle_shards(docs, n_shards=8, seed="t1")
        per = out.groupBy("shard").agg(
            F.count("*").alias("n"), F.max("pos").alias("mx"), F.min("pos").alias("mn")
        )
        bad = per.filter((F.col("mx") != F.col("n")) | (F.col("mn") != 1))
        assert bad.count() == 0
        assert out.select("shard").distinct().count() == 8  # all shards populated

    def test_seed_changes_order_but_not_membership(self, spark, docs):
        a = {r.doc_id: (r.shard, r.pos) for r in pipeline.shuffle_shards(docs, 8, "t1").collect()}
        b = {r.doc_id: (r.shard, r.pos) for r in pipeline.shuffle_shards(docs, 8, "t2").collect()}
        assert set(a) == set(b)  # same docs
        assert a != b  # different layout
        again = {r.doc_id: (r.shard, r.pos) for r in pipeline.shuffle_shards(docs, 8, "t1").collect()}
        assert a == again  # replayable


class TestStratifiedSample:
    def test_rates_within_tolerance(self, spark, docs):
        out = pipeline.stratified_sample(docs, {"en": 0.5, "de": 0.25}, seed="v1")
        n_en_all = docs.filter(F.col("lang") == "en").count()
        n_en = out.filter(F.col("lang") == "en").count()
        assert abs(n_en / n_en_all - 0.5) < 0.25
        assert out.filter(~F.col("lang").isin("en", "de")).count() == 0  # default 0

    def test_samples_nest_across_rates(self, spark, docs):
        lo = {r.doc_id for r in pipeline.stratified_sample(docs, {"en": 0.2}, seed="v1").collect()}
        hi = {r.doc_id for r in pipeline.stratified_sample(docs, {"en": 0.6}, seed="v1").collect()}
        assert lo <= hi  # ablation subsets nest

    def test_rate_one_keeps_everything(self, spark, docs):
        out = pipeline.stratified_sample(docs, {"en": 1.0}, seed="v1")
        assert out.count() == docs.filter(F.col("lang") == "en").count()
