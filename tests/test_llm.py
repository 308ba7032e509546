"""LLM-operator semantics beyond the oracle gate (SURVEY.md §2.L):
approximate operators validated against their exact baselines."""

from __future__ import annotations

from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from hive_release_spark.llm import dedup, multimodal, similarity
from tests.conftest import SF_SMOKE


def _pairs(df):
    return {tuple(sorted((r.doc_a, r.doc_b))) for r in df.collect()}


def test_minhash_lsh_recall_vs_exact(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = _pairs(dedup.jaccard_pairs(docs, n=3, threshold=0.5))
    approx = _pairs(dedup.minhash_lsh_pairs(docs, num_hashes=32, bands=8, threshold=0.5))
    # verification step makes approx ⊆ exact; banding should catch most
    assert approx <= exact
    if exact:
        assert len(approx) / len(exact) >= 0.8, (len(approx), len(exact))


def test_minhash_deterministic(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    a = dedup.minhash_signatures(docs, num_hashes=8).orderBy("doc_id").limit(5).collect()
    b = dedup.minhash_signatures(docs, num_hashes=8).orderBy("doc_id").limit(5).collect()
    assert a == b


def test_simhash_near_dups_have_low_hamming(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    exact = _pairs(dedup.jaccard_pairs(docs, n=3, threshold=0.8))
    sim_pairs = {
        tuple(sorted((r.doc_a, r.doc_b))): r.hamming
        for r in dedup.simhash_pairs(docs, max_hamming=10).collect()
    }
    # very-near duplicates (jaccard ≥ .8) should be simhash-close too
    found = sum(1 for p in exact if p in sim_pairs)
    if exact:
        assert found / len(exact) >= 0.7, (found, len(exact))


def test_ann_lsh_is_subset_quality(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    q = emb.filter(F.col("vec_id") < 10)
    exact = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(q, emb, k=10).collect()
    }
    approx = similarity.lsh_bucket_topk(q, emb, k=5, n_planes=4, n_tables=8).collect()
    # every ANN hit must be a true corpus vector ranked by real cosine;
    # measure overlap with the exact top-10 (recall proxy). These vectors
    # are near-orthogonal (max pairwise cosine ~0.5) — the hardest regime
    # for LSH — so the bar is recall, not perfection.
    hits = sum(1 for r in approx if (r.query_id, r.neighbor_id) in exact)
    assert hits >= len(approx) * 0.3, (hits, len(approx))


def test_multimodal_features_deterministic_schema(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    feats = multimodal.extract_features(multimodal.pack_assets(docs))
    assert feats.columns == ["asset_id", "modality", "width", "height", "n_frames", "feat_norm"]
    rows = feats.orderBy("asset_id").limit(3).collect()
    rows2 = feats.orderBy("asset_id").limit(3).collect()
    assert rows == rows2
    assert all(64 <= r.width < 256 and 64 <= r.height < 256 for r in rows)
