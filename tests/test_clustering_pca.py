"""Numpy-parity gate for the distributed PCA: the Spark pipeline
(Arrow partial Gram blocks -> driver eigh -> literal projection) must
reproduce exact in-memory PCA on the same vectors."""

from __future__ import annotations

import numpy as np

from hive_release_spark.catalog import load_table
from hive_release_spark.llm.clustering import pca_project
from tests.conftest import SF_SMOKE


def test_pca_matches_exact_numpy(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = pca_project(emb, k=4).orderBy("vec_id").collect()
    got = np.array([[r[f"pc{c}"] for c in range(4)] for r in out])

    rows = emb.orderBy("vec_id").collect()
    X = np.array([list(map(float, r.embedding)) for r in rows])
    Xc = X - X.mean(axis=0)
    cov = (X.T @ X) / len(X) - np.outer(X.mean(axis=0), X.mean(axis=0))
    eigval, eigvec = np.linalg.eigh(cov)
    comps = eigvec[:, ::-1][:, :4]
    want = Xc @ comps

    # sign-agnostic per-component comparison (the pipeline fixes signs
    # by largest-|coeff|; exact numpy may differ)
    for c in range(4):
        a, b = got[:, c], want[:, c]
        flip = b if abs(np.dot(a, b)) == np.dot(a, b) else -b
        assert np.allclose(a, flip, atol=1e-4), f"component {c} diverges"

    # variance must be non-increasing across components
    var = got.var(axis=0)
    assert all(var[i] >= var[i + 1] - 1e-9 for i in range(3))


def test_pca_projection_decorrelates(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = pca_project(emb, k=3).collect()
    P = np.array([[r.pc0, r.pc1, r.pc2] for r in out])
    c = np.cov(P.T)
    off = c - np.diag(np.diag(c))
    assert np.abs(off).max() < 1e-3  # components ~orthogonal in sample
