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


def test_power_iteration_matches_sequential_numpy_replay(spark):
    """Independent check for the oracle-gated power-iteration entry:
    the DISTRIBUTED quantized recurrence (posexplode + hash-agg per
    iteration) must equal a sequential numpy replay of the same
    definition, EXACTLY — both snap state to the 1e-6 grid, so there
    is no tolerance to hide a plumbing error in. The oracle proves
    Spark == DuckDB; this proves both == the written-down recurrence.
    The fixture spectrum is near-isotropic (lambda2/lambda1 ~ 0.93),
    so 6 iterations yield a top-spectrum Krylov iterate, not the
    converged eigenvector — the Rayleigh bounds pin that honestly."""
    import math

    from hive_release_spark.llm.clustering import power_iteration_project

    emb = load_table(spark, SF_SMOKE, "embeddings")
    out = power_iteration_project(emb, n_iter=6, nq=20).collect()
    got = np.array([r.pc1_micro for r in sorted(out, key=lambda r: r.vec_id)])
    rayleigh = out[0].rayleigh_micro / 1e6

    X = np.array(
        [list(map(float, r.embedding)) for r in emb.orderBy("vec_id").collect()]
    )
    n, d = X.shape
    q = lambda a: np.floor(a * 1e6 + 0.5) / 1e6  # noqa: E731
    mean = q(X.mean(axis=0))
    Xc = X - mean
    v = np.full(d, 1.0 / math.sqrt(d))
    r_seq = 0.0
    for _ in range(6):
        w = q(Xc.T @ (Xc @ v) / n)
        r_seq = float(v @ w)
        v = q(w / math.sqrt(float(w @ w)))
    want = np.floor(Xc[:20] @ v * 1e6 + 0.5).astype(np.int64)
    assert np.array_equal(got, want), (got[:5], want[:5])
    assert abs(rayleigh - r_seq) <= 2e-6, (rayleigh, r_seq)

    # the iterate must sit inside the covariance spectrum's top band
    eigval = np.linalg.eigvalsh((X.T @ X) / n - np.outer(X.mean(axis=0), X.mean(axis=0)))
    assert rayleigh <= eigval[-1] * (1 + 1e-3)
    assert rayleigh >= eigval[-8]  # climbed into the top-8 of 64


def test_power_iteration_degenerate_inputs_fail_loudly(spark):
    """ADVICE r6-5, amended by the r9 empty-input axis: an EMPTY input
    now returns the typed empty projection (the DuckDB replay oracle's
    answer — its recursive CTE emits no rows over an empty corpus, so
    returning empty IS cross-engine-convergent, unlike the r6 era when
    Python died with a bare TypeError). The all-constant (sub-quantum
    variance) corpus still raises a clear ValueError: that one is a
    data pathology on a NONEMPTY corpus where the DuckDB replay
    diverges into inf/NULL, so failing loudly remains correct."""
    import pytest
    from pyspark.sql import types as T

    from hive_release_spark.llm.clustering import power_iteration_project

    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.DoubleType())),
    ])
    empty = spark.createDataFrame([], schema)
    out = power_iteration_project(empty)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "pc1_micro", "rayleigh_micro", "n_iter",
    ]

    constant = spark.createDataFrame(
        [(i, [1.0] * 8) for i in range(20)], schema
    )
    with pytest.raises(ValueError, match="degenerate"):
        power_iteration_project(constant, n_iter=2, nq=5)
