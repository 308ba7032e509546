"""Distributed k-means over embedding columns (Lloyd's algorithm).

The iterative-algorithm class a training-data pipeline needs (corpus
clustering for mixture balancing / topic bucketing). Spark-first shape,
same as MLlib's own KMeans driver loop:

- centroids live on the DRIVER (k × dim doubles — bounded, k ≤ 100s),
  embedded into the assignment expression as literals each iteration;
- ASSIGNMENT is a pure map stage: an ``array_min`` over k
  struct(distance, cluster) expressions — zero shuffles, no crossJoin,
  whole-stage-codegen'd JVM arithmetic;
- the UPDATE step is the only exchange per iteration: posexplode the
  vector and hash-aggregate (cluster, dim) → mean — 100 TB of vectors
  reduce to k × dim rows before the driver ever sees them.

Determinism across engines (the DuckDB oracle replays the identical
iterations): init centroids are the k lowest-id raw vectors (float
parquet values — bit-exact in both engines), and every updated centroid
mean is rounded to 6 decimals on BOTH sides so last-ulp float-summation
differences cannot flip an argmin near a boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _nearest(centroids: list[list[float]]):
    """Column expr: index of the nearest centroid (squared-L2,
    ties broken by lowest cluster id via struct ordering)."""
    cands = [
        F.struct(
            F.aggregate(
                F.zip_with(
                    F.col("v"),
                    F.array(*[F.lit(float(c)) for c in cent]),
                    lambda x, c: (x - c) * (x - c),
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("d"),
            F.lit(i).alias("c"),
        )
        for i, cent in enumerate(centroids)
    ]
    return F.array_min(F.array(*cands))["c"]


def kmeans_assign(
    emb: DataFrame,
    k: int = 8,
    n_iter: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Run ``n_iter`` Lloyd iterations; return (id, cluster) assignments
    under the final centroids."""
    pts = emb.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
    pts.persist()
    try:
        cents = [r.v for r in pts.orderBy(id_col).limit(k).collect()]
        for _ in range(n_iter):
            assigned = pts.withColumn("cluster", _nearest(cents))
            means = (
                assigned.select("cluster", F.posexplode("v").alias("pos", "val"))
                .groupBy("cluster", "pos")
                .agg(F.round(F.avg("val"), 6).alias("m"))
                .groupBy("cluster")
                .agg(F.array_sort(F.collect_list(F.struct("pos", "m"))).alias("ms"))
                .collect()
            )
            new = {r.cluster: [x.m for x in r.ms] for r in means}
            # empty cluster → keep its previous centroid
            cents = [new.get(i, cents[i]) for i in range(k)]
        return pts.withColumn("cluster", _nearest(cents)).select(id_col, "cluster")
    finally:
        pts.unpersist()


def kmeans_oracle(k: int = 8, n_iter: int = 3) -> str:
    """DuckDB SQL replaying the exact same iterations (same init, same
    6-decimal centroid rounding, same lowest-cluster tie-break)."""
    sql = [
        "WITH pts AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),",
        f"c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cluster, v AS c"
        f" FROM (SELECT vec_id, v FROM pts ORDER BY vec_id LIMIT {k})),",
    ]
    for i in range(n_iter):
        sql.append(
            f"a{i} AS (SELECT vec_id, v, cluster FROM ("
            f" SELECT p.vec_id, p.v, c.cluster,"
            f" row_number() OVER (PARTITION BY p.vec_id"
            f" ORDER BY list_sum(list_transform(generate_series(1, len(p.v)),"
            f" i -> (p.v[i] - c.c[i]) * (p.v[i] - c.c[i]))), c.cluster) AS rn"
            f" FROM pts p CROSS JOIN c{i} c) WHERE rn = 1),"
        )
        sql.append(
            f"m{i} AS (SELECT cluster, list(m ORDER BY pos) AS c FROM ("
            f" SELECT cluster, pos, round(avg(val), 6) AS m FROM ("
            f" SELECT cluster, generate_subscripts(v, 1) AS pos, unnest(v) AS val"
            f" FROM a{i}) GROUP BY cluster, pos) GROUP BY cluster),"
        )
        sql.append(
            f"c{i + 1} AS (SELECT prev.cluster, coalesce(m.c, prev.c) AS c"
            f" FROM c{i} prev LEFT JOIN m{i} m ON prev.cluster = m.cluster),"
        )
    sql.append(
        f"fin AS (SELECT vec_id, cluster FROM ("
        f" SELECT p.vec_id, c.cluster,"
        f" row_number() OVER (PARTITION BY p.vec_id"
        f" ORDER BY list_sum(list_transform(generate_series(1, len(p.v)),"
        f" i -> (p.v[i] - c.c[i]) * (p.v[i] - c.c[i]))), c.cluster) AS rn"
        f" FROM pts p CROSS JOIN c{n_iter} c) WHERE rn = 1)"
    )
    sql.append("SELECT vec_id, cluster FROM fin ORDER BY vec_id")
    return "\n".join(sql)


def pca_project(
    emb: DataFrame,
    k: int = 8,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Distributed PCA projection — the dimension-reduction step an
    embedding pipeline runs before ANN indexing or clustering.

    Spark-first shape (MLlib RowMatrix.computePrincipalComponents
    pattern):

    1. Per-Arrow-batch partial moments via ``mapInPandas``: each batch
       contributes its numpy ``XᵀX`` Gram block, column sums, and row
       count — a 100 TB corpus reduces map-side to (d²+d+1)-size
       partials, BLAS-computed, before any exchange.
    2. One (i, j) hash-agg shuffle merges partials; the d×d covariance
       (d = 64 → 4 161 cells) is collected to the DRIVER — bounded by
       dimension, never by corpus size (same contract as the k-means
       centroid loop).
    3. numpy ``eigh`` on the driver yields the top-k components, which
       are embedded back as LITERAL arrays; the projection itself is a
       zero-shuffle JVM map stage (``aggregate(zip_with(...))`` dot
       products), so the second corpus pass never touches Python.

    Rows-only by design: float summation order makes the last ulp of
    the covariance — and the eigenvector signs — engine-specific, so
    there is no cross-engine oracle; correctness is pinned by the
    numpy-parity test (subspace match vs exact PCA on the collected
    corpus) in tests/test_clustering_pca.py.
    """
    import numpy as np
    import pandas as pd

    d = len(emb.select(vec_col).first()[0])  # 1-row driver fetch, bounded

    def partial_moments(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            X = np.stack(pdf["v"].values).astype("float64")
            g = X.T @ X
            s = X.sum(axis=0)
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": np.concatenate([ii.ravel(), np.arange(d), [-1]]),
                    "j": np.concatenate([jj.ravel(), np.full(d, -1), [-1]]),
                    "val": np.concatenate([g.ravel(), s, [float(len(X))]]),
                }
            )

    moments = (
        emb.select(F.col(vec_col).cast("array<double>").alias("v"))
        .mapInPandas(partial_moments, schema="i INT, j INT, val DOUBLE")
        .groupBy("i", "j")
        .agg(F.sum("val").alias("val"))
        .collect()  # ≤ d² + d + 1 rows — dimension-bounded, documented
    )
    gram = np.zeros((d, d))
    mean = np.zeros(d)
    n = 0.0
    for r in moments:
        if r.i == -1:
            n = r.val
        elif r.j == -1:
            mean[r.i] = r.val
        else:
            gram[r.i, r.j] = r.val
    mean /= n
    cov = gram / n - np.outer(mean, mean)
    eigval, eigvec = np.linalg.eigh(cov)  # ascending
    comps = eigvec[:, ::-1][:, :k]  # d × k, top-k by variance
    # deterministic sign: make the largest-|coeff| entry positive
    for c in range(k):
        j = int(np.abs(comps[:, c]).argmax())
        if comps[j, c] < 0:
            comps[:, c] = -comps[:, c]

    x = F.col(vec_col).cast("array<double>")
    proj_cols = []
    for c in range(k):
        w = F.array(*[F.lit(float(v)) for v in comps[:, c]])
        dot = F.aggregate(
            F.zip_with(x, w, lambda a, b: a * b), F.lit(0.0), lambda s, v: s + v
        )
        offset = float(mean @ comps[:, c])
        proj_cols.append(F.round(dot - F.lit(offset), 6).alias(f"pc{c}"))
    return emb.select(F.col(id_col), *proj_cols)
