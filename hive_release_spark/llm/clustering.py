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
