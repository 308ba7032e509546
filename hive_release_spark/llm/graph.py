"""Graph analytics over near-dup pair sets: PageRank and triangle
statistics. Complements llm/dedup.connected_components — the same
(doc_a, doc_b) pair frames feed all three.

Scale shape: everything operates on the PAIR graph (skinny id pairs),
never the corpus. PageRank is the canonical iterative-join algorithm:
each round is one join + partial-agged groupBy on node id (the Pregel
message pass, expressed declaratively so Catalyst/AQE handle skew);
rank frames are localCheckpoint'ed per round to keep lineage flat,
same as connected_components. Triangle counting is the ordered
3-cycle join over the a<b pair list — each edge participates once per
orientation, so no double counting and no symmetrization blow-up.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pagerank(
    pairs: DataFrame, alpha: float = 0.85, iters: int = 3
) -> DataFrame:
    """PageRank over the undirected pair graph (both directions of each
    pair), ``iters`` synchronous rounds from a uniform start:

        p'(v) = (1-alpha)/n + alpha * sum_{u~v} p(u)/deg(u)

    Returns (doc_id, degree, pagerank). The symmetric graph has no
    dangling nodes (every node has >=1 edge, so every node both emits
    and receives), which keeps the per-round mass exactly conserved and
    the formulation join-complete — no outer-join repair term.

    Driver state is ONE scalar (the node count n, the teleport
    denominator — same bounded-collect contract as the k-means
    centroid fetch); ranks/degrees stay distributed throughout.
    """
    e = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    edges = (
        e.union(e.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        edges.groupBy("a")
        .agg(F.count("*").alias("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = deg.count()
    if n == 0:
        spark = pairs.sparkSession
        schema = T.StructType(
            [
                T.StructField("doc_id", T.LongType()),
                T.StructField("degree", T.LongType()),
                T.StructField("pagerank", T.DoubleType()),
            ]
        )
        return spark.createDataFrame([], schema)
    # r12 (guide §2.3/§3): the rank state CARRIES the node degree, so
    # each round joins edges against ONE node frame — the former shape
    # joined edges⋈ranks and then joined deg onto the EDGE-cardinality
    # result (an extra edge-sized join per round); now deg reattaches
    # to the NODE-cardinality aggregate output instead.  Per-edge term
    # p(u)/d(u) is the identical expression on identical inputs, so the
    # summed multiset — and every rank — is unchanged (oracle-verified).
    ranks = deg.select("a", "d", F.lit(1.0 / n).alias("p"))
    for _ in range(iters):
        contribs = edges.join(ranks, "a").select(
            F.col("b").alias("a"), (F.col("p") / F.col("d")).alias("c")
        )
        new_p = contribs.groupBy("a").agg(
            (F.lit((1.0 - alpha) / n) + F.lit(alpha) * F.sum("c")).alias("p")
        )
        ranks = new_p.join(deg, "a").select("a", "d", "p")
        # eager stays TRUE (r12 measured): a lazy checkpoint looked like
        # it would save iters driver round-trips, but the paired A/B
        # showed ~2x WORSE wall-clock — the chained 3-round mega-job
        # scheduled worse than three isolated rounds, and each rank
        # frame feeds both the next round's join AND its own
        # checkpoint, so eager materialization is doing real reuse
        # work.  Measured, rejected, kept eager.
        ranks = ranks.localCheckpoint(eager=True)
    return (
        ranks.select(
            F.col("a").alias("doc_id"),
            F.col("d").alias("degree"),
            F.round("p", 6).alias("pagerank"),
        )
        .orderBy("doc_id")
    )


def triangle_stats(pairs: DataFrame) -> DataFrame:
    """Global triangle count + clustering coefficient of the pair graph.

    Triangles: the ordered 3-cycle join on the a<b pair list —
    (a,b),(b,c),(a,c) with a<b<c, so each triangle matches exactly
    once. Wedges (paths of length 2) come from symmetric degrees:
    sum d(d-1)/2; global clustering coefficient = 3*triangles/wedges.

    The joins carry only id pairs; hot nodes (a template document
    paired with everything) skew the join keys and are AQE-split.
    Output: 1 row (n_nodes, n_edges, n_triangles, clustering_coeff).
    """
    p = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    p1, p2, p3 = p.alias("p1"), p.alias("p2"), p.alias("p3")
    tri = (
        p1.join(p2, F.col("p1.b") == F.col("p2.a"))
        .join(
            p3,
            (F.col("p3.a") == F.col("p1.a")) & (F.col("p3.b") == F.col("p2.b")),
        )
        .agg(F.count("*").alias("n_triangles"))
    )
    sym_deg = (
        p.select("a")
        .union(p.select(F.col("b").alias("a")))
        .groupBy("a")
        .agg(F.count("*").alias("d"))
    )
    stats = sym_deg.agg(
        F.count("*").alias("n_nodes"),
        (F.sum("d") / 2).cast("long").alias("n_edges"),
        (F.sum(F.col("d") * (F.col("d") - 1)) / 2).cast("long").alias("n_wedges"),
    )
    return stats.crossJoin(tri).select(
        "n_nodes",
        "n_edges",
        "n_triangles",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise(F.round(3.0 * F.col("n_triangles") / F.col("n_wedges"), 6))
        .alias("clustering_coeff"),
    )


def local_clustering(pairs: DataFrame) -> DataFrame:
    """Per-node triangle count and LOCAL clustering coefficient
    2·T(v) / (d(v)·(d(v)−1)) — the node-level "is this doc inside a
    boilerplate clique" score behind the global ratio in
    ``triangle_stats``.

    Same ordered 3-cycle join (a<b<c matches each triangle once);
    every triangle then credits its three vertices via a 3-way union
    of id projections — a skinny frame whose size is 3×triangles, not
    corpus-shaped. Degrees ride the same symmetric-union groupBy as
    the global stats. Nodes with degree < 2 have no possible triangle
    and report coefficient 0.0 (the convention that keeps the column
    total-ordered for deterministic output).
    """
    p = pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    p1, p2, p3 = p.alias("p1"), p.alias("p2"), p.alias("p3")
    tri_rows = (
        p1.join(p2, F.col("p1.b") == F.col("p2.a"))
        .join(
            p3,
            (F.col("p3.a") == F.col("p1.a")) & (F.col("p3.b") == F.col("p2.b")),
        )
        .select(
            F.col("p1.a").alias("va"),
            F.col("p1.b").alias("vb"),
            F.col("p2.b").alias("vc"),
        )
    )
    tri_per_node = (
        tri_rows.select(F.col("va").alias("v"))
        .union(tri_rows.select(F.col("vb").alias("v")))
        .union(tri_rows.select(F.col("vc").alias("v")))
        .groupBy("v")
        .agg(F.count("*").alias("n_tri"))
    )
    deg = (
        p.select("a")
        .union(p.select(F.col("b").alias("a")))
        .groupBy("a")
        .agg(F.count("*").alias("d"))
        .select(F.col("a").alias("v"), "d")
    )
    return (
        deg.join(tri_per_node, "v", "left")
        .select(
            F.col("v").alias("doc_id"),
            F.col("d").alias("degree"),
            F.coalesce(F.col("n_tri"), F.lit(0)).alias("n_triangles"),
            F.when(F.col("d") < 2, F.lit(0.0))
            .otherwise(
                F.round(
                    2.0
                    * F.coalesce(F.col("n_tri"), F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)),
                    6,
                )
            )
            .alias("local_coeff"),
        )
        .orderBy("doc_id")
    )
