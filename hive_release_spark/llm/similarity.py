"""Similarity search over embedding columns (SURVEY.md §2.L).

``embeddings.parquet`` carries ``embedding ARRAY<FLOAT>`` (FIXTURES.md).
Two paths:

- Brute-force cosine top-k — exact baseline. Dot products via
  ``zip_with``/``aggregate`` higher-order functions (JVM-side, codegen'd;
  no Python). Queries broadcast against the corpus, so the corpus never
  shuffles: at 100 TB this is one pass over the corpus per query batch.
- LSH-bucketed ANN — random-hyperplane signatures (deterministic planes
  derived from xxhash64, no RNG), bucket join, exact re-rank within
  buckets. Trades recall for avoiding the full scan per query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def as_double_vec(col: Column | str) -> Column:
    return F.col(col).cast("array<double>") if isinstance(col, str) else col.cast("array<double>")


# Vector-geometry contract v2 (r12 vector-specials axis, extending the
# r10 NULL-geometry contract): a vector with ANY NULL/NaN/Inf component
# or ZERO norm has NO position in the similarity space — cosine against
# it is NaN or a division by zero, and under DESC similarity ordering
# NaN ranks FIRST on both engines, so one corrupt crawl embedding would
# otherwise WIN every search. Such rows are dropped scan-side at every
# geometry intake (the same posture as finite()/ts_valid); the DuckDB
# oracle twin is :data:`VEC_VALID_SQL`.
VEC_VALID_SQL = (
    "embedding IS NOT NULL"
    " AND len(list_filter(embedding,"
    " x -> x IS NULL OR NOT isfinite(x))) = 0"
    " AND len(list_filter(embedding, x -> x <> 0)) > 0"
)


def vec_valid(col: Column | str) -> Column:
    """Boolean: ``col`` is a geometrically valid vector — non-NULL,
    every component non-NULL and finite, norm > 0. Oracle twin:
    :data:`VEC_VALID_SQL` (swap the column name for non-default
    columns). Codegen'd higher-order predicates, evaluated in the scan
    stage — no shuffle, no Python."""
    c = F.col(col) if isinstance(col, str) else col
    finite_all = F.forall(
        c, lambda x: x.isNotNull() & ~F.isnan(x) & (F.abs(x) != F.lit(float("inf")))
    )
    nonzero = F.exists(c, lambda x: x != 0.0)
    return c.isNotNull() & finite_all & nonzero


def dot(a: Column, b: Column) -> Column:
    """Sequential-order dot product (matches a scalar loop exactly)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """``cosine(a, b)`` with the two norms supplied as precomputed
    per-row columns — bit-identical (identical ops in identical order:
    ``dot/(na*nb)`` where ``na``/``nb`` are the same ``sqrt(fold)``
    values ``cosine`` would compute), but the norm folds are evaluated
    once per ROW instead of once per candidate PAIR (guide §1.2/§2.3:
    don't recompute inside the pair loop what is constant per row —
    the HOF folds are interpreted, so each one saved is ~2·d lambda
    evaluations per pair). r12 optimization."""
    return dot(a, b) / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: broadcast(queries) ⋈ corpus → window rank.

    The rank window partitions by query id — high cardinality, no skew.
    Ties broken by neighbor id for determinism."""
    # vector-geometry contract v2: corrupt vectors never enter the rank
    # norms precomputed per ROW below the join (cosine_pre) — the join
    # boundary keeps the fold on the input side, so each pair pays one
    # dot fold instead of three
    q = queries.filter(vec_valid(vec_col)).select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    c = corpus.filter(vec_valid(vec_col)).select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))
    sims = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "sim", cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
        )
        .select("query_id", "neighbor_id", "sim")
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def dual_topk_pairs(
    queries: DataFrame,
    corpus: DataFrame,
    prefix_len: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ONE broadcast pair pass carrying BOTH the full-dimension cosine
    and the ``prefix_len``-dim Matryoshka-truncation cosine (r13,
    guide §1.2): the callers that rank a corpus under both geometries
    (emb_matryoshka_recall, sim_rrf_fusion) previously ran
    :func:`brute_force_topk` once per geometry — two broadcast joins,
    two full corpus scans, two sets of per-row norm folds. Returns the
    PERSISTED pair-skinny frame ``(query_id, neighbor_id, sim,
    sim_p, ok_p)`` (released by the caller's ``pipeline_scope``); the
    caller applies its own rank windows.

    Bit-identity contract: ``sim`` is exactly the ``cosine_pre`` value
    the full-dimension :func:`brute_force_topk` computed (same
    expressions, same per-row norm hoist); ``sim_p`` is exactly the
    sliced pass's value (``cast(slice(raw))`` composition preserved);
    ``ok_p`` is the sliced pass's ``vec_valid`` gate on BOTH sides —
    the old per-pass scan filter, carried as a flag so the trunc
    window ranks the identical row population after ``filter(ok_p)``.
    """
    from pyspark import StorageLevel

    sl = F.slice(F.col(vec_col), 1, prefix_len)
    q = (
        queries.filter(vec_valid(vec_col))
        .select(
            F.col(id_col).alias("query_id"),
            as_double_vec(vec_col).alias("qv"),
            as_double_vec(sl).alias("qvp"),
            vec_valid(sl).alias("qok"),
        )
        .withColumn("qn", norm(F.col("qv")))
        .withColumn("qnp", norm(F.col("qvp")))
    )
    c = (
        corpus.filter(vec_valid(vec_col))
        .select(
            F.col(id_col).alias("neighbor_id"),
            as_double_vec(vec_col).alias("cv"),
            as_double_vec(sl).alias("cvp"),
            vec_valid(sl).alias("cok"),
        )
        .withColumn("cn", norm(F.col("cv")))
        .withColumn("cnp", norm(F.col("cvp")))
    )
    return (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_pre(
                F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn")
            ).alias("sim"),
            cosine_pre(
                F.col("qvp"), F.col("cvp"), F.col("qnp"), F.col("cnp")
            ).alias("sim_p"),
            (F.col("qok") & F.col("cok")).alias("ok_p"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )


def cosine_pairs(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
) -> DataFrame:
    """All-pairs cosine ≥ threshold (embedding near-dup). ``block_col``
    restricts pairs to a blocking key (e.g. cluster label) — the IVF-style
    scale path; None = full cross product (small inputs only)."""
    v = vectors.filter(vec_valid(vec_col)).select(
        F.col(id_col).alias("id"),
        as_double_vec(vec_col).alias("v"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    ).withColumn("nv", norm(F.col("v")))  # per-row norm, not per-pair (r12)
    a, b = v.alias("a"), v.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if block_col:
        cond = cond & (F.col("a.blk") == F.col("b.blk"))
    return (
        a.join(b, cond)
        .withColumn(
            "sim",
            cosine_pre(
                F.col("a.v"), F.col("b.v"), F.col("a.nv"), F.col("b.nv")
            ),
        )
        .filter(F.col("sim") >= threshold)
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round("sim", 6).alias("sim"),
        )
    )


def cosine_pairs_blas(
    vectors: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All-pairs cosine ≥ threshold, BLAS block-matmul twin of
    ``cosine_pairs`` — same output, ~50× faster: the HOF self-join
    evaluates a 64-term fold expression per PAIR (n² row-at-a-time
    JVM work, 78 s at 2 000×2 000 on the bench box), while this path
    computes each block-PAIR as ONE ``N_a @ N_b.T`` (vectorized,
    Arrow-batched — the "Pandas UDFs beat per-row by 10-100×" rule
    applied to the pair bomb).

    r13 shape (VERDICT r12 #2 — retire the driver collect): the
    corpus no longer rides the driver at all.  Rows hash into
    ``nb`` deterministic id-blocks (xxhash64 — stable across
    retries, guide §2.5), each block packs into one
    ``collect_list(struct(id, v))`` row, and the nb(nb+1)/2 ordered
    block pairs fan out as tasks whose kernel runs the identical
    normalize + matmul + ``id_a < id_b`` mask the old full-matrix
    kernel ran (value-identical sweep vs the collected path on every
    fixture SF).  The former shape ``toPandas()``-ed the whole corpus
    into a task closure: an n-sized DRIVER collect in a declared
    query path, re-pickled into the task binary on every action
    (ADVICE r7-1) — guide §5's first rule is that the driver does no
    data work.

    EAGER at call time (ADVICE r6-3): building this plan runs ONE
    bounded Spark action — the count() that sizes the block grid
    (the former shape's toPandas was an unbounded one). Callers that
    only want the plan shape should use ``cosine_pairs`` instead.

    Scale posture: block replication is the trade — each block ships
    to nb pair-tasks, so the shuffle carries nb × corpus bytes
    (nb ≈ 64 at the 1M-row end: ~32 GB spread across the cluster,
    where the old closure stalled the DRIVER on 512 MB per action).
    All-PAIRS output is O(n²) rows, so any n where this entry is
    feasible at all keeps nb small; beyond that, the blocked
    ``cosine_pairs(block_col=...)`` / LSH / IVF paths are the
    documented escapes. Pair emission keeps ``id_a < id_b`` inside
    the kernel so no post-filter shuffles."""
    import math

    import numpy as np
    import pandas as pd

    out_schema = "id_a BIGINT, id_b BIGINT, sim DOUBLE"
    # corrupt vectors carry no geometry — drop them JVM-side before
    # the matrix build (r10 all-NULL axis; r12 vector-specials axis
    # extends the drop to NaN/Inf components and zero norm, which
    # would otherwise poison the normalized matrix)
    src = vectors.filter(vec_valid(vec_col)).select(
        F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v")
    )
    n = src.count()  # bounded action: one long, sizes the block grid
    if n == 0:
        return vectors.sparkSession.createDataFrame([], out_schema)
    # nb blocks ≈ n/8192 rows each, floored at 8 for task spread and
    # capped at 64 so replication (nb × corpus) stays bounded — the
    # grid scales with n, not with the local core count
    nb = max(8, min(64, math.ceil(n / 8192)))

    def block(batches):
        for batch in batches:
            for ra, rb, same in zip(
                batch["rows_a"], batch["rows_b"], batch["same"]
            ):
                ids_a = np.fromiter(
                    (r["id"] for r in ra), dtype="int64", count=len(ra)
                )
                Xa = np.stack([r["v"] for r in ra]).astype("float64")
                na = np.linalg.norm(Xa, axis=1)
                na[na == 0] = 1.0
                Na = Xa / na[:, None]
                if same:
                    ids_b, Nb = ids_a, Na
                else:
                    ids_b = np.fromiter(
                        (r["id"] for r in rb), dtype="int64", count=len(rb)
                    )
                    Xb = np.stack([r["v"] for r in rb]).astype("float64")
                    nbn = np.linalg.norm(Xb, axis=1)
                    nbn[nbn == 0] = 1.0
                    Nb = Xb / nbn[:, None]
                S = Na @ Nb.T
                mask = (S >= threshold) & (ids_a[:, None] < ids_b[None, :])
                i, j = np.nonzero(mask)
                out = {"id_a": ids_a[i], "id_b": ids_b[j], "sim": S[i, j]}
                if not same:
                    # cross-block pairs where the LOWER id sits on the
                    # b side appear only in this task — emit them too
                    # (sim is ulp-identical either way: IEEE multiply
                    # commutes and the dot accumulates over the same
                    # dimension order)
                    m2 = (S >= threshold) & (ids_b[None, :] < ids_a[:, None])
                    i2, j2 = np.nonzero(m2)
                    out = {
                        "id_a": np.concatenate([out["id_a"], ids_b[j2]]),
                        "id_b": np.concatenate([out["id_b"], ids_a[i2]]),
                        "sim": np.concatenate([out["sim"], S[i2, j2]]),
                    }
                yield pd.DataFrame(out)

    packed = (
        src.withColumn(
            "blk", F.pmod(F.xxhash64(F.col("id")), F.lit(nb)).cast("int")
        )
        .groupBy("blk")
        .agg(F.collect_list(F.struct("id", "v")).alias("rows"))
        # two consumers (both join sides) — without the persist each
        # side re-runs the scan → pack lineage, reading the corpus
        # twice (the MinHash-base rule, SCALE.md deliberate-persist
        # inventory; released by the ContextCleaner)
        .persist()
    )
    pa = packed.select(F.col("blk").alias("blk_a"), F.col("rows").alias("rows_a"))
    pb = packed.select(F.col("blk").alias("blk_b"), F.col("rows").alias("rows_b"))
    pairs = (
        pa.join(F.broadcast(pb), F.col("blk_a") <= F.col("blk_b"))
        # one fat row per task: the nb(nb+1)/2 block pairs hash-spread
        # so each gemm runs in its own slot instead of queueing behind
        # its left block's partition
        .repartition(F.col("blk_a"), F.col("blk_b"))
        .select(
            "rows_a", "rows_b", (F.col("blk_a") == F.col("blk_b")).alias("same")
        )
    )
    return pairs.mapInPandas(block, schema=out_schema).select(
        "id_a", "id_b", F.round("sim", 6).alias("sim")
    )


# ---------------------------------------------------------------------------
# LSH-bucketed ANN (scale path)
# ---------------------------------------------------------------------------


def _hyperplanes(dim: int, n_planes: int, table: int = 0) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes: component p[t][i][j]
    derived from a splitmix-style integer mix of (table, i, j) — no RNG
    state, stable across sessions/partitions."""
    planes = []
    for i in range(n_planes):
        row = []
        for j in range(dim):
            z = (
                table * 0xD6E8FEB86659FD93
                + i * 0x9E3779B97F4A7C15
                + j * 0xBF58476D1CE4E5B9
            ) & 0xFFFFFFFFFFFFFFFF
            z = ((z ^ (z >> 30)) * 0x94D049BB133111EB) & 0xFFFFFFFFFFFFFFFF
            z ^= z >> 31
            row.append((z / 2**64) * 2.0 - 1.0)
        planes.append(row)
    return planes


def lsh_bucket_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_planes: int = 4,
    n_tables: int = 8,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table hyperplane-LSH ANN: ``n_tables`` independent
    sign-of-projection signatures of ``n_planes`` bits each; a corpus
    vector is a candidate if it bucket-matches the query in ANY table
    (OR-amplification — single-table AND-only recall collapses on
    near-orthogonal data). Candidates are deduped, exact-cosine
    re-ranked. Approximate; each query touches only its buckets — the
    100 TB path (tune n_planes up for bigger corpora: bucket size ~
    n/2^n_planes per table).

    Signature kernel (r7, the cosine_pairs_blas lesson applied one
    entry over): the sign bits were interpreted HOF folds — 64-term
    ``aggregate(zip_with(...))`` per bit × n_tables·n_planes bits per
    row, ~2 000 lambda evaluations/vector and the dominant cost of the
    whole entry (6× the re-rank at sf0.1). Now ONE ``X @ P[t].T`` per
    table per Arrow batch inside ``mapInPandas`` — identical bucket
    integers: the planes are the same splitmix constants, and
    ``tests/test_fixture_margins.py`` pins every projection's distance
    from zero orders of magnitude above BLAS-vs-sequential-fold
    summation drift at all fixture SFs (the independent replay in
    test_independent_reference_values.py computes signatures with the
    same matmul). The constant matrix (n_tables×n_planes×dim doubles,
    ~16 KB at the defaults) rides the task closure; the n_tables-way
    posting expansion happens inside the kernel, replacing the
    explode.

    Boundary sensitivity for EXTERNAL callers (ADVICE r7-4): the sign
    bit ``proj > 0`` is evaluated under BLAS summation order, which
    can differ from a sequential fold (or another engine's SQL
    replay) by ~1e-13 in the projection value. The fixture-margin
    guarantee above is FIXTURE-scoped (min |proj| ≈ 1.7e-7 on the
    test corpora), not a property of the function: an arbitrary
    input vector whose projection lands within float-summation drift
    of zero can legitimately bucket differently across engines or
    BLAS builds. That flips membership of ONE table's bucket for
    that vector — with OR-amplification across ``n_tables`` the
    practical effect is a marginal candidate appearing/vanishing,
    i.e. approximate-recall jitter, not corruption."""
    import numpy as np
    import pandas as pd

    planes_all = [
        np.array(_hyperplanes(dim, n_planes, t), dtype="float64")
        for t in range(n_tables)
    ]
    bit_weights = (1 << np.arange(n_planes, dtype="int64")).astype("int64")

    def with_buckets(df: DataFrame, idc: str, vc: str, nc: str) -> DataFrame:
        # id column type derives from the input so the helper stays as
        # generic as the HOF version was (string ids, ints, ...)
        id_type = df.schema[idc].dataType.simpleString()
        out_schema = (
            f"{idc} {id_type}, {vc} ARRAY<DOUBLE>, {nc} DOUBLE, bucket BIGINT"
        )

        def bucketize(batches):
            for b in batches:
                if not len(b):
                    continue
                X = np.stack(b[vc].to_numpy()).astype("float64")
                for t, P in enumerate(planes_all):
                    proj = X @ P.T
                    # table id in the high bits keeps buckets disjoint
                    # across tables (same layout as the SQL oracle)
                    sig = (t << 32) + ((proj > 0) @ bit_weights)
                    yield pd.DataFrame(
                        {idc: b[idc], vc: b[vc], nc: b[nc], "bucket": sig}
                    )

        return df.mapInPandas(bucketize, schema=out_schema)

    # NULL vectors carry no geometry — no signature, no candidacy;
    # drop JVM-side (scan-pushed) before the signature kernel's
    # np.stack. r10 all-NULL axis.  The rerank norms are the JVM fold
    # (NOT a BLAS norm — bit-identity with the fold path), computed per
    # ROW here and echoed through the kernel, so the rerank pays one
    # dot fold per candidate pair instead of three (r12).
    q = with_buckets(
        queries.filter(vec_valid(vec_col)).select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
        ).withColumn("qn", norm(F.col("qv"))),
        "query_id",
        "qv",
        "qn",
    )
    c = with_buckets(
        corpus.filter(vec_valid(vec_col)).select(
            F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
        ).withColumn("cn", norm(F.col("cv"))),
        "neighbor_id",
        "cv",
        "cn",
    )
    candidates = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    sims = candidates.withColumn(
        "sim", cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


# ---------------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse-quantizer scale path
# ---------------------------------------------------------------------------


def _empty_topk(queries: DataFrame, corpus: DataFrame, id_col: str) -> DataFrame:
    """Typed empty (query_id, neighbor_id, sim, rank) frame — the answer
    every top-k kernel returns for a ZERO-ROW corpus (no index can be
    built, no vector has neighbors; DuckDB's replay oracles compute the
    same empty set). Id column types track the input frames so the
    schema is identical to the non-empty path's output."""
    qt = dict(queries.dtypes)[id_col]
    ct = dict(corpus.dtypes)[id_col]
    return queries.sparkSession.createDataFrame(
        [], f"query_id {qt}, neighbor_id {ct}, sim double, rank int"
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: partition the corpus into ``n_cells`` Voronoi cells around
    coarse centroids, probe only the ``n_probe`` nearest cells per query,
    exact-cosine re-rank inside the probed cells.

    Centroids are stride-sampled corpus vectors (deterministic — no
    k-means iterations, no RNG; refining them with Lloyd steps only
    improves cell balance, not the contract). One corpus pass assigns
    cells (argmax over centroid dot products, JVM higher-order
    functions); each query then touches ~n_probe/n_cells of the corpus —
    the inverted-file trade every vector database makes. Recall vs the
    exact baseline is pinned in tests.
    """
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    queries = queries.filter(vec_valid(vec_col))
    corpus = corpus.filter(vec_valid(vec_col))
    n_corpus = corpus.count()
    stride = max(1, n_corpus // n_cells)
    centroids = [
        (i, [float(x) for x in row.cv])
        for i, row in enumerate(
            corpus.select(
                F.col(id_col).alias("cid"), as_double_vec(vec_col).alias("cv")
            )
            .filter(F.pmod(F.col("cid"), F.lit(stride)) == 0)
            .orderBy("cid")
            .limit(n_cells)
            .collect()
        )
    ]  # ≤ n_cells rows on the driver — bounded, same pattern as the
    #    broadcast query matrix in topk_arrow
    if not centroids:
        # zero-row corpus: the centroid sample is empty and F.array()
        # of zero cell_sims structs types as VOID (array_max would fail
        # at analysis) — return the typed empty answer instead.  Note
        # the packed-DATA twin (ivf_topk_bcast) needs no guard: its
        # collect_list yields a typed empty array and the same plan
        # degrades to an empty result on its own.
        return _empty_topk(queries, corpus, id_col)

    def cell_sims(vec: Column) -> Column:
        """array<struct<sim,cell>> of dot products against every centroid
        (vectors are ~unit norm; dot order matches cosine order)."""
        return F.array(
            *[
                F.struct(
                    dot(vec, F.array(*[F.lit(x) for x in cv])).alias("sim"),
                    F.lit(ci).alias("cell"),
                )
                for ci, cv in centroids
            ]
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))  # per-row norm, not per-pair (r12)
    # nearest centroid = array_max over (sim, cell) structs — lexicographic
    # struct ordering makes this argmax with a deterministic tie-break
    c_cells = c.select(
        "neighbor_id", "cv", "cn",
        F.array_max(cell_sims(F.col("cv"))).getField("cell").alias("cell"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    # top n_probe cells per query: sort the struct array desc, slice, project
    q_probes = q.select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(cell_sims(F.col("qv")))), 1, n_probe),
                lambda s: s.getField("cell"),
            )
        ).alias("cell"),
    )
    candidates = (
        c_cells.join(F.broadcast(q_probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
    )
    sims = candidates.withColumn(
        "sim", cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def _packed_centroids_data(
    corpus: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> list:
    """Driver-side ``[(cell, [float, ...]), ...]`` stride-sampled
    centroids, in ONE Spark action (r12 — the former shape ran a
    ``count()`` action for the stride plus an eager ``localCheckpoint``
    action for the packed row; the stride is now derived IN-PLAN from a
    1-row count aggregate, the oracle's own ``params`` CTE shape, and
    the ≤n_cells sample rows are collected directly).  Values are
    bit-identical: the same integer stride, the same pmod sample, the
    same cid order; cell numbering is position in cid order exactly as
    the old ``row_number() - 1`` produced.  Driver state is the
    n_cells × d doubles the k-means-centroid rule already bounds."""
    cnt = corpus.agg(F.count("*").alias("__n"))
    stride = F.greatest(
        F.lit(1).cast("long"),
        (F.col("__n") / F.lit(n_cells)).cast("long"),
    )
    rows = (
        corpus.select(F.col(id_col).alias("cid"), as_double_vec(vec_col).alias("cv"))
        .crossJoin(F.broadcast(cnt))
        .filter(F.pmod(F.col("cid"), stride) == 0)
        .orderBy("cid")
        .limit(n_cells)
        .select("cv")
        .collect()
    )
    return [(i, [float(x) for x in r["cv"]]) for i, r in enumerate(rows)]


def _packed_frame(spark, cents: list) -> DataFrame:
    """The ONE-row ``cents array<struct<cell:int, cv:array<double>>>``
    frame from driver-side centroid data — a LocalRelation, so every
    consumer's 1-row broadcast attach carries NO corpus-scan lineage
    (what the former localCheckpoint existed to guarantee)."""
    return spark.createDataFrame(
        [(cents,)], "cents array<struct<cell:int, cv:array<double>>>"
    )


def _packed_centroids(
    corpus: DataFrame, n_cells: int, id_col: str, vec_col: str
) -> DataFrame:
    """ONE row holding ``cents array<struct<cell:int, cv:array<double>>>``
    — deterministic stride-sampled centroids packed as DATA so they
    attach to any frame via a 1-row broadcast instead of riding the plan
    as O(n_cells) literals. Array order is irrelevant to every consumer
    (argmax / sort by (sim, cell) structs)."""
    return _packed_frame(
        corpus.sparkSession,
        _packed_centroids_data(corpus, n_cells, id_col, vec_col),
    )


def _cell_sims(vec: Column) -> Column:
    """array<struct<sim,cell>> of dot products of ``vec`` against the
    packed ``cents`` column (larger cell wins exact sim ties under
    struct ordering — matches the plan-literal variant bit-for-bit)."""
    return F.transform(
        F.col("cents"),
        lambda s: F.struct(
            dot(vec, s.getField("cv")).alias("sim"),
            s.getField("cell").alias("cell"),
        ),
    )


def _assign_cells_kernel(cents: list, id_out: str, id_type: str, vec_out: str,
                         extra_cols: tuple = ()):
    """(mapInPandas fn, schema) computing nearest-centroid assignment
    with the EXACT arithmetic contract of the ``array_max(_cell_sims)``
    HOF path, vectorized over rows (r12 — the HOF fold is interpreted,
    ~n_cells·d lambda evaluations per row; this is n_cells·d elementwise
    numpy ops per BATCH):

    - each centroid dot is accumulated SEQUENTIALLY over dimensions
      (``acc += X[:, j] * C[k, j]``, elementwise IEEE float64 — the
      identical per-row op sequence as the zip_with/aggregate fold);
    - the argmax scans cells in ASCENDING cell order keeping ``>=``, so
      the LARGER cell wins exact ties — the array_max struct-ordering
      tie-break, bit-for-bit.

    Verified value-identical against the HOF path on the full fixture
    corpus.  ``extra_cols`` are echoed through unchanged."""
    import numpy as np
    import pandas as pd

    C = np.array([cv for _, cv in cents], dtype="float64")
    cell_ids = np.array([c for c, _ in cents], dtype="int64")
    order = np.argsort(cell_ids)  # ascending-cell scan order
    C, cell_ids = C[order], cell_ids[order]
    extra = ", ".join(f"{name} {typ}" for name, typ in extra_cols)
    schema = (
        f"{id_out} {id_type}, {vec_out} ARRAY<DOUBLE>"
        + (f", {extra}" if extra else "")
        + ", cell INT"
    )

    def assign(batches):
        for b in batches:
            if not len(b):
                continue
            X = np.stack(b[vec_out].to_numpy()).astype("float64")
            n = len(X)
            sims = np.zeros((n, C.shape[0]))
            for j in range(C.shape[1]):
                sims += X[:, j : j + 1] * C[:, j][None, :]
            best = np.full(n, -1, dtype="int64")
            bestv = np.full(n, -np.inf)
            for k in range(C.shape[0]):
                m = sims[:, k] >= bestv
                best[m] = cell_ids[k]
                bestv[m] = sims[m, k]
            out = {id_out: b[id_out], vec_out: b[vec_out]}
            out.update({name: b[name] for name, _ in extra_cols})
            out["cell"] = best.astype("int32")
            yield pd.DataFrame(out)

    return assign, schema


def assign_cells(
    vectors: DataFrame,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id, v, cell): each vector labelled with its nearest stride-sampled
    centroid via the packed-broadcast attach — zero shuffles, plan size
    O(1) in n_cells. The coarse-quantizer assignment shared by IVF search
    and semantic (SemDeDup-style) dedup."""
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    vectors = vectors.filter(vec_valid(vec_col))
    v = vectors.select(F.col(id_col).alias("id"), as_double_vec(vec_col).alias("v"))
    packed = _packed_centroids(vectors, n_cells, id_col, vec_col)
    return (
        v.crossJoin(F.broadcast(packed))
        .withColumn("cell", F.array_max(_cell_sims(F.col("v"))).getField("cell"))
        .drop("cents")
    )


def semantic_dedup_pairs(
    vectors: DataFrame,
    threshold: float,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_rows: int = 1024,
) -> DataFrame:
    """SemDeDup-style semantic near-dup pairs: bucket every vector into
    its nearest-centroid cell, then emit cosine-≥-threshold pairs WITHIN
    cells only. The scale contract: pair candidates are Σ n_c²/2 over
    cell sizes (n_cells ≈ √N keeps cells ~√N), never the corpus-wide n²/2
    of the brute-force ``cosine_pairs`` — the trade is recall limited to
    same-cell pairs, which is the published SemDeDup design (near-dups
    share a cluster by construction of the embedding space). Assignment
    is the zero-shuffle packed-broadcast attach; pair emission is ONE
    ``applyInPandas`` over the cell key (one shuffle) computing each
    cell's pair block by BLAS matmul — the r6 treatment that took the
    brute-force twin from 78 s to 0.55 s applied per cell (the HOF
    self-join it replaces evaluated a d-term fold per PAIR).

    Hot-cell memory contract (ADVICE r6-1): a whole cell of m rows
    does land in one Python worker — applyInPandas groups are
    indivisible, AQE can NOT split them — so the matmul is CHUNKED:
    only a ``block_rows``×m slice of the similarity matrix is live at
    once (O(block_rows·m·8B), ~0.8 GB at m=100k with the default
    1024-row block) instead of the dense m×m (80 GB at m=100k) a
    single ``N @ N.T`` would allocate. The m×d input matrix itself is
    the irreducible per-group footprint (~50 MB at m=100k, d=64); a
    corpus whose single hottest cell outgrows THAT needs more cells
    (n_cells ≈ √N keeps cells ~√N) — re-celling, not salting, is the
    escape that preserves the same-cell recall contract.
    Deterministic end-to-end → fully DuckDB-replayable (same
    centroid/argmax contract as ivf_topk)."""
    import numpy as np
    import pandas as pd

    # NULL vectors carry no geometry — drop them JVM-side before cell
    # assignment (scan-pushed; keeps NULL rows out of both the stride
    # centroid sample and the pair kernel's np.stack). r10 all-NULL axis.
    vectors = vectors.filter(vec_valid(vec_col))
    assigned = assign_cells(vectors, n_cells, id_col, vec_col)

    def cell_pairs(pdf: "pd.DataFrame") -> "pd.DataFrame":
        if len(pdf) < 2:
            return pd.DataFrame(
                {"cell": [], "id_a": [], "id_b": [], "sim": []}
            ).astype({"cell": "int64", "id_a": "int64", "id_b": "int64",
                      "sim": "float64"})
        order = np.argsort(pdf["id"].to_numpy())
        ids = pdf["id"].to_numpy()[order]
        X = np.stack(pdf["v"].to_numpy()[order]).astype("float64")
        nrm = np.linalg.norm(X, axis=1)
        nrm[nrm == 0] = 1.0
        N = X / nrm[:, None]
        m = len(ids)
        cell = int(pdf["cell"].iloc[0])
        cols = np.arange(m)
        chunks = []
        for s in range(0, m, block_rows):
            e = min(s + block_rows, m)
            Sb = N[s:e] @ N.T  # block_rows × m slice — never m × m
            keep = (Sb >= threshold) & (cols[None, :] > np.arange(s, e)[:, None])
            bi, bj = np.nonzero(keep)
            chunks.append(pd.DataFrame(
                {
                    "cell": np.full(len(bi), cell),
                    "id_a": ids[s + bi],
                    "id_b": ids[bj],
                    "sim": Sb[bi, bj],
                }
            ))
        return pd.concat(chunks, ignore_index=True)

    return (
        assigned.select("cell", "id", "v")
        .groupBy("cell")
        .applyInPandas(
            cell_pairs, schema="cell BIGINT, id_a BIGINT, id_b BIGINT, sim DOUBLE"
        )
        .select("cell", "id_a", "id_b", F.round("sim", 6).alias("sim"))
    )


def ivf_topk_bcast(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN, broadcast-centroid variant — same contract and same
    results as :func:`ivf_topk`, different physical shape.

    ``ivf_topk`` inlines centroids as plan literals: fine at n_cells=16,
    but at a realistic coarse-quantizer size (n_cells ≈ √N — tens of
    thousands at 100 TB) the expression tree and codegen blow up
    (VERDICT r3 "What's wrong" #4). Here the centroid table rides as
    DATA, not plan — plan size is O(1) in n_cells and the corpus never
    shuffles.  r12 physical shape: the ≤n_cells sample is collected in
    ONE bounded action (k-means-centroid rule); the QUERY side attaches
    it as a 1-row LocalRelation broadcast (the tpch_full threshold
    pattern) and selects probes via higher-order functions, while the
    100 TB-side corpus assignment runs the vectorized Arrow kernel
    (``_assign_cells_kernel`` — bit-identical fold order and argmax
    tie-break, centroid matrix in the task closure, the
    cosine_pairs_blas precedent; the former interpreted-HOF attach
    evaluated n_cells × d lambda steps per corpus row and dominated the
    entry).

    Determinism matches ivf_topk bit-for-bit: argmax over (sim, cell)
    with larger cell winning exact ties, probe order via descending
    (sim, cell) sort.
    """
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    queries = queries.filter(vec_valid(vec_col))
    corpus = corpus.filter(vec_valid(vec_col))
    cents = _packed_centroids_data(corpus, n_cells, id_col, vec_col)
    packed = _packed_frame(corpus.sparkSession, cents)
    cell_sims = _cell_sims

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    ).withColumn("cn", norm(F.col("cv")))  # per-row norm, not per-pair (r12)
    if cents:
        # r12: corpus-side cell assignment via the vectorized kernel —
        # bit-identical fold order and tie-break (see
        # _assign_cells_kernel); the interpreted HOF evaluated
        # n_cells × d lambda steps per corpus row and dominated the
        # entry.  The centroid matrix rides the task closure (the
        # cosine_pairs_blas precedent) — n_cells × d doubles, the same
        # payload the broadcast attach carried.
        id_type = dict(c.dtypes)["neighbor_id"]
        kernel, schema = _assign_cells_kernel(
            cents, "neighbor_id", id_type, "cv", (("cn", "DOUBLE"),)
        )
        c_cells = c.mapInPandas(kernel, schema=schema)
    else:
        # degenerate empty-sample regime: keep the exact original plan
        # (empty cents array → NULL cell → no candidates)
        c_cells = (
            c.crossJoin(F.broadcast(packed))
            .withColumn(
                "cell", F.array_max(cell_sims(F.col("cv"))).getField("cell")
            )
            .drop("cents")
        )
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
    ).withColumn("qn", norm(F.col("qv")))
    q_probes = q.crossJoin(F.broadcast(packed)).select(
        "query_id",
        "qv",
        "qn",
        F.explode(
            F.transform(
                F.slice(F.reverse(F.array_sort(cell_sims(F.col("qv")))), 1, n_probe),
                lambda s: s.getField("cell"),
            )
        ).alias("cell"),
    )
    candidates = (
        c_cells.join(F.broadcast(q_probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "qv", "qn", "neighbor_id", "cv", "cn")
    )
    sims = candidates.withColumn(
        "sim", cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def label_centroids(
    vectors: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Element-wise mean embedding per label — class centroids, the
    aggregation behind IVF coarse quantizers, per-class prototypes, and
    embedding-drift monitoring. posexplode → groupBy (label, position) →
    avg: partial aggregation map-side, shuffle carries one row per
    (label, dim) — corpus-size-independent."""
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    vectors = vectors.filter(vec_valid(vec_col))
    ex = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(as_double_vec(vec_col)).alias("pos", "val"),
    )
    return ex.groupBy("label", "pos").agg(F.round(F.avg("val"), 6).alias("c"))


def normalize_quantize(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """L2-normalize an embedding column and int8-quantize it
    (q = round(127 * x / ||v||)) — the standard storage/ANN-index prep
    for a trained-embedding corpus. Pure per-row expressions (transform/
    aggregate HOFs): embarrassingly parallel, zero shuffles; the norm is
    rounded to 6 decimals for output (accumulation-order ulp) while the
    quantizer divides by the raw norm."""
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    df = df.filter(vec_valid(vec_col))
    # r12 optimization: materialize the norm as its OWN projection so
    # the quantizer lambda references an attribute, not the fold
    # expression — inlined, the d-term norm fold was re-evaluated for
    # EVERY transform element (O(d²) per row, and HOF folds are
    # interpreted).  The alias is non-cheap and referenced twice, so
    # CollapseProject keeps it materialized.  Values are bit-identical:
    # same fold, evaluated once.
    base = df.select(
        F.col(id_col), as_double_vec(vec_col).alias("__v")
    ).withColumn("__nrm", norm(F.col("__v")))
    return base.select(
        F.col(id_col),
        F.round(F.col("__nrm"), 6).alias("l2_norm"),
        F.transform(
            F.col("__v"), lambda x: F.round(x / F.col("__nrm") * 127).cast("int")
        ).alias("q8"),
    )


def pq_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    n_subspaces: int = 8,
    n_cells: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Product-quantization ANN (the vector-database compression path):
    split each d-dim vector into ``n_subspaces`` slices, quantize every
    slice to its nearest (stride-sampled, deterministic) centroid slice,
    and score candidates by ADC — the sum of per-subspace dot products
    between the QUERY slice and the CODEBOOK slice the neighbor's code
    points at. The corpus is represented by n_subspaces small ints per
    vector (codes), not floats: at 100 TB the scan that scores
    candidates reads ~1/32nd of the bytes a full-precision re-rank
    would, which is the entire point of PQ.

    Scale shape: codebook = the packed 1-row broadcast (shared with IVF);
    encoding is a zero-shuffle map pass; scoring joins the (tiny) query
    set in by broadcast and ranks per query. Deterministic end-to-end —
    stride centroids, struct-ordered argmax (larger cell wins ties),
    fixed ascending-subspace summation — so DuckDB replays codes AND ADC
    scores exactly.
    """
    from functools import reduce

    # NULL vectors carry no geometry — not encodable, not candidates;
    # drop JVM-side (scan-pushed). Also keeps the dimension probe below
    # from landing on a NULL head row. r10 all-NULL axis.
    corpus = corpus.filter(vec_valid(vec_col))
    queries = queries.filter(vec_valid(vec_col))
    cents = _packed_centroids_data(corpus, n_cells, id_col, vec_col)
    if cents:
        d = len(cents[0][1])  # centroids come FROM the corpus
    else:
        head = corpus.select(vec_col).first()  # bounded 1-row fetch
        if head is None:
            # zero-row corpus: no dimension, no codebook — empty answer
            return _empty_topk(queries, corpus, id_col)
        d = len(head[0])
    if d % n_subspaces:
        raise ValueError(f"dim {d} not divisible by {n_subspaces} subspaces")
    w = d // n_subspaces
    packed = _packed_frame(corpus.sparkSession, cents)

    def sub(vec: Column, s: int) -> Column:
        return F.slice(vec, s * w + 1, w)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), as_double_vec(vec_col).alias("cv")
    )
    if cents:
        # r12: the encoding pass (n_subspaces × n_cells width-w dots per
        # corpus row, formerly interpreted HOF folds — the dominant cost
        # of the entry) runs in the vectorized Arrow kernel with the
        # IDENTICAL arithmetic contract: each subspace dot accumulates
        # sequentially over its slice's dimensions (elementwise IEEE
        # float64, same per-row op sequence as the fold), argmax scans
        # cells ascending keeping >= so the larger cell wins exact ties
        # (array_max struct ordering).  Codebook rides the task closure.
        import numpy as np
        import pandas as pd

        C = np.array([cv for _, cv in cents], dtype="float64")
        cell_ids = np.array([cl for cl, _ in cents], dtype="int64")
        corder = np.argsort(cell_ids)
        C, cell_ids = C[corder], cell_ids[corder]
        id_type = dict(c.dtypes)["neighbor_id"]
        code_schema = f"neighbor_id {id_type}, " + ", ".join(
            f"code_{s} INT" for s in range(n_subspaces)
        )

        def encode(batches):
            for b in batches:
                if not len(b):
                    continue
                X = np.stack(b["cv"].to_numpy()).astype("float64")
                n = len(X)
                out = {"neighbor_id": b["neighbor_id"]}
                for s in range(n_subspaces):
                    sims = np.zeros((n, C.shape[0]))
                    for j in range(s * w, (s + 1) * w):
                        sims += X[:, j : j + 1] * C[:, j][None, :]
                    best = np.full(n, -1, dtype="int64")
                    bestv = np.full(n, -np.inf)
                    for k in range(C.shape[0]):
                        m = sims[:, k] >= bestv
                        best[m] = cell_ids[k]
                        bestv[m] = sims[m, k]
                    out[f"code_{s}"] = best.astype("int32")
                yield pd.DataFrame(out)

        codes = c.mapInPandas(encode, schema=code_schema)
    else:
        # degenerate empty-sample regime: exact original plan (NULL
        # codes from the empty cents array)
        def _subspace_sims(s: int):
            # one-arg lambda factory (a two-arg lambda would receive
            # the array INDEX as its second argument, clobbering s)
            return lambda cc: F.struct(
                dot(sub(F.col("cv"), s), sub(cc["cv"], s)).alias("sim"),
                cc["cell"].alias("cell"),
            )

        code_cols = [
            F.array_max(F.transform(F.col("cents"), _subspace_sims(s)))[
                "cell"
            ].alias(f"code_{s}")
            for s in range(n_subspaces)
        ]
        codes = c.crossJoin(F.broadcast(packed)).select(
            "neighbor_id", *code_cols
        )

    # ADC lookup tables, the published PQ trick: sim(query, code) only
    # depends on (query, subspace, cell), so the n_queries x n_subspaces
    # x n_cells dot products are computed ONCE on the broadcast query
    # frame and the per-candidate scan does 8 array lookups instead of 8
    # width-w dot products (~w x less work on the 100 TB side). LUT s is
    # sorted by cell (unique), so element_at(lut_s, code_s + 1) is the
    # cell's value; the summands and their ascending-s order are
    # IDENTICAL to the direct formulation, so scores stay bit-equal and
    # the DuckDB replay oracle is unchanged.
    def _lut_entry(s: int):
        # one-arg lambda factory: a two-arg lambda would make F.transform
        # pass the ARRAY INDEX as the second argument, clobbering s
        return lambda cc: F.struct(
            cc["cell"].alias("cell"),
            dot(sub(F.col("qv"), s), sub(cc["cv"], s)).alias("v"),
        )

    lut_cols = [
        F.transform(
            F.array_sort(F.transform(F.col("cents"), _lut_entry(s))),
            lambda x: x["v"],
        ).alias(f"lut_{s}")
        for s in range(n_subspaces)
    ]
    q = (
        queries.select(
            F.col(id_col).alias("query_id"), as_double_vec(vec_col).alias("qv")
        )
        .crossJoin(F.broadcast(packed))
        .select("query_id", *lut_cols)
    )
    cand = codes.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    )
    parts = [
        F.element_at(F.col(f"lut_{s}"), F.col(f"code_{s}") + 1)
        for s in range(n_subspaces)
    ]
    adc = reduce(lambda a, b: a + b, parts)  # fixed ascending-s order
    sims = cand.withColumn("sim", adc)
    rank_w = W.partitionBy("query_id").orderBy(F.col("sim").desc(), F.col("neighbor_id"))
    return (
        sims.withColumn("rank", F.row_number().over(rank_w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", F.round("sim", 6).alias("sim"), "rank")
    )


def binary_hamming_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Binary-quantization ANN: 1-bit sign codes + Hamming shortlist +
    exact cosine rerank — the modern embedding-compression serving
    pattern (a 64-dim float vector becomes ONE 64-bit word; memory
    drops 32x and candidate scoring becomes bit_count(xor), one cycle
    per candidate instead of a 64-term dot product).

    Shape: corpus codes are a scan-side HOF over the vector (no
    shuffle); the broadcast query side carries both code and full
    vector, so the Hamming shortlist AND the rerank ride ONE pass over
    the corpus — the full-precision corpus vector is only touched for
    the ``shortlist`` survivors per query. Deterministic end to end:
    sign bits of identical floats, integer Hamming, the same cosine
    expression as brute_force_topk, ties broken by neighbor id."""
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    queries = queries.filter(vec_valid(vec_col))
    corpus = corpus.filter(vec_valid(vec_col))
    weights = [(2**i if i < 63 else -(2**63)) for i in range(64)]
    warr = F.array(*[F.lit(w).cast("long") for w in weights])

    def code(vec: Column) -> Column:
        bits = F.zip_with(
            as_double_vec(vec) if isinstance(vec, str) else vec,
            warr,
            lambda x, w: F.when(x > 0, w).otherwise(F.lit(0).cast("long")),
        )
        return F.aggregate(bits, F.lit(0).cast("long"), lambda a, x: a + x)

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_vec(vec_col).alias("qv"),
        )
        .withColumn("qcode", code(F.col("qv")))
        .withColumn("qn", norm(F.col("qv")))  # per-row norm (r12)
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double_vec(vec_col).alias("cv"),
        )
        .withColumn("ccode", code(F.col("cv")))
        .withColumn("cn", norm(F.col("cv")))
    )
    cand = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "hamming",
            F.bit_count(F.col("qcode").bitwiseXOR(F.col("ccode"))).cast(
                "long"
            ),
        )
    )
    ws = W.partitionBy("query_id").orderBy("hamming", "neighbor_id")
    short = cand.withColumn("srank", F.row_number().over(ws)).filter(
        F.col("srank") <= shortlist
    )
    rerank = short.withColumn(
        "sim", cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "hamming",
            F.round("sim", 6).alias("sim"),
            "rank",
        )
    )


def sq8_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    shortlist: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Scalar-quantization (SQ8) ANN: per-dimension min-max int8 codes
    + integer-dot shortlist + exact cosine rerank — the 4x-compression
    middle rung of the quantization ladder (binary 32x lossy, PQ
    codebook-lossy, SQ8 nearly lossless), and what vector stores ship
    as their default compressed tier.

    Per-dim stats come from ONE posexplode pass over the corpus,
    packed into a single-row (mins, spans) frame that rides a 1-row
    broadcast to both sides — plan size O(1) in dimensionality, the
    same packing discipline as the IVF/PQ paths. Codes are scan-side
    index-HOFs (no shuffle); code_i = floor((x-mn_i)/span_i + 0.5) is
    a round-to-integer of identical doubles, which both engines agree
    on exactly. The shortlist metric is the PURE-BIGINT code dot —
    dot in per-dim min-max normalized space, a rank proxy made exact
    by the full-precision rerank of its ``shortlist`` survivors —
    so shortlist membership has ZERO float sensitivity and the only
    doubles in the pipeline are the final reranked cosines (the same
    expression brute_force_topk gates). Ties break on neighbor id at
    both stages."""
    # vector-geometry contract v2 (r12): corrupt vectors dropped
    queries = queries.filter(vec_valid(vec_col))
    corpus = corpus.filter(vec_valid(vec_col))
    dim = 64
    vstats = (
        corpus.select(
            F.posexplode(as_double_vec(vec_col)).alias("pos", "x")
        )
        .groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .agg(
            F.array_sort(
                F.collect_list(F.struct("pos", "mn", "mx"))
            ).alias("s")
        )
        .select(
            F.transform("s", lambda t: t.mn).alias("mins"),
            F.transform(
                "s",
                lambda t: F.when(
                    t.mx > t.mn, (t.mx - t.mn) / F.lit(255.0)
                ).otherwise(F.lit(0.0)),
            ).alias("spans"),
        )
    )

    def code(vec: Column) -> Column:
        return F.transform(
            vec,
            lambda x, i: F.when(
                F.element_at(F.col("spans"), i + 1) > 0,
                F.floor(
                    (x - F.element_at(F.col("mins"), i + 1))
                    / F.element_at(F.col("spans"), i + 1)
                    + F.lit(0.5)
                ).cast("long"),
            ).otherwise(F.lit(0).cast("long")),
        )

    q = (
        queries.select(
            F.col(id_col).alias("query_id"),
            as_double_vec(vec_col).alias("qv"),
        )
        .crossJoin(F.broadcast(vstats))
        .withColumn("qcode", code(F.col("qv")))
        .withColumn("qn", norm(F.col("qv")))  # per-row norm (r12)
        .select("query_id", "qv", "qcode", "qn")
    )
    c = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double_vec(vec_col).alias("cv"),
        )
        .crossJoin(F.broadcast(vstats))
        .withColumn("ccode", code(F.col("cv")))
        .withColumn("cn", norm(F.col("cv")))
        .select("neighbor_id", "cv", "ccode", "cn")
    )
    cand = c.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).withColumn(
        "approx",
        F.aggregate(
            F.zip_with(
                F.col("qcode"), F.col("ccode"), lambda a, b: a * b
            ),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ),
    )
    ws = W.partitionBy("query_id").orderBy(
        F.col("approx").desc(), "neighbor_id"
    )
    short = cand.withColumn("srank", F.row_number().over(ws)).filter(
        F.col("srank") <= shortlist
    )
    rerank = short.withColumn(
        "sim", cosine_pre(F.col("qv"), F.col("cv"), F.col("qn"), F.col("cn"))
    )
    w = W.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id")
    )
    return (
        rerank.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "approx",
            F.round("sim", 6).alias("sim"),
            "rank",
        )
    )
