"""Fixture-margin tripwires (ADVICE r6-4): the LSH / BLAS-cosine
oracle gates compare values computed with DIFFERENT summation orders
(Spark sequential fold or BLAS pairwise matmul vs DuckDB
list_dot_product / list_cosine_similarity internals), so a decision
boundary crossed within float-error distance would flip on one engine
only and the hash gate would flake. Engine-to-engine disagreement on a
64-term double dot product is bounded by ~1e-13; these tests assert
every boundary-adjacent quantity in the CURRENT fixtures sits orders
of magnitude further away, so a future fixture regeneration that lands
near a boundary fails HERE, loudly, instead of flaking in the driver
gate.

Boundaries pinned (measured minima at r7 in parentheses):

- sim_ann_lsh bucket bit: sign of hyperplane projection.
  min |proj| over all vectors x 8 tables x 4 planes: 1.7e-7 at sf0.1.
- dedup_embedding_cosine / dedup_semantic_cells emission: sim >= 0.4.
  min |sim - 0.4| over all pairs: 9.9e-6 at sf0.1.
- every rounded output sim: round(sim, 6) half-way points. Only
  EMITTED sims are rounded (pairs >= threshold; near-top-k candidate
  sims), so the assertion covers those sets: min distance from a
  x.5e-6 midpoint 3.2e-11 at sf0.1 — 300x the engine delta.
- assign_cells argmax (semantic cells n_cells=8, IVF 16/64): gap
  between the best and second-best cell dot product per vector.

All computed WITHOUT Spark (pyarrow + numpy) so the file runs in
seconds and is independent of the engine under test.
"""

from __future__ import annotations

import numpy as np
import pyarrow.parquet as pq
import pytest

from hive_release_spark.llm.similarity import _hyperplanes

SF_DIRS = ("/root/testdata/sf0.001", "/root/testdata/sf0.01",
           "/root/testdata/sf0.1")

# engine-to-engine float disagreement on d=64 dots is ~1e-13; margins
# below are >= 10x that so "passes here" implies "cannot flip there"
PROJ_EPS = 1e-9
THRESHOLD_EPS = 1e-9
MIDPOINT_EPS = 1e-12
ARGMAX_GAP_EPS = 1e-9


def _load(sf_dir: str):
    t = pq.read_table(f"{sf_dir}/embeddings.parquet").to_pandas()
    ids = t["vec_id"].to_numpy()
    X = np.stack(t["embedding"].to_numpy()).astype("float64")
    return ids, X


def _normalized(X: np.ndarray) -> np.ndarray:
    nrm = np.linalg.norm(X, axis=1)
    nrm[nrm == 0] = 1.0
    return X / nrm[:, None]


def _midpoint_dist(sims: np.ndarray) -> float:
    """Distance (in sim units) from the nearest x.5 * 1e-6 rounding
    half-way point of round(sim, 6)."""
    if not len(sims):
        return float("inf")
    frac = np.abs(sims * 1e6 - np.floor(sims * 1e6) - 0.5)
    return float(frac.min() * 1e-6)


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_lsh_projection_sign_margin(sf_dir):
    _, X = _load(sf_dir)
    d = X.shape[1]
    worst = np.inf
    for table in range(8):
        planes = np.array(_hyperplanes(d, 4, table))
        worst = min(worst, np.abs(X @ planes.T).min())
    assert worst > PROJ_EPS, (
        f"{sf_dir}: a hyperplane projection sits {worst:.2e} from zero — "
        "the sim_ann_lsh bucket bit can flip between engines; regenerate "
        "or nudge the fixture"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_cosine_threshold_and_rounding_margins(sf_dir):
    ids, X = _load(sf_dir)
    N = _normalized(X)
    S = N @ N.T
    iu, ju = np.triu_indices(len(ids), k=1)
    sims = S[iu, ju]

    margin = np.abs(sims - 0.4).min()
    assert margin > THRESHOLD_EPS, (
        f"{sf_dir}: a pair sim sits {margin:.2e} from the 0.4 emission "
        "threshold — dedup_embedding_cosine/dedup_semantic_cells can "
        "emit the pair on one engine only"
    )

    # rounded outputs: (a) emitted pairs, (b) near-top-k candidate sims
    # for the query set vec_id < 20 (top-8 covers the rank-5 cut with
    # tie slack)
    out = sims[sims >= 0.4]
    mid = _midpoint_dist(out)
    assert mid > MIDPOINT_EPS, (
        f"{sf_dir}: an emitted pair sim sits {mid:.2e} from a round(.,6) "
        "half-way point — engines can round to different values"
    )

    q = np.where(ids < 20)[0]
    Sq = S[q].copy()
    Sq[np.arange(len(q)), q] = -np.inf  # exclude self
    top = np.sort(Sq, axis=1)[:, -8:]
    mid_top = _midpoint_dist(top.ravel())
    assert mid_top > MIDPOINT_EPS, (
        f"{sf_dir}: a near-top-k sim sits {mid_top:.2e} from a "
        "round(.,6) half-way point"
    )


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("n_cells", (8, 16, 64))
def test_cell_argmax_gap(sf_dir, n_cells):
    """assign_cells picks argmax over raw dot products against
    stride-sampled centroids (larger cell wins exact ties); a top-2 gap
    inside float error would assign the vector to different cells per
    engine, changing which pairs are candidates at all."""
    ids, X = _load(sf_dir)
    stride = max(1, len(ids) // n_cells)
    cent_ids = np.sort(ids[ids % stride == 0])[:n_cells]
    order = {v: i for i, v in enumerate(ids)}
    C = X[[order[c] for c in cent_ids]]
    sims = X @ C.T
    top2 = np.sort(sims, axis=1)[:, -2:]
    gap = float((top2[:, 1] - top2[:, 0]).min())
    assert gap > ARGMAX_GAP_EPS, (
        f"{sf_dir} n_cells={n_cells}: best/second-best cell dots differ "
        f"by {gap:.2e} — cell assignment can flip between engines"
    )


# ----------------------------------------- quantized recurrences

# The oracle-gated iterative entries (emb_kmeans, emb_pca_project)
# snap state to a shared grid each round precisely so float drift
# cannot compound — but each SNAP is itself a boundary: round(avg, 6)
# flips when avg*1e6 sits a hair from x.5 (and Spark HALF_UP vs DuckDB
# binary rounding genuinely differ THERE), floor(x*1e6 + 0.5) flips
# when x*1e6+0.5 grazes an integer, and the argmin assignment flips
# when two centroid distances collide. Same tripwire discipline: a
# margin measured in micro-units must clear the ~1e-7-micro engine
# delta by orders of magnitude. (Measured r7 minima: kmeans round
# 4.4e-5, argmin gap 6.1e-6, power-iter floor 2.5e-4.)

KMEANS_ROUND_EPS = 1e-6    # micro-units distance from the x.5 boundary
ARGMIN_GAP_EPS = 1e-9      # squared-L2 gap between best two centroids
FLOOR_GRID_EPS = 1e-6      # micro-units distance from the floor flip


def _sorted_X(sf_dir: str) -> np.ndarray:
    t = (
        pq.read_table(f"{sf_dir}/embeddings.parquet")
        .to_pandas()
        .sort_values("vec_id")
    )
    return np.stack(t["embedding"].to_numpy()).astype("float64")


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_kmeans_round_and_argmin_margins(sf_dir):
    """Replays kmeans_assign's exact trajectory (k=8, n_iter=3 — the
    emb_kmeans entry) and asserts every centroid-mean rounding input
    and every point's best-vs-second centroid distance gap sits far
    from its flip boundary."""
    X = _sorted_X(sf_dir)
    k, n_iter = 8, 3
    cents = [X[i].copy() for i in range(k)]
    for it in range(n_iter + 1):
        D = ((X[:, None, :] - np.array(cents)[None, :, :]) ** 2).sum(axis=2)
        Ds = np.sort(D, axis=1)
        gap = float((Ds[:, 1] - Ds[:, 0]).min())
        assert gap > ARGMIN_GAP_EPS, (
            f"{sf_dir} iter {it}: centroid argmin gap {gap:.2e} — "
            "assignment can flip between engines"
        )
        if it == n_iter:
            break
        assign = D.argmin(axis=1)
        new = []
        for c in range(k):
            members = X[assign == c]
            if len(members):
                avg = members.mean(axis=0)
                frac = np.abs(avg * 1e6 - np.floor(avg * 1e6) - 0.5)
                m = float(frac.min())
                assert m > KMEANS_ROUND_EPS, (
                    f"{sf_dir} iter {it} cluster {c}: centroid mean sits "
                    f"{m:.2e} micro-units from the round(.,6) boundary"
                )
                new.append(np.round(avg, 6))
            else:
                new.append(cents[c])
        cents = new


@pytest.mark.parametrize("sf_dir", SF_DIRS)
def test_power_iteration_floor_margins(sf_dir):
    """Replays power_iteration_project's exact quantized trajectory
    (n_iter=6, nq=20 — the emb_pca_project entry) and asserts every
    floor(x*1e6 + 0.5) input — the mean, each iterate, each normalized
    iterate, the output projections — sits far from an integer of the
    shifted grid."""
    import math

    X = _sorted_X(sf_dir)
    d = X.shape[1]
    q = lambda a: np.floor(a * 1e6 + 0.5) / 1e6  # noqa: E731

    def check(vals, what):
        z = np.asarray(vals) * 1e6 + 0.5
        m = float(np.abs(z - np.rint(z)).min())
        assert m > FLOOR_GRID_EPS, (
            f"{sf_dir} {what}: value sits {m:.2e} micro-units from the "
            "floor flip boundary"
        )

    mean_raw = X.mean(axis=0)
    check(mean_raw, "mean")
    Xc = X - q(mean_raw)
    v = np.full(d, 1.0 / math.sqrt(d))
    for it in range(6):
        dots = Xc @ v
        w_raw = (Xc * dots[:, None]).mean(axis=0)
        check(w_raw, f"iterate {it}")
        w = q(w_raw)
        nrm = math.sqrt(float((w * w).sum()))
        check(w / nrm, f"normalized iterate {it}")
        v = q(w / nrm)
    check(Xc[:20] @ v, "projections")


# ---------------------------------------- parameter drift guard


def test_margin_constants_match_entry_registrations():
    """ADVICE r7-4: the margin tests above hard-code the boundary
    parameters they guard; if a registry entry's parameters drift, the
    tripwire would silently keep testing the OLD boundary. Pin the
    coupling: the constants used here must equal the defaults /
    call-site literals of the registered entries."""
    import inspect

    from hive_release_spark.llm.clustering import (
        _PI_QUANT,
        kmeans_assign,
        power_iteration_project,
    )
    from hive_release_spark.llm.similarity import lsh_bucket_topk
    from hive_release_spark.queries import REGISTRY

    # sim_ann_lsh: 8 tables x 4 planes (tested: range(8), n_planes=4)
    sig = inspect.signature(lsh_bucket_topk)
    assert sig.parameters["n_planes"].default == 4
    assert sig.parameters["n_tables"].default == 8
    lsh_src = inspect.getsource(REGISTRY["sim_ann_lsh"].fn)
    assert "n_planes=" not in lsh_src and "n_tables=" not in lsh_src, (
        "sim_ann_lsh overrides LSH defaults — update the margin test"
    )

    # cosine pair emission threshold 0.4; semantic cells n_cells=8
    assert "threshold=0.4" in inspect.getsource(
        REGISTRY["dedup_embedding_cosine"].fn
    )
    cells_src = inspect.getsource(REGISTRY["dedup_semantic_cells"].fn)
    assert "threshold=0.4" in cells_src and "n_cells=8" in cells_src

    # IVF cell counts exercised by test_cell_argmax_gap
    assert "n_cells=16" in inspect.getsource(REGISTRY["sim_ann_ivf"].fn)
    assert "n_cells=64" in inspect.getsource(
        REGISTRY["sim_ann_ivf_bcast"].fn
    )

    # kmeans k=8, n_iter=3 (emb_kmeans pins them explicitly)
    ksig = inspect.signature(kmeans_assign)
    assert ksig.parameters["k"].default == 8
    assert ksig.parameters["n_iter"].default == 3
    km_src = inspect.getsource(REGISTRY["emb_kmeans"].fn)
    assert "k=8" in km_src and "n_iter=3" in km_src, (
        "emb_kmeans parameters drifted — update the margin test"
    )

    # power iteration n_iter=6, 1e-6 grid
    psig = inspect.signature(power_iteration_project)
    assert psig.parameters["n_iter"].default == 6
    assert _PI_QUANT == 1_000_000.0
