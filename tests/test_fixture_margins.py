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
