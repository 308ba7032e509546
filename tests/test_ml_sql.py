"""Reference-implementation parity for the in-engine ML operators
(queries/ml_sql.py): the aggregate-algebra formulations must agree
with plain numpy / sequential-Python implementations of the textbook
definitions — the oracle gate proves Spark == DuckDB; these prove
both == the math."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def test_linear_regression_matches_numpy_lstsq(spark):
    """Cramer-solved normal equations == numpy least squares on the
    identical integer design matrix, and R^2 lies in [0, 1]."""
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("x1"),
            F.round(F.col("l_discount") * 100).cast("long").alias("x2"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    X = np.array([[1.0, r["x1"], r["x2"]] for r in rows])
    y = np.array([float(r["y"]) for r in rows])
    beta, _, _, _ = np.linalg.lstsq(X, y, rcond=None)
    out = REGISTRY["ml_linear_regression"].fn(spark, SF_SMOKE).collect()[0]
    assert abs(out["b0_milli"] / 1000 - beta[0] / 100) < 0.01, (
        out,
        beta,
    )
    assert abs(out["b1_milli"] / 1000 - beta[1] / 100) < 0.01
    assert abs(out["b2_milli"] / 1000 - beta[2] / 100) < 0.01
    assert 0 <= out["r2_e5"] <= 100000


def test_decision_stump_matches_bruteforce_gini(spark):
    """The windowed split search == brute-force enumeration of every
    threshold in plain Python (winner feature, threshold, and Gini)."""
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("q"),
            F.round(F.col("l_discount") * 100).cast("long").alias("d"),
            F.when(F.col("l_extendedprice") >= 30000, 1)
            .otherwise(0)
            .alias("y"),
        )
        .collect()
    )

    def best_split(vals):
        pts = sorted(vals)
        n_t = len(pts)
        pos_t = sum(y for _, y in pts)
        best = None
        nl = posl = 0
        i = 0
        while i < n_t:
            v = pts[i][0]
            while i < n_t and pts[i][0] == v:
                nl += 1
                posl += pts[i][1]
                i += 1
            if nl == n_t:
                break
            nr, posr = n_t - nl, pos_t - posl
            gini = (nl / n_t) * (
                1 - (posl / nl) ** 2 - ((nl - posl) / nl) ** 2
            ) + (nr / n_t) * (1 - (posr / nr) ** 2 - ((nr - posr) / nr) ** 2)
            cand = (gini, v, nl, posl)
            if best is None or cand[:2] < best[:2]:
                best = cand
        return best

    by_feature = {
        "quantity": best_split([(r["q"], r["y"]) for r in rows]),
        "discount": best_split([(r["d"], r["y"]) for r in rows]),
    }
    out = {
        r["feature"]: r
        for r in REGISTRY["ml_decision_stump"].fn(spark, SF_SMOKE).collect()
    }
    for feat, (gini, v, nl, posl) in by_feature.items():
        row = out[feat]
        assert row["threshold"] == v, (feat, row, v)
        assert row["n_left"] == nl and row["pos_left"] == posl
        assert abs(row["gini_micro"] - round(gini * 1e6)) <= 1, (row, gini)
    winner = min(by_feature.items(), key=lambda kv: (kv[1][0], kv[0]))[0]
    assert [r["feature"] for r in out.values() if r["rk"] == 1] == [winner]


def test_knn_matches_numpy_bruteforce(spark):
    """The distributed 5-NN vote trace == a numpy cosine + Counter
    re-implementation, prediction for prediction."""
    from collections import Counter

    rows = load_table(spark, SF_SMOKE, "embeddings").collect()
    vecs = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in rows}
    labels = {r["vec_id"]: r["label"] for r in rows}
    train = [i for i in vecs if i % 2 == 0]
    tests = [i for i in vecs if i % 2 == 1 and i < 40]
    expect = {}
    for q in tests:
        qv = vecs[q]
        sims = []
        for t in train:
            tv = vecs[t]
            sim = float(
                qv @ tv / (np.linalg.norm(qv) * np.linalg.norm(tv))
            )
            sims.append((-sim, t))
        top = sorted(sims)[:5]
        votes = Counter(labels[t] for _, t in top)
        best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        expect[q] = (best[0], best[1])
    out = REGISTRY["ml_knn_label_accuracy"].fn(spark, SF_SMOKE).collect()
    assert len(out) == len(tests)
    for r in out:
        pred, votes = expect[r["query_id"]]
        assert r["pred_label"] == pred, (r, pred)
        assert r["votes"] == votes
        assert r["correct"] == int(r["true_label"] == r["pred_label"])


def test_naive_bayes_beats_uniform_chance(spark):
    """Sanity floor: the trained classifier must clearly beat uniform
    5-way chance on the held-out half. The shared-vocabulary fixture
    CAPS what any token model can do here (the langid-confusion entry
    documents the same ceiling: languages share one word pool, so the
    majority class is near-unbeatable for token features — verified:
    char-bigram NB scores even lower) — the entry's claim is the
    operator algebra, gated exactly by the oracle, not fixture-level
    classification power. Also: per-class counts are valid and the
    run is deterministic."""
    out = REGISTRY["ml_naive_bayes_langid"].fn(spark, SF_SMOKE).collect()
    n = sum(r["n_test"] for r in out)
    correct = sum(r["n_correct"] for r in out)
    assert correct > 0.25 * n, (correct, n)  # chance is 0.20
    for r in out:
        assert 0 <= r["n_correct"] <= r["n_test"]
    again = REGISTRY["ml_naive_bayes_langid"].fn(spark, SF_SMOKE).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))


def test_boosted_stumps_mse_decreases_monotonically(spark):
    """Boosting must help: each round's mse_after < its mse_before,
    and round 2's mse_before equals round 1's mse_after (the residual
    handoff is lossless — the algebraic residual-moment decomposition
    did not leak mass)."""
    rows = {
        r["stage"]: r
        for r in REGISTRY["ml_boosted_stumps"].fn(spark, SF_SMOKE).collect()
    }
    r1, r2 = rows[1], rows[2]
    assert r1["mse_after_milli"] < r1["mse_before_milli"], r1
    assert r2["mse_after_milli"] < r2["mse_before_milli"], r2
    assert abs(r2["mse_before_milli"] - r1["mse_after_milli"]) <= 1, (
        r1,
        r2,
    )
    assert r1["feature"] == "quantity" and r2["feature"] == "discount"


def test_neyman_allocation_is_consistent(spark):
    """Allocation weights sum to 1 (micro) and the nominal-1000
    allocation sums to 1000 +/- rounding slack; every stratum with
    rows gets a row."""
    out = (
        REGISTRY["sample_stratified_neyman"].fn(spark, SF_SMOKE).collect()
    )
    assert len(out) == 5
    assert abs(sum(r["weight_micro"] for r in out) - 1_000_000) <= 5
    assert abs(sum(r["alloc_of_1000"] for r in out) - 1000) <= 5
    assert all(r["nh"] > 0 and r["sd_milli"] > 0 for r in out)


def test_quality_ablation_cells_partition_the_corpus(spark):
    """The 2^3 ablation cells are a PARTITION of the corpus: counts
    sum to the table size, shares to ~1, and the survives_all flag
    marks exactly the all-ones cell."""
    out = (
        REGISTRY["pipeline_quality_ablation"].fn(spark, SF_SMOKE).collect()
    )
    total = load_table(spark, SF_SMOKE, "documents").count()
    assert sum(r["n_docs"] for r in out) == total
    assert abs(sum(r["share_micro"] for r in out) - 1_000_000) <= len(out)
    for r in out:
        expect = int(
            r["f_len"] == 1 and r["f_alpha"] == 1 and r["f_uniq"] == 1
        )
        assert r["survives_all"] == expect
