"""Reference-implementation parity for the hypothesis-test operators
(queries/stats_tests.py): the window/aggregate formulations must agree
with plain sequential Python of the textbook definitions — the oracle
gate proves Spark == DuckDB; these prove both == the math."""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE


def _samples(spark):
    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .filter(F.col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select("o_orderpriority", "o_totalprice")
        .collect()
    )
    a = sorted(r["o_totalprice"] for r in rows if r["o_orderpriority"] == "1-URGENT")
    b = sorted(r["o_totalprice"] for r in rows if r["o_orderpriority"] == "5-LOW")
    return a, b


def test_ks_matches_sequential_ecdf(spark):
    a, b = _samples(spark)
    support = sorted(set(a) | set(b))
    na, nb = len(a), len(b)
    ca = cb = 0
    ia = ib = 0
    d = 0.0
    for v in support:
        while ia < na and a[ia] <= v:
            ia += 1
        while ib < nb and b[ib] <= v:
            ib += 1
        d = max(d, abs(ia / na - ib / nb))
    out = REGISTRY["stats_ks_two_sample"].fn(spark, SF_SMOKE).collect()[0]
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["ks_d_micro"] == math.floor(d * 1e6 + 0.5), (out, d)


def test_mann_whitney_matches_sequential_midranks(spark):
    a, b = _samples(spark)
    pooled = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    # midranks
    ranks = {}
    i = 0
    while i < len(pooled):
        j = i
        while j < len(pooled) and pooled[j][0] == pooled[i][0]:
            j += 1
        mid = (i + 1 + j) / 2  # average of ranks i+1 .. j
        ranks[pooled[i][0]] = mid
        i = j
    ra = sum(ranks[v] for v in a)
    na, nb = len(a), len(b)
    u_a = ra - na * (na + 1) / 2
    cnt = Counter(v for v, _ in pooled)
    ties = sum(c**3 - c for c in cnt.values())
    n = na + nb
    sigma = math.sqrt(
        na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0)))
    )
    z = (u_a - na * nb / 2.0) / sigma
    out = REGISTRY["stats_mann_whitney"].fn(spark, SF_SMOKE).collect()[0]
    assert out["u2_a"] == round(2 * u_a), (out, u_a)
    assert abs(out["z_milli"] / 1000 - z) < 0.002, (out, z)


def test_chi_square_matches_sequential_contingency(spark):
    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .collect()
    )
    ct = Counter((r["o_orderpriority"], r["o_orderstatus"]) for r in rows)
    rt = Counter(p for p, _ in ct.elements())
    st = Counter(s for _, s in ct.elements())
    n = sum(ct.values())
    chi2 = 0.0
    for (p, s), o in ct.items():
        e = rt[p] * st[s] / n
        chi2 += (o - e) ** 2 / e
    r, c = len(rt), len(st)
    v = math.sqrt(chi2 / (n * min(r - 1, c - 1)))
    out = REGISTRY["stats_chi_square"].fn(spark, SF_SMOKE).collect()[0]
    assert out["n"] == n and out["dof"] == (r - 1) * (c - 1)
    assert abs(out["chi2_milli"] / 1000 - chi2) < 0.01, (out, chi2)
    assert abs(out["v_micro"] / 1e6 - v) < 1e-4


def test_autocorr_matches_numpy_pearson(spark):
    import numpy as np

    day = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("dd"))
        .agg(F.sum("l_quantity").alias("qty"))
        .orderBy("dd")
        .collect()
    )
    x = np.array([r["qty"] for r in day], dtype=np.float64)
    out = {
        r["lag"]: r
        for r in REGISTRY["timeseries_autocorr"].fn(spark, SF_SMOKE).collect()
    }
    for k in range(1, 8):
        expect = np.corrcoef(x[k:], x[:-k])[0, 1]
        row = out[k]
        assert row["n_pairs"] == len(x) - k
        assert abs(row["acf_micro"] / 1e6 - expect) < 1e-5, (k, row, expect)


def test_subsample_ci_brackets_true_mean(spark):
    """The replicate CI must contain the full-data mean (a property of
    half-sampling on this fixture, and a sanity check that the
    replicate means are means of the right thing)."""
    true_mean = (
        load_table(spark, SF_SMOKE, "orders")
        .agg(F.avg("o_totalprice").alias("m"))
        .collect()[0]["m"]
    )
    out = REGISTRY["stats_subsample_ci"].fn(spark, SF_SMOKE).collect()[0]
    assert out["n_replicates"] == 16 and out["min_rep_rows"] > 0
    assert out["ci_lo_milli"] / 1000 < true_mean < out["ci_hi_milli"] / 1000
