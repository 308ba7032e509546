"""Reference-implementation parity for the round-5 statistical
operators: the distributed formulations (HOF folds, sufficient-
statistic aggregates, integer-cents credit) must agree with a plain
sequential Python implementation of the textbook definition — the
same gate style as the BPE-vs-pure-Python and k-means-vs-numpy tests.
The oracle gate proves Spark==DuckDB; these prove both == the math."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from hive_release_spark.catalog import load_table
from tests.conftest import SF_SMOKE


def _months(spark):
    rows = (
        load_table(spark, SF_SMOKE, "orders")
        .groupBy(F.trunc("o_orderdate", "month").alias("month"))
        .agg(
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0)
            ).alias("rev")
        )
        .orderBy("month")
        .collect()
    )
    return [(r["month"], r["rev"]) for r in rows]


def test_ewma_matches_sequential_reference(spark):
    from hive_release_spark.queries import REGISTRY

    series = _months(spark)
    s = None
    expect = []
    for _, x in series:
        s = x if s is None else 0.3 * x + 0.7 * s
        expect.append(math.floor(s * 100 + 0.5) / 100)
    got = [
        r["ewma"]
        for r in REGISTRY["timeseries_ewma"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_holt_matches_sequential_reference(spark):
    from hive_release_spark.queries import REGISTRY

    series = _months(spark)
    l = b = None
    expect = []
    for _, x in series:
        if l is None:
            l, b = x, 0.0
        else:
            l_new = 0.3 * x + 0.7 * (l + b)
            b = 0.2 * (l_new - l) + 0.8 * b
            l = l_new
        rnd = lambda v: math.floor(v * 100 + 0.5) / 100
        expect.append((rnd(l), rnd(b), rnd(l + b)))
    got = [
        (r["level"], r["trend"], r["forecast_next"])
        for r in REGISTRY["timeseries_holt"].fn(spark, SF_SMOKE).collect()
    ]
    assert got == expect


def test_theil_sen_matches_all_pairs_reference(spark):
    from hive_release_spark.queries import REGISTRY

    series = _months(spark)
    pts = [(m.year * 12 + m.month, rev) for m, rev in series]
    slopes = []
    s_stat = 0
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            (xi, yi), (xj, yj) = pts[i], pts[j]
            slopes.append((yj - yi) / (xj - xi))
            s_stat += 1 if yj > yi else (-1 if yj < yi else 0)
    slopes.sort()
    n = len(slopes)
    med = (slopes[(n + 1) // 2 - 1] + slopes[n // 2]) / 2
    row = REGISTRY["timeseries_theil_sen"].fn(spark, SF_SMOKE).collect()[0]
    assert row["n_months"] == len(pts)
    assert row["n_pairs"] == n
    assert row["mk_s"] == s_stat
    assert row["sen_slope"] == math.floor(med * 10000 + 0.5) / 10000


def test_cuped_theta_matches_covariance_reference(spark):
    """theta must equal cov(pre, y)/var(pre) computed directly on the
    per-user frame, and the adjusted uplift must equal the raw uplift
    minus theta times the pre-period imbalance."""
    from hive_release_spark.queries import REGISTRY

    ev = load_table(spark, SF_SMOKE, "events")
    split = F.lit("2024-01-16").cast("timestamp")
    cents = F.round(F.col("value") * 100).cast("long")
    arm = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("exp1:"), F.col("user_id").cast("string"))),
                1,
                1,
            ),
            16,
            10,
        ).cast("int")
        % 2
    )
    users = (
        ev.groupBy("user_id")
        .agg(
            F.sum(F.when(F.col("ts") < split, cents).otherwise(0)).alias("p"),
            F.sum(F.when(F.col("ts") >= split, cents).otherwise(0)).alias("y"),
        )
        .withColumn("arm", arm)
        .collect()
    )
    n = len(users)
    mp = sum(u["p"] for u in users) / n
    my = sum(u["y"] for u in users) / n
    cov = sum((u["p"] - mp) * (u["y"] - my) for u in users)
    var = sum((u["p"] - mp) ** 2 for u in users)
    theta_ref = cov / var
    row = REGISTRY["events_ab_cuped"].fn(spark, SF_SMOKE).collect()[0]
    assert abs(row["theta"] - theta_ref) < 1e-4
    # CUPED must not change the POOLED mean, only arm-level means:
    # adjusted uplift = raw uplift - theta * pre-period imbalance
    a0 = [u for u in users if u["arm"] == 0]
    a1 = [u for u in users if u["arm"] == 1]
    dy = (sum(u["y"] for u in a1) / len(a1) - sum(u["y"] for u in a0) / len(a0))
    dp = (sum(u["p"] for u in a1) / len(a1) - sum(u["p"] for u in a0) / len(a0))
    assert abs(row["uplift_cuped"] - (dy - theta_ref * dp) / 100) < 1e-2
    assert abs(row["uplift_raw"] - dy / 100) < 1e-2


def test_attribution_credit_conserves_purchase_value(spark):
    """Position-based attribution must distribute each converted
    journey's purchase value EXACTLY once: summing credited over all
    (user, position) rows equals the cents of every purchase whose
    journey contains at least one view."""
    from hive_release_spark.queries import REGISTRY

    out = REGISTRY["events_attribution_position"].fn(spark, SF_SMOKE).collect()
    credited_total = round(sum(r["credited"] for r in out), 2)

    ev = (
        load_table(spark, SF_SMOKE, "events")
        .filter(F.col("event_type").isin("view", "purchase"))
        .filter(F.col("user_id") % 7 == 0)
        .select("user_id", "ts", "event_id", "event_type", "value")
        .collect()
    )
    by_user: dict = {}
    for r in sorted(ev, key=lambda r: (r["user_id"], r["ts"], r["event_id"])):
        by_user.setdefault(r["user_id"], []).append(r)
    total = 0
    for rows in by_user.values():
        views = 0
        for r in rows:
            if r["event_type"] == "view":
                views += 1
            else:
                if views > 0:
                    total += round(r["value"] * 100)
                views = 0
    assert credited_total == round(total / 100, 2)


def test_binary_ann_matches_numpy_reference(spark):
    """The packed-code Hamming shortlist + cosine rerank must agree
    with a direct numpy implementation of the same definition (sign
    bits, disagreement count, cosine on the shortlist survivors)."""
    import numpy as np

    from hive_release_spark.queries import REGISTRY

    emb = load_table(spark, SF_SMOKE, "embeddings").orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in emb])
    V = np.array([r["embedding"] for r in emb], dtype=np.float64)
    bits = V > 0
    got = REGISTRY["sim_ann_binary"].fn(spark, SF_SMOKE).collect()
    by_query: dict = {}
    for r in got:
        by_query.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_query.items():
        qi = int(np.where(ids == qid)[0][0])
        ham = (bits ^ bits[qi]).sum(axis=1)
        order = sorted(
            [(int(ham[i]), int(ids[i])) for i in range(len(ids)) if ids[i] != qid]
        )
        shortlist = {nid for _, nid in order[:50]}
        sims = []
        for nid in shortlist:
            ci = int(np.where(ids == nid)[0][0])
            s = float(
                V[qi] @ V[ci] / (np.linalg.norm(V[qi]) * np.linalg.norm(V[ci]))
            )
            sims.append((-s, nid))
        sims.sort()
        expect_top = [nid for _, nid in sims[: len(rows)]]
        assert [r["neighbor_id"] for r in sorted(rows, key=lambda r: r["rank"])] == expect_top
        for r in rows:
            assert r["hamming"] == int(ham[np.where(ids == r["neighbor_id"])[0][0]])


def test_jsd_matches_direct_reference(spark):
    """Spot-check one source pair's JSD against a direct dictionary
    implementation over raw token counts."""
    import math

    from hive_release_spark.queries import REGISTRY

    out = REGISTRY["text_source_divergence"].fn(spark, SF_SMOKE).collect()
    assert out, "no source pairs"
    row = out[0]
    docs = load_table(spark, SF_SMOKE, "documents").collect()
    def dist(src):
        c: dict = {}
        for d in docs:
            if d["source"] == src:
                for t in d["text"].split(" "):
                    c[t] = c.get(t, 0) + 1
        tot = sum(c.values())
        return {t: n / tot for t, n in c.items()}
    P, Q = dist(row["src_a"]), dist(row["src_b"])
    terms = set(P) | set(Q)
    jsd = 0.0
    for t in terms:
        p, q = P.get(t, 0.0), Q.get(t, 0.0)
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * math.log2(p / m)
        if q > 0:
            jsd += 0.5 * q * math.log2(q / m)
    assert abs(row["jsd"] - jsd) < 1e-4
    assert row["union_terms"] == len(terms)


def test_croston_matches_sequential_reference(spark):
    """The fold state (sizes smoother, interval smoother, forecast)
    equals a plain sequential implementation of Croston's recursion
    at the pinned convention (alpha .2, p0 = 1 at first demand)."""
    import math

    from hive_release_spark.queries import REGISTRY

    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .filter(F.col("l_partkey") % 97 == 0)
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("d"))
        .orderBy("day")
        .collect()
    )
    z = p = prev = None
    for r in rows:
        if z is None:
            z, p = float(r["d"]), 1.0
        else:
            z = 0.2 * r["d"] + 0.8 * z
            p = 0.2 * (r["day"] - prev).days + 0.8 * p
        prev = r["day"]
    out = REGISTRY["timeseries_croston"].fn(spark, SF_SMOKE).collect()[0]
    assert out["n_demand_days"] == len(rows)
    assert out["z_milli"] == math.floor(z * 1000 + 0.5)
    assert out["p_milli"] == math.floor(p * 1000 + 0.5)
    assert out["forecast_milli"] == math.floor(z / p * 1000 + 0.5)


def test_holt_winters_matches_sequential_reference(spark):
    """The triple-smoother final state and h=1 forecast equal a plain
    sequential implementation (alpha .2, beta .05, gamma .1, two-week
    textbook init, weekly season)."""
    import math

    from hive_release_spark.queries import REGISTRY

    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("day"))
        .agg(F.sum(F.col("l_quantity").cast("long")).alias("x"))
        .orderBy("day")
        .collect()
    )
    xs = [float(r["x"]) for r in rows]
    m1 = sum(xs[:7]) / 7.0
    m2 = sum(xs[7:14]) / 7.0
    level, trend = m2, (m2 - m1) / 7
    s = [x - m1 for x in xs[:7]]
    t = 14
    for x in xs[14:]:
        t += 1
        m = (t - 1) % 7
        lnew = 0.2 * (x - s[m]) + 0.8 * (level + trend)
        trend = 0.05 * (lnew - level) + 0.95 * trend
        s[m] = 0.1 * (x - lnew) + 0.9 * s[m]
        level = lnew
    nxt = t % 7
    out = (
        REGISTRY["timeseries_holt_winters"].fn(spark, SF_SMOKE).collect()[0]
    )
    assert out["n_days"] == t == len(xs)
    assert out["level_milli"] == math.floor(level * 1000 + 0.5)
    assert out["trend_milli"] == math.floor(trend * 1000 + 0.5)
    assert out["next_season_milli"] == math.floor(s[nxt] * 1000 + 0.5)
    assert out["forecast_milli"] == math.floor(
        (level + trend + s[nxt]) * 1000 + 0.5
    )


def test_spearman_matches_numpy_rank_corr(spark):
    """Midrank-composed Spearman equals numpy Pearson on explicitly
    computed average ranks."""
    import numpy as np

    from hive_release_spark.queries import REGISTRY

    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select(
            F.col("l_quantity").cast("long").alias("x"),
            F.round(F.col("l_extendedprice") * 100).cast("long").alias("y"),
        )
        .collect()
    )
    x = np.array([r["x"] for r in rows], dtype=np.float64)
    y = np.array([r["y"] for r in rows], dtype=np.float64)

    def midranks(v):
        order = np.argsort(v, kind="mergesort")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + 1 + j) / 2
            i = j
        return ranks

    expect = np.corrcoef(midranks(x), midranks(y))[0, 1]
    out = REGISTRY["stats_spearman_corr"].fn(spark, SF_SMOKE).collect()[0]
    assert out["n"] == len(rows)
    assert abs(out["spearman_micro"] / 1e6 - expect) < 1e-5, (out, expect)
