"""Independent-formulation reference values for the bespoke
statistical entries (VERDICT r5 "Next round" #3).

The oracle gate proves Spark == DuckDB, but both sides of that gate
were written by the same hand from the same reading of the textbook —
the r4 Heaps-law bug proved a shared misreading stays green. Every
test here recomputes the statistic from a SEPARATE formulation
(pandas/numpy deviations-from-mean, ``np.polyfit``/``lstsq`` SVD fits,
``math.erf`` exact normal CDF, pandas midranks) on the pinned sf0.001
parquet loaded WITHOUT Spark, then compares the engine's collected
output. A shared misreading of the math now has to fool three
independent implementations to stay green.

Tolerances: engine outputs are floor(x*k + 0.5) integer folds of
doubles; the reference uses a genuinely different summation order
(deviations vs sufficient statistics, SVD vs normal equations), so a
+-1 slack on the folded integer absorbs representation drift while
still catching any semantic error (the smallest possible misreading —
an off-by-one dof, a dropped tie correction — moves these statistics
by whole fold units).
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from hive_release_spark.queries import REGISTRY
from tests.conftest import SF_SMOKE

_A, _B = "1-URGENT", "5-LOW"


@pytest.fixture(scope="module")
def orders_pd():
    return pd.read_parquet(f"{SF_SMOKE}/orders.parquet")


@pytest.fixture(scope="module")
def lineitem_pd():
    return pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")


def _fold(x: float, k: float) -> int:
    return math.floor(x * k + 0.5)


def _run(spark, name: str):
    return REGISTRY[name].fn(spark, SF_SMOKE).collect()


# ---------------------------------------------------------------- KS


def test_ks_two_sample_vs_numpy_ecdf(spark, orders_pd):
    a = np.sort(
        orders_pd.loc[orders_pd.o_orderpriority == _A, "o_totalprice"].values
    )
    b = np.sort(
        orders_pd.loc[orders_pd.o_orderpriority == _B, "o_totalprice"].values
    )
    support = np.union1d(a, b)
    # right-continuous ECDFs evaluated on the pooled support
    fa = np.searchsorted(a, support, side="right") / len(a)
    fb = np.searchsorted(b, support, side="right") / len(b)
    d = float(np.max(np.abs(fa - fb)))
    out = _run(spark, "stats_ks_two_sample")[0]
    assert out["n_a"] == len(a) and out["n_b"] == len(b)
    assert abs(out["ks_d_micro"] - _fold(d, 1e6)) <= 1


# ------------------------------------------------------ Mann-Whitney


def test_mann_whitney_vs_pandas_midranks(spark, orders_pd):
    sub = orders_pd[orders_pd.o_orderpriority.isin([_A, _B])]
    ranks = sub.o_totalprice.rank(method="average")
    is_a = (sub.o_orderpriority == _A).values
    na, nb = int(is_a.sum()), int((~is_a).sum())
    r_a = float(ranks.values[is_a].sum())
    u_a = r_a - na * (na + 1) / 2.0
    _, counts = np.unique(sub.o_totalprice.values, return_counts=True)
    ties = float((counts.astype(np.float64) ** 3 - counts).sum())
    n = na + nb
    sigma = math.sqrt(na * nb / 12.0 * ((n + 1) - ties / (n * (n - 1.0))))
    z = (u_a - na * nb / 2.0) / sigma
    out = _run(spark, "stats_mann_whitney")[0]
    assert out["n_a"] == na and out["n_b"] == nb
    assert out["u2_a"] == round(2 * u_a)
    assert abs(out["z_milli"] - _fold(z, 1e3)) <= 1


# --------------------------------------------------------- chi-square


def test_chi_square_vs_pandas_crosstab(spark, orders_pd):
    ct = pd.crosstab(orders_pd.o_orderpriority, orders_pd.o_orderstatus)
    obs = ct.values.astype(np.float64)
    nt = obs.sum()
    expected = np.outer(obs.sum(axis=1), obs.sum(axis=0)) / nt
    chi2 = float(((obs - expected) ** 2 / expected).sum())
    r, c = obs.shape
    dof = (r - 1) * (c - 1)
    v = math.sqrt(chi2 / (nt * min(r - 1, c - 1)))
    out = _run(spark, "stats_chi_square")[0]
    assert out["n"] == int(nt) and out["dof"] == dof
    assert abs(out["chi2_milli"] - _fold(chi2, 1e3)) <= 1
    assert abs(out["v_micro"] - _fold(v, 1e6)) <= 1


# ------------------------------------------------------------- ANOVA


def test_anova_oneway_vs_deviations_from_mean(spark, orders_pd):
    # engine works on exact cents; mirror the quantization, then use the
    # DEVIATIONS formulation (engine uses sufficient-statistic identity)
    y = np.round(orders_pd.o_totalprice.values * 100) / 100.0
    groups = [
        y[(orders_pd.o_orderpriority == g).values]
        for g in sorted(orders_pd.o_orderpriority.unique())
    ]
    k = len(groups)
    nt = sum(len(g) for g in groups)
    grand = float(np.concatenate(groups).mean())
    ssb = float(sum(len(g) * (g.mean() - grand) ** 2 for g in groups))
    ssw = float(sum(((g - g.mean()) ** 2).sum() for g in groups))
    sst = float(((np.concatenate(groups) - grand) ** 2).sum())
    f = (ssb / (k - 1)) / (ssw / (nt - k))
    eta2 = ssb / sst
    out = _run(spark, "stats_anova_oneway")[0]
    assert out["n_groups"] == k and out["n_rows"] == nt
    assert out["dof_between"] == k - 1 and out["dof_within"] == nt - k
    assert abs(out["f_milli"] - _fold(f, 1e3)) <= 1
    assert abs(out["eta2_micro"] - _fold(eta2, 1e6)) <= 1


# ---------------------------------------------------------- Spearman


def test_spearman_vs_pandas_rank_pearson(spark, lineitem_pd):
    x = lineitem_pd.l_quantity.astype(np.int64)
    y = np.round(lineitem_pd.l_extendedprice.values * 100).astype(np.int64)
    rx = pd.Series(x).rank(method="average").values
    ry = pd.Series(y).rank(method="average").values
    rho = float(np.corrcoef(rx, ry)[0, 1])
    out = _run(spark, "stats_spearman_corr")[0]
    assert out["n"] == len(x)
    assert abs(out["spearman_micro"] - _fold(rho, 1e6)) <= 2


# ------------------------------------------------------------ FDR-BH


def test_fdr_bh_vs_exact_erf_step_up(spark, orders_pd):
    """The engine shares an Abramowitz-Stegun erf POLYNOMIAL between
    Spark and DuckDB (|rel err| < 1.5e-7); this reference uses Python's
    EXACT ``math.erf``, so a transcription error in the shared
    polynomial text cannot hide."""
    g = (
        orders_pd.groupby("o_orderpriority")
        .agg(
            n=("o_orderstatus", "size"),
            k=("o_orderstatus", lambda s: int((s == "F").sum())),
        )
        .reset_index()
        .rename(columns={"o_orderpriority": "grp"})
    )
    nt, kt = int(g.n.sum()), int(g.k.sum())
    p0 = kt / nt
    g["zv"] = (g.k / g.n - p0) / np.sqrt(p0 * (1 - p0) / g.n)
    g["pv"] = [1.0 - math.erf(abs(z) / math.sqrt(2.0)) for z in g.zv]
    g = g.sort_values(["pv", "grp"]).reset_index(drop=True)
    g["rk"] = np.arange(1, len(g) + 1)
    m = len(g)
    passing = g.rk[g.pv <= g.rk * 0.10 / m]
    max_rk = int(passing.max()) if len(passing) else 0
    out = {r["grp"]: r for r in _run(spark, "stats_fdr_bh")}
    assert len(out) == m
    for _, row in g.iterrows():
        o = out[row.grp]
        assert o["n"] == row.n and o["k"] == row.k
        assert o["rk"] == row.rk
        assert abs(o["z_milli"] - _fold(row.zv, 1e3)) <= 1
        # A-S polynomial error < 1.5e-7 in erf -> < 0.15 micro in p
        assert abs(o["p_micro"] - _fold(row.pv, 1e6)) <= 1
        assert o["rejected"] == int(row.rk <= max_rk)


# ------------------------------------------------------ Weibull fit


def test_weibull_fit_vs_numpy_polyfit(spark, lineitem_pd):
    """Engine fits ln(-ln S) = k ln t + c by sufficient-statistic
    normal equations; the reference refits the SAME linearization with
    ``np.polyfit`` (SVD least squares) from a pandas-built ECDF."""
    span = (
        lineitem_pd.groupby("l_orderkey")
        .l_shipdate.agg(lambda s: (s.max() - s.min()).days + 1)
        .values
    )
    n = len(span)
    t_vals, counts = np.unique(span, return_counts=True)
    cum = np.cumsum(counts)
    keep = (cum < n) & (t_vals > 1)
    x = np.log(t_vals[keep].astype(np.float64))
    yv = np.log(-np.log(1.0 - cum[keep] / n))
    k, c = np.polyfit(x, yv, 1)
    out = _run(spark, "stats_weibull_fit")[0]
    assert out["n_points"] == int(keep.sum())
    assert out["n_orders"] == n
    assert abs(out["shape_milli"] - _fold(float(k), 1e3)) <= 1
    assert abs(out["scale_days_milli"] - _fold(math.exp(-c / k), 1e3)) <= 1


# ----------------------------------------------------- Granger-lite


def test_granger_lite_vs_numpy_lstsq(spark, lineitem_pd):
    """Engine solves both nested models by Cramer minors over
    sufficient statistics; the reference builds the lagged day frame
    in pandas and fits both models with ``np.linalg.lstsq``."""
    day = (
        lineitem_pd.assign(dd=lineitem_pd.l_shipdate.dt.date)
        .groupby("dd")
        .agg(y=("l_quantity", "sum"), x=("l_quantity", "size"))
        .sort_index()
    )
    y = day.y.values[1:].astype(np.float64)
    y1 = day.y.values[:-1].astype(np.float64)
    x1 = day.x.values[:-1].astype(np.float64)
    n = len(y)

    def sse(design: np.ndarray) -> float:
        beta, *_ = np.linalg.lstsq(design, y, rcond=None)
        resid = y - design @ beta
        return float(resid @ resid)

    ones = np.ones(n)
    sse_r = sse(np.column_stack([ones, y1]))
    sse_u = sse(np.column_stack([ones, y1, x1]))
    f = (sse_r - sse_u) / (sse_u / (n - 3))
    out = _run(spark, "stats_granger_lite")[0]
    assert out["n_days"] == n
    assert abs(out["mse_restricted"] - _fold(sse_r / n, 1)) <= 1
    assert abs(out["mse_unrestricted"] - _fold(sse_u / n, 1)) <= 1
    assert abs(out["f_milli"] - _fold(f, 1e3)) <= 1


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_SMOKE}/events.parquet")


# --------------------------------------------------------------- PSI


def test_psi_vs_pandas_reference(spark, orders_pd):
    yrs = orders_pd.o_orderdate.dt.year
    sub = orders_pd[yrs.isin([1995, 1996])]
    bucket = np.minimum(np.floor(sub.o_totalprice.values / 50000), 9).astype(int)
    yr = yrs[yrs.isin([1995, 1996])].values
    na = pd.Series(bucket[yr == 1995]).value_counts()
    nb = pd.Series(bucket[yr == 1996]).value_counts()
    present = sorted(set(na.index) | set(nb.index))
    ta, tb = int(na.sum()), int(nb.sum())
    psi = 0.0
    for b in present:
        pa = (na.get(b, 0) + 0.5) / (ta + 5.0)
        pb = (nb.get(b, 0) + 0.5) / (tb + 5.0)
        psi += (pa - pb) * math.log(pa / pb)
    out = _run(spark, "dq_distribution_drift_psi")[0]
    assert out["n_1995"] == ta and out["n_1996"] == tb
    assert abs(out["psi"] - psi) < 2e-6
    assert out["drifted"] == (psi > 0.1)


# --------------------------------------------------------- MAD flags


def test_anomaly_mad_vs_numpy_medians(spark, events_pd):
    n = events_pd.groupby(events_pd.ts.dt.date).size()
    med = float(np.median(n.values))
    mad = float(np.median(np.abs(n.values - med)))
    out = {r["day"]: r for r in _run(spark, "events_anomaly_mad")}
    assert len(out) == len(n)
    for day, cnt in n.items():
        o = out[day]
        assert o["n"] == cnt
        z = (cnt - med) / (1.4826 * mad)
        assert abs(o["robust_z"] - z) < 2e-4, (day, o["robust_z"], z)
        assert o["is_anomaly"] == (abs(cnt - med) > 3 * 1.4826 * mad)


# ----------------------------------------------------------- Benford


def test_benford_vs_pandas_first_digits(spark, orders_pd):
    v = orders_pd.o_totalprice.values
    v = v[v >= 1]
    digits = np.array([int(str(int(math.floor(x)))[0]) for x in v])
    counts = pd.Series(digits).value_counts()
    total = int(counts.sum())
    out = {r["d"]: r for r in _run(spark, "dq_benford_first_digit")}
    assert set(out) == set(counts.index)
    for d, obs in counts.items():
        exp = total * math.log10(1.0 + 1.0 / d)
        o = out[d]
        assert o["obs"] == obs
        assert abs(o["expected"] - exp) < 0.01 + 1e-9
        assert abs(o["chi2_term"] - (obs - exp) ** 2 / exp) < 2e-4


# ------------------------------------------------------------- CUSUM


def test_cusum_vs_numpy_running_deviations(spark, events_pd):
    n = events_pd.groupby(events_pd.ts.dt.date).size().sort_index()
    mu = float(n.values.mean())
    cusum = np.cumsum(n.values - mu)
    peak_days = {
        day
        for day, c in zip(n.index, cusum)
        if abs(c) == np.abs(cusum).max()
    }
    out = {r["day"]: r for r in _run(spark, "events_changepoint_cusum")}
    assert len(out) == len(n)
    for day, c in zip(n.index, cusum):
        o = out[day]
        assert abs(o["cusum"] - c) < 2e-4, (day, o["cusum"], c)
        assert o["is_changepoint"] == (day in peak_days)


# -------------------------------------------------------------- Gini


def test_gini_vs_sorted_rank_formula(spark, orders_pd):
    cents = (
        orders_pd.assign(c=np.round(orders_pd.o_totalprice.values * 100).astype(np.int64))
        .groupby("o_custkey")
        .c.sum()
    )
    per = cents.reset_index().sort_values(["c", "o_custkey"])
    x = per.c.values.astype(np.float64)
    n = len(x)
    i = np.arange(1, n + 1)
    gini = 2.0 * float((i * x).sum()) / (n * x.sum()) - (n + 1.0) / n
    out = _run(spark, "customer_gini_revenue")[0]
    assert out["n"] == n
    assert abs(out["total_revenue"] - x.sum() / 100.0) < 0.01 + 1e-9
    assert abs(out["gini"] - gini) < 2e-6


# ------------------------------------------------------ Kaplan-Meier


def test_survival_km_vs_sequential_product_limit(spark, events_pd):
    g = events_pd.groupby("user_id")
    first = g.ts.min().dt.date
    last = g.ts.max().dt.date
    conv_mask = (events_pd.event_type == "purchase") & (events_pd.value >= 180)
    conv = events_pd[conv_mask].groupby("user_id").ts.min().dt.date
    rows = []
    for uid in first.index:
        if uid in conv.index:
            rows.append(((conv[uid] - first[uid]).days, 1))
        else:
            rows.append(((last[uid] - first[uid]).days, 0))
    df = pd.DataFrame(rows, columns=["t", "ev"])
    bytime = (
        df.groupby("t")
        .agg(d=("ev", "sum"), n=("ev", "size"))
        .sort_index()
    )
    bytime["c"] = bytime.n - bytime.d
    at_risk = int(bytime.n.sum())
    s, out_rows = 1.0, {}
    for t, r in bytime.iterrows():
        s *= 1.0 - r.d / at_risk if r.d < at_risk else 0.0
        if r.d >= at_risk:
            s = 0.0
        out_rows[t] = (int(r.d), int(r.c), at_risk, s)
        at_risk -= int(r.d) + int(r.c)
    out = {r["t"]: r for r in _run(spark, "events_survival_km")}
    assert set(out) == set(out_rows)
    for t, (d, c, n_risk, s_hat) in out_rows.items():
        o = out[t]
        assert (o["d"], o["c"], o["n_risk"]) == (d, c, n_risk), (t, o)
        assert abs(o["s_hat"] - s_hat) < 2e-6, (t, o["s_hat"], s_hat)


# -------------------------------------------------- equi-depth hist


def test_equidepth_histogram_vs_sorted_split(spark, orders_pd):
    per = orders_pd.sort_values(["o_totalprice", "o_orderkey"]).reset_index(
        drop=True
    )
    n = len(per)
    base, rem = divmod(n, 10)
    sizes = [base + 1 if i < rem else base for i in range(10)]
    out = {r["bucket"]: r for r in _run(spark, "orders_equidepth_histogram")}
    start = 0
    for i, sz in enumerate(sizes, start=1):
        chunk = per.o_totalprice.values[start : start + sz]
        start += sz
        o = out[i]
        assert o["n_orders"] == sz
        assert abs(o["lo"] - chunk.min()) < 0.005 + 1e-9
        assert abs(o["hi"] - chunk.max()) < 0.005 + 1e-9
        assert abs(o["bucket_value"] - chunk.sum()) < 0.01 + 1e-6


# ----------------------------------------------------- trend (OLS)


def test_trend_forecast_vs_numpy_polyfit(spark, orders_pd):
    t = (orders_pd.o_orderdate.dt.year - 1995) * 12 + (
        orders_pd.o_orderdate.dt.month - 1
    )
    m = (
        orders_pd.assign(t=t)
        .groupby("t")
        .o_totalprice.sum()
        .round(2)
        .sort_index()
    )
    slope, icept = np.polyfit(m.index.values.astype(float), m.values, 1)
    out = _run(spark, "orders_trend_forecast")[0]
    assert out["n_months"] == len(m)
    assert abs(out["slope"] - slope) < 2e-4
    assert abs(out["icept"] - icept) < 0.02
    assert (
        abs(out["forecast_next"] - (icept + slope * (m.index.max() + 1)))
        < 0.05
    )


# ---------------------------------------------------------- streaks


def test_longest_streak_vs_python_islands(spark, events_pd):
    sub = events_pd[events_pd.user_id % 9 == 0]
    ud = (
        sub.assign(day=sub.ts.dt.date)[["user_id", "day"]]
        .drop_duplicates()
        .sort_values(["user_id", "day"])
    )
    want = {}
    for uid, grp in ud.groupby("user_id"):
        days = list(grp.day)
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if (b - a).days == 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        want[uid] = (len(days), max(streaks), len(streaks))
    out = {r["user_id"]: r for r in _run(spark, "events_longest_streak")}
    assert set(out) == set(want)
    for uid, (active, longest, n_streaks) in want.items():
        o = out[uid]
        assert (o["active_days"], o["longest_streak"], o["n_streaks"]) == (
            active,
            longest,
            n_streaks,
        ), (uid, o)


# ------------------------------------------------------- DAU / MAU


def test_stickiness_vs_pandas_trailing_window(spark, events_pd):
    ud = (
        events_pd.assign(day=events_pd.ts.dt.date)[["day", "user_id"]]
        .drop_duplicates()
    )
    days = sorted(ud.day.unique())
    out = {r["day"]: r for r in _run(spark, "events_stickiness_dau_mau")}
    assert set(out) == set(days)
    for d in days:
        dau = ud[ud.day == d].user_id.nunique()
        lo = d - pd.Timedelta(days=27).to_pytimedelta()
        mau = ud[(ud.day >= lo) & (ud.day <= d)].user_id.nunique()
        o = out[d]
        assert (o["dau"], o["mau"]) == (dau, mau), (d, o)
        assert abs(o["stickiness"] - dau / mau) < 2e-6


# ------------------------------------------------------- STL-lite


def test_stl_decompose_vs_pandas_rolling(spark, orders_pd):
    daily = (
        orders_pd.assign(day=orders_pd.o_orderdate.dt.date)
        .groupby("day")
        .o_totalprice.sum()
        .sort_index()
    )
    trend = daily.rolling(7, center=True, min_periods=1).mean()
    detr = daily - trend
    dow = pd.Series(
        [(pd.Timestamp(d).dayofweek + 1) % 7 for d in daily.index],
        index=daily.index,
    )
    seasonal = detr.groupby(dow).transform("mean")
    resid = detr - seasonal
    out = {r["day"]: r for r in _run(spark, "orders_stl_decompose")}
    assert set(out) == set(daily.index)
    for d in daily.index:
        o = out[d]
        assert o["dow"] == dow[d]
        assert abs(o["rev"] - daily[d]) < 0.01 + 1e-6
        assert abs(o["trend"] - trend[d]) < 2e-4
        assert abs(o["seasonal"] - seasonal[d]) < 2e-4
        assert abs(o["resid"] - resid[d]) < 4e-4


# ------------------------------------------------- price elasticity


def test_price_elasticity_vs_numpy_per_brand(spark, lineitem_pd):
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    j = lineitem_pd.merge(
        part[["p_partkey", "p_brand", "p_retailprice"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    out = {r["p_brand"]: r for r in _run(spark, "part_price_elasticity")}
    assert set(out) == set(j.p_brand.unique())
    for brand, grp in j.groupby("p_brand"):
        lp = np.log(grp.p_retailprice.values)
        lq = np.log(grp.l_quantity.values)
        slope, icept = np.polyfit(lp, lq, 1)
        pred = icept + slope * lp
        ss_res = float(((lq - pred) ** 2).sum())
        ss_tot = float(((lq - lq.mean()) ** 2).sum())
        r2 = 1.0 - ss_res / ss_tot
        o = out[brand]
        assert o["n"] == len(grp)
        assert abs(o["elasticity"] - slope) < 2e-4, (brand, o, slope)
        assert abs(o["intercept"] - icept) < 2e-4
        assert abs(o["r2"] - r2) < 2e-4


# ----------------------------------------------- trimmed/winsorized


def test_trimmed_stats_vs_numpy_percentiles(spark, orders_pd):
    out = {r["o_orderpriority"]: r for r in _run(spark, "agg_trimmed_stats")}
    for pri, grp in orders_pd.groupby("o_orderpriority"):
        g = grp.sort_values(["o_totalprice", "o_orderkey"]).reset_index(
            drop=True
        )
        x = g.o_totalprice.values
        n = len(x)
        pr = np.arange(n) / (n - 1)
        inside = (pr >= 0.05) & (pr <= 0.95)
        p05, p95 = np.percentile(x, [5, 95])  # linear interpolation
        wins = np.clip(x, p05, p95)
        o = out[pri]
        assert o["n"] == n
        assert abs(o["mean_raw"] - x.mean()) < 2e-4
        assert abs(o["mean_trimmed"] - x[inside].mean()) < 2e-4
        assert abs(o["mean_winsorized"] - wins.mean()) < 2e-4


# -------------------------------------------- Markov stationary dist


def test_markov_stationary_vs_python_chain(spark, events_pd):
    ev = events_pd.sort_values(["user_id", "ts", "event_id"])
    trans = {}
    for _, grp in ev.groupby("user_id"):
        types = list(grp.event_type)
        for a, b in zip(types, types[1:]):
            trans[(a, b)] = trans.get((a, b), 0) + 1
    from_tot = {}
    for (a, _), n in trans.items():
        from_tot[a] = from_tot.get(a, 0) + n
    p = {(a, b): n / from_tot[a] for (a, b), n in trans.items()}
    x = {a: 1.0 / len(from_tot) for a in from_tot}
    for _ in range(3):
        nxt = {}
        for (a, b), pv in p.items():
            if a in x:
                nxt[b] = nxt.get(b, 0.0) + x[a] * pv
        x = nxt
    total = sum(trans.values())
    out = {r["event_type"]: r for r in _run(spark, "events_markov_stationary")}
    want_keys = set(x) & set(from_tot)
    assert set(out) == want_keys
    for et in want_keys:
        o = out[et]
        assert abs(o["stationary_p"] - x[et]) < 2e-6, (et, o, x[et])
        assert o["n_obs"] == from_tot[et]
        assert abs(o["obs_share"] - from_tot[et] / total) < 2e-6


# ---------------------------------------------------------- HHI


def test_hhi_vs_pandas_share_squares(spark, lineitem_pd):
    sup = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    nat = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    # quantize with decimal HALF_UP on the shortest double repr — the
    # one place the reference must mirror Spark's round() semantics
    # (numpy's banker's rounding splits exact half-cents differently);
    # the HHI algebra under test is downstream of the quantization
    from decimal import ROUND_HALF_UP, Decimal

    cents = np.array(
        [
            int(
                Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
            )
            for x in lineitem_pd.l_extendedprice.values
            * (1 - lineitem_pd.l_discount.values)
            * 100
        ],
        dtype=np.int64,
    )
    li = lineitem_pd.assign(cents=cents)
    j = li.merge(
        sup[["s_suppkey", "s_nationkey"]],
        left_on="l_suppkey",
        right_on="s_suppkey",
    ).merge(nat[["n_nationkey", "n_name"]], left_on="s_nationkey", right_on="n_nationkey")
    per = j.groupby(["n_name", "l_suppkey"]).cents.sum()
    out = {r["n_name"]: r for r in _run(spark, "supplier_concentration_hhi")}
    assert set(out) == set(per.index.get_level_values(0))
    for nation, grp in per.groupby(level=0):
        c = grp.values.astype(np.float64)
        total = c.sum()
        hhi = float((c**2).sum()) / total**2
        n = len(c)
        o = out[nation]
        assert o["n_suppliers"] == n
        assert abs(o["revenue"] - total / 100.0) < 0.01 + 1e-6
        assert abs(o["hhi"] - hhi) < 2e-6
        assert abs(o["top_share"] - c.max() / total) < 2e-6
        norm = 1.0 if n == 1 else (hhi - 1.0 / n) / (1 - 1.0 / n)
        assert abs(o["hhi_normalized"] - norm) < 2e-6


# ------------------------------------------------------ Tukey fences


def test_tukey_fences_vs_sorted_type1_quartiles(spark, orders_pd):
    x = np.sort(orders_pd.o_totalprice.values)
    n = len(x)
    q1 = x[-(-n // 4) - 1]          # ceil(n/4)-th smallest
    q3 = x[-(-(3 * n) // 4) - 1]    # ceil(3n/4)-th smallest
    iqr = q3 - q1
    lo, hi = q1 - 1.5 * iqr, q3 + 1.5 * iqr
    out = _run(spark, "dq_outlier_tukey_fences")[0]
    assert out["n_rows"] == n
    assert out["q1"] == q1 and out["q3"] == q3
    assert abs(out["fence_lo"] - lo) < 1e-9
    assert abs(out["fence_hi"] - hi) < 1e-9
    assert out["n_below"] == int((x < lo).sum())
    assert out["n_above"] == int((x > hi).sum())


# ----------------------------------------------------- A/B uplift


def test_ab_uplift_vs_hashlib_assignment(spark, events_pd):
    import hashlib

    conv = (
        events_pd.assign(
            c=(
                (events_pd.event_type == "purchase")
                & (events_pd.value >= 180)
            ).astype(int)
        )
        .groupby("user_id")
        .c.max()
    )
    arm = {
        uid: int(hashlib.md5(f"exp1:{uid}".encode()).hexdigest()[0], 16) % 2
        for uid in conv.index
    }
    arms = pd.Series(arm)
    n0 = int((arms == 0).sum())
    n1 = int((arms == 1).sum())
    c0 = int(conv[arms[arms == 0].index].sum())
    c1 = int(conv[arms[arms == 1].index].sum())
    r0, r1 = c0 / n0, c1 / n1
    pooled = (c0 + c1) / (n0 + n1)
    z = (r1 - r0) / math.sqrt(pooled * (1 - pooled) * (1 / n0 + 1 / n1))
    out = _run(spark, "events_ab_uplift")[0]
    assert (out["n0"], out["c0"], out["n1"], out["c1"]) == (n0, c0, n1, c1)
    assert abs(out["rate_control"] - r0) < 2e-6
    assert abs(out["rate_treatment"] - r1) < 2e-6
    assert abs(out["abs_uplift"] - (r1 - r0)) < 2e-6
    assert abs(out["z_score"] - z) < 2e-4


# ------------------------------------------------------ price index


def test_price_index_vs_pandas_baskets(spark, lineitem_pd):
    li = lineitem_pd[
        (lineitem_pd.l_shipdate >= "1996-01-01")
        & (lineitem_pd.l_shipdate < "1997-01-01")
    ]
    pm = (
        li.assign(
            month=li.l_shipdate.values.astype("datetime64[M]"),
            cents=np.round(li.l_extendedprice.values * 100).astype(np.int64),
            qty=li.l_quantity.values.astype(np.int64),
        )
        .groupby(["l_partkey", "month"])
        .agg(cents=("cents", "sum"), qty=("qty", "sum"))
        .reset_index()
    )
    base = pm[pm.month == np.datetime64("1996-01")].set_index("l_partkey")
    out = {str(r["month"]): r for r in _run(spark, "orders_price_index")}
    months = sorted(m for m in pm.month.unique() if m > np.datetime64("1996-01"))
    assert len(out) == len(months)
    for m in months:
        cur = pm[pm.month == m]
        cur = cur[cur.l_partkey.isin(base.index)]
        pt = cur.cents.values / cur.qty.values
        qt = cur.qty.values.astype(np.float64)
        b = base.loc[cur.l_partkey]
        p0 = b.cents.values / b.qty.values
        q0 = b.qty.values.astype(np.float64)
        laspeyres = float((pt * q0).sum() / (p0 * q0).sum())
        paasche = float((pt * qt).sum() / (p0 * qt).sum())
        o = out[str(pd.Timestamp(m).date())]
        assert o["n_parts"] == len(cur)
        assert abs(o["laspeyres_milli"] - _fold(laspeyres, 1e3)) <= 1
        assert abs(o["paasche_milli"] - _fold(paasche, 1e3)) <= 1
        assert (
            abs(o["fisher_milli"] - _fold(math.sqrt(laspeyres * paasche), 1e3))
            <= 1
        )


# ------------------------------------------------ diff-in-differences


def test_did_vs_hashlib_four_cells(spark, events_pd):
    import hashlib

    arm = events_pd.user_id.map(
        lambda uid: int(hashlib.md5(f"exp1:{uid}".encode()).hexdigest()[0], 16)
        % 2
    )
    post = (events_pd.ts >= pd.Timestamp("2024-01-16")).astype(int)
    conv = (events_pd.event_type == "purchase").astype(int)
    cells = pd.DataFrame(
        {"arm": arm, "post": post, "user_id": events_pd.user_id, "conv": conv}
    )
    rate = {}
    tot_users = tot_purch = 0
    for (a, p), grp in cells.groupby(["arm", "post"]):
        n_u = grp.user_id.nunique()
        n_p = int(grp.conv.sum())
        rate[(a, p)] = n_p / n_u
        tot_users += n_u
        tot_purch += n_p
    did = (rate[(1, 1)] - rate[(1, 0)]) - (rate[(0, 1)] - rate[(0, 0)])
    out = _run(spark, "events_did_analysis")[0]
    assert out["total_user_periods"] == tot_users
    assert out["total_purchases"] == tot_purch
    assert abs(out["t_pre_micro"] - _fold(rate[(1, 0)], 1e6)) <= 1
    assert abs(out["t_post_micro"] - _fold(rate[(1, 1)], 1e6)) <= 1
    assert abs(out["c_pre_micro"] - _fold(rate[(0, 0)], 1e6)) <= 1
    assert abs(out["c_post_micro"] - _fold(rate[(0, 1)], 1e6)) <= 1
    assert abs(out["did_micro"] - _fold(did, 1e6)) <= 2


# ------------------------------------------------- interval coverage


def test_interval_coverage_vs_python_sweep(spark, orders_pd, lineitem_pd):
    end = lineitem_pd.groupby("l_orderkey").l_shipdate.max().dt.date
    o = orders_pd[orders_pd.o_custkey % 10 == 0]
    # inner join: orders with no line items never form an interval
    o = o[o.o_orderkey.isin(end.index)]
    iv = pd.DataFrame(
        {
            "cust": o.o_custkey.values,
            "start": o.o_orderdate.dt.date.values,
            "end": end.loc[o.o_orderkey].values,
        }
    )
    out = {r["o_custkey"]: r for r in _run(spark, "customer_interval_coverage")}
    assert set(out) == set(iv.cust.unique())
    for cust, grp in iv.groupby("cust"):
        spans = sorted(zip(grp.start, grp.end))
        merged = []
        for s, e in spans:
            if merged and s <= merged[-1][1]:
                merged[-1] = (merged[-1][0], max(merged[-1][1], e))
            else:
                merged.append((s, e))
        covered = sum((e - s).days + 1 for s, e in merged)
        o_row = out[cust]
        assert o_row["n_intervals"] == len(spans)
        assert o_row["n_merged"] == len(merged), (cust, merged)
        assert o_row["covered_days"] == covered


# ------------------------------------------------------- cohort LTV


def test_cohort_ltv_vs_pandas_curves(spark, orders_pd):
    m = (orders_pd.o_orderdate.dt.year - 1995) * 12 + (
        orders_pd.o_orderdate.dt.month - 1
    )
    f = orders_pd.assign(
        m=m, cents=np.round(orders_pd.o_totalprice.values * 100).astype(np.int64)
    )
    f["cohort_m"] = f.groupby("o_custkey").m.transform("min")
    f["age_m"] = f.m - f.cohort_m
    per = (
        f.groupby(["cohort_m", "age_m"])
        .agg(rev=("cents", "sum"), active=("o_custkey", "nunique"))
        .reset_index()
    )
    sizes = f.groupby("cohort_m").o_custkey.nunique()
    out = {
        (r["cohort_m"], r["age_m"]): r for r in _run(spark, "customer_cohort_ltv")
    }
    want = per[per.cohort_m < 6]
    assert len(out) == len(want)
    for cm, grp in want.groupby("cohort_m"):
        grp = grp.sort_values("age_m")
        cum = 0
        for _, row in grp.iterrows():
            cum += row.rev
            o = out[(cm, row.age_m)]
            assert o["cohort_n"] == sizes[cm]
            assert o["active"] == row.active
            ltv = cum / (100.0 * sizes[cm])
            assert abs(o["cum_ltv_per_user"] - ltv) < 0.005 + 1e-9


# ----------------------------------------------------- moving median


def test_moving_median_vs_pandas_rolling(spark, orders_pd):
    daily = (
        orders_pd.assign(day=orders_pd.o_orderdate.dt.date)
        .groupby("day")
        .o_totalprice.sum()
        .sort_index()
    )
    trailing = daily.rolling(7, min_periods=1).median()
    centered = daily.rolling(7, center=True, min_periods=1).median()
    out = {r["day"]: r for r in _run(spark, "window_moving_median")}
    assert set(out) == set(daily.index)
    for d in daily.index:
        o = out[d]
        assert abs(o["rev"] - daily[d]) < 0.01 + 1e-6
        assert abs(o["med_trailing7"] - trailing[d]) < 2e-4, (d, o)
        assert abs(o["med_centered7"] - centered[d]) < 2e-4, (d, o)


# ------------------------------------------------------- Fano factor


def test_fano_factor_vs_pandas_var_over_mean(spark, events_pd):
    d = (
        events_pd.assign(day=events_pd.ts.dt.date)
        .groupby(["event_type", "day"])
        .size()
    )
    out = {r["event_type"]: r for r in _run(spark, "events_fano_factor")}
    for et, counts in d.groupby(level=0):
        c = counts.values.astype(np.float64)
        fano = c.var(ddof=1) / c.mean()
        o = out[et]
        assert o["n_days"] == len(c)
        assert o["n_events"] == int(c.sum())
        assert abs(o["fano_milli"] - _fold(fano, 1e3)) <= 1
        assert o["bursty_flag"] == int(fano > 1.5)


# ------------------------------------------------ rolling OLS slope


def test_window_regr_slope_vs_numpy_polyfit(spark, orders_pd):
    sub = orders_pd[orders_pd.o_custkey % 100 == 0].copy()
    sub["cents"] = np.round(sub.o_totalprice.values * 100).astype(np.int64)
    sub = sub.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    sub["rn"] = sub.groupby("o_custkey").cumcount() + 1
    out = {
        (r["o_custkey"], r["rn"]): r for r in _run(spark, "window_regr_slope")
    }
    n_checked = 0
    for cust, grp in sub.groupby("o_custkey"):
        rns = grp.rn.values
        cents = grp.cents.values.astype(np.float64)
        for i in range(1, len(rns)):  # rn >= 2
            lo = max(0, i - 4)
            x, y = rns[lo : i + 1].astype(np.float64), cents[lo : i + 1]
            slope = np.polyfit(x, y, 1)[0] / 100.0  # cents -> currency
            o = out[(cust, rns[i])]
            assert abs(o["slope_milli"] - _fold(slope, 1e3)) <= 1, (
                cust,
                rns[i],
                o,
                slope,
            )
            n_checked += 1
    assert n_checked == len(out)


# ---------------------------------------------------- triangle stats


def test_triangle_stats_vs_python_sets(spark):
    """The near-dup pair list is itself oracle-gated + property-tested
    (jaccard_pairs); this checks the TRIANGLE algebra on top of it —
    adjacency sets, wedge counts d*(d-1)/2, the 3T/wedges clustering
    coefficient — against a plain Python set implementation."""
    from hive_release_spark.llm import dedup as ddp
    from hive_release_spark.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ddp.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    ]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    # count each triangle once: common neighbors ABOVE both endpoints
    tri = 0
    for a, b in pairs:
        hi = max(a, b)
        tri += sum(1 for c in adj[a] & adj[b] if c > hi)
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in adj.values())
    out = _run(spark, "graph_triangles")[0]
    assert out["n_nodes"] == len(adj)
    assert out["n_edges"] == len(pairs)
    assert out["n_triangles"] == tri, (out["n_triangles"], tri)
    want_cc = 0.0 if wedges == 0 else 3.0 * tri / wedges
    assert abs(out["clustering_coeff"] - want_cc) < 2e-6


# ------------------------------------------------------- sessionize


def test_sessionize_vs_python_gap_walk(spark, events_pd):
    sub = events_pd[events_pd.user_id % 11 == 0].sort_values(
        ["user_id", "ts", "event_id"]
    )
    sec = lambda t: int(pd.Timestamp(t).timestamp())  # noqa: E731
    want = {}
    for uid, grp in sub.groupby("user_id"):
        sess_n, prev = 0, None
        sessions = {}
        for _, r in grp.iterrows():
            if prev is None or sec(r.ts) - sec(prev) > 1800:
                sess_n += 1
            prev = r.ts
            sessions.setdefault(sess_n, []).append(r)
        for sn, rows in sessions.items():
            tss = [r.ts for r in rows]
            want[(uid, sn)] = (
                len(rows),
                min(tss),
                sec(max(tss)) - sec(min(tss)),
                round(sum(r.value for r in rows), 2),
            )
    out = {
        (r["user_id"], r["session_n"]): r
        for r in _run(spark, "events_sessionize_ids")
    }
    assert set(out) == set(want)
    for key, (n, start, dur, val) in want.items():
        o = out[key]
        assert o["n_events"] == n
        assert pd.Timestamp(o["session_start"]) == start
        assert o["duration_s"] == dur
        assert abs(o["session_value"] - val) < 0.005 + 1e-9


# ---------------------------------------------- last-touch attribution


def test_last_touch_vs_python_scan(spark, events_pd):
    views = events_pd[events_pd.event_type == "view"]
    out = {
        r["event_id"]: r for r in _run(spark, "events_attribution_last_touch")
    }
    purchases = events_pd[events_pd.event_type == "purchase"]
    assert set(out) == set(purchases.event_id)
    sec = lambda t: int(pd.Timestamp(t).timestamp())  # noqa: E731
    for _, p in purchases.iterrows():
        cand = views[(views.user_id == p.user_id) & (views.ts <= p.ts)]
        o = out[p.event_id]
        if len(cand):
            best = cand.sort_values("ts").iloc[-1]
            assert o["view_id"] == best.event_id, (p.event_id, o)
            assert o["lag_s"] == sec(p.ts) - sec(best.ts)
        else:
            assert o["view_id"] is None and o["lag_s"] is None
        assert abs(o["credited_value"] - round(p.value, 2)) < 0.005 + 1e-9


# ------------------------------------------------- 72h-bounded funnel


def test_funnel_window_vs_python_steps(spark, events_pd):
    win = pd.Timedelta(hours=72)
    n_view = n_click = n_purch = 0
    for _, grp in events_pd.groupby("user_id"):
        v = grp[grp.event_type == "view"]
        if not len(v):
            continue
        n_view += 1
        t1 = v.ts.min()
        c = grp[
            (grp.event_type == "click") & (grp.ts > t1) & (grp.ts <= t1 + win)
        ]
        if not len(c):
            continue
        n_click += 1
        t2 = c.ts.min()
        p = grp[
            (grp.event_type == "purchase")
            & (grp.ts > t2)
            & (grp.ts <= t2 + win)
        ]
        if len(p):
            n_purch += 1
    out = _run(spark, "funnel_conversion_window")[0]
    assert (out["n_view"], out["n_click_72h"], out["n_purchase_72h"]) == (
        n_view,
        n_click,
        n_purch,
    )


# ------------------------------------------------ cluster histogram


def test_cluster_size_histogram_vs_union_find(spark):
    """Connected components re-derived by a textbook union-find over
    the (already gated) near-dup pair list, then the same size
    histogram — checks the min-label propagation + survivor math
    independently of both the Spark loop and the recursive-CTE
    oracle."""
    from hive_release_spark.catalog import load_table
    from hive_release_spark.llm import dedup as ddp

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ddp.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import Counter

    comp_sizes = Counter(find(x) for x in parent)
    hist = Counter(comp_sizes.values())
    out = {r["cluster_size"]: r for r in _run(spark, "dedup_cluster_size_histogram")}
    assert set(out) == set(hist)
    for size, n_clusters in hist.items():
        o = out[size]
        assert o["n_clusters"] == n_clusters
        assert o["docs_dropped"] == (size - 1) * n_clusters


# ----------------------------------------------------- top paths


def test_top_paths_vs_python_sessions(spark, events_pd):
    from collections import Counter

    sub = events_pd.sort_values(["user_id", "ts", "event_id"])
    paths = Counter()
    for _, grp in sub.groupby("user_id"):
        sess, prev = [], None
        for _, r in grp.iterrows():
            if prev is not None and (
                (r.ts - prev).total_seconds() * 1e6
                > 6 * 3600 * 1e6 - 0.5  # micros, mirror unix_micros diff
            ):
                paths[">".join(sess[:5])] += 1
                sess = []
            sess.append(r.event_type)
            prev = r.ts
        if sess:
            paths[">".join(sess[:5])] += 1
    top = sorted(paths.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    out = [(r["path"], r["n_sessions"]) for r in _run(spark, "events_top_paths")]
    assert out == top, (out[:5], top[:5])


# ------------------------------------------------- ABC classification


def test_abc_classification_vs_python_cumshare(spark, lineitem_pd):
    from decimal import ROUND_HALF_UP, Decimal

    cents = np.array(
        [
            int(Decimal(repr(x)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
            for x in lineitem_pd.l_extendedprice.values
            * (1 - lineitem_pd.l_discount.values)
            * 100
        ],
        dtype=np.int64,
    )
    per = (
        lineitem_pd.assign(cents=cents)
        .groupby("l_partkey")
        .cents.sum()
        .reset_index()
        .sort_values(["cents", "l_partkey"], ascending=[False, True])
    )
    total = int(per.cents.sum())
    cum = per.cents.cumsum().values
    share = cum / total
    cls = np.where(share <= 0.80, "A", np.where(share <= 0.95, "B", "C"))
    out = {r["abc_class"]: r for r in _run(spark, "orders_abc_classification")}
    for c in ("A", "B", "C"):
        mask = cls == c
        o = out[c]
        assert o["n_parts"] == int(mask.sum())
        assert abs(o["revenue"] - per.cents.values[mask].sum() / 100.0) < 0.01
        assert (
            abs(o["revenue_share"] - per.cents.values[mask].sum() / total)
            < 2e-6
        )


# ------------------------------------------------- column profile


def test_column_profile_vs_pandas_aggregates(spark, orders_pd):
    out = {r["col_name"]: r for r in _run(spark, "dq_column_profile")}
    n = len(orders_pd)
    for col in ("o_orderkey", "o_orderstatus", "o_totalprice",
                "o_orderdate", "o_orderpriority"):
        s = orders_pd[col]
        o = out[col]
        assert o["n_rows"] == n
        assert o["n_null"] == int(s.isna().sum())
        assert o["n_distinct"] == s.nunique()
    assert out["o_orderkey"]["min_str"] == str(int(orders_pd.o_orderkey.min()))
    assert out["o_totalprice"]["max_str"] == (
        "%.2f" % orders_pd.o_totalprice.max()
    )
    assert out["o_orderdate"]["min_str"] == str(
        orders_pd.o_orderdate.min().date()
    )


# --------------------------------------------------- business rules


def test_business_rules_vs_pandas_predicates(spark, orders_pd, lineitem_pd):
    j = lineitem_pd.merge(
        orders_pd[["o_orderkey", "o_orderdate"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    n = len(j)
    lat_ok = (j.l_shipdate >= j.o_orderdate) & (
        j.l_shipdate <= j.o_orderdate + pd.Timedelta(days=120)
    )
    want = {
        "ship_within_120d": int((~lat_ok).sum()),
        "discount_in_0_50pct": int(
            (~((j.l_discount >= 0) & (j.l_discount <= 0.5))).sum()
        ),
        "quantity_1_to_50": int(
            (~((j.l_quantity >= 1) & (j.l_quantity <= 50))).sum()
        ),
        "tax_nonnegative": int((j.l_tax < 0).sum()),
        "price_positive": int((j.l_extendedprice <= 0).sum()),
    }
    out = {r["rule"]: r for r in _run(spark, "dq_business_rules")}
    assert set(out) == set(want)
    for rule, v in want.items():
        o = out[rule]
        assert o["n_checked"] == n
        assert o["n_violations"] == v, (rule, o, v)
        assert abs(o["violation_rate"] - v / n) < 2e-6


# ----------------------------------------------------- ship latency


def test_ship_latency_vs_numpy_percentiles(spark, orders_pd, lineitem_pd):
    j = lineitem_pd.merge(
        orders_pd[["o_orderkey", "o_orderdate", "o_orderpriority"]],
        left_on="l_orderkey",
        right_on="o_orderkey",
    )
    lat = (j.l_shipdate.dt.date - j.o_orderdate.dt.date).apply(
        lambda d: d.days
    )
    out = {r["o_orderpriority"]: r for r in _run(spark, "orders_ship_latency")}
    for pri, grp in lat.groupby(j.o_orderpriority):
        x = grp.values.astype(np.float64)
        o = out[pri]
        assert o["n_lines"] == len(x)
        assert o["min_days"] == int(x.min())
        assert o["max_days"] == int(x.max())
        assert abs(o["avg_days"] - x.mean()) < 2e-4
        for col, q in (("p50_days", 50), ("p90_days", 90), ("p99_days", 99)):
            assert abs(o[col] - np.percentile(x, q)) < 2e-4, (pri, col)


# ------------------------------------------------ segment migration


def test_segment_migration_vs_pandas_full_join(spark, orders_pd):
    o = orders_pd[orders_pd.o_orderdate.dt.year == 1995]
    m = (
        o.assign(
            half=np.where(o.o_orderdate.dt.month <= 6, 1, 2),
            cents=np.round(o.o_totalprice.values * 100).astype(np.int64),
        )
        .groupby(["o_custkey", "half"])
        .cents.sum()
        .reset_index()
    )
    m["segment"] = np.where(
        m.cents >= 50_000_000, "high", np.where(m.cents >= 20_000_000, "mid", "low")
    )
    a = m[m.half == 1].set_index("o_custkey").segment
    b = m[m.half == 2].set_index("o_custkey").segment
    from collections import Counter

    mig = Counter()
    for cust in set(a.index) | set(b.index):
        mig[(a.get(cust, "none"), b.get(cust, "none"))] += 1
    out = {
        (r["seg_from"], r["seg_to"]): r["n_customers"]
        for r in _run(spark, "customer_segment_migration")
    }
    assert out == dict(mig)


# ---------------------------------------------- repurchase cycle


def test_repurchase_cycle_vs_pandas_gaps(spark, orders_pd):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    o = orders_pd.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    gaps = (
        o.groupby("o_custkey")
        .o_orderdate.diff()
        .dt.days.dropna()
    )
    seg = o.o_custkey.map(
        cust.set_index("c_custkey").c_mktsegment
    ).loc[gaps.index]
    out = {
        r["c_mktsegment"]: r for r in _run(spark, "customer_repurchase_cycle")
    }
    for s, grp in gaps.groupby(seg):
        x = grp.values.astype(np.float64)
        o_row = out[s]
        assert o_row["n_gaps"] == len(x)
        assert abs(o_row["avg_days"] - x.mean()) < 2e-4
        assert abs(o_row["p50_days"] - np.percentile(x, 50)) < 2e-4
        assert abs(o_row["p90_days"] - np.percentile(x, 90)) < 2e-4
        assert o_row["max_days"] == int(x.max())


# --------------------------------------------------- supplier Pareto


def test_supplier_pareto_vs_python_cumshare(spark, lineitem_pd):
    rev = (
        lineitem_pd.assign(
            r=lineitem_pd.l_extendedprice.values
            * (1 - lineitem_pd.l_discount.values)
        )
        .groupby("l_suppkey")
        .r.sum()
        .round(2)
        .reset_index()
        .sort_values(["r", "l_suppkey"], ascending=[False, True])
        .reset_index(drop=True)
    )
    total = rev.r.sum()
    cum = rev.r.cumsum().values
    keep = (cum / total <= 0.5) | (np.arange(1, len(rev) + 1) <= 3)
    out = [
        (r["rk"], r["l_suppkey"]) for r in _run(spark, "supplier_pareto")
    ]
    want = [
        (i + 1, int(rev.l_suppkey[i])) for i in range(len(rev)) if keep[i]
    ]
    assert out == want
    shares = {r["rk"]: r["cum_share"] for r in _run(spark, "supplier_pareto")}
    for i in range(len(rev)):
        if keep[i]:
            assert abs(shares[i + 1] - cum[i] / total) < 2e-6


# ----------------------------------------------------- backlog curve


def test_backlog_curve_vs_python_delta_stream(spark, orders_pd):
    from collections import Counter

    deltas = Counter()
    for d in orders_pd.o_orderdate.dt.normalize():
        deltas[d] += 1
        deltas[d + pd.Timedelta(days=30)] -= 1
    out = [(r["day"], r["delta"], r["open_orders"])
           for r in _run(spark, "orders_backlog_curve")]
    run = 0
    want = []
    for day in sorted(deltas):
        run += deltas[day]
        want.append((day.to_pydatetime(), deltas[day], run))
    assert [(pd.Timestamp(a), b, c) for a, b, c in out] == [
        (pd.Timestamp(a), b, c) for a, b, c in want
    ]


# ------------------------------------------- hour x iso-dow profile


def test_hourly_seasonality_vs_pandas_grid(spark, events_pd):
    p = events_pd[events_pd.event_type == "purchase"]
    grid = (
        p.assign(h=p.ts.dt.hour, d=p.ts.dt.dayofweek + 1)  # iso: Mon=1
        .groupby(["h", "d"])
        .agg(n=("value", "size"), avg_value=("value", "mean"))
    )
    out = {
        (r["hour_of_day"], r["iso_dow"]): r
        for r in _run(spark, "events_hourly_seasonality")
    }
    assert set(out) == set(grid.index)
    for key, row in grid.iterrows():
        o = out[key]
        assert o["n"] == row.n
        assert abs(o["avg_value"] - row.avg_value) < 2e-4


# -------------------------------------------------- priority mix shift


def test_priority_mix_shift_vs_pandas_shares(spark, orders_pd):
    yearly = (
        orders_pd.assign(yr=orders_pd.o_orderdate.dt.year)
        .groupby(["yr", "o_orderpriority"])
        .size()
        .rename("n")
        .reset_index()
    )
    yearly["share"] = yearly.n / yearly.groupby("yr").n.transform("sum")
    yearly = yearly.sort_values(["o_orderpriority", "yr"])
    yearly["delta"] = yearly.groupby("o_orderpriority").share.diff()
    out = {
        (r["yr"], r["o_orderpriority"]): r
        for r in _run(spark, "orders_priority_mix_shift")
    }
    assert len(out) == len(yearly)
    for _, row in yearly.iterrows():
        o = out[(row.yr, row.o_orderpriority)]
        assert o["n"] == row.n
        assert abs(o["share"] - row.share) < 2e-6
        if pd.isna(row.delta):
            assert o["share_delta"] is None
        else:
            assert abs(o["share_delta"] - row.delta) < 2e-6


# ------------------------------------------------ user lifecycle


def test_user_lifecycle_vs_pandas_aggregates(spark, events_pd):
    sec = lambda t: int(pd.Timestamp(t).timestamp())  # noqa: E731
    g = events_pd.groupby("user_id")
    out = {r["user_id"]: r for r in _run(spark, "events_user_lifecycle")}
    assert set(out) == set(g.groups)
    for uid, grp in g:
        o = out[uid]
        assert o["n_events"] == len(grp)
        assert o["active_days"] == grp.ts.dt.normalize().nunique()
        assert o["span_s"] == sec(grp.ts.max()) - sec(grp.ts.min())
        assert o["first_event_id"] == grp.event_id.min()
        assert o["last_event_id"] == grp.event_id.max()


# ---------------------------------------------- region/nation shares


def test_region_nation_share_vs_pandas_hierarchy(spark, orders_pd):
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    nat = pd.read_parquet(f"{SF_SMOKE}/nation.parquet")
    reg = pd.read_parquet(f"{SF_SMOKE}/region.parquet")
    j = (
        orders_pd.merge(cust, left_on="o_custkey", right_on="c_custkey")
        .merge(nat, left_on="c_nationkey", right_on="n_nationkey")
        .merge(reg, left_on="n_regionkey", right_on="r_regionkey")
    )
    rev = (
        j.groupby(["r_name", "n_name"])
        .o_totalprice.sum()
        .round(2)
    )
    total = rev.sum()
    out = {
        (r["region"], r["nation"]): r
        for r in _run(spark, "region_nation_share")
    }
    assert set(out) == set(rev.index)
    for (region, nation), r in rev.items():
        o = out[(region, nation)]
        assert abs(o["revenue"] - r) < 0.02
        reg_tot = rev[region].sum()
        assert abs(o["share_of_region"] - r / reg_tot) < 2e-6
        assert abs(o["share_of_total"] - r / total) < 2e-6


# -------------------------------------------------- part-type HHI


def test_part_type_hhi_vs_pandas_shares(spark, lineitem_pd):
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    j = lineitem_pd.merge(
        part[["p_partkey", "p_type", "p_brand"]],
        left_on="l_partkey",
        right_on="p_partkey",
    )
    rev = (
        j.assign(r=j.l_extendedprice.values * (1 - j.l_discount.values))
        .groupby(["p_type", "p_brand"])
        .r.sum()
    )
    out = {r["p_type"]: r for r in _run(spark, "part_type_hhi")}
    assert set(out) == set(rev.index.get_level_values(0))
    for ptype, grp in rev.groupby(level=0):
        s = grp.values / grp.values.sum()
        o = out[ptype]
        assert o["n_brands"] == len(s)
        assert abs(o["hhi"] - float((s**2).sum())) < 2e-6


# --------------------------------------------------------- SCD2 runs


def test_scd2_vs_python_run_collapse(spark, events_pd):
    sub = events_pd[events_pd.user_id % 7 == 0].sort_values(
        ["user_id", "ts", "event_id"]
    )
    want = {}
    for uid, grp in sub.groupby("user_id"):
        version, prev = 0, None
        runs = []
        for _, r in grp.iterrows():
            if prev is None or r.event_type != prev:
                version += 1
                runs.append([r.event_type, r.ts, 0])
            runs[-1][2] += 1
            prev = r.event_type
        for i, (state, start, n) in enumerate(runs, start=1):
            nxt = runs[i][1] if i < len(runs) else None
            want[(uid, i)] = (state, start, nxt, n)
    out = {(r["user_id"], r["version"]): r for r in _run(spark, "user_state_scd2")}
    assert set(out) == set(want)
    for key, (state, start, nxt, n) in want.items():
        o = out[key]
        assert o["state"] == state and o["n_events"] == n
        assert pd.Timestamp(o["valid_from"]) == start
        if nxt is None:
            assert o["valid_to"] is None
        else:
            assert pd.Timestamp(o["valid_to"]) == nxt


# --------------------------------------------------- weighted sample


def test_sample_weighted_vs_hashlib_exponential_keys(spark):
    import hashlib

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")

    def key(doc_id, n_chars):
        u = (
            int(hashlib.md5(str(doc_id).encode()).hexdigest()[:8], 16) + 1.0
        ) / 16**8
        return math.log(u) / n_chars

    docs = docs.assign(k=[key(d, n) for d, n in zip(docs.doc_id, docs.n_chars)])
    out = {
        (r["lang"], r["rk"]): r["doc_id"] for r in _run(spark, "sample_weighted")
    }
    for lang, grp in docs.groupby("lang"):
        top = grp.sort_values(["k", "doc_id"], ascending=[False, True]).head(5)
        for rk, doc_id in enumerate(top.doc_id, start=1):
            assert out[(lang, rk)] == doc_id, (lang, rk)


# ------------------------------------------------ running distinct


def test_running_distinct_vs_python_set_walk(spark, events_pd):
    sub = events_pd[events_pd.user_id % 13 == 0].sort_values(
        ["user_id", "ts", "event_id"]
    )
    want = {}
    for uid, grp in sub.groupby("user_id"):
        seen = set()
        for _, r in grp.iterrows():
            seen.add(r.event_type)
            want[(uid, r.event_id)] = len(seen)
    out = {
        (r["user_id"], r["event_id"]): r["types_seen"]
        for r in _run(spark, "window_running_distinct")
    }
    assert out == want


# --------------------------------------- EXCLUDE GROUP / TIES frames


def test_exclude_group_ties_vs_python_range_frames(spark, lineitem_pd):
    sub = lineitem_pd[lineitem_pd.l_suppkey % 100 == 0]
    # (l_orderkey, l_linenumber) is NOT unique in this fixture slice,
    # so compare as sorted multisets of rounded rows
    out = sorted(
        (
            r["l_orderkey"],
            r["l_linenumber"],
            r["grp_excl_rows"],
            None if r["grp_excl_sum"] is None else round(r["grp_excl_sum"], 2),
            r["ties_excl_rows"],
            round(r["ties_excl_sum"], 2),
        )
        for r in _run(spark, "window_exclude_group_ties")
    )
    want = []
    for sk, grp in sub.groupby("l_suppkey"):
        q = grp.l_quantity.values
        p = grp.l_extendedprice.values
        for i in range(len(grp)):
            in_frame = np.abs(q - q[i]) <= 2
            gmask = in_frame & (q != q[i])
            gsum = None if gmask.sum() == 0 else round(float(p[gmask].sum()), 2)
            want.append(
                (
                    int(grp.l_orderkey.values[i]),
                    int(grp.l_linenumber.values[i]),
                    int(gmask.sum()),
                    gsum,
                    int(gmask.sum()) + 1,
                    round(float(p[gmask].sum() + p[i]), 2),
                )
            )
    want.sort()
    assert len(out) == len(want)
    for o_row, w_row in zip(out, want):
        assert o_row[:3] == w_row[:3] and o_row[4] == w_row[4], (o_row, w_row)
        for oi, wi in ((o_row[3], w_row[3]), (o_row[5], w_row[5])):
            if wi is None:
                assert oi is None
            else:
                assert abs(oi - wi) < 0.02, (o_row, w_row)


# ---------------------------------------------------- record linkage


def _levenshtein(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, start=1):
        cur = [i]
        for j, cb in enumerate(b, start=1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_record_linkage_vs_python_blocked_dp(spark):
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    names = part.groupby("p_name").size()
    want = []
    by_block = {}
    for name in names.index:
        by_block.setdefault(name.split(" ")[-1], []).append(name)
    for block, members in by_block.items():
        for i, a in enumerate(sorted(members)):
            for b in sorted(members)[i + 1 :]:
                lev = _levenshtein(a, b)
                if lev <= 2:
                    want.append((block, a, b, lev, names[a], names[b]))
    want.sort()
    out = [
        (r["block"], r["name_a"], r["name_b"], r["lev"], r["n_rows_a"], r["n_rows_b"])
        for r in _run(spark, "dedup_record_linkage")
    ]
    assert out == want


# ---------------------------------------------------- reconciliation


def test_reconciliation_vs_pandas_per_order(spark, orders_pd, lineitem_pd):
    comp = (
        lineitem_pd.assign(
            c=lineitem_pd.l_extendedprice.values
            * (1 - lineitem_pd.l_discount.values)
            * (1 + lineitem_pd.l_tax.values)
        )
        .groupby("l_orderkey")
        .c.sum()
    )
    j = orders_pd.assign(computed=orders_pd.o_orderkey.map(comp))
    rel = (j.computed - j.o_totalprice).abs() / j.o_totalprice
    out = {r["o_orderstatus"]: r for r in _run(spark, "dq_reconciliation")}
    for status, grp in j.groupby("o_orderstatus"):
        rg = rel[grp.index]
        o = out[status]
        assert o["n_orders"] == len(grp)
        assert o["n_no_lines"] == int(grp.computed.isna().sum())
        assert o["n_within_1pct"] == int((rg <= 0.01).sum())
        assert abs(o["avg_rel_err"] - rg.mean()) < 2e-4
        assert abs(o["max_rel_err"] - rg.max()) < 2e-4


# ------------------------------------------------- key-skew profile


def test_key_skew_profile_vs_pandas_value_counts(spark, lineitem_pd, events_pd):
    specs = {
        "lineitem.l_partkey": lineitem_pd.l_partkey,
        "lineitem.l_suppkey": lineitem_pd.l_suppkey,
        "events.user_id": events_pd.user_id,
    }
    out = {r["key_col"]: r for r in _run(spark, "dq_key_skew_profile")}
    assert set(out) == set(specs)
    for label, s in specs.items():
        vc = s.value_counts()
        o = out[label]
        assert o["n_rows"] == len(s)
        assert o["n_keys"] == len(vc)
        assert o["max_per_key"] == int(vc.max())
        assert abs(o["p95_per_key"] - np.percentile(vc.values, 95)) < 2e-4
        avg = len(s) / len(vc)
        assert abs(o["avg_per_key"] - avg) < 2e-4
        assert abs(o["skew_ratio"] - vc.max() / avg) < 2e-4
        top = vc[vc == vc.max()].index.min()  # smallest among most frequent
        assert o["top_key"] == top


@pytest.fixture(scope="module")
def documents_pd():
    return pd.read_parquet(f"{SF_SMOKE}/documents.parquet")


# --------------------------------------------------- Flesch readability


def test_readability_vs_python_regex(spark, documents_pd):
    import re

    out = {r["doc_id"]: r for r in _run(spark, "text_readability")}
    assert len(out) == len(documents_pd)
    for _, d in documents_pd.iterrows():
        words = len(d.text.split(" "))
        sents = max(len(re.split(r"[.!?]+\s", d.text)), 1)
        syl = len(re.findall(r"[aeiouy]+", d.text.lower()))
        o = out[d.doc_id]
        assert o["n_words"] == words, (d.doc_id, o["n_words"], words)
        assert o["n_sents"] == sents
        assert o["n_syllables"] == syl
        flesch = 206.835 - 1.015 * words / sents - 84.6 * syl / words
        assert abs(o["flesch"] - flesch) < 2e-4


# ---------------------------------------------------- token entropy


def test_entropy_quality_vs_python_counter(spark, documents_pd):
    from collections import Counter

    per_source = {}
    for _, d in documents_pd.iterrows():
        counts = Counter(d.text.split(" "))
        n = sum(counts.values())
        if len(counts) <= 1:
            continue
        h = -sum(c / n * math.log2(c / n) for c in counts.values())
        per_source.setdefault(d.source, []).append(
            (h, h / math.log2(len(counts)))
        )
    out = {r["source"]: r for r in _run(spark, "text_entropy_quality")}
    assert set(out) == set(per_source)
    for src, rows in per_source.items():
        hs = [h for h, _ in rows]
        effs = [e for _, e in rows]
        o = out[src]
        assert o["n_docs"] == len(rows)
        assert abs(o["avg_entropy"] - sum(hs) / len(hs)) < 2e-6
        assert abs(o["min_entropy"] - min(hs)) < 2e-6
        assert o["n_low_entropy"] == sum(1 for h in hs if h < 3.0)
        assert abs(o["avg_efficiency"] - sum(effs) / len(effs)) < 2e-6


# ------------------------------------------------ TTR / hapax / Herdan


def test_ttr_hapax_vs_python_counter(spark, documents_pd):
    from collections import Counter

    out = {r["source"]: r for r in _run(spark, "text_ttr_hapax")}
    for src, grp in documents_pd.groupby("source"):
        counts = Counter(
            t for text in grp.text for t in text.split(" ")
        )
        tokens = sum(counts.values())
        types = len(counts)
        hapax = sum(1 for c in counts.values() if c == 1)
        o = out[src]
        assert o["n_tokens"] == tokens
        assert o["n_types"] == types
        assert o["n_hapax"] == hapax
        assert abs(o["ttr_micro"] - _fold(types / tokens, 1e6)) <= 1
        assert abs(o["hapax_micro"] - _fold(hapax / types, 1e6)) <= 1
        herdan = math.log(types) / math.log(tokens)
        assert abs(o["herdan_c_micro"] - _fold(herdan, 1e6)) <= 1


# ------------------------------------------- local clustering coeff


def test_local_clustering_vs_python_adjacency(spark):
    from hive_release_spark.catalog import load_table
    from hive_release_spark.llm import dedup as ddp

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ddp.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    ]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    out = {r["doc_id"]: r for r in _run(spark, "graph_local_clustering")}
    assert set(out) == set(adj)
    edge_set = {frozenset(p) for p in pairs}
    for v, nbrs in adj.items():
        d = len(nbrs)
        nl = sorted(nbrs)
        tri = sum(
            1
            for i in range(len(nl))
            for j in range(i + 1, len(nl))
            if frozenset((nl[i], nl[j])) in edge_set
        )
        o = out[v]
        assert o["degree"] == d
        assert o["n_triangles"] == tri, (v, o, tri)
        want = 0.0 if d < 2 else 2.0 * tri / (d * (d - 1))
        assert abs(o["local_coeff"] - want) < 2e-6


# ----------------------------------------- co-purchase link prediction


def _copurchase_graph(lineitem_pd):
    baskets = lineitem_pd[["l_orderkey", "l_partkey"]].drop_duplicates()
    from collections import Counter

    support = Counter()
    for _, grp in baskets.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey.unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                support[(ps[i], ps[j])] += 1
    edges = {p for p, n in support.items() if n >= 2}
    adj = {}
    for a, b in edges:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    return edges, adj


def test_adamic_adar_vs_python_sets(spark, lineitem_pd):
    edges, adj = _copurchase_graph(lineitem_pd)
    cands = {}
    nodes = sorted(adj)
    for w, nbrs in adj.items():
        nl = sorted(nbrs)
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                u, v = nl[i], nl[j]
                if (u, v) in edges:
                    continue
                n, aa = cands.get((u, v), (0, 0.0))
                cands[(u, v)] = (n + 1, aa + 1.0 / math.log(len(adj[w])))
    ranked = sorted(cands.items(), key=lambda kv: (-kv[1][1], kv[0]))[:20]
    out = [
        (r["part_a"], r["part_b"], r["n_common"], r["adamic_adar"], r["rk"])
        for r in _run(spark, "graph_adamic_adar")
    ]
    assert len(out) == len(ranked)
    for o, ((u, v), (n, aa)) in zip(out, ranked):
        assert (o[0], o[1], o[2]) == (u, v, n), (o, u, v, n)
        assert abs(o[3] - aa) < 2e-6


def test_jaccard_neighbors_vs_python_sets(spark, lineitem_pd):
    edges, adj = _copurchase_graph(lineitem_pd)
    cands = {}
    for w, nbrs in adj.items():
        nl = sorted(nbrs)
        for i in range(len(nl)):
            for j in range(i + 1, len(nl)):
                u, v = nl[i], nl[j]
                if (u, v) in edges:
                    continue
                cands[(u, v)] = cands.get((u, v), 0) + 1
    scored = [
        (u, v, n, len(adj[u]), len(adj[v]), n / (len(adj[u]) + len(adj[v]) - n))
        for (u, v), n in cands.items()
    ]
    ranked = sorted(scored, key=lambda t: (-t[5], t[0], t[1]))[:20]
    out = [
        (
            r["part_a"], r["part_b"], r["n_common"], r["deg_u"], r["deg_v"],
            r["jaccard_micro"],
        )
        for r in _run(spark, "graph_jaccard_neighbors")
    ]
    assert len(out) == len(ranked)
    for o, w in zip(out, ranked):
        assert o[:5] == w[:5], (o, w)
        assert abs(o[5] - _fold(w[5], 1e6)) <= 1


# ---------------------------------------------- packing efficiency


def test_pack_efficiency_vs_python_buckets(spark, documents_pd):
    BUDGET = 512  # _PACK_BUDGET in queries/llm4.py
    rows = {}
    for text in documents_pd.text:
        n = len(text.split(" "))
        bucket = 2 ** math.ceil(math.log2(max(n, 1)))
        kept = min(n, BUDGET)
        trunc = max(n - BUDGET, 0)
        r = rows.setdefault(bucket, [0, 0, 0, 0.0])
        r[0] += 1
        r[1] += n
        r[2] += trunc
        r[3] += kept / BUDGET
    out = {r["bucket"]: r for r in _run(spark, "pack_efficiency_report")}
    assert set(out) == set(rows)
    for bucket, (n_docs, tokens, trunc, fill_sum) in rows.items():
        o = out[bucket]
        assert o["n_docs"] == n_docs
        assert o["tokens"] == tokens
        assert o["tokens_truncated"] == trunc
        assert abs(o["fill_if_padded"] - fill_sum / n_docs) < 2e-6
        kept_total = tokens - trunc
        assert (
            abs(o["bucket_efficiency"] - kept_total / (n_docs * BUDGET))
            < 2e-6
        )


# ------------------------------------------------ tokenizer fertility


def test_tokenize_fertility_vs_python_regex(spark, documents_pd):
    import re

    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")
    agg = {}
    for _, d in documents_pd.iterrows():
        bpe = len(pat.findall(d.text))
        words = len(d.text.split(" "))
        chars = len(d.text.replace(" ", ""))
        r = agg.setdefault(d.lang, [0, 0, 0, 0])
        r[0] += 1
        r[1] += bpe
        r[2] += words
        r[3] += chars
    out = {r["lang"]: r for r in _run(spark, "tokenize_fertility")}
    assert set(out) == set(agg)
    for lang, (n_docs, bpe, words, chars) in agg.items():
        o = out[lang]
        assert o["n_docs"] == n_docs
        assert o["bpe_tokens"] == bpe
        assert o["words"] == words
        assert abs(o["fertility"] - bpe / words) < 2e-6
        assert abs(o["chars_per_token"] - chars / bpe) < 2e-6


# ------------------------------------------------ lang-ID confusion


def test_langid_confusion_vs_python_rule_chain(spark, documents_pd):
    markers = [
        ("en", {"the", "value", "fast"}),
        ("de", {"der", "und", "nicht"}),
        ("fr", {"le", "et", "les"}),
        ("es", {"el", "que", "los"}),
    ]

    def predict(text):
        toks = set(text.split(" "))
        for lang, ms in markers:
            if toks & ms:
                return lang
        return "unknown"

    from collections import Counter

    cells = Counter(
        (d.lang, predict(d.text)) for _, d in documents_pd.iterrows()
    )
    true_tot = Counter()
    for (lang, _), n in cells.items():
        true_tot[lang] += n
    out = {
        (r["lang"], r["pred"]): r for r in _run(spark, "text_langid_confusion")
    }
    assert set(out) == set(cells)
    for (lang, pred), n in cells.items():
        o = out[(lang, pred)]
        assert o["n"] == n
        assert abs(o["pct_of_true"] - n / true_tot[lang]) < 2e-6
        assert o["is_correct"] == int(lang == pred)


# -------------------------------------------------- embedding whitening


def test_emb_whitening_vs_numpy_standardize(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    mu = X.mean(axis=0)
    sd = X.std(axis=0, ddof=1)  # sample stddev, both engines
    W_ = (X - mu) / sd
    ids = emb.vec_id.values
    out = {r["vec_id"]: r for r in _run(spark, "emb_whitening")}
    probe = ids < 20
    assert set(out) == set(ids[probe])
    for i in np.nonzero(probe)[0]:
        o = out[ids[i]]
        assert abs(o["wnorm"] - np.linalg.norm(W_[i])) < 2e-6
        assert abs(o["wsum"] - W_[i].sum()) < 2e-6


# ------------------------------------------- power / sample size calc


def test_power_two_proportions_vs_closed_form(spark, events_pd):
    k = int((events_pd.event_type == "purchase").sum())
    n = len(events_pd)
    p1 = k / n
    p2 = p1 * 1.10
    z = 1.959964 + 0.841621
    n_arm = math.ceil(
        z * z * (p1 * (1 - p1) + p2 * (1 - p2)) / (p1 - p2) ** 2
    )
    out = _run(spark, "stats_power_two_proportions")[0]
    assert out["n_purchases"] == k and out["n_events"] == n
    assert abs(out["p1_micro"] - _fold(p1, 1e6)) <= 1
    assert abs(out["p2_micro"] - _fold(p2, 1e6)) <= 1
    assert abs(out["n_per_arm_80pct"] - n_arm) <= 1


# --------------------------------------------- Q-Q decile comparison


def test_qq_deciles_vs_sorted_type1_quantiles(spark, orders_pd):
    a = np.sort(
        orders_pd.loc[orders_pd.o_orderpriority == _A, "o_totalprice"].values
    )
    b = np.sort(
        orders_pd.loc[orders_pd.o_orderpriority == _B, "o_totalprice"].values
    )

    def q(x, p):  # smallest value whose cum count clears ceil(p*n/10)
        thr = -(-len(x) * p // 10)
        return x[int(thr) - 1]

    out = {r["decile"]: r for r in _run(spark, "stats_qq_deciles")}
    assert set(out) == set(range(1, 10))
    for p in range(1, 10):
        o = out[p]
        assert o["q_urgent"] == q(a, p), (p, o)
        assert o["q_low"] == q(b, p)
        assert abs(o["gap"] - (q(b, p) - q(a, p))) < 1e-9


# ---------------------------------------------- Simpson reversal check


def test_simpson_check_vs_python_strata(spark, events_pd):
    import hashlib

    u = events_pd.groupby("user_id").agg(n_events=("event_id", "size"))
    conv = (
        events_pd.assign(
            c=(
                (events_pd.event_type == "purchase")
                & (events_pd.value >= 180)
            ).astype(int)
        )
        .groupby("user_id")
        .c.max()
    )
    u["conv"] = conv
    u["arm"] = [
        int(hashlib.md5(f"exp1:{uid}".encode()).hexdigest()[0], 16) % 2
        for uid in u.index
    ]
    u["segment"] = np.where(
        u.n_events <= 15, "light", np.where(u.n_events <= 25, "medium", "heavy")
    )
    def diff(df):
        t, c = df[df.arm == 1], df[df.arm == 0]
        return t.conv.sum() / len(t) - c.conv.sum() / len(c)

    overall = diff(u)
    out = {r["segment"]: r for r in _run(spark, "stats_simpson_check")}
    assert set(out) == set(u.segment.unique())
    for seg, grp in u.groupby("segment"):
        o = out[seg]
        assert o["n_treat"] == int((grp.arm == 1).sum())
        assert o["n_control"] == int((grp.arm == 0).sum())
        d = diff(grp)
        assert abs(o["diff_micro"] - _fold(d, 1e6)) <= 1
        assert abs(o["overall_diff_micro"] - _fold(overall, 1e6)) <= 1
        assert o["reversal_flag"] == int((d > 0) != (overall > 0))


# ------------------------------------------------ retention half-life


def test_retention_halflife_vs_numpy_loglinear(spark, events_pd):
    d = (
        events_pd.assign(day=events_pd.ts.dt.normalize())[["user_id", "day"]]
        .drop_duplicates()
    )
    first = d.groupby("user_id").day.min()
    gmax = d.day.max()
    cohort = first[first <= gmax - pd.Timedelta(days=14)]
    k_actives = {}
    dd = d[d.user_id.isin(cohort.index)].copy()
    dd["k"] = (dd.day - dd.user_id.map(cohort)).dt.days
    dd = dd[(dd.k >= 1) & (dd.k <= 14)]
    k_actives = dd.groupby("k").user_id.nunique()
    pts = [
        (float(k), math.log(a / len(cohort)))
        for k, a in k_actives.items()
        if a > 0
    ]
    x = np.array([p[0] for p in pts])
    y = np.array([p[1] for p in pts])
    b, a_ = np.polyfit(x, y, 1)
    out = _run(spark, "retention_halflife_fit")[0]
    assert out["n_points"] == len(pts)
    assert out["cohort_n"] == len(cohort)
    assert abs(out["slope_micro"] - _fold(b, 1e6)) <= 1
    assert abs(out["intercept_micro"] - _fold(a_, 1e6)) <= 1
    if b < 0:
        assert abs(out["halflife_days_milli"] - _fold(-math.log(2) / b, 1e3)) <= 1
    else:
        assert out["halflife_days_milli"] == -1


# ------------------------------------------------- item-item CF


def test_item_item_cf_vs_python_cosine(spark, lineitem_pd):
    from collections import Counter

    baskets = lineitem_pd[["l_orderkey", "l_partkey"]].drop_duplicates()
    deg = baskets.groupby("l_partkey").size()
    co = Counter()
    for _, grp in baskets.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey.unique())
        for i in range(len(ps)):
            for j in range(i + 1, len(ps)):
                co[(ps[i], ps[j])] += 1
    scored = [
        (a, b, c, int(deg[a]), int(deg[b]), c / math.sqrt(deg[a] * deg[b]))
        for (a, b), c in co.items()
        if c >= 2
    ]
    ranked = sorted(scored, key=lambda t: (-t[5], t[0], t[1]))[:20]
    out = [
        (
            r["part_a"], r["part_b"], r["n_cobaskets"], r["deg_a"],
            r["deg_b"], r["cosine_micro"], r["rk"],
        )
        for r in _run(spark, "ml_item_item_cf")
    ]
    assert len(out) == len(ranked)
    for o, w in zip(out, ranked):
        assert o[:5] == w[:5], (o, w)
        assert abs(o[5] - _fold(w[5], 1e6)) <= 1


# -------------------------------------------------- basket rules


def test_basket_rules_vs_python_apriori(spark, lineitem_pd):
    from collections import Counter

    baskets = lineitem_pd[["l_orderkey", "l_partkey"]].drop_duplicates()
    n_baskets = baskets.l_orderkey.nunique()
    deg = baskets.groupby("l_partkey").size()
    co = Counter()
    for _, grp in baskets.groupby("l_orderkey"):
        ps = sorted(grp.l_partkey.unique())
        for a in ps:
            for b in ps:
                if a != b:
                    co[(a, b)] += 1
    scored = [
        (
            a, b, c, int(deg[a]), int(deg[b]),
            c / deg[a],
            c * n_baskets / (deg[a] * deg[b]),
        )
        for (a, b), c in co.items()
        if c >= 3
    ]
    ranked = sorted(scored, key=lambda t: (-t[6], t[0], t[1]))[:20]
    out = [
        (
            r["antecedent"], r["consequent"], r["support_n"], r["n_a"],
            r["n_b"], r["confidence_micro"], r["lift_milli"],
        )
        for r in _run(spark, "ml_basket_rules")
    ]
    assert len(out) == len(ranked)
    for o, w in zip(out, ranked):
        assert o[:5] == w[:5], (o, w)
        assert abs(o[5] - _fold(w[5], 1e6)) <= 1
        assert abs(o[6] - _fold(w[6], 1e3)) <= 1


# --------------------------------------------- Markov next-event


def test_markov_next_event_vs_python_split(spark, events_pd):
    from collections import Counter

    ev = events_pd.sort_values(["user_id", "ts", "event_id"])
    train, test = Counter(), Counter()
    for uid, grp in ev.groupby("user_id"):
        types = list(grp.event_type)
        tgt = train if uid % 2 == 0 else test
        for a, b in zip(types, types[1:]):
            tgt[(a, b)] += 1
    model = {}
    for (a, b), c in train.items():
        cur = model.get(a)  # (pred, count); ties broken on event name asc
        if cur is None or c > cur[1] or (c == cur[1] and b < cur[0]):
            model[a] = (b, c)
    model = {a: bc[0] for a, bc in model.items()}
    stats = {}
    for (a, b), c in test.items():
        if a not in model:
            continue
        n, k = stats.get(a, (0, 0))
        stats[a] = (n + c, k + (c if b == model[a] else 0))
    out = {r["prev"]: r for r in _run(spark, "ml_markov_next_event")}
    assert set(out) == set(stats)
    for a, (n, k) in stats.items():
        o = out[a]
        assert o["predicted"] == model[a]
        assert o["n_test"] == n and o["n_correct"] == k
        assert abs(o["acc_micro"] - _fold(k / n, 1e6)) <= 1


# ---------------------------------------------- rolling correlation


def test_rolling_corr_vs_pandas_windows(spark, orders_pd, events_pd):
    o = (
        orders_pd.assign(day=orders_pd.o_orderdate.dt.date)
        .groupby("day")
        .o_totalprice.sum()
    )
    e = (
        events_pd.assign(day=events_pd.ts.dt.date)
        .groupby("day")
        .value.sum()
    )
    days = sorted(set(o.index) & set(e.index))
    x = np.array([o[d] for d in days])
    y = np.array([e[d] for d in days])
    out = {r["day"]: r for r in _run(spark, "timeseries_rolling_corr")}
    assert set(out) == set(days)
    for i, d in enumerate(days):
        lo = max(0, i - 13)
        xs, ys = x[lo : i + 1], y[lo : i + 1]
        n = len(xs)
        o_row = out[d]
        assert o_row["n"] == n
        varx = n * (xs**2).sum() - xs.sum() ** 2
        vary = n * (ys**2).sum() - ys.sum() ** 2
        if n < 3 or varx <= 0 or vary <= 0:
            assert o_row["corr_14d"] is None
        else:
            want = float(np.corrcoef(xs, ys)[0, 1])
            assert abs(o_row["corr_14d"] - want) < 2e-4, (d, o_row, want)


# --------------------------------------------------- calendar gapfill


def test_gap_fill_vs_python_spine(spark, events_pd):
    sub = events_pd[
        (events_pd.event_type == "purchase") & (events_pd.value >= 190)
    ]
    base = (
        sub.assign(
            hr=sub.ts.dt.floor("h"),
            cents=np.round(sub.value.values * 100).astype(np.int64),
        )
        .groupby("hr")
        .cents.sum()
    )
    mn, mx = base.index.min(), base.index.max()
    n_hours = int((mx - mn).total_seconds() // 3600)
    spine = [mn + pd.Timedelta(hours=i) for i in range(n_hours + 1)]
    vals = [base.get(h) for h in spine]
    out = {pd.Timestamp(r["hr"]): r for r in _run(spark, "timeseries_gap_fill")}
    assert set(out) == set(spine)
    known = [(i, v) for i, v in enumerate(vals) if v is not None]
    for i, h in enumerate(spine):
        o = out[h]
        assert o["is_gap"] == int(vals[i] is None)
        prev = max(((j, v) for j, v in known if j <= i), default=None,
                   key=lambda t: t[0])
        nxt = min(((j, v) for j, v in known if j >= i), default=None,
                  key=lambda t: t[0])
        if vals[i] is not None:
            assert abs(o["rev"] - vals[i] / 100.0) < 0.01
            assert abs(o["rev_interp"] - math.floor(vals[i] + 0.5) / 100) < 0.01
        else:
            assert o["rev"] is None
            if prev is not None and nxt is not None:
                pi, pv = prev
                ni, nv = nxt
                want = math.floor(pv + (nv - pv) * (i - pi) / (ni - pi) + 0.5) / 100
                assert abs(o["rev_interp"] - want) < 0.011, (h, o, want)
            else:
                assert o["rev_interp"] is None
        if prev is not None:
            assert abs(o["rev_locf"] - prev[1] / 100.0) < 0.01
        else:
            assert o["rev_locf"] is None


# ----------------------------------------------- naive backtests


def test_backtest_naive_vs_python_lags(spark, orders_pd):
    daily = (
        orders_pd.assign(
            day=orders_pd.o_orderdate.dt.normalize(),
            cents=np.round(orders_pd.o_totalprice.values * 100).astype(
                np.int64
            ),
        )
        .groupby("day")
        .cents.sum()
        .sort_index()
    )
    c = daily.values.astype(np.float64)
    out = {r["method"]: r for r in _run(spark, "timeseries_backtest_naive")}
    for method, k in (("naive_lag1", 1), ("seasonal_lag7", 7)):
        actual, fcst = c[k:], c[:-k]
        o = out[method]
        assert o["n_forecasts"] == len(actual)
        mae = np.abs(actual - fcst).mean() / 100
        rmse = math.sqrt((((actual - fcst) / 100) ** 2).mean())
        mape = (np.abs(actual - fcst) / actual).mean()
        assert abs(o["mae"] - mae) < 0.01
        assert abs(o["rmse"] - rmse) < 0.01
        assert abs(o["mape"] - mape) < 2e-6


# -------------------------------------------- monthly percentiles


def test_monthly_percentiles_vs_numpy(spark, orders_pd):
    mon = orders_pd.o_orderdate.dt.strftime("%Y-%m")
    out = {r["mon"]: r for r in _run(spark, "orders_monthly_percentiles")}
    assert set(out) == set(mon.unique())
    for m, grp in orders_pd.o_totalprice.groupby(mon):
        x = grp.values
        o = out[m]
        assert o["n_orders"] == len(x)
        for col, q in (("p50", 50), ("p90", 90), ("p99", 99)):
            assert abs(o[col] - np.percentile(x, q)) < 2e-4, (m, col)
        assert abs(o["p100"] - x.max()) < 0.005 + 1e-9


# ----------------------------------------------- freshness staleness


def test_freshness_lag_vs_pandas_max(spark, events_pd):
    sec = lambda t: pd.Timestamp(t).value // 1000  # microseconds
    gmax = events_pd.ts.max()
    out = {r["event_type"]: r for r in _run(spark, "dq_freshness_lag")}
    for et, grp in events_pd.groupby("event_type"):
        o = out[et]
        assert o["n"] == len(grp)
        want = (sec(gmax) - sec(grp.ts.max())) // 1_000_000
        assert o["staleness_sec"] == want, (et, o, want)
        assert o["stale_flag"] == int(want > 86400)


# ---------------------------------------- regression calibration


def test_regression_calibration_vs_numpy_fit(spark, lineitem_pd):
    x = lineitem_pd.l_quantity.values.astype(np.float64)
    y = np.round(lineitem_pd.l_extendedprice.values * 100)
    b1, b0 = np.polyfit(x, y, 1)
    bucket = np.minimum(9, ((x - 1) // 5)).astype(int)
    out = {r["bucket"]: r for r in _run(spark, "ml_regression_calibration")}
    assert set(out) == set(np.unique(bucket))
    for b in np.unique(bucket):
        m = bucket == b
        o = out[b]
        assert o["n"] == int(m.sum())
        pred = (b0 + b1 * x[m].mean()) / 100.0
        actual = y[m].mean() / 100.0
        assert abs(o["avg_pred_milli"] - _fold(pred, 1e3)) <= 1
        assert abs(o["avg_actual_milli"] - _fold(actual, 1e3)) <= 1
        assert abs(o["bias_milli"] - _fold(pred - actual, 1e3)) <= 2


# ------------------------------------------- embedding drift monitor


def test_mean_shift_drift_vs_numpy_welch(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    g = emb.vec_id.values % 2
    A, B = X[g == 0], X[g == 1]
    out = {r["dim"]: r for r in _run(spark, "emb_mean_shift_drift")}
    assert set(out) == set(range(1, X.shape[1] + 1))
    for dim in range(X.shape[1]):
        a, b = A[:, dim], B[:, dim]
        diff = a.mean() - b.mean()
        se = math.sqrt(a.var(ddof=1) / len(a) + b.var(ddof=1) / len(b))
        o = out[dim + 1]
        assert (o["n0"], o["n1"]) == (len(a), len(b))
        assert abs(o["mean_diff_micro"] - _fold(diff, 1e6)) <= 1
        assert abs(o["welch_t_milli"] - _fold(diff / se, 1e3)) <= 1


# ------------------------------------------------- RAKE keywords


def test_rake_phrases_vs_python_reference(spark, documents_pd):
    from collections import Counter

    # induced delimiters: 8 most frequent tokens, ties by token asc
    freq = Counter(
        t for text in documents_pd.text for t in text.split(" ")
    )
    delim = {
        t
        for t, _ in sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    }
    phrases = []  # (doc_id, [words])
    for _, d in documents_pd.iterrows():
        run = []
        for t in d.text.split(" "):
            if t in delim:
                if run:
                    phrases.append(run)
                run = []
            else:
                run.append(t)
        if run:
            phrases.append(run)
    wfreq, wdeg = Counter(), Counter()
    for ws in phrases:
        for t in ws:
            wfreq[t] += 1
            wdeg[t] += len(ws)
    best = {}
    occur = Counter()
    for ws in phrases:
        phrase = " ".join(ws)
        score = sum(wdeg[t] / wfreq[t] for t in ws)
        occur[phrase] += 1
        cur = best.get(phrase)
        if cur is None or score > cur[0]:
            best[phrase] = (score, len(ws))
    ranked = sorted(
        ((s, ln, p) for p, (s, ln) in best.items()),
        key=lambda t: (-t[0], t[2]),
    )[:15]
    out = [
        (r["phrase"], r["plen"], r["n_occur"], r["rake_score"], r["rk"])
        for r in _run(spark, "text_rake_phrases")
    ]
    assert len(out) == len(ranked)
    for o, (score, plen, phrase) in zip(out, ranked):
        assert o[0] == phrase, (o, phrase)
        assert o[1] == plen
        assert o[2] == occur[phrase]
        assert abs(o[3] - score) < 2e-6


# --------------------------------------------------- ABC-XYZ matrix


def test_abc_xyz_matrix_vs_python_cells(spark, lineitem_pd):
    from decimal import ROUND_HALF_UP, Decimal

    cents = np.array(
        [
            int(Decimal(repr(v)).quantize(Decimal("1"), rounding=ROUND_HALF_UP))
            for v in lineitem_pd.l_extendedprice.values
            * (1 - lineitem_pd.l_discount.values)
            * 100
        ],
        dtype=np.int64,
    )
    per = (
        lineitem_pd.assign(cents=cents)
        .groupby("l_partkey")
        .cents.sum()
        .reset_index()
        .sort_values(["cents", "l_partkey"], ascending=[False, True])
    )
    total = int(per.cents.sum())
    share = per.cents.cumsum().values / total
    per["abc"] = np.where(share <= 0.80, "A", np.where(share <= 0.95, "B", "C"))

    mq = (
        lineitem_pd.assign(
            mo=lineitem_pd.l_shipdate.values.astype("datetime64[M]"),
            q=lineitem_pd.l_quantity.values.astype(np.int64),
        )
        .groupby(["l_partkey", "mo"])
        .q.sum()
    )
    xyz = {}
    for pk, grp in mq.groupby(level=0):
        v = grp.values.astype(np.float64)
        if len(v) < 2:
            xyz[pk] = "Z"
        else:
            cv = v.std(ddof=1) / v.mean()
            xyz[pk] = "X" if cv < 0.5 else ("Y" if cv < 1.0 else "Z")
    per["xyz"] = per.l_partkey.map(xyz)
    cellrev = per.groupby(["abc", "xyz"]).cents.sum()
    cellcnt = per.groupby(["abc", "xyz"]).size()
    out = {
        (r["abc_class"], r["xyz_class"]): r
        for r in _run(spark, "orders_abc_xyz_matrix")
    }
    assert set(out) == set(cellcnt.index)
    for cell in cellcnt.index:
        o = out[cell]
        assert o["n_parts"] == cellcnt[cell]
        assert (
            abs(o["revenue_share_micro"] - _fold(cellrev[cell] / total, 1e6))
            <= 1
        )


# ---------------------------------------------------------- BM25


def test_bm25_vs_python_reference(spark, documents_pd):
    from collections import Counter

    terms = ("spark", "table", "query")
    dl, tf = {}, {}
    for _, d in documents_pd.iterrows():
        toks = d.text.split(" ")
        dl[d.doc_id] = len(toks)
        c = Counter(t for t in toks if t in terms)
        if c:
            tf[d.doc_id] = c
    n_docs = len(documents_pd)
    avg_len = sum(dl.values()) / n_docs
    df = Counter(t for c in tf.values() for t in c)
    scored = []
    for doc, c in tf.items():
        s = 0.0
        for t, f in c.items():
            idf = math.log((n_docs - df[t] + 0.5) / (df[t] + 0.5) + 1.0)
            s += idf * (f * 2.2) / (f + 1.2 * (0.25 + 0.75 * dl[doc] / avg_len))
        scored.append((doc, s))
    ranked = sorted(scored, key=lambda t: (-t[1], t[0]))[:20]
    out = [(r["doc_id"], r["bm25"], r["rk"]) for r in _run(spark, "search_bm25_rank")]
    assert len(out) == len(ranked)
    for o, (doc, s) in zip(out, ranked):
        assert o[0] == doc, (o, doc)
        assert abs(o[1] - s) < 2e-6


# ------------------------------------------------------ RRF fusion


def test_rrf_fusion_vs_numpy_two_rankers(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    ids = emb.vec_id.values

    def topk(M, k):
        nrm = np.linalg.norm(M, axis=1)
        nrm[nrm == 0] = 1.0
        N = M / nrm[:, None]
        S = N @ N.T
        ranks = {}
        for qi in np.nonzero(ids < 10)[0]:
            order = sorted(
                (i for i in range(len(ids)) if ids[i] != ids[qi]),
                key=lambda i: (-S[qi, i], ids[i]),
            )[:k]
            for rk, i in enumerate(order, start=1):
                ranks[(ids[qi], ids[i])] = rk
        return ranks

    fr = topk(X, 10)
    tr = topk(X[:, :16], 10)
    fused = {}
    for key in set(fr) | set(tr):
        fused[key] = (0 if key not in fr else 1.0 / (60 + fr[key])) + (
            0 if key not in tr else 1.0 / (60 + tr[key])
        )
    want = []
    for q in sorted({k[0] for k in fused}):
        cand = sorted(
            ((v, n) for (qq, n), v in fused.items() if qq == q),
            key=lambda t: (-t[0], t[1]),
        )[:5]
        for rk, (v, n) in enumerate(cand, start=1):
            want.append((q, n, round(v, 6), rk))
    out = [
        (r["query_id"], r["neighbor_id"], r["rrf"], r["rk"])
        for r in _run(spark, "sim_rrf_fusion")
    ]
    assert len(out) == len(want)
    for o, w in zip(out, want):
        assert (o[0], o[1], o[3]) == (w[0], w[1], w[3]), (o, w)
        assert abs(o[2] - w[2]) < 2e-6


# ---------------------------------------------------- MMR rerank


def test_mmr_rerank_vs_numpy_greedy(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    ids = emb.vec_id.values
    nrm = np.linalg.norm(X, axis=1)
    nrm[nrm == 0] = 1.0
    N = X / nrm[:, None]
    S = N @ N.T
    out = {r["query_id"]: r for r in _run(spark, "sim_mmr_rerank")}
    for qi in np.nonzero(ids < 8)[0]:
        cand = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-S[qi, i], ids[i]),
        )[:10]
        picked = []
        scores = []
        for _ in range(3):
            best = None
            for i in cand:
                if i in picked:
                    continue
                if not picked:
                    s = S[qi, i]
                else:
                    s = 0.7 * S[qi, i] - 0.3 * max(S[i, p] for p in picked)
                if best is None or s > best[0] + 1e-15 or (
                    abs(s - best[0]) <= 1e-15 and ids[i] < ids[best[1]]
                ):
                    best = (s, i)
            picked.append(best[1])
            scores.append(best[0])
        o = out[ids[qi]]
        assert (o["s1_id"], o["s2_id"], o["s3_id"]) == tuple(
            ids[p] for p in picked
        ), (ids[qi], o)
        for col, s in zip(("s1_score", "s2_score", "s3_score"), scores):
            assert abs(o[col] - s) < 2e-6


# ------------------------------------------------ threshold sweep


def test_threshold_sweep_vs_python_filter(spark):
    from hive_release_spark.catalog import load_table
    from hive_release_spark.llm import dedup as ddp

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r.doc_a, r.doc_b, r.jaccard)
        for r in ddp.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    ]
    out = {
        round(r["threshold"], 2): r for r in _run(spark, "dedup_threshold_sweep")
    }
    for i in range(5):
        t = (5 + i) / 10.0
        sel = [(a, b) for a, b, j in pairs if j >= t]
        o = out[round(t, 2)]
        assert o["n_pairs"] == len(sel)
        assert o["n_docs_dropped"] == len({b for _, b in sel})


# --------------------------------------------------- PMI collocations


def test_pmi_top_pairs_vs_python_counts(spark, documents_pd):
    from collections import Counter

    big, uni1, uni2 = Counter(), Counter(), Counter()
    n_big = 0
    for text in documents_pd.text:
        w = text.split(" ")
        for a, b in zip(w, w[1:]):
            big[(a, b)] += 1
            uni1[a] += 1
            uni2[b] += 1
            n_big += 1
    scored = [
        (a, b, c, math.log(c * n_big / (uni1[a] * uni2[b])))
        for (a, b), c in big.items()
        if c >= 5
    ]
    ranked = sorted(scored, key=lambda t: (-t[3], t[0], t[1]))[:20]
    out = [
        (r["w1"], r["w2"], r["c_xy"], r["pmi"])
        for r in _run(spark, "text_pmi_top_pairs")
    ]
    assert len(out) == len(ranked)
    for o, w in zip(out, ranked):
        assert o[:3] == w[:3], (o, w)
        assert abs(o[3] - w[3]) < 2e-6


# ---------------------------------------------------------- Zipf fit


def test_zipf_fit_vs_numpy_rank_frequency(spark, documents_pd):
    from collections import Counter

    freq = Counter(t for text in documents_pd.text for t in text.split(" "))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    f = np.array([c for _, c in ranked], dtype=np.float64)
    r = np.arange(1, len(f) + 1, dtype=np.float64)
    slope, icept = np.polyfit(np.log(r), np.log(f), 1)
    pred = icept + slope * np.log(r)
    ss_res = float(((np.log(f) - pred) ** 2).sum())
    ss_tot = float(((np.log(f) - np.log(f).mean()) ** 2).sum())
    r2 = 1 - ss_res / ss_tot
    out = _run(spark, "corpus_zipf_fit")[0]
    assert out["vocab_size"] == len(f)
    assert abs(out["zipf_slope"] - slope) < 2e-4
    assert abs(out["fit_r2"] - r2) < 2e-4


# ------------------------------------------------------ bigram LM


def test_lm_score_vs_python_addone(spark, documents_pd):
    from collections import Counter

    big, ch = Counter(), Counter()
    vocab = set()
    doc_bigrams = {}
    for _, d in documents_pd.iterrows():
        w = d.text.split(" ")
        vocab.update(w)
        pairs = list(zip(w, w[1:]))
        if pairs:
            doc_bigrams[d.doc_id] = pairs
        for a, b in pairs:
            big[(a, b)] += 1
            ch[a] += 1
    V = len(vocab)
    out = {r["doc_id"]: r for r in _run(spark, "text_lm_score")}
    assert set(out) == set(doc_bigrams)
    for doc, pairs in doc_bigrams.items():
        lps = [
            math.log((big[(a, b)] + 1) / (ch[a] + V)) for a, b in pairs
        ]
        o = out[doc]
        assert o["n_bigrams"] == len(pairs)
        assert abs(o["avg_logprob"] - sum(lps) / len(lps)) < 2e-6


# ---------------------------------------------------------- Heaps fit


def test_heaps_fit_vs_python_growth_curve(spark, documents_pd):
    seen = set()
    xs, ys = [], []
    cum_tok = cum_vocab = 0
    for _, d in documents_pd.sort_values("doc_id").iterrows():
        w = d.text.split(" ")
        cum_tok += len(w)
        new = set(w) - seen
        cum_vocab += len(new)
        seen |= new
        xs.append(math.log(cum_tok))
        ys.append(math.log(cum_vocab))
    beta, icept = np.polyfit(xs, ys, 1)
    pred = icept + beta * np.array(xs)
    y = np.array(ys)
    r2 = 1 - float(((y - pred) ** 2).sum()) / float(((y - y.mean()) ** 2).sum())
    out = _run(spark, "corpus_heaps_fit")[0]
    assert out["n_points"] == len(xs)
    assert abs(out["beta"] - beta) < 2e-4
    assert abs(out["k"] - math.exp(icept)) < 2e-3
    assert abs(out["r2"] - r2) < 2e-4


# ---------------------------------------------- embedding eval trio


def _np_embeddings():
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    return emb.vec_id.values, emb.label.values, X


def _np_cosine_matrix(X):
    nrm = np.linalg.norm(X, axis=1)
    nrm[nrm == 0] = 1.0
    N = X / nrm[:, None]
    return N @ N.T


def test_hard_negatives_vs_numpy(spark):
    ids, labels, X = _np_embeddings()
    S = _np_cosine_matrix(X)
    out = {}
    for r in _run(spark, "sim_hard_negatives"):
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["neighbor_label"], r["sim"])
        )
    for qi in np.nonzero(ids < 20)[0]:
        cand = sorted(
            (i for i in range(len(ids)) if labels[i] != labels[qi]),
            key=lambda i: (-S[qi, i], ids[i]),
        )[:5]
        rows = sorted(out[ids[qi]])
        assert [r[1] for r in rows] == [ids[i] for i in cand], ids[qi]
        for (rk, nid, nlab, sim), i in zip(rows, cand):
            assert nlab == labels[i]
            assert abs(sim - S[qi, i]) < 2e-6


def test_matryoshka_recall_vs_numpy(spark):
    ids, _, X = _np_embeddings()
    Sf = _np_cosine_matrix(X)
    St = _np_cosine_matrix(X[:, :16])

    def top5(S, qi):
        return [
            ids[i]
            for i in sorted(
                (i for i in range(len(ids)) if ids[i] != ids[qi]),
                key=lambda i: (-S[qi, i], ids[i]),
            )[:5]
        ]

    out = {r["query_id"]: r for r in _run(spark, "emb_matryoshka_recall")}
    for qi in np.nonzero(ids < 20)[0]:
        overlap = len(set(top5(Sf, qi)) & set(top5(St, qi)))
        o = out[ids[qi]]
        assert o["n_overlap"] == overlap, (ids[qi], o, overlap)
        assert abs(o["recall_at_5"] - round(overlap / 5.0, 2)) < 1e-9


def test_cluster_separation_vs_numpy(spark):
    _, labels, X = _np_embeddings()
    out = {r["label"]: r for r in _run(spark, "emb_cluster_separation")}
    cents = {l: X[labels == l].mean(axis=0) for l in np.unique(labels)}
    for l in np.unique(labels):
        mask = labels == l
        mean_dist = float(
            np.linalg.norm(X[mask] - cents[l], axis=1).mean()
        )
        min_gap = min(
            float(np.linalg.norm(cents[l] - cents[m]))
            for m in cents
            if m != l
        )
        o = out[l]
        assert o["n"] == int(mask.sum())
        assert abs(o["mean_dist"] - mean_dist) < 2e-6
        assert abs(o["nearest_centroid_gap"] - min_gap) < 2e-6
        assert abs(o["compactness_ratio"] - mean_dist / min_gap) < 2e-5


# -------------------------------------------------- containment pairs


def test_containment_vs_python_shingle_sets(spark, documents_pd):
    sets = {}
    for _, d in documents_pd.iterrows():
        w = d.text.split(" ")
        sh = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
        if sh:
            sets[d.doc_id] = sh
    want = []
    docs = sorted(sets)
    for a in docs:
        for b in docs:
            if a == b:
                continue
            na, nb = len(sets[a]), len(sets[b])
            if na > nb or (na == nb and a >= b):
                continue  # A must be the smaller side (ties by id)
            common = len(sets[a] & sets[b])
            if common / na >= 0.8:
                want.append((a, b, round(common / na, 6)))
    want.sort()
    out = [
        (r["doc_small"], r["doc_big"], r["containment"])
        for r in _run(spark, "dedup_containment_pairs")
    ]
    assert len(out) == len(want)
    for o, w in zip(out, want):
        assert o[:2] == w[:2], (o, w)
        assert abs(o[2] - w[2]) < 2e-6


# --------------------------------------------------- corr matrix


def test_corr_matrix_vs_numpy(spark, lineitem_pd):
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    C = np.corrcoef(lineitem_pd[cols].values.T)
    names = {
        (0, 1): "qty_price", (0, 2): "qty_disc", (0, 3): "qty_tax",
        (1, 2): "price_disc", (1, 3): "price_tax", (2, 3): "disc_tax",
    }
    out = _run(spark, "agg_corr_matrix")[0]
    assert out["n"] == len(lineitem_pd)
    for (i, j), name in names.items():
        assert abs(out[name] - C[i, j]) < 2e-6, (name, out[name], C[i, j])


# ----------------------------------------------- degree histogram


def test_graph_degrees_vs_python_counter(spark):
    from collections import Counter

    from hive_release_spark.catalog import load_table
    from hive_release_spark.llm import dedup as ddp

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ddp.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    ]
    deg = Counter()
    for a, b in pairs:
        deg[a] += 1
        deg[b] += 1
    hist = Counter(deg.values())
    out = {r["degree"]: r["n_docs"] for r in _run(spark, "dedup_graph_degrees")}
    assert out == dict(hist)


# ------------------------------------------------ length histogram


def test_length_histogram_vs_python_buckets(spark, documents_pd):
    from collections import Counter

    n_docs, tokens = Counter(), Counter()
    for text in documents_pd.text:
        n = len(text.split(" "))
        n_docs[n // 16] += 1
        tokens[n // 16] += n
    out = {r["bucket"]: r for r in _run(spark, "corpus_length_histogram")}
    assert set(out) == set(n_docs)
    for b in n_docs:
        o = out[b]
        assert o["bucket_lo"] == b * 16
        assert o["n_docs"] == n_docs[b]
        assert o["total_tokens"] == tokens[b]


# ------------------------------------------- sorted-neighborhood SNM


def test_sorted_neighborhood_vs_python_window(spark):
    part = pd.read_parquet(f"{SF_SMOKE}/part.parquet")
    counts = part.groupby("p_name").size()
    order = sorted(counts.index, key=lambda n: (n[::-1], n))
    want = []
    for i, a in enumerate(order):
        for d in (1, 2):
            if i + d < len(order):
                b = order[i + d]
                lev = _levenshtein(a, b)
                if lev <= 2:
                    want.append(
                        (a, b, d, lev, int(counts[a]), int(counts[b]))
                    )
    want.sort()
    out = [
        (
            r["name_a"], r["name_b"], r["win_dist"], r["lev"],
            r["n_rows_a"], r["n_rows_b"],
        )
        for r in _run(spark, "dedup_sorted_neighborhood")
    ]
    assert out == want


# ------------------------------------------- embedding quality gate


def test_emb_quality_report_vs_numpy_norms(spark):
    # r12 vector-specials contract: corruption = any NULL/NaN/Inf
    # component (n_with_nan → n_corrupt); norm statistics ride FINITE
    # norms only (the committed fixture has no corrupt vectors, so
    # finite == all here — the corrupt regime is exercised by the
    # vec axis sweep in test_empty_input.py)
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    nrm = np.linalg.norm(X, axis=1)
    bad_rows = ~np.isfinite(X).all(axis=1)
    mu = nrm[~bad_rows].mean()
    sd = nrm[~bad_rows].std(ddof=0)
    out = {r["label"]: r for r in _run(spark, "emb_quality_report")}
    for l in np.unique(emb.label.values):
        m = emb.label.values == l
        o = out[l]
        ok = m & ~bad_rows
        assert o["n_vecs"] == int(m.sum())
        assert o["n_corrupt"] == int(bad_rows[m].sum())
        assert o["n_zero_norm"] == int((nrm[ok] == 0).sum())
        outliers = (~bad_rows[m]) & (np.abs(nrm[m] - mu) > 3 * sd)
        assert o["n_norm_outliers"] == int(outliers.sum())
        assert abs(o["mean_norm"] - nrm[ok].mean()) < 2e-6
        assert abs(o["min_norm"] - nrm[ok].min()) < 2e-6
        assert abs(o["max_norm"] - nrm[ok].max()) < 2e-6


# ------------------------------------------------ payload dedup math


def test_payload_dedup_vs_hashlib_sha256(spark, documents_pd):
    import hashlib
    from collections import Counter, defaultdict

    groups = defaultdict(list)
    for _, d in documents_pd.iterrows():
        modality = ["image", "audio", "video"][d.doc_id % 3]
        payload = d.text.encode()
        groups[(modality, hashlib.sha256(payload).hexdigest())].append(
            len(payload)
        )
    per_mod = Counter()
    stats = {}
    for (modality, _), sizes in groups.items():
        u, a, dropped, saved = stats.get(modality, (0, 0, 0, 0))
        stats[modality] = (
            u + 1,
            a + len(sizes),
            dropped + len(sizes) - 1,
            saved + (len(sizes) - 1) * max(sizes),
        )
    out = {r["modality"]: r for r in _run(spark, "multimodal_payload_dedup")}
    assert set(out) == set(stats)
    for modality, (u, a, dropped, saved) in stats.items():
        o = out[modality]
        assert (
            o["n_unique"], o["n_assets"], o["n_dropped"], o["bytes_saved"]
        ) == (u, a, dropped, saved), (modality, o)


# ------------------------------------------------ retrieval scorecard


def test_search_eval_metrics_vs_numpy(spark):
    ids, labels, X = _np_embeddings()
    S = _np_cosine_matrix(X)
    out = {r["query_id"]: r for r in _run(spark, "search_eval_metrics")}
    for qi in np.nonzero(ids < 8)[0]:
        order = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-S[qi, i], ids[i]),
        )[:10]
        rel = [labels[i] == labels[qi] for i in order]
        hits = sum(rel)
        total_rel = int(
            sum(
                1
                for i in range(len(ids))
                if ids[i] != ids[qi] and labels[i] == labels[qi]
            )
        )
        mrr = max(
            (1.0 / (rk + 1) for rk, r in enumerate(rel) if r), default=0.0
        )
        dcg = sum(
            1.0 / math.log2(rk + 2) for rk, r in enumerate(rel) if r
        )
        idcg = sum(
            1.0 / math.log2(i + 1) for i in range(1, min(total_rel, 10) + 1)
        )
        o = out[ids[qi]]
        assert o["hits_10"] == hits
        assert o["total_rel"] == total_rel
        assert abs(o["recall_10"] - hits / total_rel) < 2e-6
        assert abs(o["mrr"] - mrr) < 2e-6
        assert abs(o["ndcg_10"] - dcg / idcg) < 2e-6


# -------------------------------------------- Dirichlet QL ranking


def test_query_likelihood_vs_python_reference(spark, documents_pd):
    """Independent check of the DECOMPOSED Dirichlet form against the
    NAIVE textbook form score = sum_t log((tf + mu*P_t)/(dlen + mu)) —
    catching exactly the class of decomposition error the oracle
    (which replays the decomposition) cannot."""
    from collections import Counter

    from hive_release_spark.queries.llm3 import _QL_MU, _QL_TERMS

    mu = _QL_MU
    dl, tf = {}, {}
    cf = Counter()
    total = 0
    for _, d in documents_pd.iterrows():
        toks = d.text.split(" ")
        dl[d.doc_id] = len(toks)
        total += len(toks)
        c = Counter(t for t in toks if t in _QL_TERMS)
        tf[d.doc_id] = c
        cf.update(c)
    scored = []
    for doc, n in dl.items():
        s = 0.0
        for t in _QL_TERMS:
            p_t = cf[t] / total
            s += math.log((tf[doc].get(t, 0) + mu * p_t) / (n + mu))
        scored.append((doc, s))
    ranked = sorted(scored, key=lambda t: (-t[1], t[0]))[:20]
    out = [
        (r["doc_id"], r["ql_score"], r["rk"])
        for r in _run(spark, "search_query_likelihood")
    ]
    assert len(out) == len(ranked)
    for o, (doc, s) in zip(out, ranked):
        assert o[0] == doc, (o, doc)
        assert abs(o[1] - s) < 2e-6


# ----------------------------------------- exact-gram decontamination


def test_decontaminate_ngram_vs_python_sets(spark, documents_pd):
    grams = {}
    for _, d in documents_pd.iterrows():
        w = d.text.split(" ")
        grams[d.doc_id] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    ev = set()
    for doc, g in grams.items():
        if doc % 41 == 0:
            ev |= g
    out = {r["doc_id"]: r for r in _run(spark, "decontaminate_ngram")}
    train = [d for d in grams if d % 41 != 0]
    # the entry emits every train doc (LEFT join keeps gram-less docs)
    all_train = [d for d in documents_pd.doc_id if d % 41 != 0]
    assert set(out) == set(all_train)
    for doc in train:
        hits = len(grams[doc] & ev)
        o = out[doc]
        assert o["n_hit_grams"] == hits, (doc, o, hits)
        assert o["contaminated"] == (hits > 0)


# ---------------------------------------------- DSIR importance scores


def test_dsir_vs_python_hashed_lm(spark, documents_pd):
    import hashlib
    from collections import Counter

    B = 64

    def bucket(term):
        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % B

    raw, tgt = Counter(), Counter()
    doc_buckets = {}
    nr = nt = 0
    for _, d in documents_pd.iterrows():
        bs = [bucket(t) for t in d.text.split(" ")]
        doc_buckets[d.doc_id] = bs
        raw.update(bs)
        nr += len(bs)
        if d.lang == "en":
            tgt.update(bs)
            nt += len(bs)
    lm = {
        b: math.log(
            (tgt.get(b, 0) + 1.0) * (nr + B) / ((raw[b] + 1.0) * (nt + B))
        )
        for b in raw
    }
    out = {r["doc_id"]: r for r in _run(spark, "sample_importance_dsir")}
    assert set(out) == set(doc_buckets)
    for doc, bs in doc_buckets.items():
        o = out[doc]
        assert o["n_tok"] == len(bs)
        score = sum(lm[b] for b in bs) / len(bs)
        assert abs(o["dsir_score"] - score) < 2e-6, (doc, o, score)


# ------------------------------------------------- inter-event gaps


def test_gap_stats_vs_python_lags(spark, events_pd):
    sec = lambda t: int(pd.Timestamp(t).timestamp())  # noqa: E731
    sub = events_pd.sort_values(["user_id", "ts", "event_id"])
    out = {r["user_id"]: r for r in _run(spark, "events_gap_stats")}
    for uid, grp in sub.groupby("user_id"):
        ts = list(grp.ts)
        gaps = [sec(b) - sec(a) for a, b in zip(ts, ts[1:])]
        o = out[uid]
        assert o["n_gaps"] == len(gaps)
        if gaps:
            assert o["min_gap_s"] == min(gaps)
            assert o["max_gap_s"] == max(gaps)
            assert o["total_gap_s"] == sum(gaps)


# ------------------------------------------------------- RFM grid


def test_rfm_segments_vs_python_ntile(spark, orders_pd):
    from collections import Counter

    base = orders_pd.groupby("o_custkey").agg(
        last_order=("o_orderdate", "max"),
        frequency=("o_orderkey", "size"),
        monetary=("o_totalprice", lambda s: round(s.sum(), 2)),
    )
    base["recency_d"] = (
        pd.Timestamp("1998-08-01") - base.last_order
    ).dt.days

    def ntile4(keys):
        n = len(keys)
        order = sorted(range(n), key=lambda i: keys[i])
        sizes = [n // 4 + (1 if i < n % 4 else 0) for i in range(4)]
        tile = {}
        start = 0
        for t, sz in enumerate(sizes, start=1):
            for i in order[start : start + sz]:
                tile[i] = t
            start += sz
        return tile

    idx = list(base.index)
    r_inv = ntile4([(base.recency_d[c], c) for c in idx])
    f_inv = ntile4([(-base.frequency[c], c) for c in idx])
    m_inv = ntile4([(-base.monetary[c], c) for c in idx])
    cells_n, cells_v = Counter(), Counter()
    for i, c in enumerate(idx):
        key = (5 - r_inv[i], 5 - f_inv[i], 5 - m_inv[i])
        cells_n[key] += 1
        cells_v[key] += base.monetary[c]
    out = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in _run(spark, "customer_rfm_segments")
    }
    assert set(out) == set(cells_n)
    for key in cells_n:
        o = out[key]
        assert o["n_customers"] == cells_n[key], (key, o)
        assert abs(o["segment_value"] - round(cells_v[key], 2)) < 0.02


# ------------------------------------------------ basket affinity


def test_basket_affinity_vs_python_lift(spark, lineitem_pd):
    from collections import Counter

    items = (
        lineitem_pd.assign(grp=lineitem_pd.l_partkey % 50)[
            ["l_orderkey", "grp"]
        ]
        .drop_duplicates()
    )
    n_orders = items.l_orderkey.nunique()
    freq = items.groupby("grp").size()
    co = Counter()
    for _, grp in items.groupby("l_orderkey"):
        gs = sorted(grp.grp.unique())
        for i in range(len(gs)):
            for j in range(i + 1, len(gs)):
                co[(gs[i], gs[j])] += 1
    want = {
        (a, b): (c, c * n_orders / (freq[a] * freq[b]))
        for (a, b), c in co.items()
        if c >= 20
    }
    out = {
        (r["grp_a"], r["grp_b"]): r for r in _run(spark, "basket_part_affinity")
    }
    assert set(out) == set(want)
    for key, (c, lift) in want.items():
        o = out[key]
        assert o["c_ab"] == c
        assert abs(o["lift"] - lift) < 2e-6


# ------------------------------------------------- daily z anomalies


def test_daily_anomaly_vs_numpy_zscores(spark, events_pd):
    n = events_pd.groupby(events_pd.ts.dt.normalize()).size()
    mu = float(n.values.mean())
    sd = float(n.values.std(ddof=1))
    out = {pd.Timestamp(r["day"]): r for r in _run(spark, "events_daily_anomaly")}
    assert set(out) == set(n.index)
    for day, cnt in n.items():
        o = out[day]
        assert o["n"] == cnt
        assert abs(o["z"] - (cnt - mu) / sd) < 2e-4
        assert o["is_anomaly"] == (abs(cnt - mu) > 2 * sd)


# -------------------------------------------- status transitions


def test_status_transitions_vs_python_lags(spark, orders_pd):
    from collections import Counter

    seq = orders_pd.sort_values(["o_custkey", "o_orderdate", "o_orderkey"])
    trans = Counter()
    for _, grp in seq.groupby("o_custkey"):
        st = list(grp.o_orderstatus)
        for a, b in zip(st, st[1:]):
            trans[(a, b)] += 1
    out = {
        (r["prev_status"], r["next_status"]): r["n"]
        for r in _run(spark, "orders_status_transitions")
    }
    assert out == dict(trans)


# -------------------------------------------------- Rocchio feedback


def test_rocchio_expansion_vs_numpy_two_rounds(spark):
    ids, _, X = _np_embeddings()
    S = _np_cosine_matrix(X)
    out = {}
    for r in _run(spark, "sim_rocchio_expansion"):
        out.setdefault(r["query_id"], []).append(
            (r["rank"], r["neighbor_id"], r["sim"])
        )

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b) / (na * nb) if na and nb else 0.0

    for qi in np.nonzero(ids < 8)[0]:
        top3 = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-S[qi, i], ids[i]),
        )[:3]
        cent = X[top3].mean(axis=0)
        qv = 0.7 * X[qi] + 0.3 * cent
        # round 2: cosine of the expanded query vs everyone but itself
        # (the expanded vector keeps the ORIGINAL query's id)
        cand = sorted(
            (i for i in range(len(ids)) if ids[i] != ids[qi]),
            key=lambda i: (-cos(qv, X[i]), ids[i]),
        )[:5]
        rows = sorted(out[ids[qi]])
        assert [r[1] for r in rows] == [ids[i] for i in cand], ids[qi]
        for (rk, nid, sim), i in zip(rows, cand):
            assert abs(sim - cos(qv, X[i])) < 2e-6


# ------------------------------------------------ k-fold CV by moments


def test_kfold_cv_vs_numpy_per_row_rmse(spark, lineitem_pd):
    """The engine never materializes a prediction (SSE expands from
    held-out moments); this reference fits each fold's complement with
    np.polyfit and computes RMSE by EXPLICIT per-row prediction — the
    two derivations agreeing is the strongest check the moment algebra
    can get."""
    import hashlib

    folds = np.array(
        [
            int(
                hashlib.md5(f"cv:{ok}:{ln}".encode()).hexdigest()[0], 16
            )
            % 4
            for ok, ln in zip(
                lineitem_pd.l_orderkey, lineitem_pd.l_linenumber
            )
        ]
    )
    x = lineitem_pd.l_quantity.values.astype(np.float64)
    y = np.round(lineitem_pd.l_extendedprice.values * 100)
    out = {r["fold"]: r for r in _run(spark, "ml_regression_kfold_cv")}
    assert set(out) == set(np.unique(folds))
    for k in np.unique(folds):
        test = folds == k
        b1, b0 = np.polyfit(x[~test], y[~test], 1)
        resid = y[test] - (b0 + b1 * x[test])
        rmse = math.sqrt(float((resid**2).mean())) / 100.0
        o = out[k]
        assert o["n_test"] == int(test.sum())
        assert abs(o["rmse_milli"] - _fold(rmse, 1e3)) <= 1, (k, o, rmse)
        assert abs(o["b1_micro"] - _fold(b1 / 100.0, 1e6)) <= 1


# ----------------------------------------------------- PageRank chain


def test_pagerank_vs_python_chain(spark):
    from hive_release_spark.catalog import load_table
    from hive_release_spark.llm import dedup as ddp

    docs = load_table(spark, SF_SMOKE, "documents")
    pairs = [
        (r.doc_a, r.doc_b)
        for r in ddp.jaccard_pairs(docs, n=3, threshold=0.5).collect()
    ]
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    n = len(adj)
    p = {v: 1.0 / n for v in adj}
    for _ in range(3):
        nxt = {v: 0.0 for v in adj}
        for v, nbrs in adj.items():
            share = p[v] / len(nbrs)
            for u in nbrs:
                nxt[u] += share
        p = {v: 0.15 / n + 0.85 * nxt[v] for v in adj}
    out = {r["doc_id"]: r for r in _run(spark, "graph_pagerank")}
    assert set(out) == set(adj)
    for v in adj:
        o = out[v]
        assert o["degree"] == len(adj[v])
        assert abs(o["pagerank"] - p[v]) < 2e-6, (v, o, p[v])


# ------------------------------------------------ permutation test


def test_randomization_test_vs_hashlib_worlds(spark, events_pd):
    import hashlib

    conv = (
        events_pd.assign(c=(events_pd.event_type == "purchase").astype(int))
        .groupby("user_id")
        .c.max()
    )

    def arm(salt, uid):
        return int(hashlib.md5(f"{salt}{uid}".encode()).hexdigest()[0], 16) % 2

    def diff(armmap):
        t = [conv[u] for u in conv.index if armmap[u] == 1]
        c = [conv[u] for u in conv.index if armmap[u] == 0]
        return sum(t) / len(t) - sum(c) / len(c)

    d_obs = diff({u: arm("exp1:", u) for u in conv.index})
    n_extreme = 0
    for b in range(32):
        d_b = diff({u: arm(f"perm{b}:", u) for u in conv.index})
        if abs(d_b) >= abs(d_obs):
            n_extreme += 1
    out = _run(spark, "stats_randomization_test")[0]
    assert out["b_total"] == 32
    assert out["n_extreme"] == n_extreme
    assert abs(out["d_obs_micro"] - _fold(d_obs, 1e6)) <= 1
    assert abs(out["p_milli"] - _fold((1 + n_extreme) / 33.0, 1e3)) <= 1


# ------------------------------------------------ lagged cross-corr


def test_cross_corr_vs_numpy(spark, lineitem_pd):
    day = (
        lineitem_pd.assign(dd=lineitem_pd.l_shipdate.dt.date)
        .groupby("dd")
        .agg(qty=("l_quantity", "sum"), n=("l_quantity", "size"))
        .sort_index()
    )
    q = day.qty.values.astype(np.float64)
    n = day.n.values.astype(np.float64)
    out = {r["lag"]: r for r in _run(spark, "timeseries_cross_corr")}
    assert set(out) == set(range(-3, 4))
    for k in range(-3, 4):
        # pair (x_t, y_{t-k}): x=qty at position i, y=n at position i-k
        if k >= 0:
            xs, ys = q[k:], n[: len(n) - k]
        else:
            xs, ys = q[: len(q) + k], n[-k:]
        o = out[k]
        assert o["n_pairs"] == len(xs)
        r = float(np.corrcoef(xs, ys)[0, 1])
        assert abs(o["ccf_micro"] - _fold(r, 1e6)) <= 2, (k, o, r)


# -------------------------------------------------- repetition rules


def test_repetition_score_vs_python_counters(spark, documents_pd):
    from collections import Counter

    out = {r["doc_id"]: r for r in _run(spark, "text_repetition_score")}
    assert len(out) == len(documents_pd)
    for _, d in documents_pd.iterrows():
        w = d.text.split(" ")
        dtr = len(set(w)) / len(w)
        o = out[d.doc_id]
        assert abs(o["distinct_token_ratio"] - dtr) < 1e-12
        if len(w) >= 2:
            bg = Counter(zip(w, w[1:]))
            share = max(bg.values()) / sum(bg.values())
            assert abs(o["top_bigram_share"] - share) < 1e-12
            assert o["is_repetitive"] == (share > 0.2 or dtr < 0.3)


# ----------------------------------------------- vocabulary cutoff


def test_vocab_cutoff_vs_python_mass(spark, documents_pd):
    from collections import Counter

    freq = Counter(t for text in documents_pd.text for t in text.split(" "))
    ranked = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(freq.values())
    want = []
    before = 0
    for rk, (term, f) in enumerate(ranked, start=1):
        if before / total < 0.9:
            want.append((term, f, rk))
        before += f
    out = [
        (r["term"], r["freq"], r["rank"])
        for r in _run(spark, "vocab_coverage_cutoff")
    ]
    assert out == want


# ---------------------------------------------- quantized k-means


def test_kmeans_vs_numpy_lloyd(spark):
    """Replay the 3 quantized Lloyd iterations sequentially in numpy
    (init = 8 lowest-id vectors, 6-dp centroid rounding, lowest-cluster
    tie-break) and require identical final assignments."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values(
        "vec_id"
    )
    ids = emb.vec_id.values
    X = np.stack(emb.embedding.values).astype("float64")
    cents = [X[i].copy() for i in range(8)]  # lowest ids are 0..7 sorted

    def assign(cents):
        d = np.stack(
            [((X - c) ** 2).sum(axis=1) for c in cents], axis=1
        )
        # lowest cluster id wins exact ties: argmin picks first max
        return d.argmin(axis=1)

    for _ in range(3):
        a = assign(cents)
        for c in range(8):
            m = a == c
            if m.any():
                cents[c] = np.round(X[m].mean(axis=0), 6)
    final = assign(cents)
    out = {r["vec_id"]: r["cluster"] for r in _run(spark, "emb_kmeans")}
    want = {int(ids[i]): int(final[i]) for i in range(len(ids))}
    assert out == want


# ---------------------------------------------------- tf-idf family


def test_tfidf_top_terms_vs_python(spark, documents_pd):
    from collections import Counter

    tf = {}
    df = Counter()
    for _, d in documents_pd.iterrows():
        c = Counter(d.text.split(" "))
        tf[d.doc_id] = c
        df.update(c.keys())
    n_docs = len(documents_pd)
    out = {}
    for r in _run(spark, "text_tfidf_top_terms"):
        out.setdefault(r["doc_id"], []).append((r["rk"], r["term"], r["tfidf"]))
    assert set(out) == set(tf)
    for doc, c in tf.items():
        scored = sorted(
            (
                (-round(f * math.log((n_docs + 1.0) / (df[t] + 1.0)), 6), t)
                for t, f in c.items()
            )
        )[:3]
        rows = sorted(out[doc])
        assert [r[1] for r in rows] == [t for _, t in scored], doc
        for (rk, t, s), (neg, _) in zip(rows, scored):
            assert abs(s - (-neg)) < 2e-6


def test_tfidf_cosine_vs_python_ltc(spark, documents_pd):
    from collections import Counter

    terms = ("spark", "table", "query")
    tf = {}
    df = Counter()
    for _, d in documents_pd.iterrows():
        c = Counter(d.text.split(" "))
        tf[d.doc_id] = c
        df.update(c.keys())
    n_docs = len(tf)
    qw = {t: math.log(n_docs / df[t]) for t in terms if t in df}
    qnorm = math.sqrt(sum(v * v for v in qw.values()))
    scored = []
    for doc, c in tf.items():
        wts = {
            t: (1.0 + math.log(f)) * math.log(n_docs / df[t])
            for t, f in c.items()
        }
        dnorm = math.sqrt(sum(v * v for v in wts.values()))
        s = sum(
            wts[t] / dnorm * qw[t] / qnorm for t in qw if t in wts
        )
        if s > 0:
            scored.append((doc, s))
    ranked = sorted(scored, key=lambda t: (-t[1], t[0]))[:20]
    out = [
        (r["doc_id"], r["tfidf_cos"]) for r in _run(spark, "search_tfidf_cosine")
    ]
    assert len(out) == len(ranked)
    for o, (doc, s) in zip(out, ranked):
        assert o[0] == doc, (o, doc)
        assert abs(o[1] - s) < 2e-6


# ------------------------------------------------- label centroids


def test_label_centroids_vs_numpy(spark):
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    X = np.stack(emb.embedding.values).astype("float64")
    labels = emb.label.values
    out = {
        (r["label"], r["pos"]): r["c"] for r in _run(spark, "emb_label_centroids")
    }
    for l in np.unique(labels):
        m = X[labels == l].mean(axis=0)
        for pos in range(X.shape[1]):
            assert abs(out[(l, pos + 1)] - round(float(m[pos]), 6)) < 2e-6


# --------------------------------------------- quality feature counts


def test_text_quality_vs_python_counts(spark, documents_pd):
    import re

    stop = {"the", "a", "of", "and", "to", "in", "is", "on"}
    out = {r["doc_id"]: r for r in _run(spark, "text_quality")}
    assert len(out) == len(documents_pd)
    for _, d in documents_pd.iterrows():
        toks = d.text.split(" ")
        o = out[d.doc_id]
        assert o["n_chars"] == len(d.text)
        assert o["n_tokens"] == len(toks)
        assert o["total_tok_chars"] == sum(len(t) for t in toks)
        assert o["n_stop"] == sum(1 for t in toks if t in stop)
        assert o["n_nonalpha"] == len(re.sub(r"[a-z]", "", d.text))


# --------------------------------------------------- doc fingerprints


def test_fingerprint_vs_hashlib(spark, documents_pd):
    import hashlib

    out = {r["doc_id"]: r["fingerprint"] for r in _run(spark, "text_fingerprint")}
    for _, d in documents_pd.iterrows():
        canon = " ".join(sorted(set(d.text.split(" "))))
        assert out[d.doc_id] == hashlib.md5(canon.encode()).hexdigest()


# ------------------------------------------------------- top bigrams


def test_top_ngrams_vs_counter(spark, documents_pd):
    from collections import Counter

    big = Counter()
    for text in documents_pd.text:
        w = text.split(" ")
        big.update(" ".join(p) for p in zip(w, w[1:]))
    want = sorted(big.items(), key=lambda kv: (-kv[1], kv[0]))[:30]
    out = [(r["ngram"], r["freq"]) for r in _run(spark, "text_ngrams_top")]
    assert out == want


# --------------------------------------------- corpus composition


def test_corpus_token_stats_vs_pandas(spark, documents_pd):
    out = {
        (r["lang"], r["source"]): r for r in _run(spark, "corpus_token_stats")
    }
    grp = documents_pd.assign(
        n_tok=[len(t.split(" ")) for t in documents_pd.text]
    ).groupby(["lang", "source"])
    assert set(out) == set(grp.groups)
    for key, g in grp:
        o = out[key]
        assert o["n_docs"] == len(g)
        assert o["total_tokens"] == int(g.n_tok.sum())
        assert o["min_chars"] == int(g.n_chars.min())
        assert o["max_chars"] == int(g.n_chars.max())
        assert abs(o["avg_chars"] - g.n_chars.mean()) < 1e-9


# ------------------------------------------ deterministic samplers


def test_split_train_eval_vs_python(spark, documents_pd):
    from collections import Counter

    cells_n, cells_c = Counter(), Counter()
    for _, d in documents_pd.iterrows():
        m = d.doc_id % 10
        split = "train" if m < 8 else ("eval" if m == 8 else "test")
        cells_n[(d.lang, split)] += 1
        cells_c[(d.lang, split)] += d.n_chars
    out = {
        (r["lang"], r["split"]): r for r in _run(spark, "split_train_eval")
    }
    assert set(out) == set(cells_n)
    for key in cells_n:
        assert out[key]["n"] == cells_n[key]
        assert out[key]["chars"] == cells_c[key]


def test_domain_mix_resample_vs_python(spark, documents_pd):
    def n_copies(doc_id, source):
        frac = {"src0": 2.5, "src1": 0.25, "src2": 1.5, "src3": 0.0}.get(
            source, 1.0
        )
        base = int(frac)
        extra = 1 if (doc_id * 2654435761) % 1000 < (frac - base) * 1000 else 0
        return base + extra

    want = []
    for _, d in documents_pd.sort_values("doc_id").iterrows():
        for i in range(1, n_copies(d.doc_id, d.source) + 1):
            want.append((d.doc_id, d.source, i))
    out = [
        (r["doc_id"], r["domain"], r["copy_idx"])
        for r in _run(spark, "domain_mix_resample")
    ]
    assert out == want


def test_shuffle_shard_assign_vs_hashlib(spark, documents_pd):
    import hashlib

    rows = []
    for doc_id in documents_pd.doc_id:
        h = hashlib.md5(f"s42:{doc_id}".encode()).hexdigest()
        shard = (int(h[0], 16) * 16 + int(h[1], 16)) % 16
        rows.append((doc_id, shard, h))
    by_shard = {}
    for doc_id, shard, h in sorted(rows, key=lambda r: (r[1], r[2], r[0])):
        by_shard.setdefault(shard, []).append(doc_id)
    pos = {
        doc: i + 1
        for docs in by_shard.values()
        for i, doc in enumerate(docs)
    }
    out = {r["doc_id"]: r for r in _run(spark, "shuffle_shard_assign")}
    assert set(out) == {r[0] for r in rows}
    for doc_id, shard, h in rows:
        o = out[doc_id]
        assert o["shard"] == shard
        assert o["sort_key"] == h
        assert o["pos"] == pos[doc_id], (doc_id, o, pos[doc_id])


def test_reservoir_group_vs_hashlib(spark, documents_pd):
    import hashlib

    out = {
        (r["lang"], r["rk"]): r["doc_id"]
        for r in _run(spark, "sample_reservoir_group")
    }
    for lang, grp in documents_pd.groupby("lang"):
        keyed = sorted(
            (hashlib.md5(f"rsv1:{d}".encode()).hexdigest(), d)
            for d in grp.doc_id
        )[:5]
        for rk, (_, doc) in enumerate(keyed, start=1):
            assert out[(lang, rk)] == doc, (lang, rk)


# ------------------------------------------------- assortativity


def test_graph_assortativity_vs_numpy_corrcoef(spark, lineitem_pd):
    """Degree assortativity of the co-purchase graph recomputed with a
    genuinely different formulation: collections.Counter degree counts
    over a Python-set edge list and np.corrcoef (deviations-from-mean
    path) instead of the engine's HUGEINT sufficient-statistics
    closed form. VERDICT r6 #4: this entry previously had no
    non-engine reference anywhere."""
    from collections import Counter
    from itertools import combinations

    baskets = {}
    for ok, pk in lineitem_pd[["l_orderkey", "l_partkey"]].drop_duplicates().itertuples(index=False):
        baskets.setdefault(ok, set()).add(pk)
    pair_counts = Counter()
    for parts in baskets.values():
        for a, b in combinations(sorted(parts), 2):
            pair_counts[(a, b)] += 1
    und = [p for p, c in pair_counts.items() if c >= 2]
    edges = und + [(b, a) for a, b in und]
    deg = Counter(a for a, _ in edges)
    x = np.array([deg[a] for a, _ in edges], dtype=float)
    y = np.array([deg[b] for _, b in edges], dtype=float)
    r = float(np.corrcoef(x, y)[0, 1])

    out = _run(spark, "graph_assortativity")[0]
    assert out["n_directed_edges"] == len(edges)
    assert abs(out["assortativity_micro"] - _fold(r, 1e6)) <= 1


# ------------------------------------------------------------- BPE


def test_bpe_train_merges_vs_sequential_python(spark):
    """The first 5 BPE merge rules recomputed by a sequential
    pure-Python trainer (token LISTS merged left-to-right
    non-overlapping) — no bracket-encoded string replace, no frames.
    VERDICT r6 #4: this entry previously had no non-engine reference.
    Exact match required: merge rules are discrete (pair strings and
    integer counts), there is no float drift to absorb."""
    import re
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    wf = Counter()
    token_re = re.compile(r"^[A-Za-z0-9]+$")
    for text in docs["text"]:
        for w in text.split(" "):
            if token_re.match(w):
                wf[w] += 1

    vocab = {w: tuple(w) for w in wf}
    rules = []
    for rnd in range(1, 6):
        counts = Counter()
        for w, toks in vocab.items():
            f = wf[w]
            for i in range(len(toks) - 1):
                counts[(toks[i], toks[i + 1])] += f
        # argmax count, lexicographic (a, b) tie-break
        (a, b), cnt = min(
            counts.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        rules.append((rnd, a, b, a + b, cnt))
        merged = {}
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2  # greedy left-to-right, non-overlapping
                else:
                    out.append(toks[i])
                    i += 1
            merged[w] = tuple(out)
        vocab = merged

    got = sorted(
        (r["round"], r["pair_a"], r["pair_b"], r["merged"], r["pair_count"])
        for r in _run(spark, "bpe_train_merges")
    )
    assert got == rules


# ---------------------------------------------- skyline frontier


def test_pareto_frontier_vs_numpy_dominance(spark, orders_pd):
    """Per-customer 2-D skyline recomputed by the LITERAL dominance
    definition with numpy broadcasting (dominated iff another order is
    >= on both (date, price) and > on one) — a third implementation
    next to the engine's two-window sweep and the oracle's NOT EXISTS
    self-join."""
    sub = orders_pd[orders_pd.o_custkey % 20 == 0]
    expect = set()
    for ck, grp in sub.groupby("o_custkey"):
        od = pd.to_datetime(grp.o_orderdate).values
        p = grp.o_totalprice.values
        dom = (
            (od[None, :] >= od[:, None])
            & (p[None, :] >= p[:, None])
            & ((od[None, :] > od[:, None]) | (p[None, :] > p[:, None]))
        ).any(axis=1)
        for ok, price in zip(grp.o_orderkey.values[~dom], p[~dom]):
            expect.add((ck, int(ok), float(price)))

    got = {
        (r["o_custkey"], r["o_orderkey"], float(r["price"]))
        for r in _run(spark, "orders_pareto_frontier")
    }
    assert got == expect


# --------------------------------------------- sequence packing


def test_pack_sequences_vs_pandas_cumsum(spark):
    """Streaming-concat packing replayed with a pandas shifted cumsum
    per shard (budget 512, 8 shards, shard = doc_id % 8, docs in
    doc_id order)."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs = docs.assign(
        n_tokens=docs.text.str.split(" ").str.len(),
        shard=(docs.doc_id % 8).astype(int),
    ).sort_values("doc_id")
    docs["before"] = (
        docs.groupby("shard")["n_tokens"].cumsum() - docs["n_tokens"]
    )
    docs["pack_id"] = docs["before"] // 512

    out = {r["doc_id"]: r for r in _run(spark, "pack_sequences")}
    assert len(out) == len(docs)
    for row in docs.itertuples(index=False):
        r = out[row.doc_id]
        assert (r["shard"], r["pack_id"], r["n_tokens"], r["tokens_before"]) \
            == (row.shard, row.pack_id, row.n_tokens, row.before), row.doc_id


# ---------------------------------------- stratified sampling


def test_sample_stratified_vs_hashlib(spark):
    """The md5-threshold stratified sampler replayed with hashlib:
    keep iff the first 8 hex chars of md5('v1:'||doc_id) fall under
    the stratum threshold format(int(rate * 16^8), '08x')."""
    import hashlib

    rates = {"en": 0.5, "de": 0.25, "fr": 1.0, "zh": 0.125}
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    expect = set()
    for row in docs.itertuples(index=False):
        rate = rates.get(row.lang, 0.0)
        thr = format(min(int(rate * 16**8), 16**8 - 1), "08x")
        h8 = hashlib.md5(f"v1:{row.doc_id}".encode()).hexdigest()[:8]
        if h8 < thr:
            expect.add(row.doc_id)

    got = {r["doc_id"] for r in _run(spark, "sample_stratified")}
    assert got == expect and len(got) > 0


# --------------------------------------------- word-id encoding


def test_tokenize_word_ids_vs_counter_vocab(spark):
    """90%-coverage vocabulary and id encoding replayed with
    collections.Counter and a sequential cumulative-mass scan: ranks
    by (freq desc, term), vocab = prefixes whose BEFORE-mass is under
    0.9 of total, ids = rank with 0 = UNK."""
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    freq = Counter()
    for text in docs.text:
        freq.update(text.split(" "))
    total = sum(freq.values())
    vocab = {}
    before = 0
    for rank, (term, f) in enumerate(
        sorted(freq.items(), key=lambda kv: (-kv[1], kv[0])), start=1
    ):
        if before / total < 0.9:
            vocab[term] = rank
        before += f

    out = {r["doc_id"]: r for r in _run(spark, "tokenize_word_ids")}
    assert len(out) == len(docs)
    for row in docs.itertuples(index=False):
        ids = [vocab.get(t, 0) for t in row.text.split(" ")]
        r = out[row.doc_id]
        assert r["ids_str"] == " ".join(map(str, ids)), row.doc_id
        assert r["n_tokens"] == len(ids)
        assert r["n_unk"] == sum(1 for i in ids if i == 0)


# ------------------------------------- fuzzy decontamination


def test_decontaminate_fuzzy_vs_exact_shingle_jaccard(spark):
    """Exact 3-gram-shingle Jaccard cross pairs recomputed with Python
    sets and an inverted index, XOR-filtered on the eval membership
    (doc_id % 41 == 0), grouped to (n_eval_matches, max rounded
    jaccard) per train doc. Verifies the shingle definition, the
    Jaccard arithmetic, the 0.5 cut, and the eval/train boundary
    against the engine's MinHash-LSH path."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sh = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        sh[row.doc_id] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    postings = defaultdict(set)
    for d, grams in sh.items():
        for g in grams:
            postings[g].add(d)
    cand = {
        (a, b)
        for ds in postings.values()
        for a in ds
        for b in ds
        if a < b
    }
    hits = defaultdict(list)
    for a, b in cand:
        inter = len(sh[a] & sh[b])
        j = inter / (len(sh[a]) + len(sh[b]) - inter)
        if j >= 0.5 and (a % 41 == 0) != (b % 41 == 0):
            train = b if a % 41 == 0 else a
            hits[train].append(
                float(
                    Decimal(repr(j)).quantize(
                        Decimal("0.000001"), rounding=ROUND_HALF_UP
                    )
                )
            )

    got = {r["doc_id"]: r for r in _run(spark, "decontaminate_fuzzy")}
    assert set(got) == set(hits)
    for d, js in hits.items():
        assert got[d]["n_eval_matches"] == len(js), d
        assert abs(got[d]["max_jaccard"] - max(js)) < 1e-9, d


# ------------------------------------------- int8 quantization


def test_emb_normalize_quantize_vs_decimal_half_up(spark):
    """L2-norm + int8 quantization replayed in numpy with explicit
    HALF_UP integer rounding (Decimal) — Spark's round() on doubles is
    decimal-string HALF_UP, numpy's is banker's, so the reference must
    mirror the former."""
    import math
    from decimal import ROUND_HALF_UP, Decimal

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet")
    out = {r["vec_id"]: r for r in _run(spark, "emb_normalize_quantize")}
    assert len(out) == len(emb)
    for row in emb.itertuples(index=False):
        v = [float(x) for x in row.embedding]
        nrm = math.sqrt(sum(x * x for x in v))
        q = [
            int(
                Decimal(repr(x / nrm * 127)).to_integral_value(
                    rounding=ROUND_HALF_UP
                )
            )
            for x in v
        ]
        r = out[row.vec_id]
        assert abs(r["l2_norm"] - round(nrm, 6)) < 1e-9, row.vec_id
        assert r["q8_str"] == " ".join(map(str, q)), row.vec_id


# ----------------------------------------------- sliding chunks


def test_text_chunk_sliding_vs_python_slices(spark):
    """64-token / stride-48 sliding chunking replayed with plain Python
    list slices — chunk count ceil(max(0,(n-64))/48)+1, start ci*48,
    tail shortening, and the joined chunk text all checked verbatim."""
    import math

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    expect = {}
    for row in docs.itertuples(index=False):
        toks = row.text.split(" ")
        n = len(toks)
        last = max(0, math.ceil((n - 64) / 48.0))
        for ci in range(int(last) + 1):
            start = ci * 48
            chunk = toks[start : min(start + 64, n)]
            expect[(row.doc_id, ci)] = (" ".join(chunk), len(chunk))

    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["chunk_len"])
        for r in _run(spark, "text_chunk_sliding")
    }
    assert got == expect


# ---------------------------------------------- context ngrams


def test_text_context_ngrams_vs_counter(spark):
    """context_ngrams('the', ?) replayed with a Counter over adjacent
    token pairs; top-20 by (freq desc, word)."""
    from collections import Counter

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    followers = Counter()
    for text in docs.text:
        w = text.split(" ")
        for i in range(len(w) - 1):
            if w[i] == "the":
                followers[w[i + 1]] += 1
    expect = sorted(followers.items(), key=lambda kv: (-kv[1], kv[0]))[:20]

    got = [(r["word"], r["freq"]) for r in _run(spark, "text_context_ngrams")]
    assert got == expect


# ----------------------------------------- rolling active users


def test_rolling_active_users_vs_python_sets(spark):
    """Trailing-7-day distinct actives replayed with per-day user sets
    unioned over the window — no explode, no join, just set algebra."""
    import datetime

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    by_day = {}
    for row in ev.itertuples(index=False):
        day = row.ts.date()
        by_day.setdefault(day, set()).add(row.user_id)
    expect = {}
    for day in by_day:
        users = set()
        for back in range(7):
            users |= by_day.get(day - datetime.timedelta(days=back), set())
        expect[day] = len(users)

    got = {r["day"]: r["active_7d"] for r in _run(spark, "events_rolling_active_users")}
    assert got == expect


# --------------------------------------- n-gram decontamination


def test_decontaminate_ngram_vs_python_sets(spark):
    """Exact 3-gram decontamination replayed with Python sets: the
    eval slice's distinct grams, each train doc's distinct-gram
    intersection count, and the contaminated flag."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    grams = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        grams[row.doc_id] = {
            " ".join(w[i : i + 3]) for i in range(len(w) - 2)
        }
    eval_grams = set()
    for d, g in grams.items():
        if d % 41 == 0:
            eval_grams |= g

    got = {r["doc_id"]: r for r in _run(spark, "decontaminate_ngram")}
    train_ids = {d for d in grams if d % 41 != 0}
    assert set(got) == train_ids
    for d in train_ids:
        n_hit = len(grams[d] & eval_grams)
        assert got[d]["n_hit_grams"] == n_hit, d
        assert got[d]["contaminated"] == (n_hit > 0), d


# ------------------------------------------------- bpe pre-token


def test_token_bpe_regex_vs_re_findall(spark):
    """GPT-2-style pre-tokenizer count replayed with re.findall on the
    same alternation — token classes [a-z]+ | [0-9]+ | single
    non-alnum-non-space."""
    import re

    pat = re.compile(r"[a-z]+|[0-9]+|[^a-z0-9 ]")
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs = docs[docs.doc_id < 300]
    got = {r["doc_id"]: r for r in _run(spark, "text_token_bpe_regex")}
    assert set(got) == set(docs.doc_id)
    for row in docs.itertuples(index=False):
        r = got[row.doc_id]
        assert r["n_bpe_tokens"] == len(pat.findall(row.text)), row.doc_id
        assert r["n_ws_tokens"] == len(row.text.split(" ")), row.doc_id


# --------------------------------------------- hard negatives


def test_sim_hard_negatives_vs_numpy(spark):
    """Per-query top-5 different-label cosine neighbors recomputed with
    a numpy matmul and an explicit (sim desc, neighbor_id) sort."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    labels = emb.label.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    nrm = np.linalg.norm(X, axis=1)
    N = X / nrm[:, None]
    expect = {}
    for qi in np.where(ids < 20)[0]:
        sims = N[qi] @ N.T
        cand = [
            (float(sims[ci]), int(ids[ci]), labels[ci])
            for ci in range(len(ids))
            if labels[ci] != labels[qi]
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, nid, lab) in enumerate(cand[:5], start=1):
            expect[(int(ids[qi]), rank)] = (nid, lab, round(s, 6))

    got = {
        (r["query_id"], r["rank"]): (
            r["neighbor_id"], r["neighbor_label"], r["sim"],
        )
        for r in _run(spark, "sim_hard_negatives")
    }
    assert set(got) == set(expect)
    for k in expect:
        nid, lab, s = expect[k]
        gnid, glab, gs = got[k]
        assert (gnid, glab) == (nid, lab), k
        assert abs(gs - s) <= 1e-6, k


# ------------------------------------------------ normalization


def test_text_normalize_vs_python_re(spark):
    """The canonicalization regex chain replayed with Python re."""
    import re

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs = docs[docs.doc_id < 250]
    got = {r["doc_id"]: r for r in _run(spark, "text_normalize")}
    assert set(got) == set(docs.doc_id)
    for row in docs.itertuples(index=False):
        norm = re.sub(" +", " ", re.sub("[^a-z0-9 ]", " ", row.text.lower())).strip()
        assert got[row.doc_id]["norm"] == norm, row.doc_id
        assert got[row.doc_id]["norm_len"] == len(norm), row.doc_id


# -------------------------------------------------- pii scrub


def test_text_pii_scrub_vs_python_re(spark):
    """The synthetic-PII construction, match counts, and scrubbed-text
    md5 replayed with Python re + hashlib."""
    import hashlib
    import re

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    email = re.compile(r"[a-z0-9]+@[a-z0-9.]+")
    phone = re.compile(r"\+1-555-[0-9]{4}")
    got = {r["doc_id"]: r for r in _run(spark, "text_pii_scrub")}
    assert set(got) == set(docs.doc_id)
    for row in docs.itertuples(index=False):
        s = (
            f"{row.text} contact user{row.doc_id}@example.com or "
            f"+1-555-{row.doc_id % 10000:04d}"
        )
        scrubbed = phone.sub("<PHONE>", email.sub("<EMAIL>", s))
        r = got[row.doc_id]
        assert r["n_email"] == len(email.findall(s)), row.doc_id
        assert r["n_phone"] == len(phone.findall(s)), row.doc_id
        assert r["scrub_md5"] == hashlib.md5(scrubbed.encode()).hexdigest(), row.doc_id


# ------------------------------------------------- dq summary


def test_dq_checks_vs_pandas(spark, orders_pd):
    """The one-row constraint report recomputed with pandas: row count,
    NOT NULL violations, PK duplication, FK orphans vs customer."""
    cust = pd.read_parquet(f"{SF_SMOKE}/customer.parquet")
    dup_sizes = orders_pd.groupby("o_orderkey").size()
    dups = dup_sizes[dup_sizes > 1]
    custkeys = set(cust.c_custkey)
    nonnull = orders_pd[orders_pd.o_custkey.notna()]
    orphans = int((~nonnull.o_custkey.isin(custkeys)).sum())

    r = _run(spark, "dq_checks")[0]
    assert r["n_rows"] == len(orders_pd)
    assert r["null_o_custkey"] == int(orders_pd.o_custkey.isna().sum())
    assert r["null_o_orderdate"] == int(orders_pd.o_orderdate.isna().sum())
    assert r["dup_keys"] == len(dups)
    assert r["dup_excess_rows"] == int((dups - 1).sum())
    assert r["orphans_o_custkey"] == orphans


# ----------------------------------------------- train/eval split


def test_split_train_eval_vs_pandas(spark):
    """The deterministic 80/10/10 modulo split recomputed with pandas
    groupby over (lang, split)."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    split = np.where(
        docs.doc_id % 10 < 8, "train", np.where(docs.doc_id % 10 == 8, "eval", "test")
    )
    expect = (
        docs.assign(split=split)
        .groupby(["lang", "split"])
        .agg(n=("doc_id", "size"), chars=("n_chars", "sum"))
    )
    got = {
        (r["lang"], r["split"]): (r["n"], r["chars"])
        for r in _run(spark, "split_train_eval")
    }
    assert set(got) == set(expect.index)
    for key, row in expect.iterrows():
        assert got[key] == (row.n, row.chars), key


# ---------------------------------------------- cosine top-k


def test_sim_cosine_topk_vs_numpy(spark):
    """Brute-force cosine top-5 (the ANN family's exact baseline)
    recomputed with a numpy matmul and (sim desc, neighbor_id) sort."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    N = X / np.linalg.norm(X, axis=1)[:, None]
    S = N @ N.T
    expect = {}
    for qi in np.where(ids < 20)[0]:
        cand = [
            (float(S[qi, ci]), int(ids[ci]))
            for ci in range(len(ids))
            if ci != qi
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, nid) in enumerate(cand[:5], start=1):
            expect[(int(ids[qi]), rank)] = (nid, round(s, 6))

    # same contract for the JVM-HOF entry and its Arrow pandas-UDF twin
    for entry in ("sim_cosine_topk", "sim_cosine_topk_arrow"):
        got = {
            (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
            for r in _run(spark, entry)
        }
        assert set(got) == set(expect), entry
        for k, (nid, s) in expect.items():
            assert got[k][0] == nid, (entry, k)
            assert abs(got[k][1] - s) <= 1e-6, (entry, k)


# ------------------------------------------------ bigram langid


def test_text_langid_ngram_vs_python_sets(spark):
    """The character-bigram language scorer replayed with Python set
    intersections and max over (score, lang) — distinct bigrams,
    profile overlap counts, lexicographic-largest tie-break."""
    profiles = {
        "en": {"th", "he", "er", "va", "ue"},
        "de": {"de", "un", "ch", "ei", "ie"},
        "fr": {"le", "es", "en", "qu", "re"},
        "es": {"el", "os", "la", "de", "ue"},
    }
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    got = {r["doc_id"]: r["predicted"] for r in _run(spark, "text_langid_ngram")}
    assert set(got) == set(docs.doc_id)
    for row in docs.itertuples(index=False):
        bg = {row.text[i : i + 2] for i in range(len(row.text) - 1)}
        scores = {lang: len(bg & prof) for lang, prof in profiles.items()}
        if max(scores.values()) == 0:
            pred = "unknown"
        else:
            pred = max(scores, key=lambda lang: (scores[lang], lang))
        assert got[row.doc_id] == pred, row.doc_id


# ------------------------------------------------ asset packing


def test_multimodal_meta_vs_hashlib(spark):
    """Binary-asset metadata (size, sha256, modality cycle) replayed
    with hashlib over the utf-8 payload bytes."""
    import hashlib

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    got = {r["asset_id"]: r for r in _run(spark, "multimodal_meta")}
    assert set(got) == set(docs.doc_id)
    modality = ["image", "audio", "video"]
    for row in docs.itertuples(index=False):
        payload = row.text.encode("utf-8")
        r = got[row.doc_id]
        assert r["n_bytes"] == len(payload), row.doc_id
        assert r["checksum"] == hashlib.sha256(payload).hexdigest(), row.doc_id
        assert r["modality"] == modality[row.doc_id % 3], row.doc_id


# ---------------------------------------- near-dedup pipeline


def test_pipeline_neardedup_vs_union_find(spark):
    """The fuzzy-dedup pipeline's survivor set replayed with exact
    shingle-Jaccard pairs and a plain union-find: survivors are the
    min-doc_id of each connected component (plus all isolated docs),
    reported with whitespace token counts."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sh = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        sh[row.doc_id] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    parent = {d: d for d in sh}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    from collections import defaultdict

    postings = defaultdict(set)
    for d, grams in sh.items():
        for g in grams:
            postings[g].add(d)
    for ds in postings.values():
        # union every candidate pair that clears the threshold
        for a in ds:
            for b in ds:
                if a < b:
                    inter = len(sh[a] & sh[b])
                    j = inter / (len(sh[a]) + len(sh[b]) - inter)
                    if j >= 0.5:
                        ra, rb = find(a), find(b)
                        if ra != rb:
                            parent[max(ra, rb)] = min(ra, rb)

    survivors = {d for d in sh if find(d) == d}
    got = {r["doc_id"]: r for r in _run(spark, "pipeline_neardedup_corpus")}
    assert set(got) == survivors
    lookup = docs.set_index("doc_id")
    for d in survivors:
        assert got[d]["n_tokens"] == len(lookup.loc[d, "text"].split(" ")), d
        assert got[d]["lang"] == lookup.loc[d, "lang"], d


# ------------------------------------------------- exact dedup


def test_dedup_exact_vs_python_dict(spark):
    """5-token-prefix exact dedup replayed with a dict: min-id survivor
    and copy count per content key."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    groups = {}
    for row in docs.itertuples(index=False):
        key = " ".join(row.text.split(" ")[:5])
        g = groups.setdefault(key, [0, None])
        g[0] += 1
        g[1] = row.doc_id if g[1] is None else min(g[1], row.doc_id)

    got = {r["content_key"]: r for r in _run(spark, "dedup_exact")}
    assert set(got) == set(groups)
    for key, (n, survivor) in groups.items():
        assert got[key]["survivor_id"] == survivor, key
        assert got[key]["n_copies"] == n, key


# ----------------------------------------- exact jaccard pairs


def test_jaccard_pairs_both_paths_vs_python_sets(spark):
    """The exact 3-shingle Jaccard >= 0.5 pair set recomputed with
    Python sets + an inverted index, then compared against BOTH the
    plain inverted-index entry and the prefix-filtered entry — the
    lossless-prefix claim (Bayardo bound) checked against a third
    implementation, not just oracle equality."""
    from collections import defaultdict
    from decimal import ROUND_HALF_UP, Decimal

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sh = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        sh[row.doc_id] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}
    postings = defaultdict(set)
    for d, grams in sh.items():
        for g in grams:
            postings[g].add(d)
    expect = {}
    for ds in postings.values():
        for a in ds:
            for b in ds:
                if a < b and (a, b) not in expect:
                    inter = len(sh[a] & sh[b])
                    j = inter / (len(sh[a]) + len(sh[b]) - inter)
                    if j >= 0.5:
                        expect[(a, b)] = float(
                            Decimal(repr(j)).quantize(
                                Decimal("0.000001"), rounding=ROUND_HALF_UP
                            )
                        )

    for entry in ("dedup_jaccard_pairs", "dedup_jaccard_prefix"):
        got = {
            (r["doc_a"], r["doc_b"]): r["jaccard"] for r in _run(spark, entry)
        }
        assert set(got) == set(expect), entry
        for k, j in expect.items():
            assert abs(got[k] - j) <= 1e-9, (entry, k)


# ----------------------------------------------- rule langid


def test_text_langid_rules_vs_python(spark):
    """The marker-token rule chain replayed with Python set checks in
    the same first-match order (en, de, fr, es, unknown)."""
    rules = [
        ("en", {"the", "value", "fast"}),
        ("de", {"der", "und", "nicht"}),
        ("fr", {"le", "et", "les"}),
        ("es", {"el", "que", "los"}),
    ]
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    got = {r["doc_id"]: r["predicted"] for r in _run(spark, "text_langid")}
    assert set(got) == set(docs.doc_id)
    for row in docs.itertuples(index=False):
        toks = set(row.text.split(" "))
        pred = next((lang for lang, m in rules if toks & m), "unknown")
        assert got[row.doc_id] == pred, row.doc_id


# ------------------------------------------------ PTF z-score


def test_ptf_zscore_vs_numpy_deviations(spark, lineitem_pd):
    """The applyInPandas per-group z-score replayed with numpy
    deviations-from-mean (sample std, ddof=1). (l_orderkey,
    l_linenumber) is NOT unique in the fixture, so the comparison is a
    sorted multiset of (key, z) triples."""
    expect = []
    for (_, _), grp in lineitem_pd.groupby(["l_returnflag", "l_linestatus"]):
        v = grp.l_quantity.to_numpy(dtype=float)
        z = (v - v.mean()) / v.std(ddof=1)
        expect.extend(
            (int(ok), int(ln), round(float(zz), 4))
            for ok, ln, zz in zip(grp.l_orderkey, grp.l_linenumber, z)
        )

    got = sorted(
        (r["l_orderkey"], r["l_linenumber"], r["z"])
        for r in _run(spark, "ptf_apply_in_pandas_zscore")
    )
    assert got == sorted(expect)


# ------------------------------------------------- IVF replay


def test_sim_ann_ivf_vs_numpy_replay(spark):
    """The full inverted-file pipeline replayed in numpy: stride-sampled
    centroids, argmax cell assignment (larger cell wins dot ties),
    descending 6-cell probe order, exact-cosine top-5 re-rank with
    (sim desc, neighbor_id) — every stage of the engine's oracle-gated
    IVF contract recomputed outside both engines."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    n_cells, n_probe, k = 16, 6, 5
    stride = max(1, len(ids) // n_cells)
    cent_rows = [i for i, v in enumerate(ids) if v % stride == 0][:n_cells]
    C = X[cent_rows]

    dots = X @ C.T  # n x n_cells
    # argmax with larger-cell tie-break == max over (sim, cell) structs
    cells = np.array(
        [max(range(n_cells), key=lambda c: (dots[i, c], c)) for i in range(len(ids))]
    )
    N = X / np.linalg.norm(X, axis=1)[:, None]
    expect = {}
    for qi in np.where(ids < 20)[0]:
        probe = sorted(range(n_cells), key=lambda c: (dots[qi, c], c), reverse=True)[:n_probe]
        cand = [
            (float(N[qi] @ N[ci]), int(ids[ci]))
            for ci in range(len(ids))
            if cells[ci] in probe and ci != qi
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, nid) in enumerate(cand[:k], start=1):
            expect[(int(ids[qi]), rank)] = (nid, round(s, 6))

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in _run(spark, "sim_ann_ivf")
    }
    assert set(got) == set(expect)
    for key, (nid, s) in expect.items():
        assert got[key][0] == nid, key
        assert abs(got[key][1] - s) <= 1e-6, key


# ------------------------------------------------ span dedup


def test_dedup_span_chunks_vs_python_dict(spark):
    """Chunk-level exact-span dedup replayed with a first-occurrence
    dict over (doc_id, idx)-ordered 10-token chunks, documents
    reassembled from survivors."""
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet").sort_values("doc_id")
    seen = set()
    expect = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        nc = -(-len(w) // 10)
        kept = []
        dropped = 0
        for idx in range(nc):
            chunk = " ".join(w[idx * 10 : min((idx + 1) * 10, len(w))])
            if chunk in seen:
                dropped += 1
            else:
                seen.add(chunk)
                kept.append(chunk)
        expect[row.doc_id] = (nc, dropped, " ".join(kept))

    got = {r["doc_id"]: r for r in _run(spark, "dedup_span_chunks")}
    assert set(got) == set(expect)
    for d, (nc, dropped, text_dedup) in expect.items():
        r = got[d]
        assert (r["n_chunks"], r["n_dropped"], r["text_dedup"]) == (
            nc, dropped, text_dedup,
        ), d


# ------------------------------------------- source overlap


def test_source_overlap_vs_python_sets(spark):
    """The cross-source shared-3-gram matrix replayed with per-source
    distinct-gram sets and pairwise intersections."""
    from itertools import combinations

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    grams = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        if len(w) >= 3:
            grams.setdefault(row.source, set()).update(
                " ".join(w[i : i + 3]) for i in range(len(w) - 2)
            )
    expect = {
        (a, b): len(grams[a] & grams[b])
        for a, b in combinations(sorted(grams), 2)
        if grams[a] & grams[b]
    }

    got = {
        (r["source_a"], r["source_b"]): r["n_shared_grams"]
        for r in _run(spark, "source_overlap_matrix")
    }
    assert got == expect and len(got) > 0


# ------------------------------------------------- funnel


def test_funnel_conversion_vs_python_walk(spark):
    """The ordered view→click→purchase funnel replayed with a per-user
    sorted walk over (ts, event_type) tuples and strict-after firsts."""
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev = ev[ev.event_type.isin(["view", "click", "purchase"])]
    users_total = ev.user_id.nunique()
    n_view = n_click = n_purchase = 0
    for _, grp in ev.groupby("user_id"):
        seq = sorted(zip(grp.ts, grp.event_type))
        t1 = next((t for t, e in seq if e == "view"), None)
        if t1 is None:
            continue
        n_view += 1
        t2 = next((t for t, e in seq if e == "click" and t > t1), None)
        if t2 is None:
            continue
        n_click += 1
        if any(e == "purchase" and t > t2 for t, e in seq):
            n_purchase += 1

    r = _run(spark, "funnel_conversion")[0]
    assert r["users_total"] == users_total
    assert r["n_view"] == n_view
    assert r["n_click_after_view"] == n_click
    assert r["n_purchase_after_click"] == n_purchase


# ----------------------------------------------- retention


def test_retention_cohorts_vs_python_weeks(spark):
    """The weekly retention triangle replayed with Monday-truncated
    per-user week sets."""
    import datetime
    from collections import Counter

    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    user_weeks = {}
    for row in ev.itertuples(index=False):
        d = row.ts.date()
        monday = d - datetime.timedelta(days=d.weekday())
        user_weeks.setdefault(row.user_id, set()).add(monday)
    tri = Counter()
    for weeks in user_weeks.values():
        cohort = min(weeks)
        for wk in weeks:
            tri[(cohort, (wk - cohort).days // 7)] += 1

    got = {
        (r["cohort"], r["week_n"]): r["active_users"]
        for r in _run(spark, "retention_cohorts")
    }
    assert got == dict(tri)


# -------------------------------------------- SQ8 quantized ANN


def test_sim_ann_sq8_vs_numpy_replay(spark):
    """The scalar-quantization ladder rung replayed in numpy: per-dim
    min-max int8 codes (floor(x' + 0.5) on the normalized value),
    integer-dot top-50 shortlist with (approx desc, neighbor_id)
    ties, exact-cosine top-5 rerank."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    mn = X.min(axis=0)
    span = (X.max(axis=0) - mn) / 255.0
    span_safe = np.where(span > 0, span, 1.0)
    codes = np.where(
        span > 0, np.floor((X - mn) / span_safe + 0.5), 0.0
    ).astype("int64")
    N = X / np.linalg.norm(X, axis=1)[:, None]

    expect = {}
    for qi in np.where(ids < 20)[0]:
        approx = codes @ codes[qi]
        cand = [
            (int(approx[ci]), int(ids[ci]), ci)
            for ci in range(len(ids))
            if ci != qi
        ]
        cand.sort(key=lambda t: (-t[0], t[1]))
        short = cand[:50]
        rer = [
            (float(N[qi] @ N[ci]), nid, ap) for ap, nid, ci in short
        ]
        rer.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, nid, ap) in enumerate(rer[:5], start=1):
            expect[(int(ids[qi]), rank)] = (nid, ap, round(s, 6))

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["approx"], r["sim"])
        for r in _run(spark, "sim_ann_sq8")
    }
    assert set(got) == set(expect)
    for key, (nid, ap, s) in expect.items():
        gnid, gap, gs = got[key]
        assert (gnid, gap) == (nid, ap), key
        assert abs(gs - s) <= 1e-6, key


# ------------------------------------------------ binary ANN


def test_sim_ann_binary_vs_numpy_replay(spark):
    """The 1-bit quantization rung replayed in numpy: sign codes,
    definitional Hamming (count of sign disagreements), top-50
    shortlist with (hamming asc, neighbor_id) ties, exact-cosine
    top-5 rerank."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    bits = X > 0
    N = X / np.linalg.norm(X, axis=1)[:, None]

    expect = {}
    for qi in np.where(ids < 20)[0]:
        ham = (bits != bits[qi]).sum(axis=1)
        cand = [
            (int(ham[ci]), int(ids[ci]), ci)
            for ci in range(len(ids))
            if ci != qi
        ]
        cand.sort(key=lambda t: (t[0], t[1]))
        rer = [(float(N[qi] @ N[ci]), nid, h) for h, nid, ci in cand[:50]]
        rer.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s, nid, h) in enumerate(rer[:5], start=1):
            expect[(int(ids[qi]), rank)] = (nid, h, round(s, 6))

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["hamming"], r["sim"])
        for r in _run(spark, "sim_ann_binary")
    }
    assert set(got) == set(expect)
    for key, (nid, h, s) in expect.items():
        gnid, gh, gs = got[key]
        assert (gnid, gh) == (nid, h), key
        assert abs(gs - s) <= 1e-6, key


# ------------------------------- contract-changed r7 window four


def test_dedup_embedding_cosine_vs_numpy(spark):
    """The BLAS-rewritten all-pairs entry recomputed with one numpy
    matmul: every (id_a < id_b) pair with cosine >= 0.4."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    N = X / np.linalg.norm(X, axis=1)[:, None]
    S = N @ N.T
    iu, ju = np.triu_indices(len(ids), k=1)
    keep = S[iu, ju] >= 0.4
    expect = {
        (int(ids[a]), int(ids[b])): round(float(S[a, b]), 6)
        for a, b in zip(iu[keep], ju[keep])
    }

    got = {
        (r["id_a"], r["id_b"]): r["sim"]
        for r in _run(spark, "dedup_embedding_cosine")
    }
    assert set(got) == set(expect)
    for k, s in expect.items():
        assert abs(got[k] - s) <= 1e-6, k


def test_dedup_semantic_cells_vs_numpy(spark):
    """The per-cell BLAS entry recomputed in numpy: stride centroids,
    (dot, cell)-max assignment, within-cell pairs >= 0.4."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    n_cells = 8
    stride = max(1, len(ids) // n_cells)
    cent_rows = [i for i, v in enumerate(ids) if v % stride == 0][:n_cells]
    dots = X @ X[cent_rows].T
    cells = np.array(
        [max(range(n_cells), key=lambda c: (dots[i, c], c)) for i in range(len(ids))]
    )
    N = X / np.linalg.norm(X, axis=1)[:, None]
    S = N @ N.T
    expect = {}
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            if cells[a] == cells[b] and S[a, b] >= 0.4:
                expect[(int(ids[a]), int(ids[b]))] = (
                    int(cells[a]), round(float(S[a, b]), 6),
                )

    got = {
        (r["id_a"], r["id_b"]): (r["cell"], r["sim"])
        for r in _run(spark, "dedup_semantic_cells")
    }
    assert set(got) == set(expect)
    for k, (cell, s) in expect.items():
        assert got[k][0] == cell, k
        assert abs(got[k][1] - s) <= 1e-6, k


def test_sim_ann_lsh_vs_python_replay(spark):
    """The oracle-converted LSH pipeline recomputed in Python: 8-table
    4-bit sign signatures over the shared splitmix hyperplane
    constants (data-independent — importing the constant generator is
    the erf-polynomial discipline), any-table bucket match, candidate
    dedup, exact-cosine top-5 rerank."""
    from hive_release_spark.llm.similarity import _hyperplanes

    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    d = X.shape[1]
    buckets = {}
    for table in range(8):
        P = np.array(_hyperplanes(d, 4, table))
        proj = X @ P.T
        sig = (table << 32) + (
            (proj > 0).astype("int64") * (2 ** np.arange(4))
        ).sum(axis=1)
        for i, s in enumerate(sig):
            buckets.setdefault(int(s), set()).add(i)

    N = X / np.linalg.norm(X, axis=1)[:, None]
    expect = {}
    for qi in np.where(ids < 20)[0]:
        cand = set()
        for members in buckets.values():
            if qi in members:
                cand |= members
        cand.discard(qi)
        rer = sorted(
            ((float(N[qi] @ N[ci]), int(ids[ci])) for ci in cand),
            key=lambda t: (-t[0], t[1]),
        )
        for rank, (s, nid) in enumerate(rer[:5], start=1):
            expect[(int(ids[qi]), rank)] = (nid, round(s, 6))

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in _run(spark, "sim_ann_lsh")
    }
    assert set(got) == set(expect)
    for k, (nid, s) in expect.items():
        assert got[k][0] == nid, k
        assert abs(got[k][1] - s) <= 1e-6, k


def test_dedup_simhash_banded_vs_hashlib(spark):
    """The 32-bit banded SimHash pairs recomputed with hashlib: md5-u32
    token hashes, per-bit +-1 vote over ALL token occurrences, sign
    signature, brute-force hamming <= 3 pairs."""
    import hashlib

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sigs = {}
    for row in docs.itertuples(index=False):
        votes = [0] * 32
        for t in row.text.split(" "):
            h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
            for i in range(32):
                votes[i] += 1 if (h >> i) & 1 else -1
        sigs[row.doc_id] = sum(1 << i for i in range(32) if votes[i] > 0)

    keys = sorted(sigs)
    expect = {}
    for i, a in enumerate(keys):
        for b in keys[i + 1 :]:
            ham = bin(sigs[a] ^ sigs[b]).count("1")
            if ham <= 3:
                expect[(a, b)] = ham

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in _run(spark, "dedup_simhash_banded")
    }
    assert got == expect


# ------------------------------------------- percentile_disc


def test_percentile_disc_vs_numpy(spark, lineitem_pd):
    """PERCENTILE_DISC recomputed per the standard definition
    (smallest value at cumulative rank ceil(p*n)) plus the
    interpolating median via np.percentile."""
    import math

    got = {r["l_returnflag"]: r for r in _run(spark, "agg_percentile_disc")}
    for flag, grp in lineitem_pd.groupby("l_returnflag"):
        vals = np.sort(grp.l_quantity.to_numpy())
        n = len(vals)
        r = got[flag]
        assert r["n"] == n
        for p, col in ((0.25, "q25_disc"), (0.5, "q50_disc"), (0.75, "q75_disc")):
            assert r[col] == vals[max(math.ceil(p * n), 1) - 1], (flag, p)
        assert abs(r["q50_cont"] - round(float(np.percentile(vals, 50)), 4)) < 1e-9


# --------------------------------------------- script profile


def test_text_script_profile_vs_python_re(spark):
    """The Unicode-script composition recomputed with Python re over
    the same codepoint-range classes."""
    import math
    import re

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    classes = {
        "n_latin": re.compile("[A-Za-z]"),
        "n_latin_ext": re.compile("[À-ÿ]"),
        "n_cjk": re.compile("[一-鿿]"),
        "n_digit": re.compile("[0-9]"),
    }
    agg = {}
    for row in docs.itertuples(index=False):
        a = agg.setdefault(row.source, {"n_chars": 0, **{k: 0 for k in classes}})
        a["n_chars"] += len(row.text)
        for k, rx in classes.items():
            a[k] += len(rx.findall(row.text))

    got = {r["source"]: r for r in _run(spark, "text_script_profile")}
    assert set(got) == set(agg)
    for src, a in agg.items():
        r = got[src]
        for k in ("n_chars", "n_latin", "n_latin_ext", "n_cjk", "n_digit"):
            assert r[k] == a[k], (src, k)
        assert r["latin_ratio_micro"] == math.floor(
            a["n_latin"] / a["n_chars"] * 1e6 + 0.5
        ), src
        assert r["cjk_ratio_micro"] == math.floor(
            a["n_cjk"] / a["n_chars"] * 1e6 + 0.5
        ), src


# ------------------------------------------ incremental dedup


def test_pipeline_incremental_dedup_vs_hashlib(spark):
    """The incremental-ingest dedup report recomputed with hashlib:
    base corpus survivors by md5(text), batch-internal dedup, then
    accepted-new vs rejected-known against the base hash set."""
    import hashlib

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    base = docs[docs.doc_id % 10 != 0]
    batch = docs[docs.doc_id % 10 == 0]
    base_hashes = {hashlib.md5(t.encode()).hexdigest() for t in base.text}
    batch_hashes = {}
    for row in batch.itertuples(index=False):
        h = hashlib.md5(row.text.encode()).hexdigest()
        batch_hashes.setdefault(h, []).append(row.doc_id)
    accepted = sum(1 for h in batch_hashes if h not in base_hashes)

    r = _run(spark, "pipeline_incremental_dedup")[0]
    assert r["batch_rows"] == len(batch)
    assert r["batch_distinct"] == len(batch_hashes)
    assert r["accepted_new"] == accepted
    assert r["rejected_known"] == len(batch_hashes) - accepted
    assert r["corpus_before"] == len(base_hashes)
    assert r["corpus_after"] == len(base_hashes) + accepted


# --------------------------------------------------- PQ replay


def test_sim_ann_pq_vs_numpy_replay(spark):
    """Product quantization replayed in numpy: 8 subspaces of width 8,
    16 stride-sampled codebook entries, per-subspace (dot, cell)-max
    codes, ADC scoring (sum over subspaces of the query-slice x
    codebook-slice dot the code points at), top-5 per query."""
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet").sort_values("vec_id")
    ids = emb.vec_id.to_numpy()
    X = np.stack(emb.embedding.to_numpy()).astype("float64")
    n_sub, n_cells, k = 8, 16, 5
    d = X.shape[1]
    w = d // n_sub
    stride = max(1, len(ids) // n_cells)
    cent_rows = [i for i, v in enumerate(ids) if v % stride == 0][:n_cells]
    C = X[cent_rows]

    codes = np.zeros((len(ids), n_sub), dtype=int)
    for s in range(n_sub):
        dots = X[:, s * w : (s + 1) * w] @ C[:, s * w : (s + 1) * w].T
        for i in range(len(ids)):
            codes[i, s] = max(range(n_cells), key=lambda c: (dots[i, c], c))

    expect = {}
    for qi in np.where(ids < 20)[0]:
        luts = [
            X[qi, s * w : (s + 1) * w] @ C[:, s * w : (s + 1) * w].T
            for s in range(n_sub)
        ]
        cand = []
        for ci in range(len(ids)):
            if ci == qi:
                continue
            adc = 0.0
            for s in range(n_sub):  # fixed ascending-s summation
                adc += float(luts[s][codes[ci, s]])
            cand.append((adc, int(ids[ci])))
        cand.sort(key=lambda t: (-t[0], t[1]))
        for rank, (s_, nid) in enumerate(cand[:k], start=1):
            expect[(int(ids[qi]), rank)] = (nid, round(s_, 6))

    got = {
        (r["query_id"], r["rank"]): (r["neighbor_id"], r["sim"])
        for r in _run(spark, "sim_ann_pq")
    }
    assert set(got) == set(expect)
    for key, (nid, s_) in expect.items():
        assert got[key][0] == nid, key
        assert abs(got[key][1] - s_) <= 1e-6, key


# ------------------------------------------ multimodal features


def test_multimodal_features_vs_hashlib(spark):
    """The deterministic fake-decoder arithmetic replayed directly from
    the sha256 digest bytes: width/height/n_frames/feat_norm."""
    import hashlib

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    got = {r["asset_id"]: r for r in _run(spark, "multimodal_features")}
    assert set(got) == set(docs.doc_id)
    modality = ["image", "audio", "video"]
    for row in docs.itertuples(index=False):
        d = hashlib.sha256(row.text.encode("utf-8")).digest()
        r = got[row.doc_id]
        assert r["modality"] == modality[row.doc_id % 3], row.doc_id
        assert r["width"] == 64 + d[0] % 192, row.doc_id
        assert r["height"] == 64 + d[1] % 192, row.doc_id
        assert r["n_frames"] == 1 + d[2] % 32, row.doc_id
        assert abs(
            r["feat_norm"] - round(int.from_bytes(d[3:7], "big") / 2**32, 6)
        ) < 1e-12, row.doc_id


# --------------------------------------------- frame sampling


def test_multimodal_frame_sample_vs_hashlib(spark):
    """The 1->N frame-sampling shape replayed with hashlib: video
    assets only (doc_id % 3 == 2), every-4th frame index up to the
    decoded n_frames, per-frame digest of (payload, idx)."""
    import hashlib

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    expect = {}
    for row in docs.itertuples(index=False):
        if row.doc_id % 3 != 2:
            continue
        payload = row.text.encode("utf-8")
        n_frames = 1 + hashlib.sha256(payload).digest()[2] % 32
        for i in range(0, n_frames, 4):
            expect[(row.doc_id, i)] = hashlib.sha256(
                payload + f":{i}".encode()
            ).hexdigest()

    got = {
        (r["asset_id"], r["frame_idx"]): r["frame_checksum"]
        for r in _run(spark, "multimodal_frame_sample")
    }
    assert got == expect and len(got) > 0


# --------------------------------------------- MatchPath PTF


def test_matchpath_vs_python_regex_trace(spark, events_pd):
    """The MatchPath PTF replayed without the engine: per user, sort
    events by (ts, event_id) in plain pandas, build the E/P/O symbol
    string in a Python loop, and let ``re.finditer`` walk 'EP'
    non-overlapping — the registry entry's regex engine and its
    lead/lag oracle must both agree with this third trace. Exercises
    the ordering contract (mergesort tie-break on event_id) and the
    0-based match_pos annotation of ``operators/matchpath.py``."""
    import re

    expect = set()
    for user_id, g in events_pd.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"], kind="mergesort")
        syms = "".join(
            "E" if t == "error" else "P" if t == "purchase" else "O"
            for t in g["event_type"]
        )
        ids = g["event_id"].to_numpy()
        for m in re.finditer("EP", syms):
            for i in range(m.start(), m.end()):
                expect.add((int(user_id), int(ids[i]), i - m.start()))

    got = {
        (r["user_id"], r["event_id"], r["match_pos"])
        for r in _run(spark, "ptf_matchpath")
    }
    assert got == expect and len(got) > 0


# ------------------------------------ connected components entry


def test_connected_components_entry_vs_union_find(spark):
    """``dedup_connected_components`` replayed without either engine:
    exact 3-token-shingle Jaccard >= 0.5 pairs recomputed with Python
    sets, components labeled by a textbook union-find (smaller root
    wins, so the component label IS the min doc_id), restricted — like
    the entry — to docs that appear in at least one pair. Both the
    engine's min-label propagation and the DuckDB recursive-CTE
    closure must agree with this third formulation."""
    from collections import defaultdict

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    sh = {}
    for row in docs.itertuples(index=False):
        w = row.text.split(" ")
        sh[row.doc_id] = {" ".join(w[i : i + 3]) for i in range(len(w) - 2)}

    postings = defaultdict(set)
    for d, grams in sh.items():
        for g in grams:
            postings[g].add(d)
    edges = set()
    for ds in postings.values():
        for a in ds:
            for b in ds:
                if a < b:
                    inter = len(sh[a] & sh[b])
                    if inter / (len(sh[a]) + len(sh[b]) - inter) >= 0.5:
                        edges.add((a, b))

    nodes = {d for e in edges for d in e}
    parent = {d: d for d in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    expect = {(d, find(d), find(d) == d) for d in nodes}
    got = {
        (r["doc_id"], r["component"], r["is_survivor"])
        for r in _run(spark, "dedup_connected_components")
    }
    assert got == expect and len(got) > 0


# ------------------------------------- ingest pipeline slices


def test_pipeline_dedup_quality_vs_hashlib(spark, documents_pd):
    """The dedup→quality pipeline slice replayed with hashlib + dict:
    md5-exact dedup with min-id survivor, then the token/char quality
    gate, then the training projection."""
    import hashlib

    best = {}
    for row in documents_pd.itertuples(index=False):
        h = hashlib.md5(row.text.encode("utf-8")).hexdigest()
        if h not in best or row.doc_id < best[h].doc_id:
            best[h] = row
    expect = {
        int(r.doc_id): (r.lang, r.source, len(r.text.split(" ")))
        for r in best.values()
        if len(r.text.split(" ")) >= 5 and r.n_chars >= 20
    }
    got = {
        r["doc_id"]: (r["lang"], r["source"], r["n_tokens"])
        for r in _run(spark, "pipeline_dedup_quality")
    }
    assert got == expect and len(got) > 0


def test_pipeline_corpus_build_vs_python(spark, documents_pd):
    """The flagship normalize→quality→dedup→yield chain replayed with
    re + hashlib + plain dicts, including the left-join zero-fill for
    (lang, source) cells whose every doc fails the gate."""
    import hashlib
    import re as _re

    feats = []
    for row in documents_pd.itertuples(index=False):
        norm = _re.sub(" +", " ", _re.sub(r"[^a-z0-9 ]", " ", row.text.lower())).strip()
        feats.append(
            (int(row.doc_id), row.lang, row.source, norm,
             len(norm.split(" ")), len(norm))
        )
    surv = {}
    for doc_id, lang, source, norm, n_tok, n_len in feats:
        if n_tok >= 10 and n_len >= 50:
            h = hashlib.md5(norm.encode("utf-8")).hexdigest()
            if h not in surv or doc_id < surv[h][0]:
                surv[h] = (doc_id, lang, source, n_tok)
    expect = {}
    for doc_id, lang, source, norm, n_tok, n_len in feats:
        cell = expect.setdefault((lang, source), [0, 0, 0, 0])
        cell[0] += 1
        cell[1] += int(n_tok >= 10 and n_len >= 50)
    for doc_id, lang, source, n_tok in surv.values():
        cell = expect[(lang, source)]
        cell[2] += 1
        cell[3] += n_tok

    got = {
        (r["lang"], r["source"]): [
            r["docs_in"], r["docs_q"], r["docs_kept"], r["tokens_kept"]
        ]
        for r in _run(spark, "pipeline_corpus_build")
    }
    assert got == {k: list(v) for k, v in expect.items()} and len(got) > 0


# ------------------------------------------- salted skew join


def test_join_salted_skew_vs_pandas_merge(spark, lineitem_pd):
    """The salted-join entry replayed as a plain pandas merge + groupby
    — the salting is pure mechanics (explode the build side over salt
    replicas, salt the probe side, join on (key, salt)), so its output
    must equal the unsalted join exactly: no lost rows, no duplicates,
    per-supplier counts and quantity sums identical."""
    sup = pd.read_parquet(f"{SF_SMOKE}/supplier.parquet")
    j = lineitem_pd.merge(
        sup[["s_suppkey", "s_name"]],
        left_on="l_suppkey",
        right_on="s_suppkey",
    )
    g = j.groupby("s_name")["l_quantity"]
    expect = {
        name: (int(s.count()), round(float(s.sum()), 2))
        for name, s in g
    }
    got = {
        r["s_name"]: (r["n"], r["qty"])
        for r in _run(spark, "join_salted_skew")
    }
    assert got == expect and len(got) > 0


# ------------------------------------------------ as-of joins


def test_asof_backward_vs_pandas_merge_asof(spark, orders_pd, events_pd):
    """The bespoke as-of operator (operators/asof.py union +
    carry-forward formulation) checked against pandas.merge_asof — a
    third, battle-tested implementation of as-of semantics alongside
    DuckDB's native ASOF JOIN: most recent order at-or-before each
    event, right side pre-deduped to max orderkey per (custkey, date),
    unmatched events kept with nulls."""
    e = events_pd[["event_id", "user_id", "ts"]].sort_values("ts", kind="mergesort")
    o = (
        orders_pd.sort_values(
            ["o_custkey", "o_orderdate", "o_orderkey"], kind="mergesort"
        )
        .groupby(["o_custkey", "o_orderdate"], as_index=False)
        .tail(1)
        .rename(columns={"o_custkey": "user_id"})
        [["user_id", "o_orderdate", "o_orderkey", "o_totalprice"]]
        .sort_values("o_orderdate", kind="mergesort")
    )
    j = pd.merge_asof(
        e, o, left_on="ts", right_on="o_orderdate", by="user_id",
        direction="backward", allow_exact_matches=True,
    )
    expect = {
        int(r.event_id): (
            None if pd.isna(r.o_orderkey) else int(r.o_orderkey),
            None if pd.isna(r.o_totalprice) else round(float(r.o_totalprice), 2),
        )
        for r in j.itertuples(index=False)
    }
    got = {
        r["event_id"]: (
            r["o_orderkey"],
            None if r["o_totalprice"] is None else round(r["o_totalprice"], 2),
        )
        for r in _run(spark, "join_asof_orders")
    }
    assert got == expect and len(got) > 0


def test_asof_forward_vs_pandas_merge_asof(spark, events_pd):
    """The forward as-of mirror (first purchase at-or-after each view,
    cohort user_id % 11 == 0, purchases pre-deduped to min event_id
    per (user, ts)) against pandas.merge_asof direction='forward',
    including the floor-to-seconds conversion-lag arithmetic."""
    v = (
        events_pd[(events_pd.event_type == "view") & (events_pd.user_id % 11 == 0)]
        [["event_id", "user_id", "ts"]]
        .sort_values("ts", kind="mergesort")
    )
    p = (
        events_pd[events_pd.event_type == "purchase"]
        .sort_values("event_id", kind="mergesort")
        .groupby(["user_id", "ts"], as_index=False)
        .head(1)
        .rename(columns={"event_id": "purchase_id", "ts": "p_ts"})
        [["user_id", "p_ts", "purchase_id"]]
        .sort_values("p_ts", kind="mergesort")
    )
    j = pd.merge_asof(
        v, p, left_on="ts", right_on="p_ts", by="user_id",
        direction="forward", allow_exact_matches=True,
    )
    expect = {}
    for r in j.itertuples(index=False):
        if pd.isna(r.purchase_id):
            expect[int(r.event_id)] = (None, None)
        else:
            secs = (
                int(r.p_ts.timestamp() // 1) - int(r.ts.timestamp() // 1)
            )
            expect[int(r.event_id)] = (int(r.purchase_id), secs)
    got = {
        r["event_id"]: (r["purchase_id"], r["secs_to_convert"])
        for r in _run(spark, "join_asof_forward")
    }
    assert got == expect and len(got) > 0


# --------------------------------------------- GROUPS frames


def test_groups_frame_vs_python_peer_walk(spark, lineitem_pd):
    """The GROUPS-frame emulation (dense_rank index + RANGE window)
    and its correlated-aggregate oracle replayed by a third mechanical
    path: per supplier, walk the sorted distinct quantity values
    (peer groups) explicitly and sum the last three groups' price mass
    with plain dicts — no window machinery of any kind."""
    sub = lineitem_pd[lineitem_pd.l_suppkey % 100 == 0]
    expect = {}
    for suppkey, g in sub.groupby("l_suppkey"):
        qtys = sorted(g.l_quantity.unique())
        gidx = {q: i + 1 for i, q in enumerate(qtys)}
        mass = {gidx[q]: (float(s.l_extendedprice.sum()), len(s))
                for q, s in g.groupby("l_quantity")}
        for r in g.itertuples(index=False):
            gi = gidx[r.l_quantity]
            lo = max(1, gi - 2)
            tot = sum(mass[i][0] for i in range(lo, gi + 1) if i in mass)
            cnt = sum(mass[i][1] for i in range(lo, gi + 1) if i in mass)
            # (l_orderkey, l_linenumber) is NOT unique in the fixture —
            # accumulate multisets keyed by (ok, ln, cnt), sums paired
            # sorted with tolerance
            expect.setdefault(
                (int(r.l_orderkey), int(r.l_linenumber), cnt), []
            ).append(tot)
    got = {}
    for r in _run(spark, "window_groups_frame"):
        got.setdefault(
            (r["l_orderkey"], r["l_linenumber"], r["grp_rows"]), []
        ).append(r["grp_sum"])
    assert set(got) == set(expect) and len(got) > 0
    for k, tots in expect.items():
        assert len(got[k]) == len(tots), k
        for a, b in zip(sorted(got[k]), sorted(tots)):
            assert abs(a - b) < 0.02, (k, a, b)


# -------------------------------------------- bucketed range join


def test_range_join_vs_python_window_scan(spark, events_pd):
    """The bucketed range join (time-bucket co-location operator)
    replayed with a plain per-user scan: for every purchase, count the
    same user's views inside [ts - 1h, ts] and sum their event ids —
    no bucketing, no join machinery."""
    purch = events_pd[events_pd.event_type == "purchase"]
    views_by_user = {
        u: g[["event_id", "ts"]]
        for u, g in events_pd[events_pd.event_type == "view"].groupby("user_id")
    }
    hour = pd.Timedelta(hours=1)
    expect = {}
    for r in purch.itertuples(index=False):
        g = views_by_user.get(r.user_id)
        if g is None:
            expect[int(r.event_id)] = (0, 0)
            continue
        m = g[(g.ts >= r.ts - hour) & (g.ts <= r.ts)]
        expect[int(r.event_id)] = (len(m), int(m.event_id.sum()) if len(m) else 0)

    got = {
        r["purchase_id"]: (r["n_views"], r["view_id_sum"])
        for r in _run(spark, "join_range_bucketed")
    }
    assert got == expect and len(got) > 0
