"""r5 randomness/changepoint family: von Neumann ratio, SNHT, and
Page–Hinkley — literal numpy replays of the documented formulas to
1e-9 plus planted-signal direction checks."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.seriesstats import (
    page_hinkley, snht, von_neumann)


def _series(spark, y, conv="c"):
    pdf = pd.DataFrame({
        "conv_id": [conv] * len(y),
        "turn_idx": range(len(y)),
        "t": [float(i) for i in range(len(y))],
        "y": np.asarray(y, dtype=np.int64)})
    return spark.createDataFrame(pdf)


def _vn_ref(y):
    y = np.asarray(y, dtype=np.float64)
    n = len(y)
    sd2 = np.sum(np.diff(y) ** 2)
    ss_over_n = np.sum((y - y.mean()) ** 2)       # = SS/N
    eta = (sd2 / (n - 1)) / (ss_over_n / n)
    mu = 2.0 * n / (n - 1.0)
    var = 4.0 * n * n * (n - 2.0) / ((n + 1.0) * (n - 1.0) ** 3)
    return eta, (eta - mu) / np.sqrt(var)


def test_von_neumann_matches_reference(spark):
    rng = np.random.default_rng(7)
    y = rng.integers(0, 100, 80)
    [r] = von_neumann(_series(spark, y)).collect()
    eta, z = _vn_ref(y)
    assert r["vn_ratio"] == pytest.approx(eta, abs=1e-9)
    assert r["z"] == pytest.approx(z, abs=1e-9)


def test_von_neumann_directions(spark):
    ramp = np.arange(100)                          # trend: tiny d², big SS
    [rt] = von_neumann(_series(spark, ramp)).collect()
    assert rt["vn_ratio"] < 0.1 and rt["trending_95"]
    alt = np.tile([0, 100], 50)                    # saw: η → 4
    [ra] = von_neumann(_series(spark, alt)).collect()
    assert ra["vn_ratio"] > 3.5 and ra["oscillating_95"]
    const = np.full(50, 7)                         # SS = 0 → NULL
    [rc] = von_neumann(_series(spark, const)).collect()
    assert rc["vn_ratio"] is None and rc["trending_95"] is None
    fdf = _series(spark, ramp)
    with pytest.raises(ValueError, match="integer"):
        von_neumann(fdf.withColumn("y", fdf["y"].cast("double")))


def test_snht_planted_shift(spark):
    rng = np.random.default_rng(3)
    y = np.concatenate([rng.integers(10, 20, 60),
                        rng.integers(40, 50, 40)])
    [r] = snht(_series(spark, y)).collect()
    assert r["k_snht"] == 60                        # split AFTER row 60
    assert r["mean_right"] - r["mean_left"] == pytest.approx(
        r["delta_mean"], abs=1e-9)
    assert r["delta_mean"] > 20
    # formula replay at the reported k
    n, k = 100, 60
    s_k, s, q = y[:60].sum(), y.sum(), (y.astype(np.int64) ** 2).sum()
    u = n * s_k - k * s
    v = n * q - s * s
    t_ref = round(n * float(u) * float(u) / (k * (n - k) * float(v)), 9)
    assert r["t_max"] == pytest.approx(t_ref, abs=1e-9)
    # degenerate: constant and 2-point series yield no row
    assert snht(_series(spark, np.full(30, 5))).count() == 0
    assert snht(_series(spark, [1, 2])).count() == 0


def _ph_ref(y, delta, lam, grid=4):
    """EXACT integer-lattice replay (the engine semantics): all state
    on the grid·n lattice, so a crossing that lands exactly ON λ is
    not-crossed under strict > — a float replay flips such boundaries
    by 1 ulp (observed live: mean = S/100 is not binary-exact)."""
    y = np.asarray(y, dtype=np.int64)
    n = len(y)
    dg, lg, g = round(delta * grid), round(lam * grid), grid
    inc_idx = dec_idx = None
    mi = md = 0
    sk = 0
    # min over t' in [1, T] — the engine's window min sees only real
    # rows, no virtual m_0 = 0 (Page's M_T = min_{t<=T} m_t convention)
    min_i = min_d = None
    for t, v in enumerate(y, start=1):
        sk += int(v)
        core = g * (n * sk - t * int(y.sum()))
        g_i = core - t * n * dg
        g_d = -core - t * n * dg
        min_i = g_i if min_i is None else min(min_i, g_i)
        min_d = g_d if min_d is None else min(min_d, g_d)
        mi = max(mi, g_i - min_i)
        md = max(md, g_d - min_d)
        if inc_idx is None and g_i - min_i > lg * n:
            inc_idx = t
        if dec_idx is None and g_d - min_d > lg * n:
            dec_idx = t
    return inc_idx, dec_idx, mi / (g * n), md / (g * n)


def test_page_hinkley_planted_drift(spark):
    rng = np.random.default_rng(5)
    y = np.concatenate([rng.integers(20, 30, 50),
                        rng.integers(60, 70, 50)])  # upward drift at 50
    [r] = page_hinkley(_series(spark, y), delta=0.5, lam=25.0).collect()
    ii, di, mi, md = _ph_ref(y, 0.5, 25.0)
    assert r["alarm_inc_idx"] == ii and ii is not None and ii > 50
    assert r["alarm_dec_idx"] == di
    assert r["max_exc_inc"] == pytest.approx(mi, abs=1e-9)
    assert r["max_exc_dec"] == pytest.approx(md, abs=1e-9)
    assert r["alarmed"]


def test_page_hinkley_quiet_and_validation(spark):
    y = np.tile([10, 11], 30)                       # no drift
    [r] = page_hinkley(_series(spark, y), delta=0.5, lam=25.0).collect()
    assert not r["alarmed"] and r["alarm_inc_idx"] is None
    with pytest.raises(ValueError, match="lattice"):
        page_hinkley(_series(spark, y), delta=0.3, lam=10.0, grid=4)
    with pytest.raises(ValueError, match="lam"):
        page_hinkley(_series(spark, y), lam=0.0)
    fdf = _series(spark, y)
    with pytest.raises(ValueError, match="integer"):
        page_hinkley(fdf.withColumn("y", fdf["y"].cast("double")),
                     lam=1.0)


def test_all_three_bit_stable_across_partitions(spark):
    rng = np.random.default_rng(11)
    rows = []
    for c in range(5):
        y = rng.integers(0, 100, 60)
        for i, v in enumerate(y):
            rows.append((f"c{c}", i, float(i), int(v)))
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "t", "y"]))
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    outs = {"vn": [], "sn": [], "ph": []}
    try:
        for n in (3, 200):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            outs["vn"].append(sorted(map(tuple, von_neumann(df).collect())))
            outs["sn"].append(sorted(map(tuple, snht(df).collect())))
            outs["ph"].append(sorted(map(tuple, page_hinkley(
                df, delta=0.25, lam=5.0).collect())))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    for k in outs:
        assert outs[k][0] == outs[k][1], k


def test_turning_points_reference_and_directions(spark):
    from cesium_spark.operators.seriesstats import turning_points
    rng = np.random.default_rng(9)
    y = rng.integers(0, 1000, 120)
    [r] = turning_points(_series(spark, y)).collect()
    # numpy replay of the strict-inequality count
    tp = int(np.sum((y[1:-1] > y[:-2]) & (y[1:-1] > y[2:])
                    | (y[1:-1] < y[:-2]) & (y[1:-1] < y[2:])))
    n = len(y)
    mu = 2.0 * (n - 2) / 3.0
    z = (tp - mu) / np.sqrt((16 * n - 29) / 90.0)
    assert r["n_turning"] == tp
    assert r["z"] == pytest.approx(z, abs=1e-9)
    # iid: z within ±4 sigma, neither flag typically
    assert abs(r["z"]) < 4
    # monotone ramp: zero turning points, trending
    [rt] = turning_points(_series(spark, np.arange(50))).collect()
    assert rt["n_turning"] == 0 and rt["trending_95"]
    # perfect saw: every interior point turns, alternating
    [ra] = turning_points(_series(spark, np.tile([0, 9], 30))).collect()
    assert ra["n_turning"] == 58 and ra["alternating_95"]
    # ties are not extrema: flat plateau contributes nothing
    [rf] = turning_points(_series(spark, [1, 5, 5, 5, 1, 7, 2])).collect()
    # plateau 5,5,5 contributes nothing; the 1-trough and 7-peak count
    assert rf["n_turning"] == 2
    # n < 4 -> NULL moments
    [rs] = turning_points(_series(spark, [1, 9, 2])).collect()
    assert rs["z"] is None and rs["n_turning"] == 1


def test_esd_unmasking(spark):
    """Two planted outliers: round 1 picks the bigger, round 2 the
    second AFTER recomputing stats — the masking case a single Grubbs
    pass understates. Replayed in numpy to 1e-9."""
    from cesium_spark.operators.seriesstats import esd_outliers
    rng = np.random.default_rng(13)
    y = rng.integers(45, 56, 80)
    y[20], y[55] = 500, 480                # two big spikes
    [r] = esd_outliers(_series(spark, y), k=3).collect()
    assert (r["turn_1"], r["turn_2"]) == (20, 55)

    def esd_round(vals):
        v = np.asarray(vals, dtype=np.int64)
        n, S, Q = len(v), int(v.sum()), int((v * v).sum())
        dev = np.abs(n * v - S)
        j = int(np.argmax(dev))            # numpy argmax = earliest max
        return j, dev[j] / np.sqrt(n * Q - S * S)

    j1, r1 = esd_round(y)
    assert r["r_1"] == pytest.approx(r1, abs=1e-9)
    y2 = np.delete(y, j1)
    j2, r2 = esd_round(y2)
    assert r["r_2"] == pytest.approx(r2, abs=1e-9)
    # r_2 > r_1's would-be value without removal is the unmasking point:
    # after removing the 500, the 480 stands out MORE
    assert r["r_2"] > r["r_1"] * 0.9
    # constant rump: NULL rounds
    [rc] = esd_outliers(_series(spark, np.full(10, 3)), k=2).collect()
    assert rc["r_1"] is None and rc["turn_1"] is None
    with pytest.raises(ValueError, match="k must be"):
        esd_outliers(_series(spark, y), k=0)


def test_theta_forecast_matches_pandas_reference(spark):
    """Theta = average of OLS-trend extrapolation and SES(1/2) of the
    theta-2 line; pinned against np.polyfit + pandas ewm(adjust=False)
    to 1e-6 on a noisy trend, plus degenerate guards."""
    from cesium_spark.operators.smoothing import theta_forecast
    rng = np.random.default_rng(1)
    y = (10 + 2 * np.arange(50) + rng.integers(-3, 4, 50)).astype(np.int64)
    pdf = pd.DataFrame({"conv_id": ["c"] * 50, "channel": ["v"] * 50,
                        "turn_idx": range(50),
                        "t": [float(i) for i in range(50)], "y": y})
    [r] = theta_forecast(spark.createDataFrame(pdf), h=3).collect()
    i = np.arange(1, 51)
    b, a = np.polyfit(i, y, 1)
    z = 2 * y - (a + b * i)
    ses = pd.Series(z).ewm(alpha=0.5, adjust=False).mean().iloc[-1]
    assert r["slope"] == pytest.approx(b, abs=1e-9)
    assert r["intercept"] == pytest.approx(a, abs=1e-9)
    assert r["ses_level"] == pytest.approx(ses, abs=1e-6)
    for h in (1, 2, 3):
        assert r[f"fc_{h}"] == pytest.approx(
            ((a + b * (50 + h)) + ses) / 2, abs=1e-6)
    # pure trend: forecasts continue the line almost exactly
    yt = (5 + 3 * np.arange(30)).astype(np.int64)
    pdt = pd.DataFrame({"conv_id": ["c"] * 30, "channel": ["v"] * 30,
                        "turn_idx": range(30),
                        "t": [float(i) for i in range(30)], "y": yt})
    [rt] = theta_forecast(spark.createDataFrame(pdt), h=2).collect()
    # classic Theta ≡ SES-with-drift-b/2 (Hyndman & Billah 2003): on a
    # pure ramp the SES leg lags by b·(1−α)/α = 3, so the forecast is
    # (trend + (y_n − 3))/2 — NOT the naive line continuation
    it = np.arange(1, 31)
    bt, at = np.polyfit(it, yt, 1)
    st = pd.Series(2 * yt - (at + bt * it)).ewm(
        alpha=0.5, adjust=False).mean().iloc[-1]
    assert rt["fc_1"] == pytest.approx(
        ((at + bt * 31) + st) / 2, abs=1e-6)
    assert rt["fc_1"] < 5 + 3 * 30    # the documented trend damping
    # n < 3 -> NULL
    pds = pdt.iloc[:2]
    [rs] = theta_forecast(spark.createDataFrame(pds), h=1).collect()
    assert rs["fc_1"] is None
    with pytest.raises(ValueError, match="h must be"):
        theta_forecast(spark.createDataFrame(pdt), h=0)
    fdf = spark.createDataFrame(pdt)
    with pytest.raises(ValueError, match="integer"):
        theta_forecast(fdf.withColumn("y", fdf["y"].cast("double")))


def test_theta_backtest_matches_reference(spark):
    """MASE/sMAPE of the holdout backtest replayed in numpy; MASE < 1
    on a forecastable trend; short conversations drop."""
    from cesium_spark.operators.smoothing import theta_backtest
    rng = np.random.default_rng(2)
    y = (10 + 2 * np.arange(60) + rng.integers(-4, 5, 60)).astype(np.int64)
    pdf = pd.DataFrame({"conv_id": ["c"] * 60, "channel": ["v"] * 60,
                        "turn_idx": range(60),
                        "t": [float(i) for i in range(60)], "y": y})
    [r] = theta_backtest(spark.createDataFrame(pdf), h=3).collect()
    tr, ho = y[:57], y[57:]
    i = np.arange(1, 58)
    b, a = np.polyfit(i, tr, 1)
    z = 2 * tr - (a + b * i)
    ses = pd.Series(z).ewm(alpha=0.5, adjust=False).mean().iloc[-1]
    fcs = np.array([((a + b * (57 + s)) + ses) / 2 for s in (1, 2, 3)])
    ae = np.abs(ho - fcs)
    assert r["n_train"] == 57 and r["n_test"] == 3
    assert r["mae"] == pytest.approx(ae.mean(), abs=1e-6)
    assert r["mase"] == pytest.approx(
        ae.mean() / np.abs(np.diff(tr)).mean(), abs=1e-6)
    assert r["smape"] == pytest.approx(
        (200 * ae / (np.abs(ho) + np.abs(fcs))).mean(), abs=1e-6)
    assert r["mase"] < 1            # theta beats naive on a trend
    # too short to fit: no row
    short = pdf.iloc[:4]
    assert theta_backtest(spark.createDataFrame(short), h=3).count() == 0
    with pytest.raises(ValueError, match="h must be"):
        theta_backtest(spark.createDataFrame(pdf), h=0)
