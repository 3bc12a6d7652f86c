"""Round-4 session-5 robust-series operators: Hampel despike, Holt
linear-trend smoothing, DTW-to-template, streaming dedup-within-
watermark. Exact values pinned against independent scalar references;
degenerate inputs and the partitioning/determinism contracts asserted."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.operators.dtw import (
    _bounds,
    _dtw_scalar_free,
    dtw_to_template,
)
from cesium_spark.operators.smoothing import hampel, holt_linear

EPOCH = dt.datetime(2024, 1, 1)


def _series(spark, ys, conv="c"):
    pdf = pd.DataFrame({
        "conv_id": [conv] * len(ys), "channel": ["v"] * len(ys),
        "turn_idx": range(len(ys)),
        "t": [float(i) * 10 for i in range(len(ys))],
        "y": [float(v) for v in ys]})
    pdf["ts"] = pdf["t"].map(lambda s: EPOCH + dt.timedelta(seconds=s))
    return spark.createDataFrame(
        pdf[["conv_id", "channel", "turn_idx", "ts", "t", "y"]])


# ---------------------------------------------------------------------------
# hampel
# ---------------------------------------------------------------------------


def _hampel_ref(y, k, n_sigma):
    y = np.asarray(y, dtype=float)
    n = len(y)
    med = np.empty(n)
    mad = np.empty(n)
    for i in range(n):
        w = y[max(0, i - k):min(n, i + k + 1)]
        med[i] = np.median(w)
        mad[i] = np.median(np.abs(w - med[i]))
    out = np.abs(y - med) > n_sigma * 1.4826 * mad
    return med, mad, out


def test_hampel_spike_replaced_inliers_kept(spark):
    ys = [10, 11, 10, 900, 11, 10, 11, 10]
    rows = {r["turn_idx"]: r
            for r in hampel(_series(spark, ys), k=2).collect()}
    assert rows[3]["is_outlier"] and rows[3]["y_clean"] == rows[3]["med"]
    for i in (0, 1, 2, 4, 5, 6, 7):
        assert not rows[i]["is_outlier"] and rows[i]["y_clean"] == ys[i]


def test_hampel_matches_scalar_reference(spark):
    rng = np.random.default_rng(9)
    ys = rng.normal(100, 5, size=200)
    ys[17] += 400
    ys[103] -= 300
    for k in (1, 2, 4):
        med, mad, out = _hampel_ref(ys, k, 3.0)
        got = {r["turn_idx"]: r
               for r in hampel(_series(spark, ys), k=k,
                               grid_dp=None).collect()}
        for i in range(len(ys)):
            assert got[i]["med"] == med[i]
            assert got[i]["mad"] == mad[i]
            assert got[i]["is_outlier"] == bool(out[i]), (k, i)


def test_hampel_constant_series_and_edges(spark):
    # constant window: MAD 0, dev 0 -> 0 > 0 is False, no flags
    rows = hampel(_series(spark, [5.0] * 10), k=3).collect()
    assert not any(r["is_outlier"] for r in rows)
    # n <= k: every window is the whole (shrunk) series
    rows = hampel(_series(spark, [1.0, 2.0]), k=5).collect()
    assert {r["med"] for r in rows} == {1.5}
    with pytest.raises(ValueError):
        hampel(_series(spark, [1.0]), k=0)


def test_hampel_partition_invariance(spark):
    rng = np.random.default_rng(3)
    dfs = [_series(spark, rng.normal(size=60), conv=f"c{i}")
           for i in range(4)]
    df = dfs[0]
    for d in dfs[1:]:
        df = df.unionByName(d)
    a = sorted(map(tuple, hampel(df, k=3).collect()))
    b = sorted(map(tuple, hampel(df.repartition(17), k=3).collect()))
    assert a == b


# ---------------------------------------------------------------------------
# holt_linear
# ---------------------------------------------------------------------------


def _holt_ref(y, a, b):
    y = np.asarray(y, dtype=float)
    n = len(y)
    lv = np.full(n, np.nan)
    tr = np.full(n, np.nan)
    fc = np.full(n, np.nan)
    if n == 1:
        lv[0] = y[0]
        return lv, tr, fc
    lp, bp = y[0], y[1] - y[0]
    lv[0], tr[0] = lp, bp
    for i in range(1, n):
        f = lp + bp
        li = a * y[i] + (1.0 - a) * (lp + bp)
        bi = b * (li - lp) + (1.0 - b) * bp
        if i >= 2:
            fc[i] = f
        lv[i], tr[i] = li, bi
        lp, bp = li, bi
    return lv, tr, fc


def test_holt_bitwise_vs_reference(spark):
    rng = np.random.default_rng(21)
    ys = np.cumsum(rng.normal(1.0, 2.0, size=150)) + 50
    lv, tr, fc = _holt_ref(ys, 0.5, 0.25)
    got = {r["turn_idx"]: r
           for r in holt_linear(_series(spark, ys), 0.5, 0.25).collect()}
    for i in range(len(ys)):
        assert got[i]["level"] == lv[i]            # bitwise
        assert got[i]["trend"] == tr[i]
        if i >= 2:
            assert got[i]["forecast"] == fc[i]
            assert got[i]["residual"] == ys[i] - fc[i]
        else:
            assert got[i]["forecast"] is None


def test_holt_tracks_linear_trend_exactly_in_the_limit(spark):
    # on a pure linear ramp the state locks on: forecast == y
    ys = [3.0 + 2.0 * i for i in range(40)]
    rows = holt_linear(_series(spark, ys), 0.5, 0.25).collect()
    for r in rows:
        if r["forecast"] is not None:
            assert r["residual"] == pytest.approx(0.0, abs=1e-9)


def test_holt_degenerates_and_validation(spark):
    one = holt_linear(_series(spark, [7.0]), 0.5, 0.25).collect()
    assert one[0]["level"] == 7.0 and one[0]["trend"] is None
    with pytest.raises(ValueError):
        holt_linear(_series(spark, [1.0, 2.0]), 0.3, 0.25)
    holt_linear(_series(spark, [1.0, 2.0]), 0.3, 0.25,
                allow_non_dyadic=True).collect()
    with pytest.raises(ValueError):
        holt_linear(_series(spark, [1.0, 2.0]), 0.5, 1.5)


# ---------------------------------------------------------------------------
# dtw_to_template
# ---------------------------------------------------------------------------


def _dtw_ref(x, t):
    n, m = len(x), len(t)
    D = np.full((n + 1, m + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, n + 1):
        for j in range(1, m + 1):
            D[i, j] = abs(x[i - 1] - t[j - 1]) + min(
                D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return D[n, m]


def test_dtw_kernel_matches_scalar_dp():
    rng = np.random.default_rng(0)
    for _ in range(200):
        n = int(rng.integers(1, 50))
        m = int(rng.integers(2, 24))
        x = rng.normal(size=n) * 10
        t = rng.normal(size=m) * 10
        d = _dtw_scalar_free(x, t)
        assert d == pytest.approx(_dtw_ref(x, t), abs=1e-9)
        lb, ub = _bounds(x, t)
        assert lb - 1e-9 <= d <= ub + 1e-9


def test_dtw_identity_shift_and_elasticity(spark):
    tpl = [1.0, 5.0, 2.0, 8.0, 3.0]
    # identical series -> 0; time-stretched copy -> still 0 (DTW's
    # whole point); euclidean-style shift -> n*shift-ish
    stretched = [1.0, 1.0, 5.0, 5.0, 5.0, 2.0, 8.0, 8.0, 3.0]
    df = _series(spark, tpl, conv="same") \
        .unionByName(_series(spark, stretched, conv="stretch")) \
        .unionByName(_series(spark, [v + 2 for v in tpl], conv="shift"))
    got = {r["conv_id"]: r for r in dtw_to_template(df, tpl).collect()}
    assert got["same"]["dtw"] == 0.0 and got["same"]["within_bounds"]
    assert got["stretch"]["dtw"] == 0.0
    assert got["shift"]["dtw"] == pytest.approx(2.0 * len(tpl), abs=1e-9)
    assert all(r["within_bounds"] for r in got.values())


def test_dtw_validation(spark):
    with pytest.raises(ValueError):
        dtw_to_template(_series(spark, [1.0]), [1.0])
    with pytest.raises(ValueError):
        dtw_to_template(_series(spark, [1.0]), [1.0, float("nan")])


# ---------------------------------------------------------------------------
# stream_dedup
# ---------------------------------------------------------------------------


def test_stream_dedup_collapses_redeliveries(spark, tmp_path):
    from cesium_spark.streaming.window_delta import stream_dedup
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    base = _series(spark, np.arange(30.0), conv="c1") \
        .unionByName(_series(spark, np.arange(20.0) * 2, conv="c2"))
    dups = base.where(F.col("turn_idx") % 3 == 0)
    base.unionByName(dups).unionByName(dups) \
        .coalesce(1).write.parquet(src)
    schema = ("conv_id string, channel string, turn_idx long, "
              "ts timestamp, t double, y double")
    stream = spark.readStream.schema(schema).parquet(src)
    q = (stream_dedup(stream, ["conv_id", "turn_idx"], "ts", "1 hour")
         .writeStream.outputMode("append")
         .option("checkpointLocation", ck)
         .format("parquet").option("path", out)
         .trigger(availableNow=True).start())
    assert q.awaitTermination(120)
    got = sorted(map(tuple, spark.read.parquet(out)
                     .select("conv_id", "turn_idx", "y").collect()))
    exp = sorted(map(tuple,
                     base.select("conv_id", "turn_idx", "y").collect()))
    assert got == exp
    with pytest.raises(ValueError):
        stream_dedup(stream, [], "ts")


# ---------------------------------------------------------------------------
# classical_decompose
# ---------------------------------------------------------------------------


def _decomp_ref(y, p):
    y = np.asarray(y, dtype=float)
    n = len(y)
    h = (p - 1) // 2
    trend = np.full(n, np.nan)
    for i in range(h, n - h):
        trend[i] = np.mean(y[i - h:i + h + 1])
    det = y - trend
    slots = np.arange(n) % p
    slot_means = {}
    for s in range(p):
        v = det[slots == s]
        v = v[~np.isnan(v)]
        slot_means[s] = np.mean(v) if len(v) else np.nan
    ctr = np.nanmean([slot_means[s] for s in range(p)
                      if s in {x for x in slots}])
    seasonal = np.array([slot_means[s] - ctr for s in slots])
    return trend, seasonal, y - trend - seasonal


def test_decompose_recovers_planted_seasonality(spark):
    from cesium_spark.operators.seriesstats import classical_decompose
    p = 5
    base = [10.0, -5.0, 0.0, 3.0, -8.0]              # sums to 0
    ys = [100.0 + 0.5 * i + base[i % p] for i in range(60)]
    got = {r["turn_idx"]: r
           for r in classical_decompose(_series(spark, ys), p).collect()}
    trend, seasonal, resid = _decomp_ref(ys, p)
    for i in range(60):
        if np.isnan(trend[i]):
            assert got[i]["trend"] is None and got[i]["resid"] is None
        else:
            assert got[i]["trend"] == pytest.approx(trend[i], abs=1e-9)
            assert got[i]["resid"] == pytest.approx(resid[i], abs=1e-9)
        assert got[i]["seasonal"] == pytest.approx(seasonal[i], abs=1e-9)
    # a pure linear ramp + exact seasonality decomposes losslessly:
    # residual ~ 0 on interior rows
    for i in range(2, 58):
        assert abs(got[i]["resid"]) < 1e-9


def test_decompose_scalar_reference_random(spark):
    from cesium_spark.operators.seriesstats import classical_decompose
    rng = np.random.default_rng(17)
    ys = rng.normal(50, 10, size=83)                 # n not multiple of p
    p = 7
    trend, seasonal, resid = _decomp_ref(ys, p)
    got = {r["turn_idx"]: r
           for r in classical_decompose(_series(spark, ys), p).collect()}
    for i in range(len(ys)):
        for name, ref_v in (("trend", trend[i]), ("seasonal", seasonal[i]),
                            ("resid", resid[i])):
            if np.isnan(ref_v):
                assert got[i][name] is None, (name, i)
            else:
                assert got[i][name] == pytest.approx(ref_v, abs=1e-9)


def test_decompose_validation(spark):
    from cesium_spark.operators.seriesstats import classical_decompose
    for bad in (2, 4, 1):
        with pytest.raises(ValueError):
            classical_decompose(_series(spark, [1.0, 2.0]), bad)


# ---------------------------------------------------------------------------
# random_projection (JL)
# ---------------------------------------------------------------------------


def test_random_projection_matches_numpy_and_preserves_distance(spark):
    from cesium_spark.operators.similarity import (
        _jl_signs,
        random_projection,
    )
    rng = np.random.default_rng(4)
    dim, out = 64, 16
    X = rng.normal(size=(120, dim))
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": range(len(X)),
        "embedding": [list(map(float, r)) for r in X]}))
    got = {r["vec_id"]: np.array([r[f"p{j}"] for j in range(out)])
           for r in random_projection(df, dim, out).collect()}
    P = X @ _jl_signs(dim, out) / np.sqrt(out)
    for i in range(len(X)):
        assert got[i] == pytest.approx(P[i], abs=1e-9)
    # JL property: pairwise distances preserved within a generous
    # epsilon at this dim ratio (statistical, seeded -> deterministic)
    d_hi = np.linalg.norm(X[:40, None, :] - X[None, :40, :], axis=2)
    Pm = P[:40]
    d_lo = np.linalg.norm(Pm[:, None, :] - Pm[None, :, :], axis=2)
    mask = d_hi > 0
    ratio = d_lo[mask] / d_hi[mask]
    assert 0.35 < ratio.min() and ratio.max() < 1.8
    assert abs(float(np.median(ratio)) - 1.0) < 0.15
    with pytest.raises(ValueError):
        random_projection(df, dim, dim)


# --- holt-winters additive seasonal ------------------------------------------

def _hw_ref(y, a, b, g, p):
    import numpy as np
    n = len(y)
    if n < 2 * p:
        return None

    def g6(x):
        return float(np.floor(x * 1e6 + 0.5) / 1e6)

    out = {"level": [None] * n, "trend": [None] * n,
           "seas": [None] * n, "f": [None] * n}
    m1 = 0.0
    for v in y[:p]:
        m1 += v
    m1 /= p
    m2 = 0.0
    for v in y[p:2 * p]:
        m2 += v
    m2 /= p
    l, bb = g6(m1), g6((m2 - m1) / p)
    s = [g6(y[i] - m1) for i in range(p)]
    for i in range(p):
        out["seas"][i] = s[i]
    out["level"][p - 1] = l
    out["trend"][p - 1] = bb
    for i in range(p, n):
        so = s[0]
        out["f"][i] = l + bb + so
        li = a * (y[i] - so) + (1.0 - a) * (l + bb)
        bi = b * (li - l) + (1.0 - b) * bb
        si = g * (y[i] - li) + (1.0 - g) * so
        out["level"][i], out["trend"][i], out["seas"][i] = li, bi, si
        s = s[1:] + [si]
        l, bb = li, bi
    return out


def test_holt_winters_bit_exact_vs_scalar_reference(spark):
    import numpy as np
    import pandas as pd

    from cesium_spark.operators.smoothing import holt_winters
    rng = np.random.default_rng(9)
    p = 6
    season = np.array([3.0, -1.0, 0.5, -2.0, 1.5, -2.0])
    data = {}
    for c in range(4):
        m = int(rng.integers(2 * p, 90))
        t = np.arange(m, dtype=float)
        data[f"c{c}"] = list(0.2 * t + season[np.arange(m) % p]
                             + rng.normal(0, 0.05, m))
    data["short"] = list(np.arange(5.0))
    rows = [(c, "value", i, float(i), float(v))
            for c, vs in data.items() for i, v in enumerate(vs)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "channel", "turn_idx", "t", "y"]))
    out = holt_winters(df, 0.5, 0.25, 0.25, p).toPandas()
    assert "short" not in set(out.conv_id)   # < 2 periods: honest drop
    for c, vs in data.items():
        if c == "short":
            continue
        ref = _hw_ref(vs, 0.5, 0.25, 0.25, p)
        sub = out[out.conv_id == c].sort_values("turn_idx")
        for i, row in enumerate(sub.itertuples()):
            for col, key in (("level", "level"), ("trend", "trend"),
                             ("seasonal", "seas"), ("forecast", "f")):
                gv, rv = getattr(row, col), ref[key][i]
                if rv is None:
                    assert np.isnan(gv), (c, i, col)
                else:
                    assert gv == rv, (c, i, col)   # BIT-exact


def test_holt_winters_beats_holt_on_seasonal_signal(spark):
    """The seasonal component is worth having: on a clean
    trend+seasonal signal the HW one-step residuals are far smaller
    than plain Holt's (which must chase the season as trend error)."""
    import numpy as np
    import pandas as pd

    from cesium_spark.operators.smoothing import holt_linear, holt_winters
    p = 6
    season = np.array([5.0, -3.0, 1.0, -4.0, 4.0, -3.0])
    m = 120
    y = 0.1 * np.arange(m) + season[np.arange(m) % p]
    rows = [("a", "value", i, float(i), float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "channel", "turn_idx", "t", "y"]))
    hw = holt_winters(df, 0.5, 0.25, 0.25, p).toPandas()
    h = holt_linear(df, 0.5, 0.25).toPandas()
    tail = lambda d: d[d.turn_idx > 4 * p].residual.abs().median()  # noqa: E731
    assert tail(hw) < 0.25 * tail(h)


def test_holt_winters_validation(spark):
    import pandas as pd

    from cesium_spark.operators.smoothing import holt_winters
    df = spark.createDataFrame(pd.DataFrame(
        [("a", "value", 0, 0.0, 1.0)],
        columns=["conv_id", "channel", "turn_idx", "t", "y"]))
    import pytest
    with pytest.raises(ValueError, match="gamma"):
        holt_winters(df, 0.5, 0.25, 0.3, 6)      # non-dyadic gamma
    with pytest.raises(ValueError, match="period"):
        holt_winters(df, 0.5, 0.25, 0.25, 1)


def test_forecast_scores_semantics(spark):
    """MASE anchors: a perfect forecast scores 0; the naive last-value
    forecast scores exactly 1; a constant series has no naive scale
    and reports NULL, never infinity."""
    import numpy as np
    import pandas as pd

    from cesium_spark.operators.smoothing import forecast_scores
    rng = np.random.default_rng(31)
    y = rng.normal(0, 1, 50)
    rows = []
    for i in range(50):
        f_perfect = float(y[i]) if i >= 2 else None
        f_naive = float(y[i - 1]) if i >= 1 else None
        rows.append(("perfect", i, float(y[i]), f_perfect))
        rows.append(("naive", i, float(y[i]), f_naive))
        rows.append(("const", i, 3.0, 3.0 if i >= 1 else None))
    df = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "y", "forecast"]))
    out = {r.conv_id: r for r in forecast_scores(df).collect()}
    p = out["perfect"]
    assert p.n_scored == 48 and p.mae == 0.0 and p.mase == 0.0
    nv = out["naive"]
    # naive forecast's MAE == the naive scaling by construction... up
    # to the one extra lag row the scale includes; allow tight band
    assert nv.mase == pytest.approx(1.0, abs=1e-12)
    c = out["const"]
    assert c.mae == 0.0 and c.mase is None   # 0/0: undefined, not 0
