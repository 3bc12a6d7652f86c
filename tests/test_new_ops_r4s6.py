"""Round-4 session-6 operators: AR(1) Yule–Walker fit (and the rest of
this session's batch as they land). Exact values pinned against
independent numpy references; degenerate inputs and plan shape
asserted."""

from __future__ import annotations

import datetime as dt
import re

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.seriesstats import ar1_fit

EPOCH = dt.datetime(2024, 1, 1)


def _series(spark, ys, conv="c", channel="v"):
    pdf = pd.DataFrame({
        "conv_id": [conv] * len(ys), "channel": [channel] * len(ys),
        "turn_idx": range(len(ys)),
        "t": [float(i) * 10 for i in range(len(ys))],
        "y": [float(v) for v in ys]})
    pdf["ts"] = pdf["t"].map(lambda s: EPOCH + dt.timedelta(seconds=s))
    return spark.createDataFrame(
        pdf[["conv_id", "channel", "turn_idx", "ts", "t", "y"]])


def _ar1_ref(y: np.ndarray) -> dict:
    ybar = y.mean()
    d = y - ybar
    num = float((d[1:] * d[:-1]).sum())
    den = float((d * d).sum())
    phi = num / den
    var = float(d.var())
    return {
        "ybar": ybar, "phi": phi,
        "intercept": ybar * (1 - phi),
        "sigma2": (1 - phi * phi) * var,
        "forecast": ybar + phi * (y[-1] - ybar),
    }


# ---------------------------------------------------------------------------
# ar1_fit
# ---------------------------------------------------------------------------


def test_ar1_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    # genuinely autocorrelated series: AR(1) with known phi
    y = np.zeros(200)
    for i in range(1, 200):
        y[i] = 5.0 + 0.7 * (y[i - 1] - 5.0) + rng.normal(0, 1.0)
    out = ar1_fit(_series(spark, y)).toPandas().iloc[0]
    ref = _ar1_ref(y)
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, abs=1e-9), k
    # the fitted phi actually recovers the planted coefficient
    assert abs(out["phi"] - 0.7) < 0.15
    assert out["n"] == 200


def test_ar1_multi_series_independent(spark):
    rng = np.random.default_rng(3)
    ya = rng.normal(0, 1, 50)
    yb = np.cumsum(rng.normal(0, 1, 80))  # near-unit-root: phi ≈ 1
    df = _series(spark, ya, conv="a").union(_series(spark, yb, conv="b"))
    out = (ar1_fit(df).toPandas()
           .set_index("conv_id").sort_index())
    for conv, y in (("a", ya), ("b", yb)):
        ref = _ar1_ref(y)
        for k, v in ref.items():
            assert out.loc[conv, k] == pytest.approx(v, abs=1e-9), (conv, k)
    assert out.loc["b", "phi"] > 0.8  # random walk is sticky


def test_ar1_degenerates_null_not_fake(spark):
    # constant series: zero denominator → NULL phi, NOT 0 or a crash
    const = ar1_fit(_series(spark, [4.0] * 10)).toPandas().iloc[0]
    assert pd.isna(const["phi"]) and pd.isna(const["forecast"])
    assert const["ybar"] == 4.0
    # single point: no pairs → NULL
    single = ar1_fit(_series(spark, [2.5])).toPandas().iloc[0]
    assert pd.isna(single["phi"])
    assert single["n"] == 1


def test_ar1_plan_one_exchange(spark):
    df = ar1_fit(_series(spark, np.arange(30.0)))
    df.collect()
    # AQE toString prints Final AND Initial plan — audit the final only
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "Cartesian" not in p and "Join" not in p
