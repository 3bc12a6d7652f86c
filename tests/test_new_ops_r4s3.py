"""Round-4 session-3 operators: upsert compaction, time-weighted
average, incremental cagg refresh (merge_moments), SAX symbolization,
EWMA smoothing — hand-computed exact values, determinism under
repartitioning, validation edges, and the dyadic-alpha bit-replay pin
the EWMA oracle depends on."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.compaction import upsert_latest
from cesium_spark.operators.downsample import sax_symbolize
from cesium_spark.operators.fold import merge_moments
from cesium_spark.operators.rates import time_weighted_avg
from cesium_spark.operators.rollup import rollup_moments
from cesium_spark.operators.smoothing import ewma


def _ts(h, m=0, s=0):
    return pd.Timestamp(2024, 1, 1, h, m, s)


# --------------------------------------------------------------------------
# upsert_latest
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def versioned(spark):
    return spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 2, 3],
        "version": [1, 3, 2, 1, 1],
        "seq": [10, 11, 12, 13, 14],
        "payload": ["a", "c", "b", "d", "e"],
    }))


def test_upsert_latest_keeps_max_version(spark, versioned):
    out = {r["k"]: r for r in
           upsert_latest(versioned, ["k"], ["version", "seq"]).collect()}
    assert len(out) == 3
    assert (out[1]["version"], out[1]["payload"]) == (3, "c")
    assert (out[2]["payload"], out[3]["payload"]) == ("d", "e")
    # full column set preserved
    assert set(out[1].asDict()) == {"k", "version", "seq", "payload"}


def test_upsert_latest_tiebreak_via_uniquifier(spark):
    # equal version: the unique seq column must decide, deterministically
    df = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1], "version": [2, 2], "seq": [5, 6],
        "payload": ["old", "new"]}))
    for parts in (1, 7):
        got = upsert_latest(df.repartition(parts), ["k"],
                            ["version", "seq"]).collect()
        assert [(r["payload"], r["seq"]) for r in got] == [("new", 6)]


def test_upsert_latest_partitioning_invariance(spark, versioned):
    a = sorted(map(tuple, upsert_latest(
        versioned.repartition(1), ["k"], ["version", "seq"]).collect()))
    b = sorted(map(tuple, upsert_latest(
        versioned.repartition(13), ["k"], ["version", "seq"]).collect()))
    assert a == b


def test_upsert_latest_validation(spark, versioned):
    with pytest.raises(ValueError, match="keys"):
        upsert_latest(versioned, [], ["version"])
    with pytest.raises(ValueError, match="order_cols"):
        upsert_latest(versioned, ["k"], [])
    with pytest.raises(ValueError, match="overlap"):
        upsert_latest(versioned, ["k", "version"], ["version"])


# --------------------------------------------------------------------------
# time_weighted_avg
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def twa_series(spark):
    # one conv: hour 0 has points at t=0,10,40 (y=1,3,5);
    # hour 1 has a single point; hour 2 has two points at the SAME t
    # (zero span); NULL y row must be dropped.
    rows = pd.DataFrame({
        "conv_id": ["c"] * 6, "channel": ["v"] * 6,
        "turn_idx": [0, 1, 2, 3, 4, 5],
        "ts": [_ts(0, 0, 0), _ts(0, 0, 10), _ts(0, 0, 40),
               _ts(1, 0, 0), _ts(2, 0, 0), _ts(2, 0, 0)],
        "t": [0.0, 10.0, 40.0, 3600.0, 7200.0, 7200.0],
        "y": [1.0, 3.0, 5.0, 7.0, 9.0, 11.0],
    })
    null_row = pd.DataFrame({
        "conv_id": ["c"], "channel": ["v"], "turn_idx": [6],
        "ts": [_ts(0, 0, 20)], "t": [20.0], "y": [np.nan]})
    return spark.createDataFrame(pd.concat([rows, null_row]))


def test_twa_locf_hand_computed(spark, twa_series):
    out = {r["bucket"].hour: r for r in
           time_weighted_avg(twa_series, "1h").collect()}
    # hour 0: LOCF integral = 1*10 + 3*30 = 100 over span 40 → 2.5
    assert out[0]["twa"] == pytest.approx(2.5)
    assert out[0]["span_s"] == 40.0 and out[0]["n"] == 3
    # hour 1: single point → its value, span 0
    assert out[1]["twa"] == 7.0 and out[1]["span_s"] == 0.0
    # hour 2: two points, zero span → first by (t, turn_idx) = y of idx 4
    assert out[2]["twa"] == 9.0 and out[2]["n"] == 2


def test_twa_linear_hand_computed(spark, twa_series):
    out = {r["bucket"].hour: r for r in
           time_weighted_avg(twa_series, "1h", method="linear").collect()}
    # hour 0: trapezoid = (1+3)/2*10 + (3+5)/2*30 = 20 + 120 = 140 → 3.5
    assert out[0]["twa"] == pytest.approx(3.5)
    assert out[1]["twa"] == 7.0


def test_twa_vs_plain_avg_on_burst(spark):
    # burst sampling: 10 samples of y=100 in 1s, then one y=0 at t=100.
    # plain avg ≈ 90.9 (the burst dominates the row count); LOCF TWA
    # holds 100 across the long idle stretch and the trailing 0 has no
    # following point, so twa = 100 exactly — time weighting, not row
    # weighting.
    n = 10
    pdf = pd.DataFrame({
        "conv_id": ["c"] * (n + 1), "channel": ["v"] * (n + 1),
        "turn_idx": range(n + 1),
        "ts": [_ts(0, 0, 0)] * (n + 1),
        "t": [i * 0.1 for i in range(n)] + [100.0],
        "y": [100.0] * n + [0.0],
    })
    out = time_weighted_avg(spark.createDataFrame(pdf), "1h").collect()[0]
    locf = (sum(100.0 * 0.1 for _ in range(n - 1))
            + 100.0 * (100.0 - (n - 1) * 0.1)) / 100.0
    assert out["twa"] == pytest.approx(locf)
    assert out["twa"] == pytest.approx(100.0, rel=0.01)  # LOCF holds 100


def test_twa_validation(spark, twa_series):
    with pytest.raises(ValueError, match="tier"):
        time_weighted_avg(twa_series, "5m")
    with pytest.raises(ValueError, match="method"):
        time_weighted_avg(twa_series, "1h", method="spline")


# --------------------------------------------------------------------------
# merge_moments (incremental cagg refresh)
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def moment_series(spark):
    rng = np.random.default_rng(3)
    n = 400
    ts = pd.date_range("2024-01-01", periods=n, freq="97s")
    return spark.createDataFrame(pd.DataFrame({
        "conv_id": [f"c{i % 5}" for i in range(n)],
        "channel": ["v"] * n,
        "turn_idx": range(n),
        "ts": ts,
        "t": np.arange(n) * 97.0,
        "y": rng.uniform(0, 100, n),
    }))


def test_merge_moments_equals_from_scratch(spark, moment_series):
    from pyspark.sql import functions as F
    s = moment_series
    late = F.col("turn_idx") % 10 == 7
    merged = merge_moments(rollup_moments(s.where(~late), "1h"),
                           rollup_moments(s.where(late), "1h"))
    direct = rollup_moments(s, "1h")
    key = ["conv_id", "channel", "window_start"]
    m = {tuple(r[k] for k in key): r for r in merged.collect()}
    d = {tuple(r[k] for k in key): r for r in direct.collect()}
    assert set(m) == set(d) and len(d) > 5
    for k in d:
        assert m[k]["n"] == d[k]["n"]
        assert m[k]["y_min"] == d[k]["y_min"]          # lattice: exact
        assert m[k]["y_max"] == d[k]["y_max"]
        assert m[k]["t_min"] == d[k]["t_min"]
        assert m[k]["t_max"] == d[k]["t_max"]
        for c in ("y_sum", "y_sum2", "y_sum3"):        # float: to rounding
            assert m[k][c] == pytest.approx(d[k][c], rel=1e-12)


def test_merge_moments_empty_delta_is_identity(spark, moment_series):
    base = rollup_moments(moment_series, "1h")
    out = merge_moments(base, base.where("1 = 0"))
    a = sorted(map(tuple, base.select(*out.columns).collect()))
    b = sorted(map(tuple, out.collect()))
    assert a == b


def test_merge_moments_validation(spark, moment_series):
    base = rollup_moments(moment_series, "1h")
    with pytest.raises(ValueError, match="missing"):
        merge_moments(base, base.drop("y_sum2"))


# --------------------------------------------------------------------------
# sax_symbolize
# --------------------------------------------------------------------------

def _series_df(spark, ys, conv="c"):
    n = len(ys)
    return spark.createDataFrame(pd.DataFrame({
        "conv_id": [conv] * n, "channel": ["v"] * n,
        "turn_idx": range(n),
        "ts": pd.date_range("2024-01-01", periods=n, freq="min"),
        "t": [float(i) for i in range(n)],
        "y": [float(y) for y in ys],
    }))


def test_sax_hand_computed_word(spark):
    # 8 points, w=4 → segments of 2; PAA = [5, 150, 250, 350]
    ys = [0, 10, 100, 200, 200, 300, 300, 400]
    out = sax_symbolize(_series_df(spark, ys), 4,
                        [100.0, 200.0, 300.0], "abcd").collect()[0]
    # letters: 5→a, 150→b (100<150, 200≥150), 250→c, 350→d
    assert out["word"] == "abcd"
    assert out["n_segments"] == 4 and out["n_points"] == 8


def test_sax_boundary_equal_not_counted(spark):
    # PAA exactly at a breakpoint: b < paa is strict → stays below
    out = sax_symbolize(_series_df(spark, [100.0, 100.0]), 1,
                        [100.0], "ab").collect()[0]
    assert out["word"] == "a"


def test_sax_short_series(spark):
    # n < w: every point its own segment, n-letter word
    out = sax_symbolize(_series_df(spark, [50.0, 250.0]), 8,
                        [100.0, 200.0, 300.0], "abcd").collect()[0]
    assert out["word"] == "ac"
    assert out["n_segments"] == 2 and out["n_points"] == 2


def test_sax_partitioning_invariance(spark):
    rng = np.random.default_rng(11)
    ys = rng.uniform(0, 400, 37)
    df = _series_df(spark, ys)
    a = sax_symbolize(df.repartition(1), 8, [100.0, 200.0, 300.0],
                      "abcd").collect()[0]["word"]
    b = sax_symbolize(df.repartition(9), 8, [100.0, 200.0, 300.0],
                      "abcd").collect()[0]["word"]
    assert a == b and len(a) == 8


def test_sax_validation(spark):
    df = _series_df(spark, [1.0])
    with pytest.raises(ValueError, match="w must"):
        sax_symbolize(df, 0, [1.0])
    with pytest.raises(ValueError, match="increasing"):
        sax_symbolize(df, 4, [2.0, 1.0])
    with pytest.raises(ValueError, match="alphabet too short"):
        sax_symbolize(df, 4, [1.0, 2.0], "ab")
    with pytest.raises(ValueError, match="alphanumeric"):
        sax_symbolize(df, 4, [1.0], "a'b")


# --------------------------------------------------------------------------
# ewma
# --------------------------------------------------------------------------

def _ewma_ref(x: np.ndarray, alpha: float) -> np.ndarray:
    """The exact pandas adjust=False arithmetic (aggregations.pyx):
    s = ((1−α)·s + α·c) / ((1−α) + α), skipped when s == c. This is
    the recurrence the DuckDB oracle replays — for dyadic alpha the
    divisor is exactly 1.0 and the skip branch is a no-op identity."""
    out = np.empty(len(x))
    s = x[0]
    out[0] = s
    ow, nw = 1.0 - alpha, alpha
    for i in range(1, len(x)):
        c = x[i]
        if s != c:
            s = (ow * s + nw * c) / (ow + nw)
        out[i] = s
    return out


def test_pandas_ewm_matches_scalar_recurrence_bitwise():
    # the pin the oracle depends on: this container's pandas ewm
    # C kernel computes exactly _ewma_ref
    rng = np.random.default_rng(7)
    x = rng.uniform(0, 490, 5000)
    x[100:130] = x[99]                      # equal runs hit the skip
    for alpha in (0.25, 0.5, 0.125):
        got = pd.Series(x).ewm(alpha=alpha, adjust=False).mean().to_numpy()
        ref = _ewma_ref(x, alpha)
        assert np.array_equal(got.view(np.int64), ref.view(np.int64))


def test_dyadic_alpha_identities():
    # for alpha=0.25 the plain recurrence s=0.75s+0.25y (no divide, no
    # skip) is bit-identical to _ewma_ref — the oracle's exact form
    rng = np.random.default_rng(13)
    x = rng.uniform(-1e6, 1e6, 5000)
    x[50:80] = x[49]
    plain = np.empty(len(x))
    s = x[0]
    plain[0] = s
    for i in range(1, len(x)):
        s = 0.75 * s + 0.25 * x[i]
        plain[i] = s
    ref = _ewma_ref(x, 0.25)
    assert np.array_equal(plain.view(np.int64), ref.view(np.int64))


def test_ewma_spark_exact(spark):
    rng = np.random.default_rng(5)
    ys = rng.uniform(0, 490, 60)
    df = _series_df(spark, ys)
    out = (ewma(df, 0.25).orderBy("turn_idx")
           .select("y_smooth").toPandas()["y_smooth"].to_numpy())
    ref = _ewma_ref(ys, 0.25)
    assert np.array_equal(out.view(np.int64), ref.view(np.int64))


def test_ewma_partitioning_invariance(spark):
    rng = np.random.default_rng(6)
    ys = rng.uniform(0, 490, 40)
    df = _series_df(spark, ys)
    a = (ewma(df.repartition(1), 0.25).orderBy("turn_idx")
         .toPandas()["y_smooth"].to_numpy())
    b = (ewma(df.repartition(11), 0.25).orderBy("turn_idx")
         .toPandas()["y_smooth"].to_numpy())
    assert np.array_equal(a.view(np.int64), b.view(np.int64))


def test_ewma_null_rows_dropped(spark):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * 3, "channel": ["v"] * 3, "turn_idx": [0, 1, 2],
        "ts": pd.date_range("2024-01-01", periods=3, freq="min"),
        "t": [0.0, 1.0, 2.0], "y": [1.0, np.nan, 3.0]})
    out = ewma(spark.createDataFrame(pdf), 0.5).orderBy("turn_idx").collect()
    assert [r["turn_idx"] for r in out] == [0, 2]
    assert out[1]["y_smooth"] == 0.5 * 1.0 + 0.5 * 3.0


def test_ewma_validation(spark):
    df = _series_df(spark, [1.0])
    with pytest.raises(ValueError, match="alpha must"):
        ewma(df, 1.5)
    with pytest.raises(ValueError, match="dyadic"):
        ewma(df, 0.3)
    assert ewma(df, 0.3, allow_non_dyadic=True).count() == 1


# --------------------------------------------------------------------------
# acf / seasonal_zscore
# --------------------------------------------------------------------------

def test_acf_matches_numpy_pearson(spark):
    from cesium_spark.operators.seriesstats import acf
    rng = np.random.default_rng(21)
    ys = rng.uniform(0, 100, 50)
    out = acf(_series_df(spark, ys), 3).collect()[0]
    for k in (1, 2, 3):
        ref = np.corrcoef(ys[k:], ys[:-k])[0, 1]
        assert out[f"acf_{k}"] == pytest.approx(ref, rel=1e-9)
    assert out["n"] == 50


def test_acf_periodic_signal_peaks_at_period(spark):
    from cesium_spark.operators.seriesstats import acf
    ys = [float(i % 4) for i in range(48)]       # period 4
    out = acf(_series_df(spark, ys), 4).collect()[0]
    assert out["acf_4"] == pytest.approx(1.0)
    assert out["acf_2"] < 0                       # anti-phase at half period


def test_acf_undefined_cases_are_null(spark):
    from cesium_spark.operators.seriesstats import acf
    const = acf(_series_df(spark, [5.0] * 10), 2).collect()[0]
    # constant series: zero variance → NaN/NULL, never 0
    for k in (1, 2):
        v = const[f"acf_{k}"]
        assert v is None or np.isnan(v)
    short = acf(_series_df(spark, [1.0, 2.0]), 2).collect()[0]
    v = short["acf_2"]                            # no lag-2 pairs
    assert v is None or np.isnan(v)
    with pytest.raises(ValueError, match="max_lag"):
        acf(_series_df(spark, [1.0]), 0)


def test_seasonal_zscore_hand_computed(spark):
    from cesium_spark.operators.seriesstats import seasonal_zscore
    # 9 points at hour 3 (eight 10s and one 100), 3 quiet points at
    # hour 5 — only the 100 fires
    n = 12
    ts = ([pd.Timestamp(2024, 1, d, 3) for d in range(1, 10)]
          + [pd.Timestamp(2024, 1, d, 5) for d in range(1, 4)])
    ys = [10.0] * 8 + [100.0] + [10.0] * 3
    df = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * n, "channel": ["v"] * n, "turn_idx": range(n),
        "ts": ts, "t": [float(i) for i in range(n)], "y": ys}))
    out = seasonal_zscore(df, threshold=2.0, season="hour_of_day").collect()
    assert len(out) == 1
    r = out[0]
    mu, sd = np.mean(ys[:9]), np.std(ys[:9])
    assert r["y"] == 100.0 and r["slot"] == 3 and r["slot_n"] == 9
    assert r["z"] == pytest.approx((100.0 - mu) / sd)
    # zero-variance slots (hour 5) can never fire
    assert all(x["slot"] != 5 for x in out)


def test_seasonal_zscore_validation(spark):
    from cesium_spark.operators.seriesstats import seasonal_zscore
    df = _series_df(spark, [1.0])
    with pytest.raises(ValueError, match="season"):
        seasonal_zscore(df, season="phase_of_moon")
    with pytest.raises(ValueError, match="threshold"):
        seasonal_zscore(df, threshold=0.0)
