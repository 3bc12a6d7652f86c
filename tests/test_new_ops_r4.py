"""Round-4 session-2 operators: as-of join, interpolation gap-fill,
M4 downsample, counter rate, quantile rollup — hand-computed exact
values plus determinism/validation edges."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.asof import asof_join
from cesium_spark.operators.downsample import m4_downsample
from cesium_spark.operators.gapfill import gapfill
from cesium_spark.operators.rates import counter_rate
from cesium_spark.operators.rollup import rollup_quantiles


def _ts(h, m=0, s=0):
    return pd.Timestamp(2024, 1, 1, h, m, s)


# --------------------------------------------------------------------------
# asof_join
# --------------------------------------------------------------------------

@pytest.fixture(scope="module")
def asof_frames(spark):
    left = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1, 2],
        "ts": [_ts(0, 0, 10), _ts(0, 0, 20), _ts(0, 0, 30), _ts(0, 0, 10)],
        "lv": [100.0, 200.0, 300.0, 400.0],
    }))
    right = spark.createDataFrame(pd.DataFrame({
        "k": [1, 1, 1],
        "ts": [_ts(0, 0, 5), _ts(0, 0, 20), _ts(0, 0, 25)],
        "rv": ["a", "b", "c"],
    }))
    return left, right


def _rows(df):
    return {(r["k"], r["ts"].second): r for r in df.collect()}


def test_asof_backward_with_tie_and_no_match(spark, asof_frames):
    left, right = asof_frames
    out = _rows(asof_join(left, right, on=["k"], ts="ts", values=["rv"],
                          matched_ts_col="mts"))
    assert out[(1, 10)]["rv"] == "a"
    assert out[(1, 20)]["rv"] == "b"          # equal ts matches (>=)
    assert out[(1, 20)]["mts"].second == 20
    assert out[(1, 30)]["rv"] == "c"
    assert out[(2, 10)]["rv"] is None          # key with no right rows
    assert out[(2, 10)]["mts"] is None
    assert len(out) == 4                       # left join: every left row


def test_asof_forward(spark, asof_frames):
    left, right = asof_frames
    out = _rows(asof_join(left, right, on=["k"], ts="ts", values=["rv"],
                          direction="forward"))
    assert out[(1, 10)]["rv"] == "b"           # earliest at-or-after (20)
    assert out[(1, 20)]["rv"] == "b"           # equal ts matches (<=)
    assert out[(1, 30)]["rv"] is None          # nothing after 30
    assert out[(2, 10)]["rv"] is None


def test_asof_tolerance(spark, asof_frames):
    left, right = asof_frames
    out = _rows(asof_join(left, right, on=["k"], ts="ts", values=["rv"],
                          tolerance=5.0, matched_ts_col="mts"))
    assert out[(1, 10)]["rv"] == "a"           # gap 5 <= 5 kept
    assert out[(1, 30)]["rv"] == "c"           # gap 5 <= 5 kept
    out4 = _rows(asof_join(left, right, on=["k"], ts="ts", values=["rv"],
                           tolerance=4.0))
    assert out4[(1, 10)]["rv"] is None         # gap 5 > 4 nulled
    assert out4[(1, 20)]["rv"] == "b"          # gap 0
    assert out4[(1, 30)]["rv"] is None


def test_asof_validation(spark, asof_frames):
    left, right = asof_frames
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right.withColumnRenamed("rv", "lv"),
                  on=["k"], ts="ts", values=["lv"])
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on=["k"], ts="ts", values=["rv"],
                  direction="nearest")


def test_asof_partitioning_independent(spark, asof_frames):
    left, right = asof_frames
    a = asof_join(left, right, on=["k"], ts="ts", values=["rv"])
    b = asof_join(left.repartition(7), right.repartition(3),
                  on=["k"], ts="ts", values=["rv"])
    assert sorted(map(str, a.collect())) == sorted(map(str, b.collect()))


# --------------------------------------------------------------------------
# gapfill interp
# --------------------------------------------------------------------------

def _series_df(spark, rows):
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "channel", "turn_idx", "ts", "t", "y"]))


def test_gapfill_interp_linear(spark):
    s = _series_df(spark, [
        ("c1", "v", 0, _ts(0), 0.0, 1.0),
        ("c1", "v", 1, _ts(3), 3.0, 4.0),   # 2-hour hole between
        ("c2", "v", 0, _ts(5), 0.0, 9.0),   # singleton: no holes
    ])
    out = {(r["conv_id"], r["bucket"].hour): (r["y"], r["filled"])
           for r in gapfill(s, "1h", policy="interp").collect()}
    assert out[("c1", 0)] == (1.0, False)
    assert out[("c1", 1)] == (2.0, True)    # 1 + (4-1) * 1/3
    assert out[("c1", 2)] == (3.0, True)
    assert out[("c1", 3)] == (4.0, False)
    assert out[("c2", 5)] == (9.0, False)
    assert len(out) == 5


def test_gapfill_interp_uneven_spacing(spark):
    # observed at hours 0 and 4 with y 10 → 2: hour 3 = 10 + (-8)*(3/4)
    s = _series_df(spark, [
        ("c", "v", 0, _ts(0), 0.0, 10.0),
        ("c", "v", 1, _ts(4), 4.0, 2.0),
    ])
    out = {r["bucket"].hour: r["y"]
           for r in gapfill(s, "1h", policy="interp").collect()}
    assert out[1] == pytest.approx(8.0)
    assert out[2] == pytest.approx(6.0)
    assert out[3] == pytest.approx(4.0)


# --------------------------------------------------------------------------
# m4_downsample
# --------------------------------------------------------------------------

def test_m4_basic_and_tie_break(spark):
    s = _series_df(spark, [
        ("c", "v", 0, _ts(0, 0), 0.0, 3.0),
        ("c", "v", 1, _ts(0, 10), 600.0, 1.0),
        ("c", "v", 2, _ts(0, 20), 1200.0, 4.0),
        ("c", "v", 3, _ts(0, 30), 1800.0, 1.0),
        ("c", "v", 4, _ts(0, 40), 2400.0, 5.0),
        # duplicate-t bucket: struct(t, turn_idx) breaks the tie
        ("d", "v", 0, _ts(1, 0), 0.0, 7.0),
        ("d", "v", 1, _ts(1, 0), 0.0, 9.0),
    ])
    out = {r["conv_id"]: r for r in m4_downsample(s, "1h").collect()}
    c = out["c"]
    assert (c["y_min"], c["y_max"], c["y_first"], c["y_last"], c["n"]) == \
        (1.0, 5.0, 3.0, 5.0, 5)
    assert (c["t_first"], c["t_last"]) == (0.0, 2400.0)
    d = out["d"]
    assert (d["y_first"], d["y_last"]) == (7.0, 9.0)


def test_m4_partitioning_independent(spark):
    rng = np.random.default_rng(7)
    n = 500
    ts0 = pd.Timestamp(2024, 1, 1).value
    pdf = pd.DataFrame({
        "conv_id": (rng.integers(0, 9, n)).astype(str),
        "channel": "v",
        "turn_idx": np.arange(n),
        "ts": pd.to_datetime(ts0 + rng.integers(0, 3 * 3600, n) * 10 ** 9),
        "t": rng.uniform(0, 1e4, n),
        "y": rng.normal(0, 1, n),
    })
    s = spark.createDataFrame(pdf)
    a = sorted(map(str, m4_downsample(s, "1h").collect()))
    b = sorted(map(str, m4_downsample(s.repartition(13), "1h").collect()))
    assert a == b


# --------------------------------------------------------------------------
# counter_rate
# --------------------------------------------------------------------------

def test_counter_rate_reset_semantics(spark):
    s = _series_df(spark, [
        ("c", "v", 0, _ts(0, 0), 0.0, 0.0),
        ("c", "v", 1, _ts(0, 10), 600.0, 5.0),
        ("c", "v", 2, _ts(0, 20), 1200.0, 3.0),   # reset: counts as 3
        ("c", "v", 3, _ts(0, 30), 1800.0, 10.0),
    ])
    [r] = counter_rate(s, "1h").collect()
    assert r["increase"] == 15.0                    # 5 + 3 + 7
    assert r["rate_per_s"] == pytest.approx(15.0 / 3600.0)
    assert r["n_resets"] == 1
    assert r["n"] == 3                              # head point excluded


def test_counter_rate_cross_bucket_delta(spark):
    # predecessor in the previous hour still defines the increase
    s = _series_df(spark, [
        ("c", "v", 0, _ts(0, 59), 0.0, 100.0),
        ("c", "v", 1, _ts(1, 1), 120.0, 130.0),
    ])
    out = {r["bucket"].hour: r for r in counter_rate(s, "1h").collect()}
    assert list(out) == [1]                         # hour 0 has only a head
    assert out[1]["increase"] == 30.0


def test_counter_rate_bad_tier(spark):
    s = _series_df(spark, [("c", "v", 0, _ts(0), 0.0, 0.0)])
    with pytest.raises(ValueError, match="tier"):
        counter_rate(s, "5s")


# --------------------------------------------------------------------------
# rollup_quantiles
# --------------------------------------------------------------------------

def test_quantiles_exact_matches_numpy(spark):
    rng = np.random.default_rng(11)
    y = rng.normal(50, 10, 200)
    s = _series_df(spark, [
        ("c", "v", i, _ts(0, 0, 0) + pd.Timedelta(seconds=int(i)),
         float(i), float(v)) for i, v in enumerate(y)])
    [r] = rollup_quantiles(s, "1h", qs=(0.5, 0.95, 0.99)).collect()
    exp = np.percentile(y, [50, 95, 99], method="linear")
    assert r["p50"] == pytest.approx(exp[0], abs=1e-9)
    assert r["p95"] == pytest.approx(exp[1], abs=1e-9)
    assert r["p99"] == pytest.approx(exp[2], abs=1e-9)
    assert r["n"] == 200


def test_quantiles_approx_bounded_rank_error(spark):
    rng = np.random.default_rng(12)
    n = 2000
    y = np.sort(rng.uniform(0, 1000, n))
    s = _series_df(spark, [
        ("c", "v", i, _ts(0, 0, 0) + pd.Timedelta(seconds=int(i % 3600)),
         float(i), float(v)) for i, v in enumerate(y)])
    acc = 100
    [r] = rollup_quantiles(s, "1h", qs=(0.5, 0.95), approx=True,
                           accuracy=acc).collect()
    for q, col in ((0.5, "p50"), (0.95, "p95")):
        rank = np.searchsorted(y, r[col])
        # GK guarantee: rank error <= n/accuracy (+slack for edges)
        assert abs(rank - q * n) <= n / acc + 2, (q, rank)


def test_quantiles_validation(spark):
    s = _series_df(spark, [("c", "v", 0, _ts(0), 0.0, 0.0)])
    with pytest.raises(ValueError, match="tier"):
        rollup_quantiles(s, "2h")
    with pytest.raises(ValueError, match="quantiles"):
        rollup_quantiles(s, "1h", qs=(1.5,))


# --------------------------------------------------------------------------
# HLL distinct-count tier fold
# --------------------------------------------------------------------------

def test_hll_fold_equals_direct_and_near_exact(spark):
    from cesium_spark.operators.fold import (
        fold_distinct_sketches,
        rollup_distinct_sketches,
    )
    from pyspark.sql import functions as SF
    rng = np.random.default_rng(3)
    n = 3000
    ts0 = pd.Timestamp(2024, 1, 1).value
    pdf = pd.DataFrame({
        "conv_id": (rng.integers(0, 5, n)).astype(str),
        "ts": pd.to_datetime(ts0 + rng.integers(0, 48 * 3600, n) * 10 ** 9),
        "props": [f"v{v}" for v in rng.integers(0, 400, n)],
    })
    df = spark.createDataFrame(pdf)
    hourly = rollup_distinct_sketches(df, "1h", ["conv_id"], "props")
    folded = fold_distinct_sketches(hourly, "1d", ["conv_id"])
    direct = (rollup_distinct_sketches(df, "1d", ["conv_id"], "props")
              .select("conv_id", "window_start",
                      SF.hll_sketch_estimate("sketch").cast("long")
                      .alias("direct_est")))
    exact = (df.withColumn("window_start",
                           SF.date_trunc("day", SF.col("ts")))
             .groupBy("conv_id", "window_start")
             .agg(SF.countDistinct("props").alias("exact")))
    j = (folded.join(direct, ["conv_id", "window_start"])
         .join(exact, ["conv_id", "window_start"])).collect()
    assert len(j) == 10  # 5 convs x 2 days
    for r in j:
        # sketch-union algebra: folding hourly == sketching daily
        assert r["distinct_est"] == r["direct_est"], r
        assert abs(r["distinct_est"] - r["exact"]) <= 0.05 * r["exact"], r


def test_hll_fold_partitioning_independent(spark):
    from cesium_spark.operators.fold import (
        fold_distinct_sketches,
        rollup_distinct_sketches,
    )
    rng = np.random.default_rng(4)
    n = 1000
    ts0 = pd.Timestamp(2024, 1, 1).value
    pdf = pd.DataFrame({
        "conv_id": "c", "ts": pd.to_datetime(
            ts0 + rng.integers(0, 24 * 3600, n) * 10 ** 9),
        "props": [f"v{v}" for v in rng.integers(0, 200, n)],
    })
    df = spark.createDataFrame(pdf)

    def est(d):
        h = rollup_distinct_sketches(d, "1h", ["conv_id"], "props")
        return {(r["conv_id"], r["window_start"]): r["distinct_est"]
                for r in fold_distinct_sketches(
                    h, "1d", ["conv_id"]).collect()}

    assert est(df) == est(df.repartition(17))


def test_hll_fold_validation(spark):
    from cesium_spark.operators.fold import rollup_distinct_sketches
    df = spark.createDataFrame(pd.DataFrame(
        {"conv_id": ["c"], "ts": [_ts(0)], "props": ["x"]}))
    with pytest.raises(ValueError, match="tier"):
        rollup_distinct_sketches(df, "2h", ["conv_id"], "props")
