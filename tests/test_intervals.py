"""Time-window family: trailing RANGE windows, interval containment
join, heartbeat/uptime aggregation, CUSUM changepoints, stratified
sampling. Each operator is pinned against an independent scalar
reference (pure python/pandas loops, no Spark), plus the determinism
properties the docstrings promise (repartition invariance, boundary
semantics, guards)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.operators.intervals import (
    cusum_changepoints,
    heartbeat_uptime,
    interval_join,
    rolling_window,
)
from cesium_spark.operators.sampling import stratified_sample

EPOCH = dt.datetime(2024, 1, 1)


def _series_df(spark, rows):
    """rows: (conv_id, turn_idx, t_seconds, y)."""
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "t", "y"])
    pdf["channel"] = "value"
    pdf["ts"] = pdf["t"].map(lambda s: EPOCH + dt.timedelta(seconds=s))
    return spark.createDataFrame(
        pdf[["conv_id", "channel", "turn_idx", "ts", "t", "y"]])


@pytest.fixture(scope="module")
def rng_series(spark):
    """Two irregular series, 120 points each, deterministic."""
    rng = np.random.default_rng(7)
    rows = []
    for conv in ("a", "b"):
        t = np.sort(rng.uniform(0, 6 * 3600, 120))
        y = rng.normal(10, 3, 120)
        rows += [(conv, i, float(t[i]), float(y[i])) for i in range(120)]
    return _series_df(spark, rows)


# --- rolling_window ---------------------------------------------------------

def _rolling_ref(pdf, span_s):
    out = []
    for conv, g in pdf.groupby("conv_id"):
        g = g.sort_values("t")
        tms = np.floor(g["t"].to_numpy() * 1000 + 0.5).astype(np.int64)
        y = g["y"].to_numpy()
        for i in range(len(g)):
            m = (tms >= tms[i] - span_s * 1000) & (tms <= tms[i])
            out.append((conv, int(g["turn_idx"].iloc[i]),
                        y[m].mean(), y[m].min(), y[m].max(),
                        int(m.sum())))
    return {(c, i): rest for c, i, *rest in out}


def test_rolling_matches_scalar_reference(spark, rng_series):
    got = rolling_window(rng_series, 1800.0).collect()
    ref = _rolling_ref(rng_series.toPandas(), 1800.0)
    assert len(got) == len(ref)
    for r in got:
        em, emin, emax, en = ref[(r["conv_id"], r["turn_idx"])]
        assert r["roll_n"] == en
        assert r["roll_mean"] == pytest.approx(em, rel=1e-12)
        assert r["roll_min"] == emin and r["roll_max"] == emax


def test_rolling_boundary_inclusive_and_ties(spark):
    # points at exactly span_s back are IN the frame; tms ties are
    # RANGE peers (both included regardless of row order)
    rows = [("c", 0, 0.0, 1.0), ("c", 1, 0.0, 3.0),
            ("c", 2, 60.0, 5.0), ("c", 3, 120.0001, 7.0)]
    out = {r["turn_idx"]: r for r in
           rolling_window(_series_df(spark, rows), 60.0).collect()}
    assert out[0]["roll_n"] == 2 and out[1]["roll_n"] == 2  # tie peers
    assert out[2]["roll_n"] == 3          # t=0 is exactly 60s back: in
    # tms(120.0001) = floor(120000.1 + 0.5) = 120000, frame
    # [60000, 120000]: holds t=60 and itself but not the t=0 pair
    assert out[3]["roll_n"] == 2


def test_rolling_repartition_invariant(spark, rng_series):
    a = sorted(map(tuple, rolling_window(rng_series, 900.0)
                   .select("conv_id", "turn_idx", "roll_n").collect()))
    b = sorted(map(tuple,
                   rolling_window(rng_series.repartition(13), 900.0)
                   .select("conv_id", "turn_idx", "roll_n").collect()))
    assert a == b

    with pytest.raises(ValueError):
        rolling_window(rng_series, 0.0)


# --- interval_join ----------------------------------------------------------

def _ts(s):
    return EPOCH + dt.timedelta(seconds=s)


def test_interval_join_vs_bruteforce(spark):
    rng = np.random.default_rng(11)
    pts_rows = [(int(i), _ts(float(s)))
                for i, s in enumerate(np.sort(rng.uniform(0, 48 * 3600,
                                                          400)))]
    iv_rows = [(int(j), _ts(float(lo)), _ts(float(lo + span)))
               for j, (lo, span) in enumerate(zip(
                   rng.uniform(0, 47 * 3600, 25),
                   rng.uniform(600, 5 * 3600, 25)))]
    pts = spark.createDataFrame(pts_rows, "pid long, ts timestamp")
    iv = spark.createDataFrame(iv_rows,
                               "iid long, lo timestamp, hi timestamp")
    got = sorted((r["pid"], r["iid"]) for r in
                 interval_join(pts, iv, bucket_s=1800).collect())
    want = sorted((p, i) for p, ts in pts_rows for i, lo, hi in iv_rows
                  if lo <= ts < hi)
    assert got == want           # exactly once per qualifying pair


def test_interval_join_boundaries_and_keys(spark):
    pts = spark.createDataFrame(
        [("u1", _ts(0.0)), ("u1", _ts(3600.0)), ("u2", _ts(10.0))],
        "user string, ts timestamp")
    iv = spark.createDataFrame([("u1", _ts(0.0), _ts(3600.0))],
                               "user string, lo timestamp, hi timestamp")
    got = interval_join(pts, iv, keys=("user",), bucket_s=600).collect()
    # lo inclusive, hi exclusive, key must match
    assert [(r["user"], r["ts"]) for r in got] == [("u1", _ts(0.0))]


def test_interval_join_span_guard(spark):
    pts = spark.createDataFrame([(_ts(0.0),)], "ts timestamp")
    iv = spark.createDataFrame([(_ts(0.0), _ts(10 * 86400.0))],
                               "lo timestamp, hi timestamp")
    with pytest.raises(Exception, match="max_span_s"):
        interval_join(pts, iv, bucket_s=3600,
                      max_span_s=86400).collect()
    # and the knob can be raised
    assert interval_join(pts, iv, bucket_s=3600,
                         max_span_s=None).count() == 1


# --- heartbeat_uptime -------------------------------------------------------

def test_heartbeat_hand_computed(spark):
    # one series, one day bucket: gaps 100, 4000, (tail)
    rows = [("c", 0, 0.0, 1.0), ("c", 1, 100.0, 1.0),
            ("c", 2, 4100.0, 1.0)]
    out = heartbeat_uptime(_series_df(spark, rows), "1d",
                           heartbeat_s=3600.0).collect()
    assert len(out) == 1
    r = out[0]
    # live: min(100,3600) + min(4000,3600) + 3600 (tail) = 7300
    assert r["live_s"] == pytest.approx(100 + 3600 + 3600)
    assert r["dead_s"] == pytest.approx(400.0)   # 4000 - 3600
    assert r["n_beats"] == 3 and r["n_gaps"] == 1


def test_heartbeat_bucket_attribution(spark):
    # pair straddling midnight: whole gap lands in the EARLIER day
    d1 = 86400.0
    rows = [("c", 0, d1 - 10.0, 1.0), ("c", 1, d1 + 50.0, 1.0)]
    out = {r["bucket"]: r for r in
           heartbeat_uptime(_series_df(spark, rows), "1d",
                            heartbeat_s=3600.0).collect()}
    day0, day1 = dt.datetime(2024, 1, 1), dt.datetime(2024, 1, 2)
    assert out[day0]["live_s"] == pytest.approx(60.0)
    assert out[day1]["live_s"] == pytest.approx(3600.0)  # tail heartbeat
    with pytest.raises(ValueError):
        heartbeat_uptime(_series_df(spark, rows), "7m", 3600.0)
    with pytest.raises(ValueError):
        heartbeat_uptime(_series_df(spark, rows), "1d", 0.0)


# --- cusum_changepoints -----------------------------------------------------

def _cusum_ref(y, k):
    """Textbook recursion — the identity the operator must equal."""
    m, sd = np.mean(y), np.std(y)
    z = (np.asarray(y) - m) / sd
    sp, sn, out = 0.0, 0.0, []
    for zi in z:
        sp = max(0.0, sp + zi - k)
        sn = max(0.0, sn - zi - k)
        out.append((sp, sn))
    return out


def test_cusum_equals_textbook_recursion(spark):
    rng = np.random.default_rng(3)
    y = np.concatenate([rng.normal(0, 1, 60),
                        rng.normal(2.5, 1, 40)])  # level shift at 60
    rows = [("c", i, float(i * 10.0), float(y[i]))
            for i in range(len(y))]
    got = {r["turn_idx"]: (r["s_pos"], r["s_neg"]) for r in
           cusum_changepoints(_series_df(spark, rows), k=0.5,
                              h=4.0).collect()}
    ref = _cusum_ref(y, 0.5)
    want = {i: v for i, v in enumerate(ref) if v[0] > 4.0 or v[1] > 4.0}
    assert set(got) == set(want)
    assert want, "fixture must actually alarm"
    # the shift at i=60 must be detected shortly after
    assert min(i for i in want if i >= 60) < 75
    for i, (sp, sn) in want.items():
        assert got[i][0] == pytest.approx(sp, abs=1e-9)
        assert got[i][1] == pytest.approx(sn, abs=1e-9)


def test_cusum_zero_variance_and_guards(spark, rng_series):
    rows = [("flat", i, float(i), 5.0) for i in range(20)]
    assert cusum_changepoints(_series_df(spark, rows)).count() == 0
    with pytest.raises(ValueError):
        cusum_changepoints(rng_series, k=-1.0)
    with pytest.raises(ValueError):
        cusum_changepoints(rng_series, h=0.0)
    # repartition invariance of the flagged set (grid-snapped)
    a = sorted(map(tuple, cusum_changepoints(
        rng_series, k=0.1, h=1.0, grid_dp=4)
        .select("conv_id", "turn_idx", "s_pos").collect()))
    b = sorted(map(tuple, cusum_changepoints(
        rng_series.repartition(17), k=0.1, h=1.0, grid_dp=4)
        .select("conv_id", "turn_idx", "s_pos").collect()))
    assert a == b and a


# --- stratified_sample ------------------------------------------------------

def test_stratified_sample_properties(spark):
    pdf = pd.DataFrame({
        "doc_id": range(6000),
        "lang": [("en", "de", "zh")[i % 3] for i in range(6000)],
    })
    df = spark.createDataFrame(pdf)
    out = stratified_sample(df, "lang", {"en": 0.5, "de": 0.1},
                            key="doc_id")
    counts = {r["lang"]: r["c"] for r in
              out.groupBy("lang").agg(F.count("*").alias("c")).collect()}
    assert "zh" not in counts                      # absent stratum -> 0
    assert counts["en"] / 2000 == pytest.approx(0.5, abs=0.05)
    assert counts["de"] / 2000 == pytest.approx(0.1, abs=0.05)
    # determinism + nesting: raising a rate yields a superset
    small = {r["doc_id"] for r in out.where("lang = 'de'").collect()}
    big = {r["doc_id"] for r in
           stratified_sample(df.repartition(19), "lang",
                             {"en": 0.5, "de": 0.3}, key="doc_id")
           .where("lang = 'de'").collect()}
    assert small <= big
    # strata are decorrelated: same doc_id hashed under different
    # strata must not be kept in lockstep -> en keep-set at 0.1 differs
    # from de keep-set at 0.1 on shared keys
    en01 = {r["doc_id"] for r in
            stratified_sample(df.withColumn("lang", F.lit("en")),
                              "lang", {"en": 0.1}, key="doc_id").collect()}
    de01 = {r["doc_id"] for r in
            stratified_sample(df.withColumn("lang", F.lit("de")),
                              "lang", {"de": 0.1}, key="doc_id").collect()}
    assert en01 != de01
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {})
    with pytest.raises(ValueError):
        stratified_sample(df, "lang", {"en": 1.5})


# ---------------------------------------------------------------------------
# state_agg
# ---------------------------------------------------------------------------


def test_state_agg_hand_computed(spark):
    from cesium_spark.operators.intervals import state_agg
    rows = [
        # conv a, one day: u holds 0->10, v holds 10->70, u final (0s)
        ("a", 0, dt.datetime(2024, 1, 1, 0, 0, 0), "u"),
        ("a", 1, dt.datetime(2024, 1, 1, 0, 0, 10), "v"),
        ("a", 2, dt.datetime(2024, 1, 1, 0, 1, 10), "u"),
        # conv b: span crosses midnight, attributed to day 1 (earlier
        # turn's bucket, whole)
        ("b", 0, dt.datetime(2024, 1, 1, 23, 59, 30), "x"),
        ("b", 1, dt.datetime(2024, 1, 2, 0, 0, 30), "x"),
        # conv c: NULL state is a kept group
        ("c", 0, dt.datetime(2024, 1, 3, 1, 0, 0), None),
        ("c", 1, dt.datetime(2024, 1, 3, 1, 0, 5), "z"),
    ]
    turns = spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "role"]))
    got = {(r["conv_id"], r["bucket"].day, r["state"]):
           (r["dur_s"], r["n_turns"], r["n_closed"])
           for r in state_agg(turns, "role", "1d").collect()}
    assert got[("a", 1, "u")] == (10.0, 2, 1)
    assert got[("a", 1, "v")] == (60.0, 1, 1)
    assert got[("b", 1, "x")] == (60.0, 1, 1)   # cross-midnight span
    assert got[("b", 2, "x")] == (0.0, 1, 0)    # final turn, open state
    assert got[("c", 3, None)] == (5.0, 1, 1)   # NULL state kept
    assert got[("c", 3, "z")] == (0.0, 1, 0)
    assert len(got) == 6


def test_state_agg_totals_and_partition_invariance(spark, rng_series):
    """Sum of dur_s over all states == observed conv span (last turn
    contributes 0 by definition), at any input partitioning."""
    from cesium_spark.operators.intervals import state_agg
    turns = rng_series.withColumnRenamed("channel", "role") \
        .withColumn("role",
                    F.when(F.col("turn_idx") % 3 == 0, "tool")
                    .otherwise("assistant"))
    out = state_agg(turns, "role", "1d")
    tot = {r["conv_id"]: r["s"] for r in
           out.groupBy("conv_id").agg(F.sum("dur_s").alias("s")).collect()}
    span = {r["conv_id"]: r["s"] for r in
            turns.groupBy("conv_id")
            .agg((F.max(F.col("ts").cast("double"))
                  - F.min(F.col("ts").cast("double"))).alias("s"))
            .collect()}
    for c in span:
        assert tot[c] == pytest.approx(span[c], abs=1e-6)
    a = sorted(map(tuple, out.collect()))
    b = sorted(map(tuple,
                   state_agg(turns.repartition(13), "role", "1d").collect()))
    assert a == b


def test_state_agg_bad_tier(spark, rng_series):
    from cesium_spark.operators.intervals import state_agg
    with pytest.raises(ValueError):
        state_agg(rng_series, "channel", "5m")


# ---------------------------------------------------------------------------
# rolling_quantile
# ---------------------------------------------------------------------------


def test_rolling_quantile_matches_scalar_reference(spark, rng_series):
    from cesium_spark.operators.intervals import rolling_quantile
    got = rolling_quantile(rng_series, 0.9, 7).toPandas()
    for conv, g in got.groupby("conv_id"):
        g = g.sort_values(["t", "turn_idx"])
        y = g["y"].to_numpy()
        for i, rq in enumerate(g["roll_q"].to_numpy()):
            w = y[max(0, i - 6):i + 1]
            assert rq == pytest.approx(
                np.quantile(w, 0.9, method="linear"), abs=1e-12), (conv, i)


def test_rolling_quantile_head_and_validation(spark):
    from cesium_spark.operators.intervals import rolling_quantile
    rows = rolling_quantile(_series_df(
        spark, [("c", i, float(i), float(v))
                for i, v in enumerate([5.0, 1.0, 9.0])]), 0.5, 10).collect()
    by = {r["turn_idx"]: r["roll_q"] for r in rows}
    assert by[0] == 5.0                     # window of one
    assert by[1] == 3.0                     # median of {5,1}
    assert by[2] == 5.0                     # median of {5,1,9}
    with pytest.raises(ValueError):
        rolling_quantile(_series_df(spark, []), 1.5, 5)
    with pytest.raises(ValueError):
        rolling_quantile(_series_df(spark, []), 0.5, 1)
