"""Round-4 session-10 operators: Pettitt rank changepoint test and
Theil–Sen robust trend."""
from __future__ import annotations

import math
import re

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.seriesstats import pettitt, theil_sen


def _val_series(spark, data):
    """data: conv -> list[y] (t = index) or conv -> (ts, ys)."""
    rows = []
    for cid, vals in data.items():
        if isinstance(vals, tuple):
            ts, ys = vals
        else:
            ts, ys = [float(i) for i in range(len(vals))], vals
        for i, (t, y) in enumerate(zip(ts, ys)):
            rows.append((cid, "value", i, float(t), y))
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


# --- pettitt ---------------------------------------------------------------

def _ref_pettitt(vals):
    """O(n²) sign double-sum brute force — the DEFINITION, not the
    rank identity the engine uses."""
    v = np.asarray(vals, dtype=float)
    n = len(v)
    best = None
    for k in range(1, n):
        u = int(sum(np.sign(v[i] - v[j])
                    for i in range(k) for j in range(k, n)))
        if best is None or abs(u) > best[0]:
            best = (abs(u), k)
    big_k, k = best
    p = min(1.0, 2.0 * math.exp(-6.0 * big_k * big_k / (n ** 3 + n ** 2)))
    dm = float(v[k:].mean() - v[:k].mean())
    return n, k, big_k, p, dm


def test_pettitt_matches_brute_force(spark):
    rng = np.random.default_rng(42)
    data = {}
    for i in range(15):
        m = int(rng.integers(2, 60))
        v = rng.normal(0, 1, m)
        if i % 2 == 0 and m > 6:
            v[m // 2:] += 3.0          # planted level shift
        if i % 3 == 0 and m > 4:
            v[1] = v[0]
            v[3] = v[2]                # planted ties
        data[f"c{i}"] = list(v)
    out = {r.conv_id: r for r in pettitt(_val_series(spark, data)).collect()}
    for cid, vals in data.items():
        n, k, big_k, p, dm = _ref_pettitt(vals)
        g = out[cid]
        assert (g.n, g.k_change, g.K) == (n, k, big_k), cid
        assert g.p_approx == pytest.approx(p, abs=1e-12), cid
        assert g.delta_mean == pytest.approx(dm, abs=1e-9), cid


def test_pettitt_detects_planted_shift(spark):
    rng = np.random.default_rng(7)
    v = list(rng.normal(0, 0.1, 40)) + list(rng.normal(5, 0.1, 60))
    out = pettitt(_val_series(spark, {"a": v})).collect()[0]
    assert out.k_change == 40
    assert out.p_approx < 1e-6
    assert out.delta_mean == pytest.approx(5.0, abs=0.1)
    # a pure-noise series should NOT reject at any sane level
    noise = pettitt(_val_series(
        spark, {"n": list(rng.normal(0, 1, 100))})).collect()[0]
    assert noise.p_approx > 0.01


def test_pettitt_constant_series_k_zero(spark):
    out = pettitt(_val_series(spark, {"c": [2.0] * 20})).collect()[0]
    assert out.K == 0 and out.p_approx == 1.0
    assert out.k_change == 1  # earliest-k tiebreak over all-zero U


def test_pettitt_short_series_drop(spark):
    got = pettitt(_val_series(spark, {"one": [1.0],
                                      "two": [1.0, 5.0]})).collect()
    by = {r.conv_id: r for r in got}
    assert "one" not in by            # no admissible split
    assert by["two"].k_change == 1 and by["two"].K == 1


def test_pettitt_one_exchange_plan(spark):
    df = pettitt(_val_series(spark, {"a": [1.0, 3.0, 2.0]}))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


# --- theil-sen ---------------------------------------------------------------

def _ref_theil_sen(ts, ys):
    sl = [(ys[j] - ys[i]) / (ts[j] - ts[i])
          for i in range(len(ts)) for j in range(i + 1, len(ts))
          if ts[j] > ts[i]]
    if not sl:
        return None, None, 0
    s = float(np.median(sl))
    return s, float(np.median(ys)) - s * float(np.median(ts)), len(sl)


def test_theil_sen_matches_reference_uncapped(spark):
    rng = np.random.default_rng(11)
    data = {}
    for i in range(10):
        m = int(rng.integers(2, 50))
        t = np.sort(rng.uniform(0, 100, m))
        y = 0.7 * t + rng.normal(0, 1, m)
        if i == 1 and m > 2:
            t[1] = t[0]                # duplicate timestamp pair dropped
        data[f"c{i}"] = (list(t), list(y))
    out = {r.conv_id: r for r in
           theil_sen(_val_series(spark, data), max_points=128).collect()}
    for cid, (ts, ys) in data.items():
        s, b, npairs = _ref_theil_sen(ts, ys)
        g = out[cid]
        assert g.capped is False and g.n_pairs == npairs, cid
        if s is None:
            assert g.slope is None
        else:
            assert g.slope == pytest.approx(s, rel=1e-12), cid
            assert g.intercept == pytest.approx(b, rel=1e-9), cid


def test_theil_sen_outlier_robust_where_ols_breaks(spark):
    rng = np.random.default_rng(5)
    t = np.arange(60.0)
    y = 2.0 * t + rng.normal(0, 0.5, 60)
    y[10] = 1e7                        # single spiked turn
    out = theil_sen(_val_series(spark, {"a": (list(t), list(y))}),
                    max_points=128).collect()[0]
    assert out.slope == pytest.approx(2.0, abs=0.05)
    ols = np.polyfit(t, y, 1)[0]       # OLS is destroyed by the spike
    assert abs(ols - 2.0) > 100


def test_theil_sen_thinning_cap(spark):
    rng = np.random.default_rng(9)
    m = 300
    t = np.arange(float(m))
    y = -1.5 * t + rng.normal(0, 1, m)
    out = theil_sen(_val_series(spark, {"a": (list(t), list(y))}),
                    max_points=64).collect()[0]
    assert out.capped is True and out.n == m
    assert out.n_used == 64      # slot thinning uses the FULL budget
    assert out.n_pairs == out.n_used * (out.n_used - 1) // 2
    assert out.slope == pytest.approx(-1.5, abs=0.05)
    # thinning is deterministic: stride arithmetic, same result again
    out2 = theil_sen(_val_series(spark, {"a": (list(t), list(y))}),
                     max_points=64).collect()[0]
    assert out2.slope == out.slope and out2.n_used == out.n_used


def test_theil_sen_thinning_keeps_full_budget_just_above_cap(spark):
    # n = max_points + 1 must still use max_points points (the old
    # ceil-stride rule collapsed to ~half the budget here)
    rng = np.random.default_rng(14)
    for m in (65, 129):
        t = np.arange(float(m))
        y = 0.3 * t + rng.normal(0, 0.1, m)
        out = theil_sen(_val_series(spark, {"a": (list(t), list(y))}),
                        max_points=64).collect()[0]
        assert out.n_used == 64, m


def test_theil_sen_all_equal_times_null_slope(spark):
    out = theil_sen(_val_series(
        spark, {"a": ([3.0, 3.0, 3.0], [1.0, 2.0, 5.0])})).collect()[0]
    assert out.n_pairs == 0 and out.slope is None and out.intercept is None


def test_theil_sen_validation(spark):
    with pytest.raises(ValueError, match="max_points"):
        theil_sen(_val_series(spark, {"a": [1.0, 2.0]}), max_points=1)


# --- sax motifs / discords ----------------------------------------------------

def _ref_motifs(vals, k=4, bps=(-1.0, 0.0, 1.0), alpha="abcdefghijklmnop"):
    from collections import Counter
    letters = [alpha[sum(1 for b in bps if b < round(v, 6))]
               for v in vals]
    words = ["".join(letters[i:i + k])
             for i in range(len(letters) - k + 1)]
    if not words:
        return None
    c = Counter(words)
    first = {}
    for i, w in enumerate(words):
        first.setdefault(w, i)
    motif = min(c.items(), key=lambda kv: (-kv[1], kv[0]))
    disc = min(c.items(), key=lambda kv: (kv[1], kv[0]))
    return (len(words), motif[0], motif[1], first[motif[0]],
            disc[0], disc[1], first[disc[0]])


def test_sax_motifs_matches_scalar_reference(spark):
    from cesium_spark.operators.downsample import sax_motifs
    rng = np.random.default_rng(17)
    data = {f"c{i}": list(rng.normal(0, 1.2, int(rng.integers(2, 120))))
            for i in range(15)}
    data["motify"] = ([0.5, -0.5, 1.5, -1.5] * 10) + [0.1, 2.0, -2.0]
    out = {r.conv_id: r for r in
           sax_motifs(_val_series(spark, data)).collect()}
    for cid, vals in data.items():
        r = _ref_motifs(vals)
        if r is None:
            assert cid not in out   # < k points: no word
            continue
        g = out[cid]
        assert (g.n_words, g.motif_word, g.motif_count, g.motif_pos,
                g.discord_word, g.discord_count, g.discord_pos) == r, cid
    # the planted repeating shape IS the motif, found in the first cycle
    assert out["motify"].motif_count == 10
    assert out["motify"].motif_pos <= 3


def test_sax_motifs_tiebreaks_and_plan(spark):
    import re
    from cesium_spark.operators.downsample import sax_motifs
    # two words occur once each: both rankings must pick the
    # LEXICOGRAPHICALLY smaller word deterministically
    df = sax_motifs(_val_series(spark, {"a": [-2.0, -2.0, -2.0, -2.0,
                                              2.0, 2.0, 2.0, 2.0]}),
                    k=4)
    # plan BEFORE execution: the AQE executed-plan string after an
    # action prints Final AND Initial sections, double-counting
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1
    row = df.collect()[0]
    assert row.n_words == 5
    # letters a,a,a,a,d,d,d,d -> words aaaa, aaad, aadd, addd, dddd
    # (one each): tie on count=1 -> lexicographically smallest both ways
    assert row.motif_word == "aaaa" and row.discord_word == "aaaa"

    with pytest.raises(ValueError, match="k must be"):
        sax_motifs(_val_series(spark, {"a": [1.0]}), k=1)


# --- cross-series correlation search ----------------------------------------

def _ts_series(spark, data, start="2024-01-01"):
    """conv -> list of per-DAY values (one point per day)."""
    base = pd.Timestamp(start)
    rows = []
    for cid, vals in data.items():
        for i, y in enumerate(vals):
            rows.append((cid, "value", i, base + pd.Timedelta(days=i),
                         float(i), y))
    return spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "channel", "turn_idx", "ts", "t", "y"]))


def test_corr_pairs_finds_planted_pair(spark):
    from cesium_spark.operators.seriesstats import cross_series_corr
    rng = np.random.default_rng(23)
    base = list(rng.normal(0, 1, 40))
    data = {
        "x1": base,
        "x2": [2.0 * v + 1.0 for v in base],          # r = +1 with x1
        "x3": [-v for v in base],                      # r = -1 with x1
        "n1": list(rng.normal(0, 1, 40)),
        "n2": list(rng.normal(0, 1, 40)),
        "const": [5.0] * 40,                           # degenerate
    }
    out = cross_series_corr(_ts_series(spark, data),
                            min_overlap=10, top_k=5).collect()
    top = out[0]
    assert (top.conv_a, top.conv_b) == ("x1", "x2")
    assert top.r == 1.0 and top.n_days == 40
    names = {(r.conv_a, r.conv_b) for r in out}
    assert not any("const" in p for pair in names for p in pair)


def test_corr_pairs_min_overlap_excludes_short(spark):
    from cesium_spark.operators.seriesstats import cross_series_corr
    rng = np.random.default_rng(2)
    data = {"a": list(rng.normal(0, 1, 8)),
            "b": list(rng.normal(0, 1, 8))}   # only 8 shared days
    out = cross_series_corr(_ts_series(spark, data),
                            min_overlap=10).collect()
    assert out == []


def test_corr_pairs_validation(spark):
    from cesium_spark.operators.seriesstats import cross_series_corr
    df = _ts_series(spark, {"a": [1.0, 2.0]})
    with pytest.raises(ValueError, match="min_overlap"):
        cross_series_corr(df, min_overlap=2)
    with pytest.raises(ValueError, match="top_k"):
        cross_series_corr(df, top_k=0)
