"""Session-15 operators: Kruskal–Wallis and friends."""
import numpy as np
import pandas as pd
import pytest


def _kw_ref(groups):
    """Literal Kruskal–Wallis with midranks + tie correction."""
    allv = np.concatenate(groups).astype(float)
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    # midranks
    sv = allv[order]
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        ranks[order[i:j + 1]] = (i + j) / 2 + 1
        i = j + 1
    n = len(allv)
    off = 0
    b = 0.0
    for g in groups:
        r = ranks[off:off + len(g)]
        b += r.sum() ** 2 / len(g)
        off += len(g)
    h = 12.0 / (n * (n + 1)) * b - 3.0 * (n + 1)
    _, counts = np.unique(allv, return_counts=True)
    tm = int(np.sum(counts ** 3 - counts))
    corr = 1.0 - tm / (n ** 3 - n)
    return h, h / corr, tm


def _grouped(spark, groups):
    rows = []
    for gi, g in enumerate(groups):
        for v in g:
            rows.append(("c", len(rows), f"g{gi}", int(v)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                      "channel", "y"])
    pdf["turn_idx"] = pdf["turn_idx"].astype(np.int32)
    pdf["y"] = pdf["y"].astype(np.int64)
    return spark.createDataFrame(pdf)


def test_kruskal_matches_ref(spark):
    from cesium_spark.operators.seriesstats import kruskal_wallis
    rng = np.random.RandomState(31)
    groups = [rng.randint(0, 30, 40),          # baseline
              rng.randint(10, 40, 35),         # shifted up
              rng.randint(0, 30, 25)]
    row = kruskal_wallis(_grouped(spark, groups)).collect()[0]
    h, hc, tm = _kw_ref(groups)
    assert row["n"] == 100 and row["k"] == 3
    assert row["tie_mass"] == tm
    assert abs(row["h_stat"] - h) < 1e-9
    assert abs(row["h_corrected"] - hc) < 1e-9
    assert row["h_corrected"] > 9.21            # chi2(2) 1% critical


def test_kruskal_rank_invariant_where_anova_is_not(spark):
    """Inflating the already-maximal value changes NO rank, so H is
    BIT-identical — while the parametric F moves by orders of
    magnitude. The whole point of the rank twin, stated exactly."""
    from cesium_spark.operators.seriesstats import (anova_oneway,
                                                    kruskal_wallis)
    rng = np.random.RandomState(7)
    a = rng.randint(10, 20, 30)
    b = rng.randint(10, 20, 30).astype(np.int64)
    b[0] = 25                                    # unique maximum
    base_h = kruskal_wallis(_grouped(spark, [a, b])).collect()[0]
    base_f = anova_oneway(_grouped(spark, [a, b])).collect()[0]["f_stat"]
    b[0] = 100000                                # same rank, huge value
    whale_h = kruskal_wallis(_grouped(spark, [a, b])).collect()[0]
    whale_f = anova_oneway(_grouped(spark, [a, b])).collect()[0]["f_stat"]
    assert whale_h["h_corrected"] == base_h["h_corrected"]   # bitwise
    assert whale_h["tie_mass"] == base_h["tie_mass"]
    # F is value-sensitive: the whale drags it toward its ~1 saturation
    # point (one outlier dominates both SSB and SSW) — a >30% move,
    # while H did not change a single bit
    assert abs(whale_f - base_f) / base_f > 0.30


def test_kruskal_degenerates(spark):
    from cesium_spark.operators.seriesstats import kruskal_wallis
    # all values identical -> C = 0 -> NULLs, tie_mass = n^3 - n
    row = kruskal_wallis(_grouped(spark, [[5, 5], [5, 5]])).collect()[0]
    assert row["h_stat"] is None and row["h_corrected"] is None
    assert row["tie_mass"] == 4 ** 3 - 4
    # single group -> k < 2 -> NULL
    row = kruskal_wallis(_grouped(spark, [[1, 2, 3]])).collect()[0]
    assert row["k"] == 1 and row["h_stat"] is None
    # float y refuses
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0],
                        "channel": ["a"], "y": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        kruskal_wallis(spark.createDataFrame(pdf))


# --- Ljung-Box --------------------------------------------------------------

def _series15(spark, ys):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(ys),
        "turn_idx": np.arange(len(ys), dtype=np.int32),
        "t": np.arange(len(ys), dtype=np.float64),
        "y": np.asarray(ys, dtype=np.int64)})
    return spark.createDataFrame(pdf)


def _lb_ref(y, m=3):
    y = np.asarray(y, dtype=float)
    n = len(y)
    d = n * y - y.sum()                       # scaled devs (exact form)
    n0 = np.sum(d * d)
    q = 0.0
    rhos = []
    for k in range(1, m + 1):
        rho = np.sum(d[k:] * d[:-k]) / n0
        rhos.append(rho)
        q += rho * rho / (n - k)
    return rhos, n * (n + 2) * q


def test_ljung_box_matches_ref(spark):
    from cesium_spark.operators.seriesstats import ljung_box
    rng = np.random.RandomState(55)
    # AR(1)-ish: strong lag-1 structure -> Q must exceed chi2(3) 1%
    y = [10]
    for _ in range(79):
        y.append(int(round(0.8 * y[-1] + 0.2 * 10 + rng.randint(-2, 3))))
    row = ljung_box(_series15(spark, y)).collect()[0]
    rhos, q = _lb_ref(y)
    assert row["n"] == 80
    for k in (1, 2, 3):
        assert abs(row[f"rho{k}"] - rhos[k - 1]) < 1e-12
    assert abs(row["q_lb"] - q) < 1e-9
    assert row["q_lb"] > 11.34                # chi2(3) 1% critical


def test_ljung_box_white_noise_small(spark):
    from cesium_spark.operators.seriesstats import ljung_box
    rng = np.random.RandomState(4)
    y = rng.randint(0, 100, 200)
    row = ljung_box(_series15(spark, y)).collect()[0]
    _, q = _lb_ref(y)
    assert abs(row["q_lb"] - q) < 1e-9
    assert row["q_lb"] < 11.34                # iid noise stays under


def test_ljung_box_degenerates(spark):
    from cesium_spark.operators.seriesstats import ljung_box
    # constant series: N0 = 0 -> NULL, never "definitely white"
    row = ljung_box(_series15(spark, [5, 5, 5, 5, 5])).collect()[0]
    assert row["q_lb"] is None and row["rho1"] is None
    # n = 3: lag-3 unmeasurable -> NULL
    row = ljung_box(_series15(spark, [1, 2, 3])).collect()[0]
    assert row["q_lb"] is None
