"""LTTB downsample (operators/downsample.py): kernel selection vs an
independent scalar reference, passthrough, partitioning independence,
NULL handling, validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.downsample import _lttb_select, lttb_downsample


def _lttb_reference(t, y, m):
    """Straight-from-the-thesis scalar implementation (independent of
    the vectorized kernel): explicit triangle areas, python loop."""
    n = len(t)
    if n <= m:
        return list(range(n))
    edges = [1 + (k * (n - 2)) // (m - 2) for k in range(m - 1)]
    keep = [0]
    a = 0
    for k in range(m - 2):
        lo, hi = edges[k], edges[k + 1]
        if k + 1 < m - 2:
            nxt = range(edges[k + 1], edges[k + 2])
            cx = sum(t[i] for i in nxt) / len(nxt)
            cy = sum(y[i] for i in nxt) / len(nxt)
        else:
            cx, cy = t[n - 1], y[n - 1]
        best, best_area = None, -1.0
        for b in range(lo, hi):
            area = abs((t[a] - cx) * (y[b] - y[a])
                       - (t[a] - t[b]) * (cy - y[a]))
            if area > best_area:
                best, best_area = b, area
        keep.append(best)
        a = best
    keep.append(n - 1)
    return keep


def test_kernel_matches_reference():
    rng = np.random.default_rng(3)
    for n, m in ((10, 5), (50, 7), (200, 24), (23, 24), (3, 3)):
        t = np.sort(rng.uniform(0, 100, n))
        y = rng.normal(0, 5, n)
        got = _lttb_select(t, y, m).tolist()
        exp = _lttb_reference(t.tolist(), y.tolist(), m)
        assert got == exp, (n, m)


def test_spike_is_kept():
    """A lone spike has the largest triangle area in its bucket — LTTB
    must keep it (the property M4 lacks between bucket boundaries)."""
    t = np.arange(100, dtype=float)
    y = np.zeros(100)
    y[37] = 50.0
    keep = _lttb_select(t, y, 10)
    assert 37 in keep.tolist()


@pytest.fixture(scope="module")
def series_df(spark):
    rng = np.random.default_rng(5)
    rows = []
    for conv, n in (("a", 100), ("b", 10)):
        t = np.sort(rng.uniform(0, 1000, n))
        y = rng.normal(0, 3, n)
        for i in range(n):
            rows.append((conv, "v", i, float(t[i]), float(y[i])))
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                    "t", "y"]))


def test_distributed_matches_kernel_and_partitioning(spark, series_df):
    out = lttb_downsample(series_df, 12)
    outp = out.toPandas()
    got = {c: sorted(g["turn_idx"].tolist())
           for c, g in outp.groupby("conv_id")}
    pdf = series_df.toPandas()
    for conv, n in (("a", 100), ("b", 10)):
        sub = pdf[pdf.conv_id == conv].sort_values(["t", "turn_idx"])
        exp = _lttb_select(sub["t"].to_numpy(), sub["y"].to_numpy(), 12)
        assert got[conv] == sorted(sub.iloc[exp]["turn_idx"].tolist()), conv
    # partitioning independence
    out7 = lttb_downsample(series_df.repartition(7), 12)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, out7.collect()))


def test_passthrough_and_null_drop(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * 4, "channel": ["v"] * 4,
        "turn_idx": [0, 1, 2, 3],
        "t": [1.0, 2.0, None, 4.0],
        "y": [1.0, None, 3.0, 4.0],
    }))
    rows = lttb_downsample(df, 10).collect()
    assert sorted(r["turn_idx"] for r in rows) == [0, 3]


def test_threshold_validation(spark, series_df):
    with pytest.raises(ValueError, match="threshold must be"):
        lttb_downsample(series_df, 2)
