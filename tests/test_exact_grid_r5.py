"""r5: exact-integer-grid paths for counter_rate / heartbeat_uptime /
state_agg (r4 verdict item #2).

The three operators previously summed float seconds / float values —
the only exact-path aggregates violating the §4.3 "no native float
sums" discipline. With grid/t_grid set, increments and spans are int64
lattice units summed exactly and divided back ONCE, so results are
bit-identical across any shuffle-partition count. Pinned here across
shuffle_partitions ∈ {3, 8, 200} plus hand-computed values.
"""

from __future__ import annotations

import pandas as pd
import pytest

from cesium_spark.operators.intervals import heartbeat_uptime, state_agg
from cesium_spark.operators.rates import counter_rate


def _ts(h, m=0, s=0, us=0):
    return pd.Timestamp(2024, 1, 1, h, m, s, us)


def _series_df(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "ts", "t", "y"])
    return spark.createDataFrame(pdf)


@pytest.fixture(scope="module")
def gridded_series(spark):
    # 3 conversations, cent-gridded values incl. a reset, µs-gridded t
    rows = []
    for c in range(3):
        t0 = 0.0
        y = 0.0
        for i in range(40):
            t0 += 7.000001 * (i % 5 + 1) + c          # µs-lattice steps
            if i == 20:
                y = 0.03                              # counter reset
            else:
                y += round(0.01 * ((i * 7 + c) % 13), 2)
            y = round(y, 2)
            rows.append((f"c{c}", "v", i,
                         _ts(0) + pd.Timedelta(seconds=t0), t0, y))
    return _series_df(spark, rows)


def _collect_sorted(df):
    cols = sorted(df.columns)
    return [tuple(r[c] for c in cols)
            for r in sorted(df.select(*cols).collect())]


def _across_partitions(spark, build):
    """Run `build()` under 3 shuffle-partition settings, return results."""
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for n in (3, 8, 200):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            outs.append(_collect_sorted(build()))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    return outs


def test_counter_rate_grid_bit_stable(spark, gridded_series):
    a, b, c = _across_partitions(
        spark, lambda: counter_rate(gridded_series, "1h", grid=100))
    assert a == b == c
    # and the grid path agrees with the float path to 1e-9 here
    f = _collect_sorted(counter_rate(gridded_series, "1h"))
    for rg, rf in zip(a, f):
        for vg, vf in zip(rg, rf):
            if isinstance(vg, float):
                assert vg == pytest.approx(vf, abs=1e-9)
            else:
                assert vg == vf


def test_counter_rate_grid_hand_values(spark):
    s = _series_df(spark, [
        ("c", "v", 0, _ts(0, 0), 0.0, 0.00),
        ("c", "v", 1, _ts(0, 10), 600.0, 5.25),
        ("c", "v", 2, _ts(0, 20), 1200.0, 3.10),   # reset: counts as 3.10
        ("c", "v", 3, _ts(0, 30), 1800.0, 10.00),
    ])
    [r] = counter_rate(s, "1h", grid=100).collect()
    assert r["increase"] == pytest.approx(5.25 + 3.10 + 6.90)
    assert r["n_resets"] == 1 and r["n"] == 3


def test_heartbeat_tgrid_bit_stable(spark, gridded_series):
    a, b, c = _across_partitions(
        spark, lambda: heartbeat_uptime(gridded_series, "1d", 25.0,
                                        t_grid=1_000_000))
    assert a == b == c


def test_heartbeat_tgrid_hand_values(spark):
    rows = [("c", "v", 0, _ts(0), 0.0, 1.0),
            ("c", "v", 1, _ts(0, 1, 40), 100.0, 1.0),
            ("c", "v", 2, _ts(1, 8, 20), 4100.0, 1.0)]
    [r] = heartbeat_uptime(_series_df(spark, rows), "1d", 3600.0,
                           t_grid=1_000_000).collect()
    # live: min(100,3600) + min(4000,3600) + 3600 tail — exact, not approx
    assert r["live_s"] == 100.0 + 3600.0 + 3600.0
    assert r["dead_s"] == 400.0
    assert r["n_beats"] == 3 and r["n_gaps"] == 1


def test_heartbeat_tgrid_microsecond_exact(spark):
    # a 0.5µs-scale float-sum discrepancy cannot arise: spans are int µs
    rows = [("c", "v", 0, _ts(0, 0, 0, 1), 0.000001, 1.0),
            ("c", "v", 1, _ts(0, 0, 0, 4), 0.000004, 1.0),
            ("c", "v", 2, _ts(0, 0, 0, 11), 0.000011, 1.0)]
    [r] = heartbeat_uptime(_series_df(spark, rows), "1d", 0.000005,
                           t_grid=1_000_000).collect()
    # live: min(3,5) + min(7,5) + 5 = 13 µs; dead: (7-5) = 2 µs
    assert r["live_s"] == 13e-6
    assert r["dead_s"] == 2e-6
    assert r["n_gaps"] == 1


def test_state_agg_tgrid_bit_stable(spark):
    rows = []
    for c in range(4):
        for i in range(30):
            rows.append({"conv_id": f"c{c}", "turn_idx": i,
                         "ts": _ts(0) + pd.Timedelta(
                             seconds=i * 13.000007 + c),
                         "role": ["user", "assistant", "tool"][i % 3]})
    turns = spark.createDataFrame(pd.DataFrame(rows))
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    outs = []
    try:
        for n in (3, 8, 200):
            spark.conf.set("spark.sql.shuffle.partitions", str(n))
            outs.append(_collect_sorted(
                state_agg(turns, "role", "1d", t_grid=1_000_000)))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert outs[0] == outs[1] == outs[2]
    # durations: each closed span is exactly 13.000007s (+ none across convs)
    total = sum(r[2] for r in outs[0])  # dur_s col index after sort: check
    cols = sorted(["conv_id", "bucket", "state", "dur_s",
                   "n_turns", "n_closed"])
    di = cols.index("dur_s")
    total = sum(r[di] for r in outs[0])
    assert total == pytest.approx(4 * 29 * 13.000007, abs=1e-6)
