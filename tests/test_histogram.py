"""Histogram retention tiers (operators/histogram.py): bucket-edge
semantics, exact integer fold, quantile interpolation vs hand
computation and its bucket-width error bound, parameter validation."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.histogram import (
    bucket_expr,
    fold_histogram,
    histogram_quantile,
    rollup_histogram,
)

EDGES = [1.0, 2.0, 5.0, 10.0]


def _series(spark, values, ts=None):
    n = len(values)
    if ts is None:
        ts = [pd.Timestamp(2024, 1, 1, 0, i % 60, i // 60) for i in range(n)]
    return spark.createDataFrame(pd.DataFrame({
        "conv_id": ["c"] * n, "ts": ts,
        "y": [None if v is None else float(v) for v in values],
    }))


def _counts(df):
    return {(r["window_start"], r["bucket"]): r["cnt"] for r in df.collect()}


def test_bucket_le_semantics(spark):
    """v == edge lands in the LOWER bucket (Prometheus `le`); values
    above the last edge land in the overflow; NULLs are dropped."""
    vals = [0.5, 1.0, 1.0001, 2.0, 5.0, 9.99, 10.0, 10.0001, None]
    df = _series(spark, vals).withColumn("b", bucket_expr("y", EDGES))
    got = [r["b"] for r in df.orderBy("ts").collect()]
    assert got == [0, 0, 1, 1, 2, 3, 3, 4, None]


def test_rollup_counts_and_sparseness(spark):
    vals = [0.5, 0.7, 3.0, 100.0]
    h = rollup_histogram(_series(spark, vals), "1h", ["conv_id"], "y", EDGES)
    rows = {r["bucket"]: r["cnt"] for r in h.collect()}
    # bucket 1 (1<v<=2) unoccupied -> absent, not zero
    assert rows == {0: 2, 2: 1, 4: 1}
    assert h.collect()[0]["tier"] == "1h"


def test_fold_equals_direct_any_parallelism(spark):
    """Folded 1h->1d counts == direct 1d counts, and identical at 1 vs
    8 shuffle partitions (integer addition is bit-stable)."""
    rng = np.random.default_rng(7)
    n = 500
    ts = [pd.Timestamp(2024, 1, 1) + pd.Timedelta(minutes=int(m))
          for m in rng.integers(0, 60 * 72, n)]  # 3 days
    vals = rng.uniform(0, 12, n).round(3)
    df = _series(spark, vals, ts)
    hourly = rollup_histogram(df, "1h", ["conv_id"], "y", EDGES)
    folded = fold_histogram(hourly, "1d", ["conv_id"])
    direct = rollup_histogram(df, "1d", ["conv_id"], "y", EDGES)
    assert _counts(folded) == _counts(direct)

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "1")
        folded1 = fold_histogram(
            rollup_histogram(df.repartition(1), "1h", ["conv_id"], "y",
                             EDGES), "1d", ["conv_id"])
        assert _counts(folded1) == _counts(folded)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_quantile_hand_computed(spark):
    """10 points in (2,5]: rank 0.5*10=5 -> cum_prev=4 (buckets 0-1
    hold 4), cnt=6 in bucket 2 -> est = 2 + 3*(5-4)/6 = 2.5."""
    vals = [0.5, 1.5, 1.6, 1.7] + [3.0] * 6
    h = rollup_histogram(_series(spark, vals), "1d", ["conv_id"], "y", EDGES)
    q = histogram_quantile(h, ["conv_id"], 0.5, EDGES).collect()
    assert len(q) == 1
    assert q[0]["n"] == 10
    assert q[0]["q_est"] == 2.0 + 3.0 * (5.0 - 4.0) / 6.0


def test_quantile_underflow_overflow_clamps(spark):
    lo = histogram_quantile(
        rollup_histogram(_series(spark, [0.1, 0.2, 0.3]), "1d",
                         ["conv_id"], "y", EDGES),
        ["conv_id"], 0.5, EDGES).collect()
    assert lo[0]["q_est"] == EDGES[0]
    hi = histogram_quantile(
        rollup_histogram(_series(spark, [11.0, 12.0, 13.0]), "1d",
                         ["conv_id"], "y", EDGES),
        ["conv_id"], 0.5, EDGES).collect()
    assert hi[0]["q_est"] == EDGES[-1]


def test_quantile_bucket_width_error_bound(spark):
    """|histogram estimate - exact quantile| <= width of the hit bucket
    for interior quantiles on random data (the documented bound)."""
    rng = np.random.default_rng(11)
    vals = rng.uniform(0.01, 9.99, 400)
    h = rollup_histogram(_series(spark, vals), "1d", ["conv_id"], "y", EDGES)
    for q in (0.25, 0.5, 0.9):
        est = histogram_quantile(h, ["conv_id"], q, EDGES).collect()[0]["q_est"]
        exact = float(np.quantile(vals, q))
        widths = {i: EDGES[i] - ([0.0] + EDGES)[i] for i in range(len(EDGES))}
        # hit bucket of the estimate
        b = next(i for i, e in enumerate(EDGES) if est <= e)
        assert abs(est - exact) <= widths[b] + 1e-12, (q, est, exact)


def test_bad_params_raise(spark):
    df = _series(spark, [1.0])
    with pytest.raises(ValueError, match="strictly increasing"):
        rollup_histogram(df, "1h", ["conv_id"], "y", [1.0, 1.0])
    with pytest.raises(ValueError, match="unknown tier"):
        rollup_histogram(df, "7m", ["conv_id"], "y", EDGES)
    with pytest.raises(ValueError, match="can only fold"):
        fold_histogram(df, "1m", ["conv_id"])
    with pytest.raises(ValueError, match="q must be"):
        histogram_quantile(df, ["conv_id"], 1.5, EDGES)
