"""Batched cross-window evaluation ≡ per-window compute_features,
BIT-for-bit (the contract functions/batched.py states). Sweeps window
lengths through the numpy pairwise-summation regime change and the
degenerate shapes every feature guards against."""

from __future__ import annotations

import numpy as np
import pytest

from cesium_spark.functions.batched import BATCHABLE, compute_features_matrix
from cesium_spark.functions.registry import compute_features, register_custom

ALL_BATCH = sorted(BATCHABLE)
WITH_FALLBACK = ALL_BATCH + ["med_double_to_single_step",
                             "avg_double_to_single_step",
                             "std_double_to_single_step"]


def _windows(segments: list[np.ndarray], gap: float = 1000.0):
    """Concatenate per-window (t, y, e) segments into the kernel's flat
    sorted-array + boundary representation."""
    ts, ys, es, starts, ends = [], [], [], [], []
    t0 = 0.0
    pos = 0
    for seg in segments:
        t, y, e = seg
        ts.append(t - t[0] + t0)
        ys.append(y)
        es.append(e)
        starts.append(pos)
        pos += t.size
        ends.append(pos)
        t0 = ts[-1][-1] + gap
    return (np.concatenate(ts), np.concatenate(ys), np.concatenate(es),
            np.array(starts), np.array(ends))


def _assert_matrix_equals_loop(t, y, e, starts, ends, feats,
                               meta=None, custom=None):
    metas = [meta] * starts.size if meta is not None else None
    got = compute_features_matrix(t, y, e, starts, ends, feats,
                                  metas=metas, custom=custom)
    for i in range(starts.size):
        exp = compute_features(t[starts[i]:ends[i]], y[starts[i]:ends[i]],
                               e[starts[i]:ends[i]], feats,
                               meta=meta, custom=custom)
        for j, f in enumerate(feats):
            g, x = got[i, j], exp[f]
            assert (g == x) or (np.isnan(g) and np.isnan(x)), (
                f"window {i} (len {ends[i]-starts[i]}) feature {f}: "
                f"{g!r} != {x!r}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_mixed_lengths(seed):
    rng = np.random.default_rng(seed)
    segs = []
    for L in [1, 2, 3, 4, 5, 7, 8, 9, 13, 16, 31, 40, 127, 128, 129, 200]:
        t = np.sort(rng.uniform(0, 60, L))
        y = rng.normal(10, 3, L)
        e = rng.uniform(1e-4, 1e-2, L)
        segs.append((t, y, e))
    _assert_matrix_equals_loop(*_windows(segs), ALL_BATCH)


def test_degenerate_windows():
    segs = [
        # constant values (sigma=0 -> skew/stetson branches)
        (np.array([0.0, 1.0, 2.0]), np.full(3, 5.0), np.full(3, 1e-4)),
        # zero median (percent_amplitude / pdfp nan branches)
        (np.array([0.0, 1.0, 2.0]), np.array([-1.0, 0.0, 1.0]),
         np.full(3, 1e-4)),
        # duplicate timestamps (dt=0 -> inf / 0-over-0 slopes)
        (np.array([0.0, 0.0, 1.0, 1.0]), np.array([1.0, 1.0, 2.0, 3.0]),
         np.full(4, 1e-4)),
        # single point
        (np.array([0.0]), np.array([3.25]), np.array([1e-4])),
        # two points
        (np.array([0.0, 7.0]), np.array([1.0, -2.0]), np.array([1e-4, 2e-3])),
        # zero denominator for flux ratios (all-equal except one)
        (np.arange(5.0), np.array([2.0, 2.0, 2.0, 2.0, 2.0]),
         np.full(5, 1e-4)),
    ]
    _assert_matrix_equals_loop(*_windows(segs), ALL_BATCH)


def test_fallback_features_interleaved():
    """Non-batchable features (d2s family + a custom with meta) route
    through the scalar path but land in the right columns."""
    rng = np.random.default_rng(3)
    segs = [(np.sort(rng.uniform(0, 60, L)), rng.normal(0, 1, L),
             np.full(L, 1e-4)) for L in (1, 3, 6, 20)]
    register_custom("batched_test_span",
                    lambda t, m, e, scale: float(m.max() - m.min()) * scale)
    feats = ["mean", "med_double_to_single_step", "std",
             "batched_test_span", "cad_probs_10"]
    from cesium_spark.functions.registry import custom_snapshot
    _assert_matrix_equals_loop(*_windows(segs), feats,
                               meta={"scale": 2.0},
                               custom=custom_snapshot(feats))


def test_long_window_pairwise_regime():
    """Length 1500 crosses numpy's 128-block pairwise summation —
    mean/std/skew must still match the scalar path bitwise."""
    rng = np.random.default_rng(4)
    L = 1500
    segs = [(np.sort(rng.uniform(0, 6000, L)), rng.normal(5, 2, L),
             rng.uniform(1e-4, 1e-3, L))]
    _assert_matrix_equals_loop(*_windows(segs), ALL_BATCH)
