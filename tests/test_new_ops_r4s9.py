"""Round-4 session-9 operators: Wald–Wolfowitz runs-up-and-down test
and Bandt–Pompe permutation entropy (m = 3)."""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators.seriesstats import (
    permutation_entropy,
    runs_test,
)


def _val_series(spark, vals_by_conv):
    rows = []
    for cid, vals in vals_by_conv.items():
        for i, y in enumerate(vals):
            rows.append((cid, "value", i, float(i), y))
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


# --- runs test -------------------------------------------------------------

def _ref_runs(vals):
    """Independent scalar reference: drop zero diffs, count runs."""
    d = np.diff(np.asarray(vals, dtype=float))
    sgn = [1 if x > 0 else -1 for x in d if x != 0]
    n = len(sgn)
    r = 1 + sum(1 for a, b in zip(sgn, sgn[1:]) if a != b) if n else None
    if n < 2:
        return n, r, None
    mu = (2.0 * n + 1.0) / 3.0
    var = (16.0 * n - 13.0) / 90.0
    return n, r, (r - mu) / math.sqrt(var)


def test_runs_matches_scalar_reference(spark):
    rng = np.random.default_rng(77)
    data = {}
    for i in range(20):
        m = int(rng.integers(2, 80))
        v = rng.normal(0, 1, m)
        # plant ties (zero diffs) in half the series
        if i % 2 == 0 and m > 4:
            v[2] = v[1]
            v[m // 2] = v[m // 2 - 1]
        data[f"c{i}"] = list(v)
    out = {r.conv_id: r for r in runs_test(_val_series(spark, data)).collect()}
    for cid, vals in data.items():
        n, r, z = _ref_runs(vals)
        got = out[cid]
        assert got.n_moves == n, cid
        assert got.n_runs == r, cid
        if z is None:
            assert got.z is None
        else:
            assert got.z == pytest.approx(z, rel=1e-12), cid


def test_runs_trend_and_saw(spark):
    data = {
        "ramp": list(np.arange(60.0)),            # monotone: R = 1
        "saw": [float(i % 2) for i in range(60)],  # alternating: R = n
    }
    out = {r.conv_id: r for r in runs_test(_val_series(spark, data)).collect()}
    ramp = out["ramp"]
    assert (ramp.n_moves, ramp.n_runs) == (59, 1)
    assert ramp.z < -8 and ramp.reject_95 is True
    saw = out["saw"]
    assert (saw.n_moves, saw.n_runs) == (59, 59)
    assert saw.z > 6 and saw.reject_95 is True


def test_runs_degenerates_keep_rows(spark):
    data = {
        "const": [5.0] * 10,   # all diffs zero: no moves at all
        "single": [1.0],       # no diff
        "one_move": [1.0, 2.0],  # n = 1: R defined, z not
    }
    out = {r.conv_id: r for r in runs_test(_val_series(spark, data)).collect()}
    c = out["const"]
    assert (c.n_moves, c.n_runs, c.z, c.reject_95) == (0, None, None, None)
    s = out["single"]
    assert (s.n_moves, s.n_runs) == (0, None)
    o = out["one_move"]
    assert (o.n_moves, o.n_runs, o.z) == (1, 1, None)


def test_runs_tie_skipping_is_in_place(spark):
    # up, tie, up  -> retained signs [+1, +1]: ONE run (the tie must
    # not reset adjacency); up, tie, down -> [+1, -1]: two runs.
    out = {r.conv_id: r for r in runs_test(_val_series(spark, {
        "utu": [0.0, 1.0, 1.0, 2.0],
        "utd": [0.0, 1.0, 1.0, 0.5]})).collect()}
    assert (out["utu"].n_moves, out["utu"].n_runs) == (2, 1)
    assert (out["utd"].n_moves, out["utd"].n_runs) == (2, 2)


def test_runs_one_exchange_plan(spark):
    import re
    df = runs_test(_val_series(spark, {"a": [1.0, 2.0, 0.5]}))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan


# --- permutation entropy -----------------------------------------------------

def _ref_perm_entropy(vals):
    """Independent reference via stable argsort pattern extraction."""
    v = np.asarray(vals, dtype=float)
    pats = {}
    for i in range(len(v) - 2):
        w = v[i:i + 3]
        # stable argsort: pattern = tuple of ranks per position
        order = np.argsort(w, kind="stable")
        ranks = np.empty(3, dtype=int)
        ranks[order] = np.arange(3)
        pats[tuple(ranks)] = pats.get(tuple(ranks), 0) + 1
    n = sum(pats.values())
    if n == 0:
        return None, None, None
    h = math.log2(n) - sum(c * math.log2(c) for c in pats.values()) / n
    return n, len(pats), h


def test_perm_entropy_matches_stable_argsort_reference(spark):
    rng = np.random.default_rng(13)
    data = {}
    for i in range(15):
        m = int(rng.integers(3, 120))
        v = rng.normal(0, 1, m)
        if i % 3 == 0 and m > 6:   # plant ties
            v[3] = v[2]
            v[5] = v[4]
        data[f"c{i}"] = list(v)
    out = {r.conv_id: r for r in
           permutation_entropy(_val_series(spark, data)).collect()}
    for cid, vals in data.items():
        n, k, h = _ref_perm_entropy(vals)
        got = out[cid]
        assert got.n_windows == n, cid
        assert got.n_patterns == k, cid
        assert got.h_bits == pytest.approx(h, abs=1e-12), cid
        assert got.h_norm == pytest.approx(h / math.log2(6), abs=1e-12)


def test_perm_entropy_extremes(spark):
    rng = np.random.default_rng(5)
    data = {
        "ramp": list(np.arange(100.0)),          # one pattern: H = 0
        "const": [3.0] * 50,                      # one tie-pattern: H = 0
        "noise": list(rng.normal(0, 1, 2000)),    # ~uniform over 6
    }
    out = {r.conv_id: r for r in
           permutation_entropy(_val_series(spark, data)).collect()}
    assert out["ramp"].n_patterns == 1 and out["ramp"].h_bits == 0.0
    assert out["const"].n_patterns == 1 and out["const"].h_bits == 0.0
    assert out["noise"].n_patterns == 6 and out["noise"].h_norm > 0.99


def test_perm_entropy_monotone_invariance(spark):
    rng = np.random.default_rng(21)
    v = list(rng.normal(0, 1, 200))
    out = {r.conv_id: r for r in permutation_entropy(_val_series(
        spark, {"raw": v, "exp": list(np.exp(v))})).collect()}
    assert out["raw"].h_bits == out["exp"].h_bits
    assert out["raw"].n_patterns == out["exp"].n_patterns


def test_perm_entropy_short_series_drop(spark):
    out = permutation_entropy(_val_series(
        spark, {"two": [1.0, 2.0], "three": [1.0, 3.0, 2.0]})).collect()
    by = {r.conv_id: r for r in out}
    assert "two" not in by            # no complete triple
    assert by["three"].n_windows == 1
