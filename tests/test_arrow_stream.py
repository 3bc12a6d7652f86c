"""arrow_stream.stream_groups: complete-group streaming with O(B) carry
(the shared core of rollup/encode mapInPandas kernels)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.arrow_stream import stream_groups


def _frames(keys_per_batch):
    """Build sorted batches from [[(g, n_rows), ...], ...] specs."""
    out = []
    v = 0
    for spec in keys_per_batch:
        rows = []
        for g, n in spec:
            for _ in range(n):
                rows.append((g, v))
                v += 1
        out.append(pd.DataFrame(rows, columns=["g", "x"]))
    return out


def _collect(batches):
    """Run stream_groups with an identity-ish emit that records calls."""
    calls = []

    def emit(pdf):
        calls.append(pdf.reset_index(drop=True))
        return pdf

    list(stream_groups(batches, ("g",), emit))
    return calls


def _concat(calls):
    return (pd.concat(calls, ignore_index=True)
            if calls else pd.DataFrame(columns=["g", "x"]))


@pytest.mark.parametrize("spec", [
    [[("a", 3), ("b", 2)], [("b", 0), ("c", 4)]],        # clean boundary
    [[("a", 3), ("b", 2)], [("b", 3), ("c", 1)]],        # split group
    [[("a", 5)], [("a", 5)], [("a", 5)], [("b", 1)]],    # 3-batch group
    [[("a", 1)]],                                        # single group
    [[("a", 2)], [], [("a", 2), ("b", 1)]],              # empty batch mid
])
def test_rows_preserved_and_groups_complete(spec):
    spec = [[(g, n) for g, n in batch if n > 0] for batch in spec]
    batches = _frames(spec)
    expected = pd.concat([b for b in batches if len(b)], ignore_index=True)
    calls = _collect(batches)
    got = _concat(calls)
    pd.testing.assert_frame_equal(got, expected)
    # every emit call contains only whole groups: a group id never
    # appears in two different calls
    seen = {}
    for i, c in enumerate(calls):
        for g in c["g"].unique():
            assert g not in seen, f"group {g} split across calls"
            seen[g] = i


def test_carry_is_linear_not_quadratic():
    """A group spanning B batches must be concatenated once (O(B) total
    row copies), not re-concatenated into every batch (O(B²))."""
    B, rows = 40, 1000
    batches = _frames([[("g", rows)] for _ in range(B)]
                      + [[("tail", 1)]])
    copied = 0
    orig = pd.concat

    def counting_concat(frames, **kw):
        nonlocal copied
        copied += sum(len(f) for f in frames)
        return orig(frames, **kw)

    import cesium_spark.arrow_stream as mod
    old = mod.pd.concat
    mod.pd.concat = counting_concat
    try:
        calls = _collect(batches)
    finally:
        mod.pd.concat = old
    assert _concat(calls)["x"].tolist() == list(range(B * rows + 1))
    # O(B) bound: one concat of B*rows rows (+ the trailing singleton);
    # the old per-batch re-concat would copy ~B²/2 * rows ≈ 800k rows
    assert copied <= B * rows + 10


@pytest.mark.parametrize("bad", [
    # NaN float key in the batch TAIL: v == v[-1] is all-False, the
    # carried tail would be EMPTY and the next batch's
    # carry[-1].iloc[-1] raises IndexError (or the final flush emits an
    # empty frame into a kernel that can't take one)
    [pd.DataFrame({"g": [1.0, float("nan")], "x": [0, 1]}),
     pd.DataFrame({"g": [2.0, 2.0], "x": [2, 3]})],
    # NaT timestamp key mid-batch: NaT != NaT would silently split one
    # logical group into per-row groups (wrong results, no signal)
    [pd.DataFrame({"g": pd.to_datetime([None, None]), "x": [0, 1]})],
    # None object key: Python None == None is True, but the policy is
    # uniform — no nullable group keys at the kernel boundary
    [pd.DataFrame({"g": [None, "a"], "x": [0, 1]})],
])
def test_null_group_keys_rejected(bad):
    def emit(pdf):
        return pdf

    with pytest.raises(ValueError, match="NULL in group-key column"):
        list(stream_groups(bad, ("g",), emit))


def test_meta_collision_guard(spark):
    from cesium_spark.operators.rollup import rollup_features
    s = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c"], "channel": ["value"],
                      "turn_idx": np.array([0], dtype=np.int32),
                      "ts": [pd.Timestamp("2024-01-01")],
                      "t": [0.0], "y": [1.0], "e": [1e-4]}))
    meta = spark.createDataFrame(
        pd.DataFrame({"conv_id": ["c"], "cads": [1.0]}))
    with pytest.raises(ValueError, match="collide with shared kernel"):
        rollup_features(s, "conv", ["mean"], meta=meta)
