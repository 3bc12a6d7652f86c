"""Engine ≡ oracle bit-for-bit (SURVEY.md §5.2 layer 2).

The pandas oracle below independently re-derives series and windows from
the raw transcripts (same pinned semantics: cast-to-double epoch
seconds, UTC date_trunc, np.diff latency, whitespace tokens) and calls
the same numpy kernels one group at a time. The Spark rollup must equal
it to the last bit — and must be invariant to input partitioning
(repartition(1) vs repartition(13) on a non-key column), which is the
in-process proof of the N-vs-4N determinism claim (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.functions.registry import compute_features
from cesium_spark.operators.derive import derive_series
from cesium_spark.operators.rollup import rollup_features, rollup_moments, moments_derived

FEATS = [
    "n_epochs", "mean", "maximum", "minimum", "amplitude", "std", "skew",
    "median", "percent_beyond_1_std", "weighted_average",
    "median_absolute_deviation", "stetson_j", "stetson_k",
    "cads_avg", "cads_med", "cads_std", "cad_probs_10", "cad_probs_100",
    "total_time", "max_slope",
]


def oracle_series(transcripts_pdf: pd.DataFrame) -> pd.DataFrame:
    """Independent pandas derivation of series(conv, channel, ...)."""
    rows = []
    for conv_id, g in transcripts_pdf.groupby("conv_id", sort=True):
        g = g.sort_values(["turn_idx", "ts"], kind="stable")
        # Spark cast(timestamp as double) == micros / 1e6
        sec = g["ts"].to_numpy("datetime64[us]").view("int64") / 1e6
        t = sec - sec.min()
        tokens = g["text"].str.strip().str.split(r"\s+").str.len().astype(float)
        tool_rate = g["tool"].notna().astype(float)
        lat = np.diff(sec)
        n = len(g)
        for ch, idx, y in (
            ("latency", g["turn_idx"].to_numpy()[1:], lat),
            ("tokens", g["turn_idx"].to_numpy(), tokens.to_numpy()),
            ("tool_rate", g["turn_idx"].to_numpy(), tool_rate.to_numpy()),
        ):
            tt = t[1:] if ch == "latency" else t
            ts = g["ts"].to_numpy()[1:] if ch == "latency" else g["ts"].to_numpy()
            rows.append(pd.DataFrame({
                "conv_id": conv_id, "channel": ch, "turn_idx": idx,
                "ts": ts, "t": tt, "y": y, "e": 1e-4,
            }))
    return pd.concat(rows, ignore_index=True)


def oracle_rollup(series_pdf: pd.DataFrame, tier_freq: str,
                  feats: list[str]) -> pd.DataFrame:
    out = []
    ws = series_pdf["ts"].dt.floor(tier_freq)
    for (conv, ch, w0), g in series_pdf.groupby(
            ["conv_id", "channel", ws], sort=True):
        g = g.sort_values("turn_idx", kind="stable")
        vals = compute_features(g["t"].to_numpy(), g["y"].to_numpy(),
                                g["e"].to_numpy(), feats)
        for f, v in vals.items():
            out.append((conv, ch, w0, f, v))
    return pd.DataFrame(out, columns=["conv_id", "channel", "window_start",
                                      "feature", "value"])


@pytest.fixture(scope="module")
def oracle(tiny_transcripts_pdf):
    s = oracle_series(tiny_transcripts_pdf)
    return oracle_rollup(s, "h", FEATS)


def _spark_rollup_pdf(spark, transcripts, repartition_n: int) -> pd.DataFrame:
    tr = transcripts.repartition(repartition_n)  # round-robin: worst case
    got = (
        rollup_features(derive_series(tr), "1h", FEATS)
        .select("conv_id", "channel", "window_start", "feature", "value")
        .toPandas()
    )
    return got.sort_values(["conv_id", "channel", "window_start", "feature"],
                           kind="stable").reset_index(drop=True)


def _assert_bitwise_equal(got: pd.DataFrame, exp: pd.DataFrame):
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(
        got[["conv_id", "channel", "feature"]],
        exp[["conv_id", "channel", "feature"]], check_dtype=False)
    gw = got["window_start"].to_numpy("datetime64[us]")
    ew = exp["window_start"].to_numpy("datetime64[us]")
    np.testing.assert_array_equal(gw, ew)
    gv = got["value"].to_numpy()
    ev = exp["value"].to_numpy()
    both_nan = np.isnan(gv) & np.isnan(ev)
    # BIT equality, not approx: the determinism contract
    assert np.array_equal(gv[~both_nan], ev[~both_nan]), (
        "bitwise mismatch: %s" %
        got[~both_nan][gv[~both_nan] != ev[~both_nan]].head())


def test_rollup_matches_oracle_bitwise(spark, tiny_transcripts, oracle):
    exp = oracle.sort_values(
        ["conv_id", "channel", "window_start", "feature"],
        kind="stable").reset_index(drop=True)
    got = _spark_rollup_pdf(spark, tiny_transcripts, 2)
    _assert_bitwise_equal(got, exp)


def test_rollup_partition_independent(spark, tiny_transcripts, oracle):
    """Same result under adversarial repartitioning — the in-process
    stand-in for identical output at N vs 4N executors."""
    exp = oracle.sort_values(
        ["conv_id", "channel", "window_start", "feature"],
        kind="stable").reset_index(drop=True)
    for n in (1, 13):
        got = _spark_rollup_pdf(spark, tiny_transcripts, n)
        _assert_bitwise_equal(got, exp)


def test_conv_tier_full_series(spark, tiny_transcripts, tiny_transcripts_pdf):
    """Whole-conversation rollup equals per-conv kernel on full series."""
    s = oracle_series(tiny_transcripts_pdf)
    feats = ["n_epochs", "std", "freq1_freq", "period_fast"]
    got = (
        rollup_features(derive_series(tiny_transcripts), "conv", feats)
        .toPandas()
        .set_index(["conv_id", "channel", "feature"])["value"]
    )
    for (conv, ch), g in s.groupby(["conv_id", "channel"], sort=True):
        g = g.sort_values("turn_idx", kind="stable")
        vals = compute_features(g["t"].to_numpy(), g["y"].to_numpy(),
                                g["e"].to_numpy(), feats)
        for f, v in vals.items():
            gv = got.loc[(conv, ch, f)]
            assert (gv == v) or (np.isnan(gv) and np.isnan(v)), (conv, ch, f, gv, v)


def test_meta_features_through_spark(spark, tiny_transcripts,
                                     tiny_transcripts_pdf):
    """cesium meta_features parity through the DISTRIBUTED path
    (mirrors cesium/tests/test_featurize.py meta passthrough †): dims
    are consumed inside the applyInPandas kernel by a graph-dep custom
    feature (custom_snapshot ships the callable to executors) AND
    joined onto the output matrix by with_meta."""
    import pyspark.sql.functions as F

    from cesium_spark.functions.registry import register_custom
    from cesium_spark.operators.rollup import pivot_wide, with_meta

    meta_pdf = (tiny_transcripts_pdf.groupby("conv_id")
                .agg(n_turns=("turn_idx", "size"),
                     label=("conv_id", lambda s: len(s.iloc[0]) % 3))
                .reset_index())
    meta = spark.createDataFrame(meta_pdf)
    register_custom(
        "spread_per_turn",
        lambda t, m, e, n_turns: float(np.max(m) - np.min(m)) / n_turns)

    feats = ["maximum", "minimum", "spread_per_turn"]
    s = derive_series(tiny_transcripts).where(F.col("channel") == "tokens")
    wide = with_meta(pivot_wide(rollup_features(s, "conv", feats, meta=meta),
                                feats), meta)
    got = wide.toPandas().set_index("conv_id").sort_index()

    # meta passthrough columns present and correct
    exp_meta = meta_pdf.set_index("conv_id").sort_index()
    np.testing.assert_array_equal(got["n_turns"], exp_meta["n_turns"])
    np.testing.assert_array_equal(got["label"], exp_meta["label"])
    # custom feature consumed the meta value inside the kernel, exactly
    np.testing.assert_array_equal(
        got["spread_per_turn"],
        (got["maximum"] - got["minimum"]) / got["n_turns"])


def test_moments_close_to_kernel(spark, tiny_transcripts):
    """Native moments path ≈ kernel path (inexact by design, ~1e-9 rel)."""
    series = derive_series(tiny_transcripts)
    kern = (
        rollup_features(series, "1h", ["mean", "std", "n_epochs"])
        .groupBy("conv_id", "channel", "window_start")
        .pivot("feature", ["mean", "std", "n_epochs"]).agg({"value": "first"})
        .toPandas().set_index(["conv_id", "channel", "window_start"]).sort_index()
    )
    mom = (
        moments_derived(rollup_moments(series, "1h"))
        .select("conv_id", "channel", "window_start", "mean", "std", "n_epochs")
        .toPandas().set_index(["conv_id", "channel", "window_start"]).sort_index()
    )
    assert len(kern) == len(mom)
    np.testing.assert_array_equal(kern["n_epochs"], mom["n_epochs"])
    np.testing.assert_allclose(kern["mean"], mom["mean"], rtol=1e-9)
    np.testing.assert_allclose(kern["std"], mom["std"], rtol=1e-6, atol=1e-9)
