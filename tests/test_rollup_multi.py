"""Fused multi-tier rollup ≡ per-tier rollups, bit-for-bit: one shuffle
must not change a single bit of any tier's features."""

from __future__ import annotations

import numpy as np
import pytest

from cesium_spark.operators.derive import derive_series
from cesium_spark.operators.rollup import rollup_features, rollup_features_multi

FEATS = ["n_epochs", "mean", "std", "skew", "median", "max_slope",
         "cads_avg", "cad_probs_100", "stetson_j", "weighted_average"]


def _collect(df):
    pdf = (df.toPandas()
           .sort_values(["tier", "conv_id", "channel", "window_start",
                         "feature"], kind="stable")
           .reset_index(drop=True))
    return pdf


def test_multi_equals_per_tier_bitwise(spark, tiny_transcripts):
    series = derive_series(tiny_transcripts)
    tiers = ["1m", "1h", "1d"]
    fused = _collect(rollup_features_multi(series, tiers, FEATS))
    import pandas as pd
    single = (pd.concat(
        [rollup_features(series, t, FEATS).toPandas() for t in tiers],
        ignore_index=True)[fused.columns]
        .sort_values(["tier", "conv_id", "channel", "window_start",
                      "feature"], kind="stable")
        .reset_index(drop=True))
    assert len(fused) == len(single)
    for c in ("tier", "conv_id", "channel", "feature"):
        assert (fused[c] == single[c]).all(), c
    np.testing.assert_array_equal(
        fused["window_start"].to_numpy("datetime64[us]"),
        single["window_start"].to_numpy("datetime64[us]"))
    gv, sv = fused["value"].to_numpy(), single["value"].to_numpy()
    both_nan = np.isnan(gv) & np.isnan(sv)
    assert np.array_equal(gv[~both_nan], sv[~both_nan])


def test_multi_partition_independent(spark, tiny_transcripts):
    series = derive_series(tiny_transcripts.repartition(7))
    a = _collect(rollup_features_multi(series, ["1h"], FEATS))
    b = _collect(rollup_features_multi(
        derive_series(tiny_transcripts.repartition(1)), ["1h"], FEATS))
    gv, sv = a["value"].to_numpy(), b["value"].to_numpy()
    both_nan = np.isnan(gv) & np.isnan(sv)
    assert np.array_equal(gv[~both_nan], sv[~both_nan])


def test_multi_rejects_conv(spark, tiny_transcripts):
    with pytest.raises(ValueError):
        rollup_features_multi(derive_series(tiny_transcripts),
                              ["conv"], FEATS)
