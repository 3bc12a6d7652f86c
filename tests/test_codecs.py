"""Codec roundtrip tests (SURVEY.md §5.2 layer 3): bitwise exactness
over adversarial IEEE-754 payloads and timestamp jumps, incl.
property-based coverage via hypothesis (FIXTURES.md §4)."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from cesium_spark.codecs.gorilla import (
    decode_timestamps,
    decode_values,
    encode_timestamps,
    encode_values,
)


def roundtrip_ts(ts):
    ts = np.asarray(ts, dtype=np.int64)
    out = decode_timestamps(encode_timestamps(ts))
    np.testing.assert_array_equal(out, ts)


def roundtrip_vals(v):
    v = np.asarray(v, dtype=np.float64)
    out = decode_values(encode_values(v))
    # bit equality — NaN payloads and signed zeros must survive
    np.testing.assert_array_equal(out.view(np.uint64), v.view(np.uint64))


class TestTimestamps:
    def test_empty_single_pair(self):
        for n in (0, 1, 2):
            roundtrip_ts(np.arange(n) * 1_000_000 + 1_700_000_000_000_000)

    def test_regular_cadence_compresses(self):
        ts = np.arange(10_000, dtype=np.int64) * 60_000_000
        enc = encode_timestamps(ts)
        assert len(enc) < ts.nbytes / 20  # dod==0 → ~1 bit/point
        roundtrip_ts(ts)

    def test_conversation_like(self):
        rng = np.random.default_rng(5)
        gaps = (20_000_000 + 5_000_000 *
                np.sin(np.arange(5000) / 12) + rng.normal(0, 500_000, 5000))
        ts = np.cumsum(np.abs(gaps)).astype(np.int64)
        roundtrip_ts(ts)

    def test_huge_jumps_and_negatives(self):
        roundtrip_ts([0, 10**18, 10**18 + 1, 5, -10**17, 0, 0, 0])

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.integers(min_value=-2**62, max_value=2**62),
                    max_size=200))
    def test_property(self, xs):
        roundtrip_ts(xs)


class TestValues:
    def test_empty_single(self):
        for n in (0, 1):
            roundtrip_vals(np.arange(n, dtype=np.float64))

    def test_adversarial_floats(self):
        roundtrip_vals([
            0.0, -0.0, np.nan, np.inf, -np.inf,
            5e-324, -5e-324,                       # subnormals
            np.float64.fromhex("0x1.fffffffffffffp+1023"),
            np.frombuffer(np.uint64(0x7FF8DEADBEEF0001).tobytes(),
                          dtype=np.float64)[0],    # NaN payload
            1.0, 1.0, 1.0, -1.0, 2.0**-1022,
        ])

    def test_constant_series_compresses(self):
        v = np.full(10_000, 7.25)
        enc = encode_values(v)
        assert len(enc) < v.nbytes / 20
        roundtrip_vals(v)

    @settings(max_examples=200, deadline=None)
    @given(st.lists(st.floats(allow_nan=True, allow_infinity=True,
                              allow_subnormal=True), max_size=200))
    def test_property(self, xs):
        roundtrip_vals(xs)

    def test_nan_payload_property(self):
        rng = np.random.default_rng(9)
        bits = rng.integers(0, 2**63, 500, dtype=np.int64).astype(np.uint64)
        roundtrip_vals(bits.view(np.float64))


class TestCrc:
    def test_decode_detects_corruption(self, spark, tiny_transcripts):
        from cesium_spark.codecs.chunks import decode_chunks, encode_chunks
        from cesium_spark.operators.derive import derive_series
        import pyspark.sql.functions as F

        chunks = encode_chunks(derive_series(tiny_transcripts), chunk_size=64)
        corrupted = chunks.withColumn("crc", F.col("crc") + 1)
        with pytest.raises(Exception, match="crc mismatch"):
            decode_chunks(corrupted).count()
