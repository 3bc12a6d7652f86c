"""Chunked compression operators: series ↔ Gorilla/DoD chunk table
(SURVEY.md §2.9, §3.4 stage COMPRESS).

Chunk key = (conv_id, channel, chunk_idx = turn_idx // chunk_size).
``chunk_idx`` in the group key IS the salt: a Zipf-tailed conversation
with 20 000 turns becomes ⌈20000/4096⌉ independent groups hashed to
different partitions, so no single task owns a whole jumbo conversation
(the skew mitigation of SURVEY.md §4.4). Groups are bounded ≤
chunk_size, so kernel memory is O(chunk) and Arrow batches stay small.

Each chunk row carries a header (n, ts_min, ts_max, crc32) for
partition pruning and integrity, plus three bit-packed blobs:
timestamps (DoD), turn indices (DoD — mostly Δ=1 → ~1 bit/turn), and
values (Gorilla XOR). ``decode_chunks`` restores the exact rows —
bitwise for y, exact int64 µs for ts — which together with the raw
table's text column satisfies the per-turn invariant
(tests/test_passthrough.py).
"""

from __future__ import annotations

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cesium_spark.codecs.gorilla import (
    decode_timestamps_many,
    decode_values_many,
    encode_timestamps,
    encode_values,
)

DEFAULT_CHUNK_SIZE = 4096

CHUNKS_SCHEMA = (
    "conv_id string, channel string, chunk_idx long, n long, "
    "ts_min timestamp, ts_max timestamp, crc long, "
    "ts_blob binary, idx_blob binary, y_blob binary"
)

DECODED_SCHEMA = (
    "conv_id string, channel string, turn_idx int, ts timestamp, y double"
)


def encode_chunks(series: DataFrame,
                  chunk_size: int = DEFAULT_CHUNK_SIZE) -> DataFrame:
    """series(conv_id, channel, turn_idx, ts, y, …) → chunk table."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("turn_idx", kind="stable")
        ts_us = pdf["ts"].to_numpy("datetime64[us]").view(np.int64)
        idx = pdf["turn_idx"].to_numpy(np.int64)
        y = pdf["y"].to_numpy(np.float64)
        ts_blob = encode_timestamps(ts_us)
        idx_blob = encode_timestamps(idx)
        y_blob = encode_values(y)
        crc = zlib.crc32(ts_blob)
        crc = zlib.crc32(idx_blob, crc)
        crc = zlib.crc32(y_blob, crc)
        return pd.DataFrame({
            "conv_id": [pdf["conv_id"].iloc[0]],
            "channel": [pdf["channel"].iloc[0]],
            "chunk_idx": [int(pdf["chunk_idx"].iloc[0])],
            "n": [len(pdf)],
            "ts_min": [pdf["ts"].iloc[0]],
            "ts_max": [pdf["ts"].iloc[-1]],
            "crc": [crc],
            "ts_blob": [ts_blob],
            "idx_blob": [idx_blob],
            "y_blob": [y_blob],
        })

    return (
        series
        .withColumn("chunk_idx", (F.col("turn_idx") / chunk_size).cast("long"))
        # pre-UDF projection (Catalyst can't prune through the kernel)
        .select("conv_id", "channel", "chunk_idx", "turn_idx", "ts", "y")
        .groupBy("conv_id", "channel", "chunk_idx")
        .applyInPandas(kernel, schema=CHUNKS_SCHEMA)
    )


def decode_chunks(chunks: DataFrame, verify_crc: bool = True) -> DataFrame:
    """Chunk table → exact series rows (bitwise y, exact µs ts)."""

    def kernel(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            if verify_crc:
                # zlib.crc32 is C-speed; per-row cost is negligible
                for row in pdf.itertuples(index=False):
                    crc = zlib.crc32(row.ts_blob)
                    crc = zlib.crc32(row.idx_blob, crc)
                    crc = zlib.crc32(row.y_blob, crc)
                    if crc != row.crc:
                        raise ValueError(
                            f"crc mismatch in chunk ({row.conv_id}, "
                            f"{row.channel}, {row.chunk_idx})")
            # whole-batch vectorized decode (gorilla.decode_*_many):
            # all chunks of the Arrow batch share one lockstep pass
            ts_flat, n = decode_timestamps_many(list(pdf["ts_blob"]))
            idx_flat, _ = decode_timestamps_many(list(pdf["idx_blob"]))
            y_flat, _ = decode_values_many(list(pdf["y_blob"]))
            yield pd.DataFrame({
                "conv_id": np.repeat(pdf["conv_id"].to_numpy(), n),
                "channel": np.repeat(pdf["channel"].to_numpy(), n),
                "turn_idx": idx_flat.astype(np.int32),
                "ts": ts_flat.view("datetime64[us]"),
                "y": y_flat,
            })

    return chunks.mapInPandas(kernel, schema=DECODED_SCHEMA)
