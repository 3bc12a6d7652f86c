"""Deterministic synthetic transcript generator (FIXTURES.md §1).

Generates the authoritative input shape (BASELINE.json ``input_hint``):

    transcripts(conv_id string, turn_idx int, role string,
                text string, tool string, ts timestamp)

**Distributed and partition-independent**: generation runs as
``mapInPandas`` over ``spark.range(n_conv)``, with each conversation's
RNG seeded by ``(seed, conv_index)`` — the same conversation is
byte-identical no matter which executor or partition produces it, so
datasets scale to any size without a driver bottleneck and bench runs
at different parallelism levels see identical input.

Planted signals (so features have known answers — mirrors the
reference's synthetic-signal tests, cesium/features/tests/
test_features.py †):

- latency channel: ``base + A·sin(2π f k) + noise`` with per-conv
  ``f ∈ {1/12, 1/30, 1/100}`` turn⁻¹ — Lomb–Scargle must recover f;
- tokens channel: lognormal(μ=4, σ=0.6) counts; every 37th conversation
  constant-token (degenerate-case tests: std=0, skew nan);
- tool turns: Bernoulli p=0.15 → non-null ``tool``.

Conversation lengths are Zipf-like (α≈1.3), clipped to [2, max_len] —
the long tail deliberately exercises salting/AQE (SURVEY.md §4.4).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession

SEED = 42
EPOCH = np.datetime64("2024-01-01T00:00:00", "us")
SPAN_DAYS = 30
LATENCY_FREQS = (1.0 / 12.0, 1.0 / 30.0, 1.0 / 100.0)  # per-turn frequency
VOCAB = np.array(
    "the a of to and in for on with spark query scan filter join group sort "
    "window merge batch stream row value data table key hash range tier "
    "rollup series turn agent tool model state plan trace token".split()
)
TOOLS = np.array(["search", "python", "browser", "calculator", "editor"])

TRANSCRIPT_SCHEMA = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def _gen_conversation(conv_idx: int, seed: int, max_len: int) -> pd.DataFrame:
    rng = np.random.default_rng([seed, conv_idx])
    # Zipf-ish length: floor of a Pareto(α-1=0.3) tail, clipped
    length = int(np.clip(2 + rng.pareto(0.85) * 6.0, 2, max_len))
    k = np.arange(length, dtype=np.float64)

    f = LATENCY_FREQS[conv_idx % len(LATENCY_FREQS)]
    amp = 5.0 + 10.0 * rng.random()
    base = 20.0 + 20.0 * rng.random()
    noise = rng.normal(0.0, 0.5, length)
    gaps = np.maximum(0.25, base + amp * np.sin(2.0 * np.pi * f * k) + noise)
    start_off_us = int(rng.integers(0, SPAN_DAYS * 86400) * 1_000_000)
    ts = EPOCH + start_off_us + (np.cumsum(np.concatenate(([0.0], gaps[1:]))) * 1e6).astype(np.int64)

    if conv_idx % 37 == 0:
        n_tokens = np.full(length, 7, dtype=np.int64)  # degenerate: constant
    else:
        n_tokens = np.maximum(1, rng.lognormal(4.0, 0.6, length).astype(np.int64) // 16)
    texts = [" ".join(VOCAB[rng.integers(0, VOCAB.size, int(nt))]) for nt in n_tokens]

    is_tool = rng.random(length) < 0.15
    is_tool[0] = False
    role = np.where(is_tool, "tool", np.where(k.astype(np.int64) % 2 == 0, "user", "assistant"))
    tool = np.where(is_tool, TOOLS[rng.integers(0, TOOLS.size, length)], None)

    return pd.DataFrame({
        "conv_id": f"conv{conv_idx:08d}",
        "turn_idx": np.arange(length, dtype=np.int32),
        "role": role,
        "text": texts,
        "tool": tool,
        "ts": ts,
    })


def generate_transcripts(
    spark: SparkSession,
    n_conv: int,
    seed: int = SEED,
    max_len: int = 20_000,
    partitions: int | None = None,
) -> DataFrame:
    """Distributed deterministic generation: one task generates a slice
    of conversation indices; per-conv RNG keyed by (seed, idx)."""
    partitions = partitions or max(8, n_conv // 2048)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for idx in pdf["id"].to_numpy():
                yield _gen_conversation(int(idx), seed, max_len)

    base = spark.range(0, n_conv, 1, numPartitions=partitions)
    return base.mapInPandas(gen, schema=TRANSCRIPT_SCHEMA)


def generate_transcripts_pandas(n_conv: int, seed: int = SEED,
                                max_len: int = 2_000) -> pd.DataFrame:
    """Driver-side variant for tiny unit-test fixtures — identical rows
    to the distributed path for the same (seed, idx)."""
    return pd.concat(
        [_gen_conversation(i, seed, max_len) for i in range(n_conv)],
        ignore_index=True,
    )
