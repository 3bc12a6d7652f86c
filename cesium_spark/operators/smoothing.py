"""EWMA smoothing per series (SURVEY.md §2.9 continuous-aggregate
family — the exponentially-weighted moving average every monitoring
stack exposes, e.g. Graphite ``ewma()`` / Prometheus ``holt_winters``'s
level term; no reference counterpart: cesium's features are
whole-series scalars, not per-point smoothed streams).

The recurrence s₀ = y₀, sᵢ = (1−α)·sᵢ₋₁ + α·yᵢ is sequential per
series BY DEFINITION (each output depends on the previous), so — like
LTTB — the parallelism is across series, never within one: a single
hash exchange on (conv_id, channel) into a vectorized per-series
``applyInPandas`` kernel, O(n) work per series, with the in-kernel
stable sort keeping output partitioning-independent (§4.3 policy).
The kernel body is pandas ``ewm(alpha, adjust=False).mean()`` —
C-speed, no per-row Python.

Determinism / oracle story: pandas' adjust=False update is
``s = ((1−α)·s_prev + α·y) / ((1−α) + α)`` (pinned bit-for-bit against
an explicit scalar recurrence in pytest). For DYADIC α (0.25, 0.5,
0.125…) the divisor (1−α)+α is exactly 1.0 and the equal-value update
``(1−α)·s + α·s`` reproduces s exactly (checked over 2M random doubles
for α=0.25; false for α=0.3), so the whole stream is bit-replayable by
the plain recurrence ``s = (1−α)·s_prev + α·y`` — which the DuckDB
oracle restates as a recursive CTE. Non-dyadic α still computes
correctly but loses the bit-replay guarantee; ``ewma`` warns via
ValueError unless ``allow_non_dyadic=True``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

EWMA_SCHEMA = ("conv_id string, channel string, turn_idx long, "
               "t double, y double, y_smooth double")


def _is_dyadic(alpha: float) -> bool:
    # dyadic rational with small denominator: alpha * 2^k integral
    m = alpha * 4096.0
    return m == int(m)


def ewma(series: DataFrame, alpha: float,
         allow_non_dyadic: bool = False) -> DataFrame:
    """Append ``y_smooth`` = EWMA(alpha, adjust=False) of y per
    (conv_id, channel), points ordered by (t, turn_idx). Rows with
    NULL t/y are dropped up front (a smoothed NULL is undefined;
    gap-fill first if NULLs are meaningful)."""
    if not (0.0 < alpha < 1.0):
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    if not allow_non_dyadic and not _is_dyadic(alpha):
        raise ValueError(
            f"alpha={alpha} is not dyadic — the bit-exact oracle "
            "guarantee does not hold; pass allow_non_dyadic=True "
            "to proceed anyway")

    def _kernel(pdf):
        pdf = pdf.sort_values(["t", "turn_idx"], kind="stable")
        pdf["y_smooth"] = pdf["y"].ewm(alpha=alpha, adjust=False).mean()
        return pdf

    return (
        series
        .select("conv_id", "channel", "turn_idx", "t", "y")
        .where(F.col("t").isNotNull() & F.col("y").isNotNull())
        .groupBy("conv_id", "channel")
        .applyInPandas(_kernel, EWMA_SCHEMA)
    )
