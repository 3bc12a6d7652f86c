"""Transcripts → long-form series (the reference's TimeSeries t/m/e
model re-expressed relationally — cesium/time_series.py::TimeSeries †,
SURVEY.md §1.2).

One TimeSeries ≙ one group of rows keyed by ``conv_id``, ordered by
``(turn_idx, ts)``; channels (cesium multichannel †) are the
text-derived signals named in BASELINE.json north_star:

- ``latency``   — Δts between consecutive turns (seconds); defined from
  turn 1 onward (n-1 points, exactly ``np.diff`` semantics);
- ``tokens``    — whitespace-token count of ``text`` per turn;
- ``tool_rate`` — tool-call indicator (``tool IS NOT NULL``) per turn.

All columns are built from native Spark expressions (one window pass,
one shuffle on ``conv_id``); ``e`` is the cesium DEFAULT_ERROR_VALUE
constant 1e-4 (oracle parity, SURVEY.md §1.2). The unpivot uses
``stack`` — no UDFs, fully codegen'd.

Scale note: the single shuffle here is the window over ``conv_id``. On
a bucketed/sorted Iceberg table (bucket(conv_id), sort turn_idx) the
exchange is elided entirely; on raw parquet it is one hash exchange of
the narrow projected columns only (Catalyst prunes ``role`` unless
requested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ERROR_VALUE = 1e-4
CHANNELS = ("latency", "tokens", "tool_rate")


def derive_series(transcripts: DataFrame,
                  channels: tuple[str, ...] = CHANNELS) -> DataFrame:
    """Returns series(conv_id, channel, turn_idx, ts, t, y, e).

    ``t`` = seconds since conversation start (double); rows ordered
    within groups by ``turn_idx`` (ties broken by ts — 'stable turn
    ordering' per BASELINE.json input_hint).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    sec = F.col("ts").cast("double")  # epoch seconds, µs precision kept
    base = (
        transcripts
        # normalize TIMESTAMP_NTZ (e.g. plain parquet) to session-TZ
        # timestamp; sessions pin UTC so NTZ is interpreted as UTC
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("conv_id", "turn_idx", "ts", "text", "tool")
        .withColumn("t", sec - F.min(sec).over(Window.partitionBy("conv_id")))
        .withColumn("latency", sec - F.lag(sec).over(w))
        .withColumn("tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
                    .cast("double"))
        .withColumn("tool_rate", F.col("tool").isNotNull().cast("double"))
    )
    stack_args = ", ".join(f"'{c}', {c}" for c in channels)
    out = (
        base.selectExpr(
            "conv_id", "turn_idx", "ts", "t",
            f"stack({len(channels)}, {stack_args}) as (channel, y)")
        .where(F.col("y").isNotNull())  # drops latency's first-turn null
        .withColumn("e", F.lit(DEFAULT_ERROR_VALUE))
        .select("conv_id", "channel", "turn_idx", "ts", "t", "y", "e")
    )
    return out
