"""Counter-rate rollup: per-tier increase rate of a monotone counter
channel with reset detection (the PromQL ``rate()`` semantics,
re-expressed as one window pass + one aggregation — SURVEY.md §2.9's
continuous-aggregate family applied to counter-typed channels such as
cumulative token counts or tool-call totals).

Counters reset to ~0 when a process restarts; a naive ``max - min`` per
bucket under-counts across resets and a naive delta sum goes negative.
The standard correction: per consecutive pair, the increase is
``y - lag(y)`` when non-negative, else ``y`` (the counter restarted —
everything since the reset counts). Summing corrected increases per
bucket and dividing by the bucket's span gives increase/sec.

Plan shape: one window exchange on (conv_id, channel) — already the
series' natural layout, elided on a bucketed table — then one hash
aggregation with map-side partials. No UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cesium_spark.operators.rollup import TIERS

_SPAN_S = {"1m": 60.0, "1h": 3600.0, "1d": 86400.0}


def counter_rate(series: DataFrame, tier: str) -> DataFrame:
    """Returns (conv_id, channel, bucket, increase, rate_per_s,
    n_resets, n). First point of each series has no predecessor and
    contributes nothing (PromQL parity: rate needs >= 2 points)."""
    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}")
    w = Window.partitionBy("conv_id", "channel").orderBy("t", "turn_idx")
    prev = F.lag("y").over(w)
    inc = F.when(prev.isNull(), F.lit(None)) \
           .when(F.col("y") >= prev, F.col("y") - prev) \
           .otherwise(F.col("y"))
    return (
        series
        .withColumn("bucket", F.date_trunc(TIERS[tier], F.col("ts")))
        .withColumn("__inc", inc)
        .withColumn("__reset",
                    (prev.isNotNull() & (F.col("y") < prev)).cast("long"))
        .groupBy("conv_id", "channel", "bucket")
        .agg(
            F.sum("__inc").alias("increase"),
            (F.sum("__inc") / F.lit(_SPAN_S[tier])).alias("rate_per_s"),
            F.sum("__reset").alias("n_resets"),
            F.count("__inc").alias("n"),
        )
        # buckets whose only point is a series head carry no rate info
        .where(F.col("n") > 0)
    )
