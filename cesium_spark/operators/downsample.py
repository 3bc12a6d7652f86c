"""M4 visualization downsample (Jugel et al., "M4: A
Visualization-Oriented Time Series Data Aggregation", VLDB 2014).

For each (conv_id, channel) series and tier bucket, keep exactly the
four value-extreme points — min, max, first, last — which is the
published error-free aggregation for line-chart rendering at a given
pixel width: any pixel column's drawn line segment is fully determined
by those four points, so a 10^12-turn series downsampled to a 4K
dashboard transfers ~16K points per series instead of the raw stream.

Pure native aggregation — one hash exchange on (conv_id, channel,
bucket), partial aggregation map-side, no UDF, no window. At scale the
group-by keys prefix-match the table's bucket/sort layout so the
exchange is elided; this is the cheapest possible plan shape (identical
to `rollup_moments`).

Determinism: first/last use ``min_by/max_by(y, t)``; ties in ``t``
within a (conv, channel, bucket) group are broken by ``turn_idx`` via a
packed struct ordering, so results are partitioning-independent even on
duplicate timestamps.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cesium_spark.operators.rollup import TIERS


def m4_downsample(series: DataFrame, tier: str) -> DataFrame:
    """Returns (conv_id, channel, bucket, y_min, y_max, y_first,
    y_last, t_first, t_last, n) — the M4 tuple per tier bucket."""
    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}")
    # order key: (t, turn_idx) packed in a struct — struct ordering is
    # lexicographic, so equal-t ties fall back to turn order
    okey = F.struct(F.col("t"), F.col("turn_idx"))
    return (
        series
        .withColumn("bucket", F.date_trunc(TIERS[tier], F.col("ts")))
        .groupBy("conv_id", "channel", "bucket")
        .agg(
            F.min("y").alias("y_min"),
            F.max("y").alias("y_max"),
            F.min_by("y", okey).alias("y_first"),
            F.max_by("y", okey).alias("y_last"),
            F.min("t").alias("t_first"),
            F.max("t").alias("t_last"),
            F.count(F.lit(1)).alias("n"),
        )
    )
