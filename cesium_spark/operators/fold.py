"""Tier folding: 1m → 1h → 1d continuous-aggregate maintenance for the
exactly-mergeable statistics (SURVEY.md §2.9 — TimescaleDB-style cagg
fold; no reference counterpart).

Folding reuses the fine tier's moments instead of rescanning raw turns:
count/min/max merge exactly; float sums (Σy, Σy², Σy³) merge
associatively but not bit-stably, so folded mean/std/skew are the FAST
path only — order-sensitive features (median, percentiles, Stetson,
Lomb–Scargle) are recomputed from the coarser tier's raw slice by the
kernel path (SURVEY.md §4.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cesium_spark.operators.rollup import TIERS

_FOLD_TARGETS = {"1h": "hour", "1d": "day", "1w": "week", "1mo": "month"}


def fold_moments(fine_moments: DataFrame, target_tier: str) -> DataFrame:
    """Merge a finer tier's moments table up to ``target_tier``.
    One JVM-only shuffle on the (smaller) moments table — at 10^12 turns
    this touches 1m-window counts (~10^9 rows), not raw turns.
    """
    if target_tier not in _FOLD_TARGETS:
        raise ValueError(f"can only fold to {list(_FOLD_TARGETS)}")
    unit = TIERS[target_tier]
    return (
        fine_moments
        .withColumn("window_start", F.date_trunc(unit, F.col("window_start")))
        .groupBy("conv_id", "channel", "window_start")
        .agg(
            F.sum("n").alias("n"),
            F.min("y_min").alias("y_min"),
            F.max("y_max").alias("y_max"),
            F.sum("y_sum").alias("y_sum"),
            F.sum("y_sum2").alias("y_sum2"),
            F.sum("y_sum3").alias("y_sum3"),
            F.min("t_min").alias("t_min"),
            F.max("t_max").alias("t_max"),
        )
        .withColumn("tier", F.lit(target_tier))
    )


def rollup_distinct_sketches(df: DataFrame, tier: str, key_cols: list[str],
                             value_col: str,
                             lgk: int = 12) -> DataFrame:
    """Per-tier HLL sketches of approx-distinct(value_col) — the
    MERGEABLE form of distinct counting (Apache DataSketches HLL via
    native hll_sketch_agg): fixed ~(2^lgk) bytes per group regardless
    of group size, partial aggregation map-side, and higher tiers fold
    from lower by sketch UNION instead of rescanning raw (exact
    distinct is a full re-shuffle of raw values per tier — the thing
    that does NOT scale to 10^12 turns)."""
    if tier not in TIERS:
        raise ValueError(f"unknown tier {tier!r}")
    return (
        df.withColumn("window_start", F.date_trunc(TIERS[tier], F.col("ts")))
        .groupBy(*key_cols, "window_start")
        .agg(F.hll_sketch_agg(value_col, F.lit(lgk)).alias("sketch"),
             F.count(F.lit(1)).alias("n"))
        .withColumn("tier", F.lit(tier))
    )


def fold_distinct_sketches(fine: DataFrame, target_tier: str,
                           key_cols: list[str]) -> DataFrame:
    """Union a finer tier's HLL sketches up to ``target_tier`` —
    exactly the moments-fold plan shape (one shuffle of the SMALL
    sketch table, never of raw turns). The union of per-window HLL
    sketches is, by the sketch algebra, the sketch of the unioned
    windows, so estimates after folding equal estimates computed
    directly at the coarse tier (pytest + driver invariant)."""
    if target_tier not in _FOLD_TARGETS:
        raise ValueError(f"can only fold to {list(_FOLD_TARGETS)}")
    unit = TIERS[target_tier]
    return (
        fine
        .withColumn("window_start", F.date_trunc(unit, F.col("window_start")))
        .groupBy(*key_cols, "window_start")
        .agg(F.hll_union_agg("sketch").alias("sketch"),
             F.sum("n").alias("n"))
        .withColumn("tier", F.lit(target_tier))
        .withColumn("distinct_est",
                    F.hll_sketch_estimate("sketch").cast("long"))
    )


def merge_moments(base: DataFrame, delta: DataFrame) -> DataFrame:
    """Incremental continuous-aggregate refresh (TimescaleDB cagg
    invalidation semantics, SURVEY.md §2.9): merge a late-arriving
    batch's moments into an existing tier table WITHOUT rescanning the
    already-rolled-up raw turns.

    Both inputs are rollup_moments-shaped (same tier). Because every
    column is a semigroup (count/sum add, min/max lattice), the merge
    is union + one re-aggregation — and crucially the shuffle carries
    only (base ∪ delta) MOMENT rows, never raw turns: refreshing one
    late hour against a 10^12-turn table moves ~|touched windows| rows.
    Callers refresh incrementally as
    ``merge_moments(base, rollup_moments(late_rows, tier))``; the
    result is row-identical to rolling up (original ∪ late) raw turns
    from scratch (driver query ts_caggs_incremental pins this, with
    the float-sum caveat of fold_moments: Σy/Σy²/Σy³ merge
    associatively, so derived mean/std agree to rounding, while
    n/min/max agree exactly).

    At scale the delta is tiny: broadcast it? No — the merged result
    must land partitioned like ``base`` for the next refresh, so the
    right plan is the hash merge below with base's partitioning reused.
    When both inputs arrive as fresh rollups, Spark ELIDES the merge's
    own exchange outright (both union children are hash-partitioned on
    a subset of the merge keys — plan-asserted in pytest: 2 exchanges
    total, both on the INPUT rollups, zero on the merge).
    """
    cols = ["conv_id", "channel", "window_start", "n", "y_min", "y_max",
            "y_sum", "y_sum2", "y_sum3", "t_min", "t_max", "tier"]
    missing = [c for c in cols if c not in base.columns
               or c not in delta.columns]
    if missing:
        raise ValueError(f"not moments-shaped, missing: {missing}")
    return (
        base.select(*cols).unionByName(delta.select(*cols))
        .groupBy("conv_id", "channel", "window_start", "tier")
        .agg(
            F.sum("n").alias("n"),
            F.min("y_min").alias("y_min"),
            F.max("y_max").alias("y_max"),
            F.sum("y_sum").alias("y_sum"),
            F.sum("y_sum2").alias("y_sum2"),
            F.sum("y_sum3").alias("y_sum3"),
            F.min("t_min").alias("t_min"),
            F.max("t_max").alias("t_max"),
        )
        .select(*cols)
    )
