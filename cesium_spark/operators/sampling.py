"""Deterministic dataset splitting and sampling for training pipelines.

`randomSplit` is the stock Spark answer, but it is *sample-based*: the
assignment depends on partition layout and re-shuffles between runs, so
a re-run (or a backfill over a grown table) migrates rows between
train/val/test — silent leakage. Training pipelines want **content-
addressed** assignment: a row's split is a pure function of its key, so
it is stable across runs, re-partitions, engine versions, AND table
growth (new rows land in splits at the configured rates; old rows never
move). This is the published practice for LLM corpus curation
(fixed-hash holdout).

Implementation: first 8 hex digits of md5(key || salt) → 32-bit int →
per-mille bucket → threshold bands. Pure native expressions (codegen,
no UDF, no shuffle — a projection over the scan); md5 is bit-identical
everywhere, which also makes the assignment restatable in any other
engine (the DuckDB oracle replays it exactly).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def split_bucket(key_col, salt: str = ""):
    """Column expr: stable bucket in [0, 10000) from md5(key||salt)."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(BUCKETS))


def hash_split(df: DataFrame, weights: Mapping[str, float],
               key: str = "doc_id", salt: str = "") -> DataFrame:
    """Adds a `split` column assigning each row to a named split with
    the given weights (must sum to 1.0 within 1e-9). Assignment is a
    pure function of (key, salt): re-runs, repartitions and table
    growth never move a row between splits.

    Weights are quantized to 1/10000 (the bucket resolution); the salt
    re-deals the assignment (e.g. per experiment) without touching the
    data.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")

    bucket = split_bucket(F.col(key), salt)
    # cumulative integer thresholds in bucket units; the LAST band is
    # open-ended so quantization never drops a row
    names = list(weights)
    cum, edges = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        edges.append(int(round(cum * BUCKETS)))
    expr = None
    for name, edge in zip(names[:-1], edges):
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(
        F.lit(names[-1]))
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, fraction: float,
                         key: str = "doc_id", salt: str = "") -> DataFrame:
    """Content-addressed Bernoulli sample: keeps rows whose bucket
    falls below fraction*10000. Unlike df.sample(), the same rows are
    kept on every run and on any partitioning, and a larger fraction's
    sample is a SUPERSET of a smaller one (nested samples — the
    property you want for scaling-law subsets)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    edge = int(round(fraction * BUCKETS))
    return df.where(split_bucket(F.col(key), salt) < F.lit(edge))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping[str, float],
                      key: str = "doc_id", salt: str = "") -> DataFrame:
    """Content-addressed stratified sample: per-stratum keep rates
    (`sampleBy` semantics) with the SAME determinism guarantees as
    `deterministic_sample` — a row's fate is a pure function of
    (key, salt), so re-runs, repartitions and table growth never
    change which rows a stratum keeps, and raising one stratum's rate
    yields a superset of the lower-rate sample. Strata absent from
    `fractions` are dropped (rate 0 — `sampleBy` parity).

    The hash is salted with the STRATUM too, so two strata keep
    decorrelated key subsets (a shared-key row duplicated across
    strata isn't kept/dropped in lockstep). Pure projection + filter:
    codegen, zero shuffles, pushes below any downstream exchange.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0,1], got {f}")
    # per-stratum edge via a literal map lookup (no join, no UDF)
    edge_map = F.create_map(*[
        x for s, f in fractions.items()
        for x in (F.lit(s), F.lit(int(round(f * BUCKETS))))])
    stratum_bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(salt),
                       F.lit("\x1f"), F.col(strata_col).cast("string"))),
        1, 8), 16, 10).cast("long") % F.lit(BUCKETS))
    return df.where(
        stratum_bucket < edge_map[F.col(strata_col).cast("string")])


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    strata_col: str | None = None,
                    key: str = "doc_id", salt: str = "") -> DataFrame:
    """Content-addressed weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006, algorithm A): each row draws a
    deterministic uniform u from md5(key‖salt) and competes with the
    key ``ln(u)/w`` — taking the k LARGEST per stratum is exactly a
    weighted draw without replacement (u^(1/w) order, log-monotone).
    This is `deterministic_sample`'s weighted sibling: quality-scored
    corpus subsampling ("keep 1M docs, proportional to quality") needs
    weights, and df.sample() can't do per-row weights OR reproduce
    itself across runs.

    Determinism: u = (int(md5[:8 hex]) + 0.5) / 2^32 — exact dyadic
    arithmetic, never 0 or 1, bit-identical in any engine; the ES key
    is rounded to 6 dp BEFORE ranking (the rank-boundary convention —
    tfidf/DTW precedent) with ties broken by key ASC, so the selected
    set is stable across engines, runs, partitionings, and (because u
    is per-row) table growth only perturbs the boundary, never
    re-deals survivors wholesale.

    Rows with NULL or non-positive weight never compete (a weight of
    0 must mean "never sampled", and ln(u)/w flips sign at w<0) —
    they are filtered, not errored: one bad row must not kill a
    10^12-row draw. NULL strata form their own stratum.

    Scale shape: pure projection → per-stratum row_number window →
    filter ≤ k. ONE hash exchange on the stratum (or a single-
    partition window when unstratified — k-bounded output but a
    global sort feed; for unstratified top-k at extreme scale prefer
    orderBy+limit = TakeOrdered, documented trade-off).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long").cast("double") + F.lit(0.5))
        / F.lit(4294967296.0))
    w = F.col(weight_col).cast("double")
    es_key = F.round(F.log(u) / w, 6)
    d = (df.where(w.isNotNull() & (w > 0))
           .withColumn("es_key", es_key))
    part = [strata_col] if strata_col else []
    win = Window.partitionBy(*part).orderBy(
        F.col("es_key").desc(), F.col(key).asc())
    return (d.withColumn("sample_rank",
                         F.row_number().over(win).cast("int"))
            .where(F.col("sample_rank") <= k))
