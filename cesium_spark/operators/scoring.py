"""Feature-matrix model scoring — the consumer side of the cesium
workflow (featurize → fit a scikit-learn classifier → SCORE at scale;
cesium's docs end the pipeline at a sklearn model † SURVEY.md §2.3
assemble_featureset). Training happens offline on a sampled feature
table (sklearn, driver-side — the matrix is small); scoring the full
10^12-turn feature table is the distributed half, and it is a pure
projection: weights inline as literals, so the plan is codegen with
ZERO shuffles and composes under any downstream partitioning.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def score_linear(features: DataFrame, weights: Mapping[str, float],
                 intercept: float = 0.0,
                 link: str = "logistic") -> DataFrame:
    """Append ``score`` = link(intercept + Σ wᵢ·xᵢ) over the named
    feature columns — logistic (sigmoid) or identity link, i.e. the
    inference step of a sklearn LogisticRegression / LinearRegression
    fit offline on a sample.

    A row with ANY NULL among the weighted features scores NULL — a
    missing feature silently scored as 0 would corrupt downstream
    threshold decisions (the NULL-means-undefined house rule). The
    linear term is a fixed left-associated expression tree in the
    given weight order, so scores are deterministic, partitioning-
    independent, and exactly restatable in SQL.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    if link not in ("logistic", "identity"):
        raise ValueError(f"link must be logistic|identity, got {link!r}")
    z = F.lit(float(intercept))
    for c, w in weights.items():
        z = z + F.lit(float(w)) * F.col(c).cast("double")
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) \
        if link == "logistic" else z
    return features.withColumn("score", score)


def rank_normalize(long_features: DataFrame,
                   value_col: str = "value",
                   feature_col: str = "feature") -> DataFrame:
    """Cross-series rank normalization of a long feature table: adds
    ``pct_rank`` = percent_rank of each row's value within its
    feature — the distribution-free feature-prep step before
    thresholding or model fitting (a heavy-tailed feature like
    latency-amplitude becomes uniformly comparable to a bounded one
    like tool_rate-mean). percent_rank = (rank−1)/(N−1) with ties
    sharing a rank, so the output is deterministic WITHOUT a
    tie-break column; a single-row feature gets 0.0.

    NULL values (degenerate-feature policy rows) are excluded from
    the ranking population — they would otherwise sort first and
    both claim ranks and inflate N — and kept as pct_rank NULL rows
    (the unpivot NULL-preservation contract: a curation gate must
    see 'feature not computed', not lose the row).

    Round ``value_col`` upstream of this operator if cross-engine
    rank stability is required (ties on the rounded grid rank
    identically everywhere; unrounded ulp drift can reorder).

    Scale shape: one filter split + percent_rank window partitioned
    by feature + unionByName — ONE hash exchange on the feature key;
    rows = series × features, orders of magnitude below raw turns.
    """
    real = long_features.where(F.col(value_col).isNotNull())
    nulls = (long_features.where(F.col(value_col).isNull())
             .withColumn("pct_rank", F.lit(None).cast("double")))
    w = Window.partitionBy(feature_col).orderBy(F.col(value_col))
    ranked = real.withColumn("pct_rank", F.percent_rank().over(w))
    return ranked.unionByName(nulls)
