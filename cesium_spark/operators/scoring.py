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

from pyspark.sql import DataFrame
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
