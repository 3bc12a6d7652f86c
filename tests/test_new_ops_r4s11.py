"""Session-11 operators: duplicated-n-gram coverage (Lee et al. 2022
exact-substring dedup at n-gram granularity)."""

from __future__ import annotations

import pandas as pd
import pytest

from cesium_spark.operators.dedup import ngram_coverage


@pytest.fixture(scope="module")
def cov_docs(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "a b c d e f",          # 4 trigrams, 2 shared with doc 2
            "a b c d x",            # 3 trigrams, 2 shared with doc 1
            "q r s",                # 1 unique trigram
            "x y",                  # too short: 0 trigrams
            "a b c a b c a b c",    # repeated gram counted ONCE per doc
        ]}))


def test_ngram_coverage_hand_example(cov_docs):
    out = {r["doc_id"]: r for r in
           ngram_coverage(cov_docs, n=3, min_df=2, dup_threshold=0.5)
           .collect()}
    assert out[1]["n_grams"] == 4 and out[1]["n_dup"] == 2
    assert out[1]["dup_frac"] == 0.5 and out[1]["is_dup"]
    assert out[2]["n_grams"] == 3 and out[2]["n_dup"] == 2
    assert out[2]["dup_frac"] == 2.0 / 3.0 and out[2]["is_dup"]
    assert out[3]["n_grams"] == 1 and out[3]["n_dup"] == 0
    assert out[3]["dup_frac"] == 0.0 and not out[3]["is_dup"]
    # shorter than n tokens: zero grams, NULL frac, never flagged
    assert out[4]["n_grams"] == 0 and out[4]["dup_frac"] is None
    assert not out[4]["is_dup"]
    # "a b c" ×3 inside doc 5 is ONE distinct gram (its only dup one:
    # "b c a"/"c a b" appear nowhere else)
    assert out[5]["n_grams"] == 3 and out[5]["n_dup"] == 1


def test_ngram_coverage_min_df_raises_threshold(cov_docs):
    # min_df=3: "b c d" (df=2, docs 1+2) no longer counts; "a b c"
    # (df=3, docs 1+2+5) still does
    out = {r["doc_id"]: r["n_dup"] for r in
           ngram_coverage(cov_docs, n=3, min_df=3).collect()}
    assert out[1] == 1 and out[2] == 1 and out[5] == 1


def test_ngram_coverage_validation(cov_docs):
    with pytest.raises(ValueError, match="n must be"):
        ngram_coverage(cov_docs, n=0)
    with pytest.raises(ValueError, match="min_df"):
        ngram_coverage(cov_docs, min_df=1)
    with pytest.raises(ValueError, match="dup_threshold"):
        ngram_coverage(cov_docs, dup_threshold=0.0)


def test_ngram_coverage_no_cartesian_and_bounded_shuffles(cov_docs):
    import re
    df = ngram_coverage(cov_docs, n=3)
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    assert "Cartesian" not in p
    # df agg + join-back + per-doc agg + restore-join: every exchange
    # is hash partitioning on a fixed-width key, never a sort of the
    # corpus on a global key
    assert len(re.findall(r"Exchange rangepartitioning", p)) == 0
