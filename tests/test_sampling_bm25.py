"""Content-addressed splitting/sampling and BM25 scoring."""

from __future__ import annotations

import math

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.operators.sampling import (
    deterministic_sample,
    hash_split,
)
from cesium_spark.operators.textstats import bm25_scores


@pytest.fixture(scope="module")
def ids(spark):
    return spark.range(0, 10_000).withColumnRenamed("id", "doc_id")


def test_split_fractions_and_stability(spark, ids):
    w = {"train": 0.8, "val": 0.1, "test": 0.1}
    out = hash_split(ids, w, key="doc_id")
    counts = {r["split"]: r["c"] for r in
              out.groupBy("split").agg(F.count("*").alias("c")).collect()}
    assert set(counts) == set(w)
    for name, frac in w.items():
        assert counts[name] / 10_000 == pytest.approx(frac, abs=0.02)
    # partitioning-independent assignment
    a = dict(out.select("doc_id", "split").collect())
    b = dict(hash_split(ids.repartition(17), w).select(
        "doc_id", "split").collect())
    assert a == b


def test_split_stable_under_table_growth(spark, ids):
    """Old rows never move when the table grows — the randomSplit
    leakage hash_split exists to prevent."""
    w = {"train": 0.9, "test": 0.1}
    small = dict(hash_split(ids.where(F.col("doc_id") < 1000), w)
                 .select("doc_id", "split").collect())
    full = dict(hash_split(ids, w).select("doc_id", "split").collect())
    assert all(full[k] == v for k, v in small.items())


def test_split_salt_redeals(spark, ids):
    w = {"a": 0.5, "b": 0.5}
    x = dict(hash_split(ids, w, salt="s1").select("doc_id", "split").collect())
    y = dict(hash_split(ids, w, salt="s2").select("doc_id", "split").collect())
    moved = sum(1 for k in x if x[k] != y[k])
    assert moved > 2000  # a re-deal, not a tweak


def test_split_validation(spark, ids):
    with pytest.raises(ValueError, match="sum"):
        hash_split(ids, {"a": 0.5, "b": 0.6})
    with pytest.raises(ValueError, match="non-empty"):
        hash_split(ids, {})


def test_deterministic_sample_nested(spark, ids):
    s10 = {r["doc_id"] for r in deterministic_sample(ids, 0.1).collect()}
    s30 = {r["doc_id"] for r in deterministic_sample(ids, 0.3).collect()}
    assert s10 <= s30                      # nested scaling-law subsets
    assert len(s10) / 10_000 == pytest.approx(0.1, abs=0.02)
    assert len(s30) / 10_000 == pytest.approx(0.3, abs=0.02)
    with pytest.raises(ValueError, match="fraction"):
        deterministic_sample(ids, 1.5)


# --------------------------------------------------------------------------
# bm25
# --------------------------------------------------------------------------

def _bm25_ref(corpus, terms, k1=1.2, b=0.75):
    toks = [t.lower().split() for t in corpus]
    n = len(toks)
    avgdl = sum(len(t) for t in toks) / n
    out = []
    for tl in toks:
        s = 0.0
        for q in terms:
            tf = tl.count(q)
            df = sum(1 for t2 in toks if q in t2)
            idf = math.log((n - df + 0.5) / (df + 0.5) + 1.0)
            s += idf * (tf * (k1 + 1)) / (
                tf + k1 * (1 - b + b * len(tl) / avgdl))
        out.append(s)
    return out


def test_bm25_matches_reference(spark):
    corpus = [
        "spark shuffle join spark",
        "window sort merge",
        "the quick brown fox",
        "spark window spark window spark",
    ]
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(len(corpus)), "text": corpus}))
    got = {r["doc_id"]: r["bm25"]
           for r in bm25_scores(df, ("spark", "window")).collect()}
    exp = _bm25_ref(corpus, ("spark", "window"))
    for i, e in enumerate(exp):
        assert got[i] == pytest.approx(e, rel=1e-12)
    # zero-match doc scores exactly 0
    assert got[2] == 0.0


def test_bm25_partitioning_independent(spark):
    corpus = [f"spark row value {'spark ' * (i % 5)}" for i in range(200)]
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(200), "text": corpus}))
    a = sorted(map(str, bm25_scores(df, ("spark",)).collect()))
    c = sorted(map(str, bm25_scores(df.repartition(13), ("spark",)).collect()))
    assert a == c  # integer Σdl ⇒ bitwise-stable avgdl and scores


def test_bm25_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["x"]}))
    with pytest.raises(ValueError, match="non-empty"):
        bm25_scores(df, ())
    with pytest.raises(ValueError, match="lowercase"):
        bm25_scores(df, ("Spark",))
