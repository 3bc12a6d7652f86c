"""vocab_topk (operators/textstats.py): hand-computed counts and doc
frequency, deterministic tie-break at the k boundary, min_count filter,
validation, and the top-k plan shape (TakeOrderedAndProject, never a
global sort or full-vocabulary window)."""

from __future__ import annotations

import pandas as pd
import pytest

from cesium_spark.operators.textstats import vocab_topk


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["The cat sat", "the cat  ran", "a dog\tran home"],
    }))


def test_hand_computed_counts(spark, docs):
    rows = {r["token"]: r for r in vocab_topk(docs, 10).collect()}
    assert rows["the"]["cnt"] == 2 and rows["the"]["n_docs"] == 2
    assert rows["cat"]["cnt"] == 2 and rows["cat"]["n_docs"] == 2
    assert rows["ran"]["cnt"] == 2 and rows["ran"]["n_docs"] == 2
    assert rows["sat"]["cnt"] == 1 and rows["sat"]["n_docs"] == 1
    assert "" not in rows  # double-space yields no empty token


def test_tie_break_and_rank_deterministic(spark, docs):
    """cnt ties order by token ASC; the k cut lands on the same rows
    every run."""
    top = vocab_topk(docs, 4).collect()
    assert [(r["rank"], r["token"]) for r in top] == [
        (1, "cat"), (2, "ran"), (3, "the"), (4, "a")]
    again = vocab_topk(docs.repartition(7), 4).collect()
    assert [(r["rank"], r["token"]) for r in again] == \
        [(r["rank"], r["token"]) for r in top]


def test_min_count_filters_tail(spark, docs):
    toks = {r["token"] for r in vocab_topk(docs, 10, min_count=2).collect()}
    assert toks == {"the", "cat", "ran"}


def test_k_validation(spark, docs):
    with pytest.raises(ValueError, match="k must be"):
        vocab_topk(docs, 0)


def test_topk_plan_is_take_ordered(spark, docs):
    """The k cut must compile to TakeOrderedAndProject (per-partition
    heap + driver merge), not a global Sort — the difference between
    O(k) and O(|vocab|) driver/exchange footprint at 100 TB. The
    row_number window runs AFTER the cut, on k rows."""
    plan = (vocab_topk(docs, 4).drop("rank")
            ._jdf.queryExecution().executedPlan().toString())
    assert "TakeOrderedAndProject" in plan
