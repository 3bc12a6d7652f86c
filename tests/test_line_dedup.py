"""Boilerplate line removal (dedup.line_dedup)."""
from __future__ import annotations

import pandas as pd
import pytest

from cesium_spark.operators.dedup import line_dedup


def _docs(spark, texts):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))


def test_hot_lines_removed_order_preserved(spark):
    footer = "All rights reserved."
    texts = [f"body {i}\nmiddle {i}\n{footer}" for i in range(5)]
    texts.append(f"{footer}\nunique closing")   # footer at the TOP
    out = {r.doc_id: r for r in
           line_dedup(_docs(spark, texts), min_docs=4).collect()}
    for i in range(5):
        assert out[i].text_clean == f"body {i}\nmiddle {i}"
        assert (out[i].n_lines, out[i].n_removed) == (3, 1)
    assert out[5].text_clean == "unique closing"


def test_trimmed_matching_keeps_original_text(spark):
    # '  hot  ' and 'hot' are the same line for MATCHING, but kept
    # lines come back untrimmed
    texts = ["  hot  \nkeep A", "hot\nkeep B", "hot \nkeep C",
             "cold\nkeep D"]
    out = {r.doc_id: r for r in
           line_dedup(_docs(spark, texts), min_docs=3).collect()}
    assert out[0].text_clean == "keep A"
    assert out[3].text_clean == "cold\nkeep D"


def test_empty_lines_never_boilerplate(spark):
    texts = ["a\n\nb", "c\n\nd", "e\n\nf", "g\n\nh"]
    out = line_dedup(_docs(spark, texts), min_docs=2).collect()
    for r in out:
        assert r.n_removed == 0
        assert "\n\n" in r.text_clean   # paragraph break intact


def test_all_boilerplate_doc_keeps_empty_row(spark):
    texts = ["spam"] * 4 + ["spam\nreal content"]
    out = {r.doc_id: r for r in
           line_dedup(_docs(spark, texts), min_docs=3).collect()}
    assert len(out) == 5
    for i in range(4):
        assert out[i].text_clean == "" and out[i].n_removed == 1
    assert out[4].text_clean == "real content"


def test_per_doc_duplicates_dont_cross_threshold(spark):
    # the SAME line 10x inside ONE doc is 1 distinct doc, not 10
    texts = ["x\n" * 10 + "tail", "other"]
    out = {r.doc_id: r for r in
           line_dedup(_docs(spark, texts), min_docs=2).collect()}
    assert out[0].n_removed == 0


def test_validation(spark):
    with pytest.raises(ValueError, match="min_docs"):
        line_dedup(_docs(spark, ["a"]), min_docs=1)


def test_hot_set_broadcast_in_plan(spark):
    df = line_dedup(_docs(spark, ["a\nb", "a\nc", "a\nd"]), min_docs=2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
