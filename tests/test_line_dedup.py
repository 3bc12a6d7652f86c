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


# --- substring_pairs (r5: Lee 2022 exact-substring at pair grain) ----------

def test_substring_pairs_planted_exact_length(spark):
    import pandas as pd
    from cesium_spark.operators.dedup import substring_pairs
    base = " ".join(f"w{i}" for i in range(100))
    insert = " ".join(f"w{i}" for i in range(20, 80))   # 60-token run
    planted = "junka junkb " + insert + " junkc"
    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": [base, planted, "zz yy xx", base]}))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": [1, 1, 1], "id_b": [2, 3, 4]}))
    out = {r["id_b"]: r for r in
           substring_pairs(docs, pairs, min_run=50).collect()}
    # the planted insertion is found at its EXACT length and position
    r = out[2]
    assert r["max_run"] == 60 and r["is_dup"]
    assert (r["a_start"], r["b_start"]) == (20, 2)
    # disjoint pair: run 0, NULL starts, not a dup
    assert out[3]["max_run"] == 0 and out[3]["a_start"] is None
    assert not out[3]["is_dup"]
    # identical docs: the whole doc is the run, starting at (0, 0)
    assert out[4]["max_run"] == 100
    assert (out[4]["a_start"], out[4]["b_start"]) == (0, 0)


def test_substring_pairs_tie_break_and_cap(spark):
    import pandas as pd
    from cesium_spark.operators.dedup import substring_pairs
    # two disjoint maximal runs of length 3: ('p q r' at a=0/b=4 and
    # 'x y z' at a=4/b=0) -> lexicomin (a_start, b_start) = (0, 4)
    a = "p q r GAP1 x y z"
    b = "x y z GAP2 p q r"
    docs = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2], "text": [a, b]}))
    pairs = spark.createDataFrame(pd.DataFrame(
        {"id_a": [1], "id_b": [2]}))
    [r] = substring_pairs(docs, pairs, min_run=3).collect()
    assert r["max_run"] == 3 and r["is_dup"]
    assert (r["a_start"], r["b_start"]) == (0, 4)
    # cap: only the first max_tokens tokens are scanned, flagged
    long_a = " ".join(f"t{i}" for i in range(30))
    long_b = " ".join(f"t{i}" for i in range(30))
    docs2 = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1, 2], "text": [long_a, long_b]}))
    [rc] = substring_pairs(docs2, pairs, min_run=5,
                           max_tokens=10).collect()
    assert rc["capped_a"] and rc["capped_b"]
    assert (rc["n_a"], rc["n_b"]) == (30, 30)      # pre-cap counts
    assert rc["max_run"] == 10                     # run bounded by cap
    with pytest.raises(ValueError, match="max_tokens"):
        substring_pairs(docs2, pairs, min_run=50, max_tokens=10)
