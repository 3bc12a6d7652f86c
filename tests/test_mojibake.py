"""Encoding-damage detection (mojibake_stats)."""
from __future__ import annotations

import pandas as pd

from cesium_spark.operators.textstats import mojibake_stats


def _docs(spark, texts):
    return spark.createDataFrame(pd.DataFrame({
        "doc_id": range(len(texts)), "text": texts}))


def test_each_signal_counted_separately(spark):
    texts = [
        "clean english text with no damage at all",
        "cafÃ© and naÃ¯ve",          # 2 double-utf8
        "itâ€™s broken â€œquoted",  # 2 digraphs
        "lost bytes ��� here",               # 3 replacement
        "c1 control\x85here and\x91there",                  # 2 C1
        "",                                                  # empty
    ]
    out = {r.doc_id: r for r in
           mojibake_stats(_docs(spark, texts)).collect()}
    assert (out[0].n_replacement, out[0].n_double_utf8, out[0].n_c1) \
        == (0, 0, 0)
    assert out[0].is_damaged is False
    assert out[1].n_double_utf8 == 2 and out[1].n_replacement == 0
    assert out[2].n_double_utf8 == 2
    assert out[3].n_replacement == 3 and out[3].is_damaged is True
    assert out[4].n_c1 == 2
    assert out[5].mojibake_per_kchar is None
    assert out[5].is_damaged is None


def test_rate_formula_and_threshold(spark):
    # 40 chars, one FFFD → 3*1000/40 = 75 per kchar
    t = "x" * 39 + "�"
    out = mojibake_stats(_docs(spark, [t])).collect()[0]
    assert out.n_chars == 40
    assert out.mojibake_per_kchar == 75.0
    assert out.is_damaged is True
    # long clean doc with one heuristic digraph stays under threshold 1.0
    t2 = "y" * 5000 + "Ã©"
    out2 = mojibake_stats(_docs(spark, [t2])).collect()[0]
    assert out2.n_double_utf8 == 1 and out2.is_damaged is False


def test_bare_a_circumflex_not_counted_without_euro(spark):
    # 'â' alone (legit French) must NOT trip the cp1252 digraph
    out = mojibake_stats(_docs(spark, ["gâteau français"])
                         ).collect()[0]
    assert out.n_double_utf8 == 0 and out.is_damaged is False


def test_zero_shuffle_plan(spark):
    df = mojibake_stats(_docs(spark, ["abc"]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
