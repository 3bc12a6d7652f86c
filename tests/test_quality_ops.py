"""Round-4 session-5 quality/analysis operators: cross-channel
correlation, benchmark decontamination, and Gopher-style repetition
signals. Each pinned against independent scalar references (numpy /
pure-python), plus the determinism and degenerate-input properties the
docstrings promise."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.operators.dedup import contamination
from cesium_spark.operators.seriesstats import channel_corr
from cesium_spark.operators.textstats import repetition_stats


# ---------------------------------------------------------------------------
# channel_corr
# ---------------------------------------------------------------------------


def _two_channel_df(spark, ya, yb, conv="c", drop_b_turn0=False):
    rows = []
    for i, v in enumerate(ya):
        rows.append((conv, "a", i, float(i), float(v)))
    for i, v in enumerate(yb):
        if drop_b_turn0 and i == 0:
            continue
        rows.append((conv, "b", i, float(i), float(v)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


def test_channel_corr_exact_signs(spark):
    df = _two_channel_df(spark, [1, 2, 3, 4], [2, 4, 6, 8])
    r = channel_corr(df, "a", "b").collect()[0]
    assert r["r"] == pytest.approx(1.0, abs=1e-12)
    assert r["n_pairs"] == 4
    df = _two_channel_df(spark, [1, 2, 3, 4], [8, 6, 4, 2])
    assert channel_corr(df, "a", "b").collect()[0]["r"] == \
        pytest.approx(-1.0, abs=1e-12)


def test_channel_corr_matches_numpy(spark):
    rng = np.random.default_rng(11)
    ya, yb = rng.normal(size=200), rng.normal(size=200)
    r = channel_corr(_two_channel_df(spark, ya, yb), "a", "b").collect()[0]
    assert r["r"] == pytest.approx(np.corrcoef(ya, yb)[0, 1], abs=1e-9)
    assert r["mean_a"] == pytest.approx(ya.mean(), abs=1e-9)
    assert r["mean_b"] == pytest.approx(yb.mean(), abs=1e-9)


def test_channel_corr_alignment_and_degenerates(spark):
    # turn 0 present only in channel a -> dropped (pairwise-complete);
    # remaining pairs correlate over turns 1..3 only
    ya, yb = [9, 1, 2, 3], [0, 2, 4, 6]
    df = _two_channel_df(spark, ya, yb, drop_b_turn0=True)
    r = channel_corr(df, "a", "b").collect()[0]
    assert r["n_pairs"] == 3
    assert r["r"] == pytest.approx(1.0, abs=1e-12)
    # constant channel -> NULL (try_divide), never a throw under ANSI
    const = _two_channel_df(spark, [5, 5, 5], [1, 2, 3])
    assert channel_corr(const, "a", "b").collect()[0]["r"] is None
    with pytest.raises(ValueError):
        channel_corr(df, "a", "a")


# ---------------------------------------------------------------------------
# contamination
# ---------------------------------------------------------------------------


def _docs(spark, texts, start_id=0):
    return spark.createDataFrame(pd.DataFrame(
        {"doc_id": range(start_id, start_id + len(texts)), "text": texts}))


def test_contamination_flags_planted_overlap(spark):
    ev = _docs(spark, ["the quick brown fox jumps over the lazy dog"], 100)
    docs = _docs(spark, [
        # shares "the quick brown fox" AND "quick brown fox jumps"
        "said the QUICK Brown fox JUMPS loudly",
        "completely unrelated text about spark partitions here",
        "too short",                               # < n tokens: clean
        "fox jumps over the",                      # exactly one shingle, hit
    ])
    got = {r["doc_id"]: r for r in contamination(docs, ev, n=4).collect()}
    assert got[0]["contaminated"] and got[0]["n_hits"] == 2
    assert not got[1]["contaminated"] and got[1]["n_hits"] == 0
    assert got[2]["n_shingles"] == 0 and not got[2]["contaminated"]
    assert got[3]["n_shingles"] == 1 and got[3]["n_hits"] == 1
    assert len(got) == 4                           # every row accounted for


def test_contamination_scalar_reference(spark):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 25)))
             for _ in range(60)]
    evtexts = [" ".join(rng.choice(vocab, size=15)) for _ in range(5)]
    n = 3

    def sh(t):
        toks = t.lower().split()
        return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}

    evset = set().union(*[sh(t) for t in evtexts])
    exp = {i: (len(sh(t)), len(sh(t) & evset)) for i, t in enumerate(texts)}
    got = {r["doc_id"]: (r["n_shingles"], r["n_hits"])
           for r in contamination(_docs(spark, texts),
                                  _docs(spark, evtexts, 1000),
                                  n=n).collect()}
    assert got == exp


def test_contamination_empty_eval_and_bad_n(spark):
    docs = _docs(spark, ["a b c d e"])
    ev = _docs(spark, ["xx"], 10).where("doc_id < 0")   # empty eval set
    out = contamination(docs, ev, n=2).collect()
    assert out[0]["n_hits"] == 0 and not out[0]["contaminated"]
    assert out[0]["n_shingles"] == 4
    with pytest.raises(ValueError):
        contamination(docs, ev, n=0)


# ---------------------------------------------------------------------------
# repetition_stats
# ---------------------------------------------------------------------------


def test_repetition_hand_computed(spark):
    text = "a\na\nb"          # 3 lines, 'a' duplicated
    r = repetition_stats(_docs(spark, [text])).collect()[0]
    assert r["n_lines"] == 3
    assert r["dup_line_frac"] == pytest.approx((3 - 2) / 3)
    # chars on duplicated lines: both 'a' occurrences count = 2 of 3
    assert r["dup_line_char_frac"] == pytest.approx(2 / 3)
    # grams of "a a b": "a a" x1, "a b" x1 -> tie broken gram ASC
    assert r["top_gram"] == "a a" and r["top_gram_cnt"] == 1

    text2 = "x y x y x"       # grams: x y, y x, x y, y x -> tie, "x y"
    r2 = repetition_stats(_docs(spark, [text2])).collect()[0]
    assert (r2["top_gram"], r2["top_gram_cnt"]) == ("x y", 2)
    assert r2["top_gram_frac"] == pytest.approx(2 * 3 / 9)
    assert r2["dup_line_frac"] == 0.0 and r2["n_lines"] == 1


def test_repetition_degenerates_and_blank_lines(spark):
    rows = repetition_stats(_docs(spark, [
        "",                    # empty: no lines, no grams -> NULLs
        "   \n\t\n  ",         # whitespace-only lines filtered out
        "single",              # one token: no grams
    ])).collect()
    by = {r["doc_id"]: r for r in rows}
    assert by[0]["n_lines"] == 0 and by[0]["dup_line_frac"] is None
    assert by[0]["top_gram"] is None and by[0]["top_gram_frac"] is None
    assert by[1]["n_lines"] == 0
    assert by[2]["n_lines"] == 1 and by[2]["top_gram"] is None
    assert by[2]["dup_line_frac"] == 0.0


def test_repetition_scalar_reference_and_partition_invariance(spark):
    rng = np.random.default_rng(5)
    vocab = ["aa", "bb", "cc"]
    texts = []
    for _ in range(40):
        lines = [" ".join(rng.choice(vocab, size=rng.integers(1, 6)))
                 for _ in range(rng.integers(1, 8))]
        texts.append("\n".join(lines))

    def ref(t):
        lines = [x for x in t.split("\n") if x.strip()]
        toks = [x for x in t.strip().lower().split() if x]
        grams = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
        from collections import Counter
        lc, gc = Counter(lines), Counter(grams)
        n_lines = len(lines)
        dup_lf = (n_lines - len(lc)) / n_lines if n_lines else None
        line_chars = sum(c * len(u) for u, c in lc.items())
        dup_chars = sum(c * len(u) for u, c in lc.items() if c >= 2)
        dup_cf = dup_chars / line_chars if line_chars else None
        top = min(gc.items(), key=lambda kv: (-kv[1], kv[0])) if gc else None
        return (n_lines, round(dup_lf, 9) if dup_lf is not None else None,
                round(dup_cf, 9) if dup_cf is not None else None,
                top[0] if top else None, top[1] if top else None)

    exp = {i: ref(t) for i, t in enumerate(texts)}
    df = _docs(spark, texts).repartition(7)
    got = {r["doc_id"]: (r["n_lines"],
                         round(r["dup_line_frac"], 9)
                         if r["dup_line_frac"] is not None else None,
                         round(r["dup_line_char_frac"], 9)
                         if r["dup_line_char_frac"] is not None else None,
                         r["top_gram"], r["top_gram_cnt"])
           for r in repetition_stats(df).collect()}
    assert got == exp
    with pytest.raises(ValueError):
        repetition_stats(df, gram_n=1)


# ---------------------------------------------------------------------------
# winnowing_pairs
# ---------------------------------------------------------------------------


def test_winnowing_pairs_finds_verbatim_overlap(spark):
    from cesium_spark.operators.textstats import winnowing_pairs
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = _docs(spark, [
        shared,                                     # 0
        shared + " extra trailing words here now",  # 1: contains 0
        "totally different text with no overlap at all whatsoever ok",
        shared,                                     # 3: exact dup of 0
    ])
    pairs = {(r["id_a"], r["id_b"]): r
             for r in winnowing_pairs(docs, threshold=0.5).collect()}
    assert (0, 3) in pairs and pairs[(0, 3)]["containment"] == 1.0
    assert (0, 1) in pairs          # coverage theorem: long shared run
    assert (1, 3) in pairs
    assert not any(2 in p for p in pairs)


def test_winnowing_pairs_df_cap_drops_boilerplate(spark):
    from cesium_spark.operators.textstats import winnowing_pairs
    boiler = "standard legal disclaimer text appended to every document"
    docs = _docs(spark, [f"unique{i} content{i} number{i} " * 3 + boiler
                         for i in range(8)])
    capped = winnowing_pairs(docs, max_df=4, threshold=0.3).collect()
    uncapped = winnowing_pairs(docs, max_df=None, threshold=0.3).collect()
    # the shared boilerplate suffix pairs everything without the cap
    assert len(uncapped) == 8 * 7 / 2
    assert len(capped) == 0


# ---------------------------------------------------------------------------
# gauge_delta / channel_xcorr
# ---------------------------------------------------------------------------


def test_gauge_delta_hand_computed(spark):
    import datetime as dt
    from cesium_spark.operators.rates import gauge_delta
    rows = [
        # bucket h0: y walks 10 -> 4 -> 7 (delta -3, idelta +3)
        ("c", 0, dt.datetime(2024, 1, 1, 0, 0), 10.0),
        ("c", 1, dt.datetime(2024, 1, 1, 0, 10), 4.0),
        ("c", 2, dt.datetime(2024, 1, 1, 0, 50), 7.0),
        # bucket h1: single point -> delta 0, idelta NULL (the adjacent
        # pair crosses the bucket boundary and must NOT count)
        ("c", 3, dt.datetime(2024, 1, 1, 1, 30), 9.0),
    ]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts", "y"])
    pdf["channel"] = "v"
    pdf["t"] = pdf["turn_idx"] * 60.0
    df = spark.createDataFrame(
        pdf[["conv_id", "channel", "turn_idx", "ts", "t", "y"]])
    got = {r["bucket"].hour: r for r in gauge_delta(df, "1h").collect()}
    assert got[0]["delta"] == -3.0 and got[0]["idelta"] == 3.0
    assert got[0]["n"] == 3
    assert got[1]["delta"] == 0.0 and got[1]["idelta"] is None
    with pytest.raises(ValueError):
        gauge_delta(df, "5m")


def test_channel_xcorr_recovers_planted_lead(spark):
    from cesium_spark.operators.seriesstats import channel_xcorr
    rng = np.random.default_rng(8)
    n = 300
    b = rng.normal(size=n)
    a = np.roll(b, 2)          # a_t = b_{t-2}  =>  b LEADS a by 2
    a[:2] = rng.normal(size=2)
    df = _two_channel_df(spark, a, b)
    r = channel_xcorr(df, "a", "b", max_lag=3).collect()[0]
    # a_t = b_{t-2}: b's PAST predicts a -> r_m2 = corr(a_t, b_{t-2})
    # ~ 1 at the planted relation; all other lags ~ 0
    assert r["r_m2"] == pytest.approx(1.0, abs=0.05)
    for c in ("r_m3", "r_m1", "r_0", "r_p1", "r_p2", "r_p3"):
        assert abs(r[c]) < 0.2, c
    # numpy reference for one lag: pairwise-complete corr at k=+1
    exp = np.corrcoef(a[:-1], b[1:])[0, 1]
    assert r["r_p1"] == pytest.approx(exp, abs=1e-9)
    with pytest.raises(ValueError):
        channel_xcorr(df, "a", "a", 2)
    with pytest.raises(ValueError):
        channel_xcorr(df, "a", "b", 0)


# ---------------------------------------------------------------------------
# score_linear
# ---------------------------------------------------------------------------


def test_score_linear_matches_sklearn_form(spark):
    from cesium_spark.operators.scoring import score_linear
    rng = np.random.default_rng(13)
    X = rng.normal(size=(100, 3))
    w = {"f0": 0.7, "f1": -1.2, "f2": 0.4}
    b = 0.3
    df = spark.createDataFrame(pd.DataFrame(
        {"rid": range(100), "f0": X[:, 0], "f1": X[:, 1], "f2": X[:, 2]}))
    got = {r["rid"]: r["score"]
           for r in score_linear(df, w, b).collect()}
    z = b + X @ np.array([0.7, -1.2, 0.4])
    exp = 1.0 / (1.0 + np.exp(-z))
    for i in range(100):
        assert got[i] == pytest.approx(exp[i], abs=1e-12)
    ident = score_linear(df, w, b, link="identity").collect()
    for r in ident:
        assert r["score"] == pytest.approx(z[r["rid"]], abs=1e-12)


def test_score_linear_null_feature_scores_null(spark):
    from cesium_spark.operators.scoring import score_linear
    df = spark.createDataFrame(pd.DataFrame(
        {"rid": [0, 1], "f0": [1.0, None]}))
    got = {r["rid"]: r["score"]
           for r in score_linear(df, {"f0": 2.0}).collect()}
    assert got[0] is not None and got[1] is None
    with pytest.raises(ValueError):
        score_linear(df, {})
    with pytest.raises(ValueError):
        score_linear(df, {"f0": 1.0}, link="probit")


# ---------------------------------------------------------------------------
# curation composition (quality x repetition x contamination x split)
# ---------------------------------------------------------------------------


def test_curation_chain_gates_compose(spark):
    """The operators compose the way q_doc_curate chains them: a clean
    doc passes every gate, and each dirty doc is rejected by exactly
    the gate built for it."""
    from cesium_spark.operators.dedup import contamination
    from cesium_spark.operators.sampling import hash_split
    from cesium_spark.operators.textstats import (
        quality_score,
        repetition_stats,
    )
    clean = ("the data pipeline processed many records and wrote the "
             "results to a table for the analysts on the team")
    bench = ("question seventeen asks about the gradient of the loss "
             "surface near a saddle point")
    docs = _docs(spark, [
        clean,                                        # 0: passes
        "x",                                          # 1: low quality
        ("spam spam spam spam spam spam spam spam spam spam "
         "spam spam spam spam spam spam"),            # 2: repetition
        # 3: quotes a benchmark 4-gram verbatim -> contaminated
        clean + " see the gradient of the loss surface discussion",
    ])
    ev = _docs(spark, [bench], 100)
    q = quality_score(docs).select("doc_id", "quality_score")
    rep = repetition_stats(docs).select("doc_id", "top_gram_frac")
    con = contamination(docs, ev, n=4).select("doc_id", "contaminated")
    j = {r["doc_id"]: r for r in
         q.join(rep, "doc_id").join(con, "doc_id").collect()}
    assert j[0]["quality_score"] >= 0.5 and not j[0]["contaminated"]
    assert j[0]["top_gram_frac"] < 0.25
    assert j[1]["quality_score"] < 0.5
    assert j[2]["top_gram_frac"] > 0.25
    assert j[3]["contaminated"]
    kept = docs.where(F.col("doc_id") == 0)
    split = hash_split(kept, {"train": 0.8, "val": 0.2},
                       key="doc_id", salt="s").collect()
    assert len(split) == 1 and split[0]["split"] in ("train", "val")
