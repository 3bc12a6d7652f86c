"""Round-4 session-6 operators: AR(1) Yule–Walker fit (and the rest of
this session's batch as they land). Exact values pinned against
independent numpy references; degenerate inputs and plan shape
asserted."""

from __future__ import annotations

import datetime as dt
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.operators.seriesstats import ar1_fit

EPOCH = dt.datetime(2024, 1, 1)


def _series(spark, ys, conv="c", channel="v"):
    pdf = pd.DataFrame({
        "conv_id": [conv] * len(ys), "channel": [channel] * len(ys),
        "turn_idx": range(len(ys)),
        "t": [float(i) * 10 for i in range(len(ys))],
        "y": [float(v) for v in ys]})
    pdf["ts"] = pdf["t"].map(lambda s: EPOCH + dt.timedelta(seconds=s))
    return spark.createDataFrame(
        pdf[["conv_id", "channel", "turn_idx", "ts", "t", "y"]])


def _ar1_ref(y: np.ndarray) -> dict:
    ybar = y.mean()
    d = y - ybar
    num = float((d[1:] * d[:-1]).sum())
    den = float((d * d).sum())
    phi = num / den
    var = float(d.var())
    return {
        "ybar": ybar, "phi": phi,
        "intercept": ybar * (1 - phi),
        "sigma2": (1 - phi * phi) * var,
        "forecast": ybar + phi * (y[-1] - ybar),
    }


# ---------------------------------------------------------------------------
# ar1_fit
# ---------------------------------------------------------------------------


def test_ar1_matches_numpy_reference(spark):
    rng = np.random.default_rng(7)
    # genuinely autocorrelated series: AR(1) with known phi
    y = np.zeros(200)
    for i in range(1, 200):
        y[i] = 5.0 + 0.7 * (y[i - 1] - 5.0) + rng.normal(0, 1.0)
    out = ar1_fit(_series(spark, y)).toPandas().iloc[0]
    ref = _ar1_ref(y)
    for k, v in ref.items():
        assert out[k] == pytest.approx(v, abs=1e-9), k
    # the fitted phi actually recovers the planted coefficient
    assert abs(out["phi"] - 0.7) < 0.15
    assert out["n"] == 200


def test_ar1_multi_series_independent(spark):
    rng = np.random.default_rng(3)
    ya = rng.normal(0, 1, 50)
    yb = np.cumsum(rng.normal(0, 1, 80))  # near-unit-root: phi ≈ 1
    df = _series(spark, ya, conv="a").union(_series(spark, yb, conv="b"))
    out = (ar1_fit(df).toPandas()
           .set_index("conv_id").sort_index())
    for conv, y in (("a", ya), ("b", yb)):
        ref = _ar1_ref(y)
        for k, v in ref.items():
            assert out.loc[conv, k] == pytest.approx(v, abs=1e-9), (conv, k)
    assert out.loc["b", "phi"] > 0.8  # random walk is sticky


def test_ar1_degenerates_null_not_fake(spark):
    # constant series: zero denominator → NULL phi, NOT 0 or a crash
    const = ar1_fit(_series(spark, [4.0] * 10)).toPandas().iloc[0]
    assert pd.isna(const["phi"]) and pd.isna(const["forecast"])
    assert const["ybar"] == 4.0
    # single point: no pairs → NULL
    single = ar1_fit(_series(spark, [2.5])).toPandas().iloc[0]
    assert pd.isna(single["phi"])
    assert single["n"] == 1


def test_ar1_plan_one_exchange(spark):
    df = ar1_fit(_series(spark, np.arange(30.0)))
    df.collect()
    # AQE toString prints Final AND Initial plan — audit the final only
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "Cartesian" not in p and "Join" not in p


# ---------------------------------------------------------------------------
# role_transitions / funnel
# ---------------------------------------------------------------------------

from cesium_spark.operators.sequences import funnel, role_transitions  # noqa: E402


def _transcript(spark, seqs: dict):
    rows = [(c, i, r) for c, roles in seqs.items()
            for i, r in enumerate(roles)]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string")


def test_transitions_hand_counts(spark):
    tr = _transcript(spark, {
        "a": ["u", "b", "u", "b"],        # u→b ×2, b→u ×1
        "b": ["u", "u", "b"],             # u→u ×1, u→b ×1
    })
    out = (role_transitions(tr).toPandas()
           .set_index(["role", "next_role"]).sort_index())
    assert out.loc[("u", "b"), "n_trans"] == 3
    assert out.loc[("b", "u"), "n_trans"] == 1
    assert out.loc[("u", "u"), "n_trans"] == 1
    assert out.loc[("u", "b"), "n_from"] == 4
    assert out.loc[("u", "b"), "p"] == pytest.approx(0.75)
    # row-stochastic: probabilities out of each role sum to 1
    sums = out.groupby("role")["p"].sum()
    assert (abs(sums - 1.0) < 1e-12).all()


def test_transitions_null_roles_excluded(spark):
    tr = _transcript(spark, {"a": ["u", None, "b", "u"]})
    out = role_transitions(tr).toPandas()
    # NULL breaks the chain on both sides: u→NULL and NULL→b dropped
    assert set(zip(out["role"], out["next_role"])) == {("b", "u")}


def test_funnel_hand_cases(spark):
    tr = _transcript(spark, {
        "full": ["view", "x", "click", "purchase"],
        "wrong_order": ["click", "view", "purchase"],
        "greedy": ["view", "view", "click"],
        "nothing": ["x", "y"],
    })
    out = (funnel(tr, ["view", "click", "purchase"]).toPandas()
           .set_index("conv_id"))
    assert out.loc["full", ["depth", "step_1", "step_2", "step_3"]].tolist() \
        == [3, 0, 2, 3]
    # strictly-after: the click at turn 0 precedes the view → only the
    # view matches (purchase can't skip the unmatched click step)
    r = out.loc["wrong_order"]
    assert r["depth"] == 1 and r["step_1"] == 1
    assert pd.isna(r["step_2"]) and pd.isna(r["step_3"])
    assert out.loc["nothing", "depth"] == 0
    assert pd.isna(out.loc["nothing", "step_1"])
    g = out.loc["greedy"]
    assert g["depth"] == 2 and g["step_1"] == 0 and g["step_2"] == 2


def test_funnel_matches_scalar_reference(spark):
    rng = np.random.default_rng(11)
    roles = ["view", "click", "purchase", "x", "y"]
    seqs = {f"c{i}": [roles[j] for j in rng.integers(0, 5, rng.integers(1, 30))]
            for i in range(60)}
    steps = ["view", "click", "purchase"]

    def ref(seq):
        depth, turns = 0, [None, None, None]
        for i, r in enumerate(seq):
            if depth < 3 and r == steps[depth]:
                turns[depth] = i
                depth += 1
        return depth, turns

    out = funnel(_transcript(spark, seqs), steps).toPandas() \
        .set_index("conv_id")
    for c, seq in seqs.items():
        d, turns = ref(seq)
        assert out.loc[c, "depth"] == d, c
        for k in range(3):
            got = out.loc[c, f"step_{k + 1}"]
            assert (pd.isna(got) and turns[k] is None) or got == turns[k], c


def test_funnel_validation_and_plan(spark):
    tr = _transcript(spark, {"a": ["u", "b"]})
    with pytest.raises(ValueError, match=">= 2 steps"):
        funnel(tr, ["u"])
    with pytest.raises(ValueError, match="distinct"):
        funnel(tr, ["u", "u"])
    df = funnel(tr, ["u", "b"])
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "Join" not in p


# ---------------------------------------------------------------------------
# lexical_stats
# ---------------------------------------------------------------------------

from cesium_spark.operators.textstats import lexical_stats  # noqa: E402


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)],
        "doc_id long, text string")


def test_lexical_hand_values(spark):
    out = (lexical_stats(_docs(spark, [
        "a b a b",          # 2 types × 2 → H = 1 bit, ttr .5, hapax 0
        "a a a a",          # degenerate → H = 0
        "w x y z",          # uniform singletons → H = 2 bits, hapax 1
        "tok",              # single token → H = 0 exactly
    ])).toPandas().set_index("doc_id").sort_index())
    assert out.loc[0, "entropy_bits"] == pytest.approx(1.0, abs=1e-12)
    assert out.loc[0, "type_token_ratio"] == 0.5
    assert out.loc[0, "hapax_frac"] == 0.0
    assert out.loc[1, "entropy_bits"] == pytest.approx(0.0, abs=1e-12)
    assert out.loc[2, "entropy_bits"] == pytest.approx(2.0, abs=1e-12)
    assert out.loc[2, "hapax_frac"] == 1.0
    assert out.loc[3, "entropy_bits"] == 0.0  # exact, not ~0


def test_lexical_empty_doc_keeps_row(spark):
    out = (lexical_stats(_docs(spark, ["a b", "", None, "   "]))
           .toPandas().set_index("doc_id").sort_index())
    assert len(out) == 4  # nothing vanishes
    for i in (1, 2, 3):
        assert out.loc[i, "n_tokens"] == 0 and out.loc[i, "n_types"] == 0
        assert pd.isna(out.loc[i, "entropy_bits"])
        assert pd.isna(out.loc[i, "type_token_ratio"])
        assert pd.isna(out.loc[i, "hapax_frac"])


def test_lexical_matches_scipy_style_reference(spark):
    rng = np.random.default_rng(5)
    vocab = [f"w{i}" for i in range(40)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(1, 300)))
             for _ in range(30)]
    out = (lexical_stats(_docs(spark, texts)).toPandas()
           .set_index("doc_id").sort_index())
    for i, t in enumerate(texts):
        toks = t.lower().split()
        vals, cnt = np.unique(toks, return_counts=True)
        p = cnt / cnt.sum()
        h = float(-(p * np.log2(p)).sum())
        assert out.loc[i, "n_tokens"] == len(toks)
        assert out.loc[i, "n_types"] == len(vals)
        assert out.loc[i, "entropy_bits"] == pytest.approx(h, abs=1e-9)
        assert out.loc[i, "hapax_frac"] == pytest.approx(
            (cnt == 1).sum() / len(vals), abs=1e-12)


def test_lexical_plan_two_exchanges_no_join(spark):
    df = lexical_stats(_docs(spark, ["a b c", "b c d"]))
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 2
    assert "Join" not in p and "Cartesian" not in p


# ---------------------------------------------------------------------------
# drift_psi
# ---------------------------------------------------------------------------

from cesium_spark.operators.seriesstats import drift_psi  # noqa: E402


def _tseries(spark, ys_ref, ys_cur, channel="v"):
    rows = []
    for i, y in enumerate(ys_ref):
        rows.append(("c", channel, i, dt.datetime(2024, 1, 1), 0.0, float(y)))
    for i, y in enumerate(ys_cur):
        rows.append(("c", channel, i, dt.datetime(2024, 2, 1), 0.0, float(y)))
    return spark.createDataFrame(
        rows, "conv_id string, channel string, turn_idx int, "
              "ts timestamp, t double, y double")


def _drift_ref(ys_ref, ys_cur, edges, alpha):
    nb = len(edges) + 1

    def counts(ys):
        c = np.zeros(nb)
        for y in ys:
            b = nb - 1
            for i, e in enumerate(edges):
                if y <= e:
                    b = i
                    break
            c[b] += 1
        return c

    cr, cc = counts(ys_ref), counts(ys_cur)
    p = (cr + alpha) / (cr.sum() + alpha * nb)
    q = (cc + alpha) / (cc.sum() + alpha * nb)
    return (float(((p - q) * np.log(p / q)).sum()),
            float((p * np.log(p / q)).sum()),
            float(np.abs(p - q).sum() / 2))


def test_drift_matches_numpy_reference_with_absent_buckets(spark):
    rng = np.random.default_rng(9)
    edges = [2.0, 4.0, 6.0, 8.0]
    # planted shift +3: several buckets absent on one side each
    ys_ref = rng.normal(3, 1, 400)
    ys_cur = rng.normal(6, 1, 300)
    out = drift_psi(_tseries(spark, ys_ref, ys_cur),
                    "2024-01-16 00:00:00", edges).toPandas().iloc[0]
    psi, kl, tvd = _drift_ref(ys_ref, ys_cur, edges, 0.5)
    assert out["psi"] == pytest.approx(psi, abs=1e-12)
    assert out["kl"] == pytest.approx(kl, abs=1e-12)
    assert out["tvd"] == pytest.approx(tvd, abs=1e-12)
    assert out["n_ref"] == 400 and out["n_cur"] == 300
    assert out["psi"] > 0.25  # the planted shift actually fires the alarm


def test_drift_identical_windows_exact_zero(spark):
    ys = list(range(20))
    out = drift_psi(_tseries(spark, ys, ys), "2024-01-16 00:00:00",
                    [5.0, 10.0, 15.0]).toPandas().iloc[0]
    assert out["psi"] == 0.0 and out["kl"] == 0.0 and out["tvd"] == 0.0


def test_drift_empty_reference_window_finite(spark):
    out = drift_psi(_tseries(spark, [], [1.0, 2.0, 3.0]),
                    "2024-01-16 00:00:00", [2.0]).toPandas().iloc[0]
    assert out["n_ref"] == 0 and out["n_cur"] == 3
    assert np.isfinite(out["psi"]) and np.isfinite(out["kl"])


def test_drift_validation_and_plan(spark):
    df_in = _tseries(spark, [1.0], [2.0])
    with pytest.raises(ValueError, match="alpha"):
        drift_psi(df_in, "2024-01-16 00:00:00", [2.0], alpha=0.0)
    df = drift_psi(df_in, "2024-01-16 00:00:00", [2.0])
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(re.findall(r"Exchange hashpartitioning", p)) == 2
    assert "Join" not in p


# ---------------------------------------------------------------------------
# unpivot_long
# ---------------------------------------------------------------------------

from cesium_spark.operators.rollup import pivot_wide, unpivot_long  # noqa: E402


def test_unpivot_roundtrips_pivot_incl_nulls(spark):
    long_rows = [
        ("c1", "v", "1d", "2024-01-01", "mean", 1.5),
        ("c1", "v", "1d", "2024-01-01", "std", 0.5),
        ("c2", "v", "1d", "2024-01-01", "mean", 2.0),
        ("c2", "v", "1d", "2024-01-01", "std", None),  # degenerate
    ]
    long_df = spark.createDataFrame(
        long_rows, "conv_id string, channel string, tier string, "
                   "window_start string, feature string, value double")
    wide = pivot_wide(long_df, ["mean", "std"])
    back = unpivot_long(wide, ["mean", "std"]).toPandas()
    key = ["conv_id", "feature"]
    back = back.sort_values(key).reset_index(drop=True)
    # NULL std for c2 survives as an explicit row, not a dropped one
    assert len(back) == 4
    c2std = back[(back.conv_id == "c2") & (back.feature == "std")]
    assert len(c2std) == 1 and pd.isna(c2std["value"].iloc[0])
    c1 = back[back.conv_id == "c1"].set_index("feature")["value"]
    assert c1["mean"] == 1.5 and c1["std"] == 0.5


def test_unpivot_validation_and_zero_exchange_plan(spark):
    wide = spark.createDataFrame(
        [("c", "v", "1d", "w", 1.0)],
        "conv_id string, channel string, tier string, "
        "window_start string, mean double")
    with pytest.raises(ValueError, match="at least one"):
        unpivot_long(wide, [])
    with pytest.raises(ValueError, match="not in wide"):
        unpivot_long(wide, ["nope"])
    with pytest.raises(ValueError, match="quotes"):
        unpivot_long(wide, ["a'b"])
    df = unpivot_long(wide, ["mean"])
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert "Exchange" not in p  # pure projection/generator


# ---------------------------------------------------------------------------
# lm_perplexity
# ---------------------------------------------------------------------------

from cesium_spark.operators.textstats import lm_perplexity  # noqa: E402


def _lm_ref(train_texts, score_texts, alpha=0.5):
    from collections import Counter
    uni, bi = Counter(), Counter()
    for t in train_texts:
        toks = t.lower().split()
        uni.update(toks)
        bi.update(zip(toks, toks[1:]))
    V = len(uni)
    out = []
    for t in score_texts:
        toks = t.lower().split()
        pairs = list(zip(toks, toks[1:]))
        if not pairs:
            out.append((0, None, None))
            continue
        h = sum(-np.log2((bi.get(p, 0) + alpha)
                         / (uni.get(p[0], 0) + alpha * V))
                for p in pairs) / len(pairs)
        out.append((len(pairs), h, 2.0 ** h))
    return V, out


def test_lm_ppl_matches_counter_reference(spark):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(25)]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(2, 120)))
             for _ in range(40)]
    out = (lm_perplexity(_docs(spark, texts)).toPandas()
           .set_index("doc_id").sort_index())
    _, ref = _lm_ref(texts, texts)
    for i, (n, h, ppl) in enumerate(ref):
        assert out.loc[i, "n_bigrams"] == n
        assert out.loc[i, "cross_entropy_bits"] == pytest.approx(h, abs=1e-9)
        assert out.loc[i, "ppl"] == pytest.approx(ppl, rel=1e-9)


def test_lm_ppl_separate_train_corpus_and_unseen_history(spark):
    train = ["a b a b a b"]
    score = ["a b", "z z"]  # "z" never seen: P degrades to exactly 1/V
    out = (lm_perplexity(_docs(spark, score),
                         train_docs=_docs(spark, train))
           .toPandas().set_index("doc_id").sort_index())
    V = 2  # train vocab {a, b}
    # seen bigram: P(b|a) = (3 + .5) / (3 + .5*2) = 3.5/4
    assert out.loc[0, "cross_entropy_bits"] == pytest.approx(
        -np.log2(3.5 / 4.0), abs=1e-12)
    # unseen history: P = alpha/(alpha*V) = 1/V exactly
    assert out.loc[1, "cross_entropy_bits"] == pytest.approx(
        np.log2(V), abs=1e-12)


def test_lm_ppl_short_docs_keep_null_row(spark):
    out = (lm_perplexity(_docs(spark, ["a b c", "solo", "", None]))
           .toPandas().set_index("doc_id").sort_index())
    assert len(out) == 4
    for i in (1, 2, 3):
        assert out.loc[i, "n_bigrams"] == 0
        assert pd.isna(out.loc[i, "cross_entropy_bits"])
        assert pd.isna(out.loc[i, "ppl"])


def test_lm_ppl_repetition_scores_lower_than_gibberish(spark):
    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(200)]
    base = [" ".join(rng.choice(vocab, size=100)) for _ in range(20)]
    repeated = " ".join(["the cat sat"] * 40)
    gibberish = " ".join(rng.choice(vocab, size=120))
    out = (lm_perplexity(_docs(spark, base + [repeated, gibberish]))
           .toPandas().set_index("doc_id"))
    assert out.loc[20, "ppl"] < out.loc[21, "ppl"] / 10


def test_lm_ppl_validation(spark):
    with pytest.raises(ValueError, match="alpha"):
        lm_perplexity(_docs(spark, ["a b"]), alpha=0.0)


# ---------------------------------------------------------------------------
# z-order layout
# ---------------------------------------------------------------------------

from cesium_spark.sources.layout import (  # noqa: E402
    cells_for_box,
    read_box,
    write_zordered,
    zorder_cell,
)


@pytest.fixture(scope="module")
def zdata(spark, tmp_path_factory):
    rng = np.random.default_rng(31)
    n = 20000
    pdf = pd.DataFrame({
        "row_id": np.arange(n),
        "x": rng.uniform(0, 100, n),
        "y": rng.uniform(0, 100, n)})
    df = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("zorder") / "tbl")
    write_zordered(df, path, ["x", "y"], [0.0, 0.0], [100.0, 100.0],
                   cell_bits=3)
    return df, path


def test_zorder_box_equals_full_scan(spark, zdata):
    df, path = zdata
    rng = np.random.default_rng(37)
    for _ in range(5):
        lo = rng.uniform(0, 80, 2)
        hi = lo + rng.uniform(1, 20, 2)
        box = {"x": (float(lo[0]), float(hi[0])),
               "y": (float(lo[1]), float(hi[1]))}
        got = set(read_box(spark, path, box, ["x", "y"],
                           [0.0, 0.0], [100.0, 100.0], cell_bits=3)
                  .select("row_id").toPandas()["row_id"])
        exp = set(df.where(
            F.col("x").between(*box["x"]) & F.col("y").between(*box["y"]))
            .select("row_id").toPandas()["row_id"])
        assert got == exp and len(exp) > 0


def test_zorder_prunes_partitions(spark, zdata):
    _, path = zdata

    def files_read(q):
        q.collect()
        ep = q._jdf.queryExecution().executedPlan()

        def leaves(node):
            ch = node.children()
            nn = ch.size() if hasattr(ch, "size") else ch.length()
            if nn == 0:
                yield node
            for i in range(nn):
                yield from leaves(ch.apply(i))

        scan = next(l for l in leaves(ep)
                    if "Scan" in l.getClass().getSimpleName())
        return scan.metrics().apply("numFiles").value()

    total = len(spark.read.parquet(path).inputFiles())
    # tight rectangle: prunes on BOTH dims at once
    rect = read_box(spark, path, {"x": (10.0, 20.0), "y": (55.0, 65.0)},
                    ["x", "y"], [0.0, 0.0], [100.0, 100.0], cell_bits=3)
    assert files_read(rect) <= total / 3
    # y-only band: a layout sorted on x alone cannot prune this AT ALL
    band = read_box(spark, path, {"x": (0.0, 100.0), "y": (40.0, 50.0)},
                    ["x", "y"], [0.0, 0.0], [100.0, 100.0], cell_bits=3)
    assert files_read(band) < total


def test_zorder_cells_and_validation(spark):
    # cell enumeration covers the box with ±1 slack, stays in-grid
    cells = cells_for_box({"x": (0.0, 1.0), "y": (0.0, 1.0)},
                          ["x", "y"], [0.0, 0.0], [8.0, 8.0], cell_bits=3)
    # box hits buckets {0,1} per dim; ±1 slack widens to {0,1,2}² = 9
    assert 0 in cells and len(cells) == 9
    assert all(0 <= c < 64 for c in cells)  # stays inside the 8×8 grid
    with pytest.raises(ValueError, match=">= 2 dimensions"):
        zorder_cell(["x"], [0.0], [1.0], 4)
    with pytest.raises(ValueError, match="hi > lo"):
        zorder_cell(["x", "y"], [0.0, 1.0], [1.0, 1.0], 4)
    with pytest.raises(ValueError, match="cell_bits"):
        zorder_cell(["x", "y"], [0.0, 0.0], [1.0, 1.0], 40)
    with pytest.raises(ValueError, match="hi < lo"):
        cells_for_box({"x": (2.0, 1.0), "y": (0.0, 1.0)},
                      ["x", "y"], [0.0, 0.0], [8.0, 8.0], 3)
