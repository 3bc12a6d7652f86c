"""Round-4 session-7 operators: TF-IDF top-m terms (and friends added
later this session). Layer-2 exact pins vs independent scalar
references, degenerate inputs, determinism, validation."""

from __future__ import annotations

import math
import random

import pandas as pd
import pytest

from cesium_spark.operators.textstats import tfidf_topm


def _ref_tfidf(texts: dict[int, str], m: int):
    """Independent scalar reference: sklearn smooth-idf TF-IDF,
    6-dp round BEFORE ranking, ties (tfidf DESC, term ASC)."""
    toks = {i: [t for t in (x or "").lower().split() if t]
            for i, x in texts.items()}
    n_docs = len(texts)
    df: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df[t] = df.get(t, 0) + 1
    rows = []
    for i, ts in toks.items():
        if not ts:
            rows.append((i, None, 0, None, None, 1))
            continue
        counts: dict[str, int] = {}
        for t in ts:
            counts[t] = counts.get(t, 0) + 1
        n = len(ts)
        scored = []
        for t, c in counts.items():
            idf = math.log((n_docs + 1.0) / (df[t] + 1.0)) + 1.0
            scored.append((t, c, df[t], round(c / n * idf, 6)))
        scored.sort(key=lambda r: (-r[3], r[0]))
        for rank, (t, c, d, v) in enumerate(scored[:m], 1):
            rows.append((i, t, c, d, v, rank))
    return sorted(rows)


def _rows(out_df):
    return sorted(
        (r.doc_id, r.term, r.tf_count, r.doc_frequency, r.tfidf, r.rank)
        for r in out_df.collect())


def test_tfidf_matches_scalar_reference(spark):
    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(25)]
    texts = {i: " ".join(rng.choices(vocab, k=rng.randint(3, 40)))
             for i in range(30)}
    pdf = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=3))
    ref = _ref_tfidf(texts, 3)
    assert len(out) == len(ref)
    for o, r in zip(out, ref):
        assert o[:4] == r[:4], (o, r)
        assert o[4] == pytest.approx(r[4], abs=1e-9)
        assert o[5] == r[5]


def test_tfidf_empty_and_null_docs_keep_placeholder_row(spark):
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": ["alpha beta", "", None]})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=5))
    by_doc = {}
    for r in out:
        by_doc.setdefault(r[0], []).append(r)
    # empty/NULL docs: exactly one NULL-term row at rank 1
    for d in (1, 2):
        assert by_doc[d] == [(d, None, 0, None, None, 1)]
    # the non-empty doc gets only real terms (no NULL pad row)
    assert all(r[1] is not None for r in by_doc[0])
    assert len(by_doc[0]) == 2


def test_tfidf_trailing_separator_does_not_pad_topm(spark):
    # "a " splits to ["a", ""] — the artifact empty token must not
    # surface as a NULL row when the doc has < m real terms
    pdf = pd.DataFrame({"doc_id": [0], "text": ["solo \t"]})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=5))
    assert len(out) == 1 and out[0][1] == "solo" and out[0][5] == 1


def test_tfidf_rank_tiebreak_is_term_asc(spark):
    # two terms with identical counts in identical docs tie on tfidf;
    # rank must break by term ASC deterministically
    pdf = pd.DataFrame({"doc_id": [0, 1],
                        "text": ["zebra apple", "zebra apple"]})
    out = _rows(tfidf_topm(spark.createDataFrame(pdf), m=2))
    for d in (0, 1):
        ranks = {r[1]: r[5] for r in out if r[0] == d}
        assert ranks == {"apple": 1, "zebra": 2}


def test_tfidf_validates_m(spark):
    pdf = pd.DataFrame({"doc_id": [0], "text": ["x"]})
    with pytest.raises(ValueError, match="m must be"):
        tfidf_topm(spark.createDataFrame(pdf), m=0)


# --- turn_self_similarity (agent-loop detection) ---------------------------

import re as _re

from cesium_spark.operators.sequences import turn_self_similarity


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


def _ref_loops(convs: dict[str, list[str]], thr: float, cap: int):
    rows = {}
    for cid, texts in convs.items():
        texts = [(t or "")[:cap] for t in texts]
        flags = []
        for prev, cur in zip(texts, texts[1:]):
            mx = max(len(prev), len(cur))
            sim = 1.0 if mx == 0 else 1.0 - _lev(prev, cur) / mx
            flags.append(sim >= thr)
        n_loop = sum(flags)
        run = best = 0
        for f in flags:
            run = run + 1 if f else 0
            best = max(best, run)
        rows[cid] = (len(texts), len(flags), n_loop,
                     (n_loop / len(flags)) if flags else None, best)
    return rows


def _loops_df(spark, convs):
    recs = [(cid, i, t) for cid, ts in convs.items()
            for i, t in enumerate(ts)]
    pdf = pd.DataFrame(recs, columns=["conv_id", "turn_idx", "text"])
    return spark.createDataFrame(pdf)


def test_loops_matches_scalar_reference(spark):
    rng = random.Random(11)
    words = ["run tool", "run tool again", "done", "error retry",
             "error retry", "totally different text here"]
    convs = {f"c{i}": [rng.choice(words) for _ in
                       range(rng.randint(1, 12))] for i in range(25)}
    out = turn_self_similarity(_loops_df(spark, convs), 0.8, 200)
    got = {r.conv_id: (r.n_turns, r.n_pairs, r.n_loop_pairs,
                       r.loop_frac, r.max_loop_run)
           for r in out.collect()}
    ref = _ref_loops(convs, 0.8, 200)
    assert set(got) == set(ref)
    for cid in ref:
        assert got[cid][:3] == ref[cid][:3], cid
        if ref[cid][3] is None:
            assert got[cid][3] is None
        else:
            assert got[cid][3] == pytest.approx(ref[cid][3], abs=1e-12)
        assert got[cid][4] == ref[cid][4], cid


def test_loops_planted_run_and_singleton(spark):
    convs = {
        "loopy": ["step A", "step A", "step A.", "step A", "other",
                  "step A"],
        "single": ["only turn"],
        "empty_pair": ["", ""],
    }
    out = {r.conv_id: r for r in
           turn_self_similarity(_loops_df(spark, convs), 0.8, 200)
           .collect()}
    # 5 pairs; pairs 1-3 near-identical (lev<=1 over len 6-7), pair
    # 'step A'->'other' far, 'other'->'step A' far
    assert out["loopy"].max_loop_run == 3
    assert out["loopy"].n_loop_pairs == 3
    # single-turn conversation keeps its row with zero pairs
    assert (out["single"].n_turns, out["single"].n_pairs,
            out["single"].loop_frac) == (1, 0, None)
    # both-empty pair is defined as identical (sim = 1.0)
    assert out["empty_pair"].n_loop_pairs == 1


def test_loops_cap_bounds_distance(spark):
    # identical 500-char prefixes, difference only past the cap:
    # with max_len=100 the pair is a loop, uncapped it is not
    base = "x" * 500
    convs = {"c": [base + "AAAA", base + "BBBB"]}
    capped = turn_self_similarity(_loops_df(spark, convs), 0.99, 100)
    assert capped.collect()[0].n_loop_pairs == 1


def test_loops_single_exchange_plan(spark):
    convs = {"c": ["a", "b", "c"]}
    df = turn_self_similarity(_loops_df(spark, convs), 0.8, 200)
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(_re.findall(r"Exchange hashpartitioning", p)) == 1
    assert "Cartesian" not in p


def test_loops_validation(spark):
    df = _loops_df(spark, {"c": ["a"]})
    with pytest.raises(ValueError, match="threshold"):
        turn_self_similarity(df, threshold=0.0)
    with pytest.raises(ValueError, match="max_len"):
        turn_self_similarity(df, max_len=0)


# --- Count-Min Sketch tiers -------------------------------------------------

from collections import Counter

from cesium_spark.operators.sketches import (
    cms_build, cms_estimate, cms_fold,
)


@pytest.fixture(scope="module")
def cms_input(spark):
    rng = random.Random(3)
    # Zipf-ish: item i appears ~ 200/(i+1) times, two channels, 3 days
    rows = []
    for ch in ("a", "b"):
        for i in range(40):
            for _ in range(200 // (i + 1)):
                day = rng.randint(1, 3)
                hour = rng.randint(0, 23)
                rows.append((ch, f"2024-01-0{day} {hour:02d}:30:00",
                             f"item{i}"))
    pdf = pd.DataFrame(rows, columns=["channel", "ts", "item"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    return spark.createDataFrame(pdf).cache(), pdf


def _exact_counts(pdf):
    g = pdf.assign(day=pdf.ts.dt.floor("D"))
    return Counter(zip(g.channel, g.day, g.item))


def test_cms_estimate_never_underestimates(spark, cms_input):
    df, pdf = cms_input
    # narrow width => collisions guaranteed (>40 items, w=16)
    sk = cms_build(df, "1d", ["channel"], "item", width=16, depth=3)
    items = [f"item{i}" for i in range(40)]
    est = cms_estimate(sk, items, ["channel"], width=16, depth=3)
    exact = _exact_counts(pdf)
    n_over = 0
    for r in est.collect():
        true = exact.get((r.channel, pd.Timestamp(r.window_start), r.item), 0)
        assert r.est >= true, (r, true)
        n_over += r.est > true
    assert n_over > 0  # collisions actually happened at w=16


def test_cms_exact_at_wide_width_and_error_bound(spark, cms_input):
    df, pdf = cms_input
    sk = cms_build(df, "1d", ["channel"], "item", width=4096, depth=4)
    items = [f"item{i}" for i in range(40)] + ["never_seen"]
    est = cms_estimate(sk, items, ["channel"], width=4096, depth=4)
    exact = _exact_counts(pdf)
    n_per_group = Counter()
    for (ch, day, _), c in exact.items():
        n_per_group[(ch, day)] += c
    for r in est.collect():
        true = exact.get((r.channel, pd.Timestamp(r.window_start), r.item), 0)
        # CMS bound: err <= e/w * n with prob 1-(1/e)^d; at w=4096 and
        # n<=~1300 per group, collisions are overwhelmingly unlikely
        assert r.est == true, (r, true)
        assert r.item != "never_seen" or r.est == 0


def test_cms_fold_equals_direct(spark, cms_input):
    df, _ = cms_input
    fine = cms_build(df, "1h", ["channel"], "item", width=64, depth=4)
    folded = cms_fold(fine, "1d", ["channel"])
    direct = cms_build(df, "1d", ["channel"], "item", width=64, depth=4)
    cols = ["channel", "window_start", "d", "col", "cnt"]
    a = sorted(map(tuple, folded.select(*cols).collect()))
    b = sorted(map(tuple, direct.select(*cols).collect()))
    assert a == b and len(a) > 0


def test_cms_fold_partition_invariant(spark, cms_input):
    df, _ = cms_input
    cols = ["channel", "window_start", "d", "col", "cnt"]
    one = cms_build(df.coalesce(1), "1d", ["channel"], "item",
                    width=64, depth=2)
    eight = cms_build(df.repartition(8), "1d", ["channel"], "item",
                      width=64, depth=2)
    assert sorted(map(tuple, one.select(*cols).collect())) == \
           sorted(map(tuple, eight.select(*cols).collect()))


def test_cms_null_items_contribute_no_cell(spark):
    pdf = pd.DataFrame({"ts": pd.to_datetime(["2024-01-01"] * 3),
                        "channel": ["a"] * 3,
                        "item": ["x", None, None]})
    sk = cms_build(spark.createDataFrame(pdf), "1d", ["channel"],
                   "item", width=8, depth=2)
    assert sk.agg({"cnt": "sum"}).collect()[0][0] == 2  # x under 2 rows


def test_cms_build_single_exchange(spark, cms_input):
    df, _ = cms_input
    sk = cms_build(df, "1d", ["channel"], "item", width=64, depth=4)
    sk.collect()
    p = (sk._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(_re.findall(r"Exchange hashpartitioning", p)) == 1


def test_cms_validation(spark, cms_input):
    df, _ = cms_input
    with pytest.raises(ValueError, match="width"):
        cms_build(df, "1d", ["channel"], "item", width=1)
    with pytest.raises(ValueError, match="depth"):
        cms_build(df, "1d", ["channel"], "item", depth=0)
    with pytest.raises(ValueError, match="unknown tier"):
        cms_build(df, "7m", ["channel"], "item")
    sk = cms_build(df, "1d", ["channel"], "item")
    with pytest.raises(ValueError, match="non-empty"):
        cms_estimate(sk, [], ["channel"])
    with pytest.raises(ValueError, match="non-NULL"):
        cms_estimate(sk, ["x", None], ["channel"])
    with pytest.raises(ValueError, match="fold"):
        cms_fold(sk, "1m", ["channel"])


# --- IVF recall certification ----------------------------------------------

import numpy as np

from cesium_spark.operators import similarity


def _emb_df(spark, n=200, dim=16, seed=5):
    rng = np.random.default_rng(seed)
    v = rng.normal(size=(n, dim))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    pdf = pd.DataFrame({"vec_id": range(n),
                        "embedding": [row.astype("float32").tolist()
                                      for row in v]})
    return spark.createDataFrame(pdf), [float(x) for x in v[0]]


def _recall(spark, embs, q, nprobe, n_centroids=8, k=10, dim=16):
    cents = similarity.ivf_centroids(dim, n_centroids)
    ivf = set(r.vec_id for r in similarity.ivf_topk(
        embs, q, k=k, n_centroids=n_centroids, nprobe=nprobe,
        centroids=cents).collect())
    exact = set(r.vec_id for r in
                similarity.cosine_topk(embs, q, k=k).collect())
    return len(ivf & exact) / k


def test_ivf_recall_monotone_in_nprobe_and_exact_at_full(spark):
    embs, q = _emb_df(spark)
    r_full = _recall(spark, embs, q, nprobe=8)
    # probing every list IS the exact scan: recall must be 1.0
    assert r_full == 1.0
    r2, r4 = _recall(spark, embs, q, nprobe=2), \
        _recall(spark, embs, q, nprobe=4)
    assert 0.0 <= r2 <= r4 <= r_full


# --- SCD2 validity intervals -------------------------------------------------

from cesium_spark.operators.compaction import scd2_intervals


def test_scd2_intervals_hand_case(spark):
    pdf = pd.DataFrame({
        "user_id": [1, 1, 1, 1, 1, 2, 2],
        "event_id": [0, 1, 2, 3, 4, 0, 1],
        "status": ["new", "new", "active", "active", "churned",
                   "new", None],
        "ts": pd.to_datetime(
            ["2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
             "2024-01-05", "2024-01-01", "2024-01-02"])})
    out = scd2_intervals(spark.createDataFrame(pdf), "user_id",
                         "status", "ts", ["event_id"])
    rows = sorted(((r.user_id, r.state,
                    str(r.valid_from.date()),
                    str(r.valid_to.date()) if r.valid_to else None,
                    r.version, r.is_current) for r in out.collect()),
                  key=lambda t: (t[0], t[1] or ""))
    assert rows == [
        (1, "active", "2024-01-03", "2024-01-05", 2, False),
        (1, "churned", "2024-01-05", None, 3, True),
        (1, "new", "2024-01-01", "2024-01-03", 1, False),
        (2, None, "2024-01-02", None, 2, True),
        (2, "new", "2024-01-01", "2024-01-02", 1, False),
    ]


def test_scd2_intervals_tile_and_cover(spark):
    # intervals per key must tile: valid_from(version v+1) ==
    # valid_to(version v); exactly one current row per key; the first
    # valid_from is the key's first event ts
    rng = random.Random(13)
    rows = []
    for u in range(20):
        t = pd.Timestamp("2024-01-01")
        for i in range(rng.randint(1, 15)):
            t += pd.Timedelta(minutes=rng.randint(1, 90))
            rows.append((u, i, rng.choice(["a", "b", "c", None]), t))
    pdf = pd.DataFrame(rows, columns=["user_id", "event_id", "status",
                                      "ts"])
    out = scd2_intervals(spark.createDataFrame(pdf), "user_id",
                         "status", "ts", ["event_id"]).collect()
    by_key = {}
    for r in out:
        by_key.setdefault(r.user_id, []).append(r)
    for u, rs in by_key.items():
        rs.sort(key=lambda r: r.version)
        assert [r.version for r in rs] == list(range(1, len(rs) + 1))
        assert sum(r.is_current for r in rs) == 1
        assert rs[-1].valid_to is None and rs[-1].is_current
        for a, b in zip(rs, rs[1:]):
            assert a.valid_to == b.valid_from
            # a change row really changed state (NULL-safe)
            assert a.state != b.state or (
                a.state is None) != (b.state is None) or False
        first_ts = pdf[pdf.user_id == u].ts.min()
        assert rs[0].valid_from == first_ts


def test_scd2_consecutive_duplicates_merge_and_single_exchange(spark):
    pdf = pd.DataFrame({
        "user_id": [1] * 5, "event_id": range(5),
        "status": ["x"] * 5,
        "ts": pd.date_range("2024-01-01", periods=5, freq="h")})
    df = scd2_intervals(spark.createDataFrame(pdf), "user_id",
                        "status", "ts", ["event_id"])
    rows = df.collect()
    assert len(rows) == 1 and rows[0].is_current
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(_re.findall(r"Exchange hashpartitioning", p)) == 1


# --- AR(1) rolling-origin backtest -------------------------------------------

from cesium_spark.operators.seriesstats import ar1_backtest


def _series_df(spark, data):
    rows = [(cid, "value", i, float(i), float(y))
            for cid, ys in data.items() for i, y in enumerate(ys)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


def _ref_backtest(ys, min_train=3):
    """Independent reference: per-prefix CENTERED Yule-Walker fit
    (textbook form, not the engine's expanded closed forms)."""
    errs = []
    for i in range(min_train, len(ys)):
        pre = np.asarray(ys[:i], dtype=float)
        yb = pre.mean()
        den = ((pre - yb) ** 2).sum()
        if den <= 0:
            continue
        num = ((pre[1:] - yb) * (pre[:-1] - yb)).sum()
        phi = num / den
        f = yb + phi * (pre[-1] - yb)
        errs.append(ys[i] - f)
    errs = np.asarray(errs)
    if not len(errs):
        return 0, None, None
    return len(errs), float(np.abs(errs).mean()), \
        float(np.sqrt((errs ** 2).mean()))


def test_ar1_backtest_matches_centered_reference(spark):
    rng = np.random.default_rng(21)
    data = {}
    for c in range(12):
        n = rng.integers(4, 40)
        phi = rng.uniform(-0.8, 0.9)
        y = [float(rng.normal())]
        for _ in range(n - 1):
            y.append(phi * y[-1] + float(rng.normal()))
        data[f"c{c}"] = y
    out = {r.conv_id: r for r in
           ar1_backtest(_series_df(spark, data)).collect()}
    for cid, ys in data.items():
        n_pred, mae, rmse = _ref_backtest(ys)
        r = out[cid]
        assert r.n == len(ys) and r.n_pred == n_pred, cid
        if mae is None:
            assert r.mae is None
        else:
            assert r.mae == pytest.approx(mae, rel=1e-9)
            assert r.rmse == pytest.approx(rmse, rel=1e-9)


def test_ar1_backtest_recovers_planted_process(spark):
    # strong AR(1): backtest RMSE should approach the innovation sigma,
    # and beat the naive last-value-carry-forward baseline
    # negative phi: carry-forward is ~2.2x sigma while the AR(1)
    # one-step optimum is sigma — a margin the backtest must realize
    rng = np.random.default_rng(4)
    phi, sigma, n = -0.6, 0.1, 400
    y = [0.0]
    for _ in range(n - 1):
        y.append(phi * y[-1] + sigma * float(rng.normal()))
    out = ar1_backtest(_series_df(spark, {"c": y})).collect()[0]
    assert out.rmse < 1.3 * sigma
    naive = np.sqrt(np.mean(np.diff(np.asarray(y)[3:]) ** 2))
    assert out.rmse < 0.75 * naive


def test_ar1_backtest_constant_series_yields_no_predictions(spark):
    out = ar1_backtest(_series_df(spark, {"c": [2.5] * 10})).collect()[0]
    assert (out.n, out.n_pred, out.mae, out.rmse) == (10, 0, None, None)


def test_ar1_backtest_short_series_and_validation(spark):
    out = ar1_backtest(_series_df(spark, {"c": [1.0, 2.0]})).collect()[0]
    assert out.n_pred == 0
    with pytest.raises(ValueError, match="min_train"):
        ar1_backtest(_series_df(spark, {"c": [1.0]}), min_train=1)


def test_ar1_backtest_single_exchange(spark):
    df = ar1_backtest(_series_df(spark, {"c": [1.0, 2.0, 1.5, 2.5]}))
    df.collect()
    p = (df._jdf.queryExecution().executedPlan().toString()
         .split("== Initial Plan ==")[0])
    assert len(_re.findall(r"Exchange hashpartitioning", p)) == 1


# --- Efraimidis-Spirakis weighted sampling -----------------------------------

from cesium_spark.operators.sampling import weighted_sample


def test_weighted_sample_first_pick_frequency_tracks_weights(spark):
    # ES property: P(item drawn first) = w_i / sum(w). 400 independent
    # draws (distinct salts), 4 items with weights 1,1,1,7.
    pdf = pd.DataFrame({"doc_id": ["a", "b", "c", "d"],
                        "w": [1.0, 1.0, 1.0, 7.0]})
    df = spark.createDataFrame(pdf)
    wins = Counter()
    picked = []
    for s in range(400):
        picked.append(
            weighted_sample(df, 1, "w", key="doc_id", salt=f"s{s}"))
    from functools import reduce
    allp = reduce(lambda a, b: a.unionAll(b), picked)
    for r in allp.collect():
        wins[r.doc_id] += 1
    assert sum(wins.values()) == 400
    assert 0.6 <= wins["d"] / 400 <= 0.8          # expect 0.7
    for small in "abc":
        assert 0.04 <= wins[small] / 400 <= 0.17  # expect 0.1


def test_weighted_sample_deterministic_and_partition_invariant(spark):
    pdf = pd.DataFrame({"doc_id": range(100),
                        "lang": ["en", "de"] * 50,
                        "w": [float(i % 7 + 1) for i in range(100)]})
    df = spark.createDataFrame(pdf)
    sel = lambda d: sorted((r.doc_id, r.lang, r.sample_rank)
                           for r in weighted_sample(
                               d, 5, "w", "lang", salt="x").collect())
    a, b = sel(df.coalesce(1)), sel(df.repartition(16))
    assert a == b and len(a) == 10
    # per-stratum: 5 each, ranks dense, no duplicates
    langs = Counter(l for _, l, _ in a)
    assert langs == {"en": 5, "de": 5}


def test_weighted_sample_k_exceeds_population_and_bad_weights(spark):
    pdf = pd.DataFrame({"doc_id": range(6),
                        "w": [1.0, 2.0, None, 0.0, -3.0, 5.0]})
    out = weighted_sample(spark.createDataFrame(pdf), 10, "w").collect()
    # only the 3 positive-weight rows compete
    assert sorted(r.doc_id for r in out) == [0, 1, 5]
    assert sorted(r.sample_rank for r in out) == [1, 2, 3]
    with pytest.raises(ValueError, match="k must be"):
        weighted_sample(spark.createDataFrame(pdf), 0, "w")


# --- calendar tiers (week/month folds) ---------------------------------------

from cesium_spark.operators.fold import fold_moments
from cesium_spark.operators.rollup import rollup_moments


def _moments_input(spark):
    rng = np.random.default_rng(9)
    n = 3000
    ts = pd.Timestamp("2024-01-15") + pd.to_timedelta(
        np.sort(rng.integers(0, 86400 * 60, n)), unit="s")
    pdf = pd.DataFrame({
        "conv_id": [f"c{i % 5}" for i in range(n)],
        "channel": "value", "turn_idx": range(n), "ts": ts,
        "t": ts.astype("int64") / 1e9,
        "y": rng.normal(50, 10, n)})
    return spark.createDataFrame(pdf)


@pytest.mark.parametrize("tier,unit", [("1w", "W-MON"), ("1mo", "MS")])
def test_calendar_fold_counts_and_bounds_match_pandas(spark, tier, unit):
    df = _moments_input(spark)
    folded = fold_moments(fold_moments(rollup_moments(df, "1h"), "1d"),
                          tier)
    pdf = df.toPandas()
    per = (pdf.assign(w=pdf.ts.dt.to_period(
        {"1w": "W-SUN", "1mo": "M"}[tier]).dt.start_time)
           .groupby(["conv_id", "w"])
           .agg(n=("y", "size"), mn=("y", "min"), mx=("y", "max"),
                sm=("y", "sum")))
    got = {(r.conv_id, pd.Timestamp(r.window_start)):
           (r.n, r.y_min, r.y_max, r.y_sum) for r in folded.collect()}
    assert len(got) == len(per)
    for (cid, w), row in per.iterrows():
        g = got[(cid, w)]
        assert g[0] == row.n
        assert g[1] == row.mn and g[2] == row.mx
        assert g[3] == pytest.approx(row.sm, rel=1e-12)


def test_calendar_week_is_iso_monday(spark):
    # 2024-01-15 is a Monday; points Sun 14th and Mon 15th must land
    # in different ISO weeks
    pdf = pd.DataFrame({
        "conv_id": ["c", "c"], "channel": ["value"] * 2,
        "turn_idx": [0, 1],
        "ts": pd.to_datetime(["2024-01-14 23:00", "2024-01-15 01:00"]),
        "t": [0.0, 1.0], "y": [1.0, 2.0]})
    folded = fold_moments(rollup_moments(
        spark.createDataFrame(pdf), "1d"), "1w")
    weeks = sorted(str(r.window_start) for r in folded.collect())
    assert weeks == ["2024-01-08 00:00:00", "2024-01-15 00:00:00"]


# --- PMI collocations ---------------------------------------------------------

from cesium_spark.operators.textstats import pmi_collocations


def _docs_df(spark, texts):
    return spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(texts)), "text": texts}))


def test_pmi_matches_scalar_reference(spark):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(12)]
    texts = [" ".join(rng.choices(vocab, k=rng.randint(5, 60)))
             for _ in range(25)]
    out = pmi_collocations(_docs_df(spark, texts), min_count=2, k=10)
    # independent reference
    uni, bi = Counter(), Counter()
    for t in texts:
        ws = t.lower().split()
        uni.update(ws)
        bi.update(zip(ws, ws[1:]))
    N, B = sum(uni.values()), sum(bi.values())
    ref = []
    for (a, b), c12 in bi.items():
        if c12 >= 2:
            pmi = round(math.log2((c12 / B)
                                  / ((uni[a] / N) * (uni[b] / N))), 6)
            ref.append((a, b, c12, uni[a], uni[b], pmi))
    ref.sort(key=lambda r: (-r[5], r[0], r[1]))
    got = sorted(out.collect(), key=lambda r: r.rank)
    assert len(got) == min(10, len(ref))
    for g, r in zip(got, ref):
        assert (g.w1, g.w2, g.c12, g.c1, g.c2) == r[:5]
        assert g.pmi == pytest.approx(r[5], abs=1e-9)


def test_pmi_planted_collocation_ranks_first_and_hapax_floored(spark):
    filler = " ".join(f"f{i}" for i in range(30))
    texts = [f"{filler} hong kong {filler}"] * 4 + \
            [filler + " rare pair"]  # hapax bigram: must be floored out
    out = pmi_collocations(_docs_df(spark, texts), min_count=3, k=5)
    rows = out.collect()
    top = [r for r in rows if r.rank == 1][0]
    assert (top.w1, top.w2) == ("hong", "kong")
    assert not any((r.w1, r.w2) == ("rare", "pair") for r in rows)


def test_pmi_validation(spark):
    df = _docs_df(spark, ["a b"])
    with pytest.raises(ValueError, match="min_count"):
        pmi_collocations(df, min_count=0)
    with pytest.raises(ValueError, match="k must"):
        pmi_collocations(df, k=0)


# --- rank normalization --------------------------------------------------------

from cesium_spark.operators.scoring import rank_normalize


def test_rank_normalize_matches_scipy_style_reference(spark):
    rng = np.random.default_rng(2)
    vals = {"f1": rng.normal(size=40).round(3),
            "f2": rng.exponential(size=40).round(3)}
    rows = [(i, f, float(v)) for f, vs in vals.items()
            for i, v in enumerate(vs)]
    pdf = pd.DataFrame(rows, columns=["row_id", "feature", "value"])
    out = rank_normalize(spark.createDataFrame(pdf)).collect()
    for f, vs in vals.items():
        import numpy as _np
        order = _np.sort(vs)
        for r in [x for x in out if x.feature == f]:
            rank = int(_np.searchsorted(order, r.value, side="left"))
            exp = rank / (len(vs) - 1)
            assert r.pct_rank == pytest.approx(exp, abs=1e-12), (f, r)


def test_rank_normalize_nulls_and_ties_and_singleton(spark):
    pdf = pd.DataFrame({
        "row_id": range(6),
        "feature": ["a"] * 5 + ["solo"],
        "value": [1.0, 2.0, 2.0, 3.0, None, 9.9]})
    out = {(r.feature, r.row_id): r.pct_rank
           for r in rank_normalize(spark.createDataFrame(pdf)).collect()}
    # ties share a rank; NULL row kept with NULL pct; n=4 real rows
    assert out[("a", 0)] == 0.0
    assert out[("a", 1)] == out[("a", 2)] == pytest.approx(1 / 3)
    assert out[("a", 3)] == 1.0
    assert out[("a", 4)] is None
    assert out[("solo", 5)] == 0.0  # single-row feature


# --- KS exponential cadence test ----------------------------------------------

from cesium_spark.operators.seriesstats import ks_exponential


def _gap_series(spark, gaps_by_conv):
    rows = []
    for cid, gaps in gaps_by_conv.items():
        t = 0.0
        rows.append((cid, "value", 0, t, 0.0))
        for i, g in enumerate(gaps, 1):
            t += g
            rows.append((cid, "value", i, t, 0.0))
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


def _ref_ks(gaps):
    m = len(gaps)
    lam = m / sum(gaps)
    s = np.sort(np.asarray(gaps, dtype=float))
    fx = 1 - np.exp(-lam * s)
    j = np.arange(1, m + 1)
    return lam, float(max((j / m - fx).max(), (fx - (j - 1) / m).max()))


def test_ks_exp_matches_scalar_reference(spark):
    rng = np.random.default_rng(31)
    data = {f"c{i}": list(rng.exponential(5.0, rng.integers(3, 60)))
            for i in range(15)}
    out = {r.conv_id: r for r in
           ks_exponential(_gap_series(spark, data)).collect()}
    for cid, gaps in data.items():
        lam, ks = _ref_ks(gaps)
        r = out[cid]
        assert r.n_gaps == len(gaps)
        assert r.lambda_hat == pytest.approx(lam, rel=1e-12)
        assert r.ks == pytest.approx(ks, rel=1e-9)


def test_ks_exp_accepts_poisson_rejects_regular(spark):
    rng = np.random.default_rng(8)
    data = {"poisson": list(rng.exponential(2.0, 500)),
            "metronome": [2.0] * 500}
    out = {r.conv_id: r for r in
           ks_exponential(_gap_series(spark, data)).collect()}
    # exponential gaps: KS small, not rejected at 95%
    assert out["poisson"].reject_95 is False
    # constant gaps are maximally non-exponential: KS -> |e^-1 - ...|
    # territory, far over the 1.36/sqrt(m)=0.061 band
    assert out["metronome"].reject_95 is True
    assert out["metronome"].ks > out["poisson"].ks


def test_ks_exp_degenerates(spark):
    out = {r.conv_id: r for r in ks_exponential(_gap_series(
        spark, {"one_gap": [3.0], "zero_span": [0.0, 0.0]})).collect()}
    r1 = out["one_gap"]
    assert (r1.n_gaps, r1.ks, r1.reject_95) == (1, None, None)
    rz = out["zero_span"]
    assert rz.lambda_hat is None and rz.ks is None


# --- budget crossing -----------------------------------------------------------

from cesium_spark.operators.sequences import budget_crossing


def test_budget_crossing_hand_case(spark):
    convs = {
        "c1": ["one two", "three four five", "six"],     # cum 2,5,6
        "c2": ["a b c", "d"],                            # cum 3,4
        "c3": [None, "", "x y z w v"],                   # cum 0,0,5
    }
    df = _loops_df(spark, convs)
    out = {r.conv_id: r for r in
           budget_crossing(df, budget=4.0).collect()}
    r = out["c1"]
    assert (r.n_turns, r.total_cost, r.crossed,
            r.cross_turn_idx, r.cost_at_cross) == (3, 6.0, True, 1, 5.0)
    assert out["c2"].crossed is False
    assert out["c2"].cross_turn_idx is None
    assert out["c2"].cost_at_cross is None
    r3 = out["c3"]  # NULL/empty turns cost 0, crossing at turn 2
    assert (r3.crossed, r3.cross_turn_idx, r3.cost_at_cross) == \
        (True, 2, 5.0)


def test_budget_crossing_strict_and_validation(spark):
    df = _loops_df(spark, {"c": ["a b", "c d"]})  # cum 2, 4
    out = budget_crossing(df, budget=4.0).collect()[0]
    assert out.crossed is False  # strict >: exactly-at-budget is fine
    out2 = budget_crossing(df, budget=3.9).collect()[0]
    assert out2.crossed is True and out2.cross_turn_idx == 1
    with pytest.raises(ValueError, match="budget"):
        budget_crossing(df, budget=0)


# --- feature-hashing doc vectors -----------------------------------------------

from cesium_spark.operators.textstats import feature_hash_vectors


def test_hash_vectors_linear_and_exact(spark):
    # v(doc A ++ doc B) = v(A) + v(B): the defining linearity of the
    # hashing trick, and components are integer-exact
    a, b = "spark rollup tier", "gap fill spark"
    pdf = pd.DataFrame({"doc_id": [0, 1, 2],
                        "text": [a, b, a + " " + b]})
    out = {r.doc_id: [r[f"h{i}"] for i in range(16)]
           for r in feature_hash_vectors(
               spark.createDataFrame(pdf), dim=16).collect()}
    assert [x + y for x, y in zip(out[0], out[1])] == out[2]
    assert all(isinstance(v, int) for v in out[0])


def test_hash_vectors_empty_null_and_partition_invariance(spark):
    pdf = pd.DataFrame({"doc_id": range(40),
                        "text": [None, ""] + [f"tok{i} tok{i%3} x"
                                              for i in range(38)]})
    df = spark.createDataFrame(pdf)
    one = sorted(map(tuple, feature_hash_vectors(
        df.coalesce(1), dim=8).collect()))
    many = sorted(map(tuple, feature_hash_vectors(
        df.repartition(16), dim=8).collect()))
    assert one == many and len(one) == 40
    z = [r for r in one if r[0] in (0, 1)]
    for r in z:  # all-zero rows kept, norm exactly 0.0
        assert list(r[1:9]) == [0] * 8 and r[9] == 0.0


def test_hash_vectors_inner_product_tracks_overlap(spark):
    # shared tokens push the inner product up in expectation; two
    # disjoint random docs should score below two near-identical ones
    common = " ".join(f"c{i}" for i in range(30))
    pdf = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": [common + " extra1", common + " extra2",
                 " ".join(f"z{i}" for i in range(31))]})
    out = {r.doc_id: np.array([r[f"h{i}"] for i in range(32)])
           for r in feature_hash_vectors(
               spark.createDataFrame(pdf), dim=32).collect()}
    sim_close = out[0] @ out[1]
    sim_far = out[0] @ out[2]
    assert sim_close > sim_far


def test_hash_vectors_validation(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [0],
                                             "text": ["x"]}))
    with pytest.raises(ValueError, match="dim"):
        feature_hash_vectors(df, dim=1)


# --- sweep-line peak concurrency -----------------------------------------------

from cesium_spark.operators.intervals import peak_concurrency


def _tr_df(spark, spans):
    # spans: conv -> (start_s, end_s); two turns per conversation
    rows = []
    base = pd.Timestamp("2024-01-01")
    for cid, (a, b) in spans.items():
        rows.append((cid, 0, base + pd.Timedelta(seconds=a)))
        rows.append((cid, 1, base + pd.Timedelta(seconds=b)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "ts"])
    return spark.createDataFrame(pdf)


def _ref_peak(spans, tier_s=3600):
    out = {}
    for cid, (a, _) in spans.items():
        c = sum(1 for lo, hi in spans.values() if lo <= a <= hi)
        w = (a // tier_s) * tier_s
        n, p = out.get(w, (0, 0))
        out[w] = (n + 1, max(p, c))
    return out


def test_concurrency_matches_brute_force(spark):
    rng = random.Random(23)
    spans = {f"c{i}": tuple(sorted((rng.uniform(0, 4 * 3600),
                                    rng.uniform(0, 4 * 3600))))
             for i in range(40)}
    got = {int(pd.Timestamp(r.window_start).timestamp()
               - pd.Timestamp("2024-01-01").timestamp()):
           (r.n_starts, r.peak_concurrency)
           for r in peak_concurrency(_tr_df(spark, spans),
                                     bucket_s=1800).collect()}
    assert got == _ref_peak(spans)


def test_concurrency_edges(spark):
    spans = {
        "a": (0.0, 100.0),
        "b": (100.0, 200.0),     # starts exactly as a ends: overlap
        "c": (50.0, 50.0),       # zero-duration: counts itself
        "d": (7200.0, 7300.0),   # lone conv in a later window
    }
    out = {str(r.window_start): (r.n_starts, r.peak_concurrency)
           for r in peak_concurrency(_tr_df(spark, spans)).collect()}
    # at b's start, a is still open (closed spans): concurrency 2;
    # at c's start, a is open: 2
    assert out["2024-01-01 00:00:00"] == (3, 2)
    assert out["2024-01-01 02:00:00"] == (1, 1)


def test_concurrency_validation(spark):
    df = _tr_df(spark, {"a": (0.0, 1.0)})
    with pytest.raises(ValueError, match="unknown tier"):
        peak_concurrency(df, tier="5x")


# --- sliding-window streaming twin ----------------------------------------------

from cesium_spark.streaming.window_delta import stream_sliding_moments


def test_sliding_moments_batch_equivalence_and_overlap_factor(spark):
    # the same frame works on a batch DF (watermark no-ops): each
    # event must land in exactly window/slide = 4 hop windows
    rng = np.random.default_rng(12)
    n = 300
    ts = pd.Timestamp("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 6 * 3600, n), unit="s")
    pdf = pd.DataFrame({"conv_id": [f"c{i % 3}" for i in range(n)],
                        "ts": ts, "y": rng.normal(size=n)})
    out = stream_sliding_moments(spark.createDataFrame(pdf),
                                 "1 hour", "15 minutes").collect()
    assert sum(r.n for r in out) == 4 * n
    # every window is slide-aligned and exactly 1h long
    for r in out:
        assert r.window_start.minute % 15 == 0
        assert (r.window_end - r.window_start).total_seconds() == 3600
    # containment: rebuild per-event membership and compare counts
    ref = Counter()
    for cid, t in zip(pdf.conv_id, pdf.ts):
        base = t.floor("15min")
        for k in range(4):
            ws = base - pd.Timedelta(minutes=15 * k)
            if t < ws + pd.Timedelta(hours=1):
                ref[(cid, ws)] += 1
    got = {(r.conv_id, pd.Timestamp(r.window_start)): r.n for r in out}
    assert got == dict(ref)


# --- bivariate Mahalanobis anomaly ----------------------------------------------

from cesium_spark.operators.seriesstats import mahalanobis2


def _two_ch_df(spark, data):
    # data: conv -> list[(ya, yb)]
    rows = []
    for cid, pts in data.items():
        for i, (a, b) in enumerate(pts):
            if a is not None:
                rows.append((cid, "A", i, float(i), float(a)))
            if b is not None:
                rows.append((cid, "B", i, float(i), float(b)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


def _ref_maha(pts, thr=9.21):
    xs = np.array([p for p in pts if None not in p], dtype=float)
    n = len(xs)
    ma, mb = xs.mean(axis=0)
    sa, sb = xs.std(axis=0)
    if sa == 0 or sb == 0:
        return n, 0, None
    rho = ((xs[:, 0] - ma) * (xs[:, 1] - mb)).mean() / (sa * sb)
    if abs(rho) == 1:
        return n, 0, None
    za, zb = (xs[:, 0] - ma) / sa, (xs[:, 1] - mb) / sb
    d2 = (za * za - 2 * rho * za * zb + zb * zb) / (1 - rho * rho)
    return n, int((np.round(d2, 6) > thr).sum()), float(d2.max())


def test_mahalanobis_matches_numpy_reference(spark):
    rng = np.random.default_rng(6)
    data = {}
    for c in range(10):
        n = rng.integers(5, 60)
        a = rng.normal(10, 2, n)
        b = 0.5 * a + rng.normal(0, 1, n)
        data[f"c{c}"] = list(zip(a, b))
    out = {r.conv_id: r for r in
           mahalanobis2(_two_ch_df(spark, data), "A", "B").collect()}
    for cid, pts in data.items():
        n, na, mx = _ref_maha(pts)
        r = out[cid]
        assert (r.n_points, r.n_anomalies) == (n, na), cid
        assert r.max_d2 == pytest.approx(mx, rel=1e-9)


def test_mahalanobis_flags_joint_outlier_zscores_miss(spark):
    # strong correlation; the planted point is ~1.4 sigma in each
    # channel (unremarkable marginally) but violates the correlation
    rng = np.random.default_rng(3)
    a = rng.normal(0, 1, 300)
    b = a + rng.normal(0, 0.05, 300)
    pts = list(zip(a, b)) + [(1.4, -1.4)]
    out = mahalanobis2(_two_ch_df(spark, {"c": pts}), "A", "B") \
        .collect()[0]
    assert out.n_anomalies >= 1
    assert out.max_d2 > 100  # the joint outlier dominates


def test_mahalanobis_degenerates_and_validation(spark):
    data = {"const_b": [(1.0, 5.0), (2.0, 5.0), (3.0, 5.0)],
            "collinear": [(1.0, 2.0), (2.0, 4.0), (3.0, 6.0)]}
    out = {r.conv_id: r for r in
           mahalanobis2(_two_ch_df(spark, data), "A", "B").collect()}
    for cid in data:
        assert out[cid].n_anomalies == 0
        assert out[cid].max_d2 is None
    with pytest.raises(ValueError, match="differ"):
        mahalanobis2(_two_ch_df(spark, data), "A", "A")


# --- Kaplan-Meier survival ------------------------------------------------------

from cesium_spark.operators.survival import (
    conversation_spans,
    kaplan_meier,
)


def _km_ref(pairs):
    """Independent product-limit reference over (duration, event)."""
    times = sorted(set(t for t, _ in pairs))
    out, s = {}, 1.0
    for t in times:
        n = sum(1 for u, _ in pairs if u >= t)
        d = sum(1 for u, e in pairs if u == t and e)
        c = sum(1 for u, e in pairs if u == t and not e)
        if d:
            s *= (1 - d / n)
        out[t] = (n, d, c, s)
    return out


def _spans_df(spark, pairs, stratum="x"):
    pdf = pd.DataFrame({
        "duration": [p[0] for p in pairs],
        "event": [p[1] for p in pairs],
        "grp": stratum})
    return spark.createDataFrame(pdf)


def test_km_matches_product_limit_reference(spark):
    rng = random.Random(19)
    pairs = [(float(rng.randint(1, 30)), rng.random() < 0.7)
             for _ in range(200)]
    out = kaplan_meier(_spans_df(spark, pairs), strata_col="grp") \
        .collect()
    ref = _km_ref(pairs)
    assert len(out) == len(ref)
    for r in out:
        n, d, c, s = ref[r.duration]
        assert (r.n_risk, r.n_events, r.n_censored) == (n, d, c)
        assert r.survival == pytest.approx(s, rel=1e-12)


def test_km_censoring_shrinks_risk_without_dropping_curve(spark):
    # classic textbook: censored subjects leave the risk set but don't
    # step the curve; final event with d == n terminates at exactly 0
    pairs = [(1.0, True), (2.0, False), (3.0, True), (3.0, True)]
    out = {r.duration: r for r in
           kaplan_meier(_spans_df(spark, pairs), strata_col="grp")
           .collect()}
    assert out[1.0].survival == pytest.approx(0.75)
    assert out[2.0].survival == pytest.approx(0.75)  # censor: no step
    assert out[2.0].n_censored == 1
    assert out[3.0].n_risk == 2 and out[3.0].survival == 0.0


def test_km_naive_mean_underestimates_what_km_sees(spark):
    # all long conversations censored: naive mean of finished spans is
    # 2.0, while KM at t=2 still shows 50% surviving
    pairs = [(2.0, True)] * 5 + [(10.0, False)] * 5
    out = {r.duration: r for r in
           kaplan_meier(_spans_df(spark, pairs), strata_col="grp")
           .collect()}
    assert out[2.0].survival == pytest.approx(0.5)


def test_km_validation_and_span_builder(spark):
    with pytest.raises(ValueError, match="NULL/negative"):
        kaplan_meier(_spans_df(spark, [(-1.0, True)]),
                     strata_col="grp").collect()
    # span builder: last-2-days convs censored
    base = pd.Timestamp("2024-01-01")
    rows = [("a", 0, "u", base), ("a", 1, "u", base + pd.Timedelta(days=1)),
            ("b", 0, "v", base), ("b", 1, "v", base + pd.Timedelta(days=9)),
            ("c", 0, "w", base + pd.Timedelta(days=9))]
    tr = spark.createDataFrame(pd.DataFrame(
        rows, columns=["conv_id", "turn_idx", "role", "ts"]))
    spans = {r.conv_id: r for r in
             conversation_spans(tr, 172800.0).collect()}
    assert spans["a"].event is True          # ended day 1, max day 9
    assert spans["b"].event is False         # touches the horizon
    assert spans["c"].duration == 0.0        # single-turn, censored
    assert spans["c"].event is False
    assert spans["a"].first_role == "u"


# --- audio features over real WAV decode ----------------------------------------

from cesium_spark.operators import multimodal as mm


def test_audio_features_known_signal(spark):
    # build a doc whose WAV body is its text bytes: "\x00\x80" repeats
    # decode to i16 samples alternating -32768-level patterns is hard
    # to type as text, so use a plain ASCII doc and verify against a
    # direct numpy recomputation of the SAME payload
    pdf = pd.DataFrame({"doc_id": [1, 4], "text": ["abcdEFGH" * 5,
                                                   "z"]})
    m = mm.attach_media(spark.createDataFrame(pdf))
    out = {r.doc_id: r for r in mm.audio_features(m).collect()}
    payloads = {r.doc_id: bytes(r.media)
                for r in m.collect() if r.media_type == "audio"}
    for doc_id, payload in payloads.items():
        s = mm.decode_media(payload).ravel()
        i = (np.rint(s.astype(np.float64) * 65536.0)
             .astype(np.int64) - 32768)
        r = out[doc_id]
        assert r.n_samples == i.size
        assert r.rms == pytest.approx(
            float(np.sqrt((i * i).sum() / i.size) / 65536.0), abs=0)
        assert r.peak == float(np.abs(i).max() / 65536.0)
        if i.size >= 2:
            nn = i >= 0
            assert r.zcr == (nn[1:] != nn[:-1]).sum() / (i.size - 1)


def test_audio_features_single_sample_and_filter(spark):
    # doc_id 4 -> audio; text "z" + pad to even -> exactly 1 sample
    pdf = pd.DataFrame({"doc_id": [4, 3, 5], "text": ["z", "img", "vid"]})
    m = mm.attach_media(spark.createDataFrame(pdf))
    rows = mm.audio_features(m).collect()
    # only the audio row survives the metadata filter
    assert [r.doc_id for r in rows] == [4]
    assert rows[0].n_samples == 1 and rows[0].zcr is None


# --- Zipf fit --------------------------------------------------------------------

from cesium_spark.operators.textstats import zipf_fit


def test_zipf_recovers_planted_exponent_and_flags_uniform(spark):
    rng = np.random.default_rng(1)
    words = [f"w{i}" for i in range(200)]
    p = 1 / np.arange(1, 201.0)
    p /= p.sum()
    zipf_texts = [" ".join(rng.choice(words, p=p, size=100))
                  for _ in range(60)]
    flat_texts = [" ".join(rng.choice(words, size=100))
                  for _ in range(60)]
    mk = lambda ts: spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(ts)), "text": ts}))
    z = zipf_fit(mk(zipf_texts), 50).collect()[0]
    f = zipf_fit(mk(flat_texts), 50).collect()[0]
    assert z.slope == pytest.approx(-1.0, abs=0.15)
    assert z.r2 > 0.95
    assert abs(f.slope) < 0.3  # uniform corpus: near-flat
    assert z.n_ranks == f.n_ranks == 50


def test_zipf_matches_numpy_ols(spark):
    texts = ["a a a a b b b c c d"] * 3
    out = zipf_fit(spark.createDataFrame(
        pd.DataFrame({"doc_id": range(3), "text": texts})),
        max_rank=10).collect()[0]
    cnt = np.array([12, 9, 6, 3], dtype=float)
    x, y = np.log(np.arange(1, 5.0)), np.log(cnt)
    slope, intercept = np.polyfit(x, y, 1)
    assert out.n_ranks == 4
    assert out.slope == pytest.approx(slope, rel=1e-9)
    assert out.intercept == pytest.approx(intercept, rel=1e-9)
    with pytest.raises(ValueError, match="max_rank"):
        zipf_fit(spark.createDataFrame(
            pd.DataFrame({"doc_id": [0], "text": ["x"]})), 2)


# --- burst intervals --------------------------------------------------------------

from cesium_spark.operators.sequences import burst_intervals


def _burst_series(spark, times_by_conv):
    rows = [(cid, i, float(t), 0.0)
            for cid, ts in times_by_conv.items()
            for i, t in enumerate(ts)]
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "t", "y"])
    return spark.createDataFrame(pdf)


def _ref_bursts(times, thresh, min_run):
    out, run = [], []
    for i in range(1, len(times)):
        if times[i] - times[i - 1] <= thresh:
            run.append(i)
        else:
            if len(run) >= min_run:
                out.append((run[0] - 1, run[-1], len(run) + 1,
                            times[run[0] - 1], times[run[-1]]))
            run = []
    if len(run) >= min_run:
        out.append((run[0] - 1, run[-1], len(run) + 1,
                    times[run[0] - 1], times[run[-1]]))
    return out


def test_bursts_match_scalar_reference(spark):
    rng = random.Random(29)
    data = {}
    for c in range(20):
        t, ts = 0.0, []
        for _ in range(rng.randint(2, 50)):
            t += rng.choice([5.0, 8.0, 2000.0])
            ts.append(t)
        data[f"c{c}"] = ts
    got = {}
    for r in burst_intervals(_burst_series(spark, data),
                             gap_thresh_s=10.0, min_run=2).collect():
        got.setdefault(r.conv_id, []).append(
            (r.start_turn_idx, r.end_turn_idx, r.n_turns,
             r.t_start, r.t_end))
    for cid, ts in data.items():
        ref = _ref_bursts(ts, 10.0, 2)
        assert sorted(got.get(cid, [])) == sorted(ref), cid


def test_bursts_hand_case_and_validation(spark):
    # gaps: 5,5,100,5,5,5,100 -> bursts at turns [0..2] and [3..6]
    ts = [0, 5, 10, 110, 115, 120, 125, 225]
    out = sorted((r.start_turn_idx, r.end_turn_idx, r.n_turns,
                  r.duration_s)
                 for r in burst_intervals(
                     _burst_series(spark, {"c": ts}), 10.0, 2)
                 .collect())
    assert out == [(0, 2, 3, 10.0), (3, 6, 4, 15.0)]
    # min_run=3 drops the first burst (only 2 hot pairs)
    out3 = [(r.start_turn_idx, r.end_turn_idx) for r in burst_intervals(
        _burst_series(spark, {"c": ts}), 10.0, 3).collect()]
    assert out3 == [(3, 6)]
    with pytest.raises(ValueError, match="gap_thresh"):
        burst_intervals(_burst_series(spark, {"c": ts}), 0.0)
    with pytest.raises(ValueError, match="min_run"):
        burst_intervals(_burst_series(spark, {"c": ts}), 1.0, 0)
