"""Session-13 operators: variance ratio, Hurst, PACF, Adamic-Adar,
SemDeDup, relational wideners."""
import numpy as np
import pandas as pd
import pytest


def _series(spark, ys):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(ys),
        "turn_idx": np.arange(len(ys), dtype=np.int32),
        "t": np.arange(len(ys), dtype=np.float64),
        "y": np.asarray(ys, dtype=np.int64)})
    return spark.createDataFrame(pdf)


def _vr_ref(y, q):
    """Literal Lo–MacKinlay 1988 formulas, float path."""
    y = np.asarray(y, dtype=float)
    n = len(y) - 1
    mu = (y[-1] - y[0]) / n
    d = np.diff(y)
    a = np.sum((d - mu) ** 2) / (n - 1)
    c_incr = y[q:] - y[:-q]
    m = q * (n - q + 1) * (1 - q / n)
    c = np.sum((c_incr - q * mu) ** 2) / m
    vr = c / a
    z = (vr - 1) / np.sqrt(2 * (2 * q - 1) * (q - 1) / (3 * q) / n)
    return vr, z


# --- variance ratio ----------------------------------------------------------------

def test_vr_matches_literal_formula(spark):
    from cesium_spark.operators.seriesstats import variance_ratio
    rng = np.random.RandomState(7)
    y = np.cumsum(rng.randint(-3, 4, size=60)) + 100
    row = variance_ratio(_series(spark, y), q=4).collect()[0]
    vr, z = _vr_ref(y, 4)
    assert row["n_points"] == 60
    assert row["drift"] == int(y[-1] - y[0])
    assert abs(row["vr"] - vr) < 1e-9
    assert abs(row["z"] - z) < 1e-9


def test_vr_momentum_vs_mean_reversion(spark):
    from cesium_spark.operators.seriesstats import variance_ratio
    trend = np.arange(0, 40) ** 2 // 7          # accelerating -> momentum
    alt = np.tile([5, 9], 30)                   # flip-flop -> mean reversion
    r_t = variance_ratio(_series(spark, trend), q=4).collect()[0]
    r_a = variance_ratio(_series(spark, alt), q=4).collect()[0]
    assert r_t["vr"] > 1.0
    assert r_a["vr"] < 1.0 and r_a["z"] < 0


def test_vr_degenerates_null(spark):
    from cesium_spark.operators.seriesstats import variance_ratio
    const = variance_ratio(_series(spark, [7] * 20), q=4).collect()[0]
    assert const["vr"] is None and const["z"] is None
    short = variance_ratio(_series(spark, [1, 5, 2, 9]), q=4).collect()[0]
    assert short["vr"] is None            # n_inc = 3 <= q


def test_vr_rejects_floats_and_bad_q(spark):
    from cesium_spark.operators.seriesstats import variance_ratio
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0],
                        "t": [0.0], "y": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        variance_ratio(spark.createDataFrame(pdf), q=4)
    with pytest.raises(ValueError, match="q must be"):
        variance_ratio(_series(spark, [1, 2, 3]), q=1)


def test_vr_single_exchange_plan(spark):
    from cesium_spark.operators.seriesstats import variance_ratio
    plan = variance_ratio(
        _series(spark, list(range(30))), q=4
    )._jdf.queryExecution().executedPlan().toString()
    # window + aggregate share the conv_id partitioning: one shuffle
    assert plan.count("Exchange hashpartitioning") == 1


# --- Hurst R/S ---------------------------------------------------------------------

def _hurst_ref(y, windows=(8, 16, 32, 64)):
    """Literal textbook R/S replay in float numpy."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    avgs = []
    for w in windows:
        k = n // w
        rs = []
        for b in range(k):
            v = y[b * w:(b + 1) * w]
            if v.std() == 0:
                continue
            z = np.cumsum(v - v.mean())
            rs.append((z.max() - z.min()) / v.std())
        avgs.append(np.mean(rs) if rs else np.nan)
    if np.any(np.isnan(avgs)):
        return avgs, None
    lw = np.log(windows)
    g = np.log(avgs)
    h = np.sum((lw - lw.mean()) * (g - g.mean())) / np.sum(
        (lw - lw.mean()) ** 2)
    return avgs, h


def test_hurst_matches_literal_replay(spark):
    from cesium_spark.operators.seriesstats import hurst_rs
    rng = np.random.RandomState(11)
    y = np.cumsum(rng.randint(-5, 6, size=200)) + 50
    row = hurst_rs(_series(spark, y)).collect()[0]
    avgs, h = _hurst_ref(y)
    for w, a in zip((8, 16, 32, 64), avgs):
        assert abs(row[f"rs_{w}"] - a) < 1e-9
    assert abs(row["hurst"] - h) < 1e-9
    # R/S H is strongly upward-biased at small n (Anis-Lloyd): a short
    # random walk lands well above 0.5 — just pin the sane range
    assert 0.3 < row["hurst"] < 1.1


def test_hurst_anchors(spark):
    from cesium_spark.operators.seriesstats import hurst_rs
    ramp = np.arange(256)                     # pure trend -> H near 1
    alt = np.tile([3, 8], 128)                # flip-flop -> H near 0
    h_ramp = hurst_rs(_series(spark, ramp)).collect()[0]["hurst"]
    h_alt = hurst_rs(_series(spark, alt)).collect()[0]["hurst"]
    assert h_ramp > 0.9
    assert h_alt < 0.15


def test_hurst_partial_grid_null(spark):
    from cesium_spark.operators.seriesstats import hurst_rs
    # 40 points: full blocks exist for w=8,16,32 but not 64 -> H NULL,
    # the per-w columns that exist still real
    y = np.cumsum(np.ones(40, dtype=int))
    row = hurst_rs(_series(spark, y)).collect()[0]
    assert row["hurst"] is None
    assert row["rs_8"] is not None and row["rs_64"] is None
    # constant series: every block zero-variance -> all NULL
    row = hurst_rs(_series(spark, [4] * 256)).collect()[0]
    assert row["hurst"] is None and row["rs_8"] is None


def test_hurst_rejects_floats_and_bad_grid(spark):
    from cesium_spark.operators.seriesstats import hurst_rs
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0],
                        "t": [0.0], "y": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        hurst_rs(spark.createDataFrame(pdf))
    with pytest.raises(ValueError, match="window sizes"):
        hurst_rs(_series(spark, [1, 2, 3]), windows=(8,))


# --- PACF (Durbin-Levinson, lags 1-3) ---------------------------------------------

def _pacf_ref(y):
    """Literal DL replay: sample ACF then the unrolled recursion."""
    y = np.asarray(y, dtype=float)
    n = len(y)
    dev = y - y.mean()
    n0 = np.sum(dev * dev)
    r = [np.sum(dev[k:] * dev[:-k]) / n0 for k in (1, 2, 3)]
    r1, r2, r3 = r
    p22 = (r2 - r1 * r1) / (1 - r1 * r1)
    p21 = r1 - p22 * r1
    p33 = ((r3 - p21 * r2 - p22 * r1)
           / (1 - p21 * r1 - p22 * r2))
    return r1, r2, r3, p22, p33


def test_pacf_matches_literal_replay(spark):
    from cesium_spark.operators.seriesstats import pacf3
    rng = np.random.RandomState(3)
    # AR(1)-ish integer series with phi ~ 0.7
    y = [50]
    for _ in range(300):
        y.append(int(round(0.7 * y[-1] + 15 + rng.randint(-8, 9))))
    row = pacf3(_series(spark, y)).collect()[0]
    r1, r2, r3, p22, p33 = _pacf_ref(y)
    assert abs(row["r1"] - r1) < 1e-9 and abs(row["r3"] - r3) < 1e-9
    assert abs(row["pacf1"] - r1) < 1e-9
    assert abs(row["pacf2"] - p22) < 1e-9
    assert abs(row["pacf3"] - p33) < 1e-9
    # AR(1): pacf cuts off after lag 1
    assert abs(row["pacf1"]) > 0.4
    assert abs(row["pacf2"]) < 0.25 and abs(row["pacf3"]) < 0.25


def test_pacf_degenerates(spark):
    from cesium_spark.operators.seriesstats import pacf3
    const = pacf3(_series(spark, [5] * 30)).collect()[0]
    assert const["r1"] is None and const["pacf3"] is None
    # perfectly alternating: r1 near -1 but short ramp: |r1|=1 exactly
    # on a 2-point series -> zero pacf2 denominator -> NULL
    two = pacf3(_series(spark, [1, 2])).collect()[0]
    assert two["pacf2"] is None
    short = pacf3(_series(spark, [4, 9, 2])).collect()[0]
    assert short["r3"] is None and short["pacf3"] is None


def test_pacf_rejects_floats(spark):
    from cesium_spark.operators.seriesstats import pacf3
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0],
                        "t": [0.0], "y": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        pacf3(spark.createDataFrame(pdf))


def test_pacf_single_exchange_plan(spark):
    from cesium_spark.operators.seriesstats import pacf3
    plan = pacf3(
        _series(spark, list(range(30)))
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- Adamic-Adar -------------------------------------------------------------------

def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]))


def test_aa_path_and_values(spark):
    from cesium_spark.operators.graphrank import adamic_adar
    # path a-b-c: only candidate (a,c) via b, deg(b)=2
    r = adamic_adar(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    assert len(r) == 1
    assert (r[0]["u"], r[0]["v"], r[0]["n_common"]) == ("a", "c", 1)
    assert abs(r[0]["aa"] - 1 / np.log(2)) < 1e-12


def test_aa_excludes_existing_edges_and_matches_ref(spark):
    from cesium_spark.operators.graphrank import adamic_adar
    # K4 minus edge (c,d): every pair with a common neighbor except
    # existing edges -> only (c,d) survives, via common nbrs a and b
    pairs = [("a", "b"), ("a", "c"), ("a", "d"), ("b", "c"), ("b", "d")]
    r = adamic_adar(_edges(spark, pairs)).collect()
    assert len(r) == 1
    row = r[0]
    assert (row["u"], row["v"], row["n_common"]) == ("c", "d", 2)
    # deg(a)=deg(b)=3
    assert abs(row["aa"] - 2 / np.log(3)) < 1e-12


def test_aa_direction_and_multiplicity_blind(spark):
    from cesium_spark.operators.graphrank import adamic_adar
    r1 = adamic_adar(_edges(spark, [("a", "b"), ("b", "c")])).collect()
    r2 = adamic_adar(_edges(spark, [("b", "a"), ("b", "a"), ("c", "b"),
                                    ("a", "a")])).collect()
    assert [(x["u"], x["v"], x["aa"]) for x in r1] == \
           [(x["u"], x["v"], x["aa"]) for x in r2]


def test_aa_rare_neighbor_beats_hub_and_topk(spark):
    from cesium_spark.operators.graphrank import adamic_adar
    # star hub h connects x1..x4 (common nbr = hub, deg 4);
    # private bridge p connects only (x1,x2): rare evidence wins
    pairs = [("h", f"x{i}") for i in range(1, 5)]
    pairs += [("p", "x1"), ("p", "x2")]
    out = adamic_adar(_edges(spark, pairs), top_k=3).collect()
    # (h,p) share TWO rare deg-2 neighbors -> 2/ln2; (x1,x2) share the
    # hub (deg 4) and p (deg 2) -> 1/ln4 + 1/ln2; the rest share only
    # the hub -> 1/ln4. Rare-neighbor evidence dominates.
    assert [(x["u"], x["v"]) for x in out] == \
        [("h", "p"), ("x1", "x2"), ("x1", "x3")]
    assert abs(out[0]["aa"] - 2 / np.log(2)) < 1e-12
    assert out[1]["n_common"] == 2
    assert abs(out[1]["aa"] - (1 / np.log(4) + 1 / np.log(2))) < 1e-12


# --- SemDeDup ----------------------------------------------------------------------

def _embs(spark, vecs):
    pdf = pd.DataFrame({
        "vec_id": np.arange(len(vecs), dtype=np.int64),
        "embedding": [np.asarray(v, dtype=np.float64) for v in vecs]})
    return spark.createDataFrame(pdf)


_C2 = np.array([[1.0, 0.0], [0.0, 1.0]])


def test_semdedup_keeps_the_outlier(spark):
    from cesium_spark.operators.dedup import semdedup
    # both near centroid 0; cosine(a,b) ~ 0.995 >= 0.9; a IS the
    # centroid direction (cent_cos 1.0) -> a removed, b (outlier) kept
    out = semdedup(_embs(spark, [[1.0, 0.0], [0.99, 0.1]]),
                   dim=2, threshold=0.9, n_centroids=2, centroids=_C2)
    r = {x["vec_id"]: x for x in out.collect()}
    assert r[0]["list_id"] == 0 and r[1]["list_id"] == 0
    assert not r[0]["kept"] and r[1]["kept"]
    assert abs(r[0]["cent_cos"] - 1.0) < 1e-12
    assert r[1]["cent_cos"] < 1.0


def test_semdedup_cluster_blocking(spark):
    from cesium_spark.operators.dedup import semdedup
    # near-identical pair split across clusters: NEVER compared ->
    # both kept (the clustering is the approximation, by design)
    out = semdedup(_embs(spark, [[0.72, 0.70], [0.70, 0.72]]),
                   dim=2, threshold=0.9, n_centroids=2, centroids=_C2)
    r = {x["vec_id"]: x for x in out.collect()}
    assert r[0]["list_id"] == 0 and r[1]["list_id"] == 1
    assert r[0]["kept"] and r[1]["kept"]


def test_semdedup_group_keeps_one(spark):
    from cesium_spark.operators.dedup import semdedup
    # fully-connected trio near centroid 0 at distinct centroid
    # cosines: only the (cent_cos)-minimal member survives
    out = semdedup(_embs(spark, [[1.0, 0.0], [0.995, 0.1], [0.99, 0.15]]),
                   dim=2, threshold=0.95, n_centroids=2, centroids=_C2)
    r = {x["vec_id"]: x["kept"] for x in out.collect()}
    assert r == {0: False, 1: False, 2: True}


def test_semdedup_below_threshold_all_kept_and_nulls_dropped(spark):
    from cesium_spark.operators.dedup import semdedup
    pdf = pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [np.array([1.0, 0.0]), np.array([0.8, 0.6]), None]})
    out = semdedup(spark.createDataFrame(pdf), dim=2, threshold=0.99,
                   n_centroids=2, centroids=_C2).collect()
    assert len(out) == 2                      # null vector dropped
    assert all(x["kept"] for x in out)        # cos(a,b)=0.8 < 0.99


def test_semdedup_rejects_non_unit_centroids(spark):
    from cesium_spark.operators.dedup import semdedup
    with pytest.raises(ValueError, match="unit-norm"):
        semdedup(_embs(spark, [[1.0, 0.0]]), dim=2, n_centroids=2,
                 centroids=np.array([[2.0, 0.0], [0.0, 1.0]]))


# --- TPC-H Q6 / Q14 plan shapes ----------------------------------------------------

def test_q6_pushdown_and_no_join(spark):
    from cesium_spark.driver_queries import q_rel_tpch_q6
    df = q_rel_tpch_q6(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the scan-filter-agg query: quantity/shipdate predicates reach
    # the parquet reader, and there is no join of any kind
    assert "PushedFilters: [" in plan
    assert "l_quantity" in plan.split("PushedFilters:")[1][:400]
    assert "Join" not in plan
    row = df.collect()[0]
    assert row["n_items"] > 0 and row["revenue"] > 0


def test_q14_broadcasts_part(spark):
    from cesium_spark.driver_queries import q_rel_tpch_q14
    df = q_rel_tpch_q14(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    row = df.collect()[0]
    assert 0 <= row["promo_share"] <= 100
    assert abs(row["total_revenue"] - row["promo_revenue"]
               * (100 / row["promo_share"])) / row["total_revenue"] < 1e-6


# --- Spearman channel correlation --------------------------------------------------

def _two_ch(spark, ya, yb):
    rows = []
    for i, v in enumerate(ya):
        rows.append(("c", "a", i, float(i), float(v)))
    for i, v in enumerate(yb):
        rows.append(("c", "b", i, float(i), float(v)))
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    return spark.createDataFrame(pdf)


def test_spearman_matches_scipy_style_ref(spark):
    from cesium_spark.operators.seriesstats import spearman_channels
    rng = np.random.RandomState(5)
    ya = rng.randint(0, 20, 60).astype(float)       # heavy ties
    yb = (0.5 * ya + rng.randint(0, 10, 60)).astype(float)
    row = spearman_channels(_two_ch(spark, ya, yb), "a", "b").collect()[0]

    def avg_ranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j < len(v) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (i + j - 1) / 2 + 1
            i = j
        return ranks

    ra, rb = avg_ranks(ya), avg_ranks(yb)
    ref = np.corrcoef(ra, rb)[0, 1]
    assert row["n_pairs"] == 60
    assert abs(row["rho"] - ref) < 1e-12


def test_spearman_monotone_and_degenerate(spark):
    from cesium_spark.operators.seriesstats import spearman_channels
    # any monotone map -> rho exactly 1 (Pearson there would be < 1)
    ya = np.arange(1, 21).astype(float)
    yb = np.exp(ya / 5)
    row = spearman_channels(_two_ch(spark, ya, yb), "a", "b").collect()[0]
    assert abs(row["rho"] - 1.0) < 1e-12
    # constant channel -> NULL
    row = spearman_channels(
        _two_ch(spark, ya, np.ones(20)), "a", "b").collect()[0]
    assert row["rho"] is None
    with pytest.raises(ValueError, match="differ"):
        spearman_channels(_two_ch(spark, ya, yb), "a", "a")


def test_spearman_pairwise_complete(spark):
    from cesium_spark.operators.seriesstats import spearman_channels
    # channel b missing at turns 0-1: only the overlap is ranked
    rows = [("c", "a", i, float(i), float(v))
            for i, v in enumerate([9, 8, 1, 2, 3, 4])]
    rows += [("c", "b", i, float(i), float(v))
             for i, v in [(2, 10), (3, 20), (4, 30), (5, 40)]]
    pdf = pd.DataFrame(rows, columns=["conv_id", "channel", "turn_idx",
                                      "t", "y"])
    row = spearman_channels(spark.createDataFrame(pdf), "a", "b").collect()[0]
    assert row["n_pairs"] == 4
    assert abs(row["rho"] - 1.0) < 1e-12   # 1,2,3,4 vs 10,20,30,40


# --- dialogue stats ----------------------------------------------------------------

def _tr(spark, rows):
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                      "text", "tool", "ts"])
    pdf["ts"] = pd.to_datetime(pdf["ts"], unit="s")
    return spark.createDataFrame(pdf)


def test_dialogue_stats_basic(spark):
    from cesium_spark.operators.derive import dialogue_stats
    rows = [
        ("c1", 0, "user", "hi there", None, 0),
        ("c1", 1, "assistant", "hello how are you", None, 10),
        ("c1", 2, "assistant", "anything else", "search", 20),
        ("c1", 3, "user", "no", None, 30),
        ("c2", 0, "user", "solo", None, 0),
    ]
    r = {x["conv_id"]: x for x in
         dialogue_stats(_tr(spark, rows)).collect()}
    c1 = r["c1"]
    assert c1["n_turns"] == 4 and c1["n_roles"] == 2
    assert c1["n_switches"] == 2            # u->a, a->u
    assert c1["longest_run"] == 2           # assistant twice
    assert abs(c1["switch_rate"] - 2 / 3) < 1e-15
    assert c1["tool_turns"] == 1
    assert c1["tok_total"] == 2 + 4 + 2 + 1
    assert c1["top_role"] == "assistant" or c1["top_role_turns"] == 2
    # tie at 2-2: deterministic rule -> lexicographically smaller role
    assert c1["top_role"] == "assistant"
    c2 = r["c2"]
    assert c2["n_turns"] == 1 and c2["switch_rate"] is None
    assert c2["longest_run"] == 1 and c2["n_switches"] == 0


def test_dialogue_stats_monologue_and_alternation(spark):
    from cesium_spark.operators.derive import dialogue_stats
    mono = [("m", i, "user", "x", None, i) for i in range(5)]
    alt = [("a", i, ["u", "v"][i % 2], "x", None, i) for i in range(6)]
    r = {x["conv_id"]: x for x in
         dialogue_stats(_tr(spark, mono + alt)).collect()}
    assert r["m"]["n_switches"] == 0 and r["m"]["longest_run"] == 5
    assert r["m"]["switch_rate"] == 0.0
    assert r["a"]["n_switches"] == 5 and r["a"]["longest_run"] == 1
    assert r["a"]["switch_rate"] == 1.0


def test_dialogue_stats_single_exchange_plan(spark):
    from cesium_spark.operators.derive import dialogue_stats
    rows = [("c", i, "u", "x y", None, i) for i in range(10)]
    plan = dialogue_stats(
        _tr(spark, rows))._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- transition entropy ------------------------------------------------------------

def _roles(spark, convs):
    rows = []
    for cid, seq in convs.items():
        for i, role in enumerate(seq):
            rows.append((cid, i, role, "x", None, i))
    return _tr(spark, rows)


def test_transition_entropy_anchors(spark):
    from cesium_spark.operators.sequences import transition_entropy
    # monologue: one state, perfectly predictable
    r = transition_entropy(
        _roles(spark, {"m": ["u"] * 10})).collect()[0]
    assert r["n_states"] == 1 and r["n_transitions"] == 9
    assert r["h_next"] == 0.0 and r["h_cond"] == 0.0
    assert r["mi"] == 0.0 and r["perplexity"] == 1.0
    # perfect alternation: next role is 50/50 marginally but fully
    # determined by the current one
    # odd length so the (u,v) and (v,u) transition counts tie at 8/8
    r = transition_entropy(
        _roles(spark, {"a": ["u", "v"] * 8 + ["u"]})).collect()[0]
    assert abs(r["h_next"] - np.log(2)) < 1e-12
    assert r["h_cond"] == 0.0
    assert abs(r["mi"] - np.log(2)) < 1e-12
    assert r["perplexity"] == 1.0


def test_transition_entropy_matches_numpy_replay(spark):
    from cesium_spark.operators.sequences import transition_entropy
    rng = np.random.RandomState(9)
    convs = {f"c{k}": [("u", "v", "w")[i] for i in
                       rng.randint(0, 3, 30)] for k in range(5)}
    r = transition_entropy(_roles(spark, convs)).collect()[0]
    from collections import Counter
    cells = Counter()
    for seq in convs.values():
        for a, b in zip(seq, seq[1:]):
            cells[(a, b)] += 1
    t = sum(cells.values())
    nfrom = Counter()
    nnext = Counter()
    for (a, b), c in cells.items():
        nfrom[a] += c
        nnext[b] += c
    h_cond = sum((c / t) * np.log(nfrom[a] / c)
                 for (a, b), c in sorted(cells.items()))
    h_next = sum((c / t) * np.log(t / c) for _, c in sorted(nnext.items()))
    assert r["n_transitions"] == t
    assert abs(r["h_cond"] - h_cond) < 1e-12
    assert abs(r["h_next"] - h_next) < 1e-12
    assert abs(r["mi"] - (h_next - h_cond)) < 1e-12
    assert r["mi"] >= -1e-12          # MI is non-negative


def test_transition_entropy_no_cross_conversation_leak(spark):
    from cesium_spark.operators.sequences import transition_entropy
    # two monologue convs in different roles: NO u->v transition may
    # appear even though v follows u in global row order
    r = transition_entropy(
        _roles(spark, {"c1": ["u"] * 4, "c2": ["v"] * 4})).collect()[0]
    assert r["n_transitions"] == 6
    assert r["h_cond"] == 0.0          # each role only follows itself
    assert abs(r["mi"] - r["h_next"]) < 1e-12


# --- CUSUM -------------------------------------------------------------------------

def _cusum_ref(y, target, slack, h):
    """Literal Page recursion."""
    su = sd = 0
    su_max = sd_max = 0
    first_up = first_dn = None
    for i, v in enumerate(y):
        su = max(0, su + v - target - slack)
        sd = max(0, sd + target - slack - v)
        su_max, sd_max = max(su_max, su), max(sd_max, sd)
        if first_up is None and su > h:
            first_up = i
        if first_dn is None and sd > h:
            first_dn = i
    return su_max, sd_max, first_up, first_dn


def test_cusum_matches_page_recursion(spark):
    from cesium_spark.operators.seriesstats import cusum
    rng = np.random.RandomState(21)
    y = list(rng.randint(3, 8, 40)) + list(rng.randint(7, 12, 40))
    row = cusum(_series(spark, y), target=5, slack=1, h=15).collect()[0]
    su, sd, fu, fd = _cusum_ref(y, 5, 1, 15)
    assert (row["s_up_max"], row["s_dn_max"]) == (su, sd)
    assert row["first_up"] == fu and row["first_dn"] == fd
    assert row["crossed_up"] and fu is not None


def test_cusum_in_control_never_alarms(spark):
    from cesium_spark.operators.seriesstats import cusum
    y = [5, 6, 4, 5, 5, 6, 4] * 10        # hugs the target
    row = cusum(_series(spark, y), target=5, slack=1, h=5).collect()[0]
    assert row["s_up_max"] == 0 and row["s_dn_max"] == 0
    assert not row["crossed_up"] and not row["crossed_dn"]
    assert row["first_up"] is None and row["first_dn"] is None


def test_cusum_downward_shift_and_no_h(spark):
    from cesium_spark.operators.seriesstats import cusum
    y = [10] * 20 + [2] * 20
    row = cusum(_series(spark, y), target=10, slack=0, h=30).collect()[0]
    assert row["s_dn_max"] == 8 * 20 and row["s_up_max"] == 0
    assert row["first_dn"] == 20 + 30 // 8  # ceil-ish: S > 30 at turn 23
    row = cusum(_series(spark, y), target=10).collect()[0]
    assert row["crossed_up"] is None and row["first_dn"] is None


def test_cusum_validation(spark):
    from cesium_spark.operators.seriesstats import cusum
    with pytest.raises(ValueError, match="target must be an int"):
        cusum(_series(spark, [1, 2]), target=1.5)
    with pytest.raises(ValueError, match="h must be"):
        cusum(_series(spark, [1, 2]), target=1, h=0)
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0],
                        "t": [0.0], "y": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        cusum(spark.createDataFrame(pdf), target=1)


def test_cusum_single_exchange_plan(spark):
    from cesium_spark.operators.seriesstats import cusum
    plan = cusum(_series(spark, list(range(30))), target=3, h=9
                 )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- Gini concentration ------------------------------------------------------------

def _gini_ref(y):
    y = np.sort(np.asarray(y, dtype=float))
    n = len(y)
    i = np.arange(1, n + 1)
    return np.sum((2 * i - n - 1) * y) / (n * y.sum())


def test_gini_matches_ref_and_anchors(spark):
    from cesium_spark.operators.seriesstats import gini_concentration
    rng = np.random.RandomState(13)
    y = rng.randint(0, 50, 80)
    row = gini_concentration(_series(spark, y)).collect()[0]
    assert row["n"] == 80 and row["total"] == int(y.sum())
    assert abs(row["gini"] - _gini_ref(y)) < 1e-12
    # perfectly even -> 0; one whale turn -> (n-1)/n
    even = gini_concentration(_series(spark, [7] * 10)).collect()[0]
    assert even["gini"] == 0.0
    whale = gini_concentration(
        _series(spark, [0] * 9 + [100])).collect()[0]
    assert abs(whale["gini"] - 0.9) < 1e-12


def test_gini_degenerates_and_validation(spark):
    from cesium_spark.operators.seriesstats import gini_concentration
    allz = gini_concentration(_series(spark, [0] * 5)).collect()[0]
    assert allz["gini"] is None
    one = gini_concentration(_series(spark, [42])).collect()[0]
    assert one["gini"] == 0.0
    import pyspark.errors
    with pytest.raises(Exception, match="negative value"):
        gini_concentration(_series(spark, [3, -1, 4])).collect()
    pdf = pd.DataFrame({"conv_id": ["c"], "turn_idx": [0],
                        "t": [0.0], "y": [1.5]})
    with pytest.raises(ValueError, match="integer"):
        gini_concentration(spark.createDataFrame(pdf))


def test_gini_single_exchange_plan(spark):
    from cesium_spark.operators.seriesstats import gini_concentration
    plan = gini_concentration(
        _series(spark, list(range(20)))
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- Newey-West HAC se -------------------------------------------------------------

def _hac_ref(y, L=3):
    y = np.asarray(y, dtype=float)
    n = len(y)
    d = y - y.mean()
    g0 = np.sum(d * d) / n
    lrv = g0
    for l in range(1, L + 1):
        gl = np.sum(d[l:] * d[:-l]) / n
        lrv += 2 * (1 - l / (L + 1)) * gl
    return np.sqrt(g0 / n), np.sqrt(max(lrv, 0) / n)


def test_hac_matches_ref_and_inflates_on_sticky(spark):
    from cesium_spark.operators.seriesstats import hac_mean_se
    rng = np.random.RandomState(17)
    # AR(1)-ish sticky integer series: HAC must inflate vs iid
    y = [20]
    for _ in range(400):
        y.append(int(round(0.8 * y[-1] + 4 + rng.randint(-3, 4))))
    row = hac_mean_se(_series(spark, y)).collect()[0]
    se_iid, se_hac = _hac_ref(y)
    assert abs(row["se_iid"] - se_iid) < 1e-12
    assert abs(row["se_hac"] - se_hac) < 1e-12
    assert row["inflation"] > 1.2
    assert abs(row["mean"] - np.mean(y)) < 1e-9


def test_hac_iid_stays_near_one_and_alternation_deflates(spark):
    from cesium_spark.operators.seriesstats import hac_mean_se
    rng = np.random.RandomState(19)
    iid = rng.randint(0, 100, 500)
    row = hac_mean_se(_series(spark, iid)).collect()[0]
    assert 0.8 < row["inflation"] < 1.2
    alt = np.tile([2, 8], 100)     # negative autocorr: HAC DEflates
    row = hac_mean_se(_series(spark, alt)).collect()[0]
    assert row["inflation"] < 0.6


def test_hac_degenerates(spark):
    from cesium_spark.operators.seriesstats import hac_mean_se
    const = hac_mean_se(_series(spark, [5] * 30)).collect()[0]
    assert const["se_iid"] is None and const["inflation"] is None
    # 2-point series: lag-3 covariance has no pairs -> NULL propagates
    short = hac_mean_se(_series(spark, [1, 9])).collect()[0]
    assert short["se_hac"] is None
    with pytest.raises(ValueError, match="max_lag"):
        hac_mean_se(_series(spark, [1, 2]), max_lag=0)


def test_q10_plan_shape(spark):
    from cesium_spark.driver_queries import q_rel_tpch_q10
    df = q_rel_tpch_q10(spark, "/root/testdata/sf0.001")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") >= 2   # customer + nation
    assert "l_returnflag" in plan.split("PushedFilters:")[1][:600] \
        if "PushedFilters:" in plan else True
    rows = df.collect()
    assert 0 < len(rows) <= 20
    revs = [r["revenue"] for r in rows]
    assert revs == sorted(revs, reverse=True)


# --- MMR re-rank -------------------------------------------------------------------

def test_mmr_prefers_diversity_over_neardup(spark):
    from cesium_spark.operators.similarity import mmr_topk
    # unit vectors by angle; query at 10 degrees. NOTE the geometry
    # matters: if the first pick IS the query direction, sim == rel
    # for every candidate and MMR cannot reorder — so the query sits
    # off-axis. a(0deg) rel=cos10; b(25deg) rel=cos15 but sim(b,a)=
    # cos25 (near-dup); c(70deg) rel=cos60, sim(c,a)=cos70 (diverse).
    def u(deg):
        r = np.radians(deg)
        return [float(np.cos(r)), float(np.sin(r))]
    vecs = [u(0), u(25), u(70)]
    q = u(10)
    out = mmr_topk(_embs(spark, vecs), q, k=3, pool=3,
                   lam=0.5).collect()
    picks = [r["vec_id"] for r in sorted(out, key=lambda r: r["pick"])]
    # plain cosine order is [a, b, c] = [0, 1, 2] (cos10 > cos15 >
    # cos60). After picking a, the near-dup b scores 0.5(cos15-cos25)
    # = 0.030 while diverse c scores 0.5(cos60-cos70) = 0.079 -> MMR
    # reorders to [0, 2, 1]
    assert picks == [0, 2, 1]
    by_pick = {r["pick"]: r for r in out}
    assert by_pick[1]["mmr_score"] is None
    s_c = 0.5 * (np.cos(np.radians(60)) - np.cos(np.radians(70)))
    assert abs(by_pick[2]["mmr_score"] - s_c) < 1e-9


def test_mmr_lam1_equals_plain_topk(spark):
    from cesium_spark.operators.similarity import mmr_topk, cosine_topk
    rng = np.random.RandomState(23)
    vecs = rng.randn(30, 8)
    q = list(rng.randn(8))
    mmr = mmr_topk(_embs(spark, [list(v) for v in vecs]), q,
                   k=4, pool=10, lam=1.0).collect()
    plain = cosine_topk(_embs(spark, [list(v) for v in vecs]), q,
                        k=4).collect()
    assert [r["vec_id"] for r in sorted(mmr, key=lambda r: r["pick"])] \
        == [r["vec_id"] for r in plain]


def test_mmr_validation(spark):
    from cesium_spark.operators.similarity import mmr_topk
    e = _embs(spark, [[1.0, 0.0], [0.0, 1.0]])
    with pytest.raises(ValueError, match="2 <= k <= pool"):
        mmr_topk(e, [1.0, 0.0], k=1)
    with pytest.raises(ValueError, match="lam"):
        mmr_topk(e, [1.0, 0.0], k=2, pool=2, lam=0.0)
    with pytest.raises(ValueError, match="zero query"):
        mmr_topk(e, [0.0, 0.0], k=2, pool=2)


# --- two-sample KS -----------------------------------------------------------------

def _ks_ref(y):
    y = np.asarray(y)
    n = len(y)
    n1 = n // 2
    a, b = y[:n1], y[n1:]
    vals = np.unique(y)
    c1 = np.array([(a <= v).sum() for v in vals])
    c2 = np.array([(b <= v).sum() for v in vals])
    dnum = np.max(np.abs(c1 * len(b) - c2 * n1))
    d = dnum / (n1 * len(b))
    lam = d * np.sqrt(n1 * len(b) / (n1 + len(b)))
    return dnum, d, lam, min(1.0, 2 * np.exp(-2 * lam * lam))


def test_ks2_matches_ref(spark):
    from cesium_spark.operators.seriesstats import ks_two_sample
    rng = np.random.RandomState(29)
    y = list(rng.randint(0, 30, 41)) + list(rng.randint(10, 60, 40))
    y = np.array(y)
    row = ks_two_sample(_series(spark, y)).collect()[0]
    dnum, d, lam, p = _ks_ref(y)
    assert row["n1"] == 40 and row["n2"] == 41
    assert row["d_num"] == dnum
    assert abs(row["d"] - d) < 1e-12
    assert abs(row["lambda"] - lam) < 1e-12
    assert abs(row["p_bound"] - p) < 1e-12
    assert row["p_bound"] < 0.05         # the shift is real


def test_ks2_same_distribution_high_p(spark):
    from cesium_spark.operators.seriesstats import ks_two_sample
    y = np.tile([3, 7, 11, 5], 30)       # identical halves
    row = ks_two_sample(_series(spark, y)).collect()[0]
    assert row["d"] == 0.0 and row["p_bound"] == 1.0
    # heavy ties + shift still detected exactly
    y2 = [5] * 40 + [6] * 40
    row = ks_two_sample(_series(spark, y2)).collect()[0]
    assert row["d"] == 1.0               # disjoint supports


def test_ks2_degenerate_and_plan(spark):
    from cesium_spark.operators.seriesstats import ks_two_sample
    one = ks_two_sample(_series(spark, [9])).collect()[0]
    assert one["d"] is None and one["p_bound"] is None
    plan = ks_two_sample(
        _series(spark, list(range(20)))
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


# --- burstiness --------------------------------------------------------------------

def _burst_ref(g):
    g = np.asarray(g, dtype=float)
    mu, sd = g.mean(), g.std()
    b = (sd - mu) / (sd + mu) if (sd + mu) > 0 else None
    x, yy = g[:-1], g[1:]
    denom = x.std() * yy.std()
    m = (np.mean((x - x.mean()) * (yy - yy.mean())) / denom
         if denom > 0 else None)
    return b, m


def test_burstiness_matches_ref(spark):
    from cesium_spark.operators.seriesstats import burstiness
    rng = np.random.RandomState(31)
    g = rng.choice([1, 2, 3, 50, 200], size=100, p=[.4, .3, .2, .07, .03])
    row = burstiness(_series(spark, g)).collect()[0]
    b, m = _burst_ref(g)
    assert abs(row["b"] - b) < 1e-12
    assert abs(row["m"] - m) < 1e-12
    assert row["b"] > 0.3                  # heavy-tailed -> bursty
    assert abs(row["mean_gap"] - g.mean()) < 1e-9


def test_burstiness_metronome_and_memory_signs(spark):
    from cesium_spark.operators.seriesstats import burstiness
    row = burstiness(_series(spark, [60] * 30)).collect()[0]
    assert row["b"] == -1.0                # constant gaps: exact -1
    assert row["m"] is None                # zero variance pairs
    alt = burstiness(_series(spark, [1, 100] * 20)).collect()[0]
    assert alt["m"] < -0.9                 # long follows short
    runs = burstiness(
        _series(spark, [1] * 20 + [100] * 20)).collect()[0]
    assert runs["m"] > 0.9                 # persistence


def test_burstiness_degenerates(spark):
    from cesium_spark.operators.seriesstats import burstiness
    allz = burstiness(_series(spark, [0] * 10)).collect()[0]
    assert allz["b"] is None
    one = burstiness(_series(spark, [5])).collect()[0]
    assert one["b"] is None and one["m"] is None
    with pytest.raises(Exception, match="negative gap"):
        burstiness(_series(spark, [3, -2, 4])).collect()


# --- Yule's K ----------------------------------------------------------------------

def _docs(spark, texts):
    pdf = pd.DataFrame({"doc_id": [f"d{i}" for i in range(len(texts))],
                        "text": texts})
    return spark.createDataFrame(pdf)


def test_yules_k_closed_forms(spark):
    from cesium_spark.operators.textstats import yules_k
    # "a a a a" : N=4, V=1, sum_c2=16 -> K = 1e4*12/16 = 7500,
    # D = 12/12 = 1, herdan = ln1/ln4 = 0
    # "a b c d" : sum_c2 = 4 -> K = 0, D = 0, herdan = 1
    out = {r["doc_id"]: r for r in
           yules_k(_docs(spark, ["a a a a", "a b c d"])).collect()}
    r0, r1 = out["d0"], out["d1"]
    assert (r0["n_tokens"], r0["n_types"], r0["sum_c2"]) == (4, 1, 16)
    assert abs(r0["yules_k"] - 7500.0) < 1e-9
    assert r0["simpson_d"] == 1.0 and r0["herdan_c"] == 0.0
    assert r1["yules_k"] == 0.0 and r1["simpson_d"] == 0.0
    assert abs(r1["herdan_c"] - 1.0) < 1e-12


def test_yules_k_matches_spectrum_definition(spark):
    from cesium_spark.operators.textstats import yules_k
    rng = np.random.RandomState(37)
    words = [f"w{i}" for i in rng.zipf(1.6, 300) if i < 50]
    text = " ".join(words)
    row = yules_k(_docs(spark, [text])).collect()[0]
    from collections import Counter
    cnt = Counter(words)
    n = sum(cnt.values())
    spectrum = Counter(cnt.values())          # V_m
    k_ref = 1e4 * (sum(m * m * vm for m, vm in spectrum.items()) - n) / n**2
    assert row["n_tokens"] == n
    assert abs(row["yules_k"] - k_ref) < 1e-9


def test_yules_k_zero_token_row_survives(spark):
    from cesium_spark.operators.textstats import yules_k
    out = {r["doc_id"]: r for r in
           yules_k(_docs(spark, ["", "x"])).collect()}
    assert out["d0"]["n_tokens"] == 0 and out["d0"]["yules_k"] is None
    assert out["d1"]["n_tokens"] == 1
    assert out["d1"]["simpson_d"] is None      # N < 2


# --- fightin' words ----------------------------------------------------------------

def _fw_ref(texts_a, texts_b, alpha0=500.0, min_count=1):
    from collections import Counter
    ca = Counter(w for t in texts_a for w in t.lower().split())
    cb = Counter(w for t in texts_b for w in t.lower().split())
    na, nb = sum(ca.values()), sum(cb.values())
    out = {}
    for w in set(ca) | set(cb):
        caw, cbw = ca[w], cb[w]
        if caw + cbw < min_count:
            continue
        aw = alpha0 * (caw + cbw) / (na + nb)
        delta = (np.log((caw + aw) / (na + alpha0 - caw - aw))
                 - np.log((cbw + aw) / (nb + alpha0 - cbw - aw)))
        z = delta / np.sqrt(1 / (caw + aw) + 1 / (cbw + aw))
        out[w] = (delta, z)
    return out


def _grouped_docs(spark, texts_a, texts_b):
    rows = [(f"a{i}", t, "A") for i, t in enumerate(texts_a)]
    rows += [(f"b{i}", t, "B") for i, t in enumerate(texts_b)]
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "text", "grp"]))


def test_fw_matches_paper_formulas(spark):
    from cesium_spark.operators.textstats import fightin_words
    ta = ["refund refund angry bad service", "refund slow bad"]
    tb = ["great fast great service", "love it great"]
    out = fightin_words(_grouped_docs(spark, ta, tb), "grp", "A", "B",
                        alpha0=10.0, min_count=1).collect()
    ref = _fw_ref(ta, tb, alpha0=10.0)
    got = {r["token"]: (r["delta"], r["z"]) for r in out}
    assert set(got) == set(ref)
    for w in ref:
        assert abs(got[w][0] - ref[w][0]) < 1e-12, w
        assert abs(got[w][1] - ref[w][1]) < 1e-12, w
    # direction: 'refund' fights for A, 'great' for B; the shared
    # word 'service' sits near 0
    assert got["refund"][1] > 0 > got["great"][1]
    assert abs(got["service"][1]) < min(got["refund"][1],
                                        -got["great"][1])


def test_fw_exclusive_words_finite_and_min_count(spark):
    from cesium_spark.operators.textstats import fightin_words
    ta, tb = ["unique unique unique"], ["other other other"]
    out = fightin_words(_grouped_docs(spark, ta, tb), "grp", "A", "B",
                        min_count=1).collect()
    got = {r["token"]: r["z"] for r in out}
    assert np.isfinite(got["unique"]) and got["unique"] > 0
    assert np.isfinite(got["other"]) and got["other"] < 0
    # min_count drops the tail
    out2 = fightin_words(_grouped_docs(spark, ta, tb), "grp", "A", "B",
                         min_count=4).collect()
    assert out2 == []
    with pytest.raises(ValueError, match="differ"):
        fightin_words(_grouped_docs(spark, ta, tb), "grp", "A", "A")


# --- trimmed stats -----------------------------------------------------------------

def test_trimmed_matches_scipy_style(spark):
    from cesium_spark.operators.seriesstats import trimmed_stats
    rng = np.random.RandomState(41)
    y = np.concatenate([rng.randint(10, 20, 45), [0, 0, 500, 900, 1000]])
    rng.shuffle(y)
    row = trimmed_stats(_series(spark, y), trim=0.1).collect()[0]
    sy = np.sort(y)
    n, k = len(y), int(0.1 * len(y))
    ref_t = sy[k:n - k].mean()
    wins = np.clip(sy, sy[k], sy[n - k - 1])
    assert row["k"] == k
    assert abs(row["trimmed_mean"] - ref_t) < 1e-12
    assert abs(row["winsor_mean"] - wins.mean()) < 1e-12
    assert row["lo_cut"] == sy[k] and row["hi_cut"] == sy[n - k - 1]
    # robustness: plain mean dragged by whales, trimmed is not
    assert abs(row["trimmed_mean"] - 15) < 3
    assert y.mean() > 25


def test_trimmed_degenerate_and_validation(spark):
    from cesium_spark.operators.seriesstats import trimmed_stats
    # trim 0.4 of a 2-point series: k=0 -> falls back to plain mean
    row = trimmed_stats(_series(spark, [2, 8]), trim=0.4).collect()[0]
    assert row["k"] == 0 and row["trimmed_mean"] == 5.0
    assert row["winsor_mean"] == 5.0
    # trim=0 is the identity
    row = trimmed_stats(_series(spark, [1, 2, 9]), trim=0.0).collect()[0]
    assert row["trimmed_mean"] == 4.0
    with pytest.raises(ValueError, match="trim"):
        trimmed_stats(_series(spark, [1, 2]), trim=0.5)


# --- calibration -------------------------------------------------------------------

def _score_df(spark, scores, labels):
    return spark.createDataFrame(pd.DataFrame(
        {"score": np.asarray(scores, dtype=float),
         "label": np.asarray(labels, dtype=bool)}))


def test_calibration_matches_ref(spark):
    from cesium_spark.operators.scoring import calibration_bins
    rng = np.random.RandomState(43)
    scores = rng.rand(500)
    labels = rng.rand(500) < scores          # perfectly calibrated source
    out = calibration_bins(_score_df(spark, scores, labels),
                           "score", "label", bins=10).collect()
    s_i = np.round(scores * 1e6).astype(np.int64)
    bins = np.minimum(s_i * 10 // 1000000, 9)
    ece_ref = 0.0
    for b in sorted(set(bins)):
        m = bins == b
        ms = s_i[m].sum() / (m.sum() * 1e6)
        pr = labels[m].sum() / m.sum()
        ece_ref += (m.sum() / 500) * abs(pr - ms)
    brier_ref = np.mean((s_i - labels * 1000000) ** 2) / 1e12
    rows = {r["bin"]: r for r in out}
    assert sum(r["n"] for r in out) == 500
    assert abs(out[0]["ece"] - ece_ref) < 1e-12
    assert abs(out[0]["brier"] - brier_ref) < 1e-12
    assert out[0]["ece"] < 0.15              # calibrated source
    for b, r in rows.items():
        m = bins == b
        assert r["n"] == m.sum() and r["n_pos"] == labels[m].sum()


def test_calibration_miscalibrated_flagged(spark):
    from cesium_spark.operators.scoring import calibration_bins
    rng = np.random.RandomState(47)
    scores = rng.rand(400)
    labels = rng.rand(400) < np.clip(scores - 0.4, 0, 1)  # overconfident
    out = calibration_bins(_score_df(spark, scores, labels),
                           "score", "label").collect()
    assert out[0]["ece"] > 0.2
    # high bins overclaim: pos_rate well under mean_score
    hi = [r for r in out if r["bin"] >= 7]
    assert all(r["pos_rate"] < r["mean_score"] for r in hi)


def test_calibration_validation(spark):
    from cesium_spark.operators.scoring import calibration_bins
    with pytest.raises(Exception, match="outside"):
        calibration_bins(_score_df(spark, [0.5, 1.5], [True, False]),
                         "score", "label").collect()
    with pytest.raises(ValueError, match="bins"):
        calibration_bins(_score_df(spark, [0.5], [True]),
                         "score", "label", bins=1)
    # boundary scores 0.0 and 1.0 land in the first/last bin
    out = calibration_bins(_score_df(spark, [0.0, 1.0], [False, True]),
                           "score", "label").collect()
    assert sorted(r["bin"] for r in out) == [0, 9]


# --- tail stats --------------------------------------------------------------------

def test_tail_stats_matches_ref(spark):
    from cesium_spark.operators.seriesstats import tail_stats
    rng = np.random.RandomState(53)
    y = rng.randint(0, 40, 101)
    row = tail_stats(_series(spark, y)).collect()[0]
    sy = np.sort(y)
    n = len(y)
    q1, q2, q3 = (sy[int(np.ceil(p * n)) - 1] for p in (0.25, 0.5, 0.75))
    assert (row["q1"], row["q2"], row["q3"]) == (q1, q2, q3)
    mu = y.mean()
    m2, m3, m4 = (np.sum((y - mu) ** k) for k in (2, 3, 4))
    assert abs(row["skew_g1"] - (m3 / n) / (m2 / n) ** 1.5) < 1e-9
    assert abs(row["kurtosis_ex"] - (n * m4 / m2**2 - 3)) < 1e-9
    assert abs(row["bowley"] - (q3 + q1 - 2 * q2) / (q3 - q1)) < 1e-12
    sigma = np.sqrt(m2 / n)
    assert abs(row["tail_ratio"]
               - (q3 - q1) / (1.3489795003921634 * sigma)) < 1e-9
    # uniform-ish: light tails -> ratio ABOVE 1
    assert row["tail_ratio"] > 1.0


def test_tail_stats_heavy_tail_flagged(spark):
    from cesium_spark.operators.seriesstats import tail_stats
    rng = np.random.RandomState(59)
    y = np.concatenate([rng.randint(10, 14, 96), [500, 700, 900, 1100]])
    rng.shuffle(y)
    row = tail_stats(_series(spark, y)).collect()[0]
    assert row["tail_ratio"] < 0.1          # sigma exploded, IQR did not
    assert row["kurtosis_ex"] > 10          # leptokurtic
    assert row["skew_g1"] > 3


def test_tail_stats_degenerates(spark):
    from cesium_spark.operators.seriesstats import tail_stats
    const = tail_stats(_series(spark, [6] * 20)).collect()[0]
    assert const["skew_g1"] is None and const["tail_ratio"] is None
    assert const["bowley"] is None          # IQR = 0
    assert (const["q1"], const["q2"], const["q3"]) == (6, 6, 6)
    tiny = tail_stats(_series(spark, [1, 5, 9])).collect()[0]
    assert tiny["kurtosis_ex"] is None      # n < 4
    assert tiny["skew_g1"] is not None


# --- SPRT --------------------------------------------------------------------------

def _sprt_ref(x, p0, p1, alpha, beta):
    import math
    l1, l0 = math.log(p1 / p0), math.log((1 - p1) / (1 - p0))
    a, b = math.log((1 - beta) / alpha), math.log(beta / (1 - alpha))
    llr = 0.0
    pos = 0
    for i, v in enumerate(x):
        pos += v
        llr = pos * l1 + (i + 1 - pos) * l0
        if llr >= a:
            return "accept_h1", i, llr
        if llr <= b:
            return "accept_h0", i, llr
    return "continue", None, llr


def test_sprt_decisions_match_wald_walk(spark):
    from cesium_spark.operators.seriesstats import sprt_bernoulli
    rng = np.random.RandomState(61)
    hi = (rng.rand(200) < 0.5).astype(int)     # true rate 0.5 -> H1
    lo = (rng.rand(200) < 0.1).astype(int)     # true rate 0.1 -> H0
    for x, want in ((hi, "accept_h1"), (lo, "accept_h0")):
        row = sprt_bernoulli(_series(spark, x), p0=0.1, p1=0.5
                             ).collect()[0]
        dec, at, llr = _sprt_ref(x, 0.1, 0.5, 0.05, 0.2)
        assert row["decision"] == dec == want
        # the walk's FIRST crossing, not the final state
        assert row["decided_at"] == at
        assert row["n_pos"] == int(x.sum())


def test_sprt_continue_and_first_crossing_wins(spark):
    from cesium_spark.operators.seriesstats import sprt_bernoulli
    # too little evidence: 3 mixed outcomes -> continue
    row = sprt_bernoulli(_series(spark, [1, 0, 1]),
                         p0=0.3, p1=0.7).collect()[0]
    assert row["decision"] == "continue" and row["decided_at"] is None
    # a walk that dips to the H0 boundary FIRST then rockets up must
    # still report H0: 8 zeros cross B before the ones arrive
    x = [0] * 8 + [1] * 30
    dec, at, _ = _sprt_ref(x, 0.3, 0.7, 0.05, 0.2)
    row = sprt_bernoulli(_series(spark, x), p0=0.3, p1=0.7).collect()[0]
    assert dec == "accept_h0"
    assert row["decision"] == "accept_h0" and row["decided_at"] == at


def test_sprt_validation(spark):
    from cesium_spark.operators.seriesstats import sprt_bernoulli
    with pytest.raises(ValueError, match="distinct p0"):
        sprt_bernoulli(_series(spark, [1, 0]), p0=0.3, p1=0.3)
    with pytest.raises(Exception, match="outside"):
        sprt_bernoulli(_series(spark, [0, 2, 1]),
                       p0=0.1, p1=0.5).collect()


# --- record stats ------------------------------------------------------------------

def _records_ref(y):
    up = dn = 0
    best = None
    worst = None
    for v in y:
        if best is None or v > best:
            up += 1
        if worst is None or v < worst:
            dn += 1
        best = v if best is None else max(best, v)
        worst = v if worst is None else min(worst, v)
    hn = sum(1.0 / i for i in range(1, len(y) + 1))
    d = up - dn
    z = d / np.sqrt(2 * (hn - 1)) if len(y) >= 2 else None
    return up, dn, d, z


def test_records_matches_ref_and_ramps(spark):
    from cesium_spark.operators.seriesstats import record_stats
    rng = np.random.RandomState(67)
    y = rng.randint(0, 1000, 150)
    row = record_stats(_series(spark, y)).collect()[0]
    up, dn, d, z = _records_ref(y)
    assert (row["rec_up"], row["rec_dn"], row["d"]) == (up, dn, d)
    assert abs(row["z"] - z) < 1e-12
    assert abs(row["z"]) < 3              # iid: no drift signal
    ramp = record_stats(_series(spark, list(range(50)))).collect()[0]
    assert ramp["rec_up"] == 50 and ramp["rec_dn"] == 1
    assert ramp["longest_up_run"] == 50 and ramp["z"] > 10
    fall = record_stats(_series(spark, list(range(50, 0, -1)))).collect()[0]
    assert fall["rec_dn"] == 50 and fall["z"] < -10
    assert fall["longest_up_run"] == 1


def test_records_ties_and_monotone_invariance(spark):
    from cesium_spark.operators.seriesstats import record_stats
    # a tie extends no record on either side
    row = record_stats(_series(spark, [5, 5, 5, 5])).collect()[0]
    assert row["rec_up"] == 1 and row["rec_dn"] == 1 and row["d"] == 0
    # records only see order: y and y^3 give identical counts
    y = np.array([3, 1, 4, 1, 5, 9, 2, 6])
    r1 = record_stats(_series(spark, y)).collect()[0]
    r2 = record_stats(_series(spark, y.astype(np.int64) ** 3)).collect()[0]
    assert (r1["rec_up"], r1["rec_dn"]) == (r2["rec_up"], r2["rec_dn"])
    one = record_stats(_series(spark, [7])).collect()[0]
    assert one["z"] is None and one["rec_up"] == 1


# --- embedding drift ---------------------------------------------------------------

def test_embedding_drift_matches_ref(spark):
    from cesium_spark.operators.similarity import embedding_drift
    rng = np.random.RandomState(71)
    a = rng.randn(40, 8)
    b = a + np.array([0, 0, 0, 0.5, 0, 0, 0, 0])   # dim 4 shifted
    row = embedding_drift(
        _embs(spark, [list(v) for v in a]),
        _embs(spark, [list(v) for v in b])).collect()[0]
    ga = np.round(a * 1e7).sum(axis=0)
    gb = np.round(b * 1e7).sum(axis=0)
    cos_ref = (ga * gb).sum() / np.sqrt((ga * ga).sum() * (gb * gb).sum())
    l2_ref = np.sqrt(((ga / 40 - gb / 40) ** 2).sum()) / 1e7
    assert row["n_a"] == 40 and row["n_b"] == 40
    assert abs(row["mean_cos"] - cos_ref) < 1e-9
    assert abs(row["mean_l2"] - l2_ref) < 1e-9
    assert row["top_gap_dim"] == 4        # 1-based
    assert abs(row["top_gap"] - 0.5) < 1e-6


def test_embedding_drift_identical_and_degenerate(spark):
    from cesium_spark.operators.similarity import embedding_drift
    vecs = [[1.0, 2.0], [3.0, -1.0]]
    same = embedding_drift(_embs(spark, vecs),
                           _embs(spark, vecs)).collect()[0]
    assert abs(same["mean_cos"] - 1.0) < 1e-12
    assert same["mean_l2"] == 0.0 and same["top_gap"] == 0.0
    # slice averaging to the origin: NULL cosine, never 0/0
    zero = embedding_drift(_embs(spark, [[1.0, 0.0], [-1.0, 0.0]]),
                           _embs(spark, vecs)).collect()[0]
    assert zero["mean_cos"] is None
    with pytest.raises(ValueError, match="grid"):
        embedding_drift(_embs(spark, vecs), _embs(spark, vecs), grid=0)


# --- Hill tail index ---------------------------------------------------------------

def _hill_ref(y, k):
    sy = np.sort(y)[::-1]
    thr = sy[k]
    if thr <= 0 or len(y) <= k:
        return None
    s = np.sum(np.log(sy[:k] / thr))
    return k / s if s > 0 else None


def test_hill_matches_ref_and_discriminates(spark):
    from cesium_spark.operators.seriesstats import hill_tail
    rng = np.random.RandomState(73)
    # Pareto(alpha=1.5) sample, gridded to ints
    pareto = np.maximum(1, (10 * rng.pareto(1.5, 300)).astype(int))
    thin = rng.randint(50, 100, 300)        # bounded -> huge alpha
    rp = hill_tail(_series(spark, pareto), k=30).collect()[0]
    rt = hill_tail(_series(spark, thin), k=30).collect()[0]
    ref = _hill_ref(pareto, 30)
    assert abs(rp["alpha"] - ref) < 1e-9
    assert rp["alpha"] < 3.5                 # heavy tail detected
    assert rt["alpha"] > rp["alpha"] * 2     # thin >> heavy
    assert rp["threshold"] == int(np.sort(pareto)[::-1][30])


def test_hill_guards(spark):
    from cesium_spark.operators.seriesstats import hill_tail
    short = hill_tail(_series(spark, [5, 3, 9]), k=20).collect()[0]
    assert short["alpha"] is None            # n <= k
    zeros = hill_tail(_series(spark, [0] * 40), k=5).collect()[0]
    assert zeros["alpha"] is None            # threshold 0
    const = hill_tail(_series(spark, [7] * 40), k=5).collect()[0]
    assert const["alpha"] is None            # sum_ln = 0, not inf
    with pytest.raises(ValueError, match="k must be"):
        hill_tail(_series(spark, [1, 2]), k=1)


# --- BH FDR ------------------------------------------------------------------------

def _pdf_p(spark, ps):
    rows = [(f"h{i:03d}", p) for i, p in enumerate(ps)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["hid", "p"]))


def test_bh_step_up_rule(spark):
    from cesium_spark.operators.scoring import bh_fdr
    # p1 = 0.03 exceeds its own line (0.025) but p2 = 0.039 clears
    # 0.05 -> BOTH rejected. Comparing each p to its own line is the
    # classic BH implementation bug; this pins the step-up.
    out = {r["hid"]: r for r in
           bh_fdr(_pdf_p(spark, [0.03, 0.039]), "p", "hid",
                  q=0.05).collect()}
    assert out["h000"]["significant"] and out["h001"]["significant"]
    assert abs(out["h000"]["p_adj"] - 0.039) < 1e-12
    assert abs(out["h001"]["p_adj"] - 0.039) < 1e-12


def test_bh_matches_reference_procedure(spark):
    from cesium_spark.operators.scoring import bh_fdr
    rng = np.random.RandomState(79)
    ps = np.concatenate([rng.uniform(0, 0.002, 10),   # real signals
                         rng.uniform(0, 1, 90)])      # nulls
    out = bh_fdr(_pdf_p(spark, ps), "p", "hid", q=0.05).collect()
    # reference: sort, step-up
    order = np.argsort(ps, kind="stable")
    m = len(ps)
    sp = ps[order]
    ks = [i + 1 for i in range(m) if sp[i] <= (i + 1) * 0.05 / m]
    k = max(ks) if ks else 0
    sig_ref = set(np.array([f"h{i:03d}" for i in order[:k]]))
    adj = np.minimum.accumulate((m * sp / np.arange(1, m + 1))[::-1])[::-1]
    adj = np.minimum(adj, 1.0)
    got_sig = {r["hid"] for r in out if r["significant"]}
    assert got_sig == sig_ref
    assert len(got_sig) >= 10                # the planted signals survive
    by_id = {r["hid"]: r for r in out}
    for pos, i in enumerate(order):
        assert abs(by_id[f"h{i:03d}"]["p_adj"] - adj[pos]) < 1e-12


def test_bh_nulls_and_none_significant(spark):
    from cesium_spark.operators.scoring import bh_fdr
    pdf = pd.DataFrame({"hid": ["a", "b", "c"],
                        "p": [0.9, None, 0.8]})
    out = {r["hid"]: r for r in
           bh_fdr(spark.createDataFrame(pdf), "p", "hid").collect()}
    assert out["b"]["significant"] is None and out["b"]["m"] is None
    assert out["a"]["m"] == 2                 # NULL excluded from m
    assert not out["a"]["significant"] and not out["c"]["significant"]
    with pytest.raises(ValueError, match="q must be"):
        bh_fdr(spark.createDataFrame(pdf), "p", "hid", q=1.0)


# --- circadian stats ---------------------------------------------------------------

def test_circadian_human_vs_bot(spark):
    from cesium_spark.operators.sequences import circadian_stats
    rows = []
    # human: 10 turns all between 09:00-10:59
    for i in range(10):
        rows.append(("hum", i, "u", "x", None,
                     1700000000 + 9 * 3600 + i * 600))
    # bot: one turn every hour for 24 hours
    for i in range(24):
        rows.append(("bot", i, "u", "x", None,
                     1700000000 + i * 3600))
    r = {x["conv_id"]: x for x in
         circadian_stats(_tr(spark, rows)).collect()}
    hum, bot = r["hum"], r["bot"]
    assert hum["n_hours_active"] == 2 and bot["n_hours_active"] == 24
    assert bot["entropy_ratio"] > 0.99       # flat histogram
    assert hum["entropy_ratio"] < 0.25
    assert abs(bot["hour_entropy"] - np.log(24)) < 1e-12
    assert hum["top_hour_share"] >= 0.5


def test_circadian_exact_entropy_and_ties(spark):
    from cesium_spark.operators.sequences import circadian_stats
    # 3 turns at hour 5, 1 at hour 7: H = 3/4 ln(4/3) + 1/4 ln 4
    base = 1700006400                       # midnight UTC
    rows = [("c", i, "u", "x", None, base + 5 * 3600 + i)
            for i in range(3)]
    rows.append(("c", 3, "u", "x", None, base + 7 * 3600))
    row = circadian_stats(_tr(spark, rows)).collect()[0]
    href = 0.75 * np.log(4 / 3) + 0.25 * np.log(4)
    assert abs(row["hour_entropy"] - href) < 1e-12
    assert row["top_hour"] == 5 and row["top_hour_share"] == 0.75
    # tie: equal counts at hours 3 and 9 -> lower hour wins
    rows = [("t", 0, "u", "x", None, base + 9 * 3600),
            ("t", 1, "u", "x", None, base + 3 * 3600)]
    row = circadian_stats(_tr(spark, rows)).collect()[0]
    assert row["top_hour"] == 3
    # singleton: entropy exactly 0
    rows = [("s", 0, "u", "x", None, 1700000000)]
    row = circadian_stats(_tr(spark, rows)).collect()[0]
    assert row["hour_entropy"] == 0.0 and row["entropy_ratio"] == 0.0


# --- leaky bucket ------------------------------------------------------------------

def _lb_ref(gaps, rn, rd, burst):
    """Literal Lindley recursion in rationals (fractions module)."""
    from fractions import Fraction
    q = Fraction(0)
    r = Fraction(rn, rd)
    n_thr = 0
    first = None
    qmax = Fraction(0)
    for i, g in enumerate(gaps):
        q = max(Fraction(0), q + 1 - r * (g or 0))
        qmax = max(qmax, q)
        if q > burst:
            n_thr += 1
            if first is None:
                first = i
    return n_thr, qmax, first


def test_leaky_bucket_matches_lindley(spark):
    from cesium_spark.operators.rates import leaky_bucket
    rng = np.random.RandomState(83)
    gaps = [None] + list(rng.randint(0, 8, 60))   # first turn: no gap
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(gaps),
        "turn_idx": np.arange(len(gaps), dtype=np.int32),
        "y": pd.array(gaps, dtype="Int64")})
    # 1 request per 3 s allowed, burst 2
    row = leaky_bucket(spark.createDataFrame(pdf),
                       rate_num=1, rate_den=3, burst=2).collect()[0]
    n_thr, qmax, first = _lb_ref(gaps, 1, 3, 2)
    assert row["n_throttled"] == n_thr
    assert row["first_throttle"] == first
    assert abs(row["max_queue"] - float(qmax)) < 1e-12
    assert row["max_queue_num"] == int(qmax * 3)


def test_leaky_bucket_anchors(spark):
    from cesium_spark.operators.rates import leaky_bucket
    def mk(gaps):
        pdf = pd.DataFrame({"conv_id": ["c"] * len(gaps),
                            "turn_idx": np.arange(len(gaps),
                                                  dtype=np.int32),
                            "y": pd.array(gaps, dtype="Int64")})
        return spark.createDataFrame(pdf)
    # slow sender: 1 req / 10 s at limit 1/2 s -> never throttled
    slow = leaky_bucket(mk([None] + [10] * 20), 1, 2, 1).collect()[0]
    assert slow["n_throttled"] == 0 and slow["first_throttle"] is None
    # rapid-fire: 21 requests in the same second at burst 3
    fast = leaky_bucket(mk([None] + [0] * 20), 1, 2, 3).collect()[0]
    assert fast["n_throttled"] > 0
    assert fast["first_throttle"] == 3      # queue hits 4 > 3 at turn 3
    assert fast["max_queue"] == 21.0
    with pytest.raises(ValueError, match="rate_num"):
        leaky_bucket(mk([None]), 0, 2, 1)
    with pytest.raises(Exception, match="negative gap"):
        leaky_bucket(mk([None, -3]), 1, 2, 1).collect()


# --- one-way ANOVA -----------------------------------------------------------------

def _anova_df(spark, groups):
    rows = []
    i = 0
    for gname, vals in groups.items():
        for v in vals:
            rows.append(("c", i, gname, int(v)))
            i += 1
    pdf = pd.DataFrame(rows, columns=["conv_id", "turn_idx",
                                      "channel", "y"])
    return spark.createDataFrame(pdf)


def test_anova_matches_scipy_style_ref(spark):
    from cesium_spark.operators.seriesstats import anova_oneway
    rng = np.random.RandomState(89)
    groups = {"a": rng.randint(10, 20, 30),
              "b": rng.randint(14, 24, 25),
              "c": rng.randint(18, 28, 35)}
    row = anova_oneway(_anova_df(spark, groups)).collect()[0]
    allv = np.concatenate(list(groups.values())).astype(float)
    n, mu = len(allv), allv.mean()
    sst = np.sum((allv - mu) ** 2)
    ssb = sum(len(v) * (v.mean() - mu) ** 2 for v in groups.values())
    k = 3
    f_ref = (ssb / (k - 1)) / ((sst - ssb) / (n - k))
    assert row["k"] == 3 and row["n"] == n
    assert abs(row["eta2"] - ssb / sst) < 1e-9
    assert abs(row["f_stat"] - f_ref) < 1e-6
    assert row["f_stat"] > 10              # the planted effect is real


def test_anova_no_effect_and_degenerates(spark):
    from cesium_spark.operators.seriesstats import anova_oneway
    rng = np.random.RandomState(97)
    same = {g: rng.randint(0, 50, 40) for g in "abc"}
    row = anova_oneway(_anova_df(spark, same)).collect()[0]
    assert row["eta2"] < 0.1 and row["f_stat"] < 4
    # perfect separation: eta2 == 1, F NULL (infinite is a data
    # property to surface, not a number to fabricate)
    sep = anova_oneway(_anova_df(spark, {"a": [5] * 5,
                                         "b": [9] * 5})).collect()[0]
    assert sep["eta2"] == 1.0 and sep["f_stat"] is None
    # single group: NULL everything
    one = anova_oneway(_anova_df(spark, {"a": [1, 5, 3]})).collect()[0]
    assert one["eta2"] is None and one["ss_between"] is None
    # constant data: SST = 0
    const = anova_oneway(_anova_df(spark, {"a": [4, 4], "b": [4, 4]})
                         ).collect()[0]
    assert const["eta2"] is None


# --- JSD halves --------------------------------------------------------------------

def _jsd_ref(text):
    from collections import Counter
    toks = text.lower().split()
    n = len(toks)
    na = n // 2
    a, b = Counter(toks[:na]), Counter(toks[na:])
    nb = n - na
    jsd = 0.0
    for w in set(a) | set(b):
        p, q = a[w] / na, b[w] / nb
        m = (p + q) / 2
        if p > 0:
            jsd += 0.5 * p * np.log(p / m)
        if q > 0:
            jsd += 0.5 * q * np.log(q / m)
    inter = len(set(a) & set(b))
    union = len(set(a) | set(b))
    return jsd, inter / union


def test_jsd_glued_vs_uniform(spark):
    from cesium_spark.operators.textstats import jsd_halves
    glued = "apple banana cherry apple banana " \
            "stock market trading stock bonds"
    uniform = "cat dog cat dog cat dog cat dog cat dog"
    out = {r["doc_id"]: r for r in
           jsd_halves(_docs(spark, [glued, uniform])).collect()}
    jg, jacg = _jsd_ref(glued)
    ju, jacu = _jsd_ref(uniform)
    assert abs(out["d0"]["jsd"] - jg) < 1e-12
    assert abs(out["d1"]["jsd"] - ju) < 1e-12
    assert abs(out["d0"]["vocab_jaccard"] - jacg) < 1e-12
    # glued doc: near-maximal divergence, zero vocab overlap
    assert out["d0"]["jsd_norm"] > 0.95 and out["d0"]["vocab_jaccard"] == 0
    assert out["d1"]["jsd_norm"] < 0.05 and out["d1"]["vocab_jaccard"] == 1


def test_jsd_degenerates_and_bounds(spark):
    from cesium_spark.operators.textstats import jsd_halves
    out = {r["doc_id"]: r for r in
           jsd_halves(_docs(spark, ["", "solo", "a b"])).collect()}
    assert out["d0"]["n_tokens"] == 0 and out["d0"]["jsd"] is None
    assert out["d1"]["jsd"] is None           # one half empty
    assert out["d2"]["n_tokens"] == 2
    # fully disjoint 1-token halves: exactly ln 2
    assert abs(out["d2"]["jsd"] - np.log(2)) < 1e-12
    assert out["d2"]["jsd_norm"] == 1.0


# --- role n-grams ------------------------------------------------------------------

def test_role_ngrams_counts_and_no_leak(spark):
    from cesium_spark.operators.sequences import role_ngrams
    convs = {"c1": ["u", "a", "u", "a", "u"],
             "c2": ["u", "a", "u"],
             "c3": ["x"]}                    # too short for trigrams
    out = role_ngrams(_roles(spark, convs), n=3, top_k=10).collect()
    got = {r["gram"]: r["support"] for r in out}
    # c1: u>a>u, a>u>a, u>a>u ; c2: u>a>u  -> u>a>u x3, a>u>a x1
    assert got == {"u>a>u": 3, "a>u>a": 1}
    shares = {r["gram"]: r["share"] for r in out}
    assert abs(shares["u>a>u"] - 0.75) < 1e-12
    # no gram may span c1|c2 boundary (e.g. u>u>a doesn't exist)
    assert "u>u>a" not in got


def test_role_ngrams_topk_deterministic_and_validation(spark):
    from cesium_spark.operators.sequences import role_ngrams
    convs = {"c": ["a", "b", "a", "c", "a", "b"]}
    out = role_ngrams(_roles(spark, convs), n=2, top_k=3).collect()
    # bigrams: a>b x2, b>a x1, a>c x1, c>a x1 -> tie at 1 broken
    # lexicographically
    assert [(r["gram"], r["support"]) for r in out] == \
        [("a>b", 2), ("a>c", 1), ("b>a", 1)]
    with pytest.raises(ValueError, match="n must be"):
        role_ngrams(_roles(spark, convs), n=1)


# --- mix stats ---------------------------------------------------------------------

def test_mix_stats_closed_forms(spark):
    from cesium_spark.operators.datastats import mix_stats
    import pyspark.sql.functions as SF
    rows = ([("d1", "x")] * 2 + [("d1", "y")] * 2   # flat 2-cat
            + [("d2", "x")] * 9 + [("d2", "y")])    # 90/10
    pdf = pd.DataFrame(rows, columns=["day", "cat"])
    out = {r["bucket"]: r for r in
           mix_stats(spark.createDataFrame(pdf),
                     SF.col("day"), SF.col("cat")).collect()}
    d1, d2 = out["d1"], out["d2"]
    assert d1["hhi"] == 0.5 and abs(d1["entropy"] - np.log(2)) < 1e-12
    assert d1["top_category"] == "x" and d1["top_share"] == 0.5  # tie->x
    assert abs(d2["hhi"] - (0.81 + 0.01)) < 1e-12
    href = 0.9 * np.log(1 / 0.9) + 0.1 * np.log(1 / 0.1)
    assert abs(d2["entropy"] - href) < 1e-12
    assert d2["top_category"] == "x" and d2["top_share"] == 0.9


def test_mix_stats_monopoly(spark):
    from cesium_spark.operators.datastats import mix_stats
    import pyspark.sql.functions as SF
    pdf = pd.DataFrame([("d", "only")] * 7, columns=["day", "cat"])
    row = mix_stats(spark.createDataFrame(pdf),
                    SF.col("day"), SF.col("cat")).collect()[0]
    assert row["hhi"] == 1.0 and row["entropy"] == 0.0
    assert row["n_categories"] == 1 and row["top_share"] == 1.0


# --- dominant lag ------------------------------------------------------------------

def test_dominant_lag_finds_planted_period(spark):
    from cesium_spark.operators.seriesstats import dominant_lag
    rng = np.random.RandomState(101)
    base = np.tile([10, 2, 5, 8, 1, 12, 3], 30)     # period 7
    y = base + rng.randint(0, 2, len(base))
    row = dominant_lag(_series(spark, y), max_lag=12).collect()[0]
    assert row["best_lag"] == 7
    assert row["r_best"] > 0.8
    # numpy cross-check of the winning numerator logic
    yy = np.asarray(y, dtype=np.int64)
    n = len(yy)
    dev = n * yy - yy.sum()
    nums = {l: int(np.sum(dev[l:] * dev[:-l])) for l in range(2, 13)}
    n0 = int(np.sum(dev * dev))
    lbest = min([l for l in nums if nums[l] == max(nums.values())])
    assert row["best_lag"] == lbest
    assert abs(row["r_best"] - nums[lbest] / n0) < 1e-12


def test_dominant_lag_period_2_and_degenerates(spark):
    from cesium_spark.operators.seriesstats import dominant_lag
    alt = dominant_lag(_series(spark, [1, 9] * 30)).collect()[0]
    # biased sample ACF: numerator has n-l pairs over N0's n terms,
    # so a perfect period tops out near (n-l)/n, not 1
    assert alt["best_lag"] == 2 and alt["r_best"] > 0.9
    const = dominant_lag(_series(spark, [4] * 30)).collect()[0]
    assert const["best_lag"] is None
    # 3-point series: only lag 2 measurable -> it wins by default
    short = dominant_lag(_series(spark, [1, 5, 2])).collect()[0]
    assert short["best_lag"] == 2
    two = dominant_lag(_series(spark, [1, 5])).collect()[0]
    assert two["best_lag"] is None          # no lag has pairs
    with pytest.raises(ValueError, match="max_lag"):
        dominant_lag(_series(spark, [1, 2]), max_lag=1)


# --- time-weighted quantiles -------------------------------------------------------

def _wseries(spark, ys, ws):
    pdf = pd.DataFrame({
        "conv_id": ["c"] * len(ys),
        "turn_idx": np.arange(len(ys), dtype=np.int32),
        "y": np.asarray(ys, dtype=np.int64),
        "w": np.asarray(ws, dtype=np.int64)})
    return spark.createDataFrame(pdf)


def test_twq_weights_dominate(spark):
    from cesium_spark.operators.seriesstats import time_weighted_quantiles
    # value 100 appears once but holds 97 of 100 seconds
    row = time_weighted_quantiles(
        _wseries(spark, [1, 2, 100, 3], [1, 1, 97, 1])).collect()[0]
    assert (row["tw_q1"], row["tw_q2"], row["tw_q3"]) == (100, 100, 100)
    # event-weighted median would be 2 or 3 — the whole point
    row = time_weighted_quantiles(
        _wseries(spark, [10, 20, 30, 40], [1, 1, 1, 1])).collect()[0]
    assert (row["tw_q1"], row["tw_q2"], row["tw_q3"]) == (10, 20, 30)


def test_twq_matches_ref_and_zero_weights(spark):
    from cesium_spark.operators.seriesstats import time_weighted_quantiles
    rng = np.random.RandomState(103)
    ys = rng.randint(0, 50, 60)
    ws = rng.randint(0, 30, 60)

    def ref(p_num):
        order = np.lexsort((np.arange(len(ys)), ys))
        cw = np.cumsum(ws[order])
        tot = cw[-1]
        for i, c in enumerate(cw):
            if 4 * c >= p_num * tot:
                return ys[order][i]
    row = time_weighted_quantiles(_wseries(spark, ys, ws)).collect()[0]
    assert row["tw_q1"] == ref(1)
    assert row["tw_q2"] == ref(2)
    assert row["tw_q3"] == ref(3)
    allz = time_weighted_quantiles(
        _wseries(spark, [1, 2], [0, 0])).collect()[0]
    assert allz["tw_q2"] is None
    with pytest.raises(Exception, match="negative duration"):
        time_weighted_quantiles(
            _wseries(spark, [1, 2], [3, -1])).collect()


# --- two-proportion z --------------------------------------------------------------

def test_prop_ztest_matches_ref(spark):
    from cesium_spark.operators.datastats import prop_ztest
    rng = np.random.RandomState(107)
    rows = [("A", int(rng.rand() < 0.30)) for _ in range(400)]
    rows += [("B", int(rng.rand() < 0.22)) for _ in range(350)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["g", "x"]))
    row = prop_ztest(df, "g", "x", "A", "B").collect()[0]
    sa = sum(x for g, x in rows if g == "A")
    sb = sum(x for g, x in rows if g == "B")
    pa, pb = sa / 400, sb / 350
    pp = (sa + sb) / 750
    z = (pa - pb) / np.sqrt(pp * (1 - pp) * (1 / 400 + 1 / 350))
    assert (row["n_a"], row["s_a"], row["n_b"], row["s_b"]) == \
        (400, sa, 350, sb)
    assert abs(row["z"] - z) < 1e-12
    assert abs(row["lift"] - (pa - pb)) < 1e-12
    assert row["z"] > 1.5                    # the planted lift shows


def test_prop_ztest_degenerates(spark):
    from cesium_spark.operators.datastats import prop_ztest
    df = spark.createDataFrame(pd.DataFrame(
        [("A", 1), ("A", 1), ("B", 1)], columns=["g", "x"]))
    row = prop_ztest(df, "g", "x", "A", "B").collect()[0]
    assert row["z"] is None                  # pooled rate == 1
    assert row["rate_a"] == 1.0
    df2 = spark.createDataFrame(pd.DataFrame(
        [("A", 0), ("A", 1)], columns=["g", "x"]))
    row = prop_ztest(df2, "g", "x", "A", "B").collect()[0]
    assert row["n_b"] == 0 and row["z"] is None and row["rate_b"] is None
    with pytest.raises(Exception, match="outside"):
        prop_ztest(spark.createDataFrame(pd.DataFrame(
            [("A", 2), ("B", 0)], columns=["g", "x"])),
            "g", "x", "A", "B").collect()


# --- conversation endings ----------------------------------------------------------

def test_endings_profiles(spark):
    from cesium_spark.operators.derive import conversation_endings
    rows = [
        ("done", 0, "user", "hi", None, 0),
        ("done", 1, "assistant", "bye now", None, 60),
        ("hang", 0, "assistant", "welcome", None, 0),
        ("hang", 1, "user", "are you there?", None, 30),
        ("tooldrop", 0, "user", "search this", None, 0),
        ("tooldrop", 1, "assistant", "running query", "search", 5),
        ("solo", 0, "user", "anyone?", None, 0),
    ]
    r = {x["conv_id"]: x for x in
         conversation_endings(_tr(spark, rows)).collect()}
    assert not r["done"]["abandoned"] and r["done"]["last_role"] == "assistant"
    assert r["done"]["final_gap_s"] == 60
    assert r["hang"]["abandoned"] and r["hang"]["ends_with_question"]
    assert r["tooldrop"]["abandoned"] and r["tooldrop"]["ends_after_tool"]
    assert not r["tooldrop"]["ends_with_question"]
    assert r["solo"]["final_gap_s"] is None and r["solo"]["abandoned"]
    assert r["solo"]["last_turn_tokens"] == 1


# --- effective rank ----------------------------------------------------------------

def test_effective_rank_isotropic_vs_collapsed(spark):
    from cesium_spark.operators.similarity import effective_rank
    rng = np.random.RandomState(109)
    iso = rng.randn(200, 6)
    direction = rng.randn(6)
    rank1 = np.outer(rng.randn(200), direction)
    r_iso = effective_rank(
        _embs(spark, [list(v) for v in iso]), dim=6).collect()[0]
    r_r1 = effective_rank(
        _embs(spark, [list(v) for v in rank1]), dim=6).collect()[0]
    assert r_iso["effective_rank"] > 5.0      # nearly full
    assert r_r1["effective_rank"] < 1.05      # collapsed
    # numpy replay on the identical integer grid
    g = np.round(iso * 1e4).astype(np.int64)
    n = len(g)
    c = n * (g.T @ g) - np.outer(g.sum(0), g.sum(0))
    # float BEFORE squaring: np.int64 ** 2 wraps silently
    pr = float(np.trace(c)) ** 2 / np.sum(c.astype(float) ** 2)
    assert abs(r_iso["effective_rank"] - pr) < 1e-6
    tv = np.trace(c) / (n * n * 1e8)
    assert abs(r_iso["total_variance"] - tv) < 1e-9


def test_effective_rank_validation(spark):
    from cesium_spark.operators.similarity import effective_rank
    with pytest.raises(ValueError, match="dim"):
        effective_rank(_embs(spark, [[1.0, 2.0]]), dim=1)
    # constant corpus: zero covariance -> NULL ER
    r = effective_rank(_embs(spark, [[1.0, 2.0]] * 5), dim=2).collect()[0]
    assert r["effective_rank"] is None and r["total_variance"] == 0.0
