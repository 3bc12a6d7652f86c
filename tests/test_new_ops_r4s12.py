"""Session-12 operators: BFS hop distances, degree assortativity."""
import numpy as np
import pandas as pd
import pytest


def _edges(spark, pairs):
    return spark.createDataFrame(
        pd.DataFrame(pairs, columns=["src", "dst"]))


# --- BFS hop distances -------------------------------------------------------------

def test_bfs_path_and_unreachable(spark):
    from cesium_spark.operators.graphrank import bfs_hops
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d"),
                       ("e", "f")])            # e-f unreachable from a
    r = {x["v"]: x["hop"] for x in bfs_hops(e, "a").collect()}
    assert r == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_cycle_and_direction_blind(spark):
    from cesium_spark.operators.graphrank import bfs_hops
    # square, all edges pointing AWAY from the start's neighbors:
    # traversal must be undirected
    e = _edges(spark, [("b", "a"), ("c", "b"), ("d", "c"), ("a", "d")])
    r = {x["v"]: x["hop"] for x in bfs_hops(e, "a").collect()}
    assert r == {"a": 0, "b": 1, "d": 1, "c": 2}


def test_bfs_max_hops_raises_not_truncates(spark):
    from cesium_spark.operators.graphrank import bfs_hops
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    with pytest.raises(RuntimeError, match="unvisited vertices remain"):
        bfs_hops(e, "a", max_hops=2)
    # exactly enough hops is fine
    assert len(bfs_hops(e, "a", max_hops=3).collect()) == 4


def test_bfs_isolated_source(spark):
    from cesium_spark.operators.graphrank import bfs_hops
    # source not in the edge list at all -> just itself at hop 0
    e = _edges(spark, [("x", "y")])
    r = bfs_hops(e, "zzz").collect()
    assert [(x["v"], x["hop"]) for x in r] == [("zzz", 0)]


# --- Degree assortativity ----------------------------------------------------------

def _assort(spark, pairs):
    from cesium_spark.operators.graphrank import degree_assortativity
    return degree_assortativity(_edges(spark, pairs)).collect()[0]


def test_assortativity_star_is_minus_one(spark):
    r = _assort(spark, [("h", "a"), ("h", "b"), ("h", "c")])
    assert r["n_nodes"] == 4 and r["n_edges"] == 3
    assert abs(r["assortativity"] - (-1.0)) < 1e-12


def test_assortativity_regular_graph_null(spark):
    # triangle: every degree 2 -> zero variance -> NULL, not 0/0
    r = _assort(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    assert r["assortativity"] is None


def test_assortativity_matches_numpy(spark):
    pairs = [("a", "b"), ("b", "c"), ("c", "a"), ("a", "p"),
             ("p", "q"), ("c", "d")]
    r = _assort(spark, pairs)
    deg = {}
    und = {tuple(sorted(p)) for p in pairs}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    xs, ys = [], []
    for u, v in und:
        xs += [deg[u], deg[v]]
        ys += [deg[v], deg[u]]
    expect = np.corrcoef(xs, ys)[0, 1]
    assert abs(r["assortativity"] - expect) < 1e-9
    assert r["n_nodes"] == len(deg) and r["n_edges"] == len(und)


def test_assortativity_dedupes_direction_and_multiplicity(spark):
    # duplicated + reversed edges and a self-loop collapse first
    r1 = _assort(spark, [("h", "a"), ("a", "h"), ("h", "a"),
                         ("h", "b"), ("h", "c"), ("c", "c")])
    r2 = _assort(spark, [("h", "a"), ("h", "b"), ("h", "c")])
    assert r1 == r2
