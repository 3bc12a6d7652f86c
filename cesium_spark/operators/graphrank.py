"""TextRank keyword scoring — PageRank over the corpus token-adjacency
graph (Mihalcea & Tarau, "TextRank: Bringing Order into Text", EMNLP
2004; Page et al. 1999 for the rank recurrence). The second member of
the iterative-fixed-point family next to connected components
(dedup.py): k rounds of x' = (1−d)/n + d·Σ_in (w/outdeg)·x over a
graph whose EDGE AGGREGATION is the big-data part (10^12 turns of text
collapse into a vocabulary-sized weighted graph) and whose iteration
is joins + grouped folds with O(1) plan size per round.

Variant pinned down where choices change output: edges are DIRECTED
adjacent-token bigrams with occurrence-count weights (classic TextRank
uses an undirected co-occurrence window; the directed bigram variant
reuses the corpus's collocation structure and keeps the oracle exactly
restatable); dangling vertices (appearing only as a bigram's second
token) get a SELF-LOOP instead of global mass redistribution — the
standard dangling fix needs a corpus-wide float sum every round (an
ordering hazard and an extra all-reduce); the self-loop keeps rank
mass conserved with purely LOCAL arithmetic. Rank mass sums to 1.

Determinism contract (bit-exact cross-engine, the holt/connected-
components standard): every per-vertex incoming sum is a SORTED
SEQUENTIAL FOLD — sort_array(collect_list(struct(src, contrib)))
folded left-to-right with a 0.0 initial — which DuckDB reproduces as
list_sum(list(contrib ORDER BY src)) (probed: both are in-order
sequential folds, bit-identical on adversarial mixed-magnitude data).
Each contribution is one fixed expression tree ((w/outdeg)·x) over
exact integers and the previous round's deterministic x, so k rounds
are bit-identical in any engine and at ANY parallelism. The native
commutative sum() would be faster but order-nondeterministic in the
last ulps; at production scale swap it in only if downstream tolerates
ulp jitter (the fold costs one array materialization per vertex,
bounded by in-degree).

Scale: per round, one shuffle to join ranks into the (static,
pre-aggregated) edge list on src and one to group contributions by
dst — 2 hash exchanges × k, plan size O(1) per round via the shared
``_make_truncator`` lineage knob ('table' = reliable checkpoints that
survive executor loss — the 100 TB setting; 'none' keeps the lazy
5-round plan for oracle-scale runs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cesium_spark.operators.dedup import _make_truncator, _tokens


def token_edges(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """Directed adjacent-bigram edges (src, dst, w) aggregated over the
    whole corpus — the map-side-combinable reduction that turns 10^12
    tokens into a vocabulary² -bounded (in practice Zipf-sparse) graph.
    One hash exchange; no distinct-per-doc (weights count occurrences,
    unlike the dedup shingles)."""
    toks = _tokens(text_col)
    pairs = F.transform(
        F.sequence(F.lit(1), F.size(toks) - 1),
        lambda i: F.struct(F.element_at(toks, i).alias("src"),
                           F.element_at(toks, i + 1).alias("dst")))
    pairs = F.when(F.size(toks) < 2,
                   F.array().cast("array<struct<src:string,dst:string>>")
                   ).otherwise(pairs)
    return (docs
            .select(F.explode(pairs).alias("p"))
            .groupBy(F.col("p.src").alias("src"),
                     F.col("p.dst").alias("dst"))
            .agg(F.count(F.lit(1)).alias("w")))


def pagerank(edges: DataFrame, damping: float = 0.85,
             iterations: int = 5, checkpoint_mode: str = "none",
             checkpoint_dir: str | None = None) -> DataFrame:
    """k PageRank rounds over (src, dst, w) edges → (v, x). See module
    docstring for the dangling/self-loop and determinism contract.
    ``checkpoint_mode``: 'none' (lazy chained plan — fine for small k
    and the oracle), 'local'/'table' via the connected-components
    truncator (per-round lineage cut; 'table' survives executor loss)."""
    if not (0.0 < damping < 1.0):
        raise ValueError(f"damping must be in (0,1), got {damping}")
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = edges.sparkSession
    trunc = (None if checkpoint_mode == "none"
             else _make_truncator(spark, checkpoint_mode, checkpoint_dir))

    verts = (edges.select(F.col("src").alias("v"))
             .union(edges.select(F.col("dst").alias("v")))
             .distinct())
    srcs = edges.select(F.col("src").alias("v")).distinct()
    loops = (verts.join(srcs, "v", "left_anti")
             .select(F.col("v").alias("src"), F.col("v").alias("dst"),
                     F.lit(1).cast("long").alias("w")))
    e = edges.select("src", "dst", F.col("w").cast("long").alias("w")) \
             .unionByName(loops)
    outdeg = e.groupBy("src").agg(F.sum("w").alias("outdeg"))
    e = e.join(outdeg, "src")

    n = verts.count()  # one bounded driver action (a count, not rows)
    if n == 0:
        raise ValueError("pagerank: empty graph")
    base = (1.0 - damping) / n
    x = verts.select("v", F.lit(1.0 / n).alias("x"))
    if trunc is not None:
        # edges are re-joined every round: materialize ONCE (the
        # connected-components lesson — lineage must not re-run the
        # edge aggregation per round)
        e = trunc(e, "pr_edges", 0)
    for it in range(iterations):
        contrib = (e.join(x.withColumnRenamed("v", "src"), "src")
                   .select("dst", "src",
                           ((F.col("w").cast("double")
                             / F.col("outdeg").cast("double"))
                            * F.col("x")).alias("c")))
        s = (contrib.groupBy("dst")
             .agg(F.aggregate(
                 F.sort_array(F.collect_list(F.struct("src", "c"))),
                 F.lit(0.0), lambda acc, r: acc + r["c"]).alias("s")))
        x = (verts.join(s.withColumnRenamed("dst", "v"), "v", "left")
             .select("v", (F.lit(base)
                           + F.lit(damping)
                           * F.coalesce("s", F.lit(0.0))).alias("x")))
        if trunc is not None:
            x = trunc(x, "pr_ranks", it + 1)
    return x


def triangle_stats(edges: DataFrame) -> DataFrame:
    """Triangle count and global clustering coefficient — the third
    graph primitive next to connected components (dedup clusters) and
    PageRank (TextRank): how CLIQUISH is the graph. Output (one row):
    n_nodes, n_edges, n_triangles, n_wedges, global_cc with
    global_cc = 3·triangles / wedges (the transitivity ratio; wedges =
    Σ_v deg(v)·(deg(v)−1)/2 counts open two-paths).

    Counting shape (the compact-forward / ordered node-iterator
    scheme, Schank & Wagner 2005): direct every undirected edge
    low→high ONCE, so a triangle a<b<c is found exactly once as the
    wedge (a,b)+(b,c) closed by (a,c) — two equi-joins, no
    post-division by 6, no cartesian. Both joins key on a vertex; a
    celebrity hub of degree d contributes d² wedge rows, which is the
    algorithm's true cost — at social-graph scale that skew is
    AQE-splittable, and the ordered orientation already halves every
    hub's out-degree versus the naive direction. All counts are exact
    integers; global_cc is one terminal division.
    """
    und = (edges
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (e1.join(e2, F.col("e1.b") == F.col("e2.a"))
           .join(e3, (F.col("e1.a") == F.col("e3.a"))
                 & (F.col("e2.b") == F.col("e3.b")))
           .agg(F.count(F.lit(1)).alias("n_triangles")))
    deg = (und.select(F.col("a").alias("v"))
           .unionAll(und.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
    base = deg.agg(
        F.count(F.lit(1)).cast("long").alias("n_nodes"),
        (F.sum("deg") / F.lit(2)).cast("long").alias("n_edges"),
        F.sum(F.col("deg") * (F.col("deg") - 1) / F.lit(2))
        .cast("long").alias("n_wedges"))
    out = base.crossJoin(F.broadcast(tri))
    cc = F.when(F.col("n_wedges") > 0,
                F.lit(3.0) * F.col("n_triangles").cast("double")
                / F.col("n_wedges").cast("double"))
    return out.select("n_nodes", "n_edges",
                      F.col("n_triangles").cast("long")
                      .alias("n_triangles"),
                      "n_wedges", cc.alias("global_cc"))


def textrank(docs: DataFrame, damping: float = 0.85,
             iterations: int = 5, id_col: str = "doc_id",
             text_col: str = "text", **kw) -> DataFrame:
    """Corpus keyword scores: (token, rank, rank_rel) where rank_rel =
    n·rank (1.0 = the uniform baseline, >1 = central vocabulary) —
    scale-free, so a 6-dp contract rounding stays meaningful at any
    vocabulary size (raw ranks are O(1/n) and would round to 0)."""
    e = token_edges(docs, id_col, text_col)
    x = pagerank(e, damping, iterations, **kw)
    # n·x with the SAME n the iteration used: recompute the count via
    # a window-free broadcast of the 1-row total (engine-side, exact)
    tot = x.groupBy().agg(F.count(F.lit(1)).alias("n_verts"))
    return (x.crossJoin(F.broadcast(tot))
            .select(F.col("v").alias("token"), F.col("x").alias("rank"),
                    (F.col("x") * F.col("n_verts").cast("double"))
                    .alias("rank_rel")))


def local_clustering(edges: DataFrame, top_k: int = 50) -> DataFrame:
    """Per-node local clustering coefficient for the top_k
    highest-degree nodes: cc_v = 2·tri_v / (deg_v·(deg_v−1)) — do a
    hub's neighbours know each other? The per-node refinement of
    ``triangle_stats``' one global ratio: the nodes where local cc
    diverges from the global transitivity are exactly the bridges
    (low cc, high degree) and cliques (cc → 1) a corpus-graph audit
    wants named.

    Counting: the SAME ordered a<b<c two-equi-join enumeration as
    ``triangle_stats`` (each triangle found exactly once), then each
    triangle row fans out to its 3 member nodes via a literal-array
    explode — tri_v is an exact integer hash aggregate, deg_v an
    exact integer from the deduped undirected edge list, cc one
    terminal division (NULL for deg < 2, never 0/0). Ranking is
    deterministic: deg DESC, node ASC.

    Scale shape: two vertex-keyed equi-joins (hub-skew rows are the
    algorithm's true cost, AQE-splittable) + explode + two hash
    aggregates + a global top-k sort-limit over the NODE set — no
    cartesian, nothing driver-side.
    """
    und = (edges
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    e1, e2, e3 = und.alias("e1"), und.alias("e2"), und.alias("e3")
    tri = (e1.join(e2, F.col("e1.b") == F.col("e2.a"))
           .join(e3, (F.col("e1.a") == F.col("e3.a"))
                 & (F.col("e2.b") == F.col("e3.b")))
           .select(F.col("e1.a").alias("x"), F.col("e1.b").alias("y"),
                   F.col("e2.b").alias("z")))
    tri_v = (tri
             .select(F.explode(F.array("x", "y", "z")).alias("v"))
             .groupBy("v")
             .agg(F.count(F.lit(1)).cast("long").alias("n_tri")))
    deg = (und.select(F.col("a").alias("v"))
           .unionAll(und.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("deg")))
    joined = deg.join(tri_v, "v", "left").select(
        "v", "deg",
        F.coalesce("n_tri", F.lit(0)).cast("long").alias("n_tri"))
    d = F.col("deg").cast("double")
    cc = F.when(F.col("deg") >= 2,
                F.lit(2.0) * F.col("n_tri").cast("double")
                / (d * (d - 1)))
    return (joined
            .select("v", "deg", "n_tri", cc.alias("local_cc"))
            .orderBy(F.desc("deg"), F.asc("v"))
            .limit(top_k))


def bfs_hops(edges: DataFrame, source: str, max_hops: int = 20,
             checkpoint_mode: str = "none",
             checkpoint_dir: str | None = None) -> DataFrame:
    """Single-source BFS hop distances over the undirected graph —
    the fourth member of the iterative-fixed-point family (connected
    components name WHICH cluster, PageRank names HOW central, BFS
    names HOW FAR): (v, hop) for every vertex reachable from
    ``source``, hop = unweighted shortest-path length.

    Level-synchronous frontier expansion: round k joins the hop-k
    frontier into the (symmetrized, deduped, materialized-once) edge
    list and anti-joins the visited set — every vertex is labeled the
    FIRST time it is seen, which for unit weights IS its shortest
    distance, so the result is exact and deterministic with no float
    anywhere. Two vertex-keyed hash exchanges per round, O(diameter)
    rounds, O(1) plan size via the shared ``_make_truncator`` knob
    ('table' = reliable checkpoints surviving executor loss — the
    100 TB setting). The per-round empty-frontier probe is a bounded
    driver count (the connected-components convergence pattern), and
    a frontier still alive at ``max_hops`` RAISES instead of silently
    returning a truncated ball — partial distances are wrong answers,
    not approximations.

    Scale: frontier rows ≤ vertex set, edges scanned once per round
    from the materialized table; a hub of degree d fans out d
    candidate rows in the round that reaches it (AQE-splittable skew,
    the triangle_stats cost model). Exactly restatable in SQL as a
    hop-capped recursive CTE + min(hop) group-by.
    """
    if max_hops < 1:
        raise ValueError(f"max_hops must be >= 1, got {max_hops}")
    spark = edges.sparkSession
    trunc = (None if checkpoint_mode == "none"
             else _make_truncator(spark, checkpoint_mode, checkpoint_dir))
    und = (edges
           .select(F.col("src").alias("a"), F.col("dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .unionAll(edges
                     .select(F.col("dst").alias("a"),
                             F.col("src").alias("b"))
                     .where(F.col("a") != F.col("b")))
           .distinct())
    if trunc is not None:
        und = trunc(und, "bfs_edges", 0)
    frontier = (spark.createDataFrame([(source,)], "v string")
                .select("v", F.lit(0).cast("int").alias("hop")))
    visited = frontier
    for k in range(1, max_hops + 1):
        nxt = (und.join(frontier.withColumnRenamed("v", "a")
                        .select("a"), "a")
               .select(F.col("b").alias("v")).distinct()
               .join(visited.select("v"), "v", "left_anti")
               .select("v", F.lit(k).cast("int").alias("hop")))
        if trunc is not None:
            nxt = trunc(nxt, "bfs_frontier", k)
        else:
            nxt = nxt.localCheckpoint(eager=True)
        if nxt.isEmpty():
            return visited
        visited = visited.unionByName(nxt)
        frontier = nxt
    # vertices AT hop max_hops are legal; one final probe proves no
    # vertex sits beyond it (otherwise the ball would be truncated)
    leftover = (und.join(frontier.withColumnRenamed("v", "a")
                         .select("a"), "a")
                .select(F.col("b").alias("v")).distinct()
                .join(visited.select("v"), "v", "left_anti"))
    if leftover.isEmpty():
        return visited
    raise RuntimeError(
        f"bfs_hops: unvisited vertices remain beyond {max_hops} hops; "
        "raise max_hops (a silently truncated distance ball would be "
        "a wrong answer, not an approximation)")


def degree_assortativity(edges: DataFrame) -> DataFrame:
    """Degree assortativity coefficient (Newman, "Assortative mixing
    in networks", PRL 2002): the Pearson correlation of the degrees at
    the two ends of every undirected edge — positive = hubs link to
    hubs (social cores), negative = hubs link to leaves (star /
    hub-and-spoke, the typical token-graph shape). The one-number
    mixing summary next to triangle_stats' cliquishness.

    Computation on the house exact-integer-sufficient-statistics
    contract: degrees are exact ints from the deduped undirected edge
    list; each edge contributes BOTH orientations (the standard
    symmetric estimator), so the 2m (x=deg_src, y=deg_dst) pairs have
    symmetric marginals; n, Σx, Σy, Σx², Σy², Σxy aggregate as exact
    int64 (ANSI overflow raises — at 10^10 edges × 10^6-degree hubs
    pre-scale or sample, silent drift is not a fallback) and r is one
    fixed double tree, NULL (never 0/0) when either variance is zero
    (regular graphs ARE degree-constant).

    Scale shape: dedupe + degree aggregate + two broadcast-joinable
    vertex-keyed joins of the (v, deg) table into the edge list + ONE
    single-row aggregate — no cartesian, nothing driver-side.
    Output (one row): n_nodes, n_edges, assortativity.
    """
    und = (edges
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    deg = (und.select(F.col("a").alias("v"))
           .unionAll(und.select(F.col("b").alias("v")))
           .groupBy("v").agg(F.count(F.lit(1)).cast("long").alias("deg")))
    both = (und.select("a", "b")
            .unionAll(und.select(F.col("b").alias("a"),
                                 F.col("a").alias("b"))))
    pairs = (both
             .join(deg.select(F.col("v").alias("a"),
                              F.col("deg").alias("dx")), "a")
             .join(deg.select(F.col("v").alias("b"),
                              F.col("deg").alias("dy")), "b"))
    g = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("dx").alias("sx"), F.sum("dy").alias("sy"),
        F.sum(F.col("dx") * F.col("dx")).alias("sxx"),
        F.sum(F.col("dy") * F.col("dy")).alias("syy"),
        F.sum(F.col("dx") * F.col("dy")).alias("sxy"))
    nodes = deg.groupBy().agg(F.count(F.lit(1)).alias("n_nodes"))

    def d(c):
        return F.col(c).cast("double")

    n, sx, sy = d("n"), d("sx"), d("sy")
    cov = n * d("sxy") - sx * sy
    vx = n * d("sxx") - sx * sx
    vy = n * d("syy") - sy * sy
    r = F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx * vy))
    return (g.crossJoin(F.broadcast(nodes))
            .select(F.col("n_nodes").cast("long").alias("n_nodes"),
                    (F.col("n") / F.lit(2)).cast("long").alias("n_edges"),
                    r.alias("assortativity")))


def adamic_adar(edges: DataFrame, top_k: int = 50) -> DataFrame:
    """Adamic–Adar link prediction (Adamic & Adar 2003, "Friends and
    neighbors on the Web") over the undirected graph: for each
    NON-edge pair (u, v) with at least one common neighbor,

        AA(u, v) = Σ_{w ∈ N(u) ∩ N(v)} 1 / ln(deg(w)),

    the classic "which links are missing?" score — a shared rare
    neighbor (low degree) is stronger evidence than a shared hub.
    The missing-link question is the graph-family complement of
    bfs_hops (how far?) and local_clustering (how cliquish?).

    Determinism contract: the common-neighbor terms 1/ln(deg(w)) fold
    in w order via an ordered cumulative window (max of the
    nondecreasing running sum — positive terms, the hurst_rs trick),
    never a parallel float sum; deg(w) ≥ 2 always (w is adjacent to
    both u and v, u ≠ v), so ln is never 0 and no division guard is
    needed — by construction, not by luck.  The top-k cut orders by
    (round(aa, 6) DESC, u, v): rounding absorbs cross-engine ln()
    ulps, the pair key breaks ties exactly, so the boundary cannot
    flip between engines.

    Shape: direction/multiplicity/self-loops collapse first (the
    triangle_stats normalization); candidate pairs come from ONE
    vertex-keyed self-equi-join of the symmetric adjacency (u < v
    dedupes orientations), degree attaches by a second vertex-keyed
    join, existing edges drop via anti-join AFTER the pair-level
    aggregation (wedge rows shrink to pairs before the anti-join
    touches them).  No cartesian anywhere; a hub of degree d costs d²
    wedge rows — the algorithm's true cost, AQE-splittable, same
    skew story as triangle_stats.
    """
    if top_k < 1:
        raise ValueError(f"adamic_adar: top_k must be >= 1, got {top_k}")
    und = (edges
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    adj = (und.select(F.col("a").alias("v"), F.col("b").alias("nbr"))
           .unionAll(und.select(F.col("b").alias("v"),
                                F.col("a").alias("nbr"))))
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("deg"))
    a1 = adj.select(F.col("nbr").alias("u"), F.col("v").alias("w"))
    a2 = adj.select(F.col("v").alias("w"), F.col("nbr").alias("z"))
    wed = (a1.join(a2, "w")
           .where(F.col("u") < F.col("z"))
           .join(deg.select(F.col("v").alias("w"), "deg"), "w"))
    inv = F.lit(1.0) / F.log(F.col("deg").cast("double"))
    wcw = Window.partitionBy("u", "z").orderBy("w")
    folded = (wed
              .select("u", "z", F.sum(inv).over(wcw).alias("cum"))
              .groupBy("u", "z")
              .agg(F.max("cum").alias("aa"),
                   F.count(F.lit(1)).alias("n_common")))
    cand = folded.join(
        und,
        (folded["u"] == und["a"]) & (folded["z"] == und["b"]),
        "left_anti")
    return (cand
            .orderBy(F.round(F.col("aa"), 6).desc(),
                     F.col("u"), F.col("z"))
            .limit(int(top_k))
            .select(F.col("u"), F.col("z").alias("v"),
                    "n_common", F.col("aa")))


def kcore(edges: DataFrame, k: int = 3,
          max_iter: int = 30) -> DataFrame:
    """k-core decomposition membership (Seidman 1983) by iterative
    peeling: repeatedly delete every vertex whose degree in the
    SURVIVING graph is < k; what remains is the (unique, maximal)
    k-core — the density backbone the other graph primitives orbit
    (components find who is connected at all, clustering finds who is
    cliquish locally, the k-core finds the subgraph where everyone
    keeps ≥ k live neighbors).

    Distributed shape: the loop is O(peel-depth) rounds, each round
    = one degree aggregate + two vertex anti-joins (the removable
    set is usually tiny after round 1 and broadcasts); the surviving
    edge list is eagerly localCheckpoint-ed per round so plan size
    stays O(1) — the doc_dedup_clusters iterative contract,
    including its documented executor-loss durability caveat and the
    raise-on-non-convergence policy (a silently partial core is a
    wrong answer; peel depth > max_iter must abort loudly).  The
    peeled set is MONOTONE (a vertex once removable never becomes
    viable again), so convergence in ≤ n rounds is guaranteed; the
    empty-core fixpoint exits naturally.

    Returns (v, core_deg): vertices of the k-core with their degree
    INSIDE the core.  All counts exact integers; no float anywhere.
    """
    if not isinstance(k, int) or k < 1:
        raise ValueError(f"kcore: bad k {k!r}")
    und = (edges
           .select(F.least("src", "dst").alias("a"),
                   F.greatest("src", "dst").alias("b"))
           .where(F.col("a") != F.col("b"))
           .distinct())
    live = und.localCheckpoint(eager=True)
    for _ in range(max_iter):
        deg = (live.select(F.col("a").alias("v"))
               .unionAll(live.select(F.col("b").alias("v")))
               .groupBy("v").agg(F.count(F.lit(1)).alias("deg")))
        bad = deg.where(F.col("deg") < k).select("v")
        if bad.isEmpty():
            core_deg = deg
            break
        # no broadcast HINT: round 1 of a sparse graph can make the
        # removable set huge; AQE picks broadcast when it is small
        # (every later round) and falls back to shuffle when not
        live = (live
                .join(bad, live["a"] == bad["v"], "left_anti")
                .join(bad, live["b"] == bad["v"], "left_anti")
                .localCheckpoint(eager=True))
    else:
        raise RuntimeError(
            f"kcore: no fixpoint after {max_iter} rounds — raise "
            "max_iter; a silently partial core would be wrong")
    return core_deg.select(
        "v", F.col("deg").cast("long").alias("core_deg"))


def hits(edges: DataFrame, iterations: int = 4,
         checkpoint_mode: str = "none",
         checkpoint_dir: str | None = None) -> DataFrame:
    """HITS hubs & authorities (Kleinberg 1999) over (src, dst, w)
    edges → (v, authority, hub), the query-dependent complement of
    PageRank's global prestige: a good HUB points at good
    authorities, a good AUTHORITY is pointed at by good hubs —
    a_i(v) = Σ_{u→v} w·h_{i−1}(u), h_i(v) = Σ_{v→u} w·a_i(u).

    Normalization happens ONCE, terminally — the iteration is LINEAR,
    so per-round L1 scaling only changes a scalar factor and the
    final normalized direction is identical; skipping it removes k
    global float reductions (k ordering hazards) and leaves a single
    vocab-bounded terminal fold.  The growth bound this buys is
    documented: unnormalized scores grow like λ₁^(2k); doubles hold
    to λ₁ ≈ 1e15 at k = 4 — any real token graph is orders of
    magnitude below.

    Determinism (the pagerank contract verbatim): every per-vertex
    incoming sum is a sorted sequential fold over the contributing
    neighbor id, each contribution the fixed tree w·score, and the
    two terminal L1 sums fold over the vertex id — bit-identical in
    any engine at any parallelism.  Zero in-degree → authority 0,
    zero out-degree → hub 0 (coalesced, not dropped).

    Scale: 2 joins + 2 grouped folds per round on the pre-aggregated
    vocabulary-sized graph; ``checkpoint_mode`` shares the
    connected-components truncator ('table' survives executor loss).
    """
    if iterations < 1:
        raise ValueError(f"iterations must be >= 1, got {iterations}")
    spark = edges.sparkSession
    trunc = (None if checkpoint_mode == "none"
             else _make_truncator(spark, checkpoint_mode, checkpoint_dir))
    verts = (edges.select(F.col("src").alias("v"))
             .union(edges.select(F.col("dst").alias("v")))
             .distinct())
    if edges.isEmpty():
        raise ValueError("hits: empty graph")
    e = edges.select("src", "dst", F.col("w").cast("long").alias("w"))
    if trunc is not None:
        e = trunc(e, "hits_edges", 0)

    def _fold(df, key_out):
        return (df.groupBy(key_out)
                .agg(F.aggregate(
                    F.sort_array(F.collect_list(F.struct("nbr", "c"))),
                    F.lit(0.0), lambda acc, r: acc + r["c"])
                    .alias("s")))

    h = verts.select("v", F.lit(1.0).alias("h"))
    a = None
    for it in range(iterations):
        # authorities from hubs
        contrib_a = (e.join(h.withColumnRenamed("v", "src"), "src")
                     .select(F.col("dst").alias("v"),
                             F.col("src").alias("nbr"),
                             (F.col("w").cast("double") * F.col("h"))
                             .alias("c")))
        a = (verts.join(_fold(contrib_a, "v"), "v", "left")
             .select("v", F.coalesce("s", F.lit(0.0)).alias("a")))
        # hubs from the NEW authorities (the classic in-round order)
        contrib_h = (e.join(a.withColumnRenamed("v", "dst"), "dst")
                     .select(F.col("src").alias("v"),
                             F.col("dst").alias("nbr"),
                             (F.col("w").cast("double") * F.col("a"))
                             .alias("c")))
        h = (verts.join(_fold(contrib_h, "v"), "v", "left")
             .select("v", F.coalesce("s", F.lit(0.0)).alias("h")))
        if trunc is not None:
            a = trunc(a, "hits_a", it + 1)
            h = trunc(h, "hits_h", it + 1)
    scores = a.join(h, "v")
    tot = scores.agg(
        F.aggregate(F.sort_array(F.collect_list(F.struct("v", "a"))),
                    F.lit(0.0), lambda acc, r: acc + r["a"])
        .alias("ta"),
        F.aggregate(F.sort_array(F.collect_list(F.struct("v", "h"))),
                    F.lit(0.0), lambda acc, r: acc + r["h"])
        .alias("th"))
    out = scores.crossJoin(F.broadcast(tot))
    return out.select(
        "v",
        F.when(F.col("ta") > 0, F.col("a") / F.col("ta"))
        .otherwise(F.lit(0.0)).alias("authority"),
        F.when(F.col("th") > 0, F.col("h") / F.col("th"))
        .otherwise(F.lit(0.0)).alias("hub"))
