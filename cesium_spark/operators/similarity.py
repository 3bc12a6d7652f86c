"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot product and norms are native ``aggregate``/``zip_with`` exprs
  (JVM, codegen); one scan + one top-k (no shuffle of the corpus for a
  broadcast query vector).
- ``lsh_bucketed_topk``: the scale path — random-hyperplane LSH. The
  plane matrix is a small deterministic numpy array broadcast to
  executors; signatures are computed in a vectorized pandas UDF (one
  matmul per Arrow batch); search touches only the query's bucket (and
  optionally hamming-adjacent probes). At 10^9 vectors this turns a
  full-corpus scan into a bucket lookup — the IVF/LSH trade documented
  in the survey's training-pipeline ops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

LSH_SEED = 42
IVF_SEED = 7


def _as_double(vec_col: str):
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def cosine_topk(embs: DataFrame, query: list[float], k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Exact top-k by cosine similarity to a constant query vector.
    Returns (id, cosine), ordered desc with id tiebreak (deterministic).
    """
    q = np.asarray(query, dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = embs.select(F.col(id_col), _as_double(vec_col).alias("v"))
    dot = F.aggregate(F.zip_with("v", qlit, lambda x, y: x * y),
                      F.lit(0.0), lambda s, x: s + x)
    norm = F.sqrt(F.aggregate("v", F.lit(0.0), lambda s, x: s + x * x))
    return (v.select(F.col(id_col), (dot / (norm * F.lit(qn))).alias("cosine"))
            .orderBy(F.desc("cosine"), F.col(id_col))
            .limit(k))


def _planes(dim: int, n_planes: int, seed: int = LSH_SEED) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((dim, n_planes))


def lsh_signatures(embs: DataFrame, dim: int, n_planes: int = 16,
                   id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """(id, bucket bigint): sign-bit signature under deterministic
    random hyperplanes. Vectorized: one (batch × dim) @ (dim × planes)
    matmul per Arrow batch."""
    planes = _planes(dim, n_planes)

    @pandas_udf("long")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())  # (batch, dim)
        signs = (m.astype(np.float64) @ planes) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series(signs @ weights)

    return embs.select(F.col(id_col), F.col(vec_col),
                       bucket_of(F.col(vec_col)).alias("bucket"))


def ivf_centroids(dim: int, n_centroids: int,
                  seed: int = IVF_SEED) -> np.ndarray:
    """Deterministic unit-norm coarse centroids, shape (n_centroids,
    dim). Unit norm makes dot-product ranking equal cosine ranking, so
    assignment needs no per-centroid normalization at scan time (and
    the DuckDB oracle can inline the exact float64 literals)."""
    rng = np.random.default_rng(seed)
    c = rng.standard_normal((n_centroids, dim))
    return c / np.sqrt((c * c).sum(axis=1, keepdims=True))


def ivf_trained_centroids() -> np.ndarray:
    """The frozen production index: spherical-k-means centroids trained
    ONCE by ``tools/train_ivf_centroids.py`` (deterministic
    :func:`kmeans_train` over the sf0.01 embeddings corpus) and checked
    in as float64 literals — train-once/ship-the-index is how an IVF
    deployment works, and freezing makes the matrix a constant both the
    engine and the DuckDB oracle can inline. Unit-norm rows, shape
    (n_centroids, dim)."""
    from cesium_spark.operators._ivf_trained import TRAINED_CENTROIDS
    return np.asarray(TRAINED_CENTROIDS, dtype=np.float64)


def kmeans_train(embs: DataFrame, dim: int, k: int = 16, n_iter: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 seed_salt: int = 0) -> np.ndarray:
    """Deterministic DISTRIBUTED spherical k-means for IVF coarse
    centroids — returns a unit-norm (k, dim) float64 matrix. Random
    unit centroids give unbalanced inverted lists on clustered
    embedding distributions (recall and probe cost degrade); a few
    Lloyd iterations fix the balance (pytest-pinned vs random).

    Scale shape: nothing but the (k × dim) centroid matrix ever reaches
    the driver. Seeding is a top-k by (xxhash64(id), id) — k rows
    collected; each Lloyd round is one assignment scan (broadcast
    matmul, no shuffle) plus one posexplode → groupBy(list, pos)
    aggregation whose map-side partials collapse to k·dim rows before
    the exchange. At 10^9+ vectors, train on a hash-sampled slice
    (``embs.where(xxhash64(id) % P == 0)``) — coarse quantizers need
    samples, not the corpus.

    Determinism (bit-for-bit across partitionings and cluster sizes,
    pytest-asserted): per-component sums use DECIMAL(27,15) — exact,
    order-independent arithmetic, unlike float sums whose value depends
    on partition order — and the mean is a decimal division cast to
    double. Spherical update: means are L2-normalized driver-side (tiny
    k × dim numpy); empty lists keep their previous centroid."""
    v = embs.where(F.col(vec_col).isNotNull())
    seed_rows = (v.select(id_col, vec_col)
                 .orderBy(F.xxhash64(F.col(id_col), F.lit(seed_salt)),
                          F.col(id_col))
                 .limit(k).collect())
    if len(seed_rows) < k:
        raise ValueError(
            f"kmeans_train: corpus has {len(seed_rows)} non-null "
            f"vectors, need at least k={k}")
    cents = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)

    def _unit(m: np.ndarray) -> np.ndarray:
        n = np.sqrt((m * m).sum(axis=1, keepdims=True))
        if (n == 0).any():
            raise ValueError("kmeans_train: zero-norm centroid")
        return m / n

    cents = _unit(cents)
    for _ in range(n_iter):
        assigned = ivf_assign(v, dim, id_col=id_col, vec_col=vec_col,
                              centroids=cents)
        rows = (assigned
                .select("list_id",
                        F.posexplode(F.transform(
                            F.col(vec_col), lambda x: x.cast("double")))
                        .alias("pos", "val"))
                .groupBy("list_id", "pos")
                .agg(F.sum(F.col("val").cast("decimal(27,15)")).alias("s"),
                     F.count("*").alias("n"))
                .select("list_id", "pos",
                        (F.col("s") / F.col("n")).cast("double").alias("m"))
                .collect())
        new = cents.copy()
        for r in rows:
            new[r["list_id"], r["pos"]] = r["m"]
        cents = _unit(new)
    return cents


def ivf_assign(embs: DataFrame, dim: int, n_centroids: int = 16,
               id_col: str = "vec_id", vec_col: str = "embedding",
               centroids: np.ndarray | None = None,
               check_ties: float | None = None) -> DataFrame:
    """(id, vec, list_id int): inverted-file coarse quantization — each
    vector is assigned to its max-dot-product centroid (ties to the
    lowest list id; np.argmax picks the first maximum). One
    (batch × dim) @ (dim × n_centroids) float64 matmul per Arrow batch;
    the centroid matrix is a broadcast constant, so assignment is a
    single scan with no shuffle. At 10^9+ vectors, write the corpus
    partitioned by list_id so the probe filter partition-prunes
    (pytest-evidenced in tests/test_pipeline_ops.py).

    ``centroids``: explicit unit-norm (n, dim) matrix (e.g. the frozen
    :func:`ivf_trained_centroids`); default keeps the deterministic
    random matrix. ``check_ties``: relative top-2 margin assertion —
    an oracle that replays assignment with a different summation order
    (sequential SQL vs BLAS) can flip argmax on near-ties; with a
    margin of e.g. 1e-9 (≫ the ~1e-15 rounding spread, ≪ real gaps)
    any vector whose assignment could flip fails FAST instead of
    surfacing as a confusing hash mismatch."""
    if centroids is not None:
        cmat = np.asarray(centroids, dtype=np.float64)
        if cmat.ndim != 2 or cmat.shape[1] != dim:
            raise ValueError(
                f"centroids must be (n, {dim}), got {cmat.shape}")
    else:
        cmat = ivf_centroids(dim, n_centroids)
    cents = cmat.T  # (dim, n_centroids)
    margin = check_ties

    @pandas_udf("int")
    def list_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        d = m @ cents
        if margin is not None and d.shape[1] > 1:
            top2 = np.partition(d, -2, axis=1)[:, -2:]
            gap = top2[:, 1] - top2[:, 0]
            bad = gap < margin * np.maximum(1.0, np.abs(top2[:, 1]))
            if bad.any():
                raise ValueError(
                    f"ivf_assign: {int(bad.sum())} vector(s) have "
                    f"top-2 centroid dots within relative margin "
                    f"{margin:g} — assignment is summation-order "
                    "sensitive; retrain or lower the margin knowingly")
        return pd.Series(d.argmax(axis=1).astype(np.int32))

    return embs.select(F.col(id_col), F.col(vec_col),
                       list_of(F.col(vec_col)).alias("list_id"))


def ivf_topk(embs: DataFrame, query: list[float], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding",
             centroids: np.ndarray | None = None,
             check_ties: float | None = None) -> DataFrame:
    """IVF approximate top-k: probe the `nprobe` centroid lists nearest
    the query (dot desc, list id tiebreak — computed driver-side on the
    tiny centroid matrix; n_centroids is small by construction, so this
    is O(k·dim) driver work), filter the assigned corpus with a native
    IN-list (partition-prunes when stored bucketed by list_id), then
    exact cosine re-score of the candidates only. nprobe = n_centroids
    degenerates to exact brute force — the verification mode.
    ``centroids``/``check_ties`` as in :func:`ivf_assign`; with a
    margin set, the probe CUT is also asserted (the nprobe-th and
    nprobe+1-th centroid dots must be separated)."""
    q = np.asarray(query, dtype=np.float64)
    cmat = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None else ivf_centroids(q.size, n_centroids))
    dots = cmat @ q
    order = np.lexsort((np.arange(len(cmat)), -dots))
    if check_ties is not None and 0 < nprobe < len(cmat):
        lo, hi = dots[order[nprobe]], dots[order[nprobe - 1]]
        if hi - lo < check_ties * max(1.0, abs(hi)):
            raise ValueError(
                f"ivf_topk: probe cut at nprobe={nprobe} falls on a "
                f"centroid-dot tie (gap {hi - lo:g}) — replay-order "
                "sensitive")
    probes = [int(i) for i in order[:nprobe]]
    a = ivf_assign(embs, q.size, n_centroids, id_col, vec_col,
                   centroids=centroids, check_ties=check_ties)
    cands = a.where(F.col("list_id").isin(probes))
    return cosine_topk(cands, list(q), k, id_col, vec_col)


def ivf_topk_filtered(embs: DataFrame, query: list[float], pred,
                      k: int = 10, n_centroids: int = 16, nprobe: int = 4,
                      id_col: str = "vec_id", vec_col: str = "embedding",
                      centroids: np.ndarray | None = None,
                      check_ties: float | None = None) -> DataFrame:
    """Metadata-FILTERED ANN (the FAISS IDSelector / vector-DB payload-
    filter composition): top-k among vectors satisfying ``pred`` (a
    boolean Column), probed through the IVF index.

    Design choices that matter at 10^9 vectors:

    - PRE-filter, not post-filter: ``pred`` is applied to the corpus
      BEFORE assignment/probing, so it reaches the parquet scan as a
      pushed filter and composes with list_id partition pruning. A
      post-filter of an unfiltered top-k silently returns fewer than k
      (or biased) results whenever the predicate is selective — the
      classic filtered-search bug.
    - PROBE WIDENING instead of a fixed nprobe: a selective predicate
      empties the nearest lists, so the probe set is the shortest
      dot-ordered PREFIX of centroids whose filtered-candidate count
      reaches k (never less than the requested nprobe — recall floor);
      if the whole filtered corpus holds < k matches, every list is
      probed and all matches return. The per-list matched counts come
      from ONE aggregation over the filtered corpus (n_centroids rows
      collected — a bounded driver probe, the ivf_topk precedent), not
      from repeated count-and-retry scans.
    - Deterministic: the cut position is integer arithmetic over exact
      counts; with ``check_ties`` set, EVERY adjacent centroid-dot gap
      in the probe ordering is margin-asserted (the cut index is
      data-dependent, so one boundary assertion is not enough).

    Returns (id, cosine, n_probed) — n_probed exposes the widening so
    callers (and the contract oracle) can pin it.
    """
    q = np.asarray(query, dtype=np.float64)
    cmat = (np.asarray(centroids, dtype=np.float64)
            if centroids is not None else ivf_centroids(q.size, n_centroids))
    dots = cmat @ q
    order = np.lexsort((np.arange(len(cmat)), -dots))
    if check_ties is not None and len(cmat) > 1:
        gaps = dots[order[:-1]] - dots[order[1:]]
        scale = np.maximum(1.0, np.abs(dots[order[:-1]]))
        if (gaps < check_ties * scale).any():
            raise ValueError(
                "ivf_topk_filtered: adjacent centroid dots within the "
                "tie margin — the data-dependent probe cut is replay-"
                "order sensitive; retrain or lower the margin knowingly")
    filtered = embs.where(pred)
    a = ivf_assign(filtered, q.size, n_centroids, id_col, vec_col,
                   centroids=centroids, check_ties=check_ties)
    per_list = {int(r["list_id"]): int(r["c"])
                for r in a.groupBy("list_id")
                .agg(F.count(F.lit(1)).alias("c")).collect()}
    cut = len(order)
    cum = 0
    for pos, cid in enumerate(order, start=1):
        cum += per_list.get(int(cid), 0)
        if pos >= nprobe and cum >= k:
            cut = pos
            break
    probes = [int(i) for i in order[:cut]]
    cands = a.where(F.col("list_id").isin(probes))
    out = cosine_topk(cands, list(q), k, id_col, vec_col)
    return out.withColumn("n_probed", F.lit(len(probes)))


def lsh_bucketed_topk(embs: DataFrame, query: list[float], k: int = 10,
                      n_planes: int = 16, id_col: str = "vec_id",
                      vec_col: str = "embedding",
                      multiprobe_bits: int = 1) -> DataFrame:
    """Approximate top-k: score only vectors whose bucket is the
    query's bucket or within `multiprobe_bits` hamming distance of it
    (multi-probe LSH). Candidate set is pruned BEFORE any dot products
    — the filter on `bucket` is a native IN-list that partition-prunes
    if the corpus is stored bucketed by `bucket`."""
    q = np.asarray(query, dtype=np.float64)
    planes = _planes(q.size, n_planes)
    qsig = int(((q @ planes) > 0) @ (1 << np.arange(n_planes)))
    probes = {qsig}
    if multiprobe_bits >= 1:
        probes |= {qsig ^ (1 << i) for i in range(n_planes)}
    sig = lsh_signatures(embs, q.size, n_planes, id_col, vec_col)
    cands = sig.where(F.col("bucket").isin([int(p) for p in probes]))
    return cosine_topk(cands, list(q), k, id_col, vec_col)


JL_SEED = 11


def _jl_signs(dim: int, out_dim: int, seed: int = JL_SEED) -> np.ndarray:
    """Deterministic ±1 sign matrix (dim × out_dim), Achlioptas 2003
    database-friendly JL form — every entry exactly representable, so
    the projection arithmetic is a fixed exact expression tree."""
    rng = np.random.default_rng(seed)
    return np.where(rng.random((dim, out_dim)) < 0.5, -1.0, 1.0)


def random_projection(embs: DataFrame, dim: int, out_dim: int,
                      seed: int = JL_SEED, id_col: str = "vec_id",
                      vec_col: str = "embedding") -> DataFrame:
    """Johnson–Lindenstrauss dimensionality reduction: project
    ``vec_col`` (length ``dim``) to ``out_dim`` coordinates with the
    seeded Achlioptas ±1 sign matrix, scaled by 1/√out_dim. The
    standard pre-step before LSH/IVF at 10^9+ vectors — distances are
    preserved within (1±ε) w.h.p. (pytest-pinned statistically) while
    every downstream signature/centroid matmul shrinks by
    dim/out_dim.

    Scale/determinism shape: the matrix is a compile-time literal
    (seeded — same projection on every run, executor, and engine, the
    property ``randomSplit``-style per-run randomness lacks), and each
    output coordinate is a native ``aggregate(zip_with(...))``
    left-fold — pure codegen projection, ZERO shuffles, no UDF, no
    broadcast. The left-fold order plus exactly-representable ±1
    signs and a dyadic 1/√out_dim (out_dim a power of 4 ⇒ exact)
    make the arithmetic bit-replayable term-for-term in SQL.
    """
    if out_dim < 1 or out_dim >= dim:
        raise ValueError(f"need 1 <= out_dim < dim, got {out_dim}/{dim}")
    signs = _jl_signs(dim, out_dim, seed)
    scale = 1.0 / float(np.sqrt(out_dim))
    v = _as_double(vec_col)
    cols = []
    for j in range(out_dim):
        slit = F.array(*[F.lit(float(s)) for s in signs[:, j]])
        dot = F.aggregate(
            F.zip_with(v, slit, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x)
        cols.append((dot * F.lit(scale)).alias(f"p{j}"))
    return embs.select(F.col(id_col), *cols)


def embedding_dim_stats(embs: DataFrame, collapsed_var: float = 1e-6,
                        vec_col: str = "embedding") -> DataFrame:
    """Per-dimension corpus health of an embedding column: n, mean,
    population variance, min/max, and a ``collapsed`` flag (variance
    below ``collapsed_var``) — the diagnostic that catches dead or
    saturated dimensions (a truncated export, an all-zero tail after a
    model change, anisotropic collapse) BEFORE they silently break
    every cosine downstream: a collapsed dimension contributes nothing
    to any distance, and a dominant one swamps the rest.

    Scale shape: posexplode → groupBy(dim). The map-side partial
    aggregation collapses every scan partition to (dim) rows before
    the exchange, so the shuffle carries dim × n_partitions tiny rows
    — NOT the corpus; the output is dim rows regardless of corpus
    size. NULL vectors are dropped up front; dims are reported
    1-based (the SQL subscript convention).

    Float note: mean/var_pop are order-dependent at the 1e-15 level
    (partition-order summation); consumers should compare on a grid
    (the driver query rounds at 6 dp), unlike the integer-exact
    operators in this family.
    """
    exploded = (embs
                .where(F.col(vec_col).isNotNull())
                .select(F.posexplode(
                    F.transform(F.col(vec_col),
                                lambda x: x.cast("double")))
                    .alias("pos", "val")))
    agg = exploded.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.avg("val").alias("mean"),
        F.var_pop("val").alias("variance"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"))
    return agg.select(
        (F.col("pos") + 1).cast("int").alias("dim"),
        F.col("n_vecs").cast("long").alias("n_vecs"),
        "mean", "variance", "min_val", "max_val",
        (F.col("variance") < F.lit(collapsed_var)).alias("collapsed"))


def embedding_anisotropy(embs: DataFrame, stride: int = 37,
                         id_col: str = "vec_id",
                         vec_col: str = "embedding") -> DataFrame:
    """Corpus-geometry health in one row: the distribution of cosine
    similarity between DETERMINISTICALLY paired vectors — the
    anisotropy measure (Ethayarajh 2019: contextual embeddings often
    collapse into a narrow cone; mean random-pair cosine ≈ 0 for a
    healthy isotropic corpus, → 1 for a collapsed one, where every
    ANN structure and every cosine threshold silently degrades).

    Pairing is content-free and replayable: vector i pairs with the
    vector whose rank is (rank + stride) mod n in vec_id order — one
    equi-join on the computed partner rank (no sampling RNG, no
    cartesian; exactly n pairs). ``stride`` must not divide n evenly
    into short cycles that re-pair neighbors; any moderate co-prime
    stride measures the same statistic.

    Outputs: n_pairs, cos_mean, cos_std (population), cos_p05/p50/p95
    (shared interpolation), all on the caller's grid downstream.
    Zero-norm vectors are excluded loudly in the count (n_dropped) —
    a zero vector has no direction and NULL-poisons a mean silently.

    Scale shape: one global rank (an unpartitioned window — fine for
    the DIAGNOSTIC corpus sizes this runs on; at 10^9+ vectors run it
    on a hash sample, the statistic needs ~10^5 pairs, not the corpus
    — the kmeans_train sampling note), one self-equi-join on the
    partner rank, one one-row aggregate. No UDF; dot/norms are native
    aggregate/zip_with exprs (cosine_topk precedent).
    """
    if stride < 1:
        raise ValueError(f"stride must be >= 1, got {stride}")
    from pyspark.sql import Window
    v = (embs.where(F.col(vec_col).isNotNull())
         .select(F.col(id_col).alias("__id"),
                 _as_double(vec_col).alias("__v")))
    norm = F.sqrt(F.aggregate("__v", F.lit(0.0), lambda s, x: s + x * x))
    v = v.withColumn("__norm", norm)
    n_dropped = v.where(F.col("__norm") <= 0)
    good = v.where(F.col("__norm") > 0)
    w = Window.orderBy("__id")
    ranked = good.withColumn("__r", F.row_number().over(w) - 1)
    cnt = ranked.count()
    if cnt < 2:
        raise ValueError(f"embedding_anisotropy: need >= 2 non-zero "
                         f"vectors, got {cnt}")
    a = ranked.select(F.col("__r").alias("__ra"),
                      F.col("__v").alias("__va"),
                      F.col("__norm").alias("__na"))
    b = ranked.select(F.col("__r").alias("__rb"),
                      F.col("__v").alias("__vb"),
                      F.col("__norm").alias("__nb"))
    pairs = a.join(b, (F.col("__ra") + F.lit(stride)) % F.lit(cnt)
                   == F.col("__rb"))
    dot = F.aggregate(F.zip_with("__va", "__vb", lambda x, y: x * y),
                      F.lit(0.0), lambda s, x: s + x)
    cos = dot / (F.col("__na") * F.col("__nb"))
    agg = pairs.select(cos.alias("__c")).agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.avg("__c").alias("cos_mean"),
        F.stddev_pop("__c").alias("cos_std"),
        F.percentile("__c", F.lit(0.05)).alias("cos_p05"),
        F.percentile("__c", F.lit(0.5)).alias("cos_p50"),
        F.percentile("__c", F.lit(0.95)).alias("cos_p95"))
    nd = n_dropped.count()
    return agg.withColumn("n_dropped", F.lit(nd).cast("long"))


def mmr_topk(embs: DataFrame, query: list[float], k: int = 5,
             pool: int = 20, lam: float = 0.7,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Maximal Marginal Relevance re-ranking (Carbonell & Goldstein
    1998) — the diversity-aware top-k every retrieval stack layers on
    raw cosine: greedily pick

        argmax_d  λ·rel(d) − (1−λ)·max_{s∈S} sim(d, s)

    so near-duplicates of an already-selected result are penalized
    out and the k answers COVER the neighborhood instead of repeating
    it.  Output: (pick 1..k, id, rel, mmr_score) — pick 1 is the
    plain relevance argmax and reports NULL mmr_score (S is empty;
    there is no penalty term to report).

    Two-stage shape, scale decisions explicit: the CORPUS-side work
    is the exact top-``pool`` relevance cut (cosine_topk contract —
    fully distributed, deterministic (cosine DESC, id) order); the
    greedy selection then runs as k−1 LAZILY UNROLLED DataFrame
    steps over the pool-sized table — anti-join the selected ids,
    join pool × selected for the penalty (bounded at pool·k ≤ 64·k
    rows BY SIGNATURE — the one deliberately row-unkeyed join in the
    library, broadcast and constant-size, nothing like a corpus
    cartesian), argmax via (score DESC, id) limit 1.  Nothing is
    collected; the driver never sees a vector.

    Determinism across engines: rel, pairwise sims, and scores are
    native zip_with/aggregate left-folds over the same doubles both
    engines read, so the argmax compares IDENTICAL floats; ties break
    by id.  λ enters as the same double literal on both sides.
    """
    q = np.asarray(query, dtype=np.float64)
    if not (2 <= k <= pool <= 64):
        raise ValueError(f"mmr_topk: need 2 <= k <= pool <= 64, "
                         f"got k={k}, pool={pool}")
    if not (0.0 < lam <= 1.0):
        raise ValueError(f"mmr_topk: lam must be in (0, 1], got {lam}")
    qn = float(np.sqrt((q * q).sum()))
    if qn == 0.0:
        raise ValueError("mmr_topk: zero query vector")
    qlit = F.array(*[F.lit(float(x)) for x in q])
    v = (embs.where(F.col(vec_col).isNotNull())
         .select(F.col(id_col), _as_double(vec_col).alias("__v")))
    dot = F.aggregate(F.zip_with("__v", qlit, lambda x, y: x * y),
                      F.lit(0.0), lambda s, x: s + x)
    norm = F.sqrt(F.aggregate("__v", F.lit(0.0), lambda s, x: s + x * x))
    pool_df = (v.select(F.col(id_col), F.col("__v"),
                        norm.alias("__n"),
                        (dot / (norm * F.lit(qn))).alias("rel"))
               .orderBy(F.desc("rel"), F.col(id_col))
               .limit(int(pool))
               .cache())
    first = (pool_df
             .orderBy(F.desc("rel"), F.col(id_col)).limit(1)
             .select(F.col(id_col), "__v", "__n", "rel",
                     F.lit(1).alias("pick"),
                     F.lit(None).cast("double").alias("mmr_score")))
    sel = first
    lam_l, mu_l = F.lit(float(lam)), F.lit(float(1.0 - lam))
    for i in range(2, k + 1):
        rem = pool_df.join(sel.select(id_col), id_col, "left_anti")
        svecs = F.broadcast(sel.select(
            F.col("__v").alias("__sv"), F.col("__n").alias("__sn")))
        sim = (F.aggregate(F.zip_with("__v", "__sv", lambda x, y: x * y),
                           F.lit(0.0), lambda s, x: s + x)
               / (F.col("__n") * F.col("__sn")))
        scored = (rem.join(svecs)
                  .select(F.col(id_col), "__v", "__n", "rel",
                          sim.alias("__sim"))
                  .groupBy(id_col, "__v", "__n", "rel")
                  .agg(F.max("__sim").alias("__pen"))
                  .select(F.col(id_col), "__v", "__n", "rel",
                          (lam_l * F.col("rel")
                           - mu_l * F.col("__pen")).alias("mmr_score")))
        pick = (scored
                .orderBy(F.desc("mmr_score"), F.col(id_col)).limit(1)
                .select(F.col(id_col), "__v", "__n", "rel",
                        F.lit(i).alias("pick"), "mmr_score"))
        sel = sel.unionByName(pick)
    return sel.select("pick", F.col(id_col), "rel", "mmr_score")


def embedding_drift(embs_a: DataFrame, embs_b: DataFrame,
                    grid: float = 1e7,
                    vec_col: str = "embedding") -> DataFrame:
    """Embedding-distribution drift between two corpus slices (old
    batch vs new batch, model v1 vs v2): ONE row comparing the slice
    MEAN vectors — cosine between them, L2 distance, and the single
    dimension that moved most.  The monitoring primitive that
    catches a model swap, a truncated export, or a normalization
    change before any downstream ANN/dedup silently degrades
    (embedding_dim_stats is the one-slice health check; this is the
    two-slice comparison).

    Exactness device — the integer grid, not DECIMAL: every
    component is gridded ONCE to round(x·grid) int64, so per-dim
    sums are exact at any parallelism and every output is a fixed
    double tree over those integers.  The grid scale cancels in
    mean_cos entirely (cos = Σ sᵃsᵇ / √(Σsᵃ² Σsᵇ²)); mean_l2 divides
    it back out.  Per-dim cross terms are cast to double BEFORE
    multiplying (int64·int64 at 10⁹-scale sums would overflow); the
    three dot folds run in ORDERED dim sequence with the terminal
    value picked by max_by(cum, dim) — signed terms make the running
    sum non-monotone, so the max-of-cumsum trick does NOT apply and
    is deliberately not used.  Zero-norm mean (a slice that averages
    to the origin) → NULL cosine, never 0/0.

    Plan: union → posexplode → one (slice, dim) hash aggregate whose
    map-side partials collapse to 2·dim rows before the exchange;
    everything after runs on dim-cardinality rows (the
    embedding_dim_stats contract).
    """
    if grid <= 0:
        raise ValueError(f"embedding_drift: grid must be > 0, got {grid}")
    tagged = (embs_a.where(F.col(vec_col).isNotNull())
              .select(F.lit("a").alias("__tag"), F.col(vec_col))
              .unionByName(
                  embs_b.where(F.col(vec_col).isNotNull())
                  .select(F.lit("b").alias("__tag"), F.col(vec_col))))
    exploded = tagged.select(
        "__tag",
        F.posexplode(F.transform(
            F.col(vec_col),
            lambda x: F.round(x.cast("double") * F.lit(float(grid)), 0)
            .cast("long"))).alias("pos", "g"))
    per = (exploded.groupBy("__tag", "pos")
           .agg(F.sum("g").alias("s"), F.count(F.lit(1)).alias("n")))
    wide = (per.groupBy("pos")
            .agg(F.max(F.when(F.col("__tag") == "a", F.col("s")))
                 .alias("sa"),
                 F.max(F.when(F.col("__tag") == "b", F.col("s")))
                 .alias("sb"),
                 F.max(F.when(F.col("__tag") == "a", F.col("n")))
                 .alias("na"),
                 F.max(F.when(F.col("__tag") == "b", F.col("n")))
                 .alias("nb")))
    sa, sb = F.col("sa").cast("double"), F.col("sb").cast("double")
    na, nb = F.col("na").cast("double"), F.col("nb").cast("double")
    gap = F.abs(sa / na - sb / nb) / F.lit(float(grid))
    w_ord = Window.partitionBy().orderBy("pos")
    folded = wide.select(
        "pos", "na", "nb",
        F.sum(sa * sb).over(w_ord).alias("__dot"),
        F.sum(sa * sa).over(w_ord).alias("__aa"),
        F.sum(sb * sb).over(w_ord).alias("__bb"),
        F.sum((sa / na - sb / nb) * (sa / na - sb / nb))
        .over(w_ord).alias("__d2"),
        gap.alias("__gap"))
    g = folded.groupBy().agg(
        F.max("na").cast("long").alias("n_a"),
        F.max("nb").cast("long").alias("n_b"),
        F.expr("max_by(__dot, pos)").alias("dot"),
        F.expr("max_by(__aa, pos)").alias("aa"),
        F.expr("max_by(__bb, pos)").alias("bb"),
        F.expr("max_by(__d2, pos)").alias("d2"),
        F.max("__gap").alias("top_gap"),
        F.expr("min_by(pos, struct(-__gap, pos))").alias("top_gap_dim"))
    ok = (F.col("aa") > 0) & (F.col("bb") > 0)
    cos = F.when(ok, F.col("dot") / F.sqrt(F.col("aa") * F.col("bb")))
    l2 = F.sqrt(F.col("d2")) / F.lit(float(grid))
    return g.select(
        "n_a", "n_b", cos.alias("mean_cos"), l2.alias("mean_l2"),
        (F.col("top_gap_dim") + 1).cast("int").alias("top_gap_dim"),
        F.col("top_gap"))


def effective_rank(embs: DataFrame, dim: int, grid: float = 1e4,
                   vec_col: str = "embedding") -> DataFrame:
    """Effective dimensionality of the embedding corpus by the
    participation ratio of the covariance spectrum —

        ER = (Σλ)² / Σλ²  =  trace(C)² / ‖C‖²_F

    — WITHOUT any eigendecomposition: the trace and the Frobenius
    norm are plain sums over covariance cells, so the whole statistic
    is two folds over the (dim × dim) cell table.  ER ≈ dim means an
    isotropic, fully-used space; ER ≪ dim is the anisotropic
    collapse (Ethayarajh) that silently breaks cosine retrieval —
    the one-number summary behind embedding_dim_stats' per-dim view.

    Exactness: components grid to round(x·grid) int64 (the
    embedding_drift device) — at the DEFAULT grid 1e4, NOT drift's
    1e7: the covariance numerator n·Σg_d·g_e − S_d·S_e squares the
    grid, so n·Σ(g·g) ~ n²·(grid·|x|)² must stay under 2⁶³ — 1e4
    holds to ~10⁶ unit-scale vectors where 1e7 overflows at a few
    hundred (caught by the overflow test before shipping; ANSI
    raises, never wraps).  The numerators are exact int64; squares
    are taken in double (squaring the cells would overflow), both
    folds run in ORDERED (d, e) cell sequence, and the grid scale
    cancels in ER exactly.  trace is also reported in real units.
    For 10⁹-vector corpora use the kmeans_train hash-sample
    workflow — a rank statistic needs a sample, not the corpus.

    Plan: outer products form NATIVELY per row (nested transform +
    flatten + posexplode — no self-join on vector id), collapse
    map-side to dim² cells, then cell-table-sized fold work.  Cost
    is dim²·n explode rows — the honest price of a covariance,
    stated; no shuffle carries more than dim² rows per partition.
    """
    if dim < 2:
        raise ValueError(f"effective_rank: dim must be >= 2, got {dim}")
    if grid <= 0:
        raise ValueError(f"effective_rank: grid must be > 0, got {grid}")
    v = F.transform(F.col(vec_col),
                    lambda x: F.round(x.cast("double") * F.lit(float(grid)),
                                      0).cast("long"))
    outer = F.flatten(F.transform(v, lambda a: F.transform(
        v, lambda b: a * b)))
    exploded = (embs.where(F.col(vec_col).isNotNull())
                .select(F.posexplode(outer).alias("pos", "prod")))
    cells = (exploded
             .select((F.col("pos") / dim).cast("int").alias("d"),
                     (F.col("pos") % dim).cast("int").alias("e"),
                     "prod")
             .groupBy("d", "e")
             .agg(F.sum("prod").alias("spp"),
                  F.count(F.lit(1)).alias("n")))
    # per-dim sums for the mean correction: the diagonal of the
    # (d, e) table doesn't carry S_d, so compute sums separately
    sums = (embs.where(F.col(vec_col).isNotNull())
            .select(F.posexplode(v).alias("d", "g"))
            .groupBy("d")
            .agg(F.sum("g").alias("s")))
    j = (cells
         .join(sums.select(F.col("d").alias("dd"),
                           F.col("s").alias("sd")),
               F.col("d") == F.col("dd"))
         .join(sums.select(F.col("d").alias("ee"),
                           F.col("s").alias("se")),
               F.col("e") == F.col("ee"))
         .select("d", "e", "n",
                 (F.col("n") * F.col("spp")
                  - F.col("sd") * F.col("se")).alias("cnum")))
    w_ord = Window.partitionBy().orderBy("d", "e")
    cd = F.col("cnum").cast("double")
    folded = j.select(
        "d", "e", "n",
        F.sum(F.when(F.col("d") == F.col("e"), cd)
              .otherwise(F.lit(0.0))).over(w_ord).alias("__tr"),
        F.sum(cd * cd).over(w_ord).alias("__fr"))
    g = folded.groupBy().agg(
        F.max("n").cast("long").alias("n"),
        # scalar fold key d*dim+e, not struct: DuckDB's arg_max has
        # no struct overload and the replay must use the same rule
        F.expr(f"max_by(__tr, d * {dim} + e)").alias("trace_num"),
        F.expr(f"max_by(__fr, d * {dim} + e)").alias("frob_num"))
    nd = F.col("n").cast("double")
    ok = F.col("frob_num") > 0
    er = F.when(ok, F.col("trace_num") * F.col("trace_num")
                / F.col("frob_num"))
    trace_real = F.col("trace_num") / (nd * nd * F.lit(float(grid))
                                       * F.lit(float(grid)))
    return g.select(
        "n", F.lit(int(dim)).alias("dim"),
        trace_real.alias("total_variance"),
        er.alias("effective_rank"))


def ncm_classify(embs: DataFrame, grid: float = 1e7, fold_mod: int = 5,
                 vec_col: str = "embedding",
                 label_col: str = "label",
                 id_col: str = "vec_id") -> DataFrame:
    """Nearest-class-mean classification over the embedding corpus
    (the NCM baseline of Mensink et al. 2013; also the 'prototype'
    in few-shot literature) — the evaluate-step that tells you
    whether the embedding space SEPARATES your labels at all before
    you spend anything on a learned head: hold out every
    ``fold_mod``-th vector by id, average the rest per label, assign
    each held-out vector to the nearest class mean, report per-class
    accuracy.

    Exactness: train centroids use the embedding_drift integer-grid
    device — components gridded ONCE to round(x·grid) int64, so
    per-(label, dim) sums are exact at any parallelism; each test
    component uses the SAME grid, so the squared-distance terms
    t = gx_d − s_ld/n_l are fixed double trees; the Σt² fold per
    (vector, label) runs in ORDERED dim sequence and — squares being
    nonnegative — its running sum is nondecreasing, so the terminal
    value is max(cum) (the hurst fold rule; the drift fold needed
    max_by because ITS terms are signed).  The argmin pick is
    min_by(label, struct(d2, label)) — deterministic lowest-label
    tiebreak over bit-identical doubles.  The /grid² scale on d²
    is monotone and therefore never applied.

    Split contract: ``id % fold_mod == 0`` is the test fold —
    content-addressed like hash_split, so the fold never migrates
    under repartition or table growth by append-with-increasing-id.

    Degenerate: a test label with no TRAIN vectors classifies
    against the remaining centroids (its accuracy shows the miss);
    an EMPTY train set raises eagerly (driver-side
    isEmpty — an in-plan raise on the broadcast side is elided by
    AQE when the test side is empty; found live, noted here for the
    next in-plan-guard author).

    Plan: one (label, dim) train aggregate (label·dim rows,
    broadcast), one posexplode of the test fold joined to it on dim,
    one (vec, label) ordered fold + one per-vec argmin + one
    per-label aggregate — the brute-force exact baseline by design
    (the IVF/PQ path is the ANN complement at corpus scale).
    """
    if grid <= 0:
        raise ValueError(f"ncm_classify: grid must be > 0, got {grid}")
    if not isinstance(fold_mod, int) or fold_mod < 2:
        raise ValueError(f"ncm_classify: fold_mod must be an int >= 2, "
                         f"got {fold_mod!r}")
    base = embs.where(F.col(vec_col).isNotNull()
                      & F.col(label_col).isNotNull())
    gvec = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * F.lit(float(grid)), 0)
        .cast("long"))
    is_test = F.col(id_col) % fold_mod == 0
    train_rows = base.where(~is_test)
    # eager driver-side guard (the pagerank n-count discipline): an
    # in-plan raise on the broadcast side is ELIDED by AQE when the
    # test side is empty — found live; a bounded isEmpty() cannot be
    # optimized away
    if train_rows.isEmpty():
        raise ValueError("ncm_classify: empty train set")
    train = train_rows.select(F.col(label_col).alias("__l"),
                              F.posexplode(gvec).alias("pos", "g"))
    cent = train.groupBy("__l", "pos").agg(
        F.sum("g").alias("s"),
        F.count(F.lit(1)).alias("n"))
    test = (base.where(is_test)
            .select(F.col(id_col).alias("__id"),
                    F.col(label_col).alias("__true"),
                    F.posexplode(gvec).alias("pos", "gx")))
    joined = test.join(F.broadcast(cent), "pos")
    t = (F.col("gx").cast("double")
         - F.col("s").cast("double") / F.col("n").cast("double"))
    w_ord = (Window.partitionBy("__id", "__l").orderBy("pos")
             .rowsBetween(Window.unboundedPreceding, 0))
    folded = joined.select(
        "__id", "__true", "__l",
        F.sum(t * t).over(w_ord).alias("__cum"))
    d2 = (folded.groupBy("__id", "__true", "__l")
          .agg(F.max("__cum").alias("d2")))
    pred = (d2.groupBy("__id", "__true")
            .agg(F.expr("min_by(__l, struct(d2, __l))").alias("__pred")))
    out = (pred.groupBy(F.col("__true").alias(label_col))
           .agg(F.count(F.lit(1)).alias("n_test"),
                F.sum(F.when(F.col("__pred") == F.col("__true"), 1)
                      .otherwise(0)).alias("n_correct")))
    return out.select(
        label_col,
        F.col("n_test").cast("long").alias("n_test"),
        F.col("n_correct").cast("long").alias("n_correct"),
        (F.col("n_correct").cast("double")
         / F.col("n_test").cast("double")).alias("accuracy"))
