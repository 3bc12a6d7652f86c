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
from pyspark.sql import DataFrame
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


def ivf_assign(embs: DataFrame, dim: int, n_centroids: int = 16,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> DataFrame:
    """(id, vec, list_id int): inverted-file coarse quantization — each
    vector is assigned to its max-dot-product centroid (ties to the
    lowest list id; np.argmax picks the first maximum). One
    (batch × dim) @ (dim × n_centroids) float64 matmul per Arrow batch;
    the centroid matrix is a broadcast constant, so assignment is a
    single scan with no shuffle. At 10^9+ vectors, write the corpus
    partitioned by list_id so the probe filter partition-prunes."""
    cents = ivf_centroids(dim, n_centroids).T  # (dim, n_centroids)

    @pandas_udf("int")
    def list_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        return pd.Series((m @ cents).argmax(axis=1).astype(np.int32))

    return embs.select(F.col(id_col), F.col(vec_col),
                       list_of(F.col(vec_col)).alias("list_id"))


def ivf_topk(embs: DataFrame, query: list[float], k: int = 10,
             n_centroids: int = 16, nprobe: int = 4,
             id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """IVF approximate top-k: probe the `nprobe` centroid lists nearest
    the query (dot desc, list id tiebreak — computed driver-side on the
    tiny centroid matrix), filter the assigned corpus with a native
    IN-list (partition-prunes when stored bucketed by list_id), then
    exact cosine re-score of the candidates only. nprobe = n_centroids
    degenerates to exact brute force — the verification mode."""
    q = np.asarray(query, dtype=np.float64)
    cents = ivf_centroids(q.size, n_centroids)
    dots = cents @ q
    order = np.lexsort((np.arange(n_centroids), -dots))
    probes = [int(i) for i in order[:nprobe]]
    a = ivf_assign(embs, q.size, n_centroids, id_col, vec_col)
    cands = a.where(F.col("list_id").isin(probes))
    return cosine_topk(cands, list(q), k, id_col, vec_col)


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
