"""Product quantization (Jégou et al. 2011) — the memory-bounded ANN
path that completes the embedding family next to exact top-k, LSH and
IVF (SURVEY.md §2 training-data-pipeline block: similarity search at
100 TB). A 64-dim float32 embedding (256 B) compresses to an m-byte
code (m=8 → 8 B before packing, ONE bigint after: 32× smaller), and
query scoring becomes a table lookup per subspace — the index for
corpora whose raw vectors don't fit the cluster's memory.

Exactness contract (the reason this module is native expressions, not
a numpy matmul like the LSH/IVF assignment kernels): every codeword
distance is the SAME fixed-order sum of exact double subtractions/
squares in Spark and in the DuckDB oracle, and argmin is
``array_position(d, array_min(d))`` — first match, so ties break to
the smallest codeword index in both engines. No BLAS summation-order
ambiguity exists anywhere in the encode path, which is what lets the
driver run a FULL-VALUE oracle over the codes (the IVF assignment
kernel needs a top-2 tie-margin assertion instead; stated there).

Scale shape: encoding is a pure projection over the scan — zero
shuffle, whole-stage codegen; ADC top-k is the same projection plus a
TakeOrdered. Training is offline (tools/train_pq_codebooks.py freezes
the codebooks into ``_pq_trained.py`` the way the IVF centroids are
frozen); at 10^9+ vectors train on a hash-sampled slice — quantizers
need samples, not the corpus.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _check_codebooks(codebooks) -> np.ndarray:
    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError(f"codebooks must be (m, ksub, dsub), got "
                         f"shape {cb.shape}")
    return cb


def _as_double_elem(vec_col: str, idx: int) -> Column:
    # 1-based element_at; float32 → float64 widening is exact
    return F.element_at(F.col(vec_col), idx).cast("double")


def pq_code_cols(codebooks, vec_col: str = "embedding") -> list[Column]:
    """One int column per subspace: the index of the nearest codeword
    under squared L2, as a native expression (fixed-order sums, exact
    compares, first-match tiebreak — engine-identical)."""
    cb = _check_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    cols = []
    for i in range(m):
        dists = []
        for kk in range(ksub):
            d = None
            for j in range(dsub):
                e = _as_double_elem(vec_col, i * dsub + j + 1)
                c = F.lit(float(cb[i, kk, j]))
                term = (e - c) * (e - c)
                d = term if d is None else d + term
            dists.append(d)
        arr = F.array(*dists)
        cols.append((F.array_position(arr, F.array_min(arr)) - 1)
                    .cast("int").alias(f"code_{i}"))
    return cols


def pq_encode(embs: DataFrame, codebooks,
              id_col: str = "vec_id",
              vec_col: str = "embedding") -> DataFrame:
    """(id, code_0..code_{m-1}, pq_code) — per-subspace nearest-codeword
    indices plus the single packed bigint (``bits = ⌈log2 ksub⌉`` bits
    per subspace, subspace 0 in the LOW bits). NULL vectors are
    dropped up front (emb_cosine_pairs precedent: a NULL row must not
    masquerade as a zero vector)."""
    cb = _check_codebooks(codebooks)
    m, ksub, _ = cb.shape
    bits = int(ksub - 1).bit_length()
    if m * bits > 63:
        raise ValueError(f"packed code needs {m * bits} bits > 63; "
                         f"reduce m or ksub")
    v = embs.where(F.col(vec_col).isNotNull())
    coded = v.select(F.col(id_col), *pq_code_cols(cb, vec_col))
    packed = None
    for i in range(m):
        part = F.shiftleft(F.col(f"code_{i}").cast("long"), bits * i)
        packed = part if packed is None else packed + part
    return coded.withColumn("pq_code", packed)


def pq_luts(query, codebooks) -> list[list[float]]:
    """Asymmetric-distance lookup tables for one query: LUT[i][k] =
    ‖q_sub_i − c_{i,k}‖² computed in plain Python floats ONCE on the
    driver — both the engine and the oracle inline the SAME literals,
    so ADC is a fixed-order sum of identical constants."""
    cb = _check_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    q = [float(x) for x in query]
    if len(q) != m * dsub:
        raise ValueError(f"query dim {len(q)} != m*dsub = {m * dsub}")
    luts = []
    for i in range(m):
        row = []
        for kk in range(ksub):
            s = 0.0
            for j in range(dsub):
                diff = q[i * dsub + j] - float(cb[i, kk, j])
                s += diff * diff
            row.append(s)
        luts.append(row)
    return luts


def pq_adc_topk(embs: DataFrame, query, codebooks, k: int = 10,
                id_col: str = "vec_id",
                vec_col: str = "embedding") -> DataFrame:
    """Top-k by asymmetric distance computation: encode each row (pure
    projection), sum the m LUT entries its codes select (fixed order,
    literal tables), TakeOrdered by (adc asc, id asc). ``exact_sq``
    re-scores ONLY the k winners with the true squared distance (the
    same fixed-order 64-term expression) so the caller can see the
    quantization error. Zero shuffle: projection + TakeOrdered."""
    cb = _check_codebooks(codebooks)
    m = cb.shape[0]
    luts = pq_luts(query, codebooks)
    coded = pq_encode(embs, cb, id_col=id_col, vec_col=vec_col)
    vecs = embs.where(F.col(vec_col).isNotNull()).select(
        F.col(id_col), F.col(vec_col))
    adc = None
    for i in range(m):
        lut = F.array(*[F.lit(x) for x in luts[i]])
        part = F.element_at(lut, F.col(f"code_{i}") + 1)
        adc = part if adc is None else adc + part
    top = (coded.withColumn("adc", adc)
           .select(id_col, "pq_code", "adc")
           .orderBy(F.asc("adc"), F.col(id_col))
           .limit(k))
    q = [float(x) for x in query]
    exact = None
    for j, qj in enumerate(q):
        e = _as_double_elem(vec_col, j + 1)
        term = (e - F.lit(qj)) * (e - F.lit(qj))
        exact = term if exact is None else exact + term
    rescored = (top.join(vecs, id_col)
                .select(id_col, "pq_code", "adc",
                        exact.alias("exact_sq")))
    return rescored.orderBy(F.asc("adc"), F.col(id_col))


def pq_train(embs: DataFrame, dim: int, m: int = 8, ksub: int = 16,
             n_iter: int = 8, id_col: str = "vec_id",
             vec_col: str = "embedding",
             seed_salt: int = 0) -> np.ndarray:
    """Deterministic distributed per-subspace Lloyd k-means → (m, ksub,
    dsub) float64 codebooks. Assignment reuses the EXACT native encode
    expressions (training is the operator — no separate kernel to
    drift); the update is a decimal(27,15) component sum grouped by
    the subspace code (order-independent exact arithmetic, the
    kmeans_train determinism contract), so the result is bit-identical
    across partitionings. Seeding = first ksub rows by
    (xxhash64(id, salt), id); duplicate seed subvectors leave their
    codeword unused (argmin first-match) — harmless. Empty codewords
    keep their previous value. Only (m·ksub·dsub) numbers ever reach
    the driver per iteration."""
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m {m}")
    dsub = dim // m
    v = embs.where(F.col(vec_col).isNotNull())
    seed_rows = (v.select(id_col, vec_col)
                 .orderBy(F.xxhash64(F.col(id_col), F.lit(seed_salt)),
                          F.col(id_col))
                 .limit(ksub).collect())
    if len(seed_rows) < ksub:
        raise ValueError(f"pq_train: corpus has {len(seed_rows)} "
                         f"non-null vectors, need at least {ksub}")
    seeds = np.array([list(r[1]) for r in seed_rows], dtype=np.float64)
    cb = np.stack([seeds[:, i * dsub:(i + 1) * dsub] for i in range(m)])
    for _ in range(n_iter):
        # persist: the m per-subspace update jobs below would otherwise
        # each re-run the full m·ksub·dsub-term encode projection (and
        # re-pay its driver-side expression analysis) — found in review
        coded = (v.select(F.col(vec_col), *pq_code_cols(cb, vec_col))
                 .persist())
        new = cb.copy()
        for i in range(m):
            comps = [
                F.sum(_as_double_elem(vec_col, i * dsub + j + 1)
                      .cast("decimal(27,15)")).alias(f"s{j}")
                for j in range(dsub)]
            rows = (coded.groupBy(f"code_{i}")
                    .agg(F.count(F.lit(1)).alias("n"), *comps)
                    .collect())
            for r in rows:
                kk = r[f"code_{i}"]
                for j in range(dsub):
                    new[i, kk, j] = float(r[f"s{j}"] / r["n"])
        coded.unpersist()
        cb = new
    return cb
