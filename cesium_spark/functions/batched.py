"""Cross-window BATCHED evaluation of the cheap feature families.

The exact kernel path (operators/rollup.py) slices one conversation-day
into per-window segments; at the 1m tier those windows hold 1-3 turns
each, so the per-window Python dispatch in ``compute_features`` (~0.7 ms
for 21 features) dominates the whole rollup stage. This module evaluates
the GENERAL/CADENCE scalar features for MANY windows at once: windows
are bucketed by length L, gathered into C-contiguous (W, L) matrices,
and reduced along axis=1.

**Bit-for-bit contract (SURVEY.md §4.3):** numpy applies the identical
reduction algorithm (including pairwise summation blocking) to each
contiguous row of an axis-1 reduction as it does to a standalone 1-D
array — verified for mean/sum/std/median/percentile across lengths
1..1000, including the >128 pairwise regime — so every batched value is
REQUIRED to be bit-identical to the per-window ``compute_features``
result, and tests/test_batched_bitwise.py sweeps lengths and degenerate
shapes to pin exactly that. Features whose per-row computation is ragged
(nan-filtered slopes with all-nan rows, double_to_single_step with
non-finite ratios) or iterative-per-series (Lomb-Scargle, QSO, nhist,
custom) fall back to the scalar path per window — correctness never
depends on a feature being batchable.

Pure numpy (no Spark import) — ships via --py-files untouched.
"""

from __future__ import annotations

import warnings

import numpy as np

from cesium_spark.functions import features as feat
from cesium_spark.functions.registry import compute_features

# features this module can evaluate matrix-wise; everything else routes
# through compute_features per window
_GENERAL_BATCH = [
    "mean", "maximum", "minimum", "median", "amplitude", "std", "skew",
    "weighted_average", "median_absolute_deviation", "max_slope",
    "percent_amplitude", "percent_beyond_1_std", "percent_close_to_median",
    "percent_difference_flux_percentile",
]
_FLUX_BATCH = [f"flux_percentile_ratio_mid{x}" for x in (20, 35, 50, 65, 80)]
_STETSON_BATCH = ["stetson_j", "stetson_k"]
_CADENCE_BATCH = (["n_epochs", "total_time", "avgt",
                   "cads_avg", "cads_med", "cads_std",
                   "avg_err", "med_err", "std_err"]
                  + [f"cad_probs_{n}" for n in feat.CAD_PROB_THRESHOLDS])

# cache-blocking chunk size (elements per matrix): 3 input matrices +
# temporaries at 16k elements ≈ ~0.5-1 MB — inside per-core L2, so the
# ~40 feature passes run on-chip instead of re-streaming DRAM
_CHUNK_ELEMS = 16384
BATCHABLE = set(_GENERAL_BATCH + _FLUX_BATCH + _STETSON_BATCH
                + _CADENCE_BATCH)


def _stetson_mu_sigma(M: np.ndarray):
    """Vectorized Stetson robust mean: replays feat.stetson_mean's
    fixed-point iteration per row, INCLUDING its per-row early break
    (converged rows freeze while others keep iterating)."""
    W, L = M.shape
    med = np.median(M, axis=1)
    sigma = np.std(M, axis=1)
    mu = med.copy()
    if L == 1:
        return M[:, 0].astype(np.float64), sigma
    active = sigma != 0.0
    alpha, beta, tol, nmax = 2.0, 2.0, 1e-6, 20
    for _ in range(nmax):
        if not active.any():
            break
        idx = np.flatnonzero(active)
        Mi = M[idx]
        mui = mu[idx]
        si = sigma[idx]
        delta = (Mi - mui[:, None]) / si[:, None]
        w = 1.0 / (1.0 + (np.abs(delta) / alpha) ** beta)
        mu_new = np.sum(w * Mi, axis=1) / np.sum(w, axis=1)
        conv = np.abs(mu_new - mui) < tol * si
        mu[idx] = mu_new
        active[idx] = ~conv
    return mu, sigma


def _batch_one_length(T: np.ndarray, M: np.ndarray, E: np.ndarray,
                      wanted: list[str], out: np.ndarray,
                      rows: np.ndarray, col: dict[str, int]) -> None:
    """Evaluate the batchable features for one (W, L) length bucket,
    writing into out[rows, col[f]]. Mirrors registry._general_simple /
    feat.* formulas op-for-op (see module docstring contract)."""
    W, L = M.shape
    nan = np.nan

    def put(name, vec):
        if name in col:
            out[rows, col[name]] = vec

    need = set(wanted)

    if need & set(_GENERAL_BATCH):
        mx = np.max(M, axis=1)
        mn = np.min(M, axis=1)
        med = np.median(M, axis=1)
        mu = np.mean(M, axis=1)
        s = np.std(M, axis=1)
        w = 1.0 / (E * E)
        wa = np.sum(M * w, axis=1) / np.sum(w, axis=1)
        put("mean", mu)
        put("maximum", mx)
        put("minimum", mn)
        put("median", med)
        put("amplitude", (mx - mn) / 2.0)
        put("std", s)
        put("weighted_average", wa)
        if "skew" in need:
            d = M - mu[:, None]
            m2 = np.mean(d * d, axis=1)
            # python-float pow per WINDOW (not per point): the scalar
            # oracle computes `m2 ** 1.5` via CPython pow, and numpy's
            # vectorized pow rounds differently by 1 ulp on some inputs
            denom = np.array([v ** 1.5 for v in m2.tolist()])
            with np.errstate(divide="ignore", invalid="ignore"):
                sk = np.mean(d * d * d, axis=1) / denom
            put("skew", np.where(m2 != 0.0, sk, nan))
        if "median_absolute_deviation" in need:
            put("median_absolute_deviation",
                np.median(np.abs(M - med[:, None]), axis=1))
        if "max_slope" in need:
            if L < 2:
                put("max_slope", np.full(W, nan))
            else:
                with np.errstate(divide="ignore", invalid="ignore"):
                    slopes = np.abs(np.diff(M, axis=1) / np.diff(T, axis=1))
                # nanmax == max over the nan-filtered slopes; all-nan
                # rows -> nan (same as the scalar empty-filter path)
                with warnings.catch_warnings():
                    warnings.simplefilter("ignore", RuntimeWarning)
                    put("max_slope", np.nanmax(slopes, axis=1))
        if "percent_amplitude" in need:
            with np.errstate(divide="ignore", invalid="ignore"):
                pa = (np.maximum(np.abs(mx - med), np.abs(mn - med))
                      / np.abs(med))
            put("percent_amplitude", np.where(med != 0.0, pa, nan))
        if "percent_beyond_1_std" in need:
            put("percent_beyond_1_std",
                np.mean(np.abs(M - wa[:, None]) > s[:, None], axis=1))
        if "percent_close_to_median" in need:
            width = (mx - mn) * 0.1
            put("percent_close_to_median",
                np.mean(np.abs(M - med[:, None]) < width[:, None], axis=1))
        if "percent_difference_flux_percentile" in need:
            p = np.percentile(M, [5.0, 95.0], axis=1)
            with np.errstate(divide="ignore", invalid="ignore"):
                v = (p[1] - p[0]) / np.abs(med)
            put("percent_difference_flux_percentile",
                np.where(med != 0.0, v, nan))

    if need & set(_FLUX_BATCH):
        names = [20, 35, 50, 65, 80]
        qs: list[float] = []
        for x in names:
            qs.extend([50.0 - x / 2.0, 50.0 + x / 2.0])
        qs.extend([5.0, 95.0])
        p = np.percentile(M, qs, axis=1)          # (12, W)
        denom = p[-1] - p[-2]
        with np.errstate(divide="ignore", invalid="ignore"):
            for i, x in enumerate(names):
                v = (p[2 * i + 1] - p[2 * i]) / denom
                put(f"flux_percentile_ratio_mid{x}",
                    np.where(denom != 0.0, v, nan))

    if need & set(_STETSON_BATCH):
        if L < 2:
            put("stetson_j", np.full(W, nan))
            put("stetson_k", np.full(W, nan))
        else:
            mu_st, sigma = _stetson_mu_sigma(M)
            d = np.zeros_like(M)
            nz = sigma != 0.0
            if nz.any():
                d[nz] = (np.sqrt(L / (L - 1.0))
                         * (M[nz] - mu_st[nz, None]) / sigma[nz, None])
            p = d[:, :-1] * d[:, 1:]
            put("stetson_j",
                np.mean(np.sign(p) * np.sqrt(np.abs(p)), axis=1))
            denom = np.sqrt(np.mean(d * d, axis=1))
            with np.errstate(divide="ignore", invalid="ignore"):
                k = np.mean(np.abs(d), axis=1) / denom
            put("stetson_k", np.where(denom != 0.0, k, nan))

    if need & set(_CADENCE_BATCH):
        put("n_epochs", np.full(W, float(L)))
        put("total_time", T[:, -1] - T[:, 0])
        put("avgt", np.mean(T, axis=1))
        put("avg_err", np.mean(E, axis=1))
        put("med_err", np.median(E, axis=1))
        put("std_err", np.std(E, axis=1))
        if L < 2:
            for f in ("cads_avg", "cads_med", "cads_std"):
                put(f, np.full(W, nan))
            for thr in feat.CAD_PROB_THRESHOLDS:
                put(f"cad_probs_{thr}", np.full(W, nan))
        else:
            C = np.diff(T, axis=1)
            put("cads_avg", np.mean(C, axis=1))
            put("cads_med", np.median(C, axis=1))
            put("cads_std", np.std(C, axis=1))
            n = float(C.shape[1])
            for thr in feat.CAD_PROB_THRESHOLDS:
                nm = f"cad_probs_{thr}"
                if nm in col:
                    # count/n == the scalar searchsorted formulation
                    # (documented bit-identical in feat.cad_probs)
                    counts = np.sum(C <= thr, axis=1).astype(np.float64)
                    out[rows, col[nm]] = counts / n


def compute_features_matrix(t: np.ndarray, y: np.ndarray, e: np.ndarray,
                            starts: np.ndarray, ends: np.ndarray,
                            feats: list[str],
                            metas: list[dict] | None = None,
                            custom: dict | None = None) -> np.ndarray:
    """(n_windows, n_feats) float64 feature matrix for the window slices
    [starts[i], ends[i]) of the time-sorted arrays — bit-identical to
    calling ``compute_features`` per window, evaluated batch-wise where
    possible and per-window otherwise. Window slices may belong to MANY
    different (conv, channel) groups: features are per-window functions,
    so cross-group length-bucketing is free. ``metas``: one per-window
    meta dict (or None), consumed by graph-dep custom features in the
    fallback path."""
    n_win = starts.size
    n_feats = len(feats)
    out = np.empty((n_win, n_feats), dtype=np.float64)
    col = {f: i for i, f in enumerate(feats)}
    batch_wanted = [f for f in feats if f in BATCHABLE]
    rest = [f for f in feats if f not in BATCHABLE]

    if batch_wanted:
        lens = ends - starts
        for L in np.unique(lens):
            rows = np.flatnonzero(lens == L)
            # cache-block the bucket: the families make ~40 elementwise/
            # reduction passes over the (W, L) matrices, and full-bucket
            # matrices stream from DRAM on every pass — measured 2-4x
            # per-task slowdown under multi-core contention on this
            # memory system. Chunking rows so one chunk's matrices fit
            # in-cache keeps those passes on-chip (per-ROW reductions
            # are untouched by row chunking, so values are identical).
            step = max(1, _CHUNK_ELEMS // int(L))
            for lo in range(0, rows.size, step):
                sub = rows[lo:lo + step]
                gather = starts[sub][:, None] + np.arange(L)[None, :]
                _batch_one_length(t[gather], y[gather], e[gather],
                                  batch_wanted, out, sub, col)
    if rest:
        rcols = np.array([col[f] for f in rest])
        for i in range(n_win):
            vals = compute_features(t[starts[i]:ends[i]],
                                    y[starts[i]:ends[i]],
                                    e[starts[i]:ends[i]],
                                    rest,
                                    meta=metas[i] if metas else None,
                                    custom=custom)
            out[i, rcols] = [vals[f] for f in rest]
    return out
