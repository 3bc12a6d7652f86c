"""Numpy feature kernels: GENERAL and CADENCE families.

Semantics follow the reference's published formulas
(cesium/features/common_functions.py and cadence_features.py — SURVEY.md
§2.4/§2.5; reference mount empty at survey time, so these numpy
implementations are the binding oracle, per SURVEY.md §0/§5.3).

Conventions pinned here (and therefore everywhere):

- inputs ``t`` (times, seconds, float64, non-decreasing), ``m``
  (measurements, float64), ``e`` (errors, float64, default 1e-4 ==
  cesium ``DEFAULT_ERROR_VALUE``);
- population moments (``ddof=0``), biased Fisher-Pearson skew g1
  (== scipy.stats.skew(bias=True) == np.-only formula below);
- numpy linear-interpolation percentiles;
- degenerate inputs return ``nan`` rather than raising (cesium
  ``featurize_single_ts(raise_exceptions=False)`` behavior);
- the engine uses SECONDS for ``t`` throughout (cesium's astronomy
  day/minute units do not apply to transcripts; divergence documented
  in SURVEY.md §2.5).

Every function is a deterministic reduction of already-sorted arrays:
one call per (conv_id, channel, window) group, independent of Spark
partitioning — this is what makes the rolled-up points bit-for-bit
reproducible at any parallelism (SURVEY.md §4.3).
"""

from __future__ import annotations

import numpy as np

DEFAULT_ERROR_VALUE = 1e-4  # cesium/time_series.py::DEFAULT_ERROR_VALUE

# thresholds (seconds) for cad_probs_N features, mirroring cesium's
# cad_probs ladder (cesium/features/cadence_features.py::cad_prob †,
# re-unitized from minutes to seconds for transcript pacing)
CAD_PROB_THRESHOLDS = (
    1, 10, 20, 30, 40, 50, 100, 500, 1000, 5000,
    10000, 50000, 100000, 500000, 1000000, 5000000, 10000000,
)

# pairwise Δt histogram: bins and the hard cap on n (O(n²) pairs).
# The cap is DOCUMENTED AND DETERMINISTIC (every k-th point of the
# sorted series), never silent: kernels report `nhist_capped` via the
# registry when it fires (SURVEY.md §4.4).
NHIST_BINS = 50
NHIST_MAX_N = 2000


# ---------------------------------------------------------------------------
# GENERAL family (cesium/features/common_functions.py †)
# ---------------------------------------------------------------------------

def mean(m: np.ndarray) -> float:
    return float(np.mean(m)) if m.size else float("nan")


def maximum(m: np.ndarray) -> float:
    return float(np.max(m)) if m.size else float("nan")


def minimum(m: np.ndarray) -> float:
    return float(np.min(m)) if m.size else float("nan")


def median(m: np.ndarray) -> float:
    return float(np.median(m)) if m.size else float("nan")


def amplitude(m: np.ndarray) -> float:
    """(max - min) / 2  — cesium::amplitude †."""
    if not m.size:
        return float("nan")
    return float((np.max(m) - np.min(m)) / 2.0)


def std(m: np.ndarray) -> float:
    """Population std (ddof=0) — np.std default, cesium convention."""
    return float(np.std(m)) if m.size else float("nan")


def skew(m: np.ndarray) -> float:
    """Biased Fisher-Pearson g1 == scipy.stats.skew(m, bias=True).

    nan for n < 1 or zero variance (0/0), matching scipy's nan-with-
    warning behavior on constant input.
    """
    n = m.size
    if n < 1:
        return float("nan")
    mu = np.mean(m)
    d = m - mu
    m2 = np.mean(d * d)
    if m2 == 0.0:
        return float("nan")
    m3 = np.mean(d * d * d)
    return float(m3 / m2 ** 1.5)


def weighted_average(m: np.ndarray, e: np.ndarray) -> float:
    """Inverse-variance weighted mean: np.average(m, weights=1/e²)."""
    if not m.size:
        return float("nan")
    w = 1.0 / (e * e)
    return float(np.sum(m * w) / np.sum(w))


def median_absolute_deviation(m: np.ndarray) -> float:
    if not m.size:
        return float("nan")
    return float(np.median(np.abs(m - np.median(m))))


def max_slope(t: np.ndarray, m: np.ndarray) -> float:
    """max |Δm/Δt| over consecutive points — cesium::max_slope †.

    nan when fewer than 2 points; inf possible on repeated timestamps
    (kept: matches numpy division semantics the reference inherits).
    """
    if t.size < 2:
        return float("nan")
    dt = np.diff(t)
    dm = np.diff(m)
    with np.errstate(divide="ignore", invalid="ignore"):
        slopes = np.abs(dm / dt)
    slopes = slopes[~np.isnan(slopes)]
    return float(np.max(slopes)) if slopes.size else float("nan")


def percent_amplitude(m: np.ndarray) -> float:
    """max(|max-median|, |min-median|) / median — cesium::percent_amplitude †."""
    if not m.size:
        return float("nan")
    med = np.median(m)
    if med == 0.0:
        return float("nan")
    return float(max(abs(np.max(m) - med), abs(np.min(m) - med)) / abs(med))


def percent_beyond_1_std(m: np.ndarray, e: np.ndarray) -> float:
    """Fraction of points more than one (population) std from the
    inverse-variance weighted mean — cesium::percent_beyond_1_std †.
    Named explicitly in BASELINE.json north_star.
    """
    if not m.size:
        return float("nan")
    wa = weighted_average(m, e)
    s = np.std(m)
    return float(np.mean(np.abs(m - wa) > s))


def percent_close_to_median(m: np.ndarray, window_frac: float = 0.1) -> float:
    """Fraction within window_frac·(max-min) of the median."""
    if not m.size:
        return float("nan")
    width = (np.max(m) - np.min(m)) * window_frac
    return float(np.mean(np.abs(m - np.median(m)) < width))


def percent_difference_flux_percentile(m: np.ndarray) -> float:
    """(P95 - P5) / median, numpy linear-interp percentiles."""
    if not m.size:
        return float("nan")
    med = np.median(m)
    if med == 0.0:
        return float("nan")
    p5, p95 = np.percentile(m, [5.0, 95.0])
    return float((p95 - p5) / abs(med))


def flux_percentile_ratios(m: np.ndarray) -> dict[str, float]:
    """flux_percentile_ratio_midX = (P(50+X/2) - P(50-X/2)) / (P95 - P5)
    for X in {20, 35, 50, 65, 80} — one sort, five features.
    """
    names = [20, 35, 50, 65, 80]
    if not m.size:
        return {f"flux_percentile_ratio_mid{x}": float("nan") for x in names}
    qs: list[float] = []
    for x in names:
        qs.extend([50.0 - x / 2.0, 50.0 + x / 2.0])
    qs.extend([5.0, 95.0])
    p = np.percentile(m, qs)
    denom = p[-1] - p[-2]
    out = {}
    for i, x in enumerate(names):
        lo, hi = p[2 * i], p[2 * i + 1]
        out[f"flux_percentile_ratio_mid{x}"] = (
            float((hi - lo) / denom) if denom != 0.0 else float("nan")
        )
    return out


# --- Stetson variability indices (Stetson 1996, PASP 108; cesium
# common_functions.py::stetson_j/stetson_k/stetson_mean †) -----------------

def stetson_mean(
    m: np.ndarray,
    alpha: float = 2.0,
    beta: float = 2.0,
    tol: float = 1e-6,
    nmax: int = 20,
) -> float:
    """Iteratively reweighted (robust) mean, Stetson 1996 eq. 18-ish:
    w_i = 1 / (1 + (|δ_i| / alpha)^beta) with δ_i the normalized
    residual under the current mean and population σ. Deterministic
    fixed-point iteration from the median.
    """
    n = m.size
    if n == 0:
        return float("nan")
    if n == 1:
        return float(m[0])
    mu = float(np.median(m))
    sigma = float(np.std(m))
    if sigma == 0.0:
        return mu
    for _ in range(nmax):
        delta = (m - mu) / sigma
        w = 1.0 / (1.0 + (np.abs(delta) / alpha) ** beta)
        mu_new = float(np.sum(w * m) / np.sum(w))
        if abs(mu_new - mu) < tol * sigma:
            mu = mu_new
            break
        mu = mu_new
    return mu


def _stetson_delta(m: np.ndarray) -> np.ndarray:
    n = m.size
    mu = stetson_mean(m)
    sigma = np.std(m)
    if sigma == 0.0:
        return np.zeros(n)
    return np.sqrt(n / (n - 1.0)) * (m - mu) / sigma


def stetson_j(m: np.ndarray) -> float:
    """J = mean(sign(P_i)·sqrt(|P_i|)), P_i = δ_i·δ_{i+1} over
    consecutive pairs of normalized residuals."""
    if m.size < 2:
        return float("nan")
    d = _stetson_delta(m)
    p = d[:-1] * d[1:]
    return float(np.mean(np.sign(p) * np.sqrt(np.abs(p))))


def stetson_k(m: np.ndarray) -> float:
    """K = (1/n)·Σ|δ| / sqrt((1/n)·Σδ²) — kurtosis-like shape index."""
    if m.size < 2:
        return float("nan")
    d = _stetson_delta(m)
    denom = np.sqrt(np.mean(d * d))
    if denom == 0.0:
        return float("nan")
    return float(np.mean(np.abs(d)) / denom)


# ---------------------------------------------------------------------------
# CADENCE family (cesium/features/cadence_features.py †) — functions of t, e
# ---------------------------------------------------------------------------

def n_epochs(t: np.ndarray) -> float:
    return float(t.size)


def total_time(t: np.ndarray) -> float:
    return float(t[-1] - t[0]) if t.size else float("nan")


def avgt(t: np.ndarray) -> float:
    return float(np.mean(t)) if t.size else float("nan")


def cads(t: np.ndarray) -> np.ndarray:
    """np.diff(t) — the shared intermediate feeding ~23 features."""
    return np.diff(t)


def cads_stats(c: np.ndarray) -> dict[str, float]:
    if not c.size:
        nan = float("nan")
        return {"cads_avg": nan, "cads_med": nan, "cads_std": nan}
    return {
        "cads_avg": float(np.mean(c)),
        "cads_med": float(np.median(c)),
        "cads_std": float(np.std(c)),
    }


def error_stats(e: np.ndarray) -> dict[str, float]:
    if not e.size:
        nan = float("nan")
        return {"avg_err": nan, "med_err": nan, "std_err": nan}
    return {
        "avg_err": float(np.mean(e)),
        "med_err": float(np.median(e)),
        "std_err": float(np.std(e)),
    }


def cad_probs(c: np.ndarray) -> dict[str, float]:
    """cad_probs_N = P(Δt ≤ N seconds) for the threshold ladder.

    One sort + vectorized searchsorted over all 17 thresholds;
    count/n is bit-identical to np.mean(c <= thr) (boolean sums are
    exact integers below 2^53)."""
    if not c.size:
        return {f"cad_probs_{thr}": float("nan")
                for thr in CAD_PROB_THRESHOLDS}
    sc = np.sort(c)
    thrs = np.asarray(CAD_PROB_THRESHOLDS, dtype=np.float64)
    counts = np.searchsorted(sc, thrs, side="right")
    n = float(c.size)
    return {f"cad_probs_{thr}": float(counts[i]) / n
            for i, thr in enumerate(CAD_PROB_THRESHOLDS)}


def double_to_single_step(t: np.ndarray) -> dict[str, float]:
    """Ratio of double-step to single-step lags:
    r_i = (t[i+2] - t[i]) / (t[i+2] - t[i+1]);  med/avg/std of r.

    Exact form flagged for re-verification against the reference
    (SURVEY.md §2.5); this definition is the pinned oracle.
    """
    nan = float("nan")
    if t.size < 3:
        return {
            "med_double_to_single_step": nan,
            "avg_double_to_single_step": nan,
            "std_double_to_single_step": nan,
        }
    num = t[2:] - t[:-2]
    den = t[2:] - t[1:-1]
    with np.errstate(divide="ignore", invalid="ignore"):
        r = num / den
    r = r[np.isfinite(r)]
    if not r.size:
        return {
            "med_double_to_single_step": nan,
            "avg_double_to_single_step": nan,
            "std_double_to_single_step": nan,
        }
    return {
        "med_double_to_single_step": float(np.median(r)),
        "avg_double_to_single_step": float(np.mean(r)),
        "std_double_to_single_step": float(np.std(r)),
    }


def delta_t_hist(t: np.ndarray) -> tuple[np.ndarray, bool]:
    """Histogram (NHIST_BINS bins) of all pairwise Δt = t_j - t_i (i<j),
    density-normalized (cesium ::delta_t_hist + ::normalize_hist †).

    O(n²) pairs: above NHIST_MAX_N points the series is deterministically
    thinned to every k-th point (documented cap, SURVEY.md §4.4). Returns
    (normalized_hist, capped_flag).
    """
    n = t.size
    capped = False
    tt = t
    if n > NHIST_MAX_N:
        step = int(np.ceil(n / NHIST_MAX_N))
        tt = t[::step]
        capped = True
    nn = tt.size
    if nn < 2:
        return np.zeros(NHIST_BINS), capped
    # vectorized pairwise diffs of a sorted array
    diffs = (tt[None, :] - tt[:, None])[np.triu_indices(nn, k=1)]
    hist, edges = np.histogram(diffs, bins=NHIST_BINS)
    width = edges[1] - edges[0]
    total = hist.sum()
    if total == 0 or width == 0.0:
        return np.zeros(NHIST_BINS), capped
    return hist / (total * width), capped


def find_sorted_peaks(h: np.ndarray) -> list[tuple[int, float]]:
    """Local maxima of h as (bin_index, value), sorted by value desc then
    bin asc — cesium ::find_sorted_peaks †. Plateaus report their first bin;
    array endpoints count as peaks when they exceed their single neighbor.
    """
    peaks: list[tuple[int, float]] = []
    n = h.size
    i = 0
    while i < n:
        j = i
        while j + 1 < n and h[j + 1] == h[i]:
            j += 1  # plateau [i, j]
        left_ok = i == 0 or h[i - 1] < h[i]
        right_ok = j == n - 1 or h[j + 1] < h[i]
        if left_ok and right_ok and h[i] > 0:
            peaks.append((i, float(h[i])))
        i = j + 1
    peaks.sort(key=lambda p: (-p[1], p[0]))
    return peaks


def all_times_nhist_features(
        t: np.ndarray,
        hist_capped: tuple[np.ndarray, bool] | None = None) -> dict[str, float]:
    """The 12 all_times_nhist_* features from one pairwise-Δt histogram.
    ``hist_capped`` lets the registry inject the shared ``delta_t_hist``
    intermediate (one evaluation per group, reused by graph-dep custom
    features); omitted, it is computed here — identically."""
    h, _capped = hist_capped if hist_capped is not None else delta_t_hist(t)
    peaks = find_sorted_peaks(h)
    nan = float("nan")
    out: dict[str, float] = {
        "all_times_nhist_numpeaks": float(len(peaks)),
        "all_times_nhist_peak_val": peaks[0][1] if peaks else nan,
    }
    for k in range(1, 5):
        out[f"all_times_nhist_peak{k}_bin"] = (
            float(peaks[k - 1][0]) if len(peaks) >= k else nan
        )
    for j in range(1, 5):
        for k in range(j + 1, 5):
            name = f"all_times_nhist_peak_{j}_to_{k}"
            if len(peaks) >= k and peaks[j - 1][1] != 0.0:
                out[name] = peaks[k - 1][1] / peaks[j - 1][1]
            else:
                out[name] = nan
    return out
