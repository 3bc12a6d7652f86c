"""Generalized multi-harmonic, multi-frequency Lomb–Scargle model.

Re-expresses the reference's ``cesium/features/lomb_scargle.py::
lomb_scargle_model(t, m, e, sys_err=0.05, nharm=8, nfreq=3,
tone_control=5.0)`` † and ``cesium/features/periodic_features.py`` †
(SURVEY.md §2.6). The reference mount was empty at survey time
(SURVEY.md §0), so this module is the binding oracle: pinned, documented
formulas validated by frequency-recovery tests on planted periodic
signals (tests/test_lomb_scargle.py), not by line-diff against cesium.

Algorithm (vectorized numpy, one call per (conv, channel, window) group):

1. weights w_i = 1/(e_i² + sys_err²); weighted linear detrend.
2. periodogram scan over a deterministic frequency grid
   (df = 1/(ofac·T), fmax = 0.5·n/T, grid capped at MAX_GRID) using the
   closed-form single-harmonic generalized LS (Zechmeister & Kürster
   2009 floating-mean GLS) — fully vectorized over the grid, two-stage:
   coarse stride-subsampled pass, then full-resolution refinement around
   the coarse peak (COARSE_STRIDE/REFINE_HALF/SCAN_MAX_N below).
3. at the peak frequency: ridge-regularized weighted least squares of
   ``nharm`` harmonics (regularization λ grows with harmonic order,
   controlled by ``tone_control`` — the reference's tone control idea).
4. subtract fitted model; repeat from 2 on residuals, ``nfreq`` times.

One model fit feeds all LS features — the single most important shared
intermediate (computed once per group by the registry).

Everything is deterministic: fixed grid, stable sorts, no RNG.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import numpy as np

SYS_ERR = 0.05
NHARM = 8
NFREQ = 3
TONE_CONTROL = 5.0
OFAC = 5.0          # oversampling factor for the frequency grid
N_AMP = 4           # amplitudes/phases exported per frequency

# Two-stage scan (pinned oracle spec; deterministic): stage 1 evaluates
# the floating-mean GLS power on the FULL natural grid (df = 1/(OFAC·T),
# fmax = 0.5·n/T — no range truncation) with the Press–Rybicki
# extirpolation+FFT method (Press & Rybicki 1989; the same algorithm
# behind the reference's cesium/features/lomb_scargle_fast.py †), which
# is O(n_grid·log n_grid) instead of O(n_grid·n). Stage 2 re-evaluates
# the power EXACTLY (direct trig GLS) in a ±REFINE_HALF-bin window
# around the stage-1 peak and takes the exact argmax — so the reported
# frequency/power are exact GLS values while the scan stays FFT-cheap.
# signif stats (mean/std of power) and the alias count are computed over
# the stage-1 spectrum (approximate by construction — see fit loop).
# Scan inputs above FAST_MAX_N points thin by a deterministic stride for
# the scan only (the harmonic fit and all residual/p2p math stay
# full-resolution), and the grid's fmax derives from the THINNED length
# (_freq_grid n_eff) — so both scan points and grid/FFT size are bounded
# for million-turn whale conversations (SURVEY.md §4.4: documented caps,
# never random, never silent).
REFINE_HALF = 8
FAST_MAX_N = 100_000
MACC = 4            # extirpolation points per datum (Press–Rybicki)


@dataclass
class LombScargleFit:
    """Result of one multi-frequency fit."""

    freqs: list[float] = field(default_factory=list)           # nfreq fitted frequencies
    amplitudes: list[np.ndarray] = field(default_factory=list)  # per freq: nharm amps
    rel_phases: list[np.ndarray] = field(default_factory=list)  # per freq: nharm rel phases
    signifs: list[float] = field(default_factory=list)          # per freq: peak z-score
    lambdas: list[float] = field(default_factory=list)          # per freq: ridge λ at h=1
    y_offset: float = float("nan")
    linear_trend: float = float("nan")
    varrat: float = float("nan")        # var(resid after freq1)/var(raw)
    n_alias: float = float("nan")
    model_freq1: np.ndarray | None = None   # freq1 model values at input times
    resid_freq1: np.ndarray | None = None   # residuals after freq1 model
    ok: bool = False


def _freq_grid(t: np.ndarray, n_eff: int | None = None) -> np.ndarray:
    """Natural scan grid: k·df for k=1..n_out, df=1/(OFAC·T), up to the
    mean-Nyquist fmax = 0.5·n_eff/T. NOT range-truncated below the
    Nyquist: long series get more grid points (O(n)), which is why the
    scan must be FFT-based. ``n_eff`` is the EFFECTIVE scan length (the
    thinned series' point count when FAST_MAX_N thinning fires): deriving
    fmax from the full n would (a) grow the FFT work arrays unboundedly
    (~0.27 GB per array at n=1e6, ×2 allocations ×NFREQ fits — OOM on
    exactly the whale groups thinning targets) and (b) push the grid past
    the thinned series' Nyquist, letting stage 1 and the refine window
    lock onto an alias the scan data cannot resolve."""
    T = t[-1] - t[0]
    n = n_eff if n_eff is not None else t.size
    if T <= 0 or n < 4:
        return np.empty(0)
    df = 1.0 / (OFAC * T)
    fmax = 0.5 * n / T
    n_grid = int(max(8, np.floor(fmax / df)))
    return df * np.arange(1, n_grid + 1)


def _extirpolate(x: np.ndarray, y: np.ndarray, ndim: int) -> np.ndarray:
    """Scatter values y at fractional grid positions x onto an ndim
    array using MACC-point Lagrange extirpolation (Press & Rybicki 1989
    §II; NR 'spread'). Vectorized with deterministic np.add.at."""
    out = np.zeros(ndim)
    ix = np.floor(x).astype(np.int64)
    exact = x == ix
    # exact hits: direct add
    if exact.any():
        np.add.at(out, ix[exact] % ndim, y[exact])
    rest = ~exact
    if rest.any():
        xr = x[rest]
        yr = y[rest]
        ilo = np.floor(xr - 0.5 * (MACC - 1)).astype(np.int64)
        # Lagrange weights over the MACC consecutive integers ilo..ilo+MACC-1
        offs = np.arange(MACC)
        grid_pts = ilo[:, None] + offs[None, :]          # (n, MACC)
        diffs = xr[:, None] - grid_pts                   # (n, MACC)
        prod_all = np.prod(diffs, axis=1)                # Π (x - x_k)
        # denominator: (-1)^(MACC-1-j) · j! · (MACC-1-j)!
        fac = np.array([
            ((-1.0) ** (MACC - 1 - j)) * float(math.factorial(j))
            * float(math.factorial(MACC - 1 - j)) for j in range(MACC)])
        with np.errstate(divide="ignore", invalid="ignore"):
            wts = prod_all[:, None] / (fac[None, :] * diffs)
        # where diffs==0 (x exactly on a grid point inside window): weight 1 there
        hit = diffs == 0.0
        if hit.any():
            wts = np.where(hit, 1.0, np.where(np.any(hit, axis=1)[:, None],
                                              0.0, wts))
        np.add.at(out, grid_pts.ravel() % ndim, (wts * yr[:, None]).ravel())
    return out


def _fast_dft_sums(t: np.ndarray, vals: list[np.ndarray], df: float,
                   n_out: int) -> list[np.ndarray]:
    """For each series v in vals, return complex array S_v[k] =
    Σ_j v_j · exp(i·2π·(k+1)·df·t_j) for k = 0..n_out-1, via
    extirpolation + one real FFT per series (Press–Rybicki).
    Frequencies up to 2·fmax are returned (2·n_out entries) so callers
    can read double-angle sums: returns arrays of length 2·n_out+1."""
    need = 2 * n_out + 1
    ndim = 64
    while ndim < MACC * need:
        ndim <<= 1
    fac = ndim * df  # grid cells per unit time
    x = np.mod(t * fac, ndim)
    outs = []
    for v in vals:
        work = _extirpolate(x, v, ndim)
        sp = np.fft.rfft(work)           # Σ v e^{-2πi k x / ndim}
        # e^{+iωt} at freq k·df corresponds to conj of rfft bin k
        outs.append(np.conj(sp[1:need + 1]))
    return outs


def _gls_power_fast(t: np.ndarray, y: np.ndarray, w: np.ndarray,
                    df: float, n_out: int) -> np.ndarray:
    """Floating-mean GLS power on the uniform grid k·df, k=1..n_out,
    computed from extirpolated FFTs — same quantities as _gls_power
    (C, S, YC, YS, CC, SS, CS) with the double-angle identities
    cos² = (1+cos2θ)/2, sin² = (1−cos2θ)/2, cos·sin = sin2θ/2."""
    wn = w / np.sum(w)
    Y = np.sum(wn * y)
    yc = y - Y
    YY = np.sum(wn * yc * yc)
    if YY <= 0 or n_out < 1:
        return np.zeros(max(n_out, 0))
    s_w, s_wy = _fast_dft_sums(t, [wn, wn * yc], df, n_out)
    k = np.arange(1, n_out + 1)
    C = s_w[:n_out].real
    S = s_w[:n_out].imag
    YC = s_wy[:n_out].real
    YS = s_wy[:n_out].imag
    C2 = s_w[2 * k - 1].real   # Σ wn cos(2ω_k t)
    S2 = s_w[2 * k - 1].imag
    CC = 0.5 * (1.0 + C2) - C * C
    SS = 0.5 * (1.0 - C2) - S * S
    CS = 0.5 * S2 - C * S
    D = CC * SS - CS * CS
    with np.errstate(divide="ignore", invalid="ignore"):
        power = (SS * YC * YC + CC * YS * YS - 2.0 * CS * YC * YS) / (YY * D)
    power = np.nan_to_num(power, nan=0.0, posinf=0.0, neginf=0.0)
    return np.clip(power, 0.0, 1.0)


def _gls_power(t: np.ndarray, y: np.ndarray, w: np.ndarray,
               freqs: np.ndarray) -> np.ndarray:
    """Floating-mean generalized LS power (Zechmeister & Kürster 2009),
    vectorized over the frequency grid. Returns normalized power in [0,1].
    """
    wn = w / np.sum(w)  # normalized weights, Σŵ = 1
    Y = np.sum(wn * y)
    yc = y - Y
    YY = np.sum(wn * yc * yc)
    if YY <= 0:
        return np.zeros(freqs.size)
    # (n_freq, n_pts) phase matrix — memory bounded: the exact path only
    # ever sees the ±REFINE_HALF-bin refine window (≤ 17 frequencies)
    omega_t = 2.0 * np.pi * freqs[:, None] * t[None, :]
    cos = np.cos(omega_t)
    sin = np.sin(omega_t)
    C = cos @ wn
    S = sin @ wn
    YC = cos @ (wn * yc)
    YS = sin @ (wn * yc)
    CC = (cos * cos) @ wn - C * C
    SS = (sin * sin) @ wn - S * S
    CS = (cos * sin) @ wn - C * S
    D = CC * SS - CS * CS
    with np.errstate(divide="ignore", invalid="ignore"):
        power = (SS * YC * YC + CC * YS * YS - 2.0 * CS * YC * YS) / (YY * D)
    power = np.nan_to_num(power, nan=0.0, posinf=0.0, neginf=0.0)
    return np.clip(power, 0.0, 1.0)


def _harmonic_fit(t: np.ndarray, y: np.ndarray, w: np.ndarray, freq: float,
                  nharm: int, tone_control: float):
    """Ridge-regularized weighted LSQ of offset + nharm harmonics at freq.

    λ_h = tone_control · 1e-3 · h²  (higher harmonics damped — the
    reference's tone-control role). Returns (amps, rel_phases, model,
    offset, lambda1).
    """
    cols = [np.ones_like(t)]
    for h in range(1, nharm + 1):
        ang = 2.0 * np.pi * freq * h * t
        cols.append(np.sin(ang))
        cols.append(np.cos(ang))
    X = np.stack(cols, axis=1)
    sw = np.sqrt(w)
    Xw = X * sw[:, None]
    yw = y * sw
    lam = np.zeros(X.shape[1])
    for h in range(1, nharm + 1):
        lam_h = tone_control * 1e-3 * h * h
        lam[2 * h - 1] = lam_h
        lam[2 * h] = lam_h
    A = Xw.T @ Xw + np.diag(lam)
    b = Xw.T @ yw
    try:
        beta = np.linalg.solve(A, b)
    except np.linalg.LinAlgError:
        beta = np.linalg.lstsq(A, b, rcond=None)[0]
    model = X @ beta
    a = beta[1::2]   # sin coefs
    bcos = beta[2::2]  # cos coefs
    amps = np.sqrt(a * a + bcos * bcos)
    phases = np.arctan2(bcos, a)
    # relative phases: φ_h − h·φ_1, wrapped to [−π, π)
    rel = phases - np.arange(1, nharm + 1) * phases[0]
    rel = np.mod(rel + np.pi, 2.0 * np.pi) - np.pi
    return amps, rel, model, float(beta[0]), float(lam[1])


def fit_lomb_scargle(t: np.ndarray, m: np.ndarray, e: np.ndarray,
                     nharm: int = NHARM, nfreq: int = NFREQ,
                     sys_err: float = SYS_ERR,
                     tone_control: float = TONE_CONTROL) -> LombScargleFit:
    """Full multi-frequency fit. Degenerate inputs (n<4, zero time span,
    constant y) → fit.ok False and nan features downstream (cesium
    NaN-on-degenerate policy, SURVEY.md §2.8)."""
    fit = LombScargleFit()
    n = t.size
    if n < 4:
        return fit
    t0 = t - t[0]
    w = 1.0 / (e * e + sys_err * sys_err)
    raw_var = float(np.var(m))
    if raw_var == 0.0 or t0[-1] <= 0.0:
        return fit

    # weighted linear trend of the raw data (exported as linear_trend)
    W = np.sum(w)
    tbar = np.sum(w * t0) / W
    ybar = np.sum(w * m) / W
    stt = np.sum(w * (t0 - tbar) ** 2)
    slope = float(np.sum(w * (t0 - tbar) * (m - ybar)) / stt) if stt > 0 else 0.0
    fit.linear_trend = slope

    # deterministic scan thinning for whale groups (scan only)
    if n > FAST_MAX_N:
        scan_step = int(np.ceil(n / FAST_MAX_N))
        t_scan, w_scan = t0[::scan_step], w[::scan_step]
    else:
        scan_step = 1
        t_scan, w_scan = t0, w

    # grid derives from the EFFECTIVE scan length (see _freq_grid):
    # bounds FFT memory AND keeps fmax at the thinned series' Nyquist
    grid = _freq_grid(t0, n_eff=t_scan.size)
    if not grid.size:
        return fit

    resid = m - ybar - slope * (t0 - tbar)  # detrended residuals
    df = float(grid[0])

    first_power = None
    for k in range(nfreq):
        r_scan = resid[::scan_step] if scan_step > 1 else resid
        power = _gls_power_fast(t_scan, r_scan, w_scan, df, grid.size)
        if k == 0:
            first_power = power
        pk_c = int(np.argmax(power))
        # exact GLS re-evaluation around the FFT-scan peak
        lo = max(0, pk_c - REFINE_HALF)
        hi = min(grid.size, pk_c + REFINE_HALF + 1)
        p_fine = _gls_power(t_scan, r_scan, w_scan, grid[lo:hi])
        pk = lo + int(np.argmax(p_fine))
        peak_power = float(p_fine[pk - lo])
        # signif z-scores the EXACT refined peak against mean/std of the
        # stage-1 (Press–Rybicki, ~2e-3 abs power error) spectrum — by
        # construction: the full-grid spectrum only exists in stage-1
        # form, and its mean/std are O(1) statistics over 10^5 bins where
        # the approximation error averages out. Pinned oracle semantics.
        p_mean = float(np.mean(power))
        p_std = float(np.std(power))
        signif = (peak_power - p_mean) / p_std if p_std > 0 else float("nan")
        freq = float(grid[pk])
        amps, rel, model, offset, lam1 = _harmonic_fit(
            t0, resid, w, freq, nharm, tone_control)
        fit.freqs.append(freq)
        fit.amplitudes.append(amps)
        fit.rel_phases.append(rel)
        fit.signifs.append(signif)
        fit.lambdas.append(lam1)
        if k == 0:
            fit.y_offset = offset + ybar
            fit.model_freq1 = model + ybar + slope * (t0 - tbar)
            fit.resid_freq1 = m - fit.model_freq1
            fit.varrat = float(np.var(fit.resid_freq1) / raw_var)
        resid = resid - model

    # alias count: periodogram peaks ≥ 50% of the main peak's power
    if first_power is not None and first_power.size >= 3:
        p = first_power
        thr = 0.5 * float(np.max(p))
        is_peak = (p[1:-1] > p[:-2]) & (p[1:-1] >= p[2:]) & (p[1:-1] >= thr)
        fit.n_alias = float(np.sum(is_peak))
    fit.ok = True
    return fit


# ---------------------------------------------------------------------------
# Feature extraction from one fit (the 49 LOMB_SCARGLE_FEATS)
# ---------------------------------------------------------------------------

def _phase_fold(t: np.ndarray, period: float) -> np.ndarray:
    return np.mod(t - t[0], period) / period


def ls_features(t: np.ndarray, m: np.ndarray, e: np.ndarray,
                fit: LombScargleFit | None = None) -> dict[str, float]:
    """All LS-family features from one shared fit (SURVEY.md §2.6).
    ``fit`` lets the registry inject the shared ``lomb_model``
    intermediate so graph-dep custom features and the built-in family
    consume ONE fit per group; omitted, the fit runs here — identically.
    """
    nan = float("nan")
    out: dict[str, float] = {}
    if fit is None:
        fit = fit_lomb_scargle(t, m, e)

    for i in range(1, NFREQ + 1):
        has = fit.ok and len(fit.freqs) >= i
        out[f"freq{i}_freq"] = fit.freqs[i - 1] if has else nan
        out[f"freq{i}_signif"] = fit.signifs[i - 1] if has else nan
        for h in range(1, N_AMP + 1):
            out[f"freq{i}_amplitude{h}"] = (
                float(fit.amplitudes[i - 1][h - 1]) if has else nan)
        for h in range(2, N_AMP + 1):
            out[f"freq{i}_rel_phase{h}"] = (
                float(fit.rel_phases[i - 1][h - 1]) if has else nan)
    out["freq1_lambda"] = fit.lambdas[0] if fit.ok else nan
    out["freq_y_offset"] = fit.y_offset
    out["linear_trend"] = fit.linear_trend
    out["freq_varrat"] = fit.varrat
    out["freq_n_alias"] = fit.n_alias

    def ratio(a: float, b: float) -> float:
        return a / b if (np.isfinite(a) and np.isfinite(b) and b != 0.0) else nan

    if fit.ok and len(fit.freqs) >= 3:
        out["freq_amplitude_ratio_21"] = ratio(
            float(fit.amplitudes[1][0]), float(fit.amplitudes[0][0]))
        out["freq_amplitude_ratio_31"] = ratio(
            float(fit.amplitudes[2][0]), float(fit.amplitudes[0][0]))
        out["freq_frequency_ratio_21"] = ratio(fit.freqs[1], fit.freqs[0])
        out["freq_frequency_ratio_31"] = ratio(fit.freqs[2], fit.freqs[0])
        out["freq_signif_ratio_21"] = ratio(fit.signifs[1], fit.signifs[0])
        out["freq_signif_ratio_31"] = ratio(fit.signifs[2], fit.signifs[0])
    else:
        for k in ("freq_amplitude_ratio_21", "freq_amplitude_ratio_31",
                  "freq_frequency_ratio_21", "freq_frequency_ratio_31",
                  "freq_signif_ratio_21", "freq_signif_ratio_31"):
            out[k] = nan

    # period_fast: period of the dominant GLS frequency (the fast single-
    # harmonic scan IS the grid scan above — cesium/features/
    # lomb_scargle_fast.py::lomb_scargle_fast_period †)
    out["period_fast"] = (1.0 / fit.freqs[0]) if (fit.ok and fit.freqs) else nan

    # --- folded-model / point-to-point diagnostics (periodic_features.py †).
    # Pinned definitions documented in SURVEY.md §2.6; oracle-binding.
    if not fit.ok or fit.model_freq1 is None:
        for k in ("freq_model_max_delta_mags", "freq_model_min_delta_mags",
                  "freq_model_phi1_phi2", "medperc90_2p_p",
                  "fold2P_slope_10percentile", "fold2P_slope_90percentile",
                  "p2p_scatter_2praw", "p2p_scatter_over_mad",
                  "p2p_scatter_pfold_over_mad", "p2p_ssqr_diff_over_var",
                  "scatter_res_raw"):
            out[k] = nan
        return out

    period = 1.0 / fit.freqs[0]
    t0 = t - t[0]
    mad_m = float(np.median(np.abs(m - np.median(m))))
    dm = np.diff(m)

    # model evaluated over one cycle of 2P on a fixed 1000-point grid
    gphase = np.linspace(0.0, 2.0 * period, 1000, endpoint=False)
    ang = 2.0 * np.pi * fit.freqs[0] * gphase
    model_g = np.zeros_like(gphase)
    for h in range(1, NHARM + 1):
        amp = float(fit.amplitudes[0][h - 1])
        ph = float(fit.rel_phases[0][h - 1]) if h > 1 else 0.0
        model_g += amp * np.sin(h * ang + ph)
    half = gphase < period
    d1 = float(np.max(model_g[half]) - np.min(model_g[half])) if half.any() else nan
    d2 = float(np.max(model_g[~half]) - np.min(model_g[~half])) if (~half).any() else nan
    out["freq_model_max_delta_mags"] = max(d1, d2)
    out["freq_model_min_delta_mags"] = min(d1, d2)
    i_min1 = int(np.argmin(model_g[half])) if half.any() else 0
    i_min2 = (int(np.argmin(model_g[~half])) + int(half.sum())) if (~half).any() else 0
    out["freq_model_phi1_phi2"] = float(
        abs(gphase[i_min2] - gphase[i_min1]) / (2.0 * period))

    # phase-sorted p2p scatters (stable argsort → deterministic)
    ph_p = _phase_fold(t0, period)
    ph_2p = _phase_fold(t0, 2.0 * period)
    order_p = np.argsort(ph_p, kind="stable")
    order_2p = np.argsort(ph_2p, kind="stable")
    m_p = m[order_p]
    m_2p = m[order_2p]
    d_p = np.abs(np.diff(m_p))
    d_2p = np.abs(np.diff(m_2p))

    out["p2p_scatter_over_mad"] = (
        float(np.median(np.abs(dm))) / mad_m if mad_m > 0 else nan)
    out["p2p_scatter_pfold_over_mad"] = (
        float(np.median(d_p)) / mad_m if mad_m > 0 else nan)
    ssq_raw = float(np.sum(dm * dm))
    out["p2p_scatter_2praw"] = (
        float(np.sum(np.diff(m_2p) ** 2)) / ssq_raw if ssq_raw > 0 else nan)
    var_m = float(np.var(m))
    out["p2p_ssqr_diff_over_var"] = (
        ssq_raw / ((m.size - 1) * var_m) if var_m > 0 and m.size > 1 else nan)
    resid = fit.resid_freq1
    mad_r = float(np.median(np.abs(resid - np.median(resid))))
    out["scatter_res_raw"] = mad_r / mad_m if mad_m > 0 else nan
    p90 = float(np.percentile(d_p, 90.0)) if d_p.size else nan
    out["medperc90_2p_p"] = (
        float(np.median(d_2p)) / p90 if (d_2p.size and p90 and p90 > 0) else nan)
    # slopes of the 2P-folded data
    phs = ph_2p[order_2p] * 2.0 * period
    dph = np.diff(phs)
    good = dph > 0
    if good.any():
        slopes = np.diff(m_2p)[good] / dph[good]
        out["fold2P_slope_10percentile"] = float(np.percentile(slopes, 10.0))
        out["fold2P_slope_90percentile"] = float(np.percentile(slopes, 90.0))
    else:
        out["fold2P_slope_10percentile"] = nan
        out["fold2P_slope_90percentile"] = nan
    return out
