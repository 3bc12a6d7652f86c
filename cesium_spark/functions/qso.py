"""QSO damped-random-walk model-fit features.

Re-expresses the reference's QSO variability features
(``cesium/features/qso_model.py::qso_fit`` † — SURVEY.md §2.4, reference
mount empty at survey time) from the *published* model they implement:
Butler & Bloom 2011 (AJ 141:93, arXiv:1008.3143) score a series against
a damped-random-walk (Ornstein–Uhlenbeck) Gaussian process with
exponential covariance, and against a white-noise null, reporting the
reduced chi-squares of each. The two public feature names are

- ``qso_log_chi2_qsonu``        = ln(chi2_qso / nu)
- ``qso_log_chi2nuNULL_chi2nu`` = ln((chi2_null/nu) / (chi2_qso/nu))

Binding oracle spec (pinned here per SURVEY.md §0/§5.3, flagged for
re-verification if the reference mount is ever populated):

- model covariance  C = diag(e_i^2) + K,
  K_ij = amp2 * exp(-|t_i - t_j| / tau),
  with cesium-default hyperparameters ltau=3.0, lvar=-1.7 re-read in our
  seconds convention: tau = 10**ltau seconds, amp2 = 10**lvar * Var(m)
  (signal variance scaled to the series so the score is amplitude-free,
  matching the reference's magnitude-normalised usage);
- the constant mean is profiled out under each model:
  mu_C = (1' C^-1 m) / (1' C^-1 1),  chi2_qso = r' C^-1 r, r = m - mu_C;
  null: mu_w = sum(m/e^2)/sum(1/e^2), chi2_null = sum((m-mu_w)^2/e^2);
- nu = n - 1 degrees of freedom for both;
- degenerate inputs (n < 2, non-finite chi2, chi2 <= 0) -> nan, per the
  raise_exceptions=False convention of ``featurize_single_ts`` †.

Determinism: one dense Cholesky solve per group on time-sorted arrays —
bit-identical at any Spark parallelism (SURVEY.md §4.3). Cost is O(n^3)
in the window length, so like the pairwise-Δt histogram it carries a
documented, deterministic cap (every k-th point of the sorted series —
never a random sample, never silent: the companion ``qso_capped``
feature — registered in the catalog alongside the two chi2 scores —
reports 1.0 when the cap fired).
"""

from __future__ import annotations

import numpy as np

QSO_LTAU = 3.0    # log10(tau/seconds); cesium default ltau=3.0 (days) †
QSO_LVAR = -1.7   # log10 signal-variance fraction; cesium default lvar=-1.7 †
QSO_MAX_N = 1500  # dense-solve cap; deterministic stride thinning above


def qso_fit(t: np.ndarray, m: np.ndarray, e: np.ndarray) -> dict[str, float]:
    """Fit DRW + null models; return the two qso features (+ cap flag)."""
    out = {
        "qso_log_chi2_qsonu": float("nan"),
        "qso_log_chi2nuNULL_chi2nu": float("nan"),
        "qso_capped": 0.0,
    }
    n = t.size
    if n < 2:
        return out
    if n > QSO_MAX_N:
        step = int(np.ceil(n / QSO_MAX_N))
        t, m, e = t[::step], m[::step], e[::step]
        n = t.size
        out["qso_capped"] = 1.0

    w = 1.0 / (e * e)
    mu_w = float(np.sum(m * w) / np.sum(w))
    chi2_null = float(np.sum((m - mu_w) ** 2 * w))

    var_m = float(np.var(m))  # ddof=0, consistent with the oracle's std
    tau = 10.0 ** QSO_LTAU
    amp2 = (10.0 ** QSO_LVAR) * var_m
    if not np.isfinite(amp2) or amp2 <= 0.0:
        return out

    dt = np.abs(t[:, None] - t[None, :])
    cov = amp2 * np.exp(-dt / tau)
    cov[np.diag_indices(n)] += e * e
    try:
        chol = np.linalg.cholesky(cov)
    except np.linalg.LinAlgError:
        return out
    ones = np.ones(n)
    # solve C x = [m, 1] via the one factorization
    sol = np.linalg.solve(chol.T, np.linalg.solve(
        chol, np.column_stack([m, ones])))
    cim, ci1 = sol[:, 0], sol[:, 1]
    denom = float(ones @ ci1)
    if denom == 0.0 or not np.isfinite(denom):
        return out
    mu_c = float(ones @ cim) / denom
    r = m - mu_c
    rr = np.linalg.solve(chol.T, np.linalg.solve(chol, r))
    chi2_qso = float(r @ rr)

    nu = n - 1
    if chi2_qso > 0.0 and np.isfinite(chi2_qso):
        out["qso_log_chi2_qsonu"] = float(np.log(chi2_qso / nu))
        if chi2_null > 0.0 and np.isfinite(chi2_null):
            out["qso_log_chi2nuNULL_chi2nu"] = float(
                np.log(chi2_null / chi2_qso))
    return out
