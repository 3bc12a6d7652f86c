"""Dynamic-time-warping distance to a broadcast template (SURVEY.md
§2.9 series-diagnostics family — the classic elastic shape-match
primitive: "which conversations' latency curves look like THIS known
incident profile?", tempo-invariant where Euclidean distance is not).

Scale shape: the template is a tiny constant (closed over by the
kernel — effectively a broadcast literal); the corpus side is ONE hash
exchange on (conv_id, channel) into a vectorized ``applyInPandas``
kernel. Pairwise all-vs-all DTW is deliberately NOT offered — it is
O(n²) in the corpus and the right tool at 10^12 turns is
template/centroid matching (this operator) or SAX blocking
(downsample.sax_symbolize) feeding the dedup candidate machinery.

Kernel: the O(n·m) DP runs over ANTI-DIAGONALS — every cell of
diagonal k depends only on diagonals k−1/k−2, so each step is three
shifted-slice ``minimum`` ops over the whole diagonal (numpy,
no per-cell Python; the python-level loop is over the n+m−1 diagonals,
matching the EWMA/LTTB "sequential by definition" precedent).

Oracle story (LTTB/QSO precedent — DTW's recursion is not reasonably
SQL-expressible, so the driver gate pins INVARIANTS while pytest pins
exact values against an independent scalar DP):

* lower bound: DTW must pay the mandatory endpoint matches and cover
  the range extremes — ``lb = max(|x₀−t₀|, |xₙ−tₘ|, |max x − max t|,
  |min x − min t|)`` (the LB_Kim corner cases), every piece exactly
  restatable in SQL;
* upper bound: the cost of one explicit admissible path (diagonal
  then along the final row/column) — also exactly restatable;
* a planted template-equal series forces lb = ub = 0 there, so the
  invariant is TIGHT at the plant: dtw must be exactly 0.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DTW_SCHEMA = ("conv_id string, channel string, n long, dtw double, "
              "lb double, ub double, within_bounds boolean")


def _dtw_scalar_free(x: np.ndarray, t: np.ndarray) -> float:
    """Anti-diagonal vectorized DP. D[i,j] = |x_i − t_j| +
    min(D[i−1,j], D[i,j−1], D[i−1,j−1]), D over the raw n×m grid with
    the usual (0,0) anchor."""
    n, m = len(x), len(t)
    INF = np.inf

    def take(vals, lo, idx):
        # values of a previous diagonal (rows lo..lo+len−1) at rows
        # `idx`, INF outside
        out = np.full(idx.shape, INF)
        ok = (idx >= lo) & (idx < lo + len(vals))
        out[ok] = vals[idx[ok] - lo]
        return out

    prev1 = prev2 = None
    p1_lo = p2_lo = 0
    cur = None
    for k in range(n + m - 1):
        i_lo = max(0, k - (m - 1))
        i_hi = min(n - 1, k)
        i = np.arange(i_lo, i_hi + 1)
        j = k - i
        c = np.abs(x[i] - t[j])
        if k == 0:
            cur = c
        else:
            # out-of-grid predecessors (row −1, or a row outside the
            # previous diagonal's span — which is exactly the j−1 < 0
            # case) come back INF from take(), so border cells chain
            # along their own border and only (0,0) has no predecessor
            up = take(prev1, p1_lo, i - 1)      # D[i−1, j]
            left = take(prev1, p1_lo, i)        # D[i, j−1]
            diag = (np.full(i.shape, INF) if prev2 is None
                    else take(prev2, p2_lo, i - 1))  # D[i−1, j−1]
            cur = c + np.minimum(np.minimum(up, left), diag)
        prev2, p2_lo = prev1, p1_lo
        prev1, p1_lo = cur, i_lo
    # the final diagonal k = n+m−2 holds the single cell (n−1, m−1)
    return float(cur[0])


def _bounds(x: np.ndarray, t: np.ndarray) -> tuple[float, float]:
    """SQL-restatable LB_Kim-corner lower bound and explicit-path
    upper bound (diagonal, then along the last template value / last
    series value)."""
    m = len(t)
    n = len(x)
    lb = max(abs(x[0] - t[0]), abs(x[-1] - t[-1]),
             abs(x.max() - t.max()), abs(x.min() - t.min()))
    k = min(n, m)
    # ub terms are summed by a SEQUENTIAL left fold (cumsum scan, not
    # np.sum's pairwise tree): the SQL oracle's sum is fold-shaped, so
    # keeping the kernel's association the same shrinks the cross-
    # engine drift to the aggregate's row-order effects, which the
    # driver's coarse ub grid then absorbs (lb is order statistics —
    # exact as-is)
    terms = np.abs(x[:k] - t[:k])
    if n > m:
        terms = np.concatenate([terms, np.abs(x[m:] - t[m - 1])])
    elif m > n:
        terms = np.concatenate([terms, np.abs(x[-1] - t[n:])])
    ub = float(np.cumsum(terms)[-1]) if len(terms) else 0.0
    return float(lb), ub


def dtw_to_template(series: DataFrame, template: Sequence[float],
                    tol: float = 1e-9) -> DataFrame:
    """Per (conv_id, channel): DTW distance of the y-sequence (ordered
    by t, turn_idx) to ``template``, plus the SQL-restatable bounds
    and ``within_bounds`` = (0 ≤ dtw ≤ ub + tol) ∧ (dtw ≥ lb − tol).
    NULL t/y rows are dropped up front."""
    t = np.asarray(list(template), dtype=np.float64)
    if len(t) < 2:
        raise ValueError(f"template needs >= 2 points, got {len(t)}")
    if not np.isfinite(t).all():
        raise ValueError("template must be finite")

    def _kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["t", "turn_idx"], kind="stable")
        x = pdf["y"].to_numpy(dtype=np.float64)
        d = _dtw_scalar_free(x, t)
        lb, ub = _bounds(x, t)
        ok = (d >= -tol) and (d >= lb - tol) and (d <= ub + tol)
        return pd.DataFrame({
            "conv_id": [pdf["conv_id"].iloc[0]],
            "channel": [pdf["channel"].iloc[0]],
            "n": [len(x)], "dtw": [d], "lb": [lb], "ub": [ub],
            "within_bounds": [ok]})

    return (
        series
        .select("conv_id", "channel", "turn_idx", "t", "y")
        .where(F.col("t").isNotNull() & F.col("y").isNotNull())
        .groupBy("conv_id", "channel")
        .applyInPandas(_kernel, DTW_SCHEMA)
    )
