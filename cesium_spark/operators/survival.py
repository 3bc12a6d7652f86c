"""Survival analysis over conversation lifetimes: the Kaplan–Meier
product-limit estimator (Kaplan & Meier 1958) — "what fraction of
conversations survive past duration t?" with RIGHT-CENSORING done
properly. The question every retention/engagement dashboard answers
wrong by averaging only the finished conversations: at any observation
cutoff the long conversations are systematically still open, so naive
mean-duration UNDERESTIMATES engagement; censoring-aware KM is the
standard fix.

Estimator, restated verbatim in the SQL oracle: with distinct event
times t₍ᵢ₎, deaths dᵢ (spans that ENDED at t₍ᵢ₎) and risk set nᵢ
(spans with duration ≥ t₍ᵢ₎, ended or censored),

    S(t₍ᵢ₎) = Π_{j ≤ i} (1 − dⱼ/nⱼ)

computed as exp(Σ ln(1 − d/n)) so the running product is one
cumulative window sum — the identical expression in any engine
(a cumprod has no SQL window form). The d = n terminal case (risk set
exhausted by deaths, S drops to exactly 0) is an EXPLICIT branch — a
cumulative "curve has terminated" flag forcing 0.0 — because the
engines disagree on ln(0): Spark log() returns NULL on non-positive
input while DuckDB ln(0) throws OutOfRange; neither silently yields
the −∞ the algebra wants.

Scale shape: one aggregate to (stratum, duration) grain (deaths +
censored per distinct time — the shuffle carries distinct durations,
not spans), two cumulative windows on the stratum key (risk set via
total-minus-exclusive-cumsum, survival via the log-sum), one final
projection. TWO shrinking hash exchanges, no join, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def kaplan_meier(spans: DataFrame, duration_col: str = "duration",
                 event_col: str = "event",
                 strata_col: str | None = None) -> DataFrame:
    """Kaplan–Meier curve per stratum from one row per subject:
    ``duration_col`` (time observed, ≥ 0) and ``event_col`` (true =
    the span ENDED at that time; false = right-censored there).
    Output: one row per (stratum, distinct duration) — ``n_risk``,
    ``n_events``, ``n_censored``, and ``survival`` = S(duration),
    non-increasing from 1. Rows where only censoring happened are
    kept (they shrink later risk sets and a reader wants them on the
    curve) with the survival value carried through unchanged
    (ln(1 − 0/n) = 0 — again no branch).

    NULL or negative durations are rejected loudly — they are data
    corruption, not a policy choice (a silent filter here would skew
    every risk set downstream).
    """
    strata = [strata_col] if strata_col else []
    d, e = F.col(duration_col), F.col(event_col)
    # fail-loudly validation: one bounded extra job over the
    # (subject-sized, not turn-sized) span table — limit(1) stops the
    # scan at the first bad row
    bad = spans.where(d.isNull() | (d < 0) | e.isNull())
    grain = (spans.groupBy(*strata, d.alias("t"))
             .agg(F.sum(F.when(e, 1).otherwise(0)).alias("n_events"),
                  F.sum(F.when(~e, 1).otherwise(0)).alias("n_censored")))
    n_bad = bad.limit(1).count()
    if n_bad:
        raise ValueError(
            "kaplan_meier: NULL/negative duration or NULL event flag "
            "present — reject or repair upstream (a silent filter "
            "would skew every risk set)")
    w_part = Window.partitionBy(*strata) if strata else \
        Window.partitionBy(F.lit(1))
    w_ord = w_part.orderBy("t")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
    total = F.sum(F.col("n_events") + F.col("n_censored")).over(w_part)
    seen = F.sum(F.col("n_events") + F.col("n_censored")).over(w_cum)
    g = (grain
         .withColumn("n_risk",
                     (total - seen + F.col("n_events")
                      + F.col("n_censored")).cast("long")))
    dead = F.col("n_events") == F.col("n_risk")
    loghaz = F.when(dead, F.lit(0.0)).otherwise(
        F.log(F.lit(1.0) - F.col("n_events")
              / F.col("n_risk").cast("double")))
    terminated = F.max(F.when(dead, 1).otherwise(0)).over(w_cum) == 1
    g = g.withColumn(
        "survival",
        F.when(terminated, F.lit(0.0))
        .otherwise(F.exp(F.sum(loghaz).over(w_cum))))
    return g.select(
        *strata, F.col("t").alias(duration_col),
        "n_risk",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_censored").cast("long").alias("n_censored"),
        "survival")


def conversation_spans(transcripts: DataFrame,
                       censor_horizon_s: float) -> DataFrame:
    """Span table for survival analysis from raw transcripts: one row
    per conversation with ``duration`` (last ts − first ts, seconds),
    ``event`` (ended = last turn is at least ``censor_horizon_s``
    before the global max ts; otherwise the conversation may still be
    open → right-censored), and ``first_role`` as the natural
    stratum. The global cutoff rides a broadcast 1-row cross join."""
    if censor_horizon_s <= 0:
        raise ValueError(
            f"censor_horizon_s must be > 0, got {censor_horizon_s}")
    sec = F.col("ts").cast("double")
    per = (transcripts.groupBy("conv_id")
           .agg((F.max(sec) - F.min(sec)).alias("duration"),
                F.max(sec).alias("__last"),
                F.expr("min_by(role, turn_idx)").alias("first_role")))
    mx = transcripts.agg(F.max(sec).alias("__mx"))
    return (per.crossJoin(F.broadcast(mx))
            .select("conv_id", "duration", "first_role",
                    (F.col("__last")
                     <= F.col("__mx") - F.lit(float(censor_horizon_s)))
                    .alias("event")))


def logrank_test(spans: DataFrame, group_col: str,
                 group_a: str, group_b: str,
                 duration_col: str = "duration",
                 event_col: str = "event") -> DataFrame:
    """Two-sample log-rank test (Mantel 1966; Peto & Peto 1972) —
    the COMPARISON completing the survival family: ``kaplan_meier``
    draws each stratum's curve, the log-rank χ² says whether two
    curves differ beyond chance, censoring handled exactly like KM
    (a censored span leaves the risk set without counting as death):

        O₁ = Σᵢ d₁ᵢ,   E₁ = Σᵢ dᵢ·n₁ᵢ/nᵢ,
        V  = Σᵢ dᵢ·(n₁ᵢ/nᵢ)·(1 − n₁ᵢ/nᵢ)·(nᵢ−dᵢ)/(nᵢ−1),
        χ² = (O₁ − E₁)²/V   ~  χ²(1) under H₀,

    summed over the POOLED distinct event times (dᵢ ≥ 1).

    Exactness: every count (per-time deaths/censorings per group,
    risk sets via the KM total-minus-exclusive-prefix trick) is
    exact int64; E₁ and V terms are fixed double trees whose
    summands are NONNEGATIVE, so both folds are nondecreasing
    ordered cumsums with max terminal picks (the hurst rule); O₁ is
    a plain integer sum.  nᵢ = 1 rows contribute V = 0 (the standard
    convention — the factor (nᵢ−dᵢ)/(nᵢ−1) is skipped, not 0/0).
    V = 0 overall (e.g. every event time has the risk set entirely
    in one group) → NULL χ² — "no information" is not "no
    difference".  The kaplan_meier NULL/negative-duration rejection
    applies verbatim.

    Plan: one (t) grain aggregate with per-group conditional counts,
    two cumulative windows on the single ordered-time partition, one
    final 1-row aggregate — the KM plan with a second group lane.
    """
    if group_a == group_b:
        raise ValueError("logrank_test: groups must differ")
    d, e = F.col(duration_col), F.col(event_col)
    g = F.col(group_col)
    base = spans.where(g.isin([group_a, group_b]))
    bad = base.where(d.isNull() | (d < 0) | e.isNull())
    if bad.limit(1).count():
        raise ValueError(
            "logrank_test: NULL/negative duration or NULL event flag "
            "present — reject or repair upstream")
    in_a = g == group_a
    grain = (base.groupBy(d.alias("t"))
             .agg(F.sum(F.when(e & in_a, 1).otherwise(0)).alias("d1"),
                  F.sum(F.when(e & ~in_a, 1).otherwise(0)).alias("d2"),
                  F.sum(F.when(~e & in_a, 1).otherwise(0)).alias("c1"),
                  F.sum(F.when(~e & ~in_a, 1).otherwise(0)).alias("c2")))
    w_part = Window.partitionBy(F.lit(1))
    w_ord = w_part.orderBy("t")
    w_cum = w_ord.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)
    leave1 = F.col("d1") + F.col("c1")
    leave2 = F.col("d2") + F.col("c2")
    n1 = (F.sum(leave1).over(w_part)
          - F.sum(leave1).over(w_cum) + leave1).cast("long")
    n2 = (F.sum(leave2).over(w_part)
          - F.sum(leave2).over(w_cum) + leave2).cast("long")
    risk = grain.select(
        "t", "d1", "d2", n1.alias("n1"), n2.alias("n2"))
    dd = F.col("d1") + F.col("d2")
    nn = F.col("n1") + F.col("n2")
    n1d = F.col("n1").cast("double")
    nnd = nn.cast("double")
    ddd = dd.cast("double")
    e_term = F.when(dd >= 1, ddd * (n1d / nnd)).otherwise(F.lit(0.0))
    v_term = F.when(
        (dd >= 1) & (nn > 1),
        ddd * (n1d / nnd) * (F.lit(1.0) - n1d / nnd)
        * (nnd - ddd) / (nnd - F.lit(1.0))).otherwise(F.lit(0.0))
    folded = risk.select(
        F.sum(F.col("d1")).over(w_cum).alias("__o1"),
        F.sum(e_term).over(w_ord.rowsBetween(
            Window.unboundedPreceding, 0)).alias("__e1"),
        F.sum(v_term).over(w_ord.rowsBetween(
            Window.unboundedPreceding, 0)).alias("__v"))
    out = folded.agg(
        F.max("__o1").cast("long").alias("o1"),
        F.max("__e1").alias("e1"),
        F.max("__v").alias("v"))
    chi2 = F.when(
        F.col("v") > 0,
        (F.col("o1").cast("double") - F.col("e1"))
        * (F.col("o1").cast("double") - F.col("e1")) / F.col("v"))
    return out.select("o1", "e1", "v", chi2.alias("chi2"))
