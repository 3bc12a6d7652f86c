"""Table-level statistical tests: Benford first-digit conformance
(data-quality / fraud screening — Benford 1938, Nigrini 2012's audit
use) and Welch's two-sample t-test (the A/B experimentation primitive
— Welch 1947). Both are engineered on the exact-integer-sufficient-
statistics pattern (the ols_fit2/auc_score house rule): the distributed
pass aggregates exact integers; every float is one fixed expression
tree over those integers and shared literals, so results are bit-stable
at any parallelism and exactly SQL-restatable.

Grid contract: inputs are values on a 1/scale grid (2-dp currency →
scale=100). Each operator carries an IN-PLAN guard that fails loudly if
a value is further than 1e-6 from its grid point — silently rounding
off-grid values would fabricate digits/moments.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BENFORD_P = [math.log10(1.0 + 1.0 / d) for d in range(1, 10)]


def _grid_int(value_col: str, scale: int, op: str):
    v = F.col(value_col)
    scaled = v * F.lit(float(scale))
    snapped = F.round(scaled, 0)
    guard = F.assert_true(
        F.abs(scaled - snapped) < F.lit(1e-6),
        F.concat(F.lit(f"{op}: value off the 1/{scale} grid "
                       "(exact-integer contract); value="),
                 v.cast("string")))
    return F.when(guard.isNull(), snapped.cast("long"))


def benford_test(df: DataFrame, value_col: str,
                 scale: int = 100) -> DataFrame:
    """First-significant-digit distribution vs Benford's law, with the
    χ² statistic. Returns 9 rows: (digit, n_obs, frac_obs, p_benford,
    chi2_total) — chi2_total = Σ_d (obs_d − n·p_d)²/(n·p_d) repeated
    per row so the full picture is one result set. Digits absent from
    the data still appear (n_obs = 0) — their χ² contribution n·p_d is
    real and omitting the row would understate the statistic.

    Digit extraction never touches floats: the grid contract converts
    each value to an exact integer (|v|·scale), and the first digit is
    the first character of that INTEGER's decimal rendering — no
    log10, no float printing, no engine-dependent boundary anywhere.
    Zeros have no significant digit and are excluded (counted out via
    n vs the caller's row count). ONE hash aggregate over 9 keys.
    """
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    cents = _grid_int(value_col, scale, "benford_test")
    digit = F.substring(F.abs(cents).cast("string"), 1, 1).cast("int")
    counts = (df.where(F.col(value_col).isNotNull())
              .select(cents.alias("c"), digit.alias("digit"))
              .where(F.col("c") != 0)
              .groupBy("digit")
              .agg(F.count(F.lit(1)).alias("n_obs")))
    spark = df.sparkSession
    probs = spark.createDataFrame(
        [(d, BENFORD_P[d - 1]) for d in range(1, 10)],
        "digit int, p_benford double")
    full = (F.broadcast(probs)
            .join(counts, "digit", "left")
            .select("digit",
                    F.coalesce("n_obs", F.lit(0)).cast("long")
                    .alias("n_obs"), "p_benford"))
    w = Window.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    n = F.sum("n_obs").over(w).cast("double")  # integer sum: order-free
    exp = n * F.col("p_benford")
    obs = F.col("n_obs").cast("double")
    contrib = (obs - exp) * (obs - exp) / exp
    # the 9-term float χ² is summed as an ORDERED cumulative fold in
    # digit order (contributions are non-negative, so the total is the
    # max of the cumulative) — even this tiny sum is sequence-pinned
    # rather than left to aggregation order
    w_cum = (Window.orderBy("digit")
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    w_all = (Window.orderBy("digit")
             .rowsBetween(Window.unboundedPreceding,
                          Window.unboundedFollowing))
    staged = full.select(
        "digit", "n_obs",
        (obs / n).alias("frac_obs"), "p_benford",
        F.sum(contrib).over(w_cum).alias("_cum"))
    return staged.select(
        "digit", "n_obs", "frac_obs", "p_benford",
        F.max("_cum").over(w_all).alias("chi2_total"))


def welch_ttest(df: DataFrame, value_col: str, group_col: str,
                scale: int = 100) -> DataFrame:
    """Welch's unequal-variance two-sample t over a BOOLEAN group
    column: one pass of exact integer sufficient statistics (n, Σx,
    Σx² in grid units per group — map-side partials, single-row
    exchange), then mean / sample variance / t / Welch–Satterthwaite
    dof as fixed double trees. Σx² of 10^12 grid units can overflow
    int64 — ANSI mode raises loudly (the ols_fit2 contract: overflow
    is a bug, not a silent float fallback; pre-scale or sample).
    Output (one row): n_a, n_b, mean_a, mean_b, t_stat, dof — means in
    ORIGINAL units; groups under 2 rows or with zero pooled variance
    yield NULL t (undefined, never ±inf)."""
    if scale < 1:
        raise ValueError(f"scale must be >= 1, got {scale}")
    x = _grid_int(value_col, scale, "welch_ttest")
    g = F.col(group_col).cast("boolean")
    agg = (df.where(F.col(value_col).isNotNull() & g.isNotNull())
           .select(x.alias("x"), g.alias("g"))
           .agg(
               F.sum(F.when(F.col("g"), 1).otherwise(0)).cast("long")
               .alias("n_a"),
               F.sum(F.when(~F.col("g"), 1).otherwise(0)).cast("long")
               .alias("n_b"),
               F.sum(F.when(F.col("g"), F.col("x")).otherwise(0))
               .cast("long").alias("s_a"),
               F.sum(F.when(~F.col("g"), F.col("x")).otherwise(0))
               .cast("long").alias("s_b"),
               F.sum(F.when(F.col("g"), F.col("x") * F.col("x"))
                     .otherwise(0)).cast("long").alias("q_a"),
               F.sum(F.when(~F.col("g"), F.col("x") * F.col("x"))
                     .otherwise(0)).cast("long").alias("q_b")))

    def stats(n, s, q):
        nd = F.col(n).cast("double")
        sd = F.col(s).cast("double")
        qd = F.col(q).cast("double")
        mean = sd / nd
        var = F.when(F.col(n) >= 2,
                     (qd - sd * sd / nd) / (nd - F.lit(1.0)))
        return nd, mean, var

    na, ma, va = stats("n_a", "s_a", "q_a")
    nb, mb, vb = stats("n_b", "s_b", "q_b")
    se2 = va / na + vb / nb
    t = F.when(se2 > 0, (ma - mb) / F.sqrt(se2))
    dof = F.when(se2 > 0,
                 se2 * se2
                 / ((va / na) * (va / na) / (na - F.lit(1.0))
                    + (vb / nb) * (vb / nb) / (nb - F.lit(1.0))))
    inv = F.lit(float(scale))
    return agg.select(
        "n_a", "n_b",
        (ma / inv).alias("mean_a"), (mb / inv).alias("mean_b"),
        t.alias("t_stat"), dof.alias("dof"))


def chi2_independence(df: DataFrame, col_a: str,
                      col_b: str) -> DataFrame:
    """Pearson χ² test of independence over the (col_a × col_b)
    contingency table — the categorical-association screen next to
    Welch (numeric A/B) and Benford (digit conformance): is the
    language mix independent of the source, the error rate of the
    segment? Output: one row per DENSE cell (absent combinations
    included — their expected count is real and omitting them would
    understate χ², the Benford rule) with observed, expected, the
    cell's χ² contribution, and the table-level chi2_total / dof /
    cramers_v repeated per row so one result set carries the whole
    picture.

    Exactness: observed counts and marginals are exact integers from
    ONE hash aggregate over the (a, b) cells; expected =
    row_tot·col_tot/N and each contribution are fixed double trees
    (marginals multiplied as DOUBLES — at 10^10-row marginals an
    int64 product would overflow); the cross-cell χ² sum is an
    ORDERED cumulative fold in (a, b) order (non-negative terms, so
    the total is the last cumulant — the Benford contract), never a
    parallel float sum. Cramér's V = sqrt(χ²/(N·min(r−1,c−1)))
    normalizes to [0,1]; 1×c or r×1 tables (dof = 0) yield NULL V
    and a 0 χ² by construction.

    Scale shape: the corpus-sized work is the single groupBy(a, b)
    hash aggregate (map-side partial); everything after runs on the
    r×c CELL table — marginals, the dense cross join (small × small,
    broadcast), and the global-window folds are all bounded by the
    category cardinalities, which a contingency test assumes are
    small. No second scan of the input.
    """
    a, b = F.col(col_a), F.col(col_b)
    cells = (df.where(a.isNotNull() & b.isNotNull())
             .groupBy(a.alias("a"), b.alias("b"))
             .agg(F.count(F.lit(1)).cast("long").alias("n_obs")))
    rows = cells.groupBy("a").agg(F.sum("n_obs").alias("row_tot"))
    cols = cells.groupBy("b").agg(F.sum("n_obs").alias("col_tot"))
    dense = (rows.crossJoin(F.broadcast(cols))
             .join(cells, ["a", "b"], "left")
             .select("a", "b", "row_tot", "col_tot",
                     F.coalesce("n_obs", F.lit(0)).cast("long")
                     .alias("n_obs")))
    wall = (Window.orderBy("a", "b")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    wcum = (Window.orderBy("a", "b")
            .rowsBetween(Window.unboundedPreceding, 0))
    n = F.sum("n_obs").over(wall).cast("double")  # integer sum
    r_card = F.size(F.collect_set("a").over(wall)).cast("long")
    c_card = F.size(F.collect_set("b").over(wall)).cast("long")
    expected = (F.col("row_tot").cast("double")
                * F.col("col_tot").cast("double") / n)
    o = F.col("n_obs").cast("double")
    contrib = (o - expected) * (o - expected) / expected
    out = (dense
           .withColumn("expected", expected)
           .withColumn("contrib", contrib)
           .withColumn("__cum", F.sum("contrib").over(wcum))
           .withColumn("chi2_total", F.last("__cum").over(wall))
           .withColumn("__r", r_card)
           .withColumn("__c", c_card)
           .withColumn("dof", (F.col("__r") - 1) * (F.col("__c") - 1))
           .withColumn("n", F.sum("n_obs").over(wall).cast("long")))
    r1 = (F.col("__r") - 1).cast("double")
    c1 = (F.col("__c") - 1).cast("double")
    v = F.when(F.col("dof") > 0,
               F.sqrt(F.col("chi2_total")
                      / (F.col("n").cast("double")
                         * F.least(r1, c1))))
    return out.select("a", "b", "n_obs", "expected", "contrib",
                      "chi2_total", "dof", "n",
                      v.alias("cramers_v"))


def mix_stats(df: DataFrame, bucket_col, category_col) -> DataFrame:
    """Composition-mix monitor per time bucket — "did the crawl /
    traffic mix shift?": for each bucket (day, source batch …) the
    category distribution summarized as

        n, n_categories              exact integer counts
        hhi                          Herfindahl–Hirschman Σ share²
                                     (1/k flat → 1 monopolized)
        entropy                      Shannon nats (the inverse lens)
        top_category, top_share      deterministic majority
                                     (count DESC, category ASC)

    The chi2_independence screen asks whether mix and bucket are
    independent GLOBALLY; this gives the per-bucket trajectory a
    dashboard actually plots.

    Exactness: cell counts from ONE (bucket, category) hash
    aggregate; HHI and entropy fold over each bucket's ≤k cells in
    ORDERED category sequence (non-negative terms, the chi2 cell
    contract); shares are terminal divisions.  A single-category
    bucket lands on exactly hhi = 1, entropy = 0.

    Plan: one corpus aggregate collapsing map-side to (buckets × k)
    rows, then bucket-cardinality window work — two shrinking
    exchanges, no UDF, no join.
    """
    cells = (df
             .where(bucket_col.isNotNull() & category_col.isNotNull())
             .groupBy(bucket_col.alias("bucket"),
                      category_col.alias("cat"))
             .agg(F.count(F.lit(1)).alias("c")))
    w_all = Window.partitionBy("bucket")
    w_ord = w_all.orderBy("cat")
    n = F.sum("c").over(w_all)
    share = F.col("c").cast("double") / n.cast("double")
    hhi_term = share * share
    ent_term = share * F.log(n.cast("double") / F.col("c").cast("double"))
    enriched = cells.select(
        "bucket", "cat", "c",
        n.alias("__n"),
        F.sum(hhi_term).over(w_ord).alias("__cum_hhi"),
        F.sum(ent_term).over(w_ord).alias("__cum_ent"))
    g = enriched.groupBy("bucket").agg(
        F.max("__n").alias("n"),
        F.count(F.lit(1)).alias("n_categories"),
        F.max("__cum_hhi").alias("hhi"),
        F.max("__cum_ent").alias("entropy"),
        F.expr("min_by(cat, struct(-c, cat))").alias("top_category"),
        F.max("c").alias("__top_c"))
    return g.select(
        "bucket",
        F.col("n").cast("long").alias("n"),
        F.col("n_categories").cast("long").alias("n_categories"),
        "hhi", "entropy", "top_category",
        (F.col("__top_c").cast("double") / F.col("n").cast("double"))
        .alias("top_share"))


def prop_ztest(df: DataFrame, group_col, success_col,
               group_a: str, group_b: str) -> DataFrame:
    """Two-proportion z-test (pooled) — the RATE counterpart of
    ``welch_ttest``'s mean comparison: does group A convert/click/
    purchase at a different rate than group B?

        z = (p̂_a − p̂_b) / sqrt( p̂(1−p̂)·(1/n_a + 1/n_b) ),
        p̂ = pooled successes / pooled n

    Exactness: the four sufficient statistics (n_a, s_a, n_b, s_b)
    are exact int64 from ONE conditional aggregate over one scan; z
    and the rates are fixed double trees restated verbatim in SQL.
    Degenerates NULL, never ±inf: an empty group, or a pooled rate
    of exactly 0 or 1 (zero variance — a difference is either
    impossible or already certain; fabricating z = ∞ helps nobody).
    The success column must be boolean or 0/1 integer (validated;
    a silently-coerced count column would inflate successes).

    Plan: one corpus-sized hash aggregate to ONE row; no shuffle
    beyond the final single-row combine.
    """
    if group_a == group_b:
        raise ValueError("prop_ztest: groups must differ")
    g = F.col(group_col) if isinstance(group_col, str) else group_col
    s = F.col(success_col) if isinstance(success_col, str) else success_col
    sl = s.cast("long")
    checked = F.when(
        (sl < 0) | (sl > 1),
        F.expr("raise_error('prop_ztest: success outside {0,1}')")
        .cast("long")).otherwise(sl)
    base = df.where(g.isin([group_a, group_b]) & s.isNotNull())
    agg = base.agg(
        F.sum(F.when(g == group_a, 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(g == group_a, checked).otherwise(F.lit(0)))
        .alias("s_a"),
        F.sum(F.when(g == group_b, 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(g == group_b, checked).otherwise(F.lit(0)))
        .alias("s_b"))
    na, sa = F.col("n_a").cast("double"), F.col("s_a").cast("double")
    nb, sb = F.col("n_b").cast("double"), F.col("s_b").cast("double")
    pa = F.when(F.col("n_a") > 0, sa / na)
    pb = F.when(F.col("n_b") > 0, sb / nb)
    pool_s = F.col("s_a") + F.col("s_b")
    pool_n = F.col("n_a") + F.col("n_b")
    pp = (sa + sb) / (na + nb)
    ok = (F.col("n_a") > 0) & (F.col("n_b") > 0) \
        & (pool_s > 0) & (pool_s < pool_n)
    z = F.when(ok,
               (sa / na - sb / nb)
               / F.sqrt(pp * (F.lit(1.0) - pp)
                        * (F.lit(1.0) / na + F.lit(1.0) / nb)))
    return agg.select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("s_a").cast("long").alias("s_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("s_b").cast("long").alias("s_b"),
        pa.alias("rate_a"), pb.alias("rate_b"),
        F.when(ok, sa / na - sb / nb).alias("lift"),
        z.alias("z"))


def cochran_armitage(df: DataFrame, group_score, success_col) -> DataFrame:
    """Cochran–Armitage trend test (Cochran 1954; Armitage 1955) —
    the ORDERED-groups completion of ``prop_ztest``: with k ordered
    cohorts scored x₁ < … < x_k, does the success rate TREND with
    the score (dose-response), which a pairwise z or an omnibus χ²
    cannot answer.  With exact int64 sufficient statistics N, S (all
    trials/successes), Σxn, Σxs, Σx²n:

        A = N·Σxs − S·Σxn,     B = N·Σx²n − (Σxn)²,
        z = A / sqrt( S·(N−S)·B / N )   ~  N(0,1) under no trend

    — A and B are exact integers (the N-scaling clears every
    fraction; overflow bound N²·x_max·s̄, int64-safe past 10⁹ trials
    at single-digit scores), and z is ONE fixed double tree.
    Degenerates NULL: S = 0 or S = N (no variance — certainty is
    not a trend) or B = 0 (a single distinct score — no axis to
    trend along).  Scores must be integers; successes must be 0/1
    (validated in-plan, the prop_ztest guard).

    Plan: one conditional aggregate over one scan to ONE row.
    """
    x = (F.col(group_score) if isinstance(group_score, str)
         else group_score).cast("long")
    sc = (F.col(success_col) if isinstance(success_col, str)
          else success_col).cast("long")
    checked = F.when(
        (sc < 0) | (sc > 1),
        F.expr("raise_error('cochran_armitage: success outside "
               "{0,1}')").cast("long")).otherwise(sc)
    base = df.where(x.isNotNull() & sc.isNotNull())
    agg = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(checked).alias("s"),
        F.sum(x).alias("xn"),
        F.sum(x * checked).alias("xs"),
        F.sum(x * x).alias("xxn"))
    a = F.col("n") * F.col("xs") - F.col("s") * F.col("xn")
    b = F.col("n") * F.col("xxn") - F.col("xn") * F.col("xn")
    nd, sd = F.col("n").cast("double"), F.col("s").cast("double")
    ok = (F.col("s") > 0) & (F.col("s") < F.col("n")) & (b > 0)
    z = F.when(ok, a.cast("double")
               / F.sqrt(sd * (nd - sd) * b.cast("double") / nd))
    return agg.select(
        F.col("n").cast("long").alias("n"),
        F.col("s").cast("long").alias("s"),
        a.cast("long").alias("a_stat"),
        b.cast("long").alias("b_stat"),
        z.alias("z"))


def mcnemar_test(df: DataFrame, flag_a, flag_b) -> DataFrame:
    """McNemar's test for PAIRED binary flags (McNemar 1947) — the
    within-subject change detector the two-sample prop_ztest gets
    wrong (paired halves share the conversation; treating them as
    independent cohorts overstates n): only the DISCORDANT pairs
    carry information,

        χ² = (b − c)² / (b + c),
        b = #(A ∧ ¬B),  c = #(¬A ∧ B)   ~  χ²(1) under no change.

    b, c exact int64; χ² one division of exact integers, unrounded
    (bit-identical — the ts_allan rule).  b + c = 0 (no discordant
    pair) → NULL — "nothing moved" carries no evidence about
    symmetry.  NULL flags are rejected in-plan (a silently-skipped
    row would understate both margins).

    Plan: one conditional aggregate over one scan to ONE row.
    """
    fa = F.col(flag_a) if isinstance(flag_a, str) else flag_a
    fb = F.col(flag_b) if isinstance(flag_b, str) else flag_b
    chk = F.when(
        fa.isNull() | fb.isNull(),
        F.expr("raise_error('mcnemar_test: NULL flag — reject or "
               "repair upstream')").cast("boolean")).otherwise(F.lit(True))
    agg = df.select(fa.alias("__a"), fb.alias("__b"),
                    chk.alias("__chk")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("__chk") & F.col("__a")
                     & ~F.col("__b"), 1).otherwise(0)).alias("b_cnt"),
        F.sum(F.when(F.col("__chk") & ~F.col("__a")
                     & F.col("__b"), 1).otherwise(0)).alias("c_cnt"))
    bc = F.col("b_cnt") + F.col("c_cnt")
    diff = F.col("b_cnt") - F.col("c_cnt")
    chi2 = F.when(bc > 0,
                  (diff * diff).cast("double") / bc.cast("double"))
    return agg.select(
        F.col("n_pairs").cast("long").alias("n_pairs"),
        F.col("b_cnt").cast("long").alias("b_cnt"),
        F.col("c_cnt").cast("long").alias("c_cnt"),
        chi2.alias("chi2"))
