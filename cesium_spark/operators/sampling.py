"""Deterministic dataset splitting and sampling for training pipelines.

`randomSplit` is the stock Spark answer, but it is *sample-based*: the
assignment depends on partition layout and re-shuffles between runs, so
a re-run (or a backfill over a grown table) migrates rows between
train/val/test — silent leakage. Training pipelines want **content-
addressed** assignment: a row's split is a pure function of its key, so
it is stable across runs, re-partitions, engine versions, AND table
growth (new rows land in splits at the configured rates; old rows never
move). This is the published practice for LLM corpus curation
(fixed-hash holdout).

Implementation: first 8 hex digits of md5(key || salt) → 32-bit int →
per-mille bucket → threshold bands. Pure native expressions (codegen,
no UDF, no shuffle — a projection over the scan); md5 is bit-identical
everywhere, which also makes the assignment restatable in any other
engine (the DuckDB oracle replays it exactly).
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

BUCKETS = 10_000


def split_bucket(key_col, salt: str = ""):
    """Column expr: stable bucket in [0, 10000) from md5(key||salt)."""
    h = F.md5(F.concat(key_col.cast("string"), F.lit(salt)))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(BUCKETS))


def hash_split(df: DataFrame, weights: Mapping[str, float],
               key: str = "doc_id", salt: str = "") -> DataFrame:
    """Adds a `split` column assigning each row to a named split with
    the given weights (must sum to 1.0 within 1e-9). Assignment is a
    pure function of (key, salt): re-runs, repartitions and table
    growth never move a row between splits.

    Weights are quantized to 1/10000 (the bucket resolution); the salt
    re-deals the assignment (e.g. per experiment) without touching the
    data.
    """
    if not weights:
        raise ValueError("weights must be non-empty")
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1.0, got {total}")
    if any(w < 0 for w in weights.values()):
        raise ValueError("weights must be non-negative")

    bucket = split_bucket(F.col(key), salt)
    # cumulative integer thresholds in bucket units; the LAST band is
    # open-ended so quantization never drops a row
    names = list(weights)
    cum, edges = 0.0, []
    for name in names[:-1]:
        cum += weights[name]
        edges.append(int(round(cum * BUCKETS)))
    expr = None
    for name, edge in zip(names[:-1], edges):
        cond = bucket < F.lit(edge)
        expr = F.when(cond, F.lit(name)) if expr is None \
            else expr.when(cond, F.lit(name))
    expr = F.lit(names[-1]) if expr is None else expr.otherwise(
        F.lit(names[-1]))
    return df.withColumn("split", expr)


def deterministic_sample(df: DataFrame, fraction: float,
                         key: str = "doc_id", salt: str = "") -> DataFrame:
    """Content-addressed Bernoulli sample: keeps rows whose bucket
    falls below fraction*10000. Unlike df.sample(), the same rows are
    kept on every run and on any partitioning, and a larger fraction's
    sample is a SUPERSET of a smaller one (nested samples — the
    property you want for scaling-law subsets)."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    edge = int(round(fraction * BUCKETS))
    return df.where(split_bucket(F.col(key), salt) < F.lit(edge))


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping[str, float],
                      key: str = "doc_id", salt: str = "") -> DataFrame:
    """Content-addressed stratified sample: per-stratum keep rates
    (`sampleBy` semantics) with the SAME determinism guarantees as
    `deterministic_sample` — a row's fate is a pure function of
    (key, salt), so re-runs, repartitions and table growth never
    change which rows a stratum keeps, and raising one stratum's rate
    yields a superset of the lower-rate sample. Strata absent from
    `fractions` are dropped (rate 0 — `sampleBy` parity).

    The hash is salted with the STRATUM too, so two strata keep
    decorrelated key subsets (a shared-key row duplicated across
    strata isn't kept/dropped in lockstep). Pure projection + filter:
    codegen, zero shuffles, pushes below any downstream exchange.
    """
    if not fractions:
        raise ValueError("fractions must be non-empty")
    for s, f in fractions.items():
        if not 0.0 <= f <= 1.0:
            raise ValueError(f"fraction for {s!r} must be in [0,1], got {f}")
    # per-stratum edge via a literal map lookup (no join, no UDF)
    edge_map = F.create_map(*[
        x for s, f in fractions.items()
        for x in (F.lit(s), F.lit(int(round(f * BUCKETS))))])
    stratum_bucket = (F.conv(F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(salt),
                       F.lit("\x1f"), F.col(strata_col).cast("string"))),
        1, 8), 16, 10).cast("long") % F.lit(BUCKETS))
    return df.where(
        stratum_bucket < edge_map[F.col(strata_col).cast("string")])


def weighted_sample(df: DataFrame, k: int, weight_col: str,
                    strata_col: str | None = None,
                    key: str = "doc_id", salt: str = "") -> DataFrame:
    """Content-addressed weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis 2006, algorithm A): each row draws a
    deterministic uniform u from md5(key‖salt) and competes with the
    key ``ln(u)/w`` — taking the k LARGEST per stratum is exactly a
    weighted draw without replacement (u^(1/w) order, log-monotone).
    This is `deterministic_sample`'s weighted sibling: quality-scored
    corpus subsampling ("keep 1M docs, proportional to quality") needs
    weights, and df.sample() can't do per-row weights OR reproduce
    itself across runs.

    Determinism: u = (int(md5[:8 hex]) + 0.5) / 2^32 — exact dyadic
    arithmetic, never 0 or 1, bit-identical in any engine; the ES key
    is rounded to 6 dp BEFORE ranking (the rank-boundary convention —
    tfidf/DTW precedent) with ties broken by key ASC, so the selected
    set is stable across engines, runs, partitionings, and (because u
    is per-row) table growth only perturbs the boundary, never
    re-deals survivors wholesale.

    Rows with NULL or non-positive weight never compete (a weight of
    0 must mean "never sampled", and ln(u)/w flips sign at w<0) —
    they are filtered, not errored: one bad row must not kill a
    10^12-row draw. NULL strata form their own stratum.

    Scale shape: pure projection → per-stratum row_number window →
    filter ≤ k. ONE hash exchange on the stratum (or a single-
    partition window when unstratified — k-bounded output but a
    global sort feed; for unstratified top-k at extreme scale prefer
    orderBy+limit = TakeOrdered, documented trade-off).
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    u = ((F.conv(F.substring(
        F.md5(F.concat(F.col(key).cast("string"), F.lit(salt))),
        1, 8), 16, 10).cast("long").cast("double") + F.lit(0.5))
        / F.lit(4294967296.0))
    w = F.col(weight_col).cast("double")
    es_key = F.round(F.log(u) / w, 6)
    d = (df.where(w.isNotNull() & (w > 0))
           .withColumn("es_key", es_key))
    part = [strata_col] if strata_col else []
    win = Window.partitionBy(*part).orderBy(
        F.col("es_key").desc(), F.col(key).asc())
    return (d.withColumn("sample_rank",
                         F.row_number().over(win).cast("int"))
            .where(F.col("sample_rank") <= k))


def dsir_logweights(docs: DataFrame, is_target,
                    n_buckets: int = 256,
                    id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling") — the principled
    "make the corpus look like the target domain" selection step of
    an LLM curation pipeline, next to the quality-gate and dedup
    stages: score every document by how much more likely its hashed
    n-gram profile is under the TARGET distribution than under the
    raw corpus,

        log ŵ(x) = Σ_b c_b(x) · ( ln p̂_t[b] − ln p̂_r[b] ),

    where c_b(x) counts the document's unigrams+bigrams hashed into
    bucket b (the paper's hashed n-gram feature space) and p̂ are
    add-one-smoothed bucket distributions: p̂[b] = (cnt[b]+1)/(tot+B).

    Determinism: the bucket hash is the CMS md5 family (bit-identical
    in any engine); both distributions are exact int64 counts; each
    bucket's Δ_b = ln(p̂_t) − ln(p̂_r) is a fixed double tree computed
    ONCE in the B-row dictionary, and the per-document sum folds
    Σ c_b·Δ_b in BUCKET order (ordered cumsum, terminal max — the
    chi2 cell contract), so log ŵ is bit-identical across engines
    and partitionings.  Buckets unseen in both distributions get the
    same smoothed Δ via coalesce(cnt, 0) — no row is dropped.

    Plan: one explode over the scan, two B-row count aggregates
    (broadcast back), one (doc, bucket) aggregate + ordered fold on
    the doc key — the corpus is touched once, the dictionaries are
    tiny broadcasts, and the only doc-keyed exchange is the fold
    window.  No UDF.  At 100 TB the B-row dictionary path is exactly
    the two-pass shape the paper's estimator needs.

    `is_target`: boolean Column marking target-domain rows (computed
    from the docs frame's own columns — e.g. trusted sources).
    Returns one row per document: (id, n_items, in_target, logw).
    """
    if n_buckets < 2 or n_buckets > 1_000_000:
        raise ValueError(f"dsir_logweights: bad n_buckets {n_buckets}")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    items = F.concat(
        toks,
        F.expr(f"zip_with(slice(split(trim({text_col}), '\\\\s+'), 1, "
               f"size(split(trim({text_col}), '\\\\s+')) - 1), "
               f"slice(split(trim({text_col}), '\\\\s+'), 2, "
               f"size(split(trim({text_col}), '\\\\s+')) - 1), "
               "(a, b) -> concat(a, ' ', b))"))
    base = docs.where(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("__id"),
        is_target.alias("__tgt"),
        F.explode(items).alias("__item"))
    bucket = (F.conv(F.substring(F.md5(F.concat(F.lit("g:"),
                                                F.col("__item"))),
                                 1, 8), 16, 10).cast("long")
              % F.lit(n_buckets))
    it = base.select("__id", "__tgt", bucket.alias("__b"))
    rcnt = it.groupBy("__b").agg(F.count(F.lit(1)).alias("__cr"))
    tcnt = (it.where(F.col("__tgt"))
            .groupBy("__b").agg(F.count(F.lit(1)).alias("__ct")))
    totals = (rcnt.agg(F.sum("__cr").alias("__tr"))
              .crossJoin(tcnt.agg(F.sum("__ct").alias("__tt"))))
    dict_df = (rcnt.join(tcnt, "__b", "full_outer")
               .crossJoin(F.broadcast(totals)))
    bf = F.lit(float(n_buckets))
    ct = F.coalesce(F.col("__ct"), F.lit(0)).cast("double")
    cr = F.coalesce(F.col("__cr"), F.lit(0)).cast("double")
    # an EMPTY target set means the target distribution does not
    # exist — raise in-plan rather than silently scoring all-NULL
    tt = F.when(
        F.col("__tt").isNull(),
        F.expr("raise_error('dsir_logweights: empty target set')")
        .cast("long")).otherwise(F.col("__tt"))
    delta = (F.log((ct + F.lit(1.0))
                   / (tt.cast("double") + bf))
             - F.log((cr + F.lit(1.0))
                     / (F.col("__tr").cast("double") + bf)))
    deltas = dict_df.select("__b", delta.alias("__delta"),
                            F.col("__tt").alias("__tt"),
                            F.col("__tr").alias("__tr"))
    docb = it.groupBy("__id", "__b").agg(
        F.count(F.lit(1)).alias("__c"),
        F.max(F.col("__tgt").cast("int")).alias("__t"))
    joined = docb.join(F.broadcast(deltas), "__b", "left")
    w_ord = (Window.partitionBy("__id").orderBy("__b")
             .rowsBetween(Window.unboundedPreceding, 0))
    folded = joined.select(
        "__id", "__t", "__b",
        F.sum(F.col("__c").cast("double") * F.col("__delta"))
        .over(w_ord).alias("__cum"),
        F.sum("__c").over(Window.partitionBy("__id")).alias("__n"))
    # terminal pick is max_by over the bucket id, NOT max: deltas can
    # be negative, so the cumsum is non-monotone (the effective_rank
    # terminal-fold rule)
    return (folded.groupBy("__id")
            .agg(F.max("__n").alias("n_items"),
                 F.max("__t").alias("__t"),
                 F.max_by(F.col("__cum"), F.col("__b")).alias("logw"))
            .select(F.col("__id").alias(id_col),
                    F.col("n_items").cast("long").alias("n_items"),
                    (F.col("__t") == 1).alias("in_target"),
                    F.col("logw")))


def mix_weights(docs: DataFrame, alpha: float = 0.5,
                group_col: str = "source",
                text_col: str = "text",
                tokenizer: str = "ws") -> DataFrame:
    """Temperature-based corpus mixing weights per source (the
    multinomial sampling recipe of the GPT-3/PaLM training setups —
    Brown et al. 2020 §2.2's quality-weighted sampling restated at
    the source grain): raw token shares p_s are flattened to

        w_s = p_s^α / Σ_t p_t^α        (α = 1 keeps raw shares,
                                        α → 0 approaches uniform)

    so low-resource sources are UPSAMPLED — the ``boost`` column
    (w_s/p_s) is each source's effective epoch multiplier, the
    number a data-mixing review actually reads.

    Exactness: per-source doc and token counts are exact int64; p_s,
    the α-powers, and the normalizer fold in SOURCE order (ordered
    cumsum, terminal max — powers are nonnegative, the hurst rule),
    then w_s and boost are fixed trees.  α is validated in (0, 1]
    (α > 1 would SHARPEN the skew — almost always a config typo for
    this recipe, refused loudly).

    Plan: one (source) aggregate + one ordered fold over the tiny
    source table + a broadcast-back of the 1-row normalizer — the
    corpus is scanned once; everything after runs on |sources| rows.
    """
    if not (0.0 < alpha <= 1.0):
        raise ValueError(f"mix_weights: alpha must be in (0, 1], "
                         f"got {alpha}")
    if tokenizer == "ws":
        # r4 convention kept verbatim (oracle-pinned)
        toks = F.size(F.split(F.trim(F.col(text_col)), r"\s+"))
    else:
        # tokenizer seam (r5): BPE-denominated token shares — the
        # unit real mixing recipes weight by
        from cesium_spark.functions.tokenizer import token_count
        toks = token_count(text_col, tokenizer)
    per = (docs
           .where(F.col(text_col).isNotNull()
                  & F.col(group_col).isNotNull())
           .groupBy(group_col)
           .agg(F.count(F.lit(1)).alias("n_docs"),
                F.sum(toks.cast("long")).alias("n_tokens")))
    w_all = Window.partitionBy(F.lit(1))
    w_ord = (w_all.orderBy(group_col)
             .rowsBetween(Window.unboundedPreceding, 0))
    tot = F.sum("n_tokens").over(w_all)
    p = F.col("n_tokens").cast("double") / tot.cast("double")
    powed = F.pow(p, F.lit(float(alpha)))
    folded = per.select(
        group_col, "n_docs", "n_tokens",
        p.alias("raw_share"),
        powed.alias("__pw"),
        F.sum(powed).over(w_ord).alias("__cum"))
    norm = folded.agg(F.max("__cum").alias("__z"))
    out = folded.crossJoin(F.broadcast(norm))
    w = F.col("__pw") / F.col("__z")
    return out.select(
        group_col,
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("raw_share"),
        w.alias("mix_share"),
        (w / F.col("raw_share")).alias("boost"))
