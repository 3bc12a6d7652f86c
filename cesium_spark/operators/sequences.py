"""Turn-sequence analytics over the transcript shape (conv_id,
turn_idx, role, …): the questions that treat a conversation as a
SEQUENCE of discrete states rather than a numeric series — "what
follows a tool call?", "how many sessions complete the
view→click→purchase path?". No reference counterpart in cesium (its
series are numeric); these are the transcript-native siblings of the
cadence family (SURVEY.md §2.5) over the same one-scan input.

Both operators are pure native expressions:

- ``role_transitions``: first-order Markov transition matrix. One
  ordered window (lead over the conversation) + one count aggregate +
  one row-probability window — three SHRINKING exchanges (turns →
  distinct (role, next_role) pairs → matrix rows), no join, no UDF.
- ``funnel``: ordered-step conversion. The scale path is a SINGLE
  fold: each conversation's (turn_idx, role) events are collected
  once, sorted, and a native ``aggregate`` HOF advances a step
  pointer over them in order — one hash exchange total, O(turns·K)
  work, no K-level self-join (the textbook SQL formulation joins the
  table back once per step; at 10^12 turns that is K shuffles of the
  full table). The DuckDB oracle deliberately USES that independent
  K-level min-chain formulation, so the comparison checks semantics,
  not a restatement of the same fold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def role_transitions(transcripts: DataFrame) -> DataFrame:
    """Global first-order Markov transition matrix of the role
    sequence: one row per observed (role, next_role) pair with the
    transition count ``n_trans``, the total transitions leaving
    ``role`` (``n_from``), and the row-stochastic probability ``p`` =
    n_trans / n_from. Counts are integer-exact and p is an exact
    ratio of them, so the output is bit-stable under any partitioning.

    The last turn of each conversation has no successor and is
    excluded (it is a row-count fact, not a transition); NULL roles
    are excluded on either side — a NULL state would silently absorb
    probability mass.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (transcripts
             .select("conv_id", "turn_idx", "role")
             .withColumn("next_role", F.lead("role").over(w))
             .where(F.col("role").isNotNull()
                    & F.col("next_role").isNotNull()))
    counts = pairs.groupBy("role", "next_role").agg(
        F.count(F.lit(1)).alias("n_trans"))
    w_from = Window.partitionBy("role")
    return counts.select(
        "role", "next_role", "n_trans",
        F.sum("n_trans").over(w_from).alias("n_from"),
        (F.col("n_trans") / F.sum("n_trans").over(w_from)).alias("p"))


def funnel(transcripts: DataFrame, steps: list[str]) -> DataFrame:
    """Ordered-step funnel per conversation: the earliest turn at
    which each step's role occurs STRICTLY AFTER the previous step's
    matched turn (the classic first-occurrence conversion chain).
    Returns one row per conversation: ``depth`` (how many steps
    completed, 0..K) and ``step_1..step_K`` (the matched turn_idx,
    NULL once the chain breaks).

    Single-pass: collect each conversation's (turn_idx, role) pairs,
    sort (turn_idx leads the struct, so struct ordering IS turn
    order; turn_idx is unique within a conversation by construction),
    and fold left with a (depth, matched-turns) accumulator — each
    event either advances the pointer to the next wanted role or is
    skipped. Exactly ONE hash exchange (the collect_list groupBy);
    the fold is per-row native codegen, no UDF, no self-join. Repeated
    roles match greedily at first opportunity, which is the standard
    funnel semantics and what the K-level min-chain oracle computes.
    """
    k = len(steps)
    if k < 2:
        raise ValueError(f"funnel needs >= 2 steps, got {k}")
    if any(s is None for s in steps):
        raise ValueError("funnel steps must be non-null role values")
    if len(set(steps)) != k:
        # repeated step values are expressible but ambiguous to read
        # back (step i and step j match the same role); refuse loudly
        raise ValueError(f"funnel steps must be distinct, got {steps}")
    steps_arr = "array(" + ", ".join(
        "'" + s.replace("'", "\\'") + "'" for s in steps) + ")"
    fold = f"""
      aggregate(
        array_sort(collect_list(struct(turn_idx, role))),
        struct(0 AS depth,
               cast(array_repeat(null, {k}) AS array<long>) AS turns),
        (acc, x) -> IF(acc.depth < {k}
                       AND x.role = element_at({steps_arr}, acc.depth + 1),
                       struct(acc.depth + 1 AS depth,
                              transform(acc.turns,
                                        (v, i) -> IF(i = acc.depth,
                                                     cast(x.turn_idx AS long),
                                                     v)) AS turns),
                       acc))
    """
    agg = (transcripts
           .select("conv_id", "turn_idx", "role")
           .where(F.col("role").isNotNull())
           .groupBy("conv_id")
           .agg(F.expr(fold).alias("__f")))
    return agg.select(
        "conv_id",
        F.col("__f.depth").alias("depth"),
        *[F.col("__f.turns").getItem(i).alias(f"step_{i + 1}")
          for i in range(k)])

def turn_self_similarity(transcripts: DataFrame, threshold: float = 0.8,
                         max_len: int = 200) -> DataFrame:
    """Agent-loop detection: per-conversation edit-distance
    self-similarity of consecutive turns. An agent stuck in a loop
    re-emits near-identical turns; the cheap, embedding-free signal is
    the normalized Levenshtein similarity of each turn to its
    predecessor — ``sim = 1 − lev(prev, cur) / max(len)`` — and the
    longest run of consecutive near-duplicate pairs.

    Output: one row per conversation (every conversation keeps a row,
    including single-turn ones — the doc_curate precedent):
    ``(conv_id, n_turns, n_pairs, n_loop_pairs, loop_frac,
    max_loop_run)`` where a pair is a "loop pair" iff sim ≥ threshold.
    sim is ONE correctly-rounded IEEE division of two exact integers
    plus one subtraction, so the threshold compare is bit-identical in
    any engine — no grid snap needed. Both-empty pairs define sim=1.0
    (identical), not NULL.

    Scale shape: texts are capped to ``max_len`` chars BEFORE the
    distance — levenshtein is O(len_a · len_b) per pair JVM-side, and
    one pathological 1 MB turn would otherwise own the stage (the
    winnowing whale-token precedent); the cap is part of the operator
    contract, restated in the oracle. Everything else is windows +
    aggregates all partitioned by conv_id (or supersets of it), so the
    whole operator — lag, run segmentation (gaps-and-islands:
    row_number minus per-flag row_number), run counts, per-conv
    summary — compiles to ONE hash exchange, no join, no UDF. NULL
    text is treated as '' (turns must not vanish from pairing).
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError(f"threshold must be in (0, 1], got {threshold}")
    if max_len < 1:
        raise ValueError(f"max_len must be >= 1, got {max_len}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cap = F.substring(F.coalesce(F.col("text"), F.lit("")), 1, max_len)
    t = transcripts.select("conv_id", "turn_idx", cap.alias("__cur"))
    t = t.withColumn("__prev", F.lag("__cur").over(w))
    mx = F.greatest(F.length("__prev"), F.length("__cur"))
    sim = F.when(F.col("__prev").isNull(), F.lit(None)).otherwise(
        F.when(mx == 0, F.lit(1.0)).otherwise(
            F.lit(1.0) - F.levenshtein("__prev", "__cur") / mx))
    t = t.withColumn(
        "__loop", F.when(sim.isNull(), F.lit(None))
                   .otherwise(sim >= F.lit(float(threshold))))
    # gaps-and-islands on the loop flag; the first turn's NULL flag
    # forms its own run, so single-turn conversations keep their row
    rn = F.row_number().over(w)
    rnf = F.row_number().over(
        Window.partitionBy("conv_id", "__loop").orderBy("turn_idx"))
    t = t.withColumn("__grp", rn - rnf)
    runs = (t.groupBy("conv_id", "__loop", "__grp")
            .agg(F.count(F.lit(1)).alias("__run")))
    flag = F.col("__loop")
    out = runs.groupBy("conv_id").agg(
        F.sum("__run").cast("long").alias("n_turns"),
        F.coalesce(F.sum(F.when(flag.isNotNull(), F.col("__run"))),
                   F.lit(0)).cast("long").alias("n_pairs"),
        F.coalesce(F.sum(F.when(flag, F.col("__run"))), F.lit(0))
        .cast("long").alias("n_loop_pairs"),
        F.coalesce(F.max(F.when(flag, F.col("__run"))), F.lit(0))
        .cast("long").alias("max_loop_run"))
    return out.select(
        "conv_id", "n_turns", "n_pairs", "n_loop_pairs",
        F.expr("try_divide(cast(n_loop_pairs AS double), "
               "cast(n_pairs AS double))").alias("loop_frac"),
        "max_loop_run")

def budget_crossing(transcripts: DataFrame, budget: float,
                    cost_col=None, tokenizer: str = "ws") -> DataFrame:
    """Context-budget overflow detection: per conversation, the first
    turn at which the RUNNING token total exceeds ``budget`` — where
    an agent's context window would overflow, a serving bill would
    trip an alert, or a packing pipeline must split (doc_pack's
    greedy packer is the corpus-side twin; this is the online,
    per-conversation view).

    ``cost_col`` defaults to the whitespace token count of ``text``
    (token_stats convention); pass any per-turn cost expression
    (chars, estimated BPE tokens, dollars). Output: one row per
    conversation — ``n_turns``, ``total_cost``, ``crossed`` (did it
    ever exceed), ``cross_turn_idx`` (first overflowing turn, NULL if
    never), ``cost_at_cross`` (running total INCLUDING that turn) —
    computed as one cumulative-sum window + one filtered-min
    aggregate, so
    a 10^4-turn whale conversation costs one pass, not a per-budget
    rescan. ONE hash exchange on conv_id.

    Cost semantics: NULL text counts 0 (a missing turn body must not
    NULL-poison the running sum and hide an overflow). The crossing
    compare is strict >; budgets are doubles, running sums of integer
    token counts are exact integers in double, so the compare is
    engine-stable without a grid.
    """
    if budget <= 0:
        raise ValueError(f"budget must be > 0, got {budget}")
    if cost_col is None:
        # tokenizer seam (r5): 'ws' keeps the r4 whitespace count
        # verbatim; 'toy_bpe' counts frozen-vocab subword tokens —
        # the unit real context budgets are denominated in
        from cesium_spark.functions.tokenizer import token_count
        cost_col = token_count("text", tokenizer)
    w = (Window.partitionBy("conv_id").orderBy("turn_idx")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    t = (transcripts
         .withColumn("__cum", F.sum(cost_col.cast("double")).over(w)))
    over = F.col("__cum") > F.lit(float(budget))
    return (t.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.max("__cum").alias("total_cost"),
        F.max(over).alias("crossed"),
        F.min(F.when(over, F.col("turn_idx"))).cast("int")
        .alias("cross_turn_idx"),
        # costs are non-negative by contract, so the running sum is
        # non-decreasing and the first crossing's total IS the min
        # over crossing rows — an order-free aggregate (no min_by tie
        # semantics to replay)
        F.min(F.when(over, F.col("__cum"))).alias("cost_at_cross")))

def burst_intervals(series: DataFrame, gap_thresh_s: float,
                    min_run: int = 2) -> DataFrame:
    """Burst extraction over a conversation's cadence: maximal runs of
    consecutive inter-turn gaps ≤ ``gap_thresh_s`` with at least
    ``min_run`` such pairs — the "rapid-fire exchange" segments
    (retry storms, tool-call loops, human flurries) that cadence
    MOMENTS blur away: a conversation can have unremarkable mean gap
    yet contain a 50-turn burst. One output row per burst:
    ``(conv_id, start_turn_idx, end_turn_idx, n_turns, t_start,
    t_end, duration_s)`` where n_turns counts turns (pairs + 1).

    Same gaps-and-islands machinery as the loop detector
    (row_number minus per-flag row_number on the hot-pair flag), and
    the same determinism argument: gaps are exact double differences
    and the threshold compare is a single exact comparison — no grid,
    no tie-break needed; island grouping is integer arithmetic.

    Plan: lag window + islands windows + one aggregate, all
    partitioned by conv_id → ONE hash exchange, no join, no UDF.
    Bursts are a filter over island aggregates, so output is
    burst-count-sized, not turn-sized.
    """
    if gap_thresh_s <= 0:
        raise ValueError(
            f"gap_thresh_s must be > 0, got {gap_thresh_s}")
    if min_run < 1:
        raise ValueError(f"min_run must be >= 1, got {min_run}")
    w = Window.partitionBy("conv_id").orderBy("t", "turn_idx")
    s = (series
         .where(F.col("t").isNotNull())
         .withColumn("__pt", F.lag("t").over(w))
         .withColumn("__pi", F.lag("turn_idx").over(w)))
    hot = F.when(F.col("__pt").isNull(), F.lit(None)).otherwise(
        (F.col("t") - F.col("__pt")) <= F.lit(float(gap_thresh_s)))
    s = s.withColumn("__hot", hot)
    rn = F.row_number().over(w)
    rnf = F.row_number().over(
        Window.partitionBy("conv_id", "__hot").orderBy("t", "turn_idx"))
    s = s.withColumn("__grp", rn - rnf)
    bursts = (s.where(F.col("__hot"))
              .groupBy("conv_id", "__grp")
              .agg(F.min("__pi").cast("int").alias("start_turn_idx"),
                   F.max("turn_idx").cast("int").alias("end_turn_idx"),
                   (F.count(F.lit(1)) + 1).cast("long").alias("n_turns"),
                   F.min("__pt").alias("t_start"),
                   F.max("t").alias("t_end")))
    return (bursts.where(F.col("n_turns") >= min_run + 1)
            .select("conv_id", "start_turn_idx", "end_turn_idx",
                    "n_turns", "t_start", "t_end",
                    (F.col("t_end") - F.col("t_start"))
                    .alias("duration_s")))


def transition_entropy(transcripts: DataFrame) -> DataFrame:
    """Information profile of the role chain — ONE corpus row
    quantifying how predictable the dialogue grammar is:

        h_next     = H(next)        marginal entropy of the next role
        h_cond     = H(next|cur)    conditional (Markov) entropy
        mi         = I(cur; next) = h_next − h_cond   — how many nats
                     the previous role buys you about the next one
        perplexity = exp(h_cond)    effective branching factor

    plus n_transitions / n_states.  A strict monologue corpus gives
    h_cond = 0 (perplexity 1); perfect two-role alternation gives
    h_next = ln 2 but h_cond = 0 and mi = ln 2 — the signature the
    transition-matrix rows show only implicitly.

    Exactness: every probability is a ratio of exact int64 counts
    from ``role_transitions``-style aggregation (lead window per
    conversation — transitions never cross a conversation boundary —
    then ONE (role, next_role) hash aggregate).  The two entropy sums
    fold over the r×r cell table in ORDERED (role, next_role) /
    (next_role) sequence — max of a nondecreasing running sum of the
    non-negative terms (cnt/T)·ln(cnt_c/cnt), never a parallel float
    sum — and mi is one subtraction of the two folded doubles.
    Everything past the transition aggregate runs on cell-cardinality
    rows (the chi2_independence contract): the global-window folds
    are bounded by r², not the corpus.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (transcripts
             .select("conv_id", "turn_idx", "role")
             .withColumn("next_role", F.lead("role").over(w))
             .where(F.col("role").isNotNull()
                    & F.col("next_role").isNotNull()))
    cells = pairs.groupBy("role", "next_role").agg(
        F.count(F.lit(1)).alias("n"))
    w_all = Window.partitionBy()
    w_from = Window.partitionBy("role")
    w_next = Window.partitionBy("next_role")
    enriched = cells.select(
        "role", "next_role", "n",
        F.sum("n").over(w_all).alias("t"),
        F.sum("n").over(w_from).alias("n_from"),
        F.sum("n").over(w_next).alias("n_next"))
    nd = F.col("n").cast("double")
    td = F.col("t").cast("double")
    cond_term = (nd / td) * F.log(F.col("n_from").cast("double") / nd)
    # marginal term counted once per next_role: only on its first
    # (role, next_role) cell in order
    first_of_next = F.row_number().over(
        Window.partitionBy("next_role").orderBy("role")) == 1
    marg_term = F.when(
        first_of_next,
        (F.col("n_next").cast("double") / td)
        * F.log(td / F.col("n_next").cast("double"))).otherwise(F.lit(0.0))
    w_ord = w_all.orderBy("role", "next_role")
    folded = enriched.select(
        "t",
        F.sum(cond_term).over(w_ord).alias("__cum_cond"),
        F.sum(marg_term).over(w_ord).alias("__cum_marg"),
        F.count(F.lit(1)).over(w_all).alias("__n_cells"))
    g = folded.groupBy().agg(
        F.max("t").alias("n_transitions"),
        F.max("__cum_cond").alias("h_cond"),
        F.max("__cum_marg").alias("h_next"),
        F.max("__n_cells").alias("__n_cells"))
    states = (pairs.select(F.col("role").alias("s"))
              .unionAll(pairs.select(F.col("next_role").alias("s")))
              .agg(F.countDistinct("s").alias("n_states")))
    out = g.crossJoin(F.broadcast(states))
    return out.select(
        F.col("n_transitions").cast("long").alias("n_transitions"),
        "n_states",
        "h_next", "h_cond",
        (F.col("h_next") - F.col("h_cond")).alias("mi"),
        F.exp(F.col("h_cond")).alias("perplexity"))


def circadian_stats(transcripts: DataFrame) -> DataFrame:
    """Time-of-day activity profile per conversation — the circadian
    concentration signal the cadence family doesn't cover: a human
    talks in a few waking hours (low hour-entropy, high top-hour
    share), a round-the-clock bot flattens the histogram (entropy →
    ln 24).  One row per conversation:

        n_turns, n_hours_active        exact integer counts
        top_hour, top_hour_share       deterministic majority hour
                                       (count DESC, hour ASC — the
                                       dialogue_stats tie rule)
        hour_entropy                   Shannon entropy (nats) of the
                                       24-bucket hour histogram
        entropy_ratio                  hour_entropy / ln(24) ∈ [0,1]

    Exactness: hour buckets are integer ``hour(ts)`` counts from ONE
    (conv, hour) hash aggregate; the entropy folds over a
    conversation's ≤24 hour cells in ORDERED hour sequence (max of a
    nondecreasing running sum of (c/n)·ln(n/c) ≥ 0 terms — the
    transition_entropy contract); ln(24) is the same Python float
    literal on both sides; share and ratio are terminal divisions.
    Single-turn conversations give entropy exactly 0.

    Plan: one (conv, hour) aggregate (map-side collapse — a
    million-turn conversation reaches the exchange as ≤24 rows), one
    conv-keyed window fold over ≤24-row groups, one final aggregate
    → two shrinking exchanges, no UDF, no join.
    """
    import math
    cells = (transcripts
             .where(F.col("ts").isNotNull())
             .select("conv_id", F.hour("ts").alias("hh"))
             .groupBy("conv_id", "hh")
             .agg(F.count(F.lit(1)).alias("c")))
    w_all = Window.partitionBy("conv_id")
    w_ord = w_all.orderBy("hh")
    nd = F.sum("c").over(w_all)
    term = (F.col("c").cast("double") / nd.cast("double")) \
        * F.log(nd.cast("double") / F.col("c").cast("double"))
    enriched = cells.select(
        "conv_id", "hh", "c",
        nd.alias("__n"),
        F.sum(term).over(w_ord).alias("__cum_h"))
    g = enriched.groupBy("conv_id").agg(
        F.max("__n").alias("n_turns"),
        F.count(F.lit(1)).alias("n_hours_active"),
        F.expr("min_by(hh, struct(-c, hh))").alias("top_hour"),
        F.max("c").alias("__top_c"),
        F.max("__cum_h").alias("hour_entropy"))
    share = F.col("__top_c").cast("double") / F.col("n_turns").cast("double")
    ln24 = math.log(24.0)
    return g.select(
        "conv_id",
        F.col("n_turns").cast("long").alias("n_turns"),
        F.col("n_hours_active").cast("long").alias("n_hours_active"),
        F.col("top_hour").cast("int").alias("top_hour"),
        share.alias("top_hour_share"),
        "hour_entropy",
        (F.col("hour_entropy") / F.lit(ln24)).alias("entropy_ratio"))


def role_ngrams(transcripts: DataFrame, n: int = 3,
                top_k: int = 20) -> DataFrame:
    """Top-k most frequent role n-grams across the corpus — the
    sequence-pattern mining view of the dialogue grammar:
    ``role_transitions`` gives the order-1 matrix,
    ``transition_entropy`` its information content, this surfaces the
    actual MOTIFS ("view>view>purchase") with exact support counts
    and corpus share.

    Entirely integer: n-grams form per conversation from lead()
    windows (never crossing a conversation boundary — a gram needs
    all n turns in the SAME conversation), support is one hash
    aggregate, the top-k cut orders by (count DESC, gram ASC) —
    pure integers and strings, no float anywhere except the terminal
    share division, so the cut cannot flip between engines.

    Plan: one ordered window pass (n−1 leads) + one gram aggregate
    (map-side collapse: the shuffle carries distinct grams per
    partition, bounded by |roles|ⁿ) + a global top-k (TakeOrdered —
    no full sort materialization); no UDF, no join.
    """
    if not isinstance(n, int) or not (2 <= n <= 6):
        raise ValueError(f"role_ngrams: n must be an int in [2, 6], "
                         f"got {n!r}")
    if top_k < 1:
        raise ValueError(f"role_ngrams: top_k must be >= 1, got {top_k}")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cols = [F.col("role")] + [F.lead("role", i).over(w).alias(f"__r{i}")
                              for i in range(1, n)]
    base = transcripts.select("conv_id", "turn_idx", "role")
    for i in range(1, n):
        base = base.withColumn(f"__r{i}", F.lead("role", i).over(w))
    cond = F.col("role").isNotNull()
    for i in range(1, n):
        cond = cond & F.col(f"__r{i}").isNotNull()
    gram = F.concat_ws(">", F.col("role"),
                       *[F.col(f"__r{i}") for i in range(1, n)])
    grams = (base.where(cond)
             .select(gram.alias("gram"))
             .groupBy("gram")
             .agg(F.count(F.lit(1)).alias("support")))
    w_all = Window.partitionBy()
    out = grams.select(
        "gram", "support",
        F.sum("support").over(w_all).alias("__total"))
    return (out
            .orderBy(F.desc("support"), F.col("gram"))
            .limit(int(top_k))
            .select("gram",
                    F.col("support").cast("long").alias("support"),
                    (F.col("support").cast("double")
                     / F.col("__total").cast("double")).alias("share")))


def cohen_kappa_adjacent(transcripts: DataFrame) -> DataFrame:
    """Cohen's κ between each turn's role and the NEXT turn's role,
    per conversation (Cohen 1960 applied to the transition grain) —
    the chance-corrected stickiness score that transition_entropy's
    information profile does not give directly: raw consecutive-same-
    role agreement p_o is inflated whenever one role dominates, and κ
    subtracts exactly that marginal-product baseline:

        κ = (p_o − p_e)/(1 − p_e)
          = (n·A − E) / (n² − E),   E = Σ_k r_k·c_k

    with n = adjacent pairs, A = pairs with equal roles, r_k/c_k the
    first-/second-position marginal counts of role k.  The right-hand
    form is the exactness contract: numerator and denominator are
    EXACT int64 (n² and E wrap only past ~3·10⁹ pairs per
    conversation; ANSI raises, not wraps) and κ is ONE terminal
    division.  κ = 0 means "no stickier than its own role mix
    predicts"; κ < 0 means anti-persistent turn-taking (user/agent
    alternation — the common transcript case, pinned in pytest).

    Degenerate: a single distinct role makes p_e = 1 (denominator
    exactly 0) — κ is undefined, NULL, never the fake certainty of 1
    (perfect agreement with no discriminating signal is vacuous).
    n = 0 (one-turn conversations) likewise NULL.

    Plan: one lag window + three conv-keyed aggregates (pair cells →
    two marginal folds, full-outer-joined per role) — every exchange
    on conv_id (or conv+role, same key family), no UDF.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    pairs = (transcripts
             .select("conv_id", "turn_idx",
                     F.col("role").alias("__r1"),
                     F.lead("role").over(w).alias("__r2"))
             .where(F.col("__r2").isNotNull()
                    & F.col("__r1").isNotNull()))
    tot = pairs.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("__r1") == F.col("__r2"), 1)
              .otherwise(0)).alias("n_agree"))
    rows = pairs.groupBy("conv_id", F.col("__r1").alias("__role")) \
        .agg(F.count(F.lit(1)).alias("__rk"))
    cols = pairs.groupBy("conv_id", F.col("__r2").alias("__role")) \
        .agg(F.count(F.lit(1)).alias("__ck"))
    e = (rows.join(cols, ["conv_id", "__role"], "full_outer")
         .groupBy("conv_id")
         .agg(F.sum(F.coalesce(F.col("__rk"), F.lit(0))
                    * F.coalesce(F.col("__ck"), F.lit(0)))
              .alias("e_sum")))
    out = tot.join(e, "conv_id")
    n = F.col("n_pairs")
    den = n * n - F.col("e_sum")
    kappa = F.when((n > 0) & (den != 0),
                   (n * F.col("n_agree") - F.col("e_sum"))
                   .cast("double") / den.cast("double"))
    return out.select(
        "conv_id",
        n.cast("long").alias("n_pairs"),
        F.col("n_agree").cast("long").alias("n_agree"),
        F.col("e_sum").cast("long").alias("e_sum"),
        kappa.alias("kappa"))


LZ_SCHEMA = "conv_id string, n long, c_phrases long"


def lz76_complexity(transcripts: DataFrame) -> DataFrame:
    """Lempel–Ziv 1976 complexity of the role sequence per
    conversation — the SEQUENCE-compressibility member of the
    complexity family: permutation/sample entropy hear numeric
    series, ``transition_entropy`` the one-step Markov structure,
    and LZ76 counts the phrases in the exhaustive self-referential
    parsing of the whole role STRING — long-range repetition
    (scripted agent loops spanning many turns) collapses C where
    per-step entropies stay blind.  aⁿ parses to 2 phrases, (ab)ⁿ
    to 3, iid text to ~n/log n.

    Parsing rule (Kaspar & Schuster 1987 operationalization, stated
    exactly because variants abound): a phrase starting at i extends
    while the candidate s[i..i+L−1] occurs in s[1..i+L−2] (overlap
    allowed — the window ends one char before the candidate does);
    the first NOVEL length closes the phrase including its novel
    char; a suffix that never goes novel is one final phrase.

    Each role maps to its first letter ('signup'→s … — distinct for
    the five transcript roles; collisions raise loudly rather than
    silently merging states).  The kernel is inherently sequential →
    per-conversation applyInPandas (the mann_kendall contract); the
    oracle replays the SAME rule as a DuckDB recursive CTE stepping
    (pos, count) with a list_filter/strpos novel-length probe —
    sequential state is recursion, not a window.  ``c_norm`` =
    C·ln(n)/n is the usual size normalization (one fixed tree;
    n = 1 → NULL — a single turn has no sequence).

    Plan: ONE hash exchange into the kernel; the per-row work is
    O(C·n) string scans on a vocabulary-sized alphabet.
    """
    import numpy as np
    import pandas as pd

    def _kernel(pdf):
        pdf = pdf.sort_values("turn_idx", kind="stable")
        chars = []
        seen = {}
        for r in pdf["role"]:
            ch = r[0]
            if seen.setdefault(ch, r) != r:
                raise ValueError(
                    f"lz76_complexity: first-letter collision "
                    f"{seen[ch]!r} vs {r!r} — supply a custom mapping")
            chars.append(ch)
        s = "".join(chars)
        n = len(s)
        i, c = 0, 0
        while i < n:
            L = 1
            while i + L <= n and s[i:i + L] in s[:i + L - 1]:
                L += 1
            i += min(L, n - i)
            c += 1
        return pd.DataFrame({
            "conv_id": [pdf["conv_id"].iloc[0]],
            "n": [n], "c_phrases": [c]})

    base = (transcripts
            .where(F.col("role").isNotNull())
            .select("conv_id", "turn_idx", "role")
            .groupBy("conv_id")
            .applyInPandas(_kernel, LZ_SCHEMA))
    ok = F.col("n") >= 2
    c_norm = (F.col("c_phrases").cast("double")
              * F.log(F.col("n").cast("double"))
              / F.col("n").cast("double"))
    return base.select(
        "conv_id", "n", "c_phrases",
        F.when(ok, c_norm).alias("c_norm"))
