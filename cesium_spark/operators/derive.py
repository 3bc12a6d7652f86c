"""Transcripts → long-form series (the reference's TimeSeries t/m/e
model re-expressed relationally — cesium/time_series.py::TimeSeries †,
SURVEY.md §1.2).

One TimeSeries ≙ one group of rows keyed by ``conv_id``, ordered by
``(turn_idx, ts)``; channels (cesium multichannel †) are the
text-derived signals named in BASELINE.json north_star:

- ``latency``   — Δts between consecutive turns (seconds); defined from
  turn 1 onward (n-1 points, exactly ``np.diff`` semantics);
- ``tokens``    — whitespace-token count of ``text`` per turn;
- ``tool_rate`` — tool-call indicator (``tool IS NOT NULL``) per turn.

All columns are built from native Spark expressions (one window pass,
one shuffle on ``conv_id``); ``e`` is the cesium DEFAULT_ERROR_VALUE
constant 1e-4 (oracle parity, SURVEY.md §1.2). The unpivot uses
``stack`` — no UDFs, fully codegen'd.

Scale note: the single shuffle here is the window over ``conv_id``. On
a bucketed/sorted Iceberg table (bucket(conv_id), sort turn_idx) the
exchange is elided entirely; on raw parquet it is one hash exchange of
the narrow projected columns only (Catalyst prunes ``role`` unless
requested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_ERROR_VALUE = 1e-4
CHANNELS = ("latency", "tokens", "tool_rate")


def derive_series(transcripts: DataFrame,
                  channels: tuple[str, ...] = CHANNELS) -> DataFrame:
    """Returns series(conv_id, channel, turn_idx, ts, t, y, e).

    ``t`` = seconds since conversation start (double); rows ordered
    within groups by ``turn_idx`` (ties broken by ts — 'stable turn
    ordering' per BASELINE.json input_hint).
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx", "ts")
    sec = F.col("ts").cast("double")  # epoch seconds, µs precision kept
    base = (
        transcripts
        # normalize TIMESTAMP_NTZ (e.g. plain parquet) to session-TZ
        # timestamp; sessions pin UTC so NTZ is interpreted as UTC
        .withColumn("ts", F.col("ts").cast("timestamp"))
        .select("conv_id", "turn_idx", "ts", "text", "tool")
        .withColumn("t", sec - F.min(sec).over(Window.partitionBy("conv_id")))
        .withColumn("latency", sec - F.lag(sec).over(w))
        .withColumn("tokens", F.size(F.split(F.trim(F.col("text")), r"\s+"))
                    .cast("double"))
        .withColumn("tool_rate", F.col("tool").isNotNull().cast("double"))
    )
    stack_args = ", ".join(f"'{c}', {c}" for c in channels)
    out = (
        base.selectExpr(
            "conv_id", "turn_idx", "ts", "t",
            f"stack({len(channels)}, {stack_args}) as (channel, y)")
        .where(F.col("y").isNotNull())  # drops latency's first-turn null
        .withColumn("e", F.lit(DEFAULT_ERROR_VALUE))
        .select("conv_id", "channel", "turn_idx", "ts", "t", "y", "e")
    )
    return out


def dialogue_stats(transcripts: DataFrame) -> DataFrame:
    """Per-conversation turn-taking structure over the canonical
    transcript shape (conv_id, turn_idx, role, text, tool, ts) — the
    dialogue-level profile the per-channel series can't see: does the
    conversation alternate or monologue, who dominates, how much of
    it is tool traffic.  One row per conversation:

        n_turns, n_roles, n_switches   — exact integer counts
        longest_run                    — longest same-role streak
        switch_rate                    — n_switches/(n_turns−1),
                                         NULL for 1-turn convs
        tool_turns                     — turns with a non-null tool
        tok_total                      — whitespace tokens, summed
        top_role, top_role_turns       — majority role, deterministic
                                         tie rule (turns DESC, role
                                         ASC — the min_by struct
                                         trick, engine-identical)

    Everything is integers plus ONE terminal division; no float sum
    exists anywhere, so the SQL replay is exact by construction.

    Plan: runs are the classic gaps-and-islands window pair (switch
    flag via lag, run id via ordered cumulative sum, run length via a
    count window over (conv, run)) — all these windows AND the final
    aggregate key on conv_id or supersets of it, so hashpartitioning
    (conv_id) satisfies every distribution: ONE exchange total,
    no join, no UDF (plan-asserted in pytest).
    """
    w_ord = Window.partitionBy("conv_id").orderBy("turn_idx")
    switch = F.when(
        F.lag("role").over(w_ord).isNotNull()
        & (F.col("role") != F.lag("role").over(w_ord)), F.lit(1)) \
        .otherwise(F.lit(0))
    base = transcripts.select(
        "conv_id", "turn_idx", "role", "tool",
        F.size(F.split(F.trim(F.col("text")), r"\s+")).alias("__tok"),
        switch.alias("__sw"))
    base = base.withColumn(
        "__run", F.sum("__sw").over(
            w_ord.rowsBetween(Window.unboundedPreceding, 0)))
    base = base.withColumn(
        "__run_len",
        F.count(F.lit(1)).over(Window.partitionBy("conv_id", "__run")))
    base = base.withColumn(
        "__role_cnt",
        F.count(F.lit(1)).over(Window.partitionBy("conv_id", "role")))
    g = base.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.countDistinct("role").alias("n_roles"),
        F.sum("__sw").alias("n_switches"),
        F.max("__run_len").alias("longest_run"),
        F.count("tool").alias("tool_turns"),
        F.sum("__tok").alias("tok_total"),
        F.expr("min_by(role, struct(-__role_cnt, role))")
        .alias("top_role"),
        F.max("__role_cnt").alias("top_role_turns"))
    rate = F.when(
        F.col("n_turns") > 1,
        F.col("n_switches").cast("double")
        / (F.col("n_turns") - F.lit(1)).cast("double"))
    return g.select(
        "conv_id", "n_turns", "n_roles", "n_switches", "longest_run",
        rate.alias("switch_rate"), "tool_turns",
        F.col("tok_total").cast("long").alias("tok_total"),
        "top_role", "top_role_turns")


def conversation_endings(transcripts: DataFrame,
                         user_role: str = "user") -> DataFrame:
    """How conversations END — the abandonment/closure profile
    support teams and agent-loop audits read first: one row per
    conversation with

        last_role, last_turn_tokens      what the final turn was
        ends_with_question               trimmed text ends in '?'
        ends_after_tool                  final turn carries a tool
                                         call nobody followed up
        final_gap_s                      integer seconds between the
                                         last two turns (NULL for
                                         1-turn conversations)
        abandoned                        last word was the user's OR
                                         a dangling tool call — the
                                         documented heuristic, not a
                                         ground truth

    Every pick is max_by over the unique turn_idx (deterministic
    under any partitioning); the gap grids to whole seconds (the
    burstiness rule); everything else is string/boolean logic — no
    float anywhere.

    Plan: one ordered window (lag for the gap) + one conv-keyed hash
    aggregate → ONE exchange, no UDF, no join.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    sec = F.col("ts").cast("double")
    base = transcripts.select(
        "conv_id", "turn_idx", "role", "tool",
        F.size(F.split(F.trim(F.coalesce(F.col("text"), F.lit(""))),
                       r"\s+")).alias("__tok"),
        F.trim(F.coalesce(F.col("text"), F.lit(""))).alias("__txt"),
        F.round(sec - F.lag(sec).over(w), 0).cast("long").alias("__gap"))
    g = base.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.expr("max_by(role, turn_idx)").alias("last_role"),
        F.expr("max_by(__tok, turn_idx)").alias("last_turn_tokens"),
        F.expr("max_by(__txt, turn_idx)").alias("__last_txt"),
        F.expr("max_by(tool, turn_idx)").alias("__last_tool"),
        F.expr("max_by(__gap, turn_idx)").alias("final_gap_s"))
    ends_q = F.col("__last_txt").endswith("?")
    after_tool = F.col("__last_tool").isNotNull()
    return g.select(
        "conv_id", "n_turns", "last_role",
        F.col("last_turn_tokens").cast("long").alias("last_turn_tokens"),
        ends_q.alias("ends_with_question"),
        after_tool.alias("ends_after_tool"),
        F.col("final_gap_s").cast("long").alias("final_gap_s"),
        ((F.col("last_role") == F.lit(user_role)) | after_tool)
        .alias("abandoned"))
