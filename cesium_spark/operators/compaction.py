"""Last-write-wins upsert compaction (SURVEY.md §2.9 — ingest-side
operator mandated by the north rule's out-of-order / re-delivered
transcript streams; no reference counterpart: cesium assumes each
series file is already the final version).

A 10^12-turn transcript pipeline receives the same (conv_id, turn_idx)
more than once: retried writers, corrected transcripts, late tool
results. Downstream rollups must see exactly ONE row per logical key —
the latest version — without a full sort of the raw table.

``upsert_latest`` is one hash aggregation: ``max_by(payload_struct,
version_struct)`` per key group. Two properties make this the right
100 TB plan instead of the textbook ``row_number() OVER (PARTITION BY
key ORDER BY version DESC) = 1``:

* **Partial aggregation.** max_by combines map-side, so the shuffle
  carries at most one candidate row per (key × map partition) — under
  heavy re-delivery (hot conversations rewritten many times) the
  exchange shrinks with the duplication factor. The window form
  shuffles EVERY version and then sorts each partition.
* **Post-combine sorts only.** A struct-valued max_by buffer is not
  hash-aggregable, so Spark plans SortAggregate — but its sorts run on
  the ALREADY-COMBINED stream (grouping keys only, ≤1 row per key per
  map partition on the reduce side), whereas the window form sorts the
  full versioned input by (key, version). Plan-asserted in pytest:
  exactly one exchange, `partial_max_by` on the map side.

Determinism: the version key must totally order versions within a key
group. Callers pass ``order_cols`` whose struct comparison
(lexicographic) is tie-free by construction — e.g. ``["version",
"ingest_seq"]`` with a unique ingest sequence last. Spark's ``max_by``
on ties is otherwise pick-any (partitioning-dependent), so
``upsert_latest`` makes the uniquifier mandatory rather than silently
accepting a partial order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def upsert_latest(df: DataFrame, keys: list[str],
                  order_cols: list[str]) -> DataFrame:
    """Keep, per ``keys`` group, the single row with the greatest
    ``order_cols`` struct (lexicographic). Returns the full original
    column set (keys + order cols + payload), one row per key.

    Plan: ONE hash exchange on ``keys`` with map-side partial
    max_by — no window, no UDF; sorts only on the combined stream
    (see module docstring).
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if not order_cols:
        raise ValueError("order_cols must be non-empty (and must "
                         "totally order versions within a key group)")
    overlap = set(keys) & set(order_cols)
    if overlap:
        raise ValueError(f"keys and order_cols overlap: {sorted(overlap)}")
    payload = [c for c in df.columns if c not in keys]
    ver = F.struct(*[F.col(c) for c in order_cols])
    row = (
        df.groupBy(*keys)
        .agg(F.max_by(F.struct(*[F.col(c) for c in payload]), ver)
             .alias("__latest"))
    )
    return row.select(*keys,
                      *[F.col(f"__latest.{c}").alias(c) for c in payload])


def scd2_intervals(df: DataFrame, key: str, state_col: str,
                   ts_col: str = "ts",
                   order_cols: list[str] | None = None) -> DataFrame:
    """Slowly-changing-dimension type-2 history from a change-event
    log: collapse each key's event stream into validity intervals —
    one row per CHANGE of ``state_col`` with ``(key, state,
    valid_from, valid_to, version, is_current)``, half-open
    ``[valid_from, valid_to)``, ``valid_to`` NULL on the open current
    row. The warehouse primitive for as-of dimension joins (the asof
    operator consumes exactly this shape) and the inverse of
    state_agg's time-in-state totals.

    Consecutive duplicate states merge into one interval (a re-emitted
    unchanged status must not fragment history — re-delivered events
    are the norm, see upsert_latest). A NULL state is a real state
    (tracked as its own interval) — dimension systems must represent
    'attribute became unknown', and lag()'s NULL can't be the change
    sentinel anyway: change detection compares via null-safe equality.

    Scale shape: two stacked windows (lag for change detection,
    lead for interval close) + one filter, all partitioned by the key
    — ONE hash exchange, no join, no self-union; ordering within a
    key is (ts, *order_cols) so ties are deterministic when the
    caller supplies a unique tiebreaker (do: event ids; ts alone ties
    under same-timestamp redelivery).
    """
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = Window.partitionBy(key).orderBy(*order)
    changed = (~F.col(state_col).eqNullSafe(F.lag(state_col).over(w))
               | (F.row_number().over(w) == 1))
    pts = (df
           .withColumn("__chg", changed)
           .where(F.col("__chg"))
           .drop("__chg"))
    w2 = Window.partitionBy(key).orderBy(*order)
    return (pts.select(
        F.col(key),
        F.col(state_col).alias("state"),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
        F.row_number().over(w2).cast("int").alias("version"))
        .withColumn("is_current", F.col("valid_to").isNull()))
