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

from pyspark.sql import DataFrame
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
