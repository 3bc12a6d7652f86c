"""As-of join: for each left row, the most recent right row at or
before (backward) / the earliest at or after (forward) its timestamp,
within the same key group (SURVEY.md §2.11 "as-of / range join" — the
general two-table form; `gapfill` is the grid-specialized sibling).

Spark has no ASOF JOIN operator (DuckDB/Pandas do), and the naive
formulation — range join + per-left-row max — is a cartesian-within-key
blowup that Catalyst plans as BroadcastNestedLoopJoin. This is the
**union trick** instead, the scale-correct plan:

1. tag both sides, union on the shared (keys, ts) spine;
2. one window over (keys) ordered by (ts, side) carries the last
   (backward) / next (forward) right-side payload onto every row;
3. keep only left rows.

Catalyst view: ONE hash exchange on the join keys + one sort — the same
cost as a sort-merge join, with **no range-explosion** and no skew
amplification (a key's cost is |left|+|right|, never |left|x|right|).
At 10^12 rows both inputs bucket/sort by the key and the exchange is
elided entirely. Tie semantics: a right row at exactly the left row's
timestamp MATCHES (>= / <=), like DuckDB's ASOF inequality.

`tolerance` (seconds) nulls out matches farther than the bound —
pandas.merge_asof semantics — without a second pass: the matched right
timestamp rides along in the same window.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_MATCH_TS = "__asof_match_ts"
_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    ts: str = "ts",
    values: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance: float | None = None,
    matched_ts_col: str | None = None,
) -> DataFrame:
    """Left as-of join.

    on        : equality key columns present in BOTH frames.
    ts        : timestamp column name (timestamp or numeric), both frames.
    values    : right columns to carry (default: all non-key, non-ts).
                Must not collide with left column names.
    direction : 'backward' (right.ts <= left.ts, most recent wins) or
                'forward'  (right.ts >= left.ts, earliest wins).
    tolerance : max |left.ts - right.ts| in seconds; farther matches
                become NULL (row is kept — left join semantics).
    matched_ts_col : if set, also emit the matched right timestamp
                under this name.

    Precondition (documented, not enforced): right has at most one row
    per (on..., ts) — pre-aggregate otherwise, or the carried payload
    is last-writer-wins in (ts) order which is non-deterministic.
    """
    on = list(on)
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got "
                         f"{direction!r}")
    if values is None:
        values = [c for c in right.columns if c not in on and c != ts]
    values = list(values)
    collide = set(values) & set(left.columns)
    if collide:
        raise ValueError(f"right value columns collide with left: "
                         f"{sorted(collide)}; rename or pass `values`")
    if not values:
        raise ValueError("no right value columns to carry")

    # side tag orders ties so that >= / <= inclusivity holds after the
    # sort: backward wants the right row FIRST at equal ts (so the
    # window's last-carry sees it); forward wants it LAST (next-carry).
    l_tag = 1 if direction == "backward" else 0
    r_tag = 1 - l_tag

    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(l_tag).alias(_SIDE),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in values],
        F.lit(None).cast(right.schema[ts].dataType).alias(_MATCH_TS),
    )
    r = right.select(
        *[F.col(c) for c in on],
        F.col(ts),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c)
          for c in left.columns if c not in on and c != ts],
        F.lit(r_tag).alias(_SIDE),
        *[F.col(c).alias(f"__r_{c}") for c in values],
        F.col(ts).alias(_MATCH_TS),
    ).select(*l.columns)  # align column order for unionByName-free union

    u = l.unionByName(r)

    if direction == "backward":
        w = (Window.partitionBy(*on).orderBy(F.col(ts).asc(),
                                             F.col(_SIDE).asc())
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        carry = lambda c: F.last(c, ignorenulls=True).over(w)  # noqa: E731
    else:
        w = (Window.partitionBy(*on).orderBy(F.col(ts).asc(),
                                             F.col(_SIDE).asc())
             .rowsBetween(Window.currentRow, Window.unboundedFollowing))
        carry = lambda c: F.first(c, ignorenulls=True).over(w)  # noqa: E731

    matched = u.select(
        *[F.col(c) for c in left.columns],
        F.col(_SIDE),
        carry(_MATCH_TS).alias(_MATCH_TS),
        *[carry(f"__r_{c}").alias(f"__c_{c}") for c in values],
    ).where(F.col(_SIDE) == l_tag)

    within = F.lit(True)
    if tolerance is not None:
        gap = F.abs(F.col(ts).cast("double")
                    - F.col(_MATCH_TS).cast("double"))
        within = F.col(_MATCH_TS).isNotNull() & (gap <= F.lit(tolerance))

    out_cols = [F.col(c) for c in left.columns]
    out_cols += [F.when(within, F.col(f"__c_{c}")).alias(c) for c in values]
    if matched_ts_col is not None:
        out_cols.append(
            F.when(within, F.col(_MATCH_TS)).alias(matched_ts_col))
    return matched.select(*out_cols)
