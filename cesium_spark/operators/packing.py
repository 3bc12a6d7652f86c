"""Sequence packing: greedy sequential fill of documents into
fixed-capacity context windows — the batch-construction step of an LLM
training pipeline (pack tokenized docs into cap-sized training
sequences; under-filled bins waste step compute).

Semantics (deterministic, restatable as a recurrence): within each
shard, documents are taken in ascending id order; a document joins the
current bin iff fill + len <= cap, else it OPENS a new bin. A document
longer than cap therefore sits alone in its own bin (flagged
``oversize`` — the caller decides truncate vs drop). Bin ids are
0-based per shard.

Scale shape: packing is inherently a sequential recurrence, so it runs
per SHARD (applyInPandas — one hash exchange on the shard key); shards
are the parallelism unit, exactly how a real corpus is packed (per
input file / per source). The per-group kernel is a single O(n) pass.
The recurrence is SQL-restatable (recursive CTE over the doc sequence),
which the driver oracle replays full-value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PACK_SCHEMA = ("shard string, doc_id long, n_tokens long, "
               "bin_id long, bin_fill long, oversize boolean")


def pack_sequences(docs: DataFrame, cap: int,
                   shard_col: str = "shard",
                   id_col: str = "doc_id",
                   len_col: str = "n_tokens") -> DataFrame:
    """Returns (shard, doc_id, n_tokens, bin_id, bin_fill, oversize);
    ``bin_fill`` is the bin's running fill AFTER this doc (the last
    member's row carries the bin total)."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="stable").reset_index(drop=True)
        lens = pdf[len_col].to_numpy()
        bins, fills = [], []
        b, fill = 0, 0
        for ln in lens:
            if fill and fill + ln > cap:
                b += 1
                fill = 0
            fill += int(ln)
            bins.append(b)
            fills.append(fill)
        out = pd.DataFrame({
            "shard": pdf[shard_col].astype(str),
            "doc_id": pdf[id_col].astype("int64"),
            "n_tokens": pdf[len_col].astype("int64"),
            "bin_id": pd.Series(bins, dtype="int64"),
            "bin_fill": pd.Series(fills, dtype="int64"),
            "oversize": pdf[len_col].to_numpy() > cap,
        })
        return out

    return (docs.select(shard_col, id_col, len_col)
            .groupBy(shard_col).applyInPandas(pack, PACK_SCHEMA))
