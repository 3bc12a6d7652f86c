"""Delimited-text series ingest — the engine's front door for the
reference's file-based layout (``cesium/data_management.py::
parse_ts_data`` / ``::parse_headerfile`` †, SURVEY.md §2.1; reference
mount empty at survey time, so the positional semantics below are the
pinned oracle spec).

Positional column semantics (per LINE, so a directory may mix forms):

- 1 column:  ``m``        → t defaults to the in-file sample index
- 2 columns: ``t, m``
- 3 columns: ``t, m, e``
- missing ``e`` defaults to 1e-4 (the engine-wide default error, same
  constant the series-derivation stage uses).

One series per FILE (the reference's layout): ``series_id`` is the file
name stem, ``turn_idx`` the 0-based data-line index. Files are read
with ``wholetext`` + ``posexplode`` so line order — and therefore
``turn_idx`` and the default ``t`` — is CONTRACTUAL, not an accident of
partitioning (csv readers guarantee no intra-file row order). Scale
shape: per-series files parallelize by file count; one task per file,
bounded by the series length — exactly the reference's data model, and
the right unit of work for millions of small series. Giant single-file
inputs belong to the columnar path (TableIO), not here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_ERR = 1e-4


def parse_ts_data(spark: SparkSession, path: str,
                  sep: str = ",") -> DataFrame:
    """Read delimited series files under ``path`` →
    ``(conv_id, channel, turn_idx, ts, t, y, e)`` — the engine series
    shape, directly consumable by rollup_features/gapfill/encode_chunks.
    ``ts`` is derived from ``t`` as epoch seconds (windowed tiers need a
    timestamp; the conv tier ignores it)."""
    lines = (
        spark.read.format("text").option("wholetext", "true").load(path)
        .select(
            F.regexp_extract(F.input_file_name(),
                             r"([^/]+?)(\.[^./]*)?$", 1).alias("conv_id"),
            F.posexplode(F.split(F.col("value"), r"\r?\n"))
            .alias("line_idx", "line"))
        .where(F.trim(F.col("line")) != ""))
    # 0-based data-line index (blank/trailing lines excluded)
    w = Window.partitionBy("conv_id").orderBy("line_idx")
    cols = F.split(F.col("line"), sep)
    n = F.size(cols)
    idx = (F.row_number().over(w) - 1).cast("int")
    t = F.when(n == 1, idx.cast("double")) \
        .otherwise(F.trim(cols[0]).cast("double"))
    y = F.when(n == 1, F.trim(cols[0]).cast("double")) \
        .otherwise(F.trim(cols[1]).cast("double"))
    e = F.when(n >= 3, F.trim(cols[2]).cast("double")) \
        .otherwise(F.lit(DEFAULT_ERR))
    return lines.select(
        "conv_id",
        F.lit("value").alias("channel"),
        idx.alias("turn_idx"),
        F.to_timestamp(t).alias("ts"),
        t.alias("t"), y.alias("y"), e.alias("e"))


def parse_headerfile(spark: SparkSession, path: str,
                     files_to_include: list[str] | None = None) -> DataFrame:
    """Read a header CSV (``filename,label[,meta...]`` with a header
    row — the reference's format †) → a dims table
    ``(conv_id, label, <meta columns...>)`` keyed by the file stem,
    ready for rollup_features(meta=...) / with_meta broadcast joins."""
    hdr = spark.read.csv(path, header=True)
    fname = hdr.columns[0]
    if files_to_include is not None:
        hdr = hdr.where(F.col(fname).isin(list(files_to_include)))
    stem = F.regexp_extract(F.col(fname), r"([^/]+?)(\.[^./]*)?$", 1)
    rest = [c for c in hdr.columns if c != fname]
    return hdr.select(stem.alias("conv_id"), *rest)


TURN_JSON_SCHEMA = ("conv_id string, turn_idx int, role string, "
                    "text string, tool string, ts timestamp")


def parse_json_turns(df, json_col: str = "value",
                     mode: str = "PERMISSIVE"):
    """JSON-lines transcript ingest — the interchange format agent
    frameworks actually emit. ``from_json`` with the input_hint schema
    (native, codegen — no Python in the parse path), exploded back to
    the transcript columns plus ``_malformed`` carrying the raw line
    when parsing failed (PERMISSIVE: corrupt lines surface as rows
    with NULL fields and the original text for quarantine, instead of
    killing a 10^12-turn ingest; mode='FAILFAST' opts into strictness).

    Scale shape: a pure projection over whatever source produced the
    string column (files, Kafka, a binary payload decode) — zero
    shuffles, composes with the streaming sources unchanged.
    """
    from pyspark.sql import functions as F
    if mode not in ("PERMISSIVE", "FAILFAST"):
        raise ValueError(f"mode must be PERMISSIVE|FAILFAST, got {mode!r}")
    parsed = F.from_json(F.col(json_col), TURN_JSON_SCHEMA,
                         {"mode": mode})
    out = df.withColumn("__p", parsed)
    return out.select(
        F.col("__p.conv_id").alias("conv_id"),
        F.col("__p.turn_idx").alias("turn_idx"),
        F.col("__p.role").alias("role"),
        F.col("__p.text").alias("text"),
        F.col("__p.tool").alias("tool"),
        F.col("__p.ts").alias("ts"),
        F.when(F.col("__p").isNull()
               | (F.col("__p.conv_id").isNull()
                  & F.col("__p.turn_idx").isNull()
                  & F.col("__p.ts").isNull()),
               F.col(json_col)).alias("_malformed"),
    )
