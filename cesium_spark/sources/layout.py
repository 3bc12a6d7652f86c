"""Z-order (Morton) clustered data layout — the multi-dimensional
data-skipping story at 100 TB. A table range-partitioned on ONE key
prunes scans on that key only; interleaving the bits of d keys into
one Morton value makes points close in ALL dimensions land in the
same files, so a rectangle query prunes on every dimension at once
(the technique behind Delta OPTIMIZE ZORDER / Hudi space-filling
curves, here as plain Spark + hive partitioning).

Layout contract:

- ``write_zordered`` buckets each dimension into ``2**cell_bits``
  coarse buckets over a FIXED [lo, hi) range (provided by the caller
  or measured once — one 1-row aggregate), interleaves them into a
  ``zcell`` id, and writes ``partitionBy("zcell")`` with rows sorted
  by the fine-grained ``zval`` inside each cell. Pay one clustering
  shuffle at ingest; every rectangle query afterwards rides
  partition pruning.
- ``read_box`` enumerates the coarse cells a query rectangle can
  touch (driver-side over the tiny cell grid — the IVF probe-list
  precedent), reads with an ``isin`` partition filter, and applies
  the EXACT rectangle predicate as a residual. Correctness never
  depends on replaying the bucket arithmetic bit-exactly: the cell
  ranges are expanded by ±1 bucket per dimension, so a last-ulp
  disagreement between the JVM's and Python's ``(v-lo)/span*n`` can
  only cost one extra cell, never a missed row — and the residual
  filter makes the returned set exactly the plain-scan answer.

NULL dimension values land in hive's default partition and are
excluded by the residual filter (a NULL coordinate is outside every
rectangle).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _check(cols, los, his, cell_bits):
    d = len(cols)
    if d < 2:
        raise ValueError("z-ordering needs >= 2 dimensions")
    if not (1 <= cell_bits and cell_bits * d <= 62):
        raise ValueError(
            f"cell_bits * dims must be in [1, 62], got {cell_bits}*{d}")
    if len(los) != d or len(his) != d:
        raise ValueError("los/his must match cols")
    for c, lo, hi in zip(cols, los, his):
        if not (hi > lo):
            raise ValueError(f"need hi > lo for {c}: [{lo}, {hi})")


def _bucket_col(col: str, lo: float, hi: float, n: int) -> Column:
    """Bucket index in [0, n): floor((v−lo)/(hi−lo)·n), clamped — the
    SAME arithmetic `_bucket_py` runs, so the two can only disagree
    by the one trailing ulp the ±1 cell expansion absorbs."""
    raw = F.floor((F.col(col) - F.lit(float(lo)))
                  / F.lit(float(hi - lo)) * F.lit(float(n)))
    return F.least(F.greatest(raw, F.lit(0)), F.lit(n - 1)).cast("long")


def _bucket_py(v: float, lo: float, hi: float, n: int) -> int:
    return min(max(math.floor((v - lo) / (hi - lo) * n), 0), n - 1)


def _interleave(buckets: list[Column], nbits: int) -> Column:
    d = len(buckets)
    z = F.lit(0).cast("long")
    for b in range(nbits):
        for i, col in enumerate(buckets):
            bit = F.shiftright(col, b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * d + i))
    return z


def _interleave_py(idx: tuple[int, ...], nbits: int) -> int:
    z = 0
    for b in range(nbits):
        for i, v in enumerate(idx):
            z |= ((v >> b) & 1) << (b * len(idx) + i)
    return z


def zorder_cell(cols: list[str], los: list[float], his: list[float],
                cell_bits: int = 4) -> Column:
    """Coarse Morton cell id (the hive partition key)."""
    _check(cols, los, his, cell_bits)
    n = 1 << cell_bits
    return _interleave(
        [_bucket_col(c, lo, hi, n) for c, lo, hi in zip(cols, los, his)],
        cell_bits)


def zorder_key(cols: list[str], los: list[float], his: list[float],
               bits: int = 16) -> Column:
    """Fine-grained Morton value (the intra-file sort key)."""
    _check(cols, los, his, bits)
    n = 1 << bits
    return _interleave(
        [_bucket_col(c, lo, hi, n) for c, lo, hi in zip(cols, los, his)],
        bits)


def cells_for_box(box: dict[str, tuple[float, float]], cols: list[str],
                  los: list[float], his: list[float],
                  cell_bits: int = 4) -> list[int]:
    """Every coarse cell a rectangle can touch, ±1 bucket of slack
    per dimension (see module docstring). Driver-side enumeration of
    the cell-grid cross product — O(∏ range_i) over a 2^cell_bits
    grid, the same bounded footprint as the IVF probe pick."""
    _check(cols, los, his, cell_bits)
    n = 1 << cell_bits
    ranges = []
    for c, lo, hi in zip(cols, los, his):
        qlo, qhi = box[c]
        if qhi < qlo:
            raise ValueError(f"box for {c} has hi < lo: {box[c]}")
        b_lo = max(_bucket_py(qlo, lo, hi, n) - 1, 0)
        b_hi = min(_bucket_py(qhi, lo, hi, n) + 1, n - 1)
        ranges.append(range(b_lo, b_hi + 1))
    out = []

    def rec(prefix):
        i = len(prefix)
        if i == len(ranges):
            out.append(_interleave_py(tuple(prefix), cell_bits))
            return
        for b in ranges[i]:
            rec(prefix + [b])

    rec([])
    return sorted(out)


def write_zordered(df: DataFrame, path: str, cols: list[str],
                   los: list[float], his: list[float],
                   cell_bits: int = 4, bits: int = 16) -> None:
    """Cluster-and-write: one shuffle on the cell id, rows Morton-
    sorted inside each cell, hive-partitioned by ``zcell``."""
    if bits < cell_bits:
        raise ValueError(f"bits ({bits}) must be >= cell_bits "
                         f"({cell_bits})")
    out = (df
           .withColumn("zcell", zorder_cell(cols, los, his, cell_bits))
           .withColumn("zval", zorder_key(cols, los, his, bits))
           .repartition("zcell")
           .sortWithinPartitions("zcell", "zval"))
    out.write.mode("overwrite").partitionBy("zcell").parquet(path)


def read_box(spark: SparkSession, path: str,
             box: dict[str, tuple[float, float]], cols: list[str],
             los: list[float], his: list[float],
             cell_bits: int = 4) -> DataFrame:
    """Rectangle query over a z-ordered table: cell IN-list partition
    filter + the exact residual predicate. Returns exactly the rows a
    full-scan filter would (closed-interval box on every dim)."""
    cells = cells_for_box(box, cols, los, his, cell_bits)
    df = spark.read.parquet(path).where(F.col("zcell").isin(cells))
    for c, (qlo, qhi) in box.items():
        df = df.where(F.col(c).between(F.lit(qlo), F.lit(qhi)))
    return df
