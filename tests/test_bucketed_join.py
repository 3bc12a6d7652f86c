"""Bucketed co-located joins (the brief's 'bucketing for co-located
joins' requirement, made checkable): two tables bucketed on the same
key and count must join with ZERO shuffle exchanges, while the same
join on plain parquet shuffles both sides. Also: a groupBy on the
bucket key rides the bucketing (no exchange)."""

from __future__ import annotations

import re

import pandas as pd
import pytest

from cesium_spark.sources.table_io import TableIO


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bucketed"))
    io = TableIO(spark, root)
    turns = spark.createDataFrame(pd.DataFrame({
        "conv_id": [f"c{i % 40}" for i in range(400)],
        "turn_idx": range(400),
        "y": [float(i % 7) for i in range(400)]}))
    meta = spark.createDataFrame(pd.DataFrame({
        "conv_id": [f"c{i}" for i in range(40)],
        "label": [i % 3 for i in range(40)]}))
    io.write_bucketed(turns, "bturns", 8, ["conv_id"], ["conv_id"])
    io.write_bucketed(meta, "bmeta", 8, ["conv_id"], ["conv_id"])
    io.write(turns, "pturns")
    io.write(meta, "pmeta")
    return io


def test_bucketed_join_zero_exchange(spark, bucketed):
    io = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = io.read_table("bturns").join(io.read_table("bmeta"), "conv_id")
        n = j.count()
        p = _plan(j)
        assert n == 400
        assert "SortMergeJoin" in p
        assert "Exchange hashpartitioning" not in p, p
        # control: identical join over plain parquet shuffles BOTH sides
        pj = io.read("pturns").join(io.read("pmeta"), "conv_id")
        assert len(re.findall(r"Exchange hashpartitioning",
                              _plan(pj))) == 2
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_groupby_rides_bucketing(spark, bucketed):
    io = bucketed
    from pyspark.sql import functions as F
    g = io.read_table("bturns").groupBy("conv_id").agg(F.sum("y"))
    assert "Exchange hashpartitioning" not in _plan(g)
    # reading the files directly loses the bucket spec -> exchange
    g2 = io.read("bturns").groupBy("conv_id").agg(F.sum("y"))
    assert "Exchange hashpartitioning" in _plan(g2)


def test_bucketed_roundtrip_values(spark, bucketed):
    io = bucketed
    a = sorted(map(tuple, io.read_table("bturns").collect()))
    b = sorted(map(tuple, io.read("pturns").collect()))
    assert a == b
    with pytest.raises(ValueError):
        io.write_bucketed(io.read("pmeta"), "x", 4, [])
