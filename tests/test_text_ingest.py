"""Delimited-text ingest (cesium parse_ts_data / parse_headerfile †,
SURVEY.md §2.1): positional 1/2/3-column semantics, t/e defaults,
contractual per-file line ordering, header-file dims join, and direct
consumption by the rollup engine."""

from __future__ import annotations

import numpy as np
import pytest

from cesium_spark.sources.text_ingest import (
    DEFAULT_ERR,
    parse_headerfile,
    parse_ts_data,
)


@pytest.fixture(scope="module")
def csv_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("series")
    # 1-col: m only -> t defaults to line index
    (d / "one.csv").write_text("10.5\n11.5\n9.0\n12.25\n")
    # 2-col: t,m (irregular t) + trailing newline + a blank line
    (d / "two.dat").write_text("0.0,1.0\n2.5,2.0\n7.0,3.5\n\n")
    # 3-col: t,m,e
    (d / "three.csv").write_text("1.0,5.0,0.1\n2.0,6.0,0.2\n")
    (d / "header.csv").write_text(
        "filename,label,observatory\n"
        "one.csv,cepheid,north\n"
        "two.dat,rr_lyrae,south\n"
        "three.csv,cepheid,north\n")
    return str(d)


def test_positional_forms_and_defaults(spark, csv_dir):
    out = (parse_ts_data(spark, csv_dir + "/*.csv")
           .union(parse_ts_data(spark, csv_dir + "/*.dat"))
           .where("conv_id <> 'header'")
           .toPandas().set_index(["conv_id", "turn_idx"]).sort_index())
    one = out.loc["one"]
    # default t = 0..n-1; y in file order; default e
    np.testing.assert_array_equal(one["t"], [0.0, 1.0, 2.0, 3.0])
    np.testing.assert_array_equal(one["y"], [10.5, 11.5, 9.0, 12.25])
    assert (one["e"] == DEFAULT_ERR).all()
    two = out.loc["two"]
    np.testing.assert_array_equal(two["t"], [0.0, 2.5, 7.0])
    np.testing.assert_array_equal(two["y"], [1.0, 2.0, 3.5])
    assert len(two) == 3  # blank line dropped, no phantom turn_idx
    three = out.loc["three"]
    np.testing.assert_array_equal(three["e"], [0.1, 0.2])
    np.testing.assert_array_equal(three["y"], [5.0, 6.0])


def test_headerfile_dims_join(spark, csv_dir):
    hdr = parse_headerfile(spark, csv_dir + "/header.csv")
    got = {r["conv_id"]: (r["label"], r["observatory"])
           for r in hdr.collect()}
    assert got == {"one": ("cepheid", "north"),
                   "two": ("rr_lyrae", "south"),
                   "three": ("cepheid", "north")}
    only = parse_headerfile(spark, csv_dir + "/header.csv",
                            files_to_include=["one.csv"])
    assert [r["conv_id"] for r in only.collect()] == ["one"]


def test_ingest_feeds_rollup_and_meta(spark, csv_dir):
    """The parsed frame is the engine series shape: conv-tier kernel
    rollup + header dims passthrough work unmodified."""
    from cesium_spark.operators.rollup import (
        pivot_wide,
        rollup_features,
        with_meta,
    )

    s = parse_ts_data(spark, csv_dir + "/three.csv")
    feats = ["n_epochs", "mean", "weighted_average"]
    wide = with_meta(
        pivot_wide(rollup_features(s, "conv", feats), feats),
        parse_headerfile(spark, csv_dir + "/header.csv"))
    row = wide.collect()[0]
    assert row["n_epochs"] == 2.0
    assert row["mean"] == 5.5
    # weighted: e=0.1 vs 0.2 -> w 100 vs 25
    assert row["weighted_average"] == pytest.approx(
        (5.0 * 100 + 6.0 * 25) / 125)
    assert row["label"] == "cepheid" and row["observatory"] == "north"


# ---------------------------------------------------------------------------
# parse_json_turns
# ---------------------------------------------------------------------------


def test_parse_json_turns_roundtrip_and_quarantine(spark):
    import pandas as pd
    from pyspark.sql import functions as F
    from cesium_spark.sources.text_ingest import (
        TURN_JSON_SCHEMA,
        parse_json_turns,
    )
    lines = [
        '{"conv_id":"c1","turn_idx":0,"role":"user",'
        '"text":"hi \\"there\\"","ts":"2024-01-01T00:00:00Z"}',
        '{"conv_id":"c1","turn_idx":1,"role":"assistant",'
        '"text":"hello","tool":"search","ts":"2024-01-01T00:00:05Z"}',
        "{broken",
        '{"unrelated": 1}',
    ]
    df = spark.createDataFrame(pd.DataFrame({"value": lines}))
    got = parse_json_turns(df).collect()
    by_text = {r["text"]: r for r in got}
    assert by_text['hi "there"']["turn_idx"] == 0
    assert by_text["hello"]["tool"] == "search"
    assert by_text["hello"]["ts"] is not None
    # corrupt + schema-less lines quarantine with the raw payload
    quarantined = [r for r in got if r["_malformed"] is not None]
    assert {r["_malformed"] for r in quarantined} == \
        {"{broken", '{"unrelated": 1}'}
    with pytest.raises(ValueError):
        parse_json_turns(df, mode="DROPMALFORMED")
    assert "conv_id" in TURN_JSON_SCHEMA
