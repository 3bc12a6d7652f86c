"""PII redaction, duplicate resolution, and sequence packing."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from cesium_spark.operators.dedup import resolve_duplicates
from cesium_spark.operators.packing import pack_sequences
from cesium_spark.operators.textstats import redact_pii


def test_redact_pii_kinds_and_order(spark):
    txt = ("mail a.b+c@foo.org twice x@y.io ssn 123-45-6789 "
           "card 4111 1111 1111 1111 ip 192.168.0.1 tel +1 555-123-4567")
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": [txt]}))
    [r] = redact_pii(df).collect()
    assert r["n_email"] == 2
    assert r["n_ssn"] == 1
    assert r["n_card"] == 1
    assert r["n_ipv4"] == 1
    assert r["n_phone"] == 1
    assert r["n_pii_total"] == 6
    red = r["text_redacted"]
    for tag in ("<EMAIL>", "<SSN>", "<CARD>", "<IPV4>", "<PHONE>"):
        assert tag in red, red
    # nothing PII-shaped survives
    assert "@" not in red and "4111" not in red and "192.168" not in red


def test_redact_pii_clean_text_untouched(spark):
    df = spark.createDataFrame(pd.DataFrame(
        {"doc_id": [1], "text": ["just plain words here"]}))
    [r] = redact_pii(df).collect()
    assert r["n_pii_total"] == 0
    assert r["text_redacted"] == "just plain words here"


def test_resolve_duplicates_keeps_best_and_breaks_ties(spark):
    labels = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "cluster_id": [1, 1, 1, 4, 4],
    }))
    scores = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        # cluster 1: doc 2 wins on score; cluster 4: tie -> doc 4 by id
        "score": [0.1, 0.9, 0.5, 0.7, 0.7],
    }))
    out = {r["doc_id"]: r for r in
           resolve_duplicates(labels, scores).collect()}
    assert out[2]["is_canonical"] and out[2]["kept_id"] == 2
    assert not out[1]["is_canonical"] and out[1]["kept_id"] == 2
    assert not out[3]["is_canonical"] and out[3]["kept_id"] == 2
    assert out[4]["is_canonical"] and out[4]["kept_id"] == 4
    assert not out[5]["is_canonical"] and out[5]["kept_id"] == 4
    # exactly one canonical per cluster
    assert sum(r["is_canonical"] for r in out.values()) == 2


def test_pack_sequences_greedy_and_oversize(spark):
    df = spark.createDataFrame(pd.DataFrame({
        "shard": ["s"] * 6 + ["t"],
        "doc_id": [1, 2, 3, 4, 5, 6, 7],
        "n_tokens": [50, 60, 80, 90, 250, 10, 30],
    }))
    out = {r["doc_id"]: r for r in pack_sequences(df, cap=200).collect()}
    # shard s: [50+60+80=190 | 90 -> bin1 | 250 oversize -> bin2 | 10 -> bin3]
    assert [out[i]["bin_id"] for i in (1, 2, 3)] == [0, 0, 0]
    assert out[3]["bin_fill"] == 190
    assert out[4]["bin_id"] == 1
    assert out[5]["bin_id"] == 2 and out[5]["oversize"]
    assert out[6]["bin_id"] == 3 and out[6]["bin_fill"] == 10
    # separate shard restarts numbering
    assert out[7]["bin_id"] == 0 and out[7]["shard"] == "t"


def test_pack_sequences_partitioning_independent(spark):
    import numpy as np
    rng = np.random.default_rng(9)
    pdf = pd.DataFrame({
        "shard": [f"s{i % 4}" for i in range(300)],
        "doc_id": range(300),
        "n_tokens": rng.integers(1, 120, 300),
    })
    df = spark.createDataFrame(pdf)
    a = sorted(map(str, pack_sequences(df, cap=256).collect()))
    b = sorted(map(str, pack_sequences(df.repartition(11), cap=256).collect()))
    assert a == b
    with pytest.raises(ValueError, match="cap"):
        pack_sequences(df, cap=0)


def test_pack_never_overfills_and_covers_all(spark):
    import numpy as np
    rng = np.random.default_rng(10)
    pdf = pd.DataFrame({
        "shard": "s",
        "doc_id": range(500),
        "n_tokens": rng.integers(1, 90, 500),
    })
    out = pack_sequences(spark.createDataFrame(pdf), cap=100)
    bins = (out.groupBy("shard", "bin_id")
            .agg(F.sum("n_tokens").alias("tot")).collect())
    assert all(r["tot"] <= 100 for r in bins)
    assert out.count() == 500
    # greedy lower bound: n_bins >= ceil(total/cap)
    total = int(pdf["n_tokens"].sum())
    assert len(bins) >= -(-total // 100)
