"""r5 (verdict item #8): golden-file dress rehearsal of the Iceberg
backend's SQL. The sandbox ships no iceberg jar, so the statements the
``backend='iceberg'`` branch of TableIO executes are pinned here as
strings against golden files — the first real-cluster run is not the
first time this code path is read. Regenerate goldens intentionally
with REGEN_GOLDEN=1 python -m pytest tests/test_iceberg_sql.py."""

from __future__ import annotations

import os

import pytest

from cesium_spark.sources.iceberg_sql import (
    bucket_transform, create_table_ddl, days_transform, delete_where_sql,
    expire_snapshots_sql, merge_upsert_sql, overwrite_partitions_sql)

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "iceberg")

CASES = {
    "create_features_table.sql": create_table_ddl(
        "catalog.db.features_1h",
        [("conv_id", "STRING"), ("channel", "STRING"),
         ("window_start", "TIMESTAMP"), ("mean", "DOUBLE"),
         ("std", "DOUBLE"), ("n", "BIGINT")],
        partition_transforms=[days_transform("window_start"),
                              bucket_transform(64, "conv_id")],
        props={"format-version": "2",
               "write.distribution-mode": "hash"}),
    "overwrite_cagg_refresh.sql": overwrite_partitions_sql(
        "catalog.db.features_1h", "__src_features_1h"),
    "merge_upsert_latest.sql": merge_upsert_sql(
        "catalog.db.turns_latest", "__src_turns",
        key_cols=["conv_id", "turn_idx"],
        update_cols=["role", "text", "tool", "ts"]),
    "delete_retention.sql": delete_where_sql(
        "catalog.db.features_1m",
        "window_start < TIMESTAMP '2024-01-01 00:00:00'"),
    "expire_snapshots.sql": expire_snapshots_sql(
        "catalog", "db.features_1m", "2024-01-08 00:00:00",
        retain_last=2),
}


@pytest.mark.parametrize("fname", sorted(CASES))
def test_iceberg_sql_matches_golden(fname):
    path = os.path.join(GOLDEN, fname)
    got = CASES[fname] + "\n"
    if os.environ.get("REGEN_GOLDEN"):
        with open(path, "w") as f:
            f.write(got)
    with open(path) as f:
        assert f.read() == got


def test_builder_validation():
    with pytest.raises(ValueError, match="bucket count"):
        bucket_transform(0, "conv_id")
    with pytest.raises(ValueError, match="key_cols"):
        merge_upsert_sql("t", "s", [], ["a"])
    with pytest.raises(ValueError, match="update_cols"):
        merge_upsert_sql("t", "s", ["k"], [])
    # hostile identifier cannot break out of quoting
    assert "``" in bucket_transform(4, "evil`col")
