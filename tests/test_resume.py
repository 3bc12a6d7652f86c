"""Resume/lineage tests (SURVEY.md §5.2 layer 5): kill after partial
materialization → rerun → identical final tables; ledger shows completed
partitions skipped."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cesium_spark.plans.ledger import Ledger, content_checksum
from cesium_spark.plans.pipeline import expire_raw, run_pipeline
from cesium_spark.sources.table_io import TableIO

FEATS = ["mean", "std", "n_epochs", "amplitude"]


def _table_checksum(io, name):
    df = io.read(name)
    return (content_checksum(
        df, ["conv_id", "channel", "window_start", "feature", "value"])
        .agg(F.sum("row_crc")).collect()[0][0], df.count())


def test_crash_resume_identical_output(spark, tiny_transcripts, tmp_path):
    io = TableIO(spark, str(tmp_path / "t1"))

    # full uninterrupted run → golden checksums
    io_ref = TableIO(spark, str(tmp_path / "ref"))
    run_pipeline(io_ref, tiny_transcripts, tiers=("1h", "1d"),
                 features=FEATS, compress=False)
    golden = {t: _table_checksum(io_ref, f"features_{t}") for t in ("1h", "1d")}

    # crashed run: dies after the 1h tier
    with pytest.raises(RuntimeError, match="injected failure"):
        run_pipeline(io, tiny_transcripts, tiers=("1h", "1d"), features=FEATS,
                     compress=False, fail_after_stage="rollup_1h")
    assert io.exists("features_1h")
    assert not io.exists("features_1d")

    # resumed run: must skip 1h (ledger) and produce identical tables
    report = run_pipeline(io, tiny_transcripts, tiers=("1h", "1d"),
                          features=FEATS, compress=False)
    assert report["stages"]["rollup_1h"] == {"skipped": True}
    for t in ("1h", "1d"):
        assert _table_checksum(io, f"features_{t}") == golden[t]


def test_ledger_lineage_per_partition(spark, tiny_transcripts, tmp_path):
    io = TableIO(spark, str(tmp_path / "t2"))
    run_pipeline(io, tiny_transcripts, tiers=("1d",), features=FEATS,
                 compress=False)
    ledger = Ledger(io)
    entries = ledger.entries().where("stage = 'rollup_1d'").toPandas()
    # one lineage row per (tier, window_date) work unit, with counts
    assert len(entries) > 1
    assert (entries["state"] == "done").all()
    assert (entries["out_count"] > 0).all()
    assert entries["checksum"].notna().all()
    # metrics recorded
    m = ledger.metrics().toPandas()
    assert {"turns", "turns_per_sec"} <= set(m["metric"])


def test_rerun_is_noop_and_idempotent(spark, tiny_transcripts, tmp_path):
    io = TableIO(spark, str(tmp_path / "t3"))
    run_pipeline(io, tiny_transcripts, tiers=("1d",), features=FEATS,
                 compress=False)
    before = _table_checksum(io, "features_1d")
    report = run_pipeline(io, tiny_transcripts, tiers=("1d",), features=FEATS,
                          compress=False)
    assert report["stages"]["rollup_1d"] == {"skipped": True}
    assert _table_checksum(io, "features_1d") == before


def test_retention_expiry(spark, tiny_transcripts, tmp_path):
    io = TableIO(spark, str(tmp_path / "t4"))
    run_pipeline(io, tiny_transcripts, tiers=("1d",), features=FEATS,
                 compress=False)
    total = io.read("series").count()
    cutoff = (io.read("series").agg(F.max("window_date")).collect()[0][0])
    deleted = expire_raw(io, str(cutoff))
    assert 0 < deleted < total
    assert io.read("series").count() == total - deleted
    # rollups survive expiry
    assert io.read("features_1d").count() > 0


def test_pipeline_records_compression_metrics(spark, tiny_transcripts,
                                              tmp_path):
    """The compress stage writes measured bytes/point per blob kind
    into _metrics (retention sizing reads the ratio, not a guess)."""
    io = TableIO(spark, str(tmp_path / "cm"))
    report = run_pipeline(io, tiny_transcripts, tiers=("1d",),
                          features=["mean"], compress=True)
    assert set(report["compression"]) == {"ts", "idx", "y"}
    assert all(v["bytes_per_point"] > 0
               for v in report["compression"].values())
    ledger = Ledger(io)
    rows = (ledger.metrics()
            .where(F.col("metric").startswith("bytes_per_point_"))
            .toPandas())
    assert set(rows["metric"]) == {"bytes_per_point_ts",
                                   "bytes_per_point_idx",
                                   "bytes_per_point_y"}
    got = dict(zip(rows["metric"], rows["value"]))
    for kind, rep in report["compression"].items():
        assert got[f"bytes_per_point_{kind}"] == rep["bytes_per_point"]
