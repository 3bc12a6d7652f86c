"""Benchmark harness (driver contract + BASELINE.md protocol).

Phase A — north-rule scaling evidence: the full transcript rollup
pipeline body (derive → 1m/1h/1d kernel rollups + conv-tier
Lomb–Scargle + Gorilla/DoD compression) over a deterministic synthetic
transcript table, executed twice on the SAME parquet input at two
parallelism levels (local[8] ≙ N executors, local[32] ≙ 4N). Reports
turns/sec at both and scaling efficiency = (thru₃₂/thru₈)/4. A
correctness rider asserts the two runs' feature tables are identical
(checksum) — partition-count independence at the bench scale.

Phase B — headline operator queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], timed to the noop
sink (full computation, no driver collect).

Prints ONE JSON line:
{"metric": "...", "value": <total sec>, "unit": "sec",
 "queries": {...per-query sec...}, "sf": ..., "scaling": {...}}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")
N_CONV = int(os.environ.get("CESIUM_BENCH_CONVS", "3000"))

BENCH_FEATS = [
    "n_epochs", "mean", "maximum", "minimum", "amplitude", "std", "skew",
    "median", "percent_beyond_1_std", "weighted_average",
    "median_absolute_deviation", "max_slope", "stetson_j", "stetson_k",
    "total_time", "cads_avg", "cads_med", "cads_std",
    "cad_probs_10", "cad_probs_100", "cad_probs_1000",
]
LS_FEATS = ["freq1_freq", "freq1_amplitude1", "freq1_signif", "period_fast",
            "freq_varrat", "linear_trend"]

HEADLINE = [
    "ts_rollup_1h_kernel", "ts_rollup_1d_native", "ts_gapfill_1h",
    "ts_gorilla_roundtrip", "ts_lomb_scargle_conv", "ts_derive_series",
    "rel_tpch_q1", "rel_nation_revenue",
    "doc_jaccard_pairs", "doc_minhash_lsh", "doc_simhash",
    "emb_cosine_topk", "doc_quality",
]


def _session(master: str):
    from cesium_spark.session import get_spark
    return get_spark(master=master, app_name=f"bench_{master}",
                     extra_conf={"spark.ui.showConsoleProgress": "false"})


def _noop(df) -> None:
    df.write.mode("overwrite").format("noop").save()


def pipeline_body(spark, input_path: str, out_root: str) -> int:
    """The timed job: scan → derive → tiered rollups → LS → compress."""
    import pyspark.sql.functions as F

    from cesium_spark.codecs.chunks import encode_chunks
    from cesium_spark.operators.derive import derive_series
    from cesium_spark.operators.rollup import (
        rollup_features,
        rollup_moments,
    )

    tr = spark.read.parquet(input_path)
    series = derive_series(tr)
    series.write.mode("overwrite").parquet(f"{out_root}/series")
    series = spark.read.parquet(f"{out_root}/series")
    for tier in ("1m", "1h", "1d"):
        rollup_features(series, tier, BENCH_FEATS).write.mode(
            "overwrite").parquet(f"{out_root}/features_{tier}")
    # conv-tier Lomb–Scargle over the latency channel (the north_star's
    # "LS periodogram peaks over turn-latency series")
    rollup_features(series.where(F.col("channel") == "latency"),
                    "conv", LS_FEATS).write.mode("overwrite").parquet(
        f"{out_root}/features_conv_ls")
    # moments fast path + compression
    _noop(rollup_moments(series, "1h"))
    encode_chunks(series).write.mode("overwrite").parquet(f"{out_root}/chunks")
    return tr.count()


def table_checksum(spark, path: str) -> int:
    import pyspark.sql.functions as F
    df = spark.read.parquet(path)
    c = df.select(F.sum(F.crc32(F.concat_ws(
        "\x1f", *[F.col(c).cast("string") for c in sorted(df.columns)])))
        .alias("c")).collect()[0]["c"]
    return int(c)


def phase_a() -> dict:
    tmp = tempfile.mkdtemp(prefix="cesium_bench_")
    input_path = f"{tmp}/transcripts"
    results = {}
    checksums = {}
    try:
        # untimed: generate the deterministic input once
        spark = _session("local[8]")
        from cesium_spark.sources.synth import generate_transcripts
        generate_transcripts(spark, N_CONV).write.mode(
            "overwrite").parquet(input_path)
        spark.stop()

        for master, tag in (("local[8]", "n8"), ("local[32]", "n32")):
            spark = _session(master)
            out = f"{tmp}/out_{tag}"
            t0 = time.monotonic()
            turns = pipeline_body(spark, input_path, out)
            wall = time.monotonic() - t0
            results[tag] = {"turns": turns, "wall_sec": round(wall, 2),
                            "turns_per_sec": round(turns / wall, 1)}
            checksums[tag] = {
                t: table_checksum(spark, f"{out}/features_{t}")
                for t in ("1m", "1h", "1d")}
            spark.stop()

        eff = (results["n32"]["turns_per_sec"]
               / results["n8"]["turns_per_sec"]) / (32 / 8)
        results["scaling_efficiency"] = round(eff, 3)
        results["outputs_identical"] = checksums["n8"] == checksums["n32"]
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return results


def phase_b() -> dict:
    from cesium_spark import driver_queries as dq
    spark = _session(f"local[{CPUS}]")
    times = {}
    for name in HEADLINE:
        fn = dq.QUERIES[name]
        t0 = time.monotonic()
        _noop(fn(spark, SF_DIR))
        times[name] = round(time.monotonic() - t0, 2)
    spark.stop()
    return times


def main() -> None:
    scaling = phase_a()
    queries = phase_b()
    total = round(sum(queries.values()), 2)
    sf = SF_DIR.rstrip("/").split("sf")[-1]
    out = {
        "metric": "headline query wall time (sum) + rollup scaling evidence",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "scaling": scaling,
        "turns_per_sec_n8": scaling["n8"]["turns_per_sec"],
        "turns_per_sec_n32": scaling["n32"]["turns_per_sec"],
        "scaling_efficiency": scaling["scaling_efficiency"],
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
