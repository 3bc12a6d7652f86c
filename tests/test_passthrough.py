"""Per-row invariant (BASELINE.json input_hint; SURVEY.md §5.2 layer 4):
after the full compress→decompress pipeline, every turn's text is
byte-identical and timestamps/values are exact under stable
(conv_id, turn_idx) ordering."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyspark.sql.functions as F

from cesium_spark.codecs.chunks import decode_chunks, encode_chunks
from cesium_spark.operators.derive import derive_series


def test_roundtrip_preserves_series_exactly(spark, tiny_transcripts):
    series = derive_series(tiny_transcripts).cache()
    chunks = encode_chunks(series, chunk_size=256)
    decoded = decode_chunks(chunks)

    orig = (series.select("conv_id", "channel", "turn_idx", "ts", "y")
            .toPandas()
            .sort_values(["conv_id", "channel", "turn_idx"], kind="stable")
            .reset_index(drop=True))
    got = (decoded.toPandas()
           .sort_values(["conv_id", "channel", "turn_idx"], kind="stable")
           .reset_index(drop=True))

    assert len(got) == len(orig)
    pd.testing.assert_frame_equal(
        got[["conv_id", "channel", "turn_idx"]],
        orig[["conv_id", "channel", "turn_idx"]], check_dtype=False)
    np.testing.assert_array_equal(got["ts"].to_numpy("datetime64[us]"),
                                  orig["ts"].to_numpy("datetime64[us]"))
    # bit-level float equality
    np.testing.assert_array_equal(
        got["y"].to_numpy(np.float64).view(np.uint64),
        orig["y"].to_numpy(np.float64).view(np.uint64))


def test_text_passthrough_after_pipeline(spark, tiny_transcripts,
                                         tiny_transcripts_pdf):
    """Decode the token-count channel, join back to the raw table on
    (conv_id, turn_idx): every turn present, text byte-equal."""
    series = derive_series(tiny_transcripts)
    tok = series.filter("channel = 'tokens'")
    decoded = (decode_chunks(encode_chunks(tok, chunk_size=128))
               .withColumnRenamed("ts", "decoded_ts"))

    joined = (decoded.join(tiny_transcripts, ["conv_id", "turn_idx"], "inner")
              .select("conv_id", "turn_idx", "text", F.col("decoded_ts").alias("ts"))
              .toPandas()
              .sort_values(["conv_id", "turn_idx"], kind="stable")
              .reset_index(drop=True))
    exp = (tiny_transcripts_pdf[["conv_id", "turn_idx", "text", "ts"]]
           .sort_values(["conv_id", "turn_idx"], kind="stable")
           .reset_index(drop=True))
    assert len(joined) == len(exp)  # every turn survived
    assert (joined["text"] == exp["text"]).all()  # byte equality
    np.testing.assert_array_equal(joined["ts"].to_numpy("datetime64[us]"),
                                  exp["ts"].to_numpy("datetime64[us]"))


def test_compression_ratio_reported(spark, tiny_transcripts):
    """Chunks must not blow up storage: token/tool channels are highly
    compressible; report overall ratio ≥ 1.5× vs raw 8-byte cols."""
    import pyspark.sql.functions as F
    series = derive_series(tiny_transcripts)
    chunks = encode_chunks(series, chunk_size=4096).cache()
    stats = chunks.agg(
        F.sum("n").alias("points"),
        F.sum(F.length("ts_blob") + F.length("idx_blob")
              + F.length("y_blob")).alias("bytes")).collect()[0]
    raw_bytes = stats["points"] * 8 * 3  # ts + idx + y at 8B each
    assert raw_bytes / stats["bytes"] > 1.5
