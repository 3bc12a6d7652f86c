"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract / frame-sample as
vectorized pandas UDFs over ``mapInPandas``.

The container has no image/audio libraries, so the actual media decode
is STUBBED (clearly marked): ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case it produces
a deterministic fake decode derived from the payload bytes. Everything
Spark-side — schema, partitioning, UDF signatures, Arrow batch shapes —
is real and tested; swapping the stub for PIL/ffmpeg is a one-function
change on the executor side.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, n_bytes int, "
    "width int, height int, n_frames int"
)

FEATURES_SCHEMA = "doc_id long, media_type string, feat array<float>"


def attach_fake_media(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Synthesize an opaque binary payload + typed metadata per doc
    (deterministic: the payload is the utf-8 text bytes). Native exprs
    only — binary columns flow through Tungsten untouched."""
    payload = F.encode(F.col(text_col), "utf-8")
    n_bytes = F.octet_length(payload)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        payload.alias("media"),
        F.element_at(F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                     (F.col(id_col) % 3 + 1).cast("int")).alias("media_type"),
        n_bytes.alias("n_bytes"),
        (F.lit(16) + F.pmod(n_bytes, F.lit(48))).alias("width"),
        (F.lit(16) + F.pmod(n_bytes * 7, F.lit(48))).alias("height"),
        (F.lit(1) + F.pmod(n_bytes, F.lit(30))).alias("n_frames"))


def decode_media(payload: bytes, media_type: str, fake: bool = False) -> np.ndarray:
    """STUB: real implementation needs PIL/soundfile/ffmpeg (absent in
    this container). fake=True returns a deterministic pseudo-decode:
    payload bytes as float32 in [0, 1)."""
    if not fake:
        raise NotImplementedError(
            "media decode requires image/audio libs not present in this "
            "environment; pass fake=True for the deterministic test stub")
    return np.frombuffer(payload, dtype=np.uint8).astype(np.float32) / 256.0


def extract_features(media: DataFrame, feat_dim: int = 8,
                     fake: bool = True) -> DataFrame:
    """Per-item feature vector via mapInPandas: decode (stub) → fixed-dim
    mean-pooled features. Arrow-batched; per-batch numpy, the only
    Python loop is one iteration per media item (the decode call)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, mtype in zip(pdf["media"], pdf["media_type"]):
                arr = decode_media(bytes(payload), mtype, fake=fake)
                pad = (-arr.size) % feat_dim
                if pad:
                    arr = np.pad(arr, (0, pad))
                # float64 accumulator: the column sums are then EXACT
                # (every byte/256 is a dyadic rational), so the pooled
                # means are bit-reproducible by any engine that sums the
                # same bytes in double — the driver oracle relies on it
                feats.append(arr.reshape(-1, feat_dim)
                             .mean(axis=0, dtype=np.float64))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "feat": feats,
            })

    return (media.select("doc_id", "media_type", "media")
            .mapInPandas(kernel, schema=FEATURES_SCHEMA))


RESIZED_SCHEMA = "doc_id long, pix array<float>"


def resize_media(media: DataFrame, out_h: int = 4, out_w: int = 4,
                 fake: bool = True) -> DataFrame:
    """Area-mean resize of each media item's pixel grid to a fixed
    (out_h, out_w) raster via mapInPandas. Unlike ``decode_media`` this
    kernel is NOT a stub — it runs a real vectorized pooling (bincount
    over the target-pixel map) on the decoded array; only the
    byte→pixel decode step itself is the deterministic fake. Source
    pixel (i, j) of an (h, w) grid pools into output cell
    (i*out_h//h, j*out_w//w); the payload is truncated / zero-padded to
    h*w bytes. Float64 sums of integer bytes are exact, so the stored
    float32 raster is representation-identical to a pure-SQL replay
    (same division order: sum/count/256)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for payload, mtype, h, w in zip(pdf["media"], pdf["media_type"],
                                            pdf["height"], pdf["width"]):
                if h < out_h or w < out_w:
                    # upsampling would leave target cells with zero
                    # source pixels (0/0 → silent NaN raster); refuse
                    # loudly per the no-silent-degradation rule
                    raise ValueError(
                        f"resize_media: item is {h}x{w} but target is "
                        f"{out_h}x{out_w}; area-mean resize only "
                        f"downsamples")
                arr = decode_media(bytes(payload), mtype, fake=fake)
                byts = (arr * 256.0).astype(np.int64)[: h * w]
                grid = np.zeros(h * w, dtype=np.int64)
                grid[: byts.size] = byts
                rmap = (np.arange(h, dtype=np.int64) * out_h) // h
                cmap = (np.arange(w, dtype=np.int64) * out_w) // w
                tgt = (rmap[:, None] * out_w + cmap[None, :]).ravel()
                sums = np.bincount(tgt, weights=grid,
                                   minlength=out_h * out_w)
                cnts = np.bincount(tgt, minlength=out_h * out_w)
                out.append((sums / cnts / 256.0).astype(np.float32))
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "pix": out})

    return (media.select("doc_id", "media_type", "media", "height", "width")
            .mapInPandas(kernel, schema=RESIZED_SCHEMA))


def sample_frames(media: DataFrame, every_k: int = 5) -> DataFrame:
    """Frame sampling for video rows: explode frame indices 0, k, 2k, …
    < n_frames. Pure native sequence/explode — no UDF."""
    return (media
            .where(F.col("media_type") == "video")
            .select("doc_id", "n_frames",
                    F.explode(F.sequence(
                        F.lit(0), F.col("n_frames") - 1, F.lit(every_k)))
                    .alias("frame_idx")))
