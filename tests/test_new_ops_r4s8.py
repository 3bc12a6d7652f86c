"""Round-4 session-8 operators: perceptual image hashes (aHash/dHash)
and their hamming-banded near-dup pairing."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators import multimodal as mm
from cesium_spark.operators.dedup import simhash_band_pairs


def _ref_phash(payload: bytes) -> tuple[int, int]:
    """Independent scalar reference of the image_phash spec."""
    arr = mm.decode_media(payload)
    if arr.ndim == 3 and arr.shape[-1] != 3:
        arr = arr[0]
    h, w = arr.shape
    g = np.rint(arr.astype(np.float64) * 256).astype(int)
    tot = int(g.sum())

    def pool(R, C):
        S = np.zeros((R, C), int)
        N = np.zeros((R, C), int)
        for i in range(h):
            for j in range(w):
                S[i * R // h, j * C // w] += g[i, j]
                N[i * R // h, j * C // w] += 1
        return S, N

    S8, N8 = pool(8, 8)
    a = 0
    for r in range(8):
        for c in range(8):
            if S8[r, c] * (h * w) > tot * N8[r, c]:
                a |= 1 << (r * 8 + c)
    S9, N9 = pool(8, 9)
    d = 0
    for r in range(8):
        for c in range(8):
            if S9[r, c + 1] * N9[r, c] > S9[r, c] * N9[r, c + 1]:
                d |= 1 << (r * 8 + c)
    tc = lambda v: v - (1 << 64) if v >= (1 << 63) else v  # noqa: E731
    return tc(a), tc(d)


def _media_df(spark, texts, ids=None):
    ids = list(ids) if ids is not None else list(range(len(texts)))
    return mm.attach_media(spark.createDataFrame(
        pd.DataFrame({"doc_id": ids, "text": texts})))


def test_phash_matches_scalar_reference(spark):
    rng = np.random.default_rng(7)
    texts, ids = [], []
    for i in range(12):
        n = int(rng.integers(1, 900))
        texts.append("".join(chr(int(c)) for c in rng.integers(32, 127, n)))
        # ids 0/2 mod 3 → image/video; skip audio
        ids.append(i * 3 + (0 if i % 2 else 2))
    m = _media_df(spark, texts, ids).where("media_type != 'audio'")
    got = {r.doc_id: (r.ahash, r.dhash)
           for r in mm.image_phash(m).collect()}
    payloads = {r.doc_id: bytes(r.media) for r in m.collect()}
    assert set(got) == set(payloads)
    for doc_id, payload in payloads.items():
        assert got[doc_id] == _ref_phash(payload), doc_id


def test_phash_video_first_frame_equals_image(spark):
    # a P5 image and a y4m video whose FIRST frame carries the same
    # bytes must hash identically (the resize_media convention)
    h, w = 16, 16
    body = bytes((i * 37 + 11) % 256 for i in range(h * w))
    img = f"P5\n{w} {h}\n255\n".encode() + body
    vid = (f"YUV4MPEG2 W{w} H{h} F25:1 Ip A1:1 Cmono\n".encode()
           + b"FRAME\n" + body + b"FRAME\n" + bytes(h * w))
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2], "media": [img, vid]}))
    out = {r.doc_id: (r.ahash, r.dhash)
           for r in mm.image_phash(df).collect()}
    assert out[1] == out[2]
    assert out[1] == _ref_phash(img)


def test_phash_refuses_small_raster_and_audio(spark):
    tiny = b"P5\n4 4\n255\n" + bytes(16)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1], "media": [tiny]}))
    with pytest.raises(Exception, match="at least"):
        mm.image_phash(df).collect()
    audio = _media_df(spark, ["hello"], ids=[1])  # doc_id 1 → audio
    with pytest.raises(Exception, match="2-d raster"):
        mm.image_phash(audio.select("doc_id", "media")).collect()


def test_phash_one_pixel_mutation_bounded_and_pair_surfaces(spark):
    # one changed character changes one pixel → one pooling cell →
    # at most 2 dhash gradient flips; the 4×16-band blocking therefore
    # guarantees the pair surfaces (hamming ≤ 2 ≤ bands−1)
    base = "The quick brown fox jumps over the lazy dog. " * 12
    mut = "Z" + base[1:]
    m = _media_df(spark, [base, mut], ids=[0, 30])  # both images
    sig = mm.image_phash(m)
    rows = {r.doc_id: r for r in sig.collect()}
    ham = bin((rows[0].dhash ^ rows[30].dhash) & (2**64 - 1)).count("1")
    assert ham <= 2
    pairs = simhash_band_pairs(sig, id_col="doc_id", sig_col="dhash",
                               bands=4, max_hamming=3).collect()
    assert [(p.id_a, p.id_b, p.hamming) for p in pairs] == [(0, 30, ham)]


def test_phash_partition_invariance(spark):
    texts = [f"doc number {i} with some content " * (i + 1)
             for i in range(9)]
    m = _media_df(spark, texts, ids=[3 * i for i in range(9)])
    one = {r.doc_id: (r.ahash, r.dhash)
           for r in mm.image_phash(m.coalesce(1)).collect()}
    many = {r.doc_id: (r.ahash, r.dhash)
            for r in mm.image_phash(m.repartition(7)).collect()}
    assert one == many
