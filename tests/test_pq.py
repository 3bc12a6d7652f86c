"""Product quantization: native-expression encode parity, ADC
semantics, training determinism, frozen-artifact pin."""
from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from cesium_spark.operators import pq


def _embs(spark, X, start_id=0):
    pdf = pd.DataFrame({
        "vec_id": np.arange(start_id, start_id + len(X), dtype=np.int64),
        "embedding": [np.asarray(r, dtype=np.float32).tolist()
                      for r in X]})
    return spark.createDataFrame(pdf)


def _np_codes(X, cb):
    m, ksub, dsub = cb.shape
    Xd = np.stack([np.asarray(r, dtype=np.float32) for r in X]).astype(
        np.float64)
    return np.stack([
        np.argmin(((Xd[:, i * dsub:(i + 1) * dsub, None]
                    - cb[i].T[None, :, :]) ** 2).sum(axis=1), axis=1)
        for i in range(m)], axis=1)


def test_encode_matches_numpy_argmin(spark):
    rng = np.random.default_rng(8)
    X = rng.normal(0, 1, (80, 16))
    cb = rng.normal(0, 1, (4, 8, 4))
    got = pq.pq_encode(_embs(spark, X), cb).orderBy("vec_id").toPandas()
    ref = _np_codes(X, cb)
    for i in range(4):
        assert (got[f"code_{i}"].to_numpy() == ref[:, i]).all()
    bits = 3
    packed = sum(ref[:, i].astype(np.int64) << (bits * i)
                 for i in range(4))
    assert (got.pq_code.to_numpy() == packed).all()


def test_encode_tie_breaks_to_first_codeword(spark):
    # duplicate codewords: argmin must pick the SMALLER index
    cb = np.zeros((1, 4, 2))
    cb[0, 1] = [5.0, 5.0]
    cb[0, 2] = [5.0, 5.0]   # identical to codeword 1
    cb[0, 3] = [9.0, 9.0]
    got = pq.pq_encode(_embs(spark, [[5.0, 5.0]]), cb).collect()[0]
    assert got.code_0 == 1


def test_adc_equals_exact_on_reconstructions(spark):
    """Vectors that ARE codeword reconstructions have adc == exact_sq
    (the quantization error is zero), and the query finds itself."""
    rng = np.random.default_rng(3)
    cb = rng.normal(0, 1, (4, 8, 4))
    codes = rng.integers(0, 8, (30, 4))
    X = np.concatenate([cb[i][codes[:, i]] for i in range(4)], axis=1)
    X = np.asarray(X, dtype=np.float32)  # storage representation
    q = [float(x) for x in X[7]]
    top = pq.pq_adc_topk(_embs(spark, X), q, cb, k=5).toPandas()
    assert top.vec_id.iloc[0] == 7 or top.adc.iloc[0] == top.adc.iloc[1]
    self_row = top[top.vec_id == 7].iloc[0]
    assert self_row.exact_sq == 0.0
    # float32 storage perturbs the reconstruction by <1e-6 per dim;
    # adc ~ exact for every winner
    assert np.allclose(top.adc, top.exact_sq, atol=1e-4)


def test_adc_ranking_tracks_exact_on_random_corpus(spark):
    rng = np.random.default_rng(12)
    X = rng.normal(0, 1, (120, 16)).astype(np.float32)
    df = _embs(spark, X)
    cb = pq.pq_train(df, 16, m=4, ksub=8, n_iter=4)
    q = [float(x) for x in X[0]]
    top = pq.pq_adc_topk(df, q, cb, k=10).toPandas()
    exact = ((X.astype(np.float64)
              - np.asarray(q)[None, :]) ** 2).sum(axis=1)
    true_top10 = set(np.argsort(exact, kind="stable")[:10])
    recall = len(set(top.vec_id) & true_top10) / 10
    assert recall >= 0.5, recall
    assert top.vec_id.iloc[0] == 0  # the query itself wins


def test_train_reduces_quantization_error(spark):
    rng = np.random.default_rng(4)
    centers = rng.normal(0, 3, (6, 16))
    X = np.repeat(centers, 25, axis=0) + rng.normal(0, 0.1, (150, 16))
    df = _embs(spark, X)

    def mse(cb):
        codes = _np_codes(X.astype(np.float32), cb)
        recon = np.concatenate(
            [cb[i][codes[:, i]] for i in range(cb.shape[0])], axis=1)
        return float(((X.astype(np.float32).astype(np.float64)
                       - recon) ** 2).sum(axis=1).mean())

    cb0 = pq.pq_train(df, 16, m=4, ksub=8, n_iter=0)
    cb4 = pq.pq_train(df, 16, m=4, ksub=8, n_iter=4)
    assert mse(cb4) < mse(cb0) * 0.8


def test_train_partition_invariant(spark):
    rng = np.random.default_rng(6)
    X = rng.normal(0, 1, (90, 16))
    df = _embs(spark, X)
    cb_a = pq.pq_train(df, 16, m=4, ksub=8, n_iter=3)
    cb_b = pq.pq_train(df.repartition(13), 16, m=4, ksub=8, n_iter=3)
    assert (cb_a == cb_b).all()  # decimal sums: bit-identical


def test_null_vectors_dropped(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"vec_id": [0, 1],
                      "embedding": [[1.0] * 8, None]}))
    cb = np.zeros((2, 2, 4))
    cb[:, 1] = 1.0
    out = pq.pq_encode(df, cb).collect()
    assert len(out) == 1 and out[0].vec_id == 0
    assert out[0].code_0 == 1 and out[0].code_1 == 1


def test_validation():
    with pytest.raises(ValueError, match="m, ksub, dsub"):
        pq.pq_encode(None, np.zeros((2, 2)))
    with pytest.raises(ValueError, match="not divisible"):
        pq.pq_train(None, 10, m=3)
    with pytest.raises(ValueError, match="query dim"):
        pq.pq_luts([1.0] * 5, np.zeros((2, 2, 4)))


def test_frozen_artifact_pin(spark):
    """The shipped codebooks have the contracted shape and encode the
    sf0.01 corpus with bounded quantization error (guards accidental
    retraining drift)."""
    from cesium_spark.operators._pq_trained import TRAINED_CODEBOOKS
    cb = np.asarray(TRAINED_CODEBOOKS, dtype=np.float64)
    assert cb.shape == (8, 16, 8)
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    X = np.stack(embs.toPandas().embedding.to_numpy()).astype(np.float64)
    codes = _np_codes(X.astype(np.float32), cb)
    recon = np.concatenate([cb[i][codes[:, i]] for i in range(8)], axis=1)
    mse = ((X - recon) ** 2).sum(axis=1).mean()
    assert mse < 0.75 * (X ** 2).sum(axis=1).mean()


# --- embedding_dim_stats (embedding-corpus health) ---------------------------

def test_dim_stats_detects_collapsed_dim(spark):
    from cesium_spark.operators.similarity import embedding_dim_stats
    rng = np.random.default_rng(2)
    X = rng.normal(0, 1, (60, 8))
    X[:, 3] = 0.25            # dead dimension (constant)
    out = {r.dim: r for r in
           embedding_dim_stats(_embs(spark, X)).collect()}
    assert len(out) == 8
    assert out[4].collapsed is True and out[4].variance == 0.0
    assert out[4].mean == pytest.approx(0.25, abs=1e-6)
    for d in (1, 2, 5):
        assert out[d].collapsed is False
        ref = X[:, d - 1].astype(np.float32).astype(np.float64)
        assert out[d].mean == pytest.approx(ref.mean(), abs=1e-9)
        assert out[d].variance == pytest.approx(ref.var(), rel=1e-9)
        assert out[d].n_vecs == 60


def test_dim_stats_null_vectors_dropped(spark):
    from cesium_spark.operators.similarity import embedding_dim_stats
    df = spark.createDataFrame(pd.DataFrame({
        "vec_id": [0, 1, 2],
        "embedding": [[1.0, 2.0], None, [3.0, 4.0]]}))
    out = {r.dim: r for r in embedding_dim_stats(df).collect()}
    assert out[1].n_vecs == 2 and out[1].min_val == 1.0
    assert out[2].max_val == 4.0


def test_dim_stats_shuffle_carries_dims_not_corpus(spark):
    from cesium_spark.operators.similarity import embedding_dim_stats
    rng = np.random.default_rng(1)
    df = embedding_dim_stats(_embs(spark, rng.normal(0, 1, (40, 4))))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # partial aggregate BEFORE the exchange (map-side combine)
    assert plan.index("HashAggregate") < plan.index("Exchange"), plan


# --- embedding anisotropy -----------------------------------------------------

def test_anisotropy_separates_isotropic_from_collapsed(spark):
    from cesium_spark.operators.similarity import embedding_anisotropy
    rng = np.random.default_rng(7)
    iso = embedding_anisotropy(
        _embs(spark, rng.normal(0, 1, (200, 16))), stride=37).collect()[0]
    assert abs(iso.cos_mean) < 0.15 and iso.n_pairs == 200
    base = rng.normal(0, 1, 16)
    collapsed = base[None, :] + rng.normal(0, 0.05, (200, 16))
    col = embedding_anisotropy(
        _embs(spark, collapsed), stride=37).collect()[0]
    assert col.cos_mean > 0.95
    assert col.cos_p05 > 0.9   # the whole distribution is a cone


def test_anisotropy_drops_zero_vectors_and_validates(spark):
    from cesium_spark.operators.similarity import embedding_anisotropy
    rng = np.random.default_rng(3)
    X = rng.normal(0, 1, (30, 8))
    X[4] = 0.0                 # zero-norm: no direction
    out = embedding_anisotropy(_embs(spark, X), stride=7).collect()[0]
    assert out.n_dropped == 1 and out.n_pairs == 29
    with pytest.raises(ValueError, match="stride"):
        embedding_anisotropy(_embs(spark, X), stride=0)
    with pytest.raises(ValueError, match="need >= 2"):
        embedding_anisotropy(_embs(spark, np.zeros((3, 8))))
