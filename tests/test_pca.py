"""EmbeddingPCA: numpy-exact recovery, invariants, determinism,
save/load."""

import numpy as np
import pytest

from flink_ml__spark.functions.similarity import (
    EmbeddingPCA,
    EmbeddingPCAModel,
)


def _make_df(spark, X):
    return spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>")


@pytest.fixture(scope="module")
def lowrank(spark):
    rng = np.random.default_rng(5)
    # rank-2 data in 6 dims + small isotropic noise
    u = np.array([1.0, 0, 0, 1.0, 0, 0]) / np.sqrt(2)
    v = np.array([0, 1.0, 0, 0, -1.0, 0]) / np.sqrt(2)
    A = rng.normal(0, 3.0, 200)[:, None] * u
    B = rng.normal(0, 1.5, 200)[:, None] * v
    X = A + B + rng.normal(0, 0.01, (200, 6)) + 10.0
    return X, _make_df(spark, X)


def test_pca_matches_numpy_reference(spark, lowrank):
    X, df = lowrank
    model = EmbeddingPCA().setK(3).fit(df)
    mean = X.mean(0)
    cov = np.cov(X, rowvar=False, ddof=1)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:3]
    np.testing.assert_allclose(model._mean, mean, rtol=1e-10)
    np.testing.assert_allclose(model._eigvals, vals[order], rtol=1e-8)
    W_ref = vecs[:, order].T
    for i, row in enumerate(np.asarray(model._components)):
        j = np.argmax(np.abs(W_ref[i]))
        ref = W_ref[i] if W_ref[i, j] > 0 else -W_ref[i]
        np.testing.assert_allclose(row, ref, atol=1e-8)
    # the two real directions dominate
    ratios = model.explained_variance_ratio
    assert sum(ratios[:2]) > 0.999
    assert ratios == sorted(ratios, reverse=True)


def test_pca_projection_and_orthonormality(spark, lowrank):
    X, df = lowrank
    model = EmbeddingPCA().setK(2).fit(df)
    W = np.asarray(model._components)
    np.testing.assert_allclose(W @ W.T, np.eye(2), atol=1e-10)
    got = {r["vec_id"]: r["pca"] for r in model.transform(df).collect()}
    ref = (X - np.asarray(model._mean)) @ W.T
    for i in range(len(X)):
        np.testing.assert_allclose(got[i], ref[i], atol=1e-9)
    # per-component sample variance equals the eigenvalue
    P = np.array([got[i] for i in range(len(X))])
    np.testing.assert_allclose(P.var(0, ddof=1), model._eigvals,
                               rtol=1e-8)


def test_pca_partitioning_invariance_and_guard(spark, lowrank):
    X, df = lowrank
    m1 = EmbeddingPCA().setK(2).fit(df)
    m2 = EmbeddingPCA().setK(2).fit(df.repartition(7))
    np.testing.assert_allclose(m1._components, m2._components, atol=1e-9)
    with pytest.raises(ValueError):
        EmbeddingPCA().fit(_make_df(spark, X[:1]))


def test_pca_save_load(spark, lowrank, tmp_path):
    X, df = lowrank
    model = EmbeddingPCA().setK(2).fit(df)
    path = str(tmp_path / "pca")
    model.save(path)
    loaded = EmbeddingPCAModel.load(spark, path)
    before = model.transform(df).orderBy("vec_id").first()["pca"]
    after = loaded.transform(df).orderBy("vec_id").first()["pca"]
    np.testing.assert_allclose(before, after)
