"""PCA/whitening golden tests: the distributed two-stage moment
aggregation + driver eigh must match a single-machine numpy PCA exactly
(same covariance convention, same deterministic sign fix)."""

import random

import numpy as np
import pytest

from feathub_spark.datapipe.decompose import fit_pca, pca_project


def _ref_pca(x, k, whiten=False, eps=1e-9):
    mu = x.mean(axis=0)
    cov = (x - mu).T @ (x - mu) / x.shape[0]
    evals, evecs = np.linalg.eigh((cov + cov.T) / 2.0)
    order = np.argsort(evals)[::-1]
    evals, evecs = evals[order][:k], evecs[:, order][:, :k]
    for j in range(evecs.shape[1]):
        i = int(np.argmax(np.abs(evecs[:, j])))
        if evecs[i, j] < 0:
            evecs[:, j] = -evecs[:, j]
    comps = evecs.T
    if whiten:
        comps = comps / np.sqrt(np.maximum(evals, 0.0) + eps)[:, None]
    return mu, comps, evals


def _data(n=300, d=8, seed=3):
    rnd = np.random.RandomState(seed)
    # anisotropic: a few dominant directions, like real embeddings
    basis = rnd.randn(d, d)
    scales = np.linspace(5.0, 0.1, d)
    return rnd.randn(n, d) * scales @ basis


@pytest.mark.parametrize("whiten", [False, True])
def test_fit_pca_matches_numpy(spark, whiten):
    x = _data()
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], ["id", "v"]
    ).repartition(7)  # multiple partials must sum exactly
    mean, comps, evals = fit_pca(df, "v", k=4, whiten=whiten)
    ref_mu, ref_comps, ref_evals = _ref_pca(x, 4, whiten=whiten)
    assert np.allclose(mean, ref_mu, atol=1e-9)
    assert np.allclose(evals, ref_evals, atol=1e-7)
    assert np.allclose(comps, ref_comps, atol=1e-7)


def test_pca_project_matches_numpy(spark):
    x = _data(n=200, d=6, seed=9)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], ["id", "v"]
    ).repartition(5)
    out = {r["id"]: r["pca"] for r in pca_project(df, "v", k=3).collect()}
    mu, comps, _ = _ref_pca(x, 3)
    exp = (x - mu) @ comps.T
    for i in range(len(x)):
        assert np.allclose(out[i], exp[i], atol=1e-7), i


def test_whitened_projection_has_unit_variance(spark):
    x = _data(n=500, d=6, seed=11)
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(x)], ["id", "v"]
    )
    out = np.asarray(
        [r["pca"] for r in pca_project(df, "v", k=4, whiten=True).collect()]
    )
    assert np.allclose(out.var(axis=0), 1.0, atol=1e-3)


def test_fit_once_project_elsewhere(spark):
    """The fit-on-sample / project-everything contract: a model fit on one
    frame projects another frame without refitting."""
    x = _data(n=100, d=5, seed=13)
    sample = spark.createDataFrame([(r.tolist(),) for r in x[:50]], ["v"])
    rest = spark.createDataFrame(
        [(i, r.tolist()) for i, r in enumerate(x[50:])], ["id", "v"]
    )
    model = fit_pca(sample, "v", k=2)
    out = {r["id"]: r["pca"] for r in pca_project(rest, "v", model=model).collect()}
    mu, comps = np.asarray(model[0]), np.asarray(model[1])
    for i, row in enumerate(x[50:]):
        assert np.allclose(out[i], (row - mu) @ comps.T, atol=1e-9)


def test_fit_pca_empty_raises(spark):
    df = spark.createDataFrame([], "v array<double>")
    with pytest.raises(ValueError, match="empty"):
        fit_pca(df, "v")
