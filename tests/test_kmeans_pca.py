"""Tests for the JAX k-means, gap statistic, and PCA."""

import numpy as np
import jax
import pytest

from convex_dim_red_tpu.models.kmeans import (
    KMeans, gap_statistic, kmeans_plusplus)
from convex_dim_red_tpu.models.pca import PCA


def _blobs(rng, n_per=50, centers=((0, 0), (10, 10), (-10, 10)), scale=0.5):
    pts = [c + scale * rng.standard_normal((n_per, 2)) for c in
           np.asarray(centers, dtype=float)]
    return np.concatenate(pts, axis=0)


def test_kmeans_recovers_separated_blobs():
    rng = np.random.RandomState(0)
    X = _blobs(rng)

    model = KMeans(n_clusters=3, n_init=5, random_state=0).fit(X)
    centers = np.sort(np.asarray(model.cluster_centers_), axis=0)
    expected = np.sort(np.array([[0, 0], [10, 10], [-10, 10]],
                                dtype=float), axis=0)
    assert np.allclose(centers, expected, atol=0.5)

    # Every blob maps to a single label.
    labels = model.labels_
    for i in range(3):
        blob = labels[i * 50:(i + 1) * 50]
        assert len(set(blob.tolist())) == 1


def test_kmeans_random_init_recovers_blobs():
    # init='random' flag parity (reference run_hadisst_kmeans.py:48-49).
    rng = np.random.RandomState(3)
    X = _blobs(rng)
    model = KMeans(n_clusters=3, init='random', n_init=10,
                   random_state=0).fit(X)
    centers = np.sort(np.asarray(model.cluster_centers_), axis=0)
    expected = np.sort(np.array([[0, 0], [10, 10], [-10, 10]],
                                dtype=float), axis=0)
    assert np.allclose(centers, expected, atol=0.5)


def test_kmeans_rejects_unknown_init():
    with pytest.raises(ValueError):
        KMeans(n_clusters=2, init='bogus')


def test_kmeans_transform_returns_center_distances():
    rng = np.random.RandomState(4)
    X = _blobs(rng)
    model = KMeans(n_clusters=3, n_init=5, random_state=0).fit(X)
    D = model.transform(X)
    centers = np.asarray(model.cluster_centers_)
    expected = np.sqrt(((X[:, None, :] - centers[None]) ** 2).sum(-1))
    assert D.shape == (X.shape[0], 3)
    assert np.allclose(D, expected, atol=1e-8)
    # argmin of transform distances == predict labels.
    assert np.array_equal(np.argmin(D, axis=1), model.predict(X))


def test_kmeans_inertia_matches_sklearn_quality():
    sklearn = pytest.importorskip('sklearn.cluster')
    rng = np.random.RandomState(1)
    X = rng.standard_normal((200, 5))

    ours = KMeans(n_clusters=4, n_init=10, random_state=0).fit(X)
    ref = sklearn.KMeans(n_clusters=4, n_init=10, random_state=0).fit(X)
    # Within 2% of sklearn's inertia on an unstructured problem.
    assert ours.inertia_ <= ref.inertia_ * 1.02


def test_kmeans_predict_consistent_with_labels():
    rng = np.random.RandomState(2)
    X = _blobs(rng)
    model = KMeans(n_clusters=3, n_init=3, random_state=0).fit(X)
    assert np.array_equal(model.predict(X), model.labels_)


def test_kmeans_plusplus_selects_spread_centroids():
    rng = np.random.RandomState(3)
    X = _blobs(rng)
    centroids = np.asarray(kmeans_plusplus(
        np.asarray(X), 3, jax.random.PRNGKey(0)))
    # Seeds should land in distinct blobs with overwhelming probability.
    dists = np.linalg.norm(centroids[:, None] - centroids[None, :], axis=-1)
    np.fill_diagonal(dists, np.inf)
    assert dists.min() > 5.0


@pytest.mark.slow
def test_gap_statistic_prefers_true_k():
    rng = np.random.RandomState(4)
    X = _blobs(rng, n_per=40)

    gaps = {}
    for k in (1, 2, 3, 4):
        model = KMeans(n_clusters=k, n_init=5, random_state=0).fit(X)
        gap, sk = gap_statistic(X, model.inertia_, k, n_trials=20,
                                reference='uniform', random_state=0)
        gaps[k] = (gap, sk)
        assert np.isfinite(gap) and np.isfinite(sk) and sk >= 0

    # Gap at the true k=3 exceeds gap at k=2 and k=1.
    assert gaps[3][0] > gaps[2][0] > gaps[1][0]


def test_gap_statistic_pca_reference():
    rng = np.random.RandomState(5)
    X = _blobs(rng, n_per=30)
    model = KMeans(n_clusters=3, n_init=5, random_state=0).fit(X)
    gap, sk = gap_statistic(X, model.inertia_, 3, n_trials=10,
                            reference='pca', random_state=0)
    assert np.isfinite(gap) and np.isfinite(sk)


def test_gap_statistic_rejects_unknown_reference():
    with pytest.raises(ValueError):
        gap_statistic(np.eye(4), 1.0, 2, n_trials=2, reference='bogus',
                      random_state=0)


def test_pca_matches_numpy_svd():
    rng = np.random.RandomState(6)
    X = rng.standard_normal((40, 12))

    model = PCA(n_components=5)
    scores = np.asarray(model.fit_transform(X))

    Xc = X - X.mean(axis=0)
    U, S, Vh = np.linalg.svd(Xc, full_matrices=False)
    expected_var = (S[:5] ** 2) / (40 - 1)

    assert np.allclose(model.explained_variance_, expected_var, atol=1e-8)
    # Components match up to sign.
    comp = np.asarray(model.components_)
    for i in range(5):
        dot = abs(np.dot(comp[i], Vh[i]))
        assert abs(dot - 1.0) < 1e-8
    # Scores reproduce the projections up to sign.
    proj = Xc @ comp.T
    assert np.allclose(scores, proj, atol=1e-8)


def test_pca_gram_path_matches_svd_path():
    rng = np.random.RandomState(7)
    X = rng.standard_normal((20, 300))  # very wide: Gram path territory

    svd_model = PCA(n_components=4, use_gram=False)
    gram_model = PCA(n_components=4, use_gram=True)
    s1 = np.asarray(svd_model.fit_transform(X))
    s2 = np.asarray(gram_model.fit_transform(X))

    assert np.allclose(svd_model.explained_variance_,
                       gram_model.explained_variance_, rtol=1e-8)
    for i in range(4):
        assert abs(abs(np.dot(np.asarray(svd_model.components_)[i],
                              np.asarray(gram_model.components_)[i]))
                   - 1.0) < 1e-7
        assert np.allclose(np.abs(s1[:, i]), np.abs(s2[:, i]), atol=1e-7)


def test_pca_roundtrip_reconstruction():
    rng = np.random.RandomState(8)
    # Low-rank data: full-rank PCA reconstructs exactly.
    A = rng.standard_normal((30, 3))
    B = rng.standard_normal((3, 50))
    X = A @ B

    model = PCA(n_components=3)
    scores = model.fit_transform(X)
    recon = np.asarray(model.inverse_transform(scores))
    assert np.allclose(recon, X, atol=1e-8)
