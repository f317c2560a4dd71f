"""Estimator-level mesh= routing: the SPMD fits reached through the
reference-parity estimator API (KernelAA/ArchetypalAnalysis/GPNH/
KMeans/PCA), verified against the single-device paths on the virtual
8-device CPU mesh."""

import numpy as np
import pytest

from convex_dim_red_tpu import (ArchetypalAnalysis, GPNHConvexCoding,
                                KernelAA, KMeans, PCA)
from convex_dim_red_tpu.parallel.mesh import create_mesh, ensure_mesh_axes


def _planted(rng, n_samples=32, n_components=3, n_features=6):
    basis = rng.uniform(size=(n_components, n_features))
    Z = rng.uniform(size=(n_samples, n_components))
    Z /= Z.sum(axis=1, keepdims=True)
    idx = rng.choice(n_samples, size=n_components, replace=False)
    for comp, i in enumerate(idx):
        Z[i] = 0.0
        Z[i, comp] = 1.0
    return Z @ basis, idx


def _aa_state(rng, n, k):
    Z = rng.uniform(size=(n, k))
    Z /= Z.sum(axis=1, keepdims=True)
    C = rng.uniform(size=(k, n))
    C /= C.sum(axis=1, keepdims=True)
    return Z, C


def test_ensure_mesh_axes_lifts_1d_meshes():
    m_s = ensure_mesh_axes(create_mesh(shape=(8,), axis_names=("samples",)))
    assert m_s.axis_names == ("restarts", "samples")
    assert m_s.shape["restarts"] == 1 and m_s.shape["samples"] == 8

    m_r = ensure_mesh_axes(create_mesh(shape=(8,), axis_names=("restarts",)))
    assert m_r.shape["restarts"] == 8 and m_r.shape["samples"] == 1

    m_2d = create_mesh(shape=(2, 4), axis_names=("restarts", "samples"))
    assert ensure_mesh_axes(m_2d) is m_2d

    with pytest.raises(ValueError, match="axis_names"):
        ensure_mesh_axes(create_mesh(shape=(8,), axis_names=("data",)))


@pytest.mark.slow
def test_kernel_aa_estimator_mesh_matches_single_device():
    rng = np.random.RandomState(3)
    n, k = 32, 3
    X, _ = _planted(rng, n_samples=n, n_components=k)
    K = X @ X.T
    Z0, C0 = _aa_state(rng, n, k)
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    kw = dict(n_components=k, init='custom', tolerance=1e-10,
              max_iterations=200)
    est_m = KernelAA(mesh=mesh, **kw).fit(K, weights=Z0, dictionary=C0)
    est_0 = KernelAA(**kw).fit(K, weights=Z0, dictionary=C0)

    # Same init, same update math: the whole fit agrees to
    # reduction-order rounding.
    assert est_m.cost == pytest.approx(est_0.cost, rel=1e-8, abs=1e-9)
    assert np.allclose(np.asarray(est_m.weights).sum(axis=1), 1.0,
                       atol=1e-10)
    assert np.allclose(np.asarray(est_m.dictionary).sum(axis=1), 1.0,
                       atol=1e-10)
    assert np.allclose(np.asarray(est_m.weights),
                       np.asarray(est_0.weights), atol=1e-6)
    assert est_m.n_iter > 0
    assert len(est_m.cost_deltas) == est_m.n_iter


@pytest.mark.slow
def test_kernel_aa_estimator_mesh_delta_keeps_raw_dictionary():
    rng = np.random.RandomState(4)
    n, k = 32, 3
    X, _ = _planted(rng, n_samples=n, n_components=k)
    K = 1.4 * (X @ X.T)
    Z0, C0 = _aa_state(rng, n, k)
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    kw = dict(n_components=k, delta=0.2, init='custom', tolerance=1e-10,
              max_iterations=60, random_state=0)
    est_m = KernelAA(mesh=mesh, **kw).fit(K, weights=Z0, dictionary=C0)
    est_0 = KernelAA(**kw).fit(K, weights=Z0, dictionary=C0)

    assert est_m.cost == pytest.approx(est_0.cost, rel=1e-6, abs=1e-9)
    # KernelAA stores the RAW right-stochastic C (alpha separate), like
    # the single-device path.
    assert np.allclose(np.asarray(est_m.dictionary).sum(axis=1), 1.0,
                       atol=1e-8)
    a = np.asarray(est_m.alpha)
    assert (a >= 0.8 - 1e-12).all() and (a <= 1.2 + 1e-12).all()


@pytest.mark.slow
def test_archetypal_analysis_estimator_mesh_matches_single_device():
    rng = np.random.RandomState(5)
    n, k = 32, 3
    X, _ = _planted(rng, n_samples=n, n_components=k)
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    kw = dict(n_components=k, init='furthest_sum', tolerance=1e-10,
              max_iterations=300, random_state=0)
    est_m = ArchetypalAnalysis(mesh=mesh, **kw).fit(X)
    est_0 = ArchetypalAnalysis(**kw).fit(X)

    # Identical PRNG key consumption -> identical init -> same fit.
    assert est_m.cost == pytest.approx(est_0.cost, rel=1e-8, abs=1e-10)
    assert est_m.archetypes.shape == (k, X.shape[1])
    assert np.allclose(np.asarray(est_m.archetypes),
                       np.asarray(est_0.archetypes), atol=1e-5)
    # Planted hull: near-zero cost.
    assert est_m.cost < 1e-6

    # transform() is mesh-sharded too (per-row QPs over the sample
    # axis) and matches the single-device transform.
    w, cost = est_m.transform(X[:16])
    w0, cost0 = est_0.transform(X[:16])
    assert np.allclose(np.asarray(w).sum(axis=1), 1.0, atol=1e-8)
    assert cost == pytest.approx(cost0, rel=1e-6, abs=1e-10)
    assert np.allclose(np.asarray(w), np.asarray(w0), atol=1e-6)


@pytest.mark.slow
def test_archetypal_analysis_estimator_mesh_delta_scales_dictionary():
    rng = np.random.RandomState(6)
    n, k = 32, 2
    X, _ = _planted(rng, n_samples=n, n_components=k, n_features=4)
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    est = ArchetypalAnalysis(n_components=k, delta=0.3, init='random',
                             tolerance=1e-10, max_iterations=60,
                             random_state=1, mesh=mesh).fit(1.3 * X)
    a = np.asarray(est.alpha)
    assert (a >= 0.7 - 1e-12).all() and (a <= 1.3 + 1e-12).all()
    # Data-space convention: stored dictionary is alpha-scaled, so its
    # row sums equal alpha.
    assert np.allclose(np.asarray(est.dictionary).sum(axis=1), a,
                       atol=1e-8)


@pytest.mark.slow
def test_gpnh_estimator_mesh_matches_single_device():
    rng = np.random.RandomState(7)
    n, k, d = 32, 3, 5
    X, _ = _planted(rng, n_samples=n, n_components=k, n_features=d)
    Z0 = rng.uniform(size=(n, k))
    Z0 /= Z0.sum(axis=1, keepdims=True)
    W0 = rng.standard_normal((d, k))
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    kw = dict(n_components=k, lambda_W=1e-3, init='custom',
              tolerance=1e-10, max_iterations=200)
    est_m = GPNHConvexCoding(mesh=mesh, **kw).fit(X, weights=Z0,
                                                  dictionary=W0)
    est_0 = GPNHConvexCoding(**kw).fit(X, weights=Z0, dictionary=W0)

    assert est_m.cost == pytest.approx(est_0.cost, rel=1e-8, abs=1e-10)
    assert np.allclose(np.asarray(est_m.weights).sum(axis=1), 1.0,
                       atol=1e-10)
    assert np.allclose(np.asarray(est_m.dictionary),
                       np.asarray(est_0.dictionary), atol=1e-6)


@pytest.mark.slow
def test_kmeans_estimator_mesh_matches_single_device():
    rng = np.random.RandomState(8)
    X = np.concatenate([rng.standard_normal((16, 4)) + mu
                        for mu in (0.0, 5.0)])
    mesh = create_mesh(shape=(2, 4), axis_names=("restarts", "samples"))

    kw = dict(n_clusters=2, n_init=8, max_iter=100, tol=1e-6,
              random_state=0)
    km_m = KMeans(mesh=mesh, **kw).fit(X)
    km_0 = KMeans(**kw).fit(X)

    # Same key -> same n_init seeds -> identical best fit.
    assert km_m.inertia_ == pytest.approx(km_0.inertia_, rel=1e-10)
    assert np.array_equal(km_m.labels_, km_0.labels_) \
        or np.array_equal(km_m.labels_, 1 - km_0.labels_)

    # n_init not divisible by the restart axis: padded restarts are
    # masked out of the selection, result unchanged.
    km_p = KMeans(mesh=mesh, n_clusters=2, n_init=7, max_iter=100,
                  tol=1e-6, random_state=0).fit(X)
    assert np.isfinite(km_p.inertia_)


def test_pca_estimator_mesh_matches_gram_path():
    rng = np.random.RandomState(9)
    X = rng.standard_normal((24, 64))  # wide: the Gram-path regime
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    p_m = PCA(n_components=4, mesh=mesh)
    p_0 = PCA(n_components=4, use_gram=True)
    s_m = np.asarray(p_m.fit_transform(X))
    s_0 = np.asarray(p_0.fit_transform(X))

    assert np.allclose(p_m.explained_variance_, p_0.explained_variance_,
                       rtol=1e-8)
    assert np.allclose(p_m.explained_variance_ratio_,
                       p_0.explained_variance_ratio_, rtol=1e-8)
    # Eigenvectors are sign-ambiguous; compare per-component up to sign.
    for j in range(4):
        assert (np.allclose(s_m[:, j], s_0[:, j], atol=1e-8)
                or np.allclose(s_m[:, j], -s_0[:, j], atol=1e-8))
    # Round trip through the fitted basis.
    X_rec = p_m.inverse_transform(p_m.transform(X))
    X_rec0 = p_0.inverse_transform(p_0.transform(X))
    assert np.allclose(np.asarray(X_rec), np.asarray(X_rec0), atol=1e-8)


@pytest.mark.slow
def test_checkpoint_resume_through_sharded_estimator(tmp_path):
    """A checkpoint written mid-fit warm-starts a sharded fit via
    init='custom' + mesh= (the sharded analog of the single-device
    resume path, utils/checkpoint.py)."""
    from convex_dim_red_tpu.utils.checkpoint import (save_checkpoint,
                                                     load_checkpoint)

    rng = np.random.RandomState(11)
    n, k = 32, 3
    X, _ = _planted(rng, n_samples=n, n_components=k)
    K = X @ X.T
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    part = KernelAA(n_components=k, init='random', random_state=0,
                    tolerance=0, max_iterations=5, mesh=mesh)
    part.fit(K)  # tolerance=0: runs the full 5 iterations, no warning
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, {'weights': part.weights,
                           'dictionary': part.dictionary})
    state = load_checkpoint(path)

    resumed = KernelAA(n_components=k, init='custom', tolerance=1e-10,
                       max_iterations=300, mesh=mesh)
    resumed.fit(K, weights=state['weights'],
                dictionary=state['dictionary'])
    assert resumed.cost <= part.cost + 1e-12
    assert resumed.cost < 1e-6  # planted optimum reached after resume


def test_estimator_mesh_validation_errors():
    rng = np.random.RandomState(10)
    X, _ = _planted(rng, n_samples=30, n_components=3)  # 30 % 8 != 0
    mesh = create_mesh(shape=(8,), axis_names=("samples",))

    with pytest.raises(ValueError, match="divisible"):
        ArchetypalAnalysis(n_components=3, init='random', random_state=0,
                           mesh=mesh).fit(X)

    mesh_r = create_mesh(shape=(2, 4), axis_names=("restarts", "samples"))
    X32, _ = _planted(rng, n_samples=32, n_components=3)
    with pytest.raises(ValueError, match="restarts"):
        KernelAA(n_components=3, init='random', random_state=0,
                 mesh=mesh_r).fit(X32 @ X32.T)

    # Unknown weights-QP backends fail loudly under mesh= ('pallas'
    # itself is supported via the grouped kernel).
    with pytest.raises(ValueError, match="backend"):
        ArchetypalAnalysis(
            n_components=3, init='random', random_state=0,
            mesh=mesh, weights_solver_kwargs={'backend': 'numba'},
        ).fit(X32)
