"""Property tests for GPNH-regularized convex coding.

Ports the reference contract (reference tests/test_gpnh_convex_coding.py):
zero cost at perfect reconstruction, dictionary/weights updates decrease
the (regularized) cost, exact solutions are fixed points, and iterated
single-factor updates converge below the iteration cap.
"""

import numpy as np
import pytest

from convex_dim_red_tpu.models.gpnh_convex_coding import (
    GPNHConvexCoding,
    gpnh_cost,
    gpnh_regularization,
    iterate_gpnh_convex_coding,
    update_gpnh_dictionary,
    update_gpnh_weights,
)


def _right_stochastic(rng, shape):
    m = rng.uniform(size=shape)
    return m / m.sum(axis=1, keepdims=True)


def _gw(n_features, n_components):
    prefactor = 4.0 / (n_features * n_components * (n_components - 1))
    return prefactor * (n_components * np.eye(n_components) - 1)


def test_cost_zero_for_perfect_reconstruction_no_regularization():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 5, 3, 30

    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))
    X = Z @ W.T

    assert abs(float(gpnh_cost(X, Z, W, lambda_W=0))) < 1e-14


def test_regularization_matches_pairwise_definition():
    rng = np.random.RandomState(1)
    n_features, n_components = 9, 4
    W = rng.standard_normal((n_features, n_components))

    expected = 0.0
    for i in range(n_components):
        for j in range(i + 1, n_components):
            expected += np.linalg.norm(W[:, i] - W[:, j]) ** 2
    expected *= 2.0 / (n_components * n_features * (n_components - 1.0))

    assert abs(float(gpnh_regularization(W)) - expected) < 1e-12

    # Quadratic-form identity Phi(W) = 0.5 tr(W G_W W').
    GW = _gw(n_features, n_components)
    quad = 0.5 * np.trace(W @ GW @ W.T)
    assert abs(quad - expected) < 1e-12


def test_single_dictionary_update_reduces_cost_with_zero_lambda():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 7, 5, 450
    lambda_W = 0

    X = rng.uniform(size=(n_samples, n_features))
    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))

    GW = _gw(n_features, n_components)
    initial = float(gpnh_cost(X, Z, W, lambda_W=lambda_W))
    W_new = np.asarray(update_gpnh_dictionary(X, Z, Z.T @ Z, GW,
                                              lambda_W=lambda_W))
    final = float(gpnh_cost(X, Z, W_new, lambda_W=lambda_W))
    assert final <= initial


def test_single_dictionary_update_reduces_cost_with_nonzero_lambda():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 11, 6, 230
    lambda_W = 3.2

    X = rng.uniform(size=(n_samples, n_features))
    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))

    GW = _gw(n_features, n_components)
    initial = float(gpnh_cost(X, Z, W, lambda_W=lambda_W))
    W_new = np.asarray(update_gpnh_dictionary(X, Z, Z.T @ Z, GW,
                                              lambda_W=lambda_W))
    final = float(gpnh_cost(X, Z, W_new, lambda_W=lambda_W))
    assert final <= initial


def test_exact_solution_is_dictionary_update_fixed_point():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 10, 6, 40
    tolerance = 1e-12

    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))
    X = Z @ W.T

    GW = _gw(n_features, n_components)
    initial = float(gpnh_cost(X, Z, W, lambda_W=0))
    W_new = np.asarray(update_gpnh_dictionary(X, Z, Z.T @ Z, GW, lambda_W=0))
    final = float(gpnh_cost(X, Z, W_new, lambda_W=0))

    assert abs(final - initial) < tolerance
    assert np.allclose(W_new, W, atol=1e-8)


def test_single_weights_update_reduces_cost_with_zero_lambda():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 13, 4, 320

    X = rng.uniform(size=(n_samples, n_features))
    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))

    initial = float(gpnh_cost(X, Z, W, lambda_W=0))
    Z_new = np.asarray(update_gpnh_weights(X, Z, W))
    final = float(gpnh_cost(X, Z_new, W, lambda_W=0))

    assert final <= initial
    assert np.allclose(Z_new.sum(axis=1), 1, atol=1e-12)


def test_single_weights_update_reduces_cost_with_nonzero_lambda():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 6, 3, 500
    lambda_W = 1.7

    X = rng.uniform(size=(n_samples, n_features))
    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))

    initial = float(gpnh_cost(X, Z, W, lambda_W=lambda_W))
    Z_new = np.asarray(update_gpnh_weights(X, Z, W))
    final = float(gpnh_cost(X, Z_new, W, lambda_W=lambda_W))

    assert final <= initial
    assert np.allclose(Z_new.sum(axis=1), 1, atol=1e-12)


def test_exact_solution_is_weights_update_fixed_point():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 25, 7, 60
    tolerance = 1e-12

    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))
    X = Z @ W.T

    initial = float(gpnh_cost(X, Z, W, lambda_W=0))
    Z_new = np.asarray(update_gpnh_weights(X, Z, W))
    final = float(gpnh_cost(X, Z_new, W, lambda_W=0))

    assert abs(final - initial) < tolerance
    assert np.allclose(Z_new.sum(axis=1), 1, atol=1e-12)
    assert np.allclose(Z_new, Z, atol=1e-10)


def test_repeated_dictionary_updates_converge():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 19, 6, 300
    max_iterations, tolerance = 500, 1e-6

    X = rng.uniform(size=(n_samples, n_features))
    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))

    initial = float(gpnh_cost(X, Z, W, lambda_W=0))
    Z_new, W_new, cost, n_iter, _, _ = iterate_gpnh_convex_coding(
        X, Z, W, lambda_W=0,
        update_weights=False, update_dictionary=True,
        tolerance=tolerance, max_iterations=max_iterations,
        require_monotonic_cost_decrease=True)

    assert float(cost) <= initial
    assert n_iter < max_iterations
    assert np.allclose(np.asarray(Z_new), Z, atol=1e-12)


def test_repeated_weights_updates_converge():
    rng = np.random.RandomState(0)
    n_features, n_components, n_samples = 10, 5, 350
    max_iterations, tolerance = 500, 1e-6
    lambda_W = 2.3

    X = rng.uniform(size=(n_samples, n_features))
    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))

    initial = float(gpnh_cost(X, Z, W, lambda_W=lambda_W))
    Z_new, W_new, cost, n_iter, _, _ = iterate_gpnh_convex_coding(
        X, Z, W, lambda_W=lambda_W,
        update_weights=True, update_dictionary=False,
        tolerance=tolerance, max_iterations=max_iterations,
        require_monotonic_cost_decrease=True)

    assert float(cost) <= initial
    assert n_iter < max_iterations
    assert np.allclose(np.asarray(W_new), W, atol=1e-12)
    assert np.allclose(np.asarray(Z_new).sum(axis=1), 1, atol=1e-12)


@pytest.mark.slow
def test_full_fit_recovers_planted_factorization_cost():
    rng = np.random.RandomState(2)
    n_features, n_components, n_samples = 8, 4, 200

    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))
    X = Z @ W.T

    model = GPNHConvexCoding(n_components=n_components, lambda_W=0,
                             init='random', tolerance=1e-10,
                             max_iterations=800, random_state=0)
    Z_fit = np.asarray(model.fit_transform(X))

    assert Z_fit.shape == (n_samples, n_components)
    assert np.allclose(Z_fit.sum(axis=1), 1, atol=1e-10)
    # Reconstruction cost should approach zero for the planted problem.
    assert model.cost < 1e-4

    # transform/inverse_transform round trip.
    Z_t, cost_t = model.transform(X)
    assert np.isfinite(cost_t)
    recon = np.asarray(model.inverse_transform(Z_t))
    assert recon.shape == X.shape


def test_fit_with_furthest_sum_init():
    rng = np.random.RandomState(3)
    n_features, n_components, n_samples = 6, 3, 120

    W = rng.uniform(size=(n_features, n_components))
    Z = _right_stochastic(rng, (n_samples, n_components))
    X = Z @ W.T

    model = GPNHConvexCoding(n_components=n_components, lambda_W=1e-4,
                             init='furthest_sum', tolerance=1e-8,
                             max_iterations=500, random_state=1)
    Z_fit = np.asarray(model.fit_transform(X))
    assert np.allclose(Z_fit.sum(axis=1), 1, atol=1e-10)
    assert model.n_iter < 500


def test_iterate_gpnh_verbose_chunked_table(capsys):
    """verbose=1 renders the reference table (gpnh_convex_coding.py:
    334-337, :392) with a Time column, host-side (no callbacks), and
    the chunked trajectory equals the non-verbose single program."""
    rng = np.random.RandomState(5)
    X = rng.uniform(size=(60, 8))
    W = rng.uniform(size=(8, 3))
    Z = _right_stochastic(rng, (60, 3))

    quiet = iterate_gpnh_convex_coding(
        X, Z, W, lambda_W=0.1, tolerance=1e-9, max_iterations=200)
    capsys.readouterr()
    loud = iterate_gpnh_convex_coding(
        X, Z, W, lambda_W=0.1, tolerance=1e-9, max_iterations=200,
        verbose=1)
    out = capsys.readouterr().out
    lines = out.splitlines()

    assert lines[0] == '*** GPNH convex coding: n_components = 3 ***'
    header = [c.strip() for c in lines[1].split('|')]
    assert header == ['Iteration', 'Cost', 'Cost delta', 'Time']

    n_iter = loud[3]
    assert n_iter == quiet[3]
    assert float(loud[2]) == pytest.approx(float(quiet[2]), rel=1e-12)
    rows = [ln for ln in lines if ln.count('|') == 3 and 'Cost' not in ln]
    assert len(rows) == n_iter
    assert any('*** Converged at iteration' in ln for ln in lines)
    np.testing.assert_allclose(loud[5], quiet[5], rtol=1e-10, atol=1e-14)


def test_iterate_gpnh_verbose_zero_iterations(capsys):
    """max_iterations=0 must return the initial cost (not None) on the
    verbose path, matching the quiet path."""
    rng = np.random.RandomState(9)
    X = rng.uniform(size=(20, 4))
    W = rng.uniform(size=(4, 2))
    Z = _right_stochastic(rng, (20, 2))

    quiet = iterate_gpnh_convex_coding(
        X, Z, W, lambda_W=0.1, tolerance=1e-9, max_iterations=0)
    loud = iterate_gpnh_convex_coding(
        X, Z, W, lambda_W=0.1, tolerance=1e-9, max_iterations=0,
        verbose=1)
    capsys.readouterr()
    assert quiet[2] is not None and loud[2] is not None
    assert float(loud[2]) == pytest.approx(float(quiet[2]), rel=1e-12)
    assert loud[3] == quiet[3] == 0
    assert len(loud[5]) == 0
