"""Tests for the C++ host-kernel library against the JAX/NumPy paths."""

import numpy as np
import pytest

from convex_dim_red_tpu.utils import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native toolchain unavailable")

from convex_dim_red_tpu.ops.simplex_projection import simplex_project_rows
from convex_dim_red_tpu.ops.furthest_sum import furthest_sum
from convex_dim_red_tpu.solvers.spg import quad_simplex_spg_batch


def test_native_projection_matches_jax():
    rng = np.random.RandomState(0)
    x = 5.0 * rng.standard_normal((50, 7))
    p_native = native.simplex_project_rows_native(x)
    p_jax = np.asarray(simplex_project_rows(x))
    assert np.allclose(p_native, p_jax, atol=1e-12)


def test_native_qp_matches_jax_objective():
    rng = np.random.RandomState(1)
    k, n = 6, 40
    M = rng.standard_normal((k, k))
    A = M @ M.T + np.eye(k)
    B = rng.standard_normal((n, k))
    X0 = np.full((n, k), 1.0 / k)

    Xn = native.quad_simplex_spg_batch_native(A, B, X0)
    Xj = np.asarray(quad_simplex_spg_batch(A, B, X0))

    assert np.allclose(Xn.sum(axis=1), 1.0, atol=1e-12)
    assert (Xn >= -1e-15).all()

    def obj(X):
        return 0.5 * np.einsum('ij,jk,ik->i', X, A, X) + (X * B).sum(1)
    assert np.abs(obj(Xn) - obj(Xj)).max() < 1e-8


def test_native_furthest_sum_matches_host():
    rng = np.random.RandomState(2)
    X = rng.standard_normal((30, 4))
    D = np.linalg.norm(X[:, None] - X[None, :], axis=-1)
    for start in (0, 7, 29):
        for extra in (0, 1, 10):
            got = sorted(native.furthest_sum_native(D, 5, start,
                                                    extra_steps=extra))
            want = sorted(furthest_sum(D, 5, start, None, extra))
            assert got == list(want)


def test_native_furthest_sum_three_point_case():
    K = np.array([[0, 1, 2], [1, 0, 0.5], [2, 0.5, 0]], dtype=float)
    for start in range(3):
        for extra in range(1, 11):
            got = sorted(native.furthest_sum_native(K, 2, start,
                                                    extra_steps=extra))
            assert got == [0, 2]
