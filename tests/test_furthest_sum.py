"""Tests for FurthestSum initialization.

Ports the reference contract (reference tests/test_furthest_sum.py):
error paths, degenerate cases, exact small-case selection, and
convex-hull-vertex recovery; plus agreement between the host and
jittable device implementations.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from convex_dim_red_tpu.ops.furthest_sum import (
    furthest_sum, furthest_sum_device, dissimilarities_from_kernel)
from convex_dim_red_tpu.ops.stochastic_matrices import left_stochastic_matrix

import jax


def test_throws_on_nonsquare_dissimilarity_matrix():
    X = np.random.RandomState(0).uniform(size=(20, 10))
    with pytest.raises(ValueError):
        furthest_sum(X, 2, 0)


def test_throws_when_given_out_of_bounds_start_index():
    K = np.random.RandomState(0).uniform(size=(10, 10))
    with pytest.raises(ValueError):
        furthest_sum(K, 5, 20)


def test_throws_when_start_index_is_excluded():
    K = np.random.RandomState(0).uniform(size=(9, 9))
    with pytest.raises(ValueError):
        furthest_sum(K, 8, 0, np.arange(9))


def test_throws_error_when_not_enough_points():
    n_samples, n_components = 32, 5
    n_exclude = n_samples - n_components + 2
    K = np.random.RandomState(0).uniform(size=(n_samples, n_samples))
    with pytest.raises(ValueError):
        furthest_sum(K, n_components, n_samples - 1, np.arange(n_exclude))


def test_returns_empty_vector_when_no_components_requested():
    K = np.random.RandomState(0).uniform(size=(6, 6))
    assert len(furthest_sum(K, 0, 0)) == 0


def test_returns_all_indices_when_components_equal_points():
    n = 20
    K = np.random.RandomState(0).uniform(size=(n, n))
    result = sorted(furthest_sum(K, n, 5))
    assert len(set(result)) == n
    assert result == list(range(n))


def test_returns_correct_index_when_only_one_sample_present():
    K = np.random.RandomState(0).uniform(size=(1, 1))
    result = furthest_sum(K, 1, 0)
    assert len(result) == 1 and result[0] == 0


def test_returns_non_excluded_index_when_only_possible():
    n = 102
    K = np.random.RandomState(0).uniform(size=(n, n))
    leave_in = 74
    exclude = [i for i in range(n) if i != leave_in]
    result = furthest_sum(K, 1, leave_in, exclude)
    assert len(result) == 1 and result[0] == leave_in


def test_selects_correct_elements_out_of_three_for_all_starting_points():
    K = np.array([[0, 1, 2], [1, 0, 0.5], [2, 0.5, 0]])
    expected = [0, 2]
    for start in range(3):
        for extra in range(1, 11):
            result = sorted(furthest_sum(K, 2, start, [], extra))
            assert result == expected


def test_selects_elements_in_convex_hull():
    n_samples = 10
    basis = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0]])
    n_basis = basis.shape[0]

    key = jax.random.PRNGKey(0)
    weights = np.array(left_stochastic_matrix(key, (n_samples, n_basis)))

    assignments = [0, 4, 6, 9]
    for i in range(n_basis):
        weights[assignments[i]] = 0.0
        weights[assignments[i], i] = 1.0

    X = weights @ basis
    K = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1)

    result = sorted(furthest_sum(K, n_basis, 1))
    assert result == assignments


def test_device_matches_host():
    rng = np.random.RandomState(3)
    X = rng.standard_normal((40, 5))
    D = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1)
    for start in (0, 7, 39):
        for extra in (0, 1, 10):
            host = furthest_sum(D, 6, start, None, extra)
            dev = np.asarray(furthest_sum_device(jnp.asarray(D), 6, start,
                                                 extra_steps=extra))
            assert sorted(host) == sorted(dev.tolist())


def test_device_vmaps_over_start_indices():
    rng = np.random.RandomState(4)
    X = rng.standard_normal((30, 4))
    D = jnp.asarray(np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1))
    starts = jnp.arange(8)
    batched = jax.vmap(
        lambda s: furthest_sum_device(D, 5, s, extra_steps=5))(starts)
    assert batched.shape == (8, 5)
    for row, start in zip(np.asarray(batched), range(8)):
        host = furthest_sum(np.asarray(D), 5, start, None, 5)
        assert sorted(row.tolist()) == sorted(host)


def test_dissimilarities_from_kernel_matches_euclidean():
    rng = np.random.RandomState(5)
    X = rng.standard_normal((12, 7))
    K = X @ X.T
    D = np.asarray(dissimilarities_from_kernel(jnp.asarray(K)))
    expected = np.linalg.norm(X[:, None, :] - X[None, :, :], axis=-1)
    assert np.allclose(D, expected, atol=1e-10)
