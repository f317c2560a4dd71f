"""Property tests for simplex projection.

Ports the reference test contract (reference
tests/test_simplex_projection.py): exact hand-computed projections,
idempotence on feasible points, and feasibility (nonnegativity, unit
sum) for random vectors and row batches at 1e-14/1e-15 tolerances.
"""

import numpy as np
import jax.numpy as jnp

from convex_dim_red_tpu.ops.simplex_projection import (
    simplex_project,
    simplex_project_vector,
    simplex_project_rows,
    simplex_project_columns,
)


def test_exact_projection_in_1d():
    assert np.allclose(simplex_project_vector(jnp.array([3.0])), [1.0])
    assert np.allclose(simplex_project_vector(jnp.array([-2.0])), [1.0])
    assert np.allclose(simplex_project_vector(jnp.array([0.3])), [1.0])


def test_exact_projection_in_2d():
    # Point dominated along one axis projects to a vertex.
    assert np.allclose(simplex_project_vector(jnp.array([2.0, 0.0])),
                       [1.0, 0.0])
    assert np.allclose(simplex_project_vector(jnp.array([0.0, 2.0])),
                       [0.0, 1.0])
    # Symmetric exterior point projects to the midpoint.
    assert np.allclose(simplex_project_vector(jnp.array([2.0, 2.0])),
                       [0.5, 0.5])
    # Known analytic case: project (1, 0.5) -> (0.75, 0.25).
    assert np.allclose(simplex_project_vector(jnp.array([1.0, 0.5])),
                       [0.75, 0.25])


def test_idempotent_on_feasible_points():
    rng = np.random.RandomState(0)
    for n in (2, 5, 17):
        x = rng.uniform(size=n)
        x /= x.sum()
        p = np.asarray(simplex_project_vector(x))
        assert np.allclose(p, x, atol=1e-14)
        # Vertices are fixed points.
        e = np.zeros(n)
        e[rng.randint(n)] = 1.0
        assert np.allclose(np.asarray(simplex_project_vector(e)), e,
                           atol=1e-15)


def test_feasibility_for_random_vectors():
    rng = np.random.RandomState(42)
    for n in (5, 10, 100):
        for scale in (0.1, 1.0, 100.0):
            x = scale * rng.standard_normal(n)
            p = np.asarray(simplex_project_vector(x))
            assert (p >= 0).all()
            assert abs(p.sum() - 1.0) < 1e-12


def test_projection_is_euclidean_nearest_point():
    # Verify against a brute-force QP-free check: the projection p of x
    # satisfies (x - p) . (q - p) <= 0 for feasible q (variational
    # inequality of the Euclidean projection onto a convex set).
    rng = np.random.RandomState(7)
    n = 8
    x = 3.0 * rng.standard_normal(n)
    p = np.asarray(simplex_project_vector(x))
    for _ in range(200):
        q = rng.uniform(size=n)
        q /= q.sum()
        assert np.dot(x - p, q - p) <= 1e-10


def test_row_batches_feasible():
    rng = np.random.RandomState(1)
    for shape in ((5, 11), (317, 5), (50, 317)):
        a = 10.0 * rng.standard_normal(shape)
        pr = np.asarray(simplex_project_rows(a))
        assert pr.shape == shape
        assert (pr >= 0).all()
        assert np.allclose(pr.sum(axis=1), 1.0, atol=1e-14)


def test_column_batches_feasible():
    rng = np.random.RandomState(2)
    a = 10.0 * rng.standard_normal((23, 9))
    pc = np.asarray(simplex_project_columns(a))
    assert (pc >= 0).all()
    assert np.allclose(pc.sum(axis=0), 1.0, atol=1e-14)


def test_rows_and_columns_consistent_with_vector():
    rng = np.random.RandomState(3)
    a = rng.standard_normal((6, 13))
    pr = np.asarray(simplex_project_rows(a))
    pc = np.asarray(simplex_project_columns(a.T))
    for i in range(a.shape[0]):
        pv = np.asarray(simplex_project_vector(a[i]))
        assert np.allclose(pr[i], pv, atol=1e-15)
        assert np.allclose(pc[:, i], pv, atol=1e-15)


def test_batched_nd_axis():
    rng = np.random.RandomState(4)
    a = rng.standard_normal((4, 5, 7))
    p = np.asarray(simplex_project(a, axis=-1))
    assert np.allclose(p.sum(axis=-1), 1.0, atol=1e-14)
    p = np.asarray(simplex_project(a, axis=1))
    assert np.allclose(p.sum(axis=1), 1.0, atol=1e-14)
