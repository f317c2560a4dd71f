"""Tests for the parallel layer on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convex_dim_red_tpu.parallel.mesh import create_mesh, shard_batch
from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
from convex_dim_red_tpu.parallel.sharded_aa import (
    distributed_gram, sharded_aa_train_step)
from convex_dim_red_tpu.models.archetypal_analysis import kernel_aa_cost


def _planted(rng, n_samples=64, n_components=3, n_features=6):
    basis = rng.uniform(size=(n_components, n_features))
    Z = rng.uniform(size=(n_samples, n_components))
    Z /= Z.sum(axis=1, keepdims=True)
    idx = rng.choice(n_samples, size=n_components, replace=False)
    for comp, i in enumerate(idx):
        Z[i] = 0.0
        Z[i, comp] = 1.0
    return Z @ basis, idx


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_vmapped_restarts_beat_single_fit():
    rng = np.random.RandomState(0)
    X, idx = _planted(rng)

    result = aa_fit_restarts(X, 3, jax.random.PRNGKey(0), n_init=8,
                             tolerance=1e-10, max_iterations=300)
    assert result['weights'].shape == (64, 3)
    assert np.allclose(np.asarray(result['weights']).sum(1), 1, atol=1e-10)
    assert result['costs'].shape == (8,)
    # Best-of-8 is the minimum of the batch.
    assert result['cost'] == pytest.approx(float(result['costs'].min()))
    # Planted problem: best restart should essentially reach zero cost.
    assert result['cost'] < 1e-6


def test_restarts_on_mesh_match_unsharded():
    rng = np.random.RandomState(1)
    X, _ = _planted(rng)

    mesh = create_mesh(shape=(8,), axis_names=("restarts",))
    res_sharded = aa_fit_restarts(X, 3, jax.random.PRNGKey(0), n_init=8,
                                  tolerance=1e-10, max_iterations=300,
                                  mesh=mesh)
    res_plain = aa_fit_restarts(X, 3, jax.random.PRNGKey(0), n_init=8,
                                tolerance=1e-10, max_iterations=300)
    # Same keys, same math: costs agree to float tolerance.
    assert np.allclose(np.asarray(res_sharded['costs']),
                       np.asarray(res_plain['costs']), rtol=1e-8)


def test_distributed_gram_matches_dense():
    rng = np.random.RandomState(2)
    X = rng.standard_normal((24, 16))
    mesh = create_mesh(shape=(8,), axis_names=("samples",))
    K = np.asarray(distributed_gram(mesh, jnp.asarray(X),
                                    feature_axis="samples"))
    assert np.allclose(K, X @ X.T, atol=1e-10)


def test_sharded_aa_train_step_matches_single_device_math():
    rng = np.random.RandomState(3)
    n, k, d, R = 32, 3, 6, 4
    X, _ = _planted(rng, n_samples=n, n_components=k, n_features=d)

    Zs = rng.uniform(size=(R, n, k))
    Zs /= Zs.sum(axis=2, keepdims=True)
    Cs = rng.uniform(size=(R, k, n))
    Cs /= Cs.sum(axis=2, keepdims=True)
    alphas = np.ones((R, k))

    mesh = create_mesh(shape=(2, 4), axis_names=("restarts", "samples"))

    Zs_new, Cs_new, alphas_new, costs = jax.jit(
        lambda X, Zs, Cs, alphas: sharded_aa_train_step(
            mesh, X, Zs, Cs, alphas,
            dict_iterations=3, weights_iterations=20))(
        jnp.asarray(X), jnp.asarray(Zs), jnp.asarray(Cs),
        jnp.asarray(alphas))

    Zs_new = np.asarray(Zs_new)
    Cs_new = np.asarray(Cs_new)
    costs = np.asarray(costs)

    K = X @ X.T
    for r in range(R):
        # Feasibility preserved.
        assert np.allclose(Zs_new[r].sum(axis=1), 1, atol=1e-10)
        assert np.allclose(Cs_new[r].sum(axis=1), 1, atol=1e-10)
        # One alternating step decreases the objective.
        before = float(kernel_aa_cost(K, Zs[r], Cs[r], alphas[r]))
        after = float(kernel_aa_cost(K, Zs_new[r], Cs_new[r],
                                     alphas_new[r]))
        assert after <= before + 1e-12
        # Reported cost matches the recomputed objective.
        assert abs(after - costs[r]) < 1e-8


def test_sharded_step_invariant_to_mesh_shape():
    rng = np.random.RandomState(4)
    n, k, d, R = 16, 2, 4, 2
    X, _ = _planted(rng, n_samples=n, n_components=k, n_features=d)
    Zs = rng.uniform(size=(R, n, k))
    Zs /= Zs.sum(axis=2, keepdims=True)
    Cs = rng.uniform(size=(R, k, n))
    Cs /= Cs.sum(axis=2, keepdims=True)
    alphas = np.ones((R, k))

    outs = []
    for shape in [(1, 8), (2, 4), (2, 2)]:
        n_dev = shape[0] * shape[1]
        mesh = create_mesh(shape=shape, axis_names=("restarts", "samples"),
                           devices=jax.devices()[:n_dev])
        Zn, Cn, an, costs = jax.jit(
            lambda X, Zs, Cs, alphas, mesh=mesh: sharded_aa_train_step(
                mesh, X, Zs, Cs, alphas,
                dict_iterations=2, weights_iterations=10))(
            jnp.asarray(X), jnp.asarray(Zs), jnp.asarray(Cs),
            jnp.asarray(alphas))
        outs.append((np.asarray(Zn), np.asarray(Cn), np.asarray(costs)))

    for Zn, Cn, costs in outs[1:]:
        assert np.allclose(Zn, outs[0][0], atol=1e-8)
        assert np.allclose(Cn, outs[0][1], atol=1e-8)
        assert np.allclose(costs, outs[0][2], atol=1e-10)


def test_kernel_aa_fit_restarts_matches_data_space():
    from convex_dim_red_tpu.parallel.restarts import kernel_aa_fit_restarts
    rng = np.random.RandomState(9)
    X, idx = _planted(rng)
    K = X @ X.T
    result = kernel_aa_fit_restarts(K, 3, jax.random.PRNGKey(0), n_init=6,
                                    tolerance=1e-10, max_iterations=300)
    assert result['weights'].shape == (64, 3)
    assert np.allclose(np.asarray(result['weights']).sum(1), 1, atol=1e-10)
    assert result['cost'] < 1e-6
    # Hull recovery: dictionary rows peak at the planted vertices.
    got = sorted(np.asarray(result['dictionary']).argmax(1).tolist())
    assert got == sorted(idx.tolist())


def test_aa_fit_restarts_chunking_matches_single_call():
    rng = np.random.RandomState(10)
    X, _ = _planted(rng)
    a = aa_fit_restarts(X, 3, jax.random.PRNGKey(3), n_init=8,
                        tolerance=1e-10, max_iterations=200)
    b = aa_fit_restarts(X, 3, jax.random.PRNGKey(3), n_init=8,
                        tolerance=1e-10, max_iterations=200,
                        restart_chunk=3)
    assert np.allclose(np.asarray(a['costs']), np.asarray(b['costs']),
                       rtol=1e-10)
    assert a['best_index'] == b['best_index']
    assert a['cost'] == pytest.approx(b['cost'])
