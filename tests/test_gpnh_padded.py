"""GPNH padded-k program bucketing.

Round-4 verdict item 6: AA/KernelAA sweeps bucket component counts
(one compiled program per pad size) but GPNH compiled one
protocol-scale program per ``k``.  The blocker was the GPNH penalty's
coupling of ALL dictionary columns (reference
gpnh_convex_coding.py:179-196); the masked penalty
(``gpnh_regularization_masked``) evaluates the active-``k`` prefactor
over active columns only, so a padded fit optimizes exactly the
``k``-component objective.  These tests pin that down at every level:
penalty, Gram, fit core trajectory, restart API, program reuse, sweep.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convex_dim_red_tpu.models.gpnh_convex_coding import (
    _gpnh_core, _gpnh_gram, _gpnh_gram_masked, gpnh_regularization,
    gpnh_regularization_masked)
from convex_dim_red_tpu.models._common import QPSolverConfig
from convex_dim_red_tpu.parallel.restarts import gpnh_fit_restarts
from convex_dim_red_tpu.parallel.sweep import gpnh_model_selection_sweep


def test_masked_regularization_equals_active_block():
    rng = np.random.RandomState(0)
    for k, k_pad in [(2, 8), (3, 4), (5, 8), (1, 4)]:
        W_act = rng.standard_normal((7, k))
        W_pad = np.zeros((7, k_pad))
        W_pad[:, :k] = W_act
        mask = jnp.arange(k_pad) < k
        ref = float(gpnh_regularization(jnp.asarray(W_act)))
        out = float(gpnh_regularization_masked(jnp.asarray(W_pad), mask))
        assert out == pytest.approx(ref, rel=1e-13, abs=1e-15)
        # Garbage in the padded columns must not leak into the penalty.
        W_dirty = W_pad.copy()
        W_dirty[:, k:] = rng.standard_normal((7, k_pad - k))
        dirty = float(gpnh_regularization_masked(jnp.asarray(W_dirty),
                                                 mask))
        assert dirty == pytest.approx(ref, rel=1e-13, abs=1e-15)


def test_masked_gram_embeds_active_gram():
    for k, k_pad in [(2, 4), (3, 8), (1, 4)]:
        d = 11
        mask = jnp.arange(k_pad) < k
        G_act = np.asarray(_gpnh_gram(d, k, jnp.float64))
        G_pad = np.asarray(_gpnh_gram_masked(d, mask, jnp.float64))
        assert np.allclose(G_pad[:k, :k], G_act, atol=1e-15)
        assert np.all(G_pad[k:, :] == 0.0)
        assert np.all(G_pad[:, k:] == 0.0)


def _planted(rng, n_samples=48, k=3, d=5):
    basis = rng.uniform(size=(k, d))
    Z = rng.uniform(size=(n_samples, k))
    Z /= Z.sum(axis=1, keepdims=True)
    return Z @ basis


def _run_gpnh_core(X, Z0, W0, mask, lambda_W=1e-2, max_iterations=40):
    out = _gpnh_core(
        jnp.asarray(X), jnp.asarray(Z0), jnp.asarray(W0),
        jnp.asarray(lambda_W, jnp.float64),
        jnp.asarray(0.0, jnp.float64), mask,
        do_dict=True, do_weights=True, criterion='abs_delta_f',
        max_iterations=max_iterations, require_monotonic=False,
        weights_cfg=QPSolverConfig())
    Z, W, cost, n_iter, trace, _, _ = out
    return (np.asarray(Z), np.asarray(W), float(cost), int(n_iter),
            np.asarray(trace))


def test_padded_gpnh_core_trajectory_equals_unpadded():
    """Same active init, k padded 3->8 with a nonzero penalty weight:
    identical cost trajectory, identical iterates on the active block,
    padded columns pinned at exact zero."""
    rng = np.random.RandomState(4)
    X = _planted(rng)
    n, d = X.shape
    k, k_pad = 3, 8

    Z0 = rng.dirichlet(np.ones(k), n)
    W0 = rng.standard_normal((d, k))
    Z0_pad = np.zeros((n, k_pad))
    Z0_pad[:, :k] = Z0
    W0_pad = np.zeros((d, k_pad))
    W0_pad[:, :k] = W0

    Z_r, W_r, cost_r, n_iter_r, trace_r = _run_gpnh_core(
        X, Z0, W0, None)
    Z_p, W_p, cost_p, n_iter_p, trace_p = _run_gpnh_core(
        X, Z0_pad, W0_pad, jnp.arange(k_pad) < k)

    assert n_iter_p == n_iter_r
    assert abs(cost_p - cost_r) < 1e-11
    assert np.allclose(trace_p, trace_r, atol=1e-11)
    assert np.allclose(Z_p[:, :k], Z_r, atol=1e-9)
    assert np.allclose(W_p[:, :k], W_r, atol=1e-9)
    assert np.all(Z_p[:, k:] == 0.0)
    assert np.all(W_p[:, k:] == 0.0)


def test_gpnh_padded_restarts_reach_planted_and_reuse_program():
    from convex_dim_red_tpu.parallel.restarts import (_make_gpnh_run,
                                                      _make_gpnh_grouped_run)
    rng = np.random.RandomState(5)
    X = _planted(rng)

    misses0 = (_make_gpnh_run.cache_info().misses
               + _make_gpnh_grouped_run.cache_info().misses)
    res2 = gpnh_fit_restarts(X, 2, jax.random.PRNGKey(0), n_init=4,
                             init='random', tolerance=1e-10,
                             max_iterations=200, pad_components_to=4)
    misses1 = (_make_gpnh_run.cache_info().misses
               + _make_gpnh_grouped_run.cache_info().misses)
    res3 = gpnh_fit_restarts(X, 3, jax.random.PRNGKey(1), n_init=4,
                             init='random', tolerance=1e-10,
                             max_iterations=200, pad_components_to=4)
    misses2 = (_make_gpnh_run.cache_info().misses
               + _make_gpnh_grouped_run.cache_info().misses)

    # The bucketing point: k=3 reuses k=2's compiled bucket program.
    # (<= 1 rather than == 1 for the first call: another test in the
    # session may already have populated the same cache entry.)
    assert misses1 - misses0 <= 1
    assert misses2 == misses1

    assert res2['weights'].shape == (48, 2)
    assert res2['dictionary'].shape == (5, 2)
    assert res3['weights'].shape == (48, 3)
    assert res3['dictionary'].shape == (5, 3)
    assert np.allclose(np.asarray(res2['weights']).sum(1), 1, atol=1e-10)
    # Planted k=3 problem: the padded fit still recovers it exactly.
    assert res3['cost'] < 1e-6


@pytest.mark.slow
def test_gpnh_sweep_bucketing_matches_per_k_quality():
    rng = np.random.RandomState(6)
    X = _planted(rng, n_samples=40, k=3, d=5)
    ks = [2, 3, 4]
    key = jax.random.PRNGKey(1)
    bucketed = gpnh_model_selection_sweep(
        X, ks, key, n_init=6, init='random', tolerance=1e-10,
        max_iterations=200, component_bucket=4, restart_chunk=None,
        lambda_W=1e-3)
    per_k = gpnh_model_selection_sweep(
        X, ks, key, n_init=6, init='random', tolerance=1e-10,
        max_iterations=200, component_bucket=None, restart_chunk=None,
        lambda_W=1e-3)
    for k in ks:
        assert bucketed[k]['cost'] <= per_k[k]['cost'] * 1.5 + 1e-6
    # Elbow structure preserved: cost decreases with k.
    costs = [bucketed[k]['cost'] for k in ks]
    assert costs[0] > costs[1]


@pytest.mark.slow
def test_gpnh_padded_composes_with_screening_and_furthest_sum():
    rng = np.random.RandomState(7)
    X = _planted(rng)
    res = gpnh_fit_restarts(X, 3, jax.random.PRNGKey(0), n_init=8,
                            init='furthest_sum', tolerance=1e-10,
                            max_iterations=300, pad_components_to=8,
                            screen_iterations=15, screen_keep=0.5)
    assert res['weights'].shape == (48, 3)
    assert res['dictionary'].shape == (5, 3)
    assert np.allclose(np.asarray(res['weights']).sum(1), 1, atol=1e-10)
    assert np.isfinite(res['cost'])
    assert res['screen']['n_kept'] >= 1
