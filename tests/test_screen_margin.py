"""Tests for the screened-restart margin guard.

Screening (``screen_iterations``) is a pruning heuristic: a restart
whose screened cost ranks just outside the kept fraction is discarded
even if it would have won at convergence.  ``screen_margin`` bounds
that failure mode — any restart within the margin of the fractional
cut also survives — and every screened result now reports the
screen-phase diagnostics (cut, kept count, observed margin) so users
can size the margin for their data.  (The screened mode itself is a
framework capability beyond the reference protocol, which runs every
restart to convergence — reference bin/run_hadisst_aa.py:149-174.)
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from convex_dim_red_tpu.parallel.restarts import (_screened_best,
                                                  aa_fit_restarts)


def _fake_screen_problem():
    """Four 'restarts' with hand-picked screened and final costs.

    Restart 1 screens second-best by a hair (1.01 vs 1.00) but would
    WIN at convergence (0.5 vs 0.9) — the pruned-true-winner scenario
    the margin guard exists for.
    """
    screened = np.array([1.0, 1.01, 2.0, 3.0])
    finals = np.array([0.9, 0.5, 1.9, 2.9])
    keys = jnp.arange(4, dtype=jnp.float32)[:, None]

    def screen_call(chunk):
        idx = np.asarray(chunk[:, 0], int)
        state = jnp.asarray(idx, jnp.float32)[:, None]
        return (state, jnp.asarray(screened[idx]),
                jnp.ones(len(idx), jnp.int32))

    def resume_call(state, n_valid):
        ids = np.asarray(state[0][:, 0], int)
        costs = finals[ids]
        best = int(np.argmin(costs[:n_valid]))
        return (state[0][best], jnp.asarray(costs),
                jnp.ones(len(ids), jnp.int32),
                jnp.asarray(costs[best]), jnp.asarray(1, jnp.int32))

    return keys, screen_call, resume_call, screened, finals


def test_screening_without_margin_prunes_true_winner():
    keys, screen_call, resume_call, screened, _finals = \
        _fake_screen_problem()
    best, costs, n_iters, diag = _screened_best(
        screen_call, resume_call, keys, chunk=4, axis_size=1,
        screen_keep=0.25)
    # keep=0.25 keeps only restart 0; the eventual winner (restart 1)
    # is pruned and the final best is restart 0's 0.9.
    assert best[-2] == pytest.approx(0.9)
    assert diag['n_kept'] == 1
    assert diag['screen_cut'] == pytest.approx(1.0)
    # Observed margin = best pruned screened cost - worst kept: the
    # 0.01 near-tie that warns a user the cut landed on a plateau.
    assert diag['screen_margin_observed'] == pytest.approx(0.01)
    # Pruned restarts report their screened costs.
    assert np.allclose(costs[2:], screened[2:])


def test_screen_margin_rescues_near_tied_winner():
    keys, screen_call, resume_call, _screened, finals = \
        _fake_screen_problem()
    best, costs, n_iters, diag = _screened_best(
        screen_call, resume_call, keys, chunk=4, axis_size=1,
        screen_keep=0.25, screen_margin=0.05)
    # The margin widens the keep set to {0, 1}; the true winner
    # (restart 1, final 0.5) survives and wins.
    assert diag['n_kept'] == 2
    assert best[-2] == pytest.approx(0.5)
    assert costs[0] == pytest.approx(0.9)
    assert costs[1] == pytest.approx(0.5)
    # Margin beyond every restart keeps all four.
    _, costs_all, _, diag_all = _screened_best(
        screen_call, resume_call, keys, chunk=4, axis_size=1,
        screen_keep=0.25, screen_margin=np.inf)
    assert diag_all['n_kept'] == 4
    assert diag_all['screen_margin_observed'] == np.inf
    assert np.allclose(costs_all, finals)


def test_aa_screened_reports_diagnostics_and_infinite_margin_keeps_all():
    rng = np.random.RandomState(0)
    basis = rng.uniform(size=(3, 6))
    Z = rng.uniform(size=(48, 3))
    Z /= Z.sum(axis=1, keepdims=True)
    X = Z @ basis
    key = jax.random.PRNGKey(0)
    kwargs = dict(tolerance=1e-10, max_iterations=200,
                  screen_iterations=10)

    guarded = aa_fit_restarts(X, 3, key, n_init=6, screen_keep=1 / 6,
                              screen_margin=np.inf, **kwargs)
    everything = aa_fit_restarts(X, 3, key, n_init=6, screen_keep=1.0,
                                 **kwargs)
    # An infinite margin must be equivalent to keeping every restart.
    assert guarded['screen']['n_kept'] == 6
    assert guarded['cost'] == pytest.approx(everything['cost'], rel=1e-10)
    np.testing.assert_allclose(np.asarray(guarded['costs']),
                               np.asarray(everything['costs']),
                               rtol=1e-10)
    # Diagnostics surface on every screened result.
    tight = aa_fit_restarts(X, 3, key, n_init=6, screen_keep=0.5,
                            **kwargs)
    diag = tight['screen']
    assert diag['n_screened'] == 6
    assert diag['n_kept'] == 3
    assert np.isfinite(diag['screen_cut'])
    assert diag['screen_margin_observed'] >= 0.0
