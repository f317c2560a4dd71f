"""Tests for the measured 'auto' weights-QP backend dispatch.

``resolve_qp_backend`` (solvers/spg.py) picks the QP backend per call
regime: cold one-shot batches prefer the fused Pallas kernel on TPU,
warm-started fit-loop QPs and non-TPU platforms resolve to XLA.  The
heuristic is grounded in benchmarks/fit_backend_ab.py measurements; the
tests pin the dispatch contract, not the timings.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from convex_dim_red_tpu import ArchetypalAnalysis, resolve_qp_backend
from convex_dim_red_tpu.models._common import QPSolverConfig
from convex_dim_red_tpu.parallel.sharded_aa import _weights_backend_kwargs
from convex_dim_red_tpu.solvers.spg import quad_simplex_spg_batch


def test_explicit_backends_pass_through():
    for backend in ("xla", "pallas"):
        for regime in ("fit", "oneshot"):
            assert resolve_qp_backend(backend, regime=regime) == backend


def test_auto_fit_regime_resolves_to_xla_everywhere(monkeypatch):
    assert resolve_qp_backend("auto", regime="fit") == "xla"
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_qp_backend("auto", regime="fit") == "xla"


def test_auto_oneshot_is_xla_off_tpu():
    # conftest pins the test platform to CPU.
    assert jax.default_backend() == "cpu"
    assert resolve_qp_backend("auto") == "xla"


def test_auto_oneshot_is_pallas_on_tpu_within_kernel_width(monkeypatch):
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve_qp_backend("auto") == "pallas"
    assert resolve_qp_backend("auto", k=128) == "pallas"
    # Wider than the kernel's lane register: fall back to XLA.
    assert resolve_qp_backend("auto", k=129) == "xla"


def test_qp_config_defaults_to_auto():
    assert QPSolverConfig().backend == "auto"


def test_pallas_width_limit_matches_kernel():
    # _PALLAS_MAX_K is a plain int so resolution never imports the
    # Pallas module off-TPU; pin it to the kernel's real lane width so
    # the two cannot drift apart.
    from convex_dim_red_tpu.ops import pallas_qp
    from convex_dim_red_tpu.solvers.spg import _PALLAS_MAX_K
    assert _PALLAS_MAX_K == pallas_qp.LANES


def test_sharded_paths_resolve_auto(monkeypatch):
    # Off-TPU: 'auto' falls back to the portable XLA path.
    backend, _ = _weights_backend_kwargs({"backend": "auto"}, k=6)
    assert backend == "xla"
    # On TPU the sharded fits prefer the grouped Pallas kernel
    # (measured 1.88x at protocol scale) when k fits the kernel.
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    backend, _ = _weights_backend_kwargs({"backend": "auto"}, k=6)
    assert backend == "pallas"
    backend, _ = _weights_backend_kwargs({"backend": "auto"}, k=129)
    assert backend == "xla"
    with pytest.raises(ValueError, match="unknown weights-QP backend"):
        _weights_backend_kwargs({"backend": "numba"})


def test_auto_batch_solve_matches_xla():
    rng = np.random.RandomState(0)
    k, n = 5, 37
    M = rng.standard_normal((k, k))
    A = jnp.asarray(M @ M.T + np.eye(k))
    B = jnp.asarray(rng.standard_normal((n, k)))
    X0 = jnp.full((n, k), 1.0 / k)
    auto = quad_simplex_spg_batch(A, B, X0, backend="auto")
    xla = quad_simplex_spg_batch(A, B, X0, backend="xla")
    np.testing.assert_allclose(np.asarray(auto), np.asarray(xla))


def test_aa_fit_accepts_auto_backend():
    rng = np.random.RandomState(1)
    X = rng.standard_normal((40, 7))
    model = ArchetypalAnalysis(
        n_components=3, max_iterations=30, tolerance=1e-8,
        random_state=0, weights_solver_kwargs={"backend": "auto"})
    model.fit(X)
    assert np.isfinite(model.cost)
