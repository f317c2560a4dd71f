"""Verify-session driver: runtime-mask Pallas QP on the real TPU.

Drives the round-2 changes at the library surface on the production
(f32, TPU) backend:
  1. masked packed + unpacked fused QP kernels vs the masked XLA solve,
  2. an end-to-end padded-k (bucketed) AA restart fit with the Pallas
     weights backend (masked kernel under the restart vmap),
  3. program-reuse: masked and unmasked solves of one shape must not
     recompile (runtime mask input).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def obj(X, A, B):
    return (0.5 * np.einsum('ij,jk,ik->i', X, A, X)
            + np.sum(X * B, axis=1))


def main():
    print("devices:", jax.devices())
    from convex_dim_red_tpu.solvers.spg import quad_simplex_spg_batch

    rng = np.random.RandomState(0)

    # --- 1a. packed kernel (k=6 -> k_pad 8), mask 4 of 6 active
    k, m, n = 6, 4, 4096
    M = rng.standard_normal((k, k))
    A = jnp.asarray((M @ M.T + np.eye(k)).astype(np.float32))
    B = jnp.asarray(rng.standard_normal((n, k)).astype(np.float32))
    X0 = jnp.full((n, k), 1.0 / k, jnp.float32)
    mask = jnp.asarray(np.arange(k) < m)

    t0 = time.perf_counter()
    Xp = np.asarray(quad_simplex_spg_batch(A, B, X0, backend='pallas',
                                           mask=mask))
    print(f"packed masked pallas: {time.perf_counter()-t0:.1f}s "
          f"(compile+run)")
    Xx = np.asarray(quad_simplex_spg_batch(A, B, X0, backend='xla',
                                           mask=mask))
    assert np.all(Xp[:, m:] == 0.0), "masked coords not pinned to zero"
    assert np.allclose(Xp.sum(1), 1.0, atol=1e-5)
    gap = obj(Xp, A, B) - obj(Xx, A, B)
    print(f"packed masked obj gap vs XLA: max {np.abs(gap).max():.2e}")
    assert np.abs(gap).max() < 1e-4

    # --- 1b. unpacked kernel (k=70 > 64), mask 50 active
    k, m = 70, 50
    M = rng.standard_normal((k, k))
    A2 = jnp.asarray((M @ M.T + np.eye(k)).astype(np.float32))
    B2 = jnp.asarray(rng.standard_normal((512, k)).astype(np.float32))
    X02 = jnp.full((512, k), 1.0 / k, jnp.float32)
    mask2 = jnp.asarray(np.arange(k) < m)
    Xp2 = np.asarray(quad_simplex_spg_batch(A2, B2, X02,
                                            backend='pallas', mask=mask2))
    Xx2 = np.asarray(quad_simplex_spg_batch(A2, B2, X02, backend='xla',
                                            mask=mask2))
    assert np.all(Xp2[:, m:] == 0.0)
    gap2 = obj(Xp2, A2, B2) - obj(Xx2, A2, B2)
    print(f"unpacked masked obj gap vs XLA: max {np.abs(gap2).max():.2e}")
    assert np.abs(gap2).max() < 1e-3

    # --- 2. bucketed AA restarts with pallas weights backend
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
    basis = rng.uniform(size=(3, 64)).astype(np.float32)
    Z = rng.dirichlet(np.ones(3), 256).astype(np.float32)
    X = Z @ basis
    t0 = time.perf_counter()
    res = aa_fit_restarts(
        X, 3, jax.random.PRNGKey(0), n_init=8, init='random',
        tolerance=1e-6, max_iterations=200, pad_components_to=8,
        weights_solver_kwargs={'backend': 'pallas'})
    print(f"bucketed pallas AA fit: cost={res['cost']:.3e} "
          f"n_iter={res['n_iter']} ({time.perf_counter()-t0:.1f}s)")
    assert res['weights'].shape == (256, 3)
    assert res['cost'] < 1e-3

    # --- 3. masked and unmasked share one compiled program
    f = jax.jit(lambda b, x0, mk: quad_simplex_spg_batch(
        A, b, x0, backend='pallas', mask=mk))
    f(B, X0, mask).block_until_ready()
    n_compiles_after_first = f._cache_size()
    f(B, X0, jnp.ones(6, bool)).block_until_ready()
    assert f._cache_size() == n_compiles_after_first, \
        "mask value changed the compiled program"
    print("program reuse across mask values: OK")
    print("VERIFY TPU OK")


if __name__ == "__main__":
    main()
