"""Verify-session driver: GROUPED Pallas QP kernels on the real TPU.

The grouped kernels (ops/pallas_qp.py:quad_simplex_qp_pallas_grouped /
_packed_grouped — one Hessian per grid group) are what the sharded and
restart-batched fits dispatch to with weights backend='pallas'
(parallel/sharded_aa.py:_weights_backend_kwargs).  Interpret-mode
parity is covered by tests; this driver exercises the actual Mosaic
lowering on hardware:

  1. grouped lane-packed kernel (k=6 -> k_pad 8) vs vmapped XLA QP,
  2. grouped unpacked kernel (k=70 > 64) vs vmapped XLA QP,
  3. masked (padded-k bucket) variants of both,
  4. end-to-end: sharded_aa_fit on a 1-chip mesh, backend pallas vs
     xla, cost parity,
  5. A/B wall-clock at the protocol restart-batched shape
     (R=25 restarts x n=1788 rows x k=6).
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
    return (0.5 * np.einsum('rij,jk,rik->ri', X, A, X)
            if A.ndim == 2 else
            0.5 * np.einsum('rij,rjk,rik->ri', X, A, X)) \
        + np.sum(X * B, axis=-1)


def grouped_obj(X, As, Bs):
    return (0.5 * np.einsum('rnj,rjk,rnk->rn', X, As, X)
            + np.sum(X * Bs, axis=-1))


def make_problem(rng, R, n, k, dtype=np.float32):
    As = np.empty((R, k, k), dtype)
    for r in range(R):
        M = rng.standard_normal((k, k))
        As[r] = (M @ M.T + np.eye(k)).astype(dtype)
    Bs = rng.standard_normal((R, n, k)).astype(dtype)
    X0 = np.full((R, n, k), 1.0 / k, dtype)
    return jnp.asarray(As), jnp.asarray(Bs), jnp.asarray(X0)


def check(tag, Xp, Xx, As, Bs, mask_m=None, tol=1e-4):
    Xp = np.asarray(Xp)
    Xx = np.asarray(Xx)
    if mask_m is not None:
        assert np.all(Xp[..., mask_m:] == 0.0), \
            f"{tag}: masked coords not pinned to zero"
    assert np.allclose(Xp.sum(-1), 1.0, atol=1e-5), f"{tag}: infeasible"
    gap = grouped_obj(Xp, np.asarray(As), np.asarray(Bs)) \
        - grouped_obj(Xx, np.asarray(As), np.asarray(Bs))
    print(f"{tag}: obj gap vs XLA max {np.abs(gap).max():.2e} "
          f"(pallas better where negative: min {gap.min():.2e})")
    assert gap.max() < tol, f"{tag}: pallas worse than XLA by {gap.max()}"


def main():
    print("devices:", jax.devices())
    from convex_dim_red_tpu.solvers.spg import quad_simplex_spg_batch_grouped

    rng = np.random.RandomState(0)

    # --- 1. grouped lane-packed (k=6 -> k_pad 8), sweep-like shape
    As, Bs, X0 = make_problem(rng, 10, 900, 6)
    t0 = time.perf_counter()
    Xp = quad_simplex_spg_batch_grouped(As, Bs, X0, backend='pallas')
    Xp.block_until_ready()
    print(f"grouped packed compile+run: {time.perf_counter()-t0:.1f}s")
    Xx = quad_simplex_spg_batch_grouped(As, Bs, X0, backend='xla')
    check("grouped packed k=6", Xp, Xx, As, Bs)

    # --- 2. grouped unpacked (k=70 > 64)
    As2, Bs2, X02 = make_problem(rng, 4, 512, 70)
    t0 = time.perf_counter()
    Xp2 = quad_simplex_spg_batch_grouped(As2, Bs2, X02, backend='pallas')
    Xp2.block_until_ready()
    print(f"grouped unpacked compile+run: {time.perf_counter()-t0:.1f}s")
    Xx2 = quad_simplex_spg_batch_grouped(As2, Bs2, X02, backend='xla')
    check("grouped unpacked k=70", Xp2, Xx2, As2, Bs2)

    # --- 3. masked variants (padded-k bucket: 6 active of 8)
    As3, Bs3, X03 = make_problem(rng, 6, 640, 8)
    mask = jnp.asarray(np.arange(8) < 6)
    X03m = jnp.where(mask[None, None, :], 1.0 / 6, 0.0) \
        * jnp.ones_like(X03)
    Xp3 = quad_simplex_spg_batch_grouped(As3, Bs3, X03m,
                                         backend='pallas', mask=mask)
    Xx3 = quad_simplex_spg_batch_grouped(As3, Bs3, X03m,
                                         backend='xla', mask=mask)
    check("grouped packed masked 6/8", Xp3, Xx3, As3, Bs3, mask_m=6)

    As4, Bs4, X04 = make_problem(rng, 3, 256, 70)
    mask4 = jnp.asarray(np.arange(70) < 50)
    X04m = jnp.where(mask4[None, None, :], 1.0 / 50, 0.0) \
        * jnp.ones_like(X04)
    Xp4 = quad_simplex_spg_batch_grouped(As4, Bs4, X04m,
                                         backend='pallas', mask=mask4)
    Xx4 = quad_simplex_spg_batch_grouped(As4, Bs4, X04m,
                                         backend='xla', mask=mask4)
    check("grouped unpacked masked 50/70", Xp4, Xx4, As4, Bs4, mask_m=50)

    # --- 4. end-to-end sharded fit on a 1-chip mesh, pallas vs xla
    from convex_dim_red_tpu.parallel.mesh import create_mesh
    from convex_dim_red_tpu.parallel.sharded_aa import sharded_aa_fit
    from convex_dim_red_tpu.ops.stochastic_matrices import \
        right_stochastic_matrix

    mesh = create_mesh(shape=(1, 1), axis_names=("restarts", "samples"))
    n, d, k, R = 400, 64, 4, 8
    U = rng.standard_normal((n, k)).astype(np.float32)
    V = rng.standard_normal((k, d)).astype(np.float32)
    X = jnp.asarray(U @ V + 0.1 * rng.standard_normal((n, d)))
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, R)
    Zs = jax.vmap(lambda s: right_stochastic_matrix(s, (n, k),
                                                    dtype=X.dtype))(keys)
    keys2 = jax.random.split(jax.random.PRNGKey(1), R)
    Cs = jax.vmap(lambda s: right_stochastic_matrix(s, (k, n),
                                                    dtype=X.dtype))(keys2)
    alphas = jnp.ones((R, k), X.dtype)

    res = {}
    for backend in ('pallas', 'xla'):
        t0 = time.perf_counter()
        out = sharded_aa_fit(
            mesh, X, Zs, Cs, alphas, tolerance=1e-7,
            max_iterations=200, stopping_criterion='rel_delta_f',
            weights_solver_kwargs={'backend': backend})
        cost = float(out['cost'])
        res[backend] = cost
        print(f"sharded_aa_fit backend={backend}: cost {cost:.6f} "
              f"n_iter {int(out['n_iter'])} "
              f"({time.perf_counter()-t0:.1f}s incl compile)")
    rel = abs(res['pallas'] - res['xla']) / abs(res['xla'])
    print(f"sharded fit cost rel gap pallas vs xla: {rel:.2e}")
    assert rel < 1e-3

    # --- 5. A/B wall-clock, protocol restart-batched shape
    R, n, k = 25, 1788, 6
    As5, Bs5, X05 = make_problem(rng, R, n, k)
    times = {}
    for backend in ('pallas', 'xla'):
        Xw = quad_simplex_spg_batch_grouped(
            As5, Bs5, X05, backend=backend, max_iterations=1000)
        Xw.block_until_ready()  # compile + warm
        reps = 5
        t0 = time.perf_counter()
        for i in range(reps):
            # fresh buffers: the relay short-circuits identical
            # (program, args) re-executions
            Xr = quad_simplex_spg_batch_grouped(
                jnp.asarray(As5) * (1.0 + 1e-6 * (i + 1)), Bs5, X05,
                backend=backend, max_iterations=1000)
            Xr.block_until_ready()
        times[backend] = (time.perf_counter() - t0) / reps
        print(f"A/B {backend}: {times[backend]*1e3:.1f} ms/solve "
              f"({R}x{n} k={k} QPs)")
    print(f"grouped pallas speedup vs XLA: "
          f"{times['xla']/times['pallas']:.2f}x")
    print("ALL GROUPED PALLAS TPU CHECKS PASSED")


if __name__ == "__main__":
    main()
