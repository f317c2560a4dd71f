"""Fit-level A/B: pallas vs xla weights backend across workload shapes.

The weights-QP backend choice only matters inside fits (warm-started
QPs under the restart vmap) and transforms (one cold QP batch) — NOT
in isolated cold-start QP timings (benchmarks/qp_backend_sweep.py is
noisy and unrepresentative).  This driver times
``aa_fit_restarts`` end-to-end (warm pass, perturbed inputs) and
``ArchetypalAnalysis``-style transform batches for both backends
across the shape regimes the case studies hit, to ground
``backend='auto'`` (solvers/spg.py:resolve_qp_backend).

Usage: python benchmarks/fit_backend_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# (n_samples, n_features, k, n_init, restart_chunk)
FIT_SHAPES = [
    (1788, 16384, 6, 16, 16),    # HadISST protocol scale
    (1788, 16384, 20, 16, 16),   # protocol scale, large k
    (900, 4096, 8, 20, 10),      # config5 sweep bucket
    (900, 4096, 24, 20, 10),
    (200, 50, 3, 10, 10),        # config1 small
]


def make_data(n, d, seed=42):
    rng = np.random.RandomState(seed)
    U = rng.standard_normal((n, 8))
    V = rng.standard_normal((8, d))
    X = U @ V + 0.3 * rng.standard_normal((n, d))
    X -= X.mean(axis=0)
    X /= X.std(axis=0) + 1e-12
    return X.astype(np.float32)


def main():
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts

    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    for n, d, k, n_init, chunk in FIT_SHAPES:
        X = jnp.asarray(make_data(n, d))
        jax.block_until_ready(X)
        row = {'n': n, 'd': d, 'k': k, 'n_init': n_init}
        for backend in ('pallas', 'xla'):
            def run(Xr):
                return aa_fit_restarts(
                    Xr, k, jax.random.PRNGKey(0), n_init=n_init,
                    init='random', tolerance=1e-5, max_iterations=500,
                    stopping_criterion='rel_delta_f',
                    dictionary_solver_kwargs={'max_iterations': 1},
                    weights_solver_kwargs={'max_iterations': 1000,
                                           'backend': backend},
                    restart_chunk=chunk)
            out = run(X)  # compile + warm
            Xw = X * (1.0 + 1e-7)
            jax.block_until_ready(Xw)
            t0 = time.perf_counter()
            out = run(Xw)
            row[backend + '_s'] = round(time.perf_counter() - t0, 4)
            row[backend + '_cost'] = float(out['cost'])
        row['pallas_speedup'] = round(
            row['xla_s'] / row['pallas_s'], 3)
        print(json.dumps(row), flush=True)

    # Transform regime: one cold QP batch over all (restarts x rows).
    from convex_dim_red_tpu.solvers.spg import quad_simplex_spg_batch
    rng = np.random.RandomState(0)
    for n_rows, k in ((1788, 6), (28608, 6), (1788, 20)):
        M = rng.standard_normal((k, k))
        A = jnp.asarray((M @ M.T + np.eye(k)).astype(np.float32))
        B = jnp.asarray(rng.standard_normal(
            (n_rows, k)).astype(np.float32))
        X0 = jnp.full((n_rows, k), 1.0 / k, jnp.float32)
        row = {'transform_rows': n_rows, 'k': k}
        for backend in ('pallas', 'xla'):
            jax.block_until_ready(quad_simplex_spg_batch(
                A, B, X0, backend=backend, max_iterations=1000))
            t0 = time.perf_counter()
            for i in range(3):
                Ai = A * (1.0 + 1e-6 * (i + 1))
                jax.block_until_ready(Ai)
                jax.block_until_ready(quad_simplex_spg_batch(
                    Ai, B, X0, backend=backend, max_iterations=1000))
            row[backend + '_ms'] = round(
                (time.perf_counter() - t0) / 3 * 1e3, 1)
        row['pallas_speedup'] = round(
            row['xla_ms'] / row['pallas_ms'], 3)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
