"""A/B: sharded_aa_fit at protocol scale on the real TPU, pallas vs xla.

Runs the full SPMD fit (parallel/sharded_aa.py:sharded_aa_fit) on a
1-chip (1, 1) mesh — the shard_map program is identical to the
multi-chip one modulo collective size — at the HadISST protocol scale
(n=1788 x d=16384, k=6, R=25 restarts, dictionary solver capped at one
SPG step) with both weights-QP backends, warm-timed (relay
short-circuits identical (program, args) pairs, so each timed call
perturbs the input).

Usage: python benchmarks/sharded_protocol_ab.py [--restarts R]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def make_data(n, d, dtype=np.float32):
    rng = np.random.RandomState(42)
    U = rng.standard_normal((n, 8))
    V = rng.standard_normal((8, d))
    X = U @ V + 0.3 * rng.standard_normal((n, d))
    X -= X.mean(axis=0)
    X /= X.std(axis=0) + 1e-12
    return X.astype(dtype)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--restarts', type=int, default=25)
    p.add_argument('--max-iterations', type=int, default=500)
    args = p.parse_args()

    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.parallel.mesh import create_mesh
    from convex_dim_red_tpu.parallel.sharded_aa import sharded_aa_fit
    from convex_dim_red_tpu.ops.stochastic_matrices import \
        right_stochastic_matrix

    n, d, k = 1788, 16384, 6
    R = args.restarts
    X = jnp.asarray(make_data(n, d))
    mesh = create_mesh(shape=(1, 1), axis_names=("restarts", "samples"))

    kz = jax.random.split(jax.random.PRNGKey(0), R)
    Zs = jax.vmap(lambda s: right_stochastic_matrix(
        s, (n, k), dtype=X.dtype))(kz)
    kc = jax.random.split(jax.random.PRNGKey(1), R)
    Cs = jax.vmap(lambda s: right_stochastic_matrix(
        s, (k, n), dtype=X.dtype))(kc)
    alphas = jnp.ones((R, k), X.dtype)
    jax.block_until_ready((X, Zs, Cs, alphas))

    results = {}
    for backend in ('pallas', 'xla'):
        def run(Xr):
            return sharded_aa_fit(
                mesh, Xr, Zs, Cs, alphas, tolerance=1e-5,
                max_iterations=args.max_iterations,
                stopping_criterion='rel_delta_f',
                dictionary_solver_kwargs={'max_iterations': 1},
                weights_solver_kwargs={'backend': backend,
                                       'max_iterations': 1000})
        t0 = time.perf_counter()
        out = run(X)
        jax.block_until_ready(out['cost'])
        cold = time.perf_counter() - t0

        Xw = X * (1.0 + 1e-7)
        jax.block_until_ready(Xw)
        t0 = time.perf_counter()
        out = run(Xw)
        jax.block_until_ready(out['cost'])
        warm = time.perf_counter() - t0
        results[backend] = {
            'cold_s': round(cold, 3), 'warm_s': round(warm, 4),
            'cost': float(out['cost']),
            'n_iter_best': int(out['n_iter']),
            'mean_iters': round(float(np.mean(out['n_iters'])), 1),
            'max_iters': int(np.max(out['n_iters'])),
        }
        print(backend, results[backend], flush=True)

    results['speedup_pallas_vs_xla_warm'] = round(
        results['xla']['warm_s'] / results['pallas']['warm_s'], 3)
    results['workload'] = {'n': n, 'd': d, 'k': k, 'restarts': R,
                           'dict_max_iterations': 1,
                           'max_iterations': args.max_iterations,
                           'mesh': '1x1 (restarts, samples)'}
    print(json.dumps(results))


if __name__ == '__main__':
    main()
