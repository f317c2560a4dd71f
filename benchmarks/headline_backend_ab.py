"""A/B the EXACT bench.py headline protocol: pallas vs xla weights QP.

bench.py pins ``backend='pallas'`` for the headline on the strength of
the round-1 isolated-QP measurement (12x per solve at protocol scale).
The newer fit-level A/B (benchmarks/fit_backend_ab.py) measured pallas
at 0.87x on the same shape but with n_init=16/chunk=16 — not the
headline's n_init=100/chunk=25, where the per-chunk program is reused
4x and the chunk is wider.  This driver settles it at the real
protocol: best-of-100 restarts, chunk 25, dict solver capped at one
SPG step, rel tol 1e-5 — cold and warm passes for both backends, with
perturbed inputs so the relay cannot short-circuit repeats.

Usage: python benchmarks/headline_backend_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax


def main():
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
    from bench import (make_data, N_SAMPLES, N_FEATURES, K, N_INIT, TOL,
                       MAX_ITER, CRITERION, DICT_MAX_ITERATIONS)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    X = jax.device_put(make_data(np.float32))
    jax.block_until_ready(X)

    results = {}
    for backend in ('pallas', 'xla'):
        def run(Xr):
            return aa_fit_restarts(
                Xr, K, jax.random.PRNGKey(0), n_init=N_INIT,
                init='random', tolerance=TOL, max_iterations=MAX_ITER,
                stopping_criterion=CRITERION,
                dictionary_solver_kwargs={
                    'max_iterations': DICT_MAX_ITERATIONS},
                weights_solver_kwargs={'max_iterations': 1000,
                                       'backend': backend},
                restart_chunk=25)

        t0 = time.perf_counter()
        out = run(X)
        cold = time.perf_counter() - t0

        warms = []
        for i in range(2):
            Xw = X * (1.0 + 1e-7 * (i + 1))
            jax.block_until_ready(Xw)
            t0 = time.perf_counter()
            out = run(Xw)
            warms.append(time.perf_counter() - t0)
        results[backend] = {
            'cold_s': round(cold, 4),
            'warm_s': round(min(warms), 4),
            'warm_all': [round(w, 4) for w in warms],
            'cost': float(out['cost']),
            'mean_iters': round(float(np.mean(out['n_iters'])), 1),
        }
        print(json.dumps({backend: results[backend]}), flush=True)

    results['pallas_speedup_warm'] = round(
        results['xla']['warm_s'] / results['pallas']['warm_s'], 3)
    results['workload'] = {
        'n': N_SAMPLES, 'd': N_FEATURES, 'k': K, 'n_init': N_INIT,
        'restart_chunk': 25, 'dict_max_iterations': DICT_MAX_ITERATIONS,
        'tolerance': TOL, 'criterion': CRITERION}
    print(json.dumps(results))


if __name__ == '__main__':
    main()
