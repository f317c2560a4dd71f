"""A/B the bench.py headline protocol: grouped vs vmapped restart batch.

Round-2 VERDICT item 1: the vmapped single-chip headline runs chunks in
lockstep (every chunk pays for its slowest restart, max ~465 vs mean
~170 iterations) while the repo's own sharded machinery freezes
converged restarts per iteration and the grouped Pallas QP measured
1.88x faster at exactly this shape.  The grouped single-chip runners
(parallel/restarts.py:_make_aa_grouped_run) port both into the path
bench.py uses; this driver measures what that is worth at the EXACT
headline protocol (best-of-100, n=1788 x p=16384, k=6, dict solver
capped at one SPG step, rel tol 1e-5 — reference protocol
bin/run_hadisst_aa.py:149-174):

- ``vmapped``:  grouped=False, chunk 25 (the round-2 headline config)
- ``grouped``:  grouped=True,  chunk 25 (freezing + cross-restart QP)
- ``grouped_50`` / ``grouped_100``: larger chunks — per-restart
  freezing removes the lockstep straggler tax that made chunk 100 2x
  worse on the vmapped path, so wider batches may now amortize better.

Cold and warm passes, perturbed inputs so the relay cannot
short-circuit repeats.  Writes benchmarks/grouped_headline_ab.json.

Usage: python benchmarks/grouped_headline_ab.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   'grouped_headline_ab.json')


def main():
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
    from bench import (make_data, N_SAMPLES, N_FEATURES, K, N_INIT, TOL,
                       MAX_ITER, CRITERION, DICT_MAX_ITERATIONS)

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    X = jax.device_put(make_data(np.float32))
    jax.block_until_ready(X)

    configs = [
        ('vmapped', dict(grouped=False, restart_chunk=25)),
        ('grouped', dict(grouped=True, restart_chunk=25)),
        ('grouped_50', dict(grouped=True, restart_chunk=50)),
        ('grouped_100', dict(grouped=True, restart_chunk=100)),
        # Convergence compaction (exact protocol semantics): bounded
        # rounds + re-packing of unconverged restarts into dense
        # chunks (parallel/restarts.py:_compacted_aa_best).
        ('compact_25x64', dict(grouped=True, restart_chunk=25,
                               compact_iterations=64)),
        ('compact_25x96', dict(grouped=True, restart_chunk=25,
                               compact_iterations=96)),
        ('compact_25x32', dict(grouped=True, restart_chunk=25,
                               compact_iterations=32)),
        ('compact_25x16', dict(grouped=True, restart_chunk=25,
                               compact_iterations=16)),
        ('compact_25x48', dict(grouped=True, restart_chunk=25,
                               compact_iterations=48)),
        ('compact_50x48', dict(grouped=True, restart_chunk=50,
                               compact_iterations=48)),
    ]
    if len(sys.argv) > 1:
        wanted = set(sys.argv[1:])
        configs = [c for c in configs if c[0] in wanted]

    results = {}
    for name, extra in configs:
        def run(Xr):
            return aa_fit_restarts(
                Xr, K, jax.random.PRNGKey(0), n_init=N_INIT,
                init='random', tolerance=TOL, max_iterations=MAX_ITER,
                stopping_criterion=CRITERION,
                dictionary_solver_kwargs={
                    'max_iterations': DICT_MAX_ITERATIONS},
                weights_solver_kwargs={'max_iterations': 1000,
                                       'backend': 'pallas'},
                **extra)

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
        results[name] = {
            'cold_s': round(cold, 4),
            'warm_s': round(min(warms), 4),
            'warm_all': [round(w, 4) for w in warms],
            'cost': float(out['cost']),
            'mean_iters': round(float(np.mean(out['n_iters'])), 1),
            'max_iters': int(np.max(out['n_iters'])),
            **extra,
        }
        print(json.dumps({name: results[name]}), flush=True)

    if os.path.exists(OUT):
        with open(OUT) as f:
            prior = json.load(f)
        prior.update(results)
        results = prior
    if 'vmapped' in results and 'grouped' in results:
        results['grouped_speedup_warm'] = round(
            results['vmapped']['warm_s'] / results['grouped']['warm_s'], 3)
    results['workload'] = {
        'n': N_SAMPLES, 'd': N_FEATURES, 'k': K, 'n_init': N_INIT,
        'dict_max_iterations': DICT_MAX_ITERATIONS,
        'tolerance': TOL, 'criterion': CRITERION}
    with open(OUT, 'w') as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results))


if __name__ == '__main__':
    main()
