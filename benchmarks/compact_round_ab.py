#!/usr/bin/env python
"""A/B the compaction round length at the headline protocol shape.

Round 3 measured compact_25x96 fastest (15.58 s) with shorter rounds
LOSING (25x32: 20.3 s) — the advisor traced that to every round-chunk
program re-deriving the Gram.  After the Gram-once fix the round-length
tradeoff changes (shorter rounds re-pack the population sooner at a
per-call relay cost of ~35-40 ms), so re-measure before wiring
``COMPACT_ITERS`` into bench.py.  Writes
benchmarks/compact_round_ab.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from convex_dim_red_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

import jax  # noqa: E402

from bench import (DICT_MAX_ITERATIONS, CRITERION, MAX_ITER,  # noqa: E402
                   N_INIT, TOL, make_data)
from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts  # noqa: E402


def main():
    X = jax.device_put(make_data(np.float32))
    jax.block_until_ready(X)
    K = 6

    def run(compact):
        return aa_fit_restarts(
            X, K, jax.random.PRNGKey(0), n_init=N_INIT, init='random',
            tolerance=TOL, max_iterations=MAX_ITER,
            stopping_criterion=CRITERION,
            dictionary_solver_kwargs={
                'max_iterations': DICT_MAX_ITERATIONS},
            weights_solver_kwargs={'max_iterations': 1000,
                                   'backend': 'pallas'},
            restart_chunk=25, compact_iterations=compact)

    out = {}
    for compact in (None, 32, 48, 64, 96, 128):
        label = f"compact_25x{compact}" if compact else "grouped_one_shot"
        run(compact)  # compile + warm
        warm = []
        for _ in range(2):
            t0 = time.perf_counter()
            res = run(compact)
            warm.append(time.perf_counter() - t0)
        out[label] = {
            "warm_s": round(min(warm), 4),
            "warm_all": [round(w, 4) for w in warm],
            "cost": float(res["cost"]),
            "mean_iters": round(float(np.mean(res["n_iters"])), 1),
            "max_iters": int(np.max(res["n_iters"])),
        }
        print(json.dumps({label: out[label]}), flush=True)

    path = os.path.join(REPO, "benchmarks", "compact_round_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", path, file=sys.stderr)


if __name__ == "__main__":
    main()
