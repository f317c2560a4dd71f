#!/usr/bin/env python
"""A/B: library matmul-precision policy at the compacted headline.

Regenerates benchmarks/precision_ab.json (the evidence behind the
tensorfloat32 headline decision in bench.py): runs the compacted
headline config (restart_chunk=25, compact_iterations=32, weights cap
25, pallas backend) under each matmul-precision policy, recording warm
wall, device cost, and — the guard — a host float64 re-cost of the
winning restart's returned factors (exact residual form, reference
cost definition archetypal_analysis.py:556 analog).

Measured conclusion (v4, TPU v5e): protocol-scale matmuls are
MXU-throughput-bound, so 3-pass bf16 ('tensorfloat32') is ~1.31x
faster at the same outer-iteration count AND its trajectory lands a
better f64-audited cost.  The library default stays 'float32'
(utils/precision.py — small-problem fits and 1e-12 parity paths).

Usage: ``python benchmarks/precision_ab.py [policy ...]`` (defaults to
float32 tensorfloat32).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

POLICIES = ("float32", "tensorfloat32")


def main():
    import jax
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.utils.precision import set_matmul_precision
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
    import bench

    policies = sys.argv[1:] or list(POLICIES)
    X_host = bench.make_data(np.float32)
    X = jax.device_put(X_host)
    jax.block_until_ready(X)

    def run():
        return aa_fit_restarts(
            X, bench.K, jax.random.PRNGKey(0), n_init=bench.N_INIT,
            init='random', tolerance=bench.TOL,
            max_iterations=bench.MAX_ITER,
            stopping_criterion=bench.CRITERION,
            dictionary_solver_kwargs={
                'max_iterations': bench.DICT_MAX_ITERATIONS},
            weights_solver_kwargs={
                'max_iterations': bench.WEIGHTS_MAX_ITERATIONS,
                'backend': 'pallas'},
            restart_chunk=25, compact_iterations=bench.COMPACT_ITERS)

    path = os.path.join(REPO, "benchmarks", "precision_ab.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)
    out["protocol"] = (
        "compacted headline (cap%d_x%d, pallas) under library "
        "matmul-precision policies; warm_s = best of 2 warm runs; "
        "f64_audit re-costs the winner's returned factors on host "
        "(exact residual form)"
        % (bench.WEIGHTS_MAX_ITERATIONS, bench.COMPACT_ITERS))

    for policy in policies:
        set_matmul_precision(policy)  # clears jax caches
        t0 = time.perf_counter()
        result = run()
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(2):
            t0 = time.perf_counter()
            result = run()
            warms.append(time.perf_counter() - t0)
        out[policy] = {
            "warm_s": round(min(warms), 4),
            "warm_all": [round(w, 4) for w in warms],
            "cold_s": round(cold, 2),
            "cost": float(result["cost"]),
            "mean_iters": round(float(np.mean(result["n_iters"])), 1),
            "max_iters": int(np.max(result["n_iters"])),
            "audit": {
                "device_cost": float(result["cost"]),
                "f64_audit_cost": bench.audit_cost_f64(result, X_host),
                "n_iter_best": int(result["n_iter"]),
            },
        }
        print(json.dumps({policy: out[policy]}), flush=True)

    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
