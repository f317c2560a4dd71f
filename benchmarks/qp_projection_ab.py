#!/usr/bin/env python
"""A/B: Michelot vs bisection simplex projection in the packed kernel.

The roofline (benchmarks/qp_roofline.py) shows 26 of the ~32 MXU
matmuls per inner SPG iteration are threshold-bisection segment sums.
Michelot's active-set iteration computes the threshold EXACTLY in at
most k steps of 2 segment matmuls (k=6 at the protocol) — if the
kernel is MXU-bound this is a ~1.8x algorithmic cut in kernel work.
This script measures:

1. kernel-level: cold protocol-shaped grouped QPs under both
   projections — wall time and solution parity;
2. fit-level: the full headline protocol fit under both (flipping the
   ``ops.pallas_qp.PACKED_PROJECTION`` knob), with the f64 audit of the
   winner's cost.

Writes benchmarks/qp_projection_ab.json.
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    import jax
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.utils.precision import set_matmul_precision
    from convex_dim_red_tpu.ops import pallas_qp
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
    from benchmarks.qp_roofline import make_operands
    import bench

    out = {}

    # --- 1. kernel level -------------------------------------------------
    As, Bs, X0 = map(jax.device_put, make_operands())
    jax.block_until_ready((As, Bs, X0))

    import functools
    import jax.numpy as jnp

    @functools.partial(jax.jit, static_argnums=(3,))
    def run_kernel(As, Bs, X0, projection):
        return pallas_qp.quad_simplex_qp_pallas_packed_grouped(
            As, Bs, X0, max_iterations=500, projection=projection)

    REPS = 4

    @functools.partial(jax.jit, static_argnums=(3, 4))
    def run_reps(As, Bs, X0, projection, reps):
        # In-loop invocations with a loop-carried perturbation: the
        # relay short-circuits repeated executions of an identical
        # (program, buffers) pair, so timing repeated identical calls
        # measures nothing (observed ~35 us for a millisecond kernel).
        def body(_, s):
            sol = pallas_qp.quad_simplex_qp_pallas_packed_grouped(
                As * (1.0 + s), Bs, X0, max_iterations=500,
                projection=projection)
            return jnp.sum(sol) * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    sols = {}
    for proj in ("bisect", "michelot"):
        sols[proj] = jax.block_until_ready(
            run_kernel(As, Bs, X0, proj))  # solution for parity checks
        float(run_reps(As, Bs, X0, proj, REPS))  # compile + warm
        best = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_reps(As, Bs, X0, proj, REPS))
            best = min(best, (time.perf_counter() - t0) / REPS)
        out["kernel_%s_s" % proj] = round(best, 5)
        print(json.dumps({proj: best}), flush=True)

    def obj(Xs):
        Xs = np.asarray(Xs, np.float64)
        A64 = np.asarray(As, np.float64)
        B64 = np.asarray(Bs, np.float64)
        vals = 0.5 * np.einsum('rnk,rkl,rnl->rn', Xs, A64, Xs) \
            + np.einsum('rnk,rnk->rn', B64, Xs)
        return float(vals.mean())

    out["kernel_obj_bisect"] = obj(sols["bisect"])
    out["kernel_obj_michelot"] = obj(sols["michelot"])
    out["kernel_feasibility_michelot"] = {
        "max_rowsum_err": float(np.abs(
            np.asarray(sols["michelot"]).sum(-1) - 1.0).max()),
        "min_entry": float(np.asarray(sols["michelot"]).min()),
    }
    out["kernel_speedup"] = round(
        out["kernel_bisect_s"] / out["kernel_michelot_s"], 4)

    # --- 2. headline fit level -------------------------------------------
    set_matmul_precision(bench.HEADLINE_MATMUL_PRECISION)
    X_host = bench.make_data(np.float32)
    X = jax.device_put(X_host)
    jax.block_until_ready(X)

    def run_fit():
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

    from convex_dim_red_tpu.parallel import restarts as restarts_mod
    for proj in ("bisect", "michelot"):
        pallas_qp.PACKED_PROJECTION = proj
        # The module knob is read at TRACE time; the fit's round
        # runners are lru-cached without it in the key, so each arm
        # must drop the cached (already-traced) runners or the second
        # arm silently reuses the first arm's compiled programs.
        restarts_mod._make_aa_grouped_round_run.cache_clear()
        restarts_mod._make_aa_grouped_run.cache_clear()
        t0 = time.perf_counter()
        result = run_fit()
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(2):
            t0 = time.perf_counter()
            result = run_fit()
            warms.append(time.perf_counter() - t0)
        out["fit_" + proj] = {
            "warm_s": round(min(warms), 4),
            "warm_all": [round(w, 4) for w in warms],
            "cold_s": round(cold, 2),
            "cost": float(result["cost"]),
            "cost_f64_audit": round(
                bench.audit_cost_f64(result, X_host), 4),
            "mean_iters": round(float(np.mean(result["n_iters"])), 1),
        }
        print(json.dumps({proj: out["fit_" + proj]}), flush=True)
    pallas_qp.PACKED_PROJECTION = 'michelot'

    out["fit_speedup"] = round(out["fit_bisect"]["warm_s"]
                               / out["fit_michelot"]["warm_s"], 4)
    path = os.path.join(REPO, "benchmarks", "qp_projection_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"kernel_speedup": out["kernel_speedup"],
                      "fit_speedup": out["fit_speedup"]}), flush=True)


if __name__ == "__main__":
    main()
