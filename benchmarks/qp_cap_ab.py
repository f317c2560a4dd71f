#!/usr/bin/env python
"""A/B: weights-QP inner-iteration cap at the headline protocol.

Tested hypothesis (REJECTED by this script's own results): that the
gap between the warm per-iteration profile (6.52 ms x ~700
chunk-iterations ~ 5 s) and the 12.6 s headline was cold-phase QPs
burning toward the 1000-iteration inner cap.  The measurements refute
it — caps 1000 -> 50 leave cost and outer-iteration counts identical
and wall within ~5%, so the inner loop already early-exits everywhere
and the extra per-iteration work is intrinsic (active-row QP work
mid-fit; see CLAUDE.md and profile_breakdown.json).  What survives is
a small quality/wall trade at cap 25, which perturbs the f32
trajectory (same lottery as the Gram bit-pattern sensitivity) and is
the shipped headline value.  Block-coordinate descent tolerates inexact
inner solves — the next outer iteration warm-starts from the returned
Z; the reference ships the same knob for its jra55 protocol
(bin/run_jra55_pca_aa.py:119-120, max_iterations=1).

Measures the compacted headline config (restart_chunk=25,
compact_iterations=32, backend pallas) at several inner caps: warm
wall, final cost, outer-iteration stats.  Merges into
benchmarks/qp_cap_ab.json, preserving keys this script does not
produce (e.g. the cap_x_compact grid and its note).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CAPS = (1000, 200, 100, 50, 25)


def main():
    import jax
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.parallel.restarts import aa_fit_restarts
    import bench

    X = jax.device_put(bench.make_data(np.float32))
    jax.block_until_ready(X)

    def run(cap):
        return aa_fit_restarts(
            X, bench.K, jax.random.PRNGKey(0), n_init=bench.N_INIT,
            init='random', tolerance=bench.TOL,
            max_iterations=bench.MAX_ITER,
            stopping_criterion=bench.CRITERION,
            dictionary_solver_kwargs={
                'max_iterations': bench.DICT_MAX_ITERATIONS},
            weights_solver_kwargs={'max_iterations': cap,
                                   'backend': 'pallas'},
            restart_chunk=25, compact_iterations=bench.COMPACT_ITERS)

    out = {"protocol": "compacted headline (25 x %d) at weights-QP "
                       "inner caps" % bench.COMPACT_ITERS,
           "caps": {}}
    for cap in CAPS:
        t0 = time.perf_counter()
        result = run(cap)
        cold = time.perf_counter() - t0
        warms = []
        for _ in range(2):
            t0 = time.perf_counter()
            result = run(cap)
            warms.append(time.perf_counter() - t0)
        out["caps"][cap] = {
            "warm_s": round(min(warms), 4),
            "warm_all": [round(w, 4) for w in warms],
            "cold_s": round(cold, 2),
            "cost": float(result["cost"]),
            "mean_iters": round(float(np.mean(result["n_iters"])), 1),
            "max_iters": int(np.max(result["n_iters"])),
        }
        print(json.dumps({str(cap): out["caps"][cap]}), flush=True)

    path = os.path.join(REPO, "benchmarks", "qp_cap_ab.json")
    # Merge-preserve: keep keys produced by other experiments (the
    # cap_x_compact grid, notes) instead of silently dropping them.
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev.update(out)
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    main()
