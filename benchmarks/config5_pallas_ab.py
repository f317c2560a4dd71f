"""A/B the config5 model-selection sweep's weights-QP backend.

With the runtime-mask Pallas kernel, the bucketed sweep can run its
per-row weight QPs in the fused VMEM kernel.  This measures cold and
warm passes of config5 (900x4096, k=2..20 step 3, 50 restarts) with
backend='pallas' for comparison against the recorded XLA warm pass
(benchmarks/results.json config5_rerun.warm_seconds).

Run from the repo root: ``python benchmarks/config5_pallas_ab.py``.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax

from benchmarks.run_all import _hadisst_scale_data
from convex_dim_red_tpu.parallel.sweep import aa_model_selection_sweep


def one_pass(X, ks, backend):
    t0 = time.perf_counter()
    results = aa_model_selection_sweep(
        X, ks, jax.random.PRNGKey(0), n_init=50, tolerance=1e-5,
        stopping_criterion='rel_delta_f', max_iterations=200,
        init='random', component_bucket=8,
        weights_solver_kwargs={'backend': backend})
    seconds = time.perf_counter() - t0
    return {
        "seconds": round(seconds, 2),
        "costs": {k: round(v['cost'], 4) for k, v in results.items()},
        "per_k_seconds": {k: round(v['elapsed'], 2)
                          for k, v in results.items()},
    }


def main():
    X = _hadisst_scale_data(n=900, d=4096)
    ks = list(range(2, 21, 3))
    out = {"workload": "aa_sweep_k2_20_x50_restarts bucket=8"}
    for label in ("pallas_cold", "pallas_warm"):
        out[label] = one_pass(X, ks, "pallas")
        print(label, out[label]["seconds"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
