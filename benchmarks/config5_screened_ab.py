"""A/B screened restarts on the config5 model-selection sweep.

Screened restarts (bounded screening pass -> keep the best quarter ->
resume survivors to convergence) cut the protocol fit 19 s -> 5.5 s
(benchmarks/results.json config3 screened_seconds).  The sweep's big-k
buckets are straggler-dominated the same way (per_k_seconds jumps from
~7 s at k<=8 to ~50 s at k>=11), so this measures the full config5
sweep with ``screen_iterations=50`` threaded through
``aa_model_selection_sweep``'s solver kwargs, cold and warm, for
comparison against the recorded unscreened warm pass (273 s).

Costs are comparable, not identical: screening keeps the best quarter
after 50 iterations, and the eventual best restart almost always ranks
inside that fraction (see restarts.aa_fit_restarts docstring).

Run from the repo root: ``python benchmarks/config5_screened_ab.py``.
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


def one_pass(X, ks):
    t0 = time.perf_counter()
    results = aa_model_selection_sweep(
        X, ks, jax.random.PRNGKey(0), n_init=50, tolerance=1e-5,
        stopping_criterion='rel_delta_f', max_iterations=200,
        init='random', component_bucket=8, screen_iterations=50)
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
    out = {"workload": "aa_sweep_k2_20_x50_restarts bucket=8 screen=50"}
    for label in ("screened_cold", "screened_warm"):
        out[label] = one_pass(X, ks)
        print(label, out[label]["seconds"], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
