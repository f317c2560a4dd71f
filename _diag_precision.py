"""Measure the effect of matmul precision on the f32 TPU fit floor."""
import sys
import time
import numpy as np
import jax

if "--highest" in sys.argv:
    jax.config.update("jax_default_matmul_precision", "highest")

from convex_dim_red_tpu.utils.cache import enable_compilation_cache
enable_compilation_cache()

rng = np.random.RandomState(0)


def planted(rng, n_samples=96, k=3, d=24):
    basis = rng.uniform(size=(k, d))
    Z = rng.uniform(size=(n_samples, k))
    Z /= Z.sum(axis=1, keepdims=True)
    idx = rng.choice(n_samples, size=k, replace=False)
    for comp, i in enumerate(idx):
        Z[i] = 0.0
        Z[i, comp] = 1.0
    return Z @ basis


_ = rng.standard_normal((6, 8))
X = planted(rng).astype(np.float32)

from convex_dim_red_tpu import ArchetypalAnalysis

mode = "highest" if "--highest" in sys.argv else "default"
for backend in ("xla", "pallas"):
    t0 = time.perf_counter()
    m = ArchetypalAnalysis(n_components=3, init='furthest_sum',
                           random_state=0, tolerance=1e-7,
                           max_iterations=120,
                           require_monotonic_cost_decrease=False,
                           weights_solver_kwargs={'backend': backend,
                                                  'max_iterations': 500})
    m.fit_transform(X)
    cd = np.asarray(m.cost_deltas)
    osc = float(cd.max()) if cd.size else 0.0
    print("mode=%s backend=%s cost=%.3e n_iter=%d max_increase=%.3e "
          "wall=%.1fs" % (mode, backend, m.cost, m.n_iter, osc,
                          time.perf_counter() - t0))
