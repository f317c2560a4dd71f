"""Shape sweep: pallas vs xla weights-QP backend on the real TPU.

Grounds the ``backend='auto'`` dispatch heuristic
(solvers/spg.py:resolve_qp_backend) in measurement: times cold-start
simplex-QP batches across the shape regimes the fits actually hit —
single-Hessian batches (one fit's weights update) and grouped
restart batches (vmapped/sharded multi-restart fits) — for both
backends, warm-timed with perturbed inputs (the relay short-circuits
identical (program, args) re-executions).

Prints one JSON line per shape and a summary table to stderr.

Usage: python benchmarks/qp_backend_sweep.py [--reps 3]
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

# (R groups, n rows per group, k) — R=0 means single-Hessian batch
SHAPES = [
    (0, 256, 6),
    (0, 900, 6),
    (0, 1788, 6),
    (0, 7152, 6),
    (0, 28608, 6),     # protocol-scale transform batch
    (0, 1788, 20),
    (0, 1788, 70),     # unpacked kernel (k > 64)
    (10, 900, 8),      # config5 sweep bucket chunk
    (10, 900, 24),
    (25, 1788, 6),     # protocol restart chunk
    (25, 1788, 16),
]


def make(rng, R, n, k):
    groups = max(R, 1)
    As = np.empty((groups, k, k), np.float32)
    for r in range(groups):
        M = rng.standard_normal((k, k))
        As[r] = (M @ M.T + np.eye(k)).astype(np.float32)
    Bs = rng.standard_normal((groups, n, k)).astype(np.float32)
    X0 = np.full((groups, n, k), 1.0 / k, np.float32)
    if R == 0:
        return jnp.asarray(As[0]), jnp.asarray(Bs[0]), jnp.asarray(X0[0])
    return jnp.asarray(As), jnp.asarray(Bs), jnp.asarray(X0)


def main():
    p = argparse.ArgumentParser()
    p.add_argument('--reps', type=int, default=3)
    args = p.parse_args()

    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.solvers.spg import (
        quad_simplex_spg_batch, quad_simplex_spg_batch_grouped)

    rng = np.random.RandomState(0)
    print(f"device: {jax.devices()[0]}", file=sys.stderr)

    for R, n, k in SHAPES:
        A, B, X0 = make(rng, R, n, k)
        jax.block_until_ready((A, B, X0))
        row = {'R': R, 'n': n, 'k': k}
        for backend in ('pallas', 'xla'):
            def solve(Ai):
                if R == 0:
                    return quad_simplex_spg_batch(
                        Ai, B, X0, backend=backend, max_iterations=1000)
                return quad_simplex_spg_batch_grouped(
                    Ai, B, X0, backend=backend, max_iterations=1000)
            try:
                jax.block_until_ready(solve(A))  # compile + warm
                t0 = time.perf_counter()
                for i in range(args.reps):
                    Ai = A * (1.0 + 1e-6 * (i + 1))
                    jax.block_until_ready(Ai)
                    jax.block_until_ready(solve(Ai))
                row[backend + '_ms'] = round(
                    (time.perf_counter() - t0) / args.reps * 1e3, 2)
            except Exception as e:  # Mosaic lowering failure etc.
                row[backend + '_ms'] = None
                row[backend + '_error'] = str(e)[:120]
        if row.get('pallas_ms') and row.get('xla_ms'):
            row['pallas_speedup'] = round(
                row['xla_ms'] / row['pallas_ms'], 3)
        print(json.dumps(row), flush=True)


if __name__ == '__main__':
    main()
