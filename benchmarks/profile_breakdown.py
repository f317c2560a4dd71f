#!/usr/bin/env python
"""Where does a protocol restart-iteration's time go?  (round-3 verdict
item 5: "attack the per-iteration floor with evidence".)

Times the stages of ONE grouped AA alternating iteration at the
headline protocol shape (restart chunk R=25, n=1788 samples, d=16384
features, k=6, dictionary capped at 1 SPG step — reference
bin/run_hadisst_aa.py:165) from a WARM state (50 iterations in), which
is the regime the ~168-iteration protocol fit spends almost all its
time in:

- ``iterate``     : the full fused iterate (pre + weights QP + cost)
- ``pre``         : scale/dictionary updates + weights-QP operands
                    (KZ and C@K matmuls + 1-step dict SPG)
- ``weights_qp``  : the grouped QP solve alone (warm starts)
- ``cost_eval``   : the residual-form cost alone (C@X and Z@(aCX))

Each stage runs ``reps`` and ``2*reps`` times inside one compiled
``fori_loop`` and the per-iteration time is the slope — fixed
dispatch/relay overheads cancel (same two-point protocol as
bench.measure_gram_throughput; the axon relay adds ~35-40 ms per
dispatch that would otherwise swamp 10-ms stages).  Stage inputs are
perturbed per trip via the loop carry so XLA cannot hoist the work.

Stages overlap (the full iterate fuses across stage boundaries), so
shares are diagnostic, not an exact partition.  Writes
benchmarks/profile_breakdown.json.
"""

import functools
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

R = 25
N = 1788
D = 16384
K_COMP = 6
WARM_ITERS = 50
REPS = 8


def main():
    import jax
    import jax.numpy as jnp
    from convex_dim_red_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from convex_dim_red_tpu.models._common import (QPSolverConfig,
                                                   SPGSolverConfig)
    from convex_dim_red_tpu.parallel.restarts import (
        _aa_grouped_iterate, _grouped_solver_kwargs, _init_aa_state)
    from convex_dim_red_tpu.solvers.spg import resolve_qp_backend
    from bench import make_data

    backend = resolve_qp_backend('auto', k=K_COMP, regime='sharded_fit')
    X = jax.device_put(make_data(np.float32))
    K_gram = jax.jit(lambda x: x @ x.T)(X)
    jax.block_until_ready(K_gram)

    dict_kwargs, weights_kwargs, scale_kwargs = _grouped_solver_kwargs(
        SPGSolverConfig(max_iterations=1), QPSolverConfig(),
        SPGSolverConfig())

    iterate, cost0 = _aa_grouped_iterate(
        X, K_gram, delta=jnp.float32(0.0), do_scale=False, has_data=True,
        dict_kwargs=dict_kwargs, weights_backend=backend,
        weights_kwargs=weights_kwargs, scale_kwargs=scale_kwargs,
        component_mask=None, trace_K=None)

    # Warm protocol state: 50 iterations from the bench's init keys.
    keys = jax.random.split(jax.random.PRNGKey(0), R)

    @jax.jit
    def warm(keys):
        Zs, Cs, alphas = jax.vmap(functools.partial(
            _init_aa_state, n_samples=N, n_components=K_COMP,
            init='random', diss=None, n_extra_steps=10,
            component_mask=None, do_scale=False,
            dtype=jnp.float32), in_axes=(0, None))(keys, jnp.float32(0.0))

        def body(_, st):
            Zs, Cs, alphas = st
            Zs, Cs, alphas, _ = iterate(Zs, Cs, alphas)
            return Zs, Cs, alphas

        return jax.lax.fori_loop(0, WARM_ITERS, body, (Zs, Cs, alphas))

    Zs, Cs, alphas = jax.block_until_ready(warm(keys))
    print("warm state ready", file=sys.stderr)

    n_samples = K_gram.shape[0]

    # Stage callables: (state, scalar_perturbation) -> consumable scalar.
    # The perturbation multiplies Z so every trip is fresh work.
    def full_iterate(Zs_, Cs_, alphas_, s):
        Z2, C2, a2, costs = iterate(Zs_ * (1.0 + s), Cs_, alphas_)
        return (jnp.sum(costs) + jnp.sum(Z2[:, 0, 0]) + jnp.sum(C2[:, 0, 0])
                ).astype(jnp.float32)

    def pre_only(Zs_, Cs_, alphas_, s):
        def pre(Z, C, alpha):
            ZtZ = Z.T @ Z
            KZ = K_gram @ Z
            KZD = KZ * alpha[None, :]
            DZtZD = (alpha[:, None] * ZtZ) * alpha[None, :]
            from convex_dim_red_tpu.ops.simplex_projection import (
                simplex_project_rows)
            from convex_dim_red_tpu.solvers.spg import quad_spg
            C = quad_spg(lambda Cm: DZtZD @ (Cm @ K_gram) / n_samples,
                         KZD.T / n_samples, C, simplex_project_rows,
                         **dict_kwargs)
            CK = C @ K_gram
            CKCt = CK @ C.T
            A = (alpha[:, None] * CKCt) * alpha[None, :]
            Bw = -(alpha[:, None] * CK).T
            return C, A, Bw
        C2, A2, B2 = jax.vmap(pre)(Zs_ * (1.0 + s), Cs_, alphas_)
        return (jnp.sum(A2[:, 0, 0]) + jnp.sum(B2[:, 0, 0])
                + jnp.sum(C2[:, 0, 0])).astype(jnp.float32)

    # Fixed warm QP operands (one pre pass outside the timed loop).
    @jax.jit
    def make_qp_operands(Zs_, Cs_, alphas_):
        def pre(Z, C, alpha):
            ZtZ = Z.T @ Z
            del ZtZ
            CK = C @ K_gram
            CKCt = CK @ C.T
            A = (alpha[:, None] * CKCt) * alpha[None, :]
            Bw = -(alpha[:, None] * CK).T
            return A, Bw
        return jax.vmap(pre)(Zs_, Cs_, alphas_)

    As, Bws = jax.block_until_ready(make_qp_operands(Zs, Cs, alphas))

    def weights_only(Zs_, Cs_, alphas_, s):
        from convex_dim_red_tpu.solvers.spg import (
            quad_simplex_spg_batch_grouped)
        Z2 = quad_simplex_spg_batch_grouped(
            As, Bws * (1.0 + s), Zs_, backend=backend, **weights_kwargs)
        return jnp.sum(Z2[:, 0, :]).astype(jnp.float32)

    def cost_only(Zs_, Cs_, alphas_, s):
        def one(Z, C, alpha):
            CX = C @ X
            resid = Z @ (alpha[:, None] * CX) - X
            return 0.5 * jnp.sum(resid * resid) / n_samples
        costs = jax.vmap(one)(Zs_ * (1.0 + s), Cs_, alphas_)
        return jnp.sum(costs).astype(jnp.float32)

    def time_stage(fn, reps):
        @functools.partial(jax.jit, static_argnums=4)
        def loop(Zs_, Cs_, alphas_, seed, reps):
            def body(i, acc):
                s = 1e-7 * (acc * 1e-30 + seed + i)
                return acc + fn(Zs_, Cs_, alphas_, s) * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

        times = {}
        for j, r in enumerate((reps, 2 * reps)):
            float(loop(Zs, Cs, alphas, jnp.float32(j + 1), r))  # compile+warm
            t0 = time.perf_counter()
            float(loop(Zs, Cs, alphas, jnp.float32(j + 101), r))
            times[r] = time.perf_counter() - t0
        return (times[2 * reps] - times[reps]) / reps

    stages = {
        "iterate": full_iterate,
        "pre": pre_only,
        "weights_qp": weights_only,
        "cost_eval": cost_only,
    }
    out = {"workload": {"R": R, "n": N, "d": D, "k": K_COMP,
                        "dict_max_iterations": 1,
                        "warm_iters": WARM_ITERS,
                        "weights_backend": backend},
           "protocol": ("two-point slope over fori_loop reps "
                        f"({REPS}, {2 * REPS}); warm-state stage times "
                        "per restart-chunk iteration (R=25 restarts "
                        "advance together)"),
           "stage_seconds": {}}
    for name, fn in stages.items():
        sec = time_stage(fn, REPS)
        out["stage_seconds"][name] = round(sec, 5)
        print(f"{name:12s} {sec * 1e3:8.2f} ms/iter", file=sys.stderr)

    it = out["stage_seconds"]["iterate"]
    out["stage_share_of_iterate"] = {
        n: round(s / it, 3) for n, s in out["stage_seconds"].items()}
    path = os.path.join(REPO, "benchmarks", "profile_breakdown.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
