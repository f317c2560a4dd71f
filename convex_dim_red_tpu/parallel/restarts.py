"""Multi-restart fits: vmapped on one chip, sharded over a mesh.

The reference's keep-best-of-``n_init`` loop is serial Python
(reference bin/run_hadisst_aa.py:149-174, n_init=100) — the single
biggest TPU win in this workload.  Here the restart axis is a ``vmap``
batch of PRNG keys: every alternating update's matmuls gain a leading
restart dimension (bigger MXU tiles), and the lockstep while loop runs
until the slowest restart converges.  On a mesh the same batch is
sharded over the ``restarts`` axis with ``shard_map`` so each device
group runs its local restarts with an independent trip count; the
keep-best reduction is a global argmin over the gathered costs.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..models._common import QPSolverConfig, SPGSolverConfig
from ..models.archetypal_analysis import _kernel_aa_core
from ..ops.furthest_sum import furthest_sum_device, \
    dissimilarities_from_kernel
from ..ops.stochastic_matrices import right_stochastic_matrix

__all__ = ["aa_fit_restarts", "kernel_aa_fit_restarts",
           "gpnh_fit_restarts", "select_best"]


def select_best(costs, state):
    """Select the argmin-cost slice of a stacked result pytree."""
    best = jnp.argmin(costs)
    return jax.tree_util.tree_map(lambda leaf: leaf[best], state)


def aa_fit_restarts(data, n_components, key, n_init, delta=0.0,
                    init='furthest_sum', tolerance=1e-6,
                    max_iterations=500, n_extra_steps=10,
                    stopping_criterion='abs_delta_f',
                    dictionary_solver_kwargs=None,
                    weights_solver_kwargs=None,
                    scale_factors_solver_kwargs=None,
                    mesh=None, restart_axis='restarts',
                    restart_chunk=None):
    """Best-of-``n_init`` archetypal analysis, fully on device.

    ``data``: (n_samples, n_features) matrix.  Returns a dict with the
    best restart's ``weights``, ``dictionary``, ``alpha``,
    ``archetypes``, ``cost``, ``n_iter``, plus ``costs`` for all
    restarts.  With ``mesh`` given, the restart batch is sharded over
    ``restart_axis`` (the key batch is placed with a ``NamedSharding``
    and XLA partitions the vmapped fit).

    ``restart_chunk`` bounds how many restarts run in one device
    execution: very long single executions (large k x many restarts x
    many iterations) can exceed the TPU worker's execution watchdog and
    kill the worker process; chunks keep each call bounded with
    identical keep-best semantics.
    """
    from ..models._common import make_config

    X = jnp.asarray(data)

    dict_cfg = make_config(SPGSolverConfig, dictionary_solver_kwargs)
    weights_cfg = make_config(QPSolverConfig, weights_solver_kwargs)
    scale_cfg = make_config(SPGSolverConfig, scale_factors_solver_kwargs)

    keys = jax.random.split(key, n_init)
    if mesh is not None:
        keys = jax.device_put(
            keys, NamedSharding(mesh, P(restart_axis, None)))
        X = jax.device_put(X, NamedSharding(mesh, P()))

    do_scale = float(delta) != 0.0

    @functools.partial(
        jax.jit,
        static_argnames=('n_components', 'init', 'max_iterations',
                         'n_extra_steps', 'criterion', 'do_scale'))
    def run(X, keys, delta, tolerance, *, n_components, init,
            max_iterations, n_extra_steps, criterion, do_scale):
        # Gram, dissimilarities, every restart, and the keep-best
        # reduction run inside one XLA program — only the winning state
        # (plus the small per-restart costs) leaves the device.
        K = X @ X.T
        n_samples = K.shape[0]
        dtype = K.dtype
        diss = (dissimilarities_from_kernel(K)
                if init == 'furthest_sum' else None)

        def fit_one(key):
            k_start, k_dict, k_weights, k_alpha = jax.random.split(key, 4)
            if init == 'furthest_sum':
                start = jax.random.randint(k_start, (), 0, n_samples)
                selected = furthest_sum_device(
                    diss, n_components, start, extra_steps=n_extra_steps)
                C = jax.nn.one_hot(selected, n_samples, dtype=dtype)
            else:
                C = right_stochastic_matrix(
                    k_dict, (n_components, n_samples), dtype=dtype)
            Z = right_stochastic_matrix(
                k_weights, (n_samples, n_components), dtype=dtype)
            if do_scale:
                alpha = jax.random.uniform(
                    k_alpha, (n_components,), dtype=dtype,
                    minval=1 - delta, maxval=1 + delta)
            else:
                alpha = jnp.ones((n_components,), dtype=dtype)

            Z, C, alpha, cost, n_iter, trace, _ = _kernel_aa_core(
                K, Z, C, alpha, delta, tolerance, X,
                do_scale=do_scale, do_dict=True, do_weights=True,
                criterion=criterion, max_iterations=max_iterations,
                require_monotonic=False, has_data=True,
                dict_cfg=dict_cfg, weights_cfg=weights_cfg,
                scale_cfg=scale_cfg, verbose=False)
            return Z, C, alpha, cost, n_iter, trace

        Zs, Cs, alphas, costs, n_iters, traces = jax.vmap(fit_one)(keys)
        best = jnp.argmin(costs)
        return (Zs[best], Cs[best], alphas[best], traces[best],
                costs, n_iters, best)

    if restart_chunk is None or restart_chunk >= n_init:
        chunks = [keys]
    else:
        chunks = [keys[i:i + restart_chunk]
                  for i in range(0, n_init, restart_chunk)]

    best_state = None
    best_cost = np.inf
    all_costs = []
    all_n_iters = []
    best_offset = 0
    for offset, chunk in enumerate(chunks):
        Z, C, alpha, trace, costs, n_iters, best_idx = run(
            X, chunk, jnp.asarray(delta, X.dtype),
            jnp.asarray(tolerance, X.dtype),
            n_components=int(n_components), init=init,
            max_iterations=int(max_iterations),
            n_extra_steps=int(n_extra_steps),
            criterion=stopping_criterion, do_scale=do_scale)
        costs = np.asarray(costs)
        all_costs.append(costs)
        all_n_iters.append(np.asarray(n_iters))
        chunk_best = float(costs.min())
        if chunk_best < best_cost:
            best_cost = chunk_best
            best_state = (Z, C, alpha, trace)
            best_offset = sum(c.shape[0] for c in all_costs[:-1]) \
                + int(best_idx)

    Z, C, alpha, trace = best_state
    costs = np.concatenate(all_costs)
    n_iters = np.concatenate(all_n_iters)
    n_iter_best = int(n_iters[best_offset])
    cost_deltas = np.asarray(trace)[:n_iter_best]
    dictionary = alpha[:, None] * C if do_scale else C
    archetypes = dictionary @ X

    return {
        'weights': Z,
        'dictionary': dictionary,
        'alpha': alpha,
        'archetypes': archetypes,
        'cost': best_cost,
        'n_iter': n_iter_best,
        'cost_deltas': cost_deltas,
        'costs': costs,
        'n_iters': n_iters,
        'best_index': best_offset,
    }


def gpnh_fit_restarts(data, n_components, key, n_init, lambda_W=0.0,
                      init='random', tolerance=1e-6, max_iterations=500,
                      n_extra_steps=10,
                      stopping_criterion='abs_delta_f',
                      weights_solver_kwargs=None,
                      mesh=None, restart_axis='restarts'):
    """Best-of-``n_init`` GPNH convex coding, fully on device.

    Vmapped analog of the reference drivers' serial keep-best loop for
    GPNH (bin/run_hadisst_gpnh.py:149-171).  Returns a dict with the
    best restart's ``weights``, ``dictionary``, ``cost``, ``n_iter``,
    ``cost_deltas`` plus the full ``costs``/``n_iters`` arrays.
    """
    from ..models._common import make_config
    from ..models.gpnh_convex_coding import _gpnh_core

    X = jnp.asarray(data)
    n_samples, n_features = X.shape
    weights_cfg = make_config(QPSolverConfig, weights_solver_kwargs)

    keys = jax.random.split(key, n_init)
    if mesh is not None:
        keys = jax.device_put(
            keys, NamedSharding(mesh, P(restart_axis, None)))
        X = jax.device_put(X, NamedSharding(mesh, P()))

    @functools.partial(
        jax.jit,
        static_argnames=('n_components', 'init', 'max_iterations',
                         'criterion'))
    def run(X, keys, lambda_W, tolerance, *, n_components, init,
            max_iterations, criterion):
        dtype = X.dtype

        def fit_one(key):
            k_dict, k_weights = jax.random.split(key)
            if init == 'random':
                avg = jnp.sqrt(jnp.mean(jnp.abs(X)) / n_components)
                W = avg * jax.random.normal(
                    k_dict, (n_features, n_components), dtype=dtype)
            else:
                raise ValueError(
                    "gpnh_fit_restarts supports init='random' (the "
                    "reference drivers' default); furthest_sum init is "
                    "available through the GPNHConvexCoding estimator")
            Z = right_stochastic_matrix(
                k_weights, (n_samples, n_components), dtype=dtype)
            Z, W, cost, n_iter, trace, _ = _gpnh_core(
                X, Z, W, lambda_W, tolerance,
                do_dict=True, do_weights=True, criterion=criterion,
                max_iterations=max_iterations, require_monotonic=False,
                weights_cfg=weights_cfg, verbose=False)
            return Z, W, cost, n_iter, trace

        return jax.vmap(fit_one)(keys)

    Zs, Ws, costs, n_iters, traces = run(
        X, keys, jnp.asarray(lambda_W, X.dtype),
        jnp.asarray(tolerance, X.dtype),
        n_components=int(n_components), init=init,
        max_iterations=int(max_iterations),
        criterion=stopping_criterion)

    best = int(jnp.argmin(costs))
    n_iter_best = int(n_iters[best])
    return {
        'weights': Zs[best],
        'dictionary': Ws[best],
        'cost': float(costs[best]),
        'n_iter': n_iter_best,
        'cost_deltas': np.asarray(traces[best])[:n_iter_best],
        'costs': costs,
        'n_iters': np.asarray(n_iters),
        'best_index': best,
    }


def kernel_aa_fit_restarts(kernel, n_components, key, n_init, delta=0.0,
                           init='furthest_sum', tolerance=1e-6,
                           max_iterations=500, n_extra_steps=10,
                           stopping_criterion='abs_delta_f',
                           dictionary_solver_kwargs=None,
                           weights_solver_kwargs=None,
                           scale_factors_solver_kwargs=None,
                           restart_chunk=None):
    """Best-of-``n_init`` kernel AA on a precomputed kernel matrix.

    Kernel-space analog of :func:`aa_fit_restarts` for ``KernelAA``
    users (no data matrix; the outer-loop cost uses the kernel trace
    form).  Returns a dict with the best restart's ``weights``,
    ``dictionary``, ``alpha``, ``cost``, ``n_iter``, ``cost_deltas``,
    plus ``costs``/``n_iters`` for every restart.
    """
    from ..models._common import make_config

    K = jnp.asarray(kernel)
    dict_cfg = make_config(SPGSolverConfig, dictionary_solver_kwargs)
    weights_cfg = make_config(QPSolverConfig, weights_solver_kwargs)
    scale_cfg = make_config(SPGSolverConfig, scale_factors_solver_kwargs)

    keys = jax.random.split(key, n_init)
    do_scale = float(delta) != 0.0

    @functools.partial(
        jax.jit,
        static_argnames=('n_components', 'init', 'max_iterations',
                         'n_extra_steps', 'criterion', 'do_scale'))
    def run(K, keys, delta, tolerance, *, n_components, init,
            max_iterations, n_extra_steps, criterion, do_scale):
        n_samples = K.shape[0]
        dtype = K.dtype
        diss = (dissimilarities_from_kernel(K)
                if init == 'furthest_sum' else None)

        def fit_one(key):
            k_start, k_dict, k_weights, k_alpha = jax.random.split(key, 4)
            if init == 'furthest_sum':
                start = jax.random.randint(k_start, (), 0, n_samples)
                selected = furthest_sum_device(
                    diss, n_components, start, extra_steps=n_extra_steps)
                C = jax.nn.one_hot(selected, n_samples, dtype=dtype)
            else:
                C = right_stochastic_matrix(
                    k_dict, (n_components, n_samples), dtype=dtype)
            Z = right_stochastic_matrix(
                k_weights, (n_samples, n_components), dtype=dtype)
            if do_scale:
                alpha = jax.random.uniform(
                    k_alpha, (n_components,), dtype=dtype,
                    minval=1 - delta, maxval=1 + delta)
            else:
                alpha = jnp.ones((n_components,), dtype=dtype)

            Z, C, alpha, cost, n_iter, trace, _ = _kernel_aa_core(
                K, Z, C, alpha, delta, tolerance,
                jnp.zeros((), dtype),
                do_scale=do_scale, do_dict=True, do_weights=True,
                criterion=criterion, max_iterations=max_iterations,
                require_monotonic=False, has_data=False,
                dict_cfg=dict_cfg, weights_cfg=weights_cfg,
                scale_cfg=scale_cfg, verbose=False)
            return Z, C, alpha, cost, n_iter, trace

        Zs, Cs, alphas, costs, n_iters, traces = jax.vmap(fit_one)(keys)
        best = jnp.argmin(costs)
        return (Zs[best], Cs[best], alphas[best], traces[best],
                costs, n_iters, best)

    if restart_chunk is None or restart_chunk >= n_init:
        chunks = [keys]
    else:
        chunks = [keys[i:i + restart_chunk]
                  for i in range(0, n_init, restart_chunk)]

    best_state, best_cost, best_offset = None, np.inf, 0
    all_costs, all_n_iters = [], []
    for chunk in chunks:
        Z, C, alpha, trace, costs, n_iters, best_idx = run(
            K, chunk, jnp.asarray(delta, K.dtype),
            jnp.asarray(tolerance, K.dtype),
            n_components=int(n_components), init=init,
            max_iterations=int(max_iterations),
            n_extra_steps=int(n_extra_steps),
            criterion=stopping_criterion, do_scale=do_scale)
        costs = np.asarray(costs)
        all_costs.append(costs)
        all_n_iters.append(np.asarray(n_iters))
        if float(costs.min()) < best_cost:
            best_cost = float(costs.min())
            best_state = (Z, C, alpha, trace)
            best_offset = sum(c.shape[0] for c in all_costs[:-1]) \
                + int(best_idx)

    Z, C, alpha, trace = best_state
    n_iters = np.concatenate(all_n_iters)
    n_iter_best = int(n_iters[best_offset])
    return {
        'weights': Z,
        'dictionary': C,
        'alpha': alpha,
        'cost': best_cost,
        'n_iter': n_iter_best,
        'cost_deltas': np.asarray(trace)[:n_iter_best],
        'costs': np.concatenate(all_costs),
        'n_iters': n_iters,
        'best_index': best_offset,
    }
