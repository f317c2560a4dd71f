"""Mesh-sharded archetypal analysis: explicit SPMD over (restarts, samples).

The scaling design for data too large (or restart counts too high) for
one chip.  Mesh axes:

- ``restarts``: independent fits, pure data parallelism (no collectives
  except the final keep-best argmin).
- ``samples``: rows of the data matrix.  Per-row weight QPs are local;
  the k-sized contractions cross shards via ICI collectives:
  ``psum`` for Z'Z / C@K / C@X / cost reductions, ``all_gather`` for the
  (n, k)-sized Z and KZD blocks.

Every device in a ``samples`` group computes identical replicated
scalars for the dictionary solver's convergence test, so the
``lax.while_loop`` trip counts agree and the in-loop ``psum`` cannot
deadlock; the per-row weight solves have no collectives and run with
independent trip counts per shard.

The reference has no distributed execution at all (SURVEY.md §2.4);
this module is the from-scratch TPU scaling layer.
"""

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from ..ops.simplex_projection import simplex_project_rows
from ..solvers.spg import quad_spg, quad_simplex_spg_batch

__all__ = ["distributed_gram", "sharded_aa_train_step"]


def distributed_gram(mesh, X, feature_axis="samples"):
    """Gram matrix ``X X'`` with the feature dimension sharded.

    Each device forms the partial Gram of its feature block on the MXU;
    one ``psum`` over ICI accumulates them (blockwise Gram formation —
    the sharded analog of reference archetypal_analysis.py:1032).
    """
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=P(None, feature_axis), out_specs=P())
    def _gram(X_loc):
        return jax.lax.psum(X_loc @ X_loc.T, feature_axis)

    return _gram(X)


def sharded_aa_train_step(mesh, X, Zs, Cs, alphas, *,
                          dict_iterations=5, weights_iterations=50,
                          restart_axis="restarts", sample_axis="samples"):
    """One full AA alternating iteration over a 2-D mesh.

    Arguments:
      X:      (n_samples, n_features), rows sharded over ``sample_axis``.
      Zs:     (n_restarts, n_samples, k) — restarts over ``restart_axis``,
              sample rows over ``sample_axis``.
      Cs:     (n_restarts, k, n_samples) — restarts sharded, replicated
              within a sample group.
      alphas: (n_restarts, k).

    Returns updated ``(Zs, Cs, alphas, costs)`` with the same shardings
    (``costs``: per-restart objective).  Jit-compatible; call under
    ``jax.jit`` for real runs.
    """

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(sample_axis, None),
                  P(restart_axis, sample_axis, None),
                  P(restart_axis, None, None),
                  P(restart_axis, None)),
        out_specs=(P(restart_axis, sample_axis, None),
                   P(restart_axis, None, None),
                   P(restart_axis, None),
                   P(restart_axis)),
        check_vma=False)
    def step(X_loc, Zs_loc, Cs_loc, alphas_loc):
        n_loc, d = X_loc.shape
        n_samples = Cs_loc.shape[2]  # C is replicated within a sample group
        shard = jax.lax.axis_index(sample_axis)

        # Restart-independent blocks: rows of the Gram matrix.
        X_full = jax.lax.all_gather(X_loc, sample_axis, tiled=True)
        K_loc = X_loc @ X_full.T                     # (n_loc, n)

        def per_restart(Z_loc, C, alpha):
            k = C.shape[0]

            Z_full = jax.lax.all_gather(Z_loc, sample_axis, tiled=True)
            ZtZ = jax.lax.psum(Z_loc.T @ Z_loc, sample_axis)
            KZ_loc = K_loc @ Z_full                  # (n_loc, k)

            # --- dictionary update (distributed quad_spg) ---
            KZD_loc = KZ_loc * alpha[None, :]
            B = jax.lax.all_gather(
                KZD_loc, sample_axis, tiled=True).T / n_samples
            DZtZD = (alpha[:, None] * ZtZ) * alpha[None, :]

            def matvec(Cm):
                # C @ K = sum over shards of C[:, rows_loc] @ K_loc.
                C_cols = jax.lax.dynamic_slice_in_dim(
                    Cm, shard * n_loc, n_loc, axis=1)
                CK = jax.lax.psum(C_cols @ K_loc, sample_axis)
                return DZtZD @ CK / n_samples

            C_new = quad_spg(matvec, B, C, simplex_project_rows,
                             max_iterations=dict_iterations)

            # --- weights update (local rows, no collectives) ---
            CK_loc = (K_loc @ C_new.T).T             # (k, n_loc)
            C_cols = jax.lax.dynamic_slice_in_dim(
                C_new, shard * n_loc, n_loc, axis=1)
            CKCt = jax.lax.psum(CK_loc @ C_cols.T, sample_axis)

            A = (alpha[:, None] * CKCt) * alpha[None, :]
            B_w = -(alpha[:, None] * CK_loc).T       # (n_loc, k)
            Z_loc_new = quad_simplex_spg_batch(
                A, B_w, Z_loc, max_iterations=weights_iterations)

            # --- cost (residual form, psum over shards) ---
            CX = jax.lax.psum(C_cols @ X_loc, sample_axis)  # (k, d)
            resid = Z_loc_new @ (alpha[:, None] * CX) - X_loc
            cost = jax.lax.psum(jnp.sum(resid * resid),
                                sample_axis) * 0.5 / n_samples

            return Z_loc_new, C_new, alpha, cost

        return jax.vmap(per_restart)(Zs_loc, Cs_loc, alphas_loc)

    return step(X, Zs, Cs, alphas)
