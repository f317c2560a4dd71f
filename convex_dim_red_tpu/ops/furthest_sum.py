"""FurthestSum initialization (Morup & Hansen, Neurocomputing 80 (2012)).

Greedy max-dissimilarity-sum seed selection with drop-and-reselect
refinement passes.  The reference implements this with a mutating Python
list of ``[index, distance_sum]`` pairs
(reference: src/convex_dim_red/furthest_sum.py:23-127).  Here the same
greedy is reformulated densely: a length-``n`` running distance-sum
vector plus an active-candidate mask, so each selection step is a masked
argmax + rank-1 sum update.  Two implementations share that design:

- :func:`furthest_sum` — host NumPy, with the reference's full input
  validation (error paths mirrored from furthest_sum.py:56-77,163-166).
- :func:`furthest_sum_device` — jittable JAX version (static
  ``n_components``/``extra_steps``), used for on-device initialization of
  vmapped multi-restart fits where every restart has its own start index.

Tie-breaking at the argmax differs from the reference (first maximum
rather than a position-in-list rule); selections agree whenever distance
sums are distinct, which the reference's own tests rely on.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.precision import apply_matmul_precision

__all__ = ["furthest_sum", "furthest_sum_device",
           "dissimilarities_from_kernel"]


@apply_matmul_precision
def dissimilarities_from_kernel(kernel):
    """Pairwise distances ``d_ij = sqrt(K_ii - 2 K_ij + K_jj)`` from a
    Gram matrix.

    Mirrors the dissimilarity construction used by the reference's
    furthest-sum dictionary init (archetypal_analysis.py:96-100), with a
    clamp at zero to guard against negative round-off under float32.
    """
    diag = jnp.diagonal(kernel)
    sq = diag[None, :] - 2.0 * kernel + diag[:, None]
    return jnp.sqrt(jnp.maximum(sq, 0.0))


def _validate(dissimilarity_matrix, n_components, start_index, exclude):
    d = np.asarray(dissimilarity_matrix)
    if d.ndim != 2 or d.shape[0] != d.shape[1]:
        raise ValueError(
            'Dissimilarity matrix must be square, but got shape %r' %
            list(d.shape))

    n_samples = d.shape[0]

    if start_index >= n_samples:
        raise ValueError('Start index %r is out of bounds (n_samples = %d)' %
                         (start_index, n_samples))

    exclude = np.asarray([] if exclude is None else exclude, dtype=np.int64)
    if np.any(exclude == start_index):
        raise ValueError('Start index %r is excluded' % start_index)

    n_excluded = exclude.size
    if n_excluded < n_samples and n_components > n_samples - n_excluded:
        raise ValueError(
            'Too few points available to select requested number of '
            'components (n_components=%d, n_samples=%d, n_excluded=%d)' %
            (n_components, n_samples, n_excluded))

    return d, exclude


def furthest_sum(dissimilarity_matrix, n_components, start_index,
                 exclude=None, extra_steps=1):
    """Select ``n_components`` mutually furthest sample indices.

    Parameters and error behavior match the reference ``furthest_sum``
    (src/convex_dim_red/furthest_sum.py:130-170).

    Returns
    -------
    selected : ndarray of int, shape (n_components,)
    """
    d, exclude = _validate(dissimilarity_matrix, n_components, start_index,
                           exclude)

    if n_components == 0:
        return np.array([], dtype=np.int64)

    n_samples = d.shape[0]

    # active[i]: i is a selectable candidate; sums[i]: sum of distances
    # from i to every currently selected index (maintained only while
    # i is active).
    active = np.ones(n_samples, dtype=bool)
    active[exclude] = False
    active[start_index] = False

    selected = np.full(n_components, start_index, dtype=np.int64)
    sums = d[:, start_index].astype(np.float64).copy()

    def pick():
        nonlocal sums
        masked = np.where(active, sums, -np.inf)
        idx = int(np.argmax(masked))
        active[idx] = False
        sums = sums + d[:, idx]
        return idx

    for i in range(1, n_components):
        selected[i] = pick()

    for step in range(extra_steps):
        update_index = step % n_components
        r = selected[update_index]

        # Drop r from the selected set: remove its distance contribution
        # and make it a candidate again with a freshly computed sum.
        sums -= d[:, r]
        others = selected[selected != r]
        sums[r] = d[r, others].sum()
        active[r] = True

        selected[update_index] = pick()

    return selected


@apply_matmul_precision
def furthest_sum_device(dissimilarities, n_components, start_index,
                        extra_steps=10, exclude_mask=None):
    """Jittable FurthestSum on a precomputed dissimilarity matrix.

    ``n_components`` and ``extra_steps`` must be static; ``start_index``
    may be a traced scalar (enabling ``vmap`` over per-restart starts).
    ``exclude_mask`` is an optional boolean (n,) array marking excluded
    samples.  Returns int32 indices, shape (n_components,).
    """
    d = jnp.asarray(dissimilarities)
    n = d.shape[0]
    start_index = jnp.asarray(start_index, dtype=jnp.int32)

    active = jnp.ones((n,), dtype=bool)
    if exclude_mask is not None:
        active = active & ~jnp.asarray(exclude_mask, dtype=bool)
    active = active.at[start_index].set(False)

    selected = jnp.full((n_components,), start_index, dtype=jnp.int32)
    sums = d[:, start_index]

    neg = jnp.asarray(-jnp.inf, dtype=d.dtype)

    def pick(active, sums):
        idx = jnp.argmax(jnp.where(active, sums, neg)).astype(jnp.int32)
        active = active.at[idx].set(False)
        sums = sums + d[:, idx]
        return idx, active, sums

    def greedy_body(i, carry):
        selected, active, sums = carry
        idx, active, sums = pick(active, sums)
        selected = selected.at[i].set(idx)
        return selected, active, sums

    selected, active, sums = jax.lax.fori_loop(
        1, n_components, greedy_body, (selected, active, sums))

    def extra_body(step, carry):
        selected, active, sums = carry
        update_index = step % n_components
        r = selected[update_index]

        sums = sums - d[:, r]
        # Sum of distances from r to the other selected indices.
        is_other = (selected != r)
        r_sum = jnp.sum(jnp.where(is_other, d[r, selected], 0.0))
        sums = sums.at[r].set(r_sum)
        active = active.at[r].set(True)

        idx, active, sums = pick(active, sums)
        selected = selected.at[update_index].set(idx)
        return selected, active, sums

    if extra_steps > 0:
        selected, active, sums = jax.lax.fori_loop(
            0, extra_steps, extra_body, (selected, active, sums))

    return selected
