"""Varying-manual-axes (vma) helpers for shard_map(check_vma=True).

Under ``shard_map`` with static checking enabled, every value is typed
with the mesh axes it may vary over: ``psum`` outputs are invariant
over the reduced axis, ``all_gather`` outputs (and anything touching
``axis_index``) stay varying.  ``lax.while_loop`` requires carry input
and output types — including vma — to match, but solver loops
initialize carries from fresh constants (invariant) and their bodies
mix in shard-varying operands (varying outputs).  :func:`pvary_like`
promotes such inits to the operands' vma; outside ``shard_map`` every
vma is empty and it is a no-op, so the solvers stay backend-agnostic.

(The reference has no distributed execution to compare against —
SURVEY.md §2.4; this supports the from-scratch SPMD layer in
``parallel/sharded_aa.py``.)
"""

import jax

__all__ = ["pvary_like", "vma_of"]


def _leaf_vma(leaf):
    try:
        return frozenset(jax.typeof(leaf).vma)
    except (TypeError, AttributeError):
        return frozenset()


def vma_of(*refs):
    """Union of the varying-manual-axes of every leaf in ``refs``."""
    axes = set()
    for leaf in jax.tree_util.tree_leaves(refs):
        axes |= _leaf_vma(leaf)
    return axes


def pvary_like(tree, *refs, axes=None):
    """Promote every leaf of ``tree`` to vary over the union of the
    reference leaves' manual axes (or an explicit ``axes`` set).

    No-op outside ``shard_map`` (all vmas empty).  Promotion is purely
    a type-level cast (``lax.pcast(..., to='varying')``): the values
    are genuinely replicated at promotion time, and the loop keeps
    them numerically replicated within each group — vma just stops
    asserting it.
    """
    axes = set(axes) if axes is not None else vma_of(*refs)
    if not axes:
        return tree

    def promote(leaf):
        missing = tuple(sorted(axes - _leaf_vma(leaf)))
        if not missing:
            return leaf
        return jax.lax.pcast(leaf, missing, to='varying')

    return jax.tree_util.tree_map(promote, tree)
