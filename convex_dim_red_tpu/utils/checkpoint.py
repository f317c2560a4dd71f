"""Checkpoint / resume for long multi-restart sweeps.

The reference has no checkpointing (SURVEY.md §5: persistence is final
netCDF only; warm starts via ``init='custom'``).  This module adds real
checkpointing of the alternating-solver state ``(weights, dictionary,
alpha, iteration, cost)`` — orbax-backed when available, .npz fallback —
and a resume helper that re-enters a fit through the models' existing
``init='custom'`` path.
"""

import os

import numpy as np

__all__ = ["save_checkpoint", "load_checkpoint", "resume_kernel_aa"]


def save_checkpoint(path, state):
    """Persist a solver-state dict of arrays/scalars.

    ``state`` keys: any of 'weights', 'dictionary', 'alpha', 'cost',
    'n_iter', plus arbitrary metadata scalars.
    """
    arrays = {k: np.asarray(v) for k, v in state.items()}
    try:
        import orbax.checkpoint as ocp
        path = os.path.abspath(path)
        checkpointer = ocp.PyTreeCheckpointer()
        checkpointer.save(path, arrays, force=True)
    except Exception:
        # .npz fallback: always available, same contents.
        np.savez(path if path.endswith('.npz') else path + '.npz',
                 **arrays)


def load_checkpoint(path):
    """Load a checkpoint saved by :func:`save_checkpoint`."""
    npz_path = path if path.endswith('.npz') else path + '.npz'
    if os.path.exists(npz_path) and not os.path.isdir(path):
        with np.load(npz_path) as f:
            return {k: f[k] for k in f.files}
    import orbax.checkpoint as ocp
    checkpointer = ocp.PyTreeCheckpointer()
    return checkpointer.restore(os.path.abspath(path))


def resume_kernel_aa(model, kernel, checkpoint, **kwargs):
    """Resume a :class:`KernelAA`/:class:`ArchetypalAnalysis` fit from a
    checkpoint via the custom-init path (the reference's warm-start
    mechanism, archetypal_analysis.py:798-804)."""
    model.init = 'custom'
    return model.fit_transform(
        kernel,
        dictionary=checkpoint['dictionary'],
        weights=checkpoint['weights'],
        alpha=checkpoint.get('alpha'),
        **kwargs)
