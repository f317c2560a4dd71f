"""Device-mesh helpers for multi-chip runs.

The reference has no distributed backend (single-process CPU package;
SURVEY.md §2.4); scaling in this framework is built on
``jax.sharding.Mesh`` over ICI.  The two parallel axes that exist in
this problem domain:

- ``restarts``: independent multi-restart fits (data-parallel analog) —
  the reference runs these serially (bin/run_hadisst_aa.py:158-174).
- ``samples``: rows of the data/kernel matrix (tensor/sequence-parallel
  analog) — Gram formation and the per-row weight QPs shard over it,
  with ``psum``/``all_gather`` over ICI for the k-sized reductions.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["create_mesh", "replicate", "shard_batch", "P", "NamedSharding"]


def create_mesh(shape=None, axis_names=("restarts", "samples"),
                devices=None):
    """Create a mesh over the available devices.

    ``shape=None`` puts all devices on the first axis.  For a 2-D mesh
    pass e.g. ``shape=(4, 2)``.
    """
    if devices is None:
        devices = jax.devices()
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def replicate(mesh, x):
    """Place ``x`` replicated over every mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch(mesh, x, axis_name="restarts"):
    """Shard the leading axis of ``x`` over ``axis_name``."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
