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

__all__ = ["create_mesh", "create_hybrid_mesh", "ensure_mesh_axes",
           "replicate", "shard_batch", "P", "NamedSharding"]


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


def create_hybrid_mesh(axis_names=("restarts", "samples"), devices=None,
                       slice_groups=None):
    """Mesh for multi-slice TPU pods: restarts over DCN, samples over ICI.

    The BASELINE stretch config (BASELINE.json configs[4]) is a
    multi-restart sweep sharded across more chips than one slice holds.
    On a multi-slice pod the two mesh axes have very different
    communication profiles, so their placement matters:

    - the **restart** axis carries *independent* fits — the only
      cross-device traffic is the final keep-best ``argmin`` reduction
      (one scalar per restart, once per fit).  It tolerates the slow
      data-centre network (DCN) between slices.
    - the **sample** axis carries the per-iteration ``psum`` /
      ``all_gather`` collectives of the sharded Gram rows and k-sized
      contractions (parallel/sharded_aa.py).  It must stay inside a
      slice so those collectives ride ICI.

    Devices are therefore grouped by slice (``device.slice_index`` on
    real multi-slice TPU backends; pass ``slice_groups`` explicitly to
    override or when testing on hosts without slice indices), the
    restart axis spans the groups, and the sample axis spans devices
    within a group.  On a single slice this degrades to
    ``create_mesh(shape=(1, n))`` — all parallelism on ICI.

    ``slice_groups``: optional sequence of equal-length device
    sequences, one per slice.
    """
    if slice_groups is None:
        if devices is None:
            devices = jax.devices()
        groups = {}
        for d in devices:
            groups.setdefault(getattr(d, "slice_index", 0), []).append(d)
        slice_groups = [groups[k] for k in sorted(groups)]
    elif devices is not None:
        raise ValueError(
            "pass either devices (grouped by slice_index) or explicit "
            "slice_groups, not both — slice_groups fully determines the "
            "device layout")
    slice_groups = [list(g) for g in slice_groups]
    if not slice_groups or any(len(g) == 0 for g in slice_groups):
        raise ValueError("slice_groups must be a non-empty sequence of "
                         "non-empty device groups; got %r" % (slice_groups,))
    sizes = {len(g) for g in slice_groups}
    if len(sizes) != 1:
        raise ValueError(
            "slices must hold equally many devices for a rectangular "
            "mesh; got group sizes %r" % sorted(len(g) for g in
                                                slice_groups))
    flat = [d for g in slice_groups for d in g]
    if len(set(flat)) != len(flat):
        raise ValueError("slice_groups contain duplicate devices; each "
                         "device may appear in exactly one slice group")
    mesh_devices = np.asarray(slice_groups)
    return Mesh(mesh_devices, axis_names)


def ensure_mesh_axes(mesh, restart_axis="restarts", sample_axis="samples"):
    """Return a mesh that has both parallel axes, lifting 1-D meshes.

    The SPMD fits shard over a ``(restart_axis, sample_axis)`` mesh.
    Estimator-level entry points accept any of:

    - a 2-D mesh already carrying both axes (returned unchanged);
    - a 1-D mesh over ``sample_axis`` (lifted to ``(1, n_devices)``);
    - a 1-D mesh over ``restart_axis`` (lifted to ``(n_devices, 1)``).
    """
    names = tuple(mesh.axis_names)
    if restart_axis in names and sample_axis in names:
        return mesh
    devices = np.asarray(mesh.devices).reshape(-1)
    if names == (sample_axis,):
        return Mesh(devices.reshape(1, -1), (restart_axis, sample_axis))
    if names == (restart_axis,):
        return Mesh(devices.reshape(-1, 1), (restart_axis, sample_axis))
    raise ValueError(
        "mesh must carry axes (%r, %r) or be 1-D over one of them; got "
        "axis_names=%r" % (restart_axis, sample_axis, names))


def replicate(mesh, x):
    """Place ``x`` replicated over every mesh axis."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def shard_batch(mesh, x, axis_name="restarts"):
    """Shard the leading axis of ``x`` over ``axis_name``."""
    spec = P(axis_name, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))
