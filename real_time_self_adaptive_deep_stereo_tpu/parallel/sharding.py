"""Multi-chip scale-out via `jax.sharding` — net-new capability.

The reference is strictly single-process / single-GPU (SURVEY.md §2:
no distribution code of any kind), so this subsystem is designed from
scratch the TPU way: a `Mesh` over the chips, sharding annotations on
the jitted step, and XLA GSPMD inserting the collectives (gradient
all-reduce over ICI for data parallelism; halo exchanges for spatial
partitioning of the conv pipeline).

Two axes are supported:

* ``data``   — batch dimension sharding for offline training
  (`Train.py`'s workload). Gradients are all-reduced automatically
  because the loss is a global mean.
* ``spatial`` — image-width sharding of a single frame, the analogue of
  sequence parallelism for this conv workload (SURVEY.md §5): GSPMD
  partitions every conv along W with halo exchange, letting one frame's
  adaptation step ride multiple chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "replicated",
    "batch_sharded",
    "width_sharded",
    "shard_batch",
]


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    mesh_shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over the available devices.

    With one axis the mesh is 1-D over all (or the first ``n_devices``)
    chips; for multiple axes pass ``mesh_shape`` with
    ``prod(mesh_shape) == n_devices``.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    if mesh_shape is None:
        mesh_shape = (len(devices),) if len(axis_names) == 1 else None
    if mesh_shape is None:
        raise ValueError("mesh_shape required for multi-axis meshes")
    devs = np.asarray(devices).reshape(tuple(mesh_shape))
    return Mesh(devs, tuple(axis_names))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC batch dim sharded across the mesh axis."""
    return NamedSharding(mesh, P(axis))


def width_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """NHWC width dim sharded across the mesh axis (spatial parallelism)."""
    return NamedSharding(mesh, P(None, None, axis))


def shard_batch(batch: dict, sharding: NamedSharding) -> dict:
    """Device-put a host batch with the given sharding on array leaves."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding) if hasattr(x, "ndim") and x.ndim >= 1 else x,
        batch,
    )
