"""Device mesh and sharding utilities.

The reference's only multi-device strategy is DDP over NCCL (SURVEY.md §2.7).
The TPU equivalent: a ``jax.sharding.Mesh`` over ICI/DCN with the batch
sharded on the ``data`` axis and parameters replicated; XLA inserts the
gradient psums. The mesh layout is config-driven
(:class:`mapperatorinator_tpu.config.schema.ParallelConfig`) so tensor/fsdp
axes can be added without touching the train step.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(parallel_args=None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if parallel_args is None or parallel_args.mesh_shape is None:
        shape = (len(devices),)
        axis_names = ("data",)
    else:
        shape = tuple(parallel_args.mesh_shape)
        axis_names = tuple(parallel_args.axis_names)
    mesh_devices = np.asarray(devices[: int(np.prod(shape))]).reshape(shape)
    return Mesh(mesh_devices, axis_names)


def shard_batch(mesh: Mesh, batch, data_axis: str = "data"):
    """Shard each array's leading dim over the data axis."""
    def put(x):
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree.map(put, batch)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def ensure_on_mesh(mesh: Mesh, tree):
    """Replicate any leaf not already placed on this mesh (e.g. optimizer
    counters that optax created on the default device); leaves with a
    NamedSharding on the mesh keep their placement."""
    replicated = NamedSharding(mesh, P())

    def place(x):
        sh = getattr(x, "sharding", None)
        if isinstance(sh, NamedSharding) and sh.mesh == mesh:
            return x
        return jax.device_put(x, replicated)

    return jax.tree.map(place, tree)
