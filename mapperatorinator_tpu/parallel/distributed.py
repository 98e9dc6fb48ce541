"""Multi-host distribution scaffolding.

The reference trains multi-node via ``torchrun`` + NCCL DDP (SURVEY.md §2.7
item 1; reference README "Begin training"). The TPU equivalent is
``jax.distributed.initialize`` plus a global :class:`jax.sharding.Mesh`
spanning every process's devices: DCN (the inter-host network) carries the
outermost data axis, ICI the intra-slice axes, and XLA routes each collective
over the right fabric from the mesh layout alone.

Three pieces, all driven by :class:`~mapperatorinator_tpu.config.schema.ParallelConfig`:

* :func:`maybe_initialize` — one call at entry makes ``train.py``
  multi-host-ready (``parallel.coordinator_address=host:port
  parallel.num_processes=N parallel.process_id=i``); a no-op in the
  single-process case so every existing entry point is unchanged.
* :func:`make_global_mesh` — after initialization ``jax.devices()`` is the
  global device list; build the mesh with the process (DCN) dimension
  outermost so data-parallel gradient reductions hierarchically combine over
  ICI first and cross DCN once.
* :func:`make_global_batch` — per-process input feeding: each process loads
  only its shard of the batch and
  ``jax.make_array_from_process_local_data`` assembles the global sharded
  array (the ``DistributedSampler`` equivalent — no host ever materializes
  the full batch).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_initialize(parallel_args=None) -> bool:
    """Initialize ``jax.distributed`` when multi-host coordinates are
    configured; return whether this process is part of a multi-process run.

    Coordinates come from ``ParallelConfig`` (``coordinator_address``,
    ``num_processes``, ``process_id``) — on Cloud TPU pods where the runtime
    provides them, calling with ``num_processes=None`` lets jax auto-detect.
    Safe to call twice (the second call is a no-op).
    """
    addr = getattr(parallel_args, "coordinator_address", None) if parallel_args else None
    if not addr:
        return jax.process_count() > 1
    # NB: must not touch the backend (jax.process_count()/jax.devices())
    # before jax.distributed.initialize — it would pin a single-process view
    if jax.distributed.is_initialized():
        return True
    num_processes = getattr(parallel_args, "num_processes", None)
    process_id = getattr(parallel_args, "process_id", None)
    # The CPU backend needs an explicit cross-process collectives
    # implementation (used by the virtual-device dryruns and tests; real TPU
    # slices ignore it and use ICI/DCN natively).
    try:
        jax.config.update(
            "jax_cpu_collectives_implementation",
            getattr(parallel_args, "cpu_collectives", None) or "gloo",
        )
    except Exception:
        pass
    jax.distributed.initialize(
        coordinator_address=addr,
        num_processes=num_processes,
        process_id=process_id,
    )
    return jax.process_count() > 1


def make_global_mesh(parallel_args=None) -> Mesh:
    """Mesh over ALL processes' devices, process dimension outermost.

    ``jax.devices()`` after :func:`maybe_initialize` enumerates the global
    device list grouped by process, so a plain reshape already places the
    process (DCN) boundary on the leading — data — axis: tensor/fsdp axes
    (inner) stay within a process's ICI domain and only gradient psums cross
    DCN. With an explicit ``parallel.mesh_shape`` the same grouping rule
    applies; the leading axis size must be a multiple of the process count
    for that guarantee to hold (checked here).
    """
    from .mesh import make_mesh

    mesh = make_mesh(parallel_args, devices=jax.devices())
    if jax.process_count() > 1:
        leading = mesh.devices.shape[0]
        if leading % jax.process_count() != 0:
            raise ValueError(
                f"mesh leading (data) axis {leading} must be a multiple of the "
                f"process count {jax.process_count()} so tensor/fsdp axes stay "
                f"inside one process's ICI domain"
            )
    return mesh


def make_global_batch(mesh: Mesh, local_batch, data_axis: str = "data"):
    """Assemble a globally-sharded batch from per-process local arrays.

    Each process passes ONLY its own rows (``global_batch // process_count``
    of them); the returned arrays are global, sharded over ``data_axis``,
    with this process's rows living on its local devices. Works unchanged in
    the single-process case, where it is equivalent to
    :func:`~mapperatorinator_tpu.parallel.mesh.shard_batch`.
    """

    def put(x):
        x = np.asarray(x)
        spec = P(data_axis, *([None] * (x.ndim - 1)))
        return jax.make_array_from_process_local_data(NamedSharding(mesh, spec), x)

    return jax.tree.map(put, local_batch)


def process_local_batch_size(global_batch_size: int) -> int:
    """Rows this process must feed per step (validates divisibility)."""
    n = jax.process_count()
    if global_batch_size % n != 0:
        raise ValueError(
            f"optim.batch_size={global_batch_size} must be divisible by the "
            f"process count {n} for per-process feeding"
        )
    return global_batch_size // n


def shard_iterator_by_process(it):
    """Round-robin an example iterator across processes (the
    ``DistributedSampler``/``worker_init_fn`` equivalent for host-sharded
    streaming datasets): process ``i`` keeps every ``process_count``-th
    example starting at ``i``. A no-op for single-process runs."""
    import itertools

    n = jax.process_count()
    if n <= 1:
        return it
    return itertools.islice(it, jax.process_index(), None, n)
