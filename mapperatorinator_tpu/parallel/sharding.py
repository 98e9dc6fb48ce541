"""Parameter sharding rules for tensor parallelism and FSDP.

GSPMD does the heavy lifting: we place each parameter with a
``NamedSharding`` chosen from its path and shape, jit the unchanged train
step with those placements, and XLA propagates the shardings through the
computation and inserts the collectives (all-gather for FSDP params,
reduce-scatter/psum for gradients, ICI all-reduces inside tensor-parallel
attention/FFN). No model code changes.

Tensor-parallel rules (Megatron layout) for our transformer's kernels:

* column-parallel (shard the OUTPUT dim): wq/wk/wv/wqkv/wkv, fc1/fc1_gate —
  each device computes a head/ffn shard,
* row-parallel (shard the INPUT dim): wo, fc2 — partial products summed by
  the psum XLA inserts,
* embeddings / norms / biases / small conditioning tables: replicated.

FSDP shards every large parameter along its first dim over the fsdp axis;
GSPMD all-gathers just-in-time per layer.
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import flax

# kernel-name -> which dim of the 2-D kernel (in, out) is sharded on the
# tensor axis
_COLUMN_PARALLEL = ("wq", "wk", "wv", "wqkv", "wkv", "fc1", "fc1_gate")
_ROW_PARALLEL = ("wo", "fc2")


def _tensor_spec(path_parts: tuple[str, ...], shape, tensor_axis: str) -> Optional[P]:
    if len(shape) != 2 or path_parts[-1] != "kernel" or len(path_parts) < 2:
        return None
    module = path_parts[-2]
    if module in _COLUMN_PARALLEL:
        return P(None, tensor_axis)
    if module in _ROW_PARALLEL:
        return P(tensor_axis, None)
    return None


def param_specs(params, *, tensor_axis: Optional[str] = None, fsdp_axis: Optional[str] = None,
                mesh: Optional[Mesh] = None):
    """PartitionSpec pytree for a param tree. Dims must divide the axis size;
    ineligible params fall back to replication (or fsdp when enabled)."""
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape)) if mesh is not None else {}

    def spec_for(path, leaf):
        parts = tuple(str(p.key) for p in path)
        shape = leaf.shape
        if tensor_axis is not None:
            spec = _tensor_spec(parts, shape, tensor_axis)
            if spec is not None:
                dim = 1 if spec[1] == tensor_axis else 0
                size = axis_sizes.get(tensor_axis, 1)
                if shape[dim] % size == 0:
                    return spec
        if fsdp_axis is not None and leaf.ndim >= 1:
            size = axis_sizes.get(fsdp_axis, 1)
            # shard the largest dim divisible by the axis
            order = sorted(range(leaf.ndim), key=lambda i: -shape[i])
            for dim in order:
                if shape[dim] % size == 0 and shape[dim] >= size:
                    spec = [None] * leaf.ndim
                    spec[dim] = fsdp_axis
                    return P(*spec)
        return P()

    return jax.tree_util.tree_map_with_path(spec_for, params)


def shard_params(mesh: Mesh, params, *, tensor_axis: Optional[str] = None,
                 fsdp_axis: Optional[str] = None):
    """Place a param tree on the mesh according to the rules."""
    specs = param_specs(params, tensor_axis=tensor_axis, fsdp_axis=fsdp_axis, mesh=mesh)
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), params, specs
    )


def describe_sharding(params, specs) -> dict[str, int]:
    """Counts per spec kind (for logging/tests)."""
    counts: dict[str, int] = {}
    for leaf_spec in jax.tree.leaves(specs, is_leaf=lambda x: isinstance(x, P)):
        key = str(leaf_spec)
        counts[key] = counts.get(key, 0) + 1
    return counts
