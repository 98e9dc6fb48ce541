"""Multi-host distribution scaffolding (SURVEY §2.7 item 1).

The reference trains multi-node via torchrun + NCCL DDP; the equivalent here
is ``jax.distributed.initialize`` + a global mesh with per-process batch
feeding. Validated the TPU-native way: 2 real OS processes, each with a
4-virtual-device CPU backend, joined over gloo — 5 per-process-fed
data-parallel train steps with a distributed orbax save/scramble/restore in
the middle and a device-reduced global eval at the end must produce the same
(loss trajectory, eval metrics) digest as the single-process 8-device mesh.
"""

import numpy as np

import __graft_entry__ as graft
from mapperatorinator_tpu.parallel import (
    process_local_batch_size,
    shard_iterator_by_process,
)
from mapperatorinator_tpu.parallel.distributed import maybe_initialize


def test_single_process_helpers_are_noops():
    # in-process (single-host) the helpers must leave behavior unchanged
    assert process_local_batch_size(16) == 16
    assert list(shard_iterator_by_process(iter(range(5)))) == [0, 1, 2, 3, 4]
    assert maybe_initialize(None) is False


def test_two_process_train_matches_single_process():
    # spawns 2 children x 4 virtual CPU devices + a 1x8 reference child and
    # asserts digest equality: 5-step loss trajectory across a distributed
    # orbax save/scramble/restore, plus device-reduced global eval metrics
    graft.run_multihost_dryrun(8)


def test_global_batch_assembly_single_process():
    import jax
    from jax.sharding import Mesh

    from mapperatorinator_tpu.parallel import make_global_batch

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    local = {"x": np.arange(16, dtype=np.float32).reshape(8, 2)}
    arr = make_global_batch(mesh, local)["x"]
    assert arr.shape == (8, 2)
    np.testing.assert_array_equal(np.asarray(arr), local["x"])
