from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .sharding import describe_sharding, param_specs, shard_params  # noqa: F401
from .distributed import (  # noqa: F401
    make_global_batch,
    make_global_mesh,
    maybe_initialize,
    process_local_batch_size,
    shard_iterator_by_process,
)
