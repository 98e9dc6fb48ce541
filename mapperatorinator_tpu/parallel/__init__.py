from .mesh import make_mesh, shard_batch, replicate  # noqa: F401
from .sharding import describe_sharding, param_specs, shard_params  # noqa: F401
