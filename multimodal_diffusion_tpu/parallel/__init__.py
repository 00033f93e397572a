from .mesh import make_mesh, LOGICAL_RULES  # noqa: F401
from .sharding import (  # noqa: F401
    batch_sharding,
    infer_param_shardings,
    replicated,
    shard_batch,
)
