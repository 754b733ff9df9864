from .mesh import (  # noqa: F401
    data_parallel_mesh,
    replicated,
    shard_batch,
    make_sharded_inference,
)
