from .mesh import (
    data_mesh,
    shard_batch,
    replicate,
    batch_sharding,
)
