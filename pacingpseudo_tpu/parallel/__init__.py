from .mesh import (
    data_mesh,
    factor_devices,
    shard_batch,
    replicate,
    batch_sharding,
    stage_resident_pool,
    make_resident_gather,
)
