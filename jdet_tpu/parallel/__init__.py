from .spmd import (
    make_mesh, shard_batch, replicate, batch_sharding,
    replicated_sharding, is_main_process, DATA_AXIS,
)
