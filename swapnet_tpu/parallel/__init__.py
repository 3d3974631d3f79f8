from swapnet_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    data_axes,
    replicated_sharding,
    shard_batch,
    state_sharding,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "data_axes",
    "replicated_sharding",
    "shard_batch",
    "state_sharding",
]
