from repmode_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "batch_sharding", "replicate", "shard_batch"]
