from bcp_tpu.parallel.mesh import (
    make_mesh,
    flat_mesh,
    data_sharding,
    stream_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
)

__all__ = ["make_mesh", "flat_mesh", "data_sharding", "stream_sharding",
           "replicated_sharding", "shard_batch", "replicate_state"]
