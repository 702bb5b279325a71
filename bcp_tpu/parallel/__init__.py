from bcp_tpu.parallel.mesh import (
    make_mesh,
    data_sharding,
    replicated_sharding,
    shard_batch,
    replicate_state,
)

__all__ = ["make_mesh", "data_sharding", "replicated_sharding",
           "shard_batch", "replicate_state"]
