from .mesh import (DATA_AXIS, batch_sharding, local_batch_size, make_mesh,
                   replicate, replicated, shard_batch)

__all__ = ["DATA_AXIS", "batch_sharding", "local_batch_size", "make_mesh",
           "replicate", "replicated", "shard_batch"]
