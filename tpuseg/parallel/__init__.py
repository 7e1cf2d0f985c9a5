from tpuseg.parallel.mesh import (
    make_mesh,
    shard_batch,
    shard_batch_spatial,
    replicate,
    batch_sharding,
    spatial_sharding,
    multihost_sum,
    sync_hosts,
)

__all__ = ["make_mesh", "shard_batch", "shard_batch_spatial", "replicate",
           "batch_sharding", "spatial_sharding", "multihost_sum", "sync_hosts"]
