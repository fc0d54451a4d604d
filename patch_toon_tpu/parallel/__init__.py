from patch_toon_tpu.parallel.dcn import (
    initialize_distributed,
    make_dcn_mesh,
    make_global_batch,
    num_granules,
)
from patch_toon_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
    replicated_sharding,
    shard_batch,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_batch",
    "replicate",
    "initialize_distributed",
    "make_dcn_mesh",
    "make_global_batch",
    "num_granules",
]
