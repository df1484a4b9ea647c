from visitron_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    batch_sharding,
    replicated_sharding,
    shard_params_rules,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_params_rules",
]
