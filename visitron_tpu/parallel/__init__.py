from visitron_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    maybe_mesh,
    batch_sharding,
    replicated_sharding,
    replicate_state,
    shard_batch,
    shard_params_rules,
    host_shard_info,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "maybe_mesh",
    "batch_sharding",
    "replicated_sharding",
    "replicate_state",
    "shard_batch",
    "shard_params_rules",
    "host_shard_info",
]
