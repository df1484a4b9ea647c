from visitron_tpu.parallel.mesh import (
    MeshSpec,
    make_mesh,
    make_sp_mesh,
    maybe_mesh,
    batch_sharding,
    replicated_sharding,
    replicate_state,
    reshard_state,
    shard_batch,
    shard_params_rules,
    zero1_opt_rules,
    host_shard_info,
)
from visitron_tpu.parallel.pipeline import (
    PipelinePretrainTrainer,
    make_pp_mesh,
    merge_pretrain_params,
    split_pretrain_params,
)

__all__ = [
    "MeshSpec",
    "make_mesh",
    "make_sp_mesh",
    "maybe_mesh",
    "batch_sharding",
    "replicated_sharding",
    "replicate_state",
    "reshard_state",
    "shard_batch",
    "shard_params_rules",
    "zero1_opt_rules",
    "host_shard_info",
    "PipelinePretrainTrainer",
    "make_pp_mesh",
    "merge_pretrain_params",
    "split_pretrain_params",
]
