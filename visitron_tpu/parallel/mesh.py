"""Device-mesh construction and sharding rules.

Replaces the reference's DP/DDP machinery (torch DataParallel /
DistributedDataParallel + NCCL allreduce, train.py:94-110, agent.py:509-512)
with a single-program ``jax.sharding.Mesh``:

  * axis ``dp``: data parallelism — batches sharded, parameters replicated;
    XLA inserts the gradient all-reduce inside the jitted train step (over ICI
    on a pod slice, DCN across slices).
  * axis ``tp``: tensor-parallel headroom — attention heads / MLP hidden
    sharded for models beyond BERT-base scale.  The reference never shards
    tensors (SURVEY §2.3); we reserve the axis so scaling up is a config
    change, not a rewrite.

No manual collectives are needed anywhere: loss/metric reductions happen in
the step function, and with parameters replicated + batch sharded, jit's SPMD
partitioner derives the communication.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    dp: int
    tp: int = 1

    @property
    def num_devices(self) -> int:
        return self.dp * self.tp


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    """Create a (dp, tp) mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp <= n, f"mesh {dp}x{tp} exceeds {n} devices"
    grid = mesh_utils.create_device_mesh((dp, tp), devices=np.asarray(devices[: dp * tp]))
    return Mesh(grid, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over dp; all other dims replicated."""
    return NamedSharding(mesh, P("dp"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_params_rules(mesh: Mesh, params):
    """PartitionSpecs for a parameter pytree.

    BERT-base parameters are replicated (dp training).  When tp > 1, the
    dimension-matched rules shard the fused QKV/output projections and MLP
    across ``tp``: kernels with a 3072/4x-hidden axis split on that axis.
    """
    tp = mesh.shape["tp"]

    def rule(path, x):
        if tp == 1 or x.ndim < 2:
            return NamedSharding(mesh, P())
        name = "/".join(str(p) for p in path)
        # Fused qkv / intermediate kernels: shard the wide output dim.
        if any(k in name for k in ("qkv", "intermediate")) and x.shape[-1] % tp == 0:
            return NamedSharding(mesh, P(None, "tp"))
        # Output projections: shard the wide input dim.
        if any(k in name for k in ("attention_output", "output")) and x.shape[0] % tp == 0:
            return NamedSharding(mesh, P("tp", None))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded along dp."""
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)
