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


def make_sp_mesh(dp: int, sp: int, devices=None) -> Mesh:
    """A (dp, sp) mesh: data-parallel rows of sequence-parallel groups.

    ``sp`` shards the token dimension of every activation (DeepSpeed-Ulysses
    style): embeddings/MLPs/heads compute on 1/sp of the joint sequence per
    device, and self-attention re-shards tokens->heads and back with two
    all-to-alls per layer (inserted by the SPMD partitioner from the
    sharding constraints in models/bert.py).  Parameters stay replicated.
    The reference has no sequence parallelism at all (SURVEY §2.3); this is
    the long-context scale-out axis for dialogs past one chip's activation
    memory."""
    devices = devices if devices is not None else jax.devices()
    assert dp * sp <= len(devices), f"mesh {dp}x{sp} exceeds {len(devices)} devices"
    grid = mesh_utils.create_device_mesh(
        (dp, sp), devices=np.asarray(devices[: dp * sp]))
    return Mesh(grid, ("dp", "sp"))


def make_cp_mesh(dp: int, cp: int, devices=None) -> Mesh:
    """A (dp, cp) mesh: data-parallel rows of ring-attention groups.

    ``cp`` shards the token dimension of every activation AND of attention
    itself: self-attention runs ops.attention.ring_attention — each device
    keeps its Q shard and streams the K/V shards around the cp ring via
    ppermute, so per-device attention memory is O((S/cp)^2) with no
    head-count constraint (Ulysses sp caps at num_heads; cp scales with the
    sequence).  Parameters stay replicated.  The reference has no context
    parallelism (SURVEY §2.3); this is the designed-in long-context axis."""
    devices = devices if devices is not None else jax.devices()
    assert dp * cp <= len(devices), f"mesh {dp}x{cp} exceeds {len(devices)} devices"
    grid = mesh_utils.create_device_mesh(
        (dp, cp), devices=np.asarray(devices[: dp * cp]))
    return Mesh(grid, ("dp", "cp"))


def maybe_mesh(dp: int = 0, tp: int = 1) -> Mesh | None:
    """Mesh from run-config flags: None on a lone device with no explicit
    request (skips sharding plumbing); otherwise a (dp, tp) mesh over all
    devices (dp=0 means 'all')."""
    if dp in (0, 1) and tp == 1 and jax.device_count() == 1:
        return None
    return make_mesh(dp=dp or None, tp=tp)


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
    Meshes without a tp axis (dp-only, (dp, sp), (dp, pp)) replicate
    everything.
    """
    tp = dict(mesh.shape).get("tp", 1)

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


def fsdp_param_rules(mesh: Mesh, params):
    """ZeRO-3 / FSDP shardings for a parameter pytree: weights over ``dp``.

    Each parameter leaf is sharded over the dp axis on its first
    dp-divisible dimension (leaves too small to divide stay replicated);
    leaves the tensor-parallel rules already split keep their tp sharding,
    so fsdp composes with a (dp, tp) mesh.  The SPMD partitioner derives
    the whole ZeRO-3 schedule from the placement alone — per-layer
    parameter all-gathers in forward/backward and a reduce-scatter of the
    gradients into the dp-sharded optimizer update — so per-chip
    parameter + gradient + moment memory drops to ~1/dp with no
    hand-written collective.  The reference has nothing past replicated
    DDP (SURVEY §2.3); this is the fits-bigger-models axis."""
    dp = dict(mesh.shape).get("dp", 1)
    tp_rules = shard_params_rules(mesh, params)

    def rule(x, tp_rule):
        if tp_rule.spec != P():
            return tp_rule
        ndim = getattr(x, "ndim", 0)
        if dp > 1 and ndim >= 1:
            for axis in range(ndim):
                if x.shape[axis] >= dp and x.shape[axis] % dp == 0:
                    spec = [None] * ndim
                    spec[axis] = "dp"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params, tp_rules)


def fsdp_shard_params(mesh: Mesh, params):
    """Initial FSDP placement of a freshly initialized (replicated or
    host-identical) parameter pytree; multi-host-safe via reshard_state."""
    return reshard_state(params, fsdp_param_rules(mesh, params))


def fsdp_opt_rules(mesh: Mesh, params, opt_state):
    """FSDP optimizer-state shardings: each Adam moment takes ITS PARAMETER's
    fsdp rule, so the update is shard-local for every leaf.

    ``zero1_opt_rules`` picks the first dp-divisible axis per moment, which
    matches ``fsdp_param_rules`` for dp-sharded leaves but NOT for tp-split
    kernels under a (dp, tp) mesh — the param keeps P(..., 'tp') while the
    moment would get P('dp', ...), forcing per-step reshard collectives in
    the Adam update.  Moment subtrees are recognized structurally (any
    opt-state node congruent with the params tree — optax's mu/nu); scalars
    and other leaves fall back to the zero1 rule."""
    ptreedef = jax.tree.structure(params)
    prules = fsdp_param_rules(mesh, params)

    def is_param_tree(node):
        return jax.tree.structure(node) == ptreedef

    def rule(node):
        if is_param_tree(node):
            return prules
        return zero1_opt_rules(mesh, node)

    return jax.tree.map(rule, opt_state, is_leaf=is_param_tree)


def fsdp_pin_layouts(mesh: Mesh, params, opt_state):
    """Layout stability inside a jitted FSDP train step.

    Pins the updated params to their dp shards and the optimizer moments to
    their parameters' shards (fsdp_opt_rules) — without these the compiler
    may re-replicate either on the way out of the step, silently giving back
    the memory win."""
    params = jax.lax.with_sharding_constraint(
        params, fsdp_param_rules(mesh, params))
    opt_state = jax.lax.with_sharding_constraint(
        opt_state, fsdp_opt_rules(mesh, params, opt_state))
    return params, opt_state


def zero1_opt_rules(mesh: Mesh, opt_state):
    """ZeRO-1 shardings for an optimizer-state pytree: moments over ``dp``.

    Data-parallel training replicates the Adam moments (2x params of pure
    redundancy — the reference's DDP does the same); ZeRO-1 instead shards
    each state leaf over the dp axis on its first dp-divisible dimension
    and lets the SPMD partitioner slice the (replicated) gradients into the
    sharded update and all-gather the parameter delta.  Scalars and
    undividable leaves stay replicated.  Parameters and the forward/backward
    pass are untouched — this is purely an optimizer-memory/HBM-traffic
    trade, the first ZeRO stage."""
    dp = dict(mesh.shape).get("dp", 1)

    def rule(x):
        ndim = getattr(x, "ndim", 0)
        if dp > 1 and ndim >= 1:
            for axis in range(ndim):
                if x.shape[axis] >= dp and x.shape[axis] % dp == 0:
                    spec = [None] * ndim
                    spec[axis] = "dp"
                    return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, opt_state)


def reshard_state(tree, shardings):
    """Place a pytree onto ``shardings``, multi-host-safe.

    Single-host: plain ``device_put``.  Under ``jax.distributed``,
    ``device_put`` cannot build a non-addressable (cross-process) sharding
    from local data, so a jitted identity reshards inside XLA instead —
    valid because our callers hand it replicated global arrays or
    host-identical host data (init/restore paths)."""
    if jax.process_count() == 1:
        return jax.device_put(tree, shardings)
    return jax.jit(lambda t: t, out_shardings=shardings)(tree)


def zero1_shard_opt_state(mesh: Mesh, opt_state):
    """Initial ZeRO-1 placement of a freshly built optimizer state.

    Replicate-then-reshard (callers hand replicated or host-identical data):
    a direct device_put of host-local leaves onto a cross-process sharding is
    invalid under jax.distributed; ``reshard_state`` handles both worlds."""
    return reshard_state(opt_state, zero1_opt_rules(mesh, opt_state))


def zero1_pin_layouts(mesh: Mesh, params, opt_state):
    """Layout stability inside a jitted ZeRO-1 train step.

    Pins the updated optimizer state to its dp shards and the updated params
    to their parameter rules (replicated for dp-only meshes, tp-split kernels
    when a tp axis exists) — without these the compiler is free to
    re-replicate the moments or re-shard the params on the way out of the
    step.  Rules are derived from the *traced* trees, so any optimizer-state
    structure (e.g. the RL critic's extra subtree) pins correctly even when
    one trainer instance serves several state shapes."""
    opt_state = jax.lax.with_sharding_constraint(
        opt_state, zero1_opt_rules(mesh, opt_state))
    params = jax.lax.with_sharding_constraint(
        params, shard_params_rules(mesh, params))
    return params, opt_state


def shard_batch(mesh: Mesh, batch):
    """Place a host batch dict onto the mesh, sharded along dp.

    Single-host: a plain device_put scatters the global batch over the dp
    axis.  Multi-host (jax.distributed initialized): each host holds its own
    slice of the global batch (strided per-host instance sharding in the
    batchers), assembled into one global array
    (jax.make_array_from_process_local_data) — the SPMD equivalent of
    DistributedSampler + NCCL DDP (reference train.py:66-70,536-548).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sharding, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), batch)


def replicate_state(mesh: Mesh, tree):
    """Replicate a pytree (params/opt state/rng) across every mesh device."""
    return jax.device_put(tree, replicated_sharding(mesh))


def host_shard_info() -> tuple[int, int]:
    """(host_id, num_hosts) for per-host data sharding."""
    return jax.process_index(), jax.process_count()
