"""GPipe-style pipeline parallelism (the ``pp`` mesh axis) for pretraining.

The reference never pipelines (its BERT-base fits one GPU; SURVEY §2.3 lists
DP only).  This module adds the missing scale-out axis the TPU-native design
reserves for models past single-chip HBM: the transformer stack is cut into
``pp`` contiguous stages (one per device along the ``pp`` axis), the batch is
cut into microbatches, and a ``lax.scan`` over pipeline steps moves
activations stage-to-stage with ``lax.ppermute`` — the classic GPipe
schedule expressed as one SPMD program under ``jax.shard_map``, so XLA sees
static shapes and point-to-point ICI transfers.

Layout (per train step, mesh axes ``("dp", "pp")``):

  * embeddings + heads (small): parameters replicated over ``pp``; every rank
    computes them, but only rank 0's embeddings feed the pipeline and only
    the last rank's encoder output reaches the loss — gradient masking makes
    each parameter's true gradient a ``psum`` over the axis.
  * encoder layers (the FLOPs): parameters stacked on a leading layer axis
    and sharded over ``pp`` — each rank holds ``num_hidden_layers / pp``
    layers and scans over them per microbatch.
  * batch: sharded over ``dp`` exactly like the non-pipelined trainer; each
    dp row runs an independent pipeline.

Bubble fraction is ``(pp - 1) / (M + pp - 1)`` for ``M`` microbatches —
``num_microbatches`` defaults to ``4 * pp`` (20% bubble at pp=2).

Numerical semantics vs the plain trainer: identical at dp=1 (pinned by
tests/test_pipeline.py grad-parity); at dp>1 the loss is the mean of per-shard
masked means rather than one global masked mean, so shards with unequal valid
-token counts weight examples slightly differently (same trade the reference's
DDP loss makes across workers).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from visitron_tpu.models.bert import BertConfig, BertLayer
from visitron_tpu.models.pretrain import PretrainModel, pretrain_loss
from visitron_tpu.train.optim import adamw_with_warmup


def make_pp_mesh(dp: int, pp: int, devices=None) -> Mesh:
    """A (dp, pp) mesh: data-parallel rows of pp-stage pipelines."""
    devices = devices if devices is not None else jax.devices()
    assert dp * pp <= len(devices), f"mesh {dp}x{pp} exceeds {len(devices)} devices"
    grid = mesh_utils.create_device_mesh(
        (dp, pp), devices=np.asarray(devices[: dp * pp]))
    return Mesh(grid, ("dp", "pp"))


# -- parameter layout conversions ---------------------------------------------


def split_pretrain_params(params) -> tuple[dict, dict]:
    """Standard PretrainModel params -> (rest, stages).

    ``stages`` stacks the encoder layers on a new leading axis (L, ...) —
    shard it over ``pp`` and each rank holds its contiguous layer block.
    ``rest`` is everything else (embeddings, pooler, heads) with an empty
    encoder subtree, replicated."""
    params = jax.tree.map(lambda x: x, params)  # structural copy
    bert = dict(params["params"]["bert"])
    enc = dict(bert["encoder"])
    num_layers = len(enc)
    layers = [enc[f"layer_{i}"] for i in range(num_layers)]
    stages = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    bert["encoder"] = {}
    top = dict(params["params"])
    top["bert"] = bert
    rest = dict(params)
    rest["params"] = top
    return rest, stages


def merge_pretrain_params(rest, stages) -> dict:
    """(rest, stages) -> standard PretrainModel params (checkpoint layout)."""
    num_layers = jax.tree.leaves(stages)[0].shape[0]
    enc = {
        f"layer_{i}": jax.tree.map(lambda x, i=i: x[i], stages)
        for i in range(num_layers)
    }
    bert = dict(rest["params"]["bert"])
    bert["encoder"] = enc
    top = dict(rest["params"])
    top["bert"] = bert
    out = dict(rest)
    out["params"] = top
    return out


# -- the pipelined encoder (runs inside shard_map) -----------------------------


def _stage_apply(cfg: BertConfig, stage_params, hidden, bias, key):
    """Apply this rank's layer block (scan over the local layer axis)."""
    num_local = jax.tree.leaves(stage_params)[0].shape[0]
    deterministic = key is None
    keys = (jnp.zeros((num_local, 2), jnp.uint32) if deterministic
            else jax.random.split(key, num_local))

    def layer_fn(h, layer_p, k):
        rngs = None if deterministic else {"dropout": k}
        return BertLayer(cfg).apply({"params": layer_p}, h, bias, None,
                                    deterministic, rngs=rngs)

    if cfg.remat:
        layer_fn = jax.checkpoint(
            layer_fn, static_argnums=(),
            policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable)

    def body(h, xs):
        layer_p, k = xs
        return layer_fn(h, layer_p, k), None

    hidden, _ = jax.lax.scan(body, hidden, (stage_params, keys))
    return hidden


def pipeline_encoder(cfg: BertConfig, pp: int, stage_params, emb_mb, bias_mb,
                     dropout_key=None):
    """GPipe loop over ``M + pp - 1`` steps inside a shard_map over ``pp``.

    emb_mb: (M, mb, T, H) microbatched embeddings (replicated input on every
    rank; only rank 0's injection reaches the pipeline).  bias_mb: the
    per-microbatch attention bias, needed by every stage.  Returns the
    (M, mb, T, H) encoder outputs, valid on the LAST rank only.
    """
    rank = jax.lax.axis_index("pp")
    num_mb = emb_mb.shape[0]
    steps = num_mb + pp - 1
    perm = [(i, (i + 1) % pp) for i in range(pp)]

    def step_fn(carry, t):
        state, outputs = carry
        # Rank r processes microbatch (t - r); out-of-range steps compute
        # garbage that is finite, never written to ``outputs``, and dead in
        # the gradient (masked by the write guard below).
        mb_idx = jnp.clip(t - rank, 0, num_mb - 1)
        inject = jax.lax.dynamic_index_in_dim(emb_mb, mb_idx, 0, keepdims=False)
        x = jnp.where(rank == 0, inject, state)
        bias = jax.lax.dynamic_index_in_dim(bias_mb, mb_idx, 0, keepdims=False)
        key = None
        if dropout_key is not None:
            key = jax.random.fold_in(jax.random.fold_in(dropout_key, t), rank)
        y = _stage_apply(cfg, stage_params, x, bias, key)
        out_idx = t - (pp - 1)
        valid = (rank == pp - 1) & (out_idx >= 0)
        written = jax.lax.dynamic_update_index_in_dim(
            outputs, y, jnp.clip(out_idx, 0, num_mb - 1), 0)
        outputs = jnp.where(valid, written, outputs)
        state = jax.lax.ppermute(y, "pp", perm)
        return (state, outputs), None

    init = (jnp.zeros_like(emb_mb[0]), jnp.zeros_like(emb_mb))
    (_, outputs), _ = jax.lax.scan(step_fn, init, jnp.arange(steps))
    return outputs


# -- trainer -------------------------------------------------------------------


@dataclass
class PipelinePretrainTrainer:
    """Pretraining over a (dp, pp) mesh.

    Drop-in peer of train/pretrain.py:PretrainTrainer for models whose
    transformer stack is pipeline-sharded; parameters are interchangeable via
    split_pretrain_params / merge_pretrain_params, so checkpoints round-trip
    with the standard layout."""

    cfg: BertConfig
    mesh: Mesh
    num_microbatches: int | None = None
    learning_rate: float = 5e-5
    warmup_steps: int = 0
    total_steps: int = 20000
    schedule: str = "linear"
    weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    bf16_adam_moments: bool = False
    seed: int = 42
    model: PretrainModel = field(init=False)

    def __post_init__(self):
        axes = dict(self.mesh.shape)
        assert set(axes) == {"dp", "pp"}, (
            f"pipeline trainer needs a (dp, pp) mesh, got axes {tuple(axes)}")
        self.pp = axes["pp"]
        assert self.cfg.num_hidden_layers % self.pp == 0, (
            f"{self.cfg.num_hidden_layers} layers not divisible by pp={self.pp}")
        # Per-device attention kernels apply per shard inside shard_map; the
        # GSPMD mesh wrappers (attention_mesh) must stay off.
        assert self.cfg.attention_mesh is None
        if self.num_microbatches is None:
            self.num_microbatches = 4 * self.pp
        self.model = PretrainModel(self.cfg)
        self.optimizer = adamw_with_warmup(
            self.learning_rate, self.warmup_steps, self.total_steps,
            self.schedule, self.weight_decay, self.adam_epsilon,
            self.max_grad_norm, bf16_moments=self.bf16_adam_moments)
        self._step = None
        self._eval = None

    # -- flax sub-apply helpers (full param tree, encoder unused) -------------
    def _embed(self, rest, batch, dropout_rng=None):
        deterministic = dropout_rng is None
        return self.model.apply(
            rest,
            batch["input_ids"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            img_feats=batch["img_feats"],
            img_location_embeddings=batch["img_location_embeddings"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": dropout_rng},
            method=lambda m, *a, **kw: m.bert.embed_joint(*a, **kw),
        )

    def _heads(self, rest, seq):
        return self.model.apply(rest, seq, method="heads")

    def _loss_bundle(self, rest, stages, batch, dropout_key):
        """Per-device loss: embeddings everywhere, pipelined encoder, heads +
        loss masked to the last pp rank.  Returns (sel_loss, bundle) where
        ``sel_loss`` is the UNREDUCED per-rank masked loss — differentiating
        it (rather than a psum of it) keeps gradients unscaled: psum's
        transpose re-broadcasts cotangents with a sum, so a psum inside the
        differentiated function would multiply every gradient by pp.  Callers
        reduce loss/bundle/grads explicitly (_reduce_bundle / the grad fn)."""
        num_mb = self.num_microbatches
        emb_key = head_key = None
        if dropout_key is not None:
            # Distinct streams per dp shard; the pp dimension reuses them for
            # the replicated (embed) compute, whose result only matters on
            # rank 0 / rank pp-1.
            dropout_key = jax.random.fold_in(
                dropout_key, jax.lax.axis_index("dp"))
            emb_key, dropout_key = jax.random.split(dropout_key)
        emb, bias = self._embed(rest, batch, emb_key)
        b_local, joint_len, hidden = emb.shape
        assert b_local % num_mb == 0, (
            f"per-dp-shard batch {b_local} not divisible by "
            f"num_microbatches={num_mb}")
        mb = b_local // num_mb
        emb_mb = emb.reshape(num_mb, mb, joint_len, hidden)
        bias_mb = bias.reshape((num_mb, mb) + bias.shape[1:])
        outputs = pipeline_encoder(self.cfg, self.pp, stages, emb_mb, bias_mb,
                                   dropout_key)
        seq = outputs.reshape(b_local, joint_len, hidden)
        out = self._heads(rest, seq)
        bundle = pretrain_loss(out, batch["labels"], batch["next_action"],
                               batch["token_labels"])
        # Only the last rank's ``seq`` is real: select it.  The where-mask
        # zeroes the other ranks' cotangents, so their garbage activations
        # are dead in the backward pass.
        sel = (jax.lax.axis_index("pp") == self.pp - 1)
        sel_loss = jnp.where(sel, bundle["loss"], 0.0)
        return sel_loss, bundle

    def _reduce_bundle(self, bundle):
        """Per-rank bundle -> global metrics: the last pp rank's values,
        averaged over the dp shards."""
        sel = (jax.lax.axis_index("pp") == self.pp - 1)
        return {k: jax.lax.pmean(jax.lax.psum(jnp.where(sel, v, 0.0), "pp"),
                                 "dp")
                for k, v in bundle.items()}

    def _sharded_grad_fn(self, deterministic: bool = False):
        mesh = self.mesh

        def body(rest, stages, batch, *maybe_key):
            dropout_key = None if deterministic else maybe_key[0]
            (_, bundle), grads = jax.value_and_grad(
                self._loss_bundle, argnums=(0, 1), has_aux=True)(
                rest, stages, batch, dropout_key)
            g_rest, g_stages = grads
            # Replicated params: the true gradient sums each rank's masked
            # contribution (embeddings live on rank 0's path, heads on the
            # last rank's); over dp the global loss is the MEAN of per-shard
            # losses, so per-copy grads are averaged.
            g_rest = jax.lax.pmean(jax.lax.psum(g_rest, "pp"), "dp")
            g_stages = jax.lax.pmean(g_stages, "dp")
            return self._reduce_bundle(bundle), g_rest, g_stages

        in_specs = (P(), P("pp"), P("dp")) + (() if deterministic else (P(),))
        return jax.shard_map(
            body, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P(), P("pp")),
            check_vma=False,
        )

    def _sharded_eval_fn(self):
        def body(rest, stages, batch):
            _, bundle = self._loss_bundle(rest, stages, batch, None)
            return self._reduce_bundle(bundle)

        return jax.shard_map(
            body, mesh=self.mesh,
            in_specs=(P(), P("pp"), P("dp")),
            out_specs=P(),
            check_vma=False,
        )

    # -- state -----------------------------------------------------------------
    def init_state(self, sample_batch) -> dict:
        rng = jax.random.PRNGKey(self.seed)

        @jax.jit
        def init(rng):
            return self.model.init(
                rng,
                jnp.asarray(sample_batch["input_ids"][:1]),
                token_type_ids=jnp.asarray(sample_batch["token_type_ids"][:1]),
                attention_mask=jnp.asarray(sample_batch["attention_mask"][:1]),
                img_feats=jnp.asarray(sample_batch["img_feats"][:1]),
                img_location_embeddings=jnp.asarray(
                    sample_batch["img_location_embeddings"][:1]),
            )

        return self.state_from_params(init(rng))

    def state_from_params(self, params) -> dict:
        """Place a standard-layout param tree onto the (dp, pp) mesh."""
        rest, stages = split_pretrain_params(params)
        rest = jax.device_put(rest, NamedSharding(self.mesh, P()))
        stages = jax.device_put(stages, NamedSharding(self.mesh, P("pp")))
        pp_params = {"rest": rest, "stages": stages}
        # Explicit out_shardings: a bare jit(init) commits the whole optimizer
        # state to one device (Adam moments of the stage params included),
        # breaking placement at the first donated step and wasting HBM.
        opt_state = jax.jit(self.optimizer.init,
                            out_shardings=self.opt_shardings(pp_params))(
            pp_params)
        rng = jax.device_put(jax.random.PRNGKey(self.seed + 1),
                             NamedSharding(self.mesh, P()))
        return {"params": pp_params, "opt_state": opt_state, "rng": rng}

    def opt_shardings(self, pp_params):
        """Optimizer-state shardings: moments mirror their params (stage
        moments pp-sharded on the layer axis), scalars replicated."""
        shapes = jax.eval_shape(self.optimizer.init, pp_params)

        def spec(path, leaf):
            if "'stages'" in jax.tree_util.keystr(path) and leaf.ndim >= 1:
                return NamedSharding(self.mesh, P("pp"))
            return NamedSharding(self.mesh, P())

        return jax.tree_util.tree_map_with_path(spec, shapes)

    def checkpoint_params(self, state) -> dict:
        """Back to the standard layout (for orbax / standard-trainer eval)."""
        return merge_pretrain_params(state["params"]["rest"],
                                     state["params"]["stages"])

    # -- steps -------------------------------------------------------------------
    def step_fn(self):
        if self._step is not None:
            return self._step
        grad_fn = self._sharded_grad_fn()

        @partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, dropout_key = jax.random.split(state["rng"])
            bundle, g_rest, g_stages = grad_fn(
                state["params"]["rest"], state["params"]["stages"],
                batch, dropout_key)
            grads = {"rest": g_rest, "stages": g_stages}
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            return ({"params": params, "opt_state": opt_state, "rng": rng},
                    bundle)

        def run(state, host_batch):
            batch = jax.device_put(
                {k: np.asarray(v) for k, v in host_batch.items()},
                NamedSharding(self.mesh, P("dp")))
            return step(state, batch)

        self._step = run
        return run

    def eval_fn(self):
        if self._eval is not None:
            return self._eval
        ev = jax.jit(self._sharded_eval_fn())

        def run(params_or_state, host_batch):
            state = params_or_state
            params = state["params"] if "params" in state else state
            batch = jax.device_put(
                {k: np.asarray(v) for k, v in host_batch.items()},
                NamedSharding(self.mesh, P("dp")))
            return ev(params["rest"], params["stages"], batch)

        self._eval = run
        return run

    def evaluate(self, params_or_state, dataset, batch_size: int) -> dict:
        """Mean metrics over a dataset (PretrainTrainer.evaluate parity;
        single-host — the pipeline trainer does not take per-host shards)."""
        ev = self.eval_fn()
        sums: dict[str, float] = {}
        n = 0
        for batch in dataset.epoch_batches(batch_size, shuffle=False):
            bundle = ev(params_or_state, batch)
            for k, v in bundle.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}
