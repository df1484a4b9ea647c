"""Multimodal pretraining trainer: one jitted data-parallel step.

Replaces the reference epoch loop (tasks/viewpoint_select/pretrain.py:35-270)
— DataParallel/DDP wrapping, 7 manual NCCL allreduces per step
(pretrain.py:169-189), host-side metric math — with a single jitted step over
a (dp, tp) mesh: batch sharded on dp, parameters replicated, gradients and
metrics reduced by the SPMD partitioner.  Loss/metric values come back as
replicated scalars; no collective is written by hand.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import optax

from visitron_tpu.models import BertConfig, PretrainModel, pretrain_loss
from visitron_tpu.parallel import make_mesh, replicated_sharding, shard_batch
from visitron_tpu.train.optim import adamw_with_warmup


@dataclass
class PretrainTrainer:
    cfg: BertConfig
    learning_rate: float = 5e-5
    warmup_steps: int = 0
    total_steps: int = 20000
    schedule: str = "linear"
    weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    max_grad_norm: float = 1.0
    bf16_adam_moments: bool = False
    # ZeRO-1: shard the optimizer state over the dp axis (parallel/mesh.py:
    # zero1_opt_rules) — moments hold 1/dp of their replicated footprint per
    # chip and the SPMD partitioner derives the grad slice / param-delta
    # all-gather.  Composes with sp; the pipeline trainer shards its own.
    zero1: bool = False
    # FSDP / ZeRO-3: additionally shard the PARAMETERS over dp
    # (parallel/mesh.py:fsdp_param_rules) — per-chip param+grad+moment
    # memory ~1/dp; the SPMD partitioner derives the per-layer parameter
    # all-gathers and gradient reduce-scatter from the placement.  Implies
    # the ZeRO-1 moment sharding; composes with tp.
    fsdp: bool = False
    mesh: Any = None
    seed: int = 42
    model: PretrainModel = field(init=False)

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh()
        from visitron_tpu.models import config_for_mesh

        self.cfg = config_for_mesh(self.cfg, self.mesh)
        self.model = PretrainModel(self.cfg)
        self.optimizer = adamw_with_warmup(
            self.learning_rate, self.warmup_steps, self.total_steps,
            self.schedule, self.weight_decay, self.adam_epsilon, self.max_grad_norm,
            bf16_moments=self.bf16_adam_moments)
        self._step_fn = None
        self._eval_fn = None

    # -- initialization ------------------------------------------------------
    def init_state(self, sample_batch) -> dict:
        rng = jax.random.PRNGKey(self.seed)

        @jax.jit
        def init(rng):
            params = self.model.init(
                rng,
                jnp.asarray(sample_batch["input_ids"][:1]),
                token_type_ids=jnp.asarray(sample_batch["token_type_ids"][:1]),
                attention_mask=jnp.asarray(sample_batch["attention_mask"][:1]),
                img_feats=jnp.asarray(sample_batch["img_feats"][:1]),
                img_location_embeddings=jnp.asarray(sample_batch["img_location_embeddings"][:1]),
            )
            return params, self.optimizer.init(params)

        params, opt_state = init(rng)
        rep = replicated_sharding(self.mesh)
        state = {
            "params": jax.device_put(params, rep),
            "opt_state": jax.device_put(opt_state, rep),
            "rng": jax.device_put(jax.random.PRNGKey(self.seed + 1), rep),
        }
        if self.fsdp:
            from visitron_tpu.parallel import (fsdp_opt_rules,
                                               fsdp_shard_params,
                                               reshard_state)

            state["params"] = fsdp_shard_params(self.mesh, state["params"])
            # Moments co-sharded with their params (incl. tp-split kernels
            # under a (dp, tp) mesh) so the Adam update is shard-local.
            state["opt_state"] = reshard_state(
                state["opt_state"],
                fsdp_opt_rules(self.mesh, state["params"], state["opt_state"]))
        elif self.zero1:
            from visitron_tpu.parallel import zero1_shard_opt_state

            state["opt_state"] = zero1_shard_opt_state(
                self.mesh, state["opt_state"])
        return state

    # -- the jitted step ------------------------------------------------------
    def _loss_fn(self, params, batch, dropout_rng, deterministic):
        out = self.model.apply(
            params,
            batch["input_ids"],
            token_type_ids=batch["token_type_ids"],
            attention_mask=batch["attention_mask"],
            img_feats=batch["img_feats"],
            img_location_embeddings=batch["img_location_embeddings"],
            deterministic=deterministic,
            rngs=None if deterministic else {"dropout": dropout_rng},
        )
        bundle = pretrain_loss(out, batch["labels"], batch["next_action"],
                               batch["token_labels"], cfg=self.cfg)
        return bundle["loss"], bundle

    def raw_step_fn(self):
        """The jitted (state, device batch) -> (state, bundle) train step —
        no host-side device_put.  Shared by step_fn and benchmark tools so
        they always measure exactly the training program."""
        if getattr(self, "_raw_step", None) is not None:
            return self._raw_step

        # Shardings are inferred from the arguments: init_state places params
        # replicated; dryrun/tensor-parallel callers may re-place them with
        # shard_params_rules and the same step function still applies.
        @functools.partial(jax.jit, donate_argnums=(0,))
        def step(state, batch):
            rng, dropout_rng = jax.random.split(state["rng"])
            (_, bundle), grads = jax.value_and_grad(
                self._loss_fn, has_aux=True)(
                state["params"], batch, dropout_rng, False)
            updates, opt_state = self.optimizer.update(
                grads, state["opt_state"], state["params"])
            params = optax.apply_updates(state["params"], updates)
            if self.fsdp and self.mesh is not None:
                from visitron_tpu.parallel import fsdp_pin_layouts

                params, opt_state = fsdp_pin_layouts(
                    self.mesh, params, opt_state)
            elif self.zero1 and self.mesh is not None:
                from visitron_tpu.parallel import zero1_pin_layouts

                params, opt_state = zero1_pin_layouts(
                    self.mesh, params, opt_state)
            new_state = {"params": params, "opt_state": opt_state, "rng": rng}
            return new_state, bundle

        self._raw_step = step
        return step

    def step_fn(self):
        if self._step_fn is not None:
            return self._step_fn
        step = self.raw_step_fn()

        def run(state, host_batch):
            # shard_batch: single-host device_put scatter over dp; multi-host
            # assembles each host's local slice into one global array
            # (make_array_from_process_local_data) — a raw device_put of
            # host-local data to a multi-process sharding is an error.
            return step(state, shard_batch(self.mesh, host_batch))

        self._step_fn = run
        return run

    def eval_fn(self):
        if self._eval_fn is not None:
            return self._eval_fn
        @jax.jit
        def evaluate(params, batch):
            _, bundle = self._loss_fn(params, batch, jax.random.PRNGKey(0), True)
            return bundle

        def run(params, host_batch):
            return evaluate(params, shard_batch(self.mesh, host_batch))

        self._eval_fn = run
        return run

    # -- loops -----------------------------------------------------------------
    def train_epoch(self, state, dataset, batch_size: int, log_every: int = 50,
                    logger=None) -> tuple[dict, list[dict]]:
        """``batch_size`` is PER-HOST (the host's slice of the global batch)."""
        step = self.step_fn()
        history = []
        for i, batch in enumerate(dataset.epoch_batches(
                batch_size, host_id=jax.process_index(),
                num_hosts=jax.process_count())):
            state, bundle = step(state, batch)
            if (i + 1) % log_every == 0:
                metrics = {k: float(v) for k, v in bundle.items()}
                history.append(metrics)
                if logger is not None:
                    logger.log(metrics)
        return state, history

    def evaluate(self, params, dataset, batch_size: int) -> dict[str, float]:
        """``batch_size`` is PER-HOST.  The jitted bundle means are global
        (computed over the assembled dp batch), so every host accumulates
        identical metrics — no cross-host reduction needed."""
        ev = self.eval_fn()
        sums: dict[str, float] = {}
        n = 0
        for batch in dataset.epoch_batches(
                batch_size, shuffle=False, host_id=jax.process_index(),
                num_hosts=jax.process_count()):
            bundle = ev(params, batch)
            for k, v in bundle.items():
                sums[k] = sums.get(k, 0.0) + float(v)
            n += 1
        return {k: v / max(n, 1) for k, v in sums.items()}
