"""Optimizer factories: AdamW/Adam with the reference warmup schedules.

Parity targets: AdamW + WarmupConstant/WarmupLinear schedules used in
pretraining (tasks/viewpoint_select/pretrain.py:128-139), plain Adam for the
agents (agent.py:129-134), clip-by-norm 40.0 pre-step (agent.py:514-515), and
the rms/adamax options from utils.py:430-446.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def make_schedule(lr: float, warmup_steps: int, total_steps: int, kind: str = "linear") -> optax.Schedule:
    if kind == "constant":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
             optax.constant_schedule(lr)],
            [max(warmup_steps, 1)],
        )
    if kind == "linear":
        return optax.join_schedules(
            [optax.linear_schedule(0.0, lr, max(warmup_steps, 1)),
             optax.linear_schedule(lr, 0.0, max(total_steps - warmup_steps, 1))],
            [max(warmup_steps, 1)],
        )
    raise ValueError(f"unknown schedule {kind}")


def scale_by_adam_lowp(b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
                       eps_root: float = 0.0,
                       moment_dtype=jnp.bfloat16) -> optax.GradientTransformation:
    """Adam moment tracking with both moments stored in ``moment_dtype``.

    Optimizer state for BERT-base is 2x110M floats; streaming it through HBM
    every step is pure bandwidth.  Storing mu AND nu in bfloat16 halves that
    traffic (optax's ``mu_dtype`` only covers mu).  All arithmetic — EMA
    update, bias correction, the rsqrt — happens in float32; only the stored
    state is low-precision, so the per-step quantization error is one bf16
    round (~2^-9 relative), well under Adam's own eps floor in practice.
    Update rule matches optax.scale_by_adam: mu_hat / (sqrt(nu_hat+eps_root)+eps).
    """

    def init_fn(params):
        zeros = lambda p: jnp.zeros(jnp.shape(p), dtype=moment_dtype)
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree.map(zeros, params),
            nu=jax.tree.map(zeros, params),
        )

    def update_fn(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        bc1 = 1.0 - b1 ** count.astype(jnp.float32)
        bc2 = 1.0 - b2 ** count.astype(jnp.float32)

        def moments(m, v, g):
            g32 = g.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1.0 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1.0 - b2) * g32 * g32
            upd = (m32 / bc1) / (jnp.sqrt(v32 / bc2 + eps_root) + eps)
            return m32.astype(moment_dtype), v32.astype(moment_dtype), upd.astype(g.dtype)

        flat_u, treedef = jax.tree.flatten(updates)
        flat_mu = treedef.flatten_up_to(state.mu)
        flat_nu = treedef.flatten_up_to(state.nu)
        out = [moments(m, v, g) for m, v, g in zip(flat_mu, flat_nu, flat_u)]
        new_mu = treedef.unflatten([o[0] for o in out])
        new_nu = treedef.unflatten([o[1] for o in out])
        new_updates = treedef.unflatten([o[2] for o in out])
        return new_updates, optax.ScaleByAdamState(count=count, mu=new_mu, nu=new_nu)

    return optax.GradientTransformation(init_fn, update_fn)


def adamw_with_warmup(lr: float, warmup_steps: int, total_steps: int,
                      schedule: str = "linear", weight_decay: float = 0.0,
                      eps: float = 1e-8, max_grad_norm: float = 1.0,
                      bf16_moments: bool = False) -> optax.GradientTransformation:
    """Pretraining optimizer (pretrain.py:128-139 + clip 1.0 parity).

    ``bf16_moments`` stores both Adam moments in bfloat16 (halves optimizer
    state HBM traffic; arithmetic stays fp32 — see scale_by_adam_lowp).
    """
    sched = make_schedule(lr, warmup_steps, total_steps, schedule)
    if bf16_moments:
        core = optax.chain(
            scale_by_adam_lowp(eps=eps),
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            optax.scale_by_learning_rate(sched),
        )
    else:
        core = optax.adamw(sched, eps=eps, weight_decay=weight_decay)
    return optax.chain(optax.clip_by_global_norm(max_grad_norm), core)


def agent_optimizer(lr: float, kind: str = "adam", max_grad_norm: float = 40.0,
                    bf16_moments: bool = False) -> optax.GradientTransformation:
    """Fine-tuning optimizer (Adam lr, clip 40.0; agent.py:129,514-515)."""
    opts = {
        "adam": optax.adam,
        "rms": optax.rmsprop,
        "sgd": optax.sgd,
        "adamax": optax.adamax,
    }
    if kind not in opts:
        raise ValueError(f"unknown optimizer {kind}")
    if kind == "adam" and bf16_moments:
        core = optax.chain(scale_by_adam_lowp(),
                           optax.scale_by_learning_rate(lr))
    else:
        core = opts[kind](lr)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        core,
    )
