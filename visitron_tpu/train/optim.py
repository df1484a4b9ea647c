"""Optimizer factories: AdamW/Adam with the reference warmup schedules.

Parity targets: AdamW + WarmupConstant/WarmupLinear schedules used in
pretraining (tasks/viewpoint_select/pretrain.py:128-139), plain Adam for the
agents (agent.py:129-134), clip-by-norm 40.0 pre-step (agent.py:514-515), and
the rms/adamax options from utils.py:430-446.
"""

from __future__ import annotations

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


def adamw_with_warmup(lr: float, warmup_steps: int, total_steps: int,
                      schedule: str = "linear", weight_decay: float = 0.0,
                      eps: float = 1e-8, max_grad_norm: float = 1.0) -> optax.GradientTransformation:
    """Pretraining optimizer (pretrain.py:128-139 + clip 1.0 parity)."""
    sched = make_schedule(lr, warmup_steps, total_steps, schedule)
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        optax.adamw(sched, eps=eps, weight_decay=weight_decay),
    )


def agent_optimizer(lr: float, kind: str = "adam", max_grad_norm: float = 40.0) -> optax.GradientTransformation:
    """Fine-tuning optimizer (Adam lr, clip 40.0; agent.py:129,514-515)."""
    opts = {
        "adam": optax.adam,
        "rms": optax.rmsprop,
        "sgd": optax.sgd,
        "adamax": optax.adamax,
    }
    if kind not in opts:
        raise ValueError(f"unknown optimizer {kind}")
    return optax.chain(
        optax.clip_by_global_norm(max_grad_norm),
        opts[kind](lr),
    )
