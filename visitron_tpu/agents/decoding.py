"""Action-selection (feedback) strategies for rollouts.

Parity with ``next_decoder_input`` (tasks/viewpoint_select/utils.py:381-427):
teacher / argmax / sample plus the extended strategies — temperature, topk
(k=3), nucleus-style mixture (p=0.4 uniform/categorical coin flip), and
repeat-penalty (scale logits of already-taken actions by the temperature).
All implemented as pure jnp functions usable inside jitted step functions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

FEEDBACK_OPTIONS = (
    "teacher", "argmax", "sample", "topk", "nucleus", "temperature", "penalty",
)


def select_action(
    feedback: str,
    logit,
    rng,
    target=None,
    temperature: float = 1.0,
    taken_mask=None,
    topk: int = 3,
    nucleus_p: float = 0.4,
):
    """Select the next action per batch row.  ``taken_mask``: (B, A) bool of
    previously taken actions (penalty mode)."""
    logit = logit.astype(jnp.float32)
    if feedback in ("temperature", "penalty"):
        logit = logit / temperature
    if feedback == "penalty" and taken_mask is not None:
        # utils.py:390-396: multiply taken actions' logits by temperature.
        logit = jnp.where(taken_mask, logit * temperature, logit)
    if feedback == "teacher":
        assert target is not None
        return target
    if feedback == "argmax":
        return jnp.argmax(logit, axis=-1)
    if feedback in ("sample", "temperature", "penalty"):
        return jax.random.categorical(rng, logit)
    if feedback == "topk":
        vals, idx = jax.lax.top_k(logit, topk)
        choice = jax.random.categorical(rng, vals)
        return jnp.take_along_axis(idx, choice[:, None], axis=1)[:, 0]
    if feedback == "nucleus":
        # utils.py:413-424: with prob p pick uniformly, else sample.
        b, a = logit.shape
        r_flip, r_uni, r_cat = jax.random.split(rng, 3)
        flip = jax.random.bernoulli(r_flip, nucleus_p, (b,))
        uniform = jax.random.randint(r_uni, (b,), 0, a)
        categorical = jax.random.categorical(r_cat, logit)
        return jnp.where(flip, uniform, categorical)
    raise ValueError(f"invalid feedback option {feedback!r}")
