"""Race the attention cores on the real TPU at production shapes.

Compares fwd+bwd step time (on-device fori loop, utils/benchmark.time_fn) of:
  * xla    — multi_head_attention (the current default path)
  * xla-tb — multi_head_attention with threshold-on-random-bits dropout
             (skips the uniform-float conversion of bernoulli)
  * fused  — the small-S single-pass Pallas kernel (one program per
             head-block, dq/dk/dv in one backward kernel)
  * flash  — the blockwise flash kernel set (the long-context path)

Shapes: nav encoder (64, 12, 256, 64), pretrain joint encoder
(16, 12, 768, 64), and the 512 bucket; rates 0.0 and 0.3 (reference
--drop_out).  Prints one line per (shape, rate, impl).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from visitron_tpu.ops.attention import (flash_attention, fused_attention,
                                            multi_head_attention)
    from visitron_tpu.ops.masking import NEG_INF
    from visitron_tpu.utils.benchmark import time_fn

    def xla_loss(q, k, v, key_bias, rng, rate):
        out = multi_head_attention(
            q, k, v, bias=key_bias[:, None, None, :], dropout_rng=rng,
            dropout_rate=rate, deterministic=rate == 0.0)
        return out

    def xla_tb_loss(q, k, v, key_bias, rng, rate):
        depth = q.shape[-1]
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.asarray(depth, scores.dtype))
        scores = scores + key_bias[:, None, None, :].astype(scores.dtype)
        probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
        if rate > 0.0:
            thr = np.uint32(min(int(rate * 2**32), 2**32 - 1))
            bits = jax.random.bits(rng, probs.shape, jnp.uint32)
            probs = jnp.where(bits >= thr,
                              probs * jnp.asarray(1.0 / (1.0 - rate), v.dtype),
                              jnp.zeros((), v.dtype))
        return jnp.einsum("bhqk,bhkd->bhqd", probs, v)

    shapes = [(64, 12, 256, 64), (16, 12, 512, 64), (16, 12, 768, 64)]
    for b, h, s, d in shapes:
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.bfloat16)
        keep = np.ones((b, s), np.float32)
        keep[:, int(s * 0.9):] = 0.0  # ~10% padded keys
        bias = jnp.asarray((1.0 - keep) * NEG_INF)
        key = jax.random.PRNGKey(0)
        seed = jnp.int32(7)
        for rate in (0.0, 0.3):
            impls = {
                "xla": lambda q, k, v, do: jax.vjp(
                    lambda q, k, v: xla_loss(q, k, v, bias, key, rate),
                    q, k, v)[1](do),
                "xla-tb": lambda q, k, v, do: jax.vjp(
                    lambda q, k, v: xla_tb_loss(q, k, v, bias, key, rate),
                    q, k, v)[1](do),
                "fused": lambda q, k, v, do: jax.vjp(
                    lambda q, k, v: fused_attention(
                        q, k, v, bias, seed if rate else None, rate),
                    q, k, v)[1](do),
                "flash": lambda q, k, v, do: jax.vjp(
                    lambda q, k, v: flash_attention(
                        q, k, v, bias, seed if rate else None, rate),
                    q, k, v)[1](do),
            }
            do = jnp.ones((b, h, s, d), jnp.bfloat16)
            for name, fn in impls.items():
                try:
                    ms = time_fn(fn, q, k, v, do, n_lo=10, n_hi=50)
                    print(f"B={b} H={h} S={s} D={d} rate={rate} {name:7s} "
                          f"{ms:7.3f} ms (fwd+bwd)", flush=True)
                except Exception as e:
                    print(f"B={b} H={h} S={s} D={d} rate={rate} {name:7s} "
                          f"FAILED: {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
