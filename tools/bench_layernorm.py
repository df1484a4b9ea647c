"""Fused add+LayerNorm kernel: hardware parity + fwd/bwd timing vs XLA.

Compares, at the nav/pretrain production shapes, the Pallas one-pass kernel
(ops/layernorm.py) against the XLA lowering of the identical math
(ops.layernorm.layernorm_reference) for a full fwd+bwd through a
sum-of-squares loss.  Prints one JSON line per shape.

Usage: python tools/bench_layernorm.py            (TPU: parity + timing)
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def measure(batch: int, seq: int, hidden: int, dt_name: str = "bfloat16",
            has_res: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from visitron_tpu.ops.layernorm import (fused_add_layernorm,
                                            layernorm_reference)
    from visitron_tpu.utils.benchmark import time_fn

    dt = jnp.bfloat16 if dt_name == "bfloat16" else jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((batch, seq, hidden)), dt)
    res = (jnp.asarray(rng.standard_normal((batch, seq, hidden)), dt)
           if has_res else None)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(hidden), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(hidden), jnp.float32)

    def loss_fused(x, res, g, b):
        y = fused_add_layernorm(x, res, g, b, 1e-12)
        return (y.astype(jnp.float32) ** 2).sum()

    def loss_ref(x, res, g, b):
        y = layernorm_reference(x, res, g, b, 1e-12)
        return (y.astype(jnp.float32) ** 2).sum()

    argnums = (0, 1, 2, 3) if has_res else (0, 2, 3)
    gf = jax.jit(jax.grad(loss_fused, argnums=argnums))
    gr = jax.jit(jax.grad(loss_ref, argnums=argnums))
    outs_f = gf(x, res, g, b)
    outs_r = gr(x, res, g, b)
    # Relative: the sum-of-squares loss makes |dgamma| ~ 2*rows, so absolute
    # error scales with the reduction size; relative is the honest metric.
    rel_err = max(
        float(jnp.max(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)))
              / (jnp.max(jnp.abs(c.astype(jnp.float32))) + 1e-9))
        for a, c in zip(outs_f, outs_r))
    rec = {"shape": [batch, seq, hidden], "dtype": dt_name,
           "has_res": has_res, "grad_max_rel_err": round(rel_err, 8)}

    # The relay's timing windows swing minute-to-minute: interleave
    # A/B/A/B and keep per-arm minima so both arms share the same window
    # regime (NOTES: only within-window comparisons are meaningful).
    fused_ms, xla_ms = float("inf"), float("inf")
    for _ in range(3):
        fused_ms = min(fused_ms, time_fn(gf, x, res, g, b, n_lo=10, n_hi=50))
        xla_ms = min(xla_ms, time_fn(gr, x, res, g, b, n_lo=10, n_hi=50))
    rec["fused_ms"] = round(fused_ms, 4)
    rec["xla_ms"] = round(xla_ms, 4)
    rec["speedup"] = round(xla_ms / fused_ms, 3)
    return rec


if __name__ == "__main__":
    for batch, seq, hidden, has_res in (
            (64, 512, 768, True),    # nav encoder LN sites
            (64, 512, 768, False),   # embeddings LN
            (16, 768, 768, True)):   # pretrain joint-sequence LN sites
        print(json.dumps(measure(batch, seq, hidden, has_res=has_res)),
              flush=True)
