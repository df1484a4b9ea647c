"""Scaled-dot-product multi-head attention core.

Two interchangeable paths:
  * ``multi_head_attention``: pure jnp einsum formulation — XLA fuses the
    softmax chain into the matmuls; this is the correctness reference and the
    CPU-test path.
  * ``flash_attention``: a Pallas TPU kernel (blockwise online-softmax).
    Measured on TPU v5e at the joint-encoder shape (B2xH12x768xD64) it is
    slightly slower than the XLA-fused jnp path (1.27 vs 1.06 ms), so the jnp
    path stays the default; the kernel is kept (validated in interpret mode
    and on hardware) for longer-context configurations where blockwise
    attention wins.

Replaces the reference's unfused torch attention
(oscar/modeling_bert.py:34-79).  Attention-probability dropout (which torch
applies after softmax) is supported only on the jnp path; the TPU trainers use
it for parity during training and may disable it for speed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def multi_head_attention(q, k, v, bias=None, dropout_rng=None, dropout_rate: float = 0.0,
                         deterministic: bool = True):
    """q: (B, H, Q, D); k/v: (B, H, K, D); bias: broadcastable to (B, H, Q, K)."""
    depth = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.asarray(depth, scores.dtype))
    if bias is not None:
        scores = scores + bias.astype(scores.dtype)
    # Softmax in f32 for stability; probs stored/dropped in the compute dtype
    # (bf16 on TPU) — the (B, H, Q, K) tensor dominates HBM traffic.
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    if not deterministic and dropout_rate > 0.0:
        keep = jax.random.bernoulli(dropout_rng, 1.0 - dropout_rate, probs.shape)
        probs = probs * keep.astype(v.dtype) / jnp.asarray(1.0 - dropout_rate, v.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


# ---------------------------------------------------------------------------
# Pallas flash attention (TPU).
# ---------------------------------------------------------------------------

def _flash_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, *, block_k: int, sm_scale: float):
    """One (batch*head, q-block) program: online softmax over K blocks."""
    import jax.experimental.pallas as pl

    q = q_ref[0].astype(jnp.float32) * sm_scale  # (Bq, D)
    num_kb = k_ref.shape[1] // block_k

    def loop_body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(i * block_k, block_k), :].astype(jnp.float32)
        s = jnp.dot(q, k.T, preferred_element_type=jnp.float32)  # (Bq, Bk)
        b = bias_ref[0, 0, pl.ds(i * block_k, block_k)]
        s = s + b[None, :].astype(jnp.float32)
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=-1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=-1)
        acc = acc * alpha[:, None] + jnp.dot(p, v, preferred_element_type=jnp.float32)
        return acc, m_cur, l_cur

    bq, d = q.shape
    acc0 = jnp.zeros((bq, v_ref.shape[-1]), jnp.float32)
    m0 = jnp.full((bq,), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((bq,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, loop_body, (acc0, m0, l0))
    o_ref[0] = (acc / l[:, None]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def flash_attention(q, k, v, key_bias, block_q: int = 128, block_k: int = 128,
                    interpret: bool = False):
    """Pallas blockwise attention. ``key_bias``: (B, K) additive (0 / -inf-ish).

    Shapes must tile: Q % block_q == 0, K % block_k == 0, D in {64, 128}.
    ``interpret`` runs the kernel in Pallas interpret mode (CPU parity tests).

    Differentiable: the backward pass recomputes attention through the
    jnp/XLA-fused path (flash-style recomputation — the (B, H, Q, K)
    probability tensor is never stored between fwd and bwd).
    """
    return _flash_forward(q, k, v, key_bias, block_q, block_k, interpret)


def _flash_forward(q, k, v, key_bias, block_q, block_k, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, h, qs, d = q.shape
    ks = k.shape[2]
    sm_scale = 1.0 / (d ** 0.5)
    qr = q.reshape(b * h, qs, d)
    kr = k.reshape(b * h, ks, d)
    vr = v.reshape(b * h, ks, d)
    biasr = jnp.repeat(key_bias, h, axis=0)[:, None, :]  # (B*H, 1, K)

    grid = (b * h, qs // block_q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, block_k=block_k, sm_scale=sm_scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, ks, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, ks, d), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, ks), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b * h, qs, d), q.dtype),
        interpret=interpret,
    )(qr, kr, vr, biasr)
    return out.reshape(b, h, qs, d)


def _flash_fwd_rule(q, k, v, key_bias, block_q, block_k, interpret):
    out = _flash_forward(q, k, v, key_bias, block_q, block_k, interpret)
    return out, (q, k, v, key_bias)


def _flash_bwd_rule(block_q, block_k, interpret, res, g):
    q, k, v, key_bias = res

    def ref(q, k, v):
        return multi_head_attention(q, k, v, bias=key_bias[:, None, None, :])

    _, vjp = jax.vjp(ref, q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, jnp.zeros_like(key_bias)


flash_attention.defvjp(_flash_fwd_rule, _flash_bwd_rule)


def attention_supports_flash(q_len: int, k_len: int, head_dim: int) -> bool:
    return (
        jax.default_backend() == "tpu"
        and q_len % 128 == 0
        and k_len % 128 == 0
        and head_dim in (64, 128)
    )
