"""Fused masked softmax cross-entropy over a large vocabulary (Pallas).

Motivation (VALIDATION.md round-5 batch probe): the pretraining MLM loss
materializes several (B, S, vocab) float32 tensors — the ``.astype(f32)``
logits copy, log-softmax activations saved for backward — ~2.25 GB each at
batch 24, which is the prime suspect for the XLA auto-remat cliff that
makes batch >= 24 slower than batch 16 (reference loss definition:
encoder.py:379-441, torch CrossEntropyLoss(ignore_index=-1)).

These kernels compute the per-row CE directly from the BF16 logits with
fp32 chunked online-logsumexp math (flash-attention style: running
max/sum across vocabulary chunks), storing only a per-row logsumexp for
backward — no (R, V) tensor beyond the bf16 logits themselves ever hits
HBM, and backward reproduces ``dlogits = g * (softmax - onehot)`` chunk by
chunk in one pass.

Masking semantics match :func:`models.pretrain.masked_cross_entropy`:
rows whose label == ignore_id contribute ce == 0 AND zero gradient (the
zeroing is baked into both kernels, so the caller's uniform mean cotangent
is safe).  The op returns the per-row CE vector; the caller computes the
valid-count mean in jnp (cheap, (R,) shapes).

Like the other kernel sets, ``ce_supports`` gates to TPU + tiling shapes
and callers fall back to the jnp path (``masked_cross_entropy``)
otherwise; ``interpret=True`` runs on CPU for the parity tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_VOCAB_CHUNK = 2048


def _pick_block_rows(rows: int) -> int:
    for br in (256, 128, 64, 32, 16):
        if rows % br == 0:
            return br
    return 0


def ce_supports(rows: int, vocab: int) -> bool:
    """TPU + tiling gate: rows block-tileable; vocab large enough that the
    chunked scan is worthwhile (small heads keep the XLA path)."""
    return (jax.default_backend() == "tpu"
            and _pick_block_rows(rows) > 0
            and vocab >= _VOCAB_CHUNK)


def _fwd_kernel(x_ref, lab_ref, ce_ref, lse_ref, m_scr, l_scr, z_scr, *,
                vocab: int, chunk: int):
    import jax.experimental.pallas as pl

    jdx = pl.program_id(1)
    ncols = pl.num_programs(1)
    labels = lab_ref[:, 0]                                   # (BR,)
    x = x_ref[:].astype(jnp.float32)                         # (BR, VC)
    cols = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            + jdx * chunk)
    x = jnp.where(cols < vocab, x, -jnp.inf)

    @pl.when(jdx == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr)
        z_scr[:] = jnp.zeros_like(z_scr)

    m_old = m_scr[:, :1]                                     # (BR, 1)
    cmax = jnp.max(x, axis=1, keepdims=True)
    m_new = jnp.maximum(m_old, cmax)
    l_new = (l_scr[:, :1] * jnp.exp(m_old - m_new)
             + jnp.sum(jnp.exp(x - m_new), axis=1, keepdims=True))
    match = cols == labels[:, None]
    z_new = z_scr[:, :1] + jnp.sum(jnp.where(match, x, 0.0), axis=1,
                                   keepdims=True)
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)
    z_scr[:] = jnp.broadcast_to(z_new, z_scr.shape)

    @pl.when(jdx == ncols - 1)
    def _():
        lse = m_new + jnp.log(l_new)                         # (BR, 1)
        valid = (labels[:, None] >= 0) & (labels[:, None] < vocab)
        ce_ref[:] = jnp.where(valid, lse - z_new, 0.0)
        lse_ref[:] = lse


def _bwd_kernel(x_ref, lab_ref, lse_ref, g_ref, dx_ref, *, vocab: int,
                chunk: int):
    import jax.experimental.pallas as pl

    jdx = pl.program_id(1)
    labels = lab_ref[:, 0]                                   # (BR,)
    x = x_ref[:].astype(jnp.float32)
    cols = (jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
            + jdx * chunk)
    probs = jnp.exp(jnp.where(cols < vocab, x, -jnp.inf) - lse_ref[:, :1])
    onehot = (cols == labels[:, None]).astype(jnp.float32)
    valid = ((labels[:, None] >= 0)
             & (labels[:, None] < vocab)).astype(jnp.float32)
    dx = g_ref[:, :1] * valid * (probs - onehot)
    dx_ref[:] = dx.astype(dx_ref.dtype)


def _call_fwd(x2, lab2, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, vocab = x2.shape
    br = _pick_block_rows(rows)
    nc = pl.cdiv(vocab, _VOCAB_CHUNK)
    row_chunk = pl.BlockSpec((br, _VOCAB_CHUNK), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    col1 = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    ce, lse = pl.pallas_call(
        functools.partial(_fwd_kernel, vocab=vocab, chunk=_VOCAB_CHUNK),
        grid=(rows // br, nc),
        in_specs=[row_chunk, col1],
        out_specs=[col1, col1],
        out_shape=[jax.ShapeDtypeStruct((rows, 1), jnp.float32),
                   jax.ShapeDtypeStruct((rows, 1), jnp.float32)],
        scratch_shapes=[pltpu.VMEM((br, 128), jnp.float32)] * 3,
        cost_estimate=pl.CostEstimate(
            flops=5 * rows * vocab,
            bytes_accessed=rows * vocab * x2.dtype.itemsize,
            transcendentals=rows * vocab),
        interpret=interpret,
    )(x2, lab2)
    return ce, lse


def _call_bwd(x2, lab2, lse, g2, interpret: bool):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rows, vocab = x2.shape
    br = _pick_block_rows(rows)
    nc = pl.cdiv(vocab, _VOCAB_CHUNK)
    row_chunk = pl.BlockSpec((br, _VOCAB_CHUNK), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    col1 = pl.BlockSpec((br, 1), lambda i, j: (i, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, vocab=vocab, chunk=_VOCAB_CHUNK),
        grid=(rows // br, nc),
        in_specs=[row_chunk, col1, col1, col1],
        out_specs=row_chunk,
        out_shape=jax.ShapeDtypeStruct((rows, vocab), x2.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * rows * vocab,
            bytes_accessed=2 * rows * vocab * x2.dtype.itemsize,
            transcendentals=rows * vocab),
        interpret=interpret,
    )(x2, lab2, lse, g2)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_ce(logits2, labels2, ignore_id, interpret):
    ce, _ = _fused_ce_fwd(logits2, labels2, ignore_id, interpret)
    return ce


def _fused_ce_fwd(logits2, labels2, ignore_id, interpret):
    ce, lse = _call_fwd(logits2, labels2, interpret)
    return ce[:, 0], (logits2, labels2, lse)


def _fused_ce_bwd(ignore_id, interpret, resids, g):
    logits2, labels2, lse = resids
    dx = _call_bwd(logits2, labels2, lse, g.reshape(-1, 1).astype(jnp.float32),
                   interpret)
    return dx, None


_fused_ce.defvjp(_fused_ce_fwd, _fused_ce_bwd)


def fused_masked_softmax_ce(logits, labels, ignore_id: int = -1,
                            interpret: bool = False):
    """Per-row softmax CE of ``logits (R, V)`` against ``labels (R,)``,
    fp32 math from the stored dtype, rows with label == ignore_id yielding
    exactly 0 loss AND 0 gradient.  Caller gates with :func:`ce_supports`
    and computes the valid-mean outside.  ``ignore_id`` must be negative
    (the kernels treat any label outside [0, V) as ignored — reference
    semantics use -1, data_loader_pretrain.py)."""
    assert ignore_id < 0, "kernels treat out-of-range labels as ignored"
    labels2 = labels.astype(jnp.int32).reshape(-1, 1)
    return _fused_ce(logits, labels2, ignore_id, interpret)
