"""LSTM primitives: a fused cell step and a masked ``lax.scan`` sequence LSTM.

The reference leans on cuDNN LSTMs with pack_padded_sequence
(agent_models.py:223-310).  On TPU, packing hurts (dynamic shapes); instead we
run the full padded sequence through ``lax.scan`` with a per-step validity
mask that freezes the carry at padded positions, which reproduces
pack_padded semantics exactly: outputs at padded steps are zero and the final
(h, c) equal the state at each sequence's true last step.

Cells keep the torch LSTM gate layout (rows [i; f; g; o]) so torch-trained
checkpoints import weight-for-weight.  Parameters are raw arrays (wi, wh, bi,
bh) rather than nested Dense modules: the cell step is then a plain function,
trivially usable inside ``lax.scan`` both here and in the agents' fully
on-device episode rollouts.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def lstm_cell_step(params, x, h, c):
    """One LSTMCell step. params: {wi: (4H, I), wh: (4H, H), bi, bh: (4H,)}."""
    gates = x @ params["wi"].T + params["bi"] + h @ params["wh"].T + params["bh"]
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
    h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
    return h_new, c_new


def _uniform_init(hidden_size):
    # torch LSTM default: U(-1/sqrt(H), 1/sqrt(H)).
    bound = 1.0 / jnp.sqrt(hidden_size)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LSTMCellParams(nn.Module):
    """Declares torch-layout LSTMCell parameters; returns the params dict."""

    input_size: int
    hidden_size: int

    @nn.compact
    def __call__(self):
        init = _uniform_init(self.hidden_size)
        return {
            "wi": self.param("wi", init, (4 * self.hidden_size, self.input_size)),
            "wh": self.param("wh", init, (4 * self.hidden_size, self.hidden_size)),
            "bi": self.param("bi", init, (4 * self.hidden_size,)),
            "bh": self.param("bh", init, (4 * self.hidden_size,)),
        }


def masked_lstm_scan(params, inputs, lengths, dtype=None):
    """Run an LSTM over (B, T, I) with per-sequence lengths.

    The input-side gate projection runs as ONE (B, T, I)x(I, 4H) matmul
    outside the scan (MXU-efficient); the sequential body only does the
    recurrent h @ Wh matmul + elementwise gates.  Returns (outputs (B, T, H)
    zeroed at pads, (h_last, c_last))."""
    b, t, _ = inputs.shape
    hidden_size = params["wh"].shape[1]
    if dtype is None:
        dtype = inputs.dtype
    mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(dtype)
    h0 = jnp.zeros((b, hidden_size), dtype)
    c0 = jnp.zeros((b, hidden_size), dtype)
    # (B, T, 4H): hoisted input gates.
    gates_x = inputs @ params["wi"].T + params["bi"] + params["bh"]

    def body(carry, xm):
        h, c = carry
        gx, valid = xm
        gates = gx + h @ params["wh"].T
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        v = valid[:, None]
        h_new = v * h_new + (1 - v) * h
        c_new = v * c_new + (1 - v) * c
        return (h_new, c_new), h_new * v

    (h, c), ys = jax.lax.scan(
        body, (h0, c0), (gates_x.transpose(1, 0, 2), mask.transpose(1, 0)),
        unroll=8,  # amortize scan overhead on TPU; body is tiny
    )
    return ys.transpose(1, 0, 2), (h, c)


class LSTM(nn.Module):
    """Masked uni/bidirectional sequence LSTM with pack_padded parity."""

    input_size: int
    hidden_size: int
    bidirectional: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, inputs, lengths):
        inputs = inputs.astype(self.dtype)
        fwd = LSTMCellParams(self.input_size, self.hidden_size, name="fwd")()
        ys_f, (h_f, c_f) = masked_lstm_scan(fwd, inputs, lengths, self.dtype)
        if not self.bidirectional:
            return ys_f, (h_f, c_f)
        bwd = LSTMCellParams(self.input_size, self.hidden_size, name="bwd")()
        b, t, _ = inputs.shape
        idx = jnp.clip(lengths[:, None] - 1 - jnp.arange(t)[None, :], 0, t - 1)
        rev = jnp.take_along_axis(inputs, idx[:, :, None], axis=1)
        ys_b, (h_b, c_b) = masked_lstm_scan(bwd, rev, lengths, self.dtype)
        ys_b = jnp.take_along_axis(ys_b, idx[:, :, None], axis=1)
        # The clip-based un-reversal gathers step 0 into pad slots; re-zero
        # them to keep the pack_padded contract (outputs zero at pads).
        pad_mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(ys_b.dtype)
        ys_b = ys_b * pad_mask[:, :, None]
        ys = jnp.concatenate([ys_f, ys_b], axis=-1)
        return ys, (jnp.concatenate([h_f, h_b], -1), jnp.concatenate([c_f, c_b], -1))
