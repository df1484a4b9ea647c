"""Speaker encoder/decoder and Critic (speaker-follower / RL components).

Parity with the present-but-unwired reference modules
(tasks/viewpoint_select/agent_models.py:512-643): the speaker encodes an
action-feature trajectory with attention over per-step panoramas and decodes
instruction words; the critic maps a decoder state to a value estimate.
Kept first-class here so RL/speaker-data-augmentation work has the same
building blocks the reference carried.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from visitron_tpu.models.decoder import SoftDotAttention
from visitron_tpu.models.lstm import LSTM, LSTMCellParams, lstm_cell_step


class SpeakerEncoder(nn.Module):
    feature_size: int
    hidden_size: int
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, action_embeds, feature, lengths, deterministic=True):
        """action_embeds: (B, T, F); feature: (B, T, 36, F) -> ctx (B, T, H)."""
        drop = lambda x: nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        ctx, _ = LSTM(self.feature_size, self.hidden_size, name="lstm")(
            action_embeds, lengths)
        ctx = drop(ctx)
        b, t, h = ctx.shape
        att = SoftDotAttention(self.hidden_size, self.feature_size,
                               name="attention_layer")
        x, _ = att(ctx.reshape(b * t, h),
                   feature.reshape(b * t, feature.shape[2], self.feature_size))
        x = drop(x.reshape(b, t, h))
        x, _ = LSTM(self.hidden_size, self.hidden_size, name="post_lstm")(x, lengths)
        return drop(x)


class SpeakerDecoder(nn.Module):
    vocab_size: int
    embedding_size: int
    hidden_size: int
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, words, ctx, ctx_mask, h0, c0, deterministic=True):
        """words: (B, L) -> (logits (B, L, V), h1, c1)."""
        drop = lambda x: nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        emb = nn.Embed(self.vocab_size, self.embedding_size, name="embedding")(words)
        emb = drop(emb)
        cell = LSTMCellParams(self.embedding_size, self.hidden_size, name="lstm")()

        import jax

        def body(carry, x):
            h, c = carry
            h, c = lstm_cell_step(cell, x, h, c)
            return (h, c), h

        (h1, c1), xs = jax.lax.scan(body, (h0, c0), emb.transpose(1, 0, 2))
        x = drop(xs.transpose(1, 0, 2))
        b, l, h = x.shape
        att = SoftDotAttention(self.hidden_size, ctx.shape[-1], name="attention_layer")
        ctx_rep = jnp.repeat(ctx, l, axis=0).reshape(b * l, ctx.shape[1], ctx.shape[2])
        mask_rep = jnp.repeat(ctx_mask, l, axis=0).reshape(b * l, ctx_mask.shape[1])
        x, _ = att(x.reshape(b * l, h), ctx_rep, mask=mask_rep)
        x = drop(x.reshape(b, l, h))
        logit = nn.Dense(self.vocab_size, name="projection")(x)
        return logit, h1, c1


class Critic(nn.Module):
    hidden_size: int = 512
    dropout_ratio: float = 0.5

    @nn.compact
    def __call__(self, state, deterministic=True):
        x = nn.Dense(self.hidden_size, name="dense_0")(state)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        return nn.Dense(1, name="dense_1")(x)[..., 0]
