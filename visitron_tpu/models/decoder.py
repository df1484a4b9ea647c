"""Navigation decoders: SoftDot attention + single-step LSTM decoder cells.

Parity targets (tasks/viewpoint_select/agent_models.py):
  * SoftDotAttention (:313-357): q-projected dot attention; ``output_prob=False``
    returns raw logits (the candidate scorer);
  * AttnDecoderLSTM (:360-428): angle-embed previous action, attend the 36-view
    panorama, LSTMCell, attend dialog ctx, SoftDot candidate logits;
  * AttnDecoderLSTMwithClassifier (:431-509): + 2-layer question head;
  * TurnBasedDecoderLSTM (tasks/turn_based/agent_models.py:277-319): discrete
    8-action embedding, single-view feature, 6-way action logits.

Each decoder is a *single-step cell*; agents roll it over time with
``lax.scan`` (teacher forcing, fully on device) or call it per step (student
forcing).  State carried: (h, h_tilde, c) — mirroring the reference loop
(agent.py:377-392), whose decoder LSTM consumes h_tilde as its hidden state.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from visitron_tpu.ops.masking import NEG_INF


class SoftDotAttention(nn.Module):
    query_dim: int
    ctx_dim: int

    @nn.compact
    def __call__(self, h, context, mask=None, output_tilde=True, output_prob=True):
        """h: (B, Q); context: (B, S, C); mask: (B, S) True at masked slots."""
        target = nn.Dense(self.ctx_dim, use_bias=False, name="linear_in")(h)
        logit = jnp.einsum("bsc,bc->bs", context, target)
        attn_in = logit
        if mask is not None:
            attn_in = jnp.where(mask, NEG_INF, attn_in)
        attn = nn.softmax(attn_in, axis=-1)
        weighted = jnp.einsum("bs,bsc->bc", attn, context)
        # output_prob=False returns the MASKED logits: the reference's
        # ``logit = attn`` aliases the tensor its in-place masked_fill_
        # mutates (agent_models.py:338-349) — pinned by the differential test.
        score = attn if output_prob else attn_in
        if output_tilde:
            h_tilde = nn.tanh(
                nn.Dense(self.query_dim, use_bias=False, name="linear_out")(
                    jnp.concatenate([weighted, h], axis=-1))
            )
            return h_tilde, score
        return weighted, score


class AttnDecoderLSTM(nn.Module):
    angle_feat_size: int = 4
    embedding_size: int = 64
    hidden_size: int = 512
    dropout_ratio: float = 0.5
    feature_size: int = 2048 + 4

    def _drop(self, x, deterministic):
        return nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)

    @nn.compact
    def __call__(self, action, feature, cand_feat, prev_h1, c_0, ctx, ctx_mask=None,
                 deterministic=True):
        """One decode step.

        action: (B, angle_feat) previous-action angle feature
        feature: (B, 36, F) panorama; cand_feat: (B, K, F) candidates
        prev_h1: (B, H) previous h_tilde; c_0: (B, H) cell state
        ctx: (B, T, H) dialog context; ctx_mask: (B, T) True at pads
        Returns (h_1, c_1, logit (B, K), h_tilde).
        """
        from visitron_tpu.models.lstm import LSTMCellParams, lstm_cell_step

        a = nn.tanh(nn.Dense(self.embedding_size, name="embedding")(action))
        a = self._drop(a, deterministic)
        prev_h1_drop = self._drop(prev_h1, deterministic)
        attn_feat, _ = SoftDotAttention(self.hidden_size, self.feature_size,
                                        name="feat_att_layer")(
            prev_h1_drop, feature, output_tilde=False)
        x = jnp.concatenate([a, attn_feat], axis=-1)
        cell = LSTMCellParams(self.embedding_size + self.feature_size,
                              self.hidden_size, name="lstm")()
        h_1, c_1 = lstm_cell_step(cell, x, prev_h1, c_0)
        h_1_drop = self._drop(h_1, deterministic)
        h_tilde, _ = SoftDotAttention(self.hidden_size, ctx.shape[-1],
                                      name="attention_layer")(
            h_1_drop, ctx, mask=ctx_mask)
        h_tilde_drop = self._drop(h_tilde, deterministic)
        _, logit = SoftDotAttention(self.hidden_size, self.feature_size,
                                    name="candidate_att_layer")(
            h_tilde_drop, cand_feat, output_tilde=False, output_prob=False)
        return h_1, c_1, logit, h_tilde


class AttnDecoderLSTMwithClassifier(nn.Module):
    angle_feat_size: int = 4
    embedding_size: int = 64
    hidden_size: int = 512
    dropout_ratio: float = 0.5
    feature_size: int = 2048 + 4

    def _drop(self, x, deterministic):
        return nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)

    @nn.compact
    def __call__(self, action, feature, cand_feat, prev_h1, c_0, ctx, ctx_mask=None,
                 deterministic=True):
        """Returns (h_1, c_1, nav_logit, qa_logit (B, 1), h_tilde)."""
        from visitron_tpu.models.lstm import LSTMCellParams, lstm_cell_step

        a = nn.tanh(nn.Dense(self.embedding_size, name="embedding")(action))
        a = self._drop(a, deterministic)
        prev_h1_drop = self._drop(prev_h1, deterministic)
        attn_feat, _ = SoftDotAttention(self.hidden_size, self.feature_size,
                                        name="feat_att_layer")(
            prev_h1_drop, feature, output_tilde=False)
        x = jnp.concatenate([a, attn_feat], axis=-1)
        cell = LSTMCellParams(self.embedding_size + self.feature_size,
                              self.hidden_size, name="lstm")()
        h_1, c_1 = lstm_cell_step(cell, x, prev_h1, c_0)
        h_1_drop = self._drop(h_1, deterministic)
        h_tilde, _ = SoftDotAttention(self.hidden_size, ctx.shape[-1],
                                      name="attention_layer")(
            h_1_drop, ctx, mask=ctx_mask)
        h_tilde_drop = self._drop(h_tilde, deterministic)
        qa = nn.Dense(self.hidden_size // 2, name="question_linear_0")(h_tilde_drop)
        qa_logit = nn.Dense(1, name="question_linear_1")(nn.tanh(qa))
        _, nav_logit = SoftDotAttention(self.hidden_size, self.feature_size,
                                        name="candidate_att_layer")(
            h_tilde_drop, cand_feat, output_tilde=False, output_prob=False)
        return h_1, c_1, nav_logit, qa_logit, h_tilde


class TurnBasedDecoderLSTM(nn.Module):
    """Low-level 6-action decoder (turn_based/agent_models.py:277-319)."""

    input_action_size: int = 8
    output_action_size: int = 6
    embedding_size: int = 32
    hidden_size: int = 512
    dropout_ratio: float = 0.5
    feature_size: int = 2048

    @nn.compact
    def __call__(self, action, feature, h_0, c_0, ctx, ctx_mask=None, deterministic=True):
        """action: (B,) int ids; feature: (B, F) single view.
        Returns (h_1, c_1, alpha, logit (B, 6))."""
        from visitron_tpu.models.lstm import LSTMCellParams, lstm_cell_step

        a = nn.Embed(self.input_action_size, self.embedding_size, name="embedding")(action)
        x = jnp.concatenate([a, feature], axis=-1)
        x = nn.Dropout(self.dropout_ratio)(x, deterministic=deterministic)
        cell = LSTMCellParams(self.embedding_size + self.feature_size,
                              self.hidden_size, name="lstm")()
        h_1, c_1 = lstm_cell_step(cell, x, h_0, c_0)
        h_1_drop = nn.Dropout(self.dropout_ratio)(h_1, deterministic=deterministic)
        h_tilde, alpha = SoftDotAttention(self.hidden_size, ctx.shape[-1],
                                          name="attention_layer")(
            h_1_drop, ctx, mask=ctx_mask)
        logit = nn.Dense(self.output_action_size, name="decoder2action")(h_tilde)
        return h_1, c_1, alpha, logit
