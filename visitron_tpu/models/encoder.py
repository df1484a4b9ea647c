"""Dialog encoder: BERT over the dialog sequence, LSTM on top.

OscarEncoder parity (tasks/viewpoint_select/agent_models.py:192-310): the
(full, padded) BERT sequence output feeds a masked LSTM; the LSTM's final
valid state is projected to the decoder dims:

  ctx (B, T, enc_hidden)    dropout applied
  h0 = tanh(Linear(h_T))    decoder initial hidden
  c0 = Linear(c_T) if enc_hidden*dirs != dec_hidden else c_T

The reference sorts batches by length for pack_padded_sequence
(agent.py:151-184); our masked scan makes sorting unnecessary, so batch order
is stable end-to-end (no perm_idx bookkeeping).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from visitron_tpu.models.bert import BertConfig, BertTextModel
from visitron_tpu.models.lstm import LSTM


class OscarEncoder(nn.Module):
    cfg: BertConfig
    hidden_size: int = 512
    decoder_hidden_size: int = 512
    dropout_ratio: float = 0.5
    bidirectional: bool = False

    @nn.compact
    def __call__(self, input_ids, lengths, token_type_ids=None, attention_mask=None,
                 deterministic=True):
        if attention_mask is None:
            t = input_ids.shape[1]
            attention_mask = (jnp.arange(t)[None, :] < lengths[:, None]).astype(jnp.int32)
        seq, _ = BertTextModel(self.cfg, name="bert")(
            input_ids,
            token_type_ids=token_type_ids,
            attention_mask=attention_mask,
            deterministic=deterministic,
        )
        dirs = 2 if self.bidirectional else 1
        ctx, (h_t, c_t) = LSTM(
            input_size=self.cfg.hidden_size,
            hidden_size=self.hidden_size,
            bidirectional=self.bidirectional,
            dtype=jnp.float32,
            name="lstm",
        )(seq.astype(jnp.float32), lengths)
        decoder_init = nn.tanh(
            nn.Dense(self.decoder_hidden_size, name="encoder_lstm2decoder_ht")(h_t)
        )
        if self.hidden_size * dirs != self.decoder_hidden_size:
            c_t = nn.Dense(self.decoder_hidden_size, name="encoder_lstm2decoder_ct")(c_t)
        ctx = nn.Dropout(self.dropout_ratio)(ctx, deterministic=deterministic)
        return ctx, decoder_init, c_t
