"""ImageBertForSequenceClassificationwithAction parity model.

The reference's alternative fine-tune architecture (encoder.py:73-139,
registered in MODEL_CLASS, model_utils.py:15-26): the multimodal BERT's
pooled [CLS] output scores navigation candidates directly through a SoftDot
layer (no recurrent decoder).  Kept first-class for the ablation surface.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from visitron_tpu.models.bert import BertConfig, VisitronBert
from visitron_tpu.models.decoder import SoftDotAttention


class ImageBertForActionPrediction(nn.Module):
    cfg: BertConfig
    candidate_dim: int = 2048

    @nn.compact
    def __call__(self, input_ids, candidate_feats, token_type_ids=None,
                 attention_mask=None, img_feats=None, img_location_embeddings=None,
                 deterministic=True, text_only=False):
        """candidate_feats: (B, K, candidate_dim) -> logits (B, K)."""
        seq, pooled = VisitronBert(self.cfg, name="bert")(
            input_ids,
            token_type_ids=token_type_ids,
            attention_mask=attention_mask,
            img_feats=img_feats,
            img_location_embeddings=img_location_embeddings,
            deterministic=deterministic,
        )
        if text_only:
            return seq, pooled
        pooled = nn.Dropout(self.cfg.hidden_dropout_prob)(
            pooled, deterministic=deterministic)
        _, logits = SoftDotAttention(self.cfg.hidden_size, self.candidate_dim,
                                     name="candidate_att_layer")(
            pooled.astype(jnp.float32), candidate_feats.astype(jnp.float32),
            output_tilde=False, output_prob=False)
        return logits
