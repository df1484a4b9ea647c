"""Multi-objective pretraining model: MLM + next-action + region-token heads.

PreTrainOscar parity (tasks/viewpoint_select/encoder.py:306-441):
  * MLM head: dense+gelu+LayerNorm transform, decoder tied to the word
    embeddings plus a free bias (encoder.py:322,332-335);
  * next-action: Linear([CLS]) over the 36-view action space + stop slot
    (encoder.py:142-158,317-319);
  * region-token head: Linear over detector classes (encoder.py:323-326).

Deviations (both documented): the reference feeds LogSoftmax/Softmax outputs
into CrossEntropyLoss for the action/token heads (a double-normalization bug;
argmax unchanged); we compute standard softmax cross-entropy on logits.  All
losses use ignore-label -1, mean-reduced over non-ignored entries.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec

from visitron_tpu.models.bert import (BertConfig, FusedResidualLayerNorm,
                                      VisitronBert, _dense, sp_constrain)
from visitron_tpu.ops.crossentropy import ce_supports, fused_masked_softmax_ce


def masked_cross_entropy(logits, labels, ignore_id: int = -1):
    """Mean softmax CE over labels != ignore_id (CrossEntropyLoss parity)."""
    valid = labels != ignore_id
    safe = jnp.where(valid, labels, 0)
    ce = optax.softmax_cross_entropy_with_integer_labels(
        logits.astype(jnp.float32), safe)
    total = jnp.sum(ce * valid)
    count = jnp.maximum(jnp.sum(valid), 1)
    return total / count, valid


def masked_accuracy(logits, labels, ignore_id: int = -1):
    valid = labels != ignore_id
    pred = jnp.argmax(logits, axis=-1)
    correct = jnp.sum((pred == labels) & valid)
    return correct / jnp.maximum(jnp.sum(valid), 1)


class PretrainModel(nn.Module):
    cfg: BertConfig

    def setup(self):
        cfg = self.cfg
        self.bert = VisitronBert(cfg, name="bert")
        self.mlm_transform = _dense(cfg.hidden_size, cfg, name="mlm_transform")
        # Same {scale, bias} tree as nn.LayerNorm; routes to the one-pass
        # Pallas kernel on TPU (ops/layernorm.py), exact flax math otherwise.
        self.mlm_layer_norm = FusedResidualLayerNorm(
            cfg, name="mlm_layer_norm")
        self.next_action = _dense(cfg.action_space, cfg, name="next_action")
        self.token_head = _dense(cfg.detector_classes, cfg, name="token_head")
        self.mlm_bias = self.param(
            "mlm_bias", nn.initializers.zeros, (cfg.vocab_size,), jnp.float32)

    def __call__(
        self,
        input_ids,
        token_type_ids=None,
        attention_mask=None,
        img_feats=None,
        img_location_embeddings=None,
        deterministic=True,
        text_only=False,
    ):
        seq, pooled = self.bert(
            input_ids,
            token_type_ids=token_type_ids,
            attention_mask=attention_mask,
            img_feats=img_feats,
            img_location_embeddings=img_location_embeddings,
            deterministic=deterministic,
        )
        if text_only:
            return seq, pooled
        return self.heads(seq, pooled)

    def heads(self, seq, pooled=None):
        """The three pretraining heads over an encoded sequence.  Split out of
        ``__call__`` so pipeline-parallel execution (parallel/pipeline.py) can
        apply them to the stage-pipelined encoder output."""
        if pooled is None:
            pooled = self.bert.pooler(seq)
        x = self.mlm_transform(seq)
        x = nn.gelu(x, approximate=False)
        x = self.mlm_layer_norm(x)
        if _no_mesh(self.cfg) and self.cfg.use_fused_mlm_ce:
            # Fused-CE path: keep the (B, S, vocab) logits in the compute
            # dtype (the f32 bias add is a fused elementwise epilogue; no
            # fp32 copy of the largest tensor in the program hits HBM).
            mlm_logits = (self.bert.attend_vocab(x)
                          + self.mlm_bias).astype(self.cfg.dtype)
        else:
            mlm_logits = (self.bert.attend_vocab(x).astype(jnp.float32)
                          + self.mlm_bias)
        action_logits = self.next_action(pooled).astype(jnp.float32)
        token_logits = self.token_head(seq).astype(jnp.float32)
        # Sequence parallelism: keep the (B, S, vocab) logits — the largest
        # activation in the program — token-sharded; the CE reduction then
        # psums across sp shards.
        mlm_logits = sp_constrain(mlm_logits, self.cfg,
                                  PartitionSpec("dp", "sp", None))
        token_logits = sp_constrain(token_logits, self.cfg,
                                    PartitionSpec("dp", "sp", None))
        return {
            "sequence_output": seq,
            "pooled_output": pooled,
            "mlm_logits": mlm_logits,
            "action_logits": action_logits,
            "token_logits": token_logits,
        }


def _no_mesh(cfg) -> bool:
    return (cfg.attention_mesh is None and cfg.sp_mesh is None
            and cfg.cp_mesh is None)


def pretrain_loss(outputs, labels, next_action=None, token_labels=None,
                  cfg: BertConfig | None = None):
    """Loss/metric bundle parity (encoder.py:379-441): returns a dict with
    loss, mask/next/token losses and word/action/token accuracies.

    Documented deviation (pinned by the full-model differential test): the
    reference's token head applies Softmax BEFORE CrossEntropyLoss
    (encoder.py:324-326 + :383), feeding probabilities where torch expects
    logits — CE(softmax(x)) != CE(x) (unlike the action head's LogSoftmax,
    which CE's shift-invariance makes exactly equivalent).  We feed raw
    logits; argmax/accuracy are unaffected, the loss is the standard one."""
    mlm_logits = outputs["mlm_logits"]
    seq_len = mlm_logits.shape[1]
    rows = mlm_logits.shape[0] * seq_len
    vocab = mlm_logits.shape[-1]
    if (cfg is not None and cfg.use_fused_mlm_ce and _no_mesh(cfg)
            and ce_supports(rows, vocab)):
        # Pallas chunked-logsumexp CE (ops/crossentropy.py) — identical
        # masking semantics, per-row CE meaned here over valid labels.
        flat_labels = labels[:, :seq_len].reshape(-1)
        ce = fused_masked_softmax_ce(mlm_logits.reshape(rows, vocab),
                                     flat_labels)
        mask_loss = ce.sum() / jnp.maximum(jnp.sum(flat_labels != -1), 1)
    else:
        mask_loss, _ = masked_cross_entropy(mlm_logits, labels[:, :seq_len])
    loss = mask_loss
    out = {"mask_loss": mask_loss,
           "words_accuracy": masked_accuracy(mlm_logits, labels[:, :seq_len])}
    if next_action is not None:
        next_loss, _ = masked_cross_entropy(outputs["action_logits"], next_action)
        loss = loss + next_loss
        out["next_loss"] = next_loss
        out["action_accuracy"] = masked_accuracy(outputs["action_logits"], next_action)
    if token_labels is not None:
        token_loss, _ = masked_cross_entropy(outputs["token_logits"], token_labels[:, :seq_len])
        loss = loss + token_loss
        out["token_loss"] = token_loss
        out["token_accuracy"] = masked_accuracy(outputs["token_logits"], token_labels[:, :seq_len])
    out["loss"] = loss
    return out
