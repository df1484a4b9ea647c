"""Oscar weight grafting into the nav agent's dialog encoder."""

import numpy as np
import pytest
import torch

from visitron_tpu.models import BertConfig, OscarEncoder
from visitron_tpu.models.oscar_import import graft_bert_into_encoder


def test_graft_bert_into_encoder(tmp_path):
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=48, type_vocab_size=2)
    torch.manual_seed(0)
    hf = BertModel(hf_cfg)
    torch.save(hf.state_dict(), tmp_path / "pytorch_model.bin")

    cfg = BertConfig(vocab_size=123, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=4)
    import jax
    import jax.numpy as jnp

    enc = OscarEncoder(cfg, hidden_size=16, decoder_hidden_size=24)
    params = jax.jit(lambda r: enc.init(
        r, jnp.ones((1, 16), jnp.int32), jnp.array([16])))(jax.random.PRNGKey(0))
    grafted = graft_bert_into_encoder(params, str(tmp_path), cfg)
    emb = grafted["params"]["bert"]["bert"]["word_embeddings"]["embedding"]
    np.testing.assert_array_equal(
        np.asarray(emb[:120]),
        hf.state_dict()["embeddings.word_embeddings.weight"].numpy())
    # LSTM params untouched.
    np.testing.assert_array_equal(
        np.asarray(grafted["params"]["lstm"]["fwd"]["wi"]),
        np.asarray(params["params"]["lstm"]["fwd"]["wi"]))
    # Encoder still applies.
    ctx, h, c = enc.apply(grafted, jnp.ones((2, 16), jnp.int32), jnp.array([16, 10]))
    assert np.isfinite(np.asarray(ctx)).all()


def test_graft_pretrain_checkpoint_into_encoder(tmp_path):
    """The ablation chain: one of OUR orbax pretraining checkpoints (run.py
    pretrain output) initializes the nav encoder's BERT — both via an explicit
    checkpoint-N path and via the run dir (latest wins)."""
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _example_batch
    from visitron_tpu.models.oscar_import import (
        graft_pretrain_checkpoint_into_encoder, is_pretrain_checkpoint)
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.pretrain import PretrainTrainer

    cfg = BertConfig(vocab_size=120, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=4,
                     img_feature_dim=16, action_space=36, detector_classes=4)
    trainer = PretrainTrainer(cfg, total_steps=10)
    batch = _example_batch(2, 24, 8, cfg.vocab_size, cfg.img_feature_dim,
                           cfg.action_space, cfg.detector_classes,
                           np.random.default_rng(0))
    state = trainer.init_state(batch)
    mgr = CheckpointManager(str(tmp_path / "pt"))
    mgr.save(7, state["params"], wait=True)

    enc = OscarEncoder(cfg, hidden_size=16, decoder_hidden_size=24)
    import jax.numpy as jnp

    params = jax.jit(lambda r: enc.init(
        r, jnp.ones((1, 16), jnp.int32), jnp.array([16])))(jax.random.PRNGKey(3))

    ckpt_dir = str(tmp_path / "pt" / "checkpoint-7")
    assert is_pretrain_checkpoint(ckpt_dir)
    assert is_pretrain_checkpoint(str(tmp_path / "pt"))
    assert not is_pretrain_checkpoint(str(tmp_path))

    for path in (ckpt_dir, str(tmp_path / "pt")):
        grafted = graft_pretrain_checkpoint_into_encoder(params, path)
        np.testing.assert_array_equal(
            np.asarray(grafted["params"]["bert"]["bert"]["word_embeddings"]["embedding"]),
            np.asarray(state["params"]["params"]["bert"]["word_embeddings"]["embedding"]))
        # LSTM stays fresh; the encoder still applies.
        np.testing.assert_array_equal(
            np.asarray(grafted["params"]["lstm"]["fwd"]["wi"]),
            np.asarray(params["params"]["lstm"]["fwd"]["wi"]))
        ctx, h, c = enc.apply(grafted, jnp.ones((2, 16), jnp.int32),
                              jnp.array([16, 10]))
        assert np.isfinite(np.asarray(ctx)).all()
