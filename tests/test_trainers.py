"""End-to-end trainer smoke tests in debug (synthetic) mode via the CLI layer."""

import os

import numpy as np
import pytest

from visitron_tpu.config import RunConfig


def _cfg(tmp_path, **kw) -> RunConfig:
    base = dict(
        debug=True, output_dir=str(tmp_path / "out"),
        max_seq_length=64, max_img_seq_length=32,
        lstm_img_feature_dim=48, img_feature_dim=56,
        encoder_hidden_size=16, rnn_dim=24, aemb=8,
        num_iterations=4, num_epochs=1, logging_steps=2, saving_steps=4,
        per_gpu_train_batch_size=1, per_gpu_eval_batch_size=4,
        path_type="planner_path", use_bfloat16=False,
    )
    base.update(kw)
    return RunConfig(**base)


def test_config_flag_surface_roundtrip(tmp_path):
    cfg = RunConfig.from_args([
        "--path_type", "trusted_path", "--learning_rate", "1e-4",
        "--add_r2r_data", "--num_iterations", "7", "--eval_iters", "1", "2",
    ])
    assert cfg.path_type == "trusted_path"
    assert cfg.add_r2r_data is True
    assert cfg.num_iterations == 7
    assert cfg.episode_len == 40
    assert cfg.eval_iters == [1, 2]
    p = tmp_path / "cfg.json"
    cfg.to_json(str(p))
    assert RunConfig.from_json(str(p)) == cfg


def test_episode_len_derivation():
    assert RunConfig(path_type="planner_path").episode_len == 10
    assert RunConfig(path_type="trusted_path").episode_len == 40


@pytest.mark.slow
def test_run_viewpoint_debug(tmp_path, monkeypatch):
    # Shrink the synthetic BERT via config: drop_out etc stay default.
    from visitron_tpu import run as runner
    from visitron_tpu.models import BertConfig

    cfg = _cfg(tmp_path)
    # Patch the workspace BERT to a tiny one for speed.
    import visitron_tpu.train.workspace as wsmod


    def tiny(cfg_, tokenizer):
        import jax.numpy as jnp
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))
    state = runner.run_viewpoint(cfg, do_val=True)
    assert state is not None
    out = cfg.output_dir
    assert os.path.exists(os.path.join(out, "train.csv"))
    assert os.path.exists(os.path.join(out, "val.csv"))
    assert any(n.startswith("checkpoint-") for n in os.listdir(out))
    assert any(n.startswith("preds_val_seen") for n in os.listdir(out))


@pytest.mark.slow
def test_run_pretrain_debug(tmp_path, monkeypatch):
    from visitron_tpu import run as runner
    from visitron_tpu.models import BertConfig
    import visitron_tpu.train.workspace as wsmod

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))
    cfg = _cfg(tmp_path, masked_token_prediction=True)
    state = runner.run_pretrain(cfg)
    assert state is not None
    assert os.path.exists(os.path.join(cfg.output_dir, "train.csv"))


@pytest.mark.slow
def test_run_turn_based_and_classifier_debug(tmp_path, monkeypatch):
    from visitron_tpu import run as runner
    from visitron_tpu.models import BertConfig
    import visitron_tpu.train.workspace as wsmod

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))
    cfg = _cfg(tmp_path, path_type="player_path")
    # Shorten turn-based episodes for test speed.
    object.__setattr__  # noqa: B018 (RunConfig is a plain dataclass; mutate ok)
    cfg2 = _cfg(tmp_path, path_type="planner_path")
    state = runner.run_turn_based(cfg2)
    assert state is not None
    state = runner.run_classifier(_cfg(tmp_path, path_type="planner_path",
                                       num_iterations=2))
    assert state is not None
