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
def test_run_pretrain_per_dataset_validation(tmp_path, monkeypatch):
    """With two source datasets enabled, each epoch's validation logs separate
    ``{ds}_val_seen/``+``{ds}_val_unseen/`` metric groups (reference
    pretrain.py:301-579 scores ndh/r2r/r4r val datasets individually)."""
    import csv

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
    # dp=2 keeps the global batch (2) under the 4-item synthetic val splits so
    # the sweeps actually run.
    cfg = _cfg(tmp_path, add_r2r_data=True, mesh_dp=2)
    state = runner.run_pretrain(cfg)
    assert state is not None
    with open(os.path.join(cfg.output_dir, "train.csv")) as f:
        columns = next(csv.reader(f))
    for group in ("ndh_val_seen", "ndh_val_unseen", "r2r_val_seen",
                  "r2r_val_unseen"):
        assert any(c.startswith(f"{group}/") for c in columns), (group, columns)


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
    # Distinct output dirs: each trainer's val enumerates checkpoint-* under
    # its own output_dir.
    cfg2 = _cfg(tmp_path, path_type="planner_path",
                output_dir=str(tmp_path / "tb"))
    state = runner.run_turn_based(cfg2)
    assert state is not None
    assert os.path.exists(os.path.join(cfg2.output_dir, "val.csv"))
    state = runner.run_classifier(_cfg(tmp_path, path_type="planner_path",
                                       num_iterations=2,
                                       output_dir=str(tmp_path / "cls")))
    assert state is not None


def _tiny_bert(monkeypatch):
    from visitron_tpu.models import BertConfig
    import visitron_tpu.train.workspace as wsmod

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))


@pytest.mark.slow
def test_run_pretrain_pipeline_debug(tmp_path, monkeypatch):
    """--mesh_pp 2: pipelined pretraining through the CLI, with --resume
    continuing from a standard-layout checkpoint (loadable by the plain
    model) plus the trainer's own opt_state layout."""
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, masked_token_prediction=True, num_epochs=1, mesh_pp=2)
    state = runner.run_pretrain(cfg)
    assert set(state["params"]) == {"rest", "stages"}
    assert os.path.exists(os.path.join(cfg.output_dir, "train.csv"))
    from visitron_tpu.train.checkpoint import CheckpointManager
    first = CheckpointManager(cfg.output_dir).latest()
    assert first is not None
    # Checkpoint params are standard-layout (finetune consumers load them).
    from visitron_tpu.parallel import merge_pretrain_params
    std = merge_pretrain_params(state["params"]["rest"],
                                state["params"]["stages"])
    restored = CheckpointManager(cfg.output_dir).restore(
        first, {"params": std})["params"]
    enc = restored["params"]["bert"]["encoder"]
    assert any(k.startswith("layer_") for k in enc)
    # Resume continues (same --mesh_pp) without error.
    cfg2 = _cfg(tmp_path, masked_token_prediction=True, num_epochs=2,
                mesh_pp=2, resume=True)
    state2 = runner.run_pretrain(cfg2)
    assert CheckpointManager(cfg.output_dir).latest() > first
    assert set(state2["params"]) == {"rest", "stages"}


@pytest.mark.slow
def test_run_pretrain_sequence_parallel_debug(tmp_path, monkeypatch):
    """--mesh_sp 2 --zero1: sequence-parallel pretraining with dp-sharded
    optimizer state through the CLI.  Params stay replicated in the STANDARD
    layout, so checkpoints and --resume work identically to the plain
    trainer (unlike --mesh_pp, no layout conversion is involved); --resume
    must restore the moments back to their dp shards, not replicate them."""
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, masked_token_prediction=True, num_epochs=1,
               mesh_sp=2, zero1=True)
    state = runner.run_pretrain(cfg)
    assert os.path.exists(os.path.join(cfg.output_dir, "train.csv"))
    from visitron_tpu.train.checkpoint import CheckpointManager
    first = CheckpointManager(cfg.output_dir).latest()
    assert first is not None
    import jax

    def check_shardings(st):
        assert jax.tree.leaves(st["params"])[0].sharding.is_fully_replicated
        big = max(jax.tree.leaves(st["opt_state"]), key=lambda x: x.size)
        dp = 8 // 2  # mesh_sp=2 over the 8 virtual devices
        assert big.addressable_shards[0].data.size == big.size // dp

    check_shardings(state)
    cfg2 = _cfg(tmp_path, masked_token_prediction=True, num_epochs=2,
                mesh_sp=2, zero1=True, resume=True)
    state2 = runner.run_pretrain(cfg2)
    assert CheckpointManager(cfg.output_dir).latest() > first
    check_shardings(state2)


@pytest.mark.slow
def test_run_pretrain_context_parallel_debug(tmp_path, monkeypatch):
    """--mesh_cp 2: ring-attention context-parallel pretraining through the
    CLI.  Params stay replicated in the STANDARD layout, so checkpoints and
    --resume work identically to the plain trainer."""
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, masked_token_prediction=True, num_epochs=1,
               mesh_cp=2)
    state = runner.run_pretrain(cfg)
    assert os.path.exists(os.path.join(cfg.output_dir, "train.csv"))
    from visitron_tpu.train.checkpoint import CheckpointManager
    first = CheckpointManager(cfg.output_dir).latest()
    assert first is not None
    import jax

    assert jax.tree.leaves(state["params"])[0].sharding.is_fully_replicated
    cfg2 = _cfg(tmp_path, masked_token_prediction=True, num_epochs=2,
                mesh_cp=2, resume=True)
    state2 = runner.run_pretrain(cfg2)
    assert CheckpointManager(cfg.output_dir).latest() > first
    assert jax.tree.leaves(state2["params"])[0].sharding.is_fully_replicated


@pytest.mark.slow
def test_run_pretrain_fsdp_debug(tmp_path, monkeypatch):
    """--fsdp: ZeRO-3 pretraining through the CLI — params AND moments
    dp-sharded across the whole run, and --resume restores both back onto
    their dp shards (run.py restores to the template state's shardings)."""
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, masked_token_prediction=True, num_epochs=1, fsdp=True)
    state = runner.run_pretrain(cfg)
    assert os.path.exists(os.path.join(cfg.output_dir, "train.csv"))
    from visitron_tpu.train.checkpoint import CheckpointManager
    first = CheckpointManager(cfg.output_dir).latest()
    assert first is not None
    import jax

    def check_shardings(st):
        for tree in (st["params"], st["opt_state"]):
            big = max(jax.tree.leaves(tree), key=lambda x: x.size)
            assert big.addressable_shards[0].data.size == big.size // 8

    check_shardings(state)
    cfg2 = _cfg(tmp_path, masked_token_prediction=True, num_epochs=2,
                fsdp=True, resume=True)
    state2 = runner.run_pretrain(cfg2)
    assert CheckpointManager(cfg.output_dir).latest() > first
    check_shardings(state2)


def test_cli_overrides_include_explicit_defaults():
    """A flag explicitly set to its default value still overrides a config
    file; unpassed flags do not."""
    ov = RunConfig.cli_overrides(["--num_iterations", "20000", "--add_r2r_data"])
    assert ov == {"num_iterations": 20000, "add_r2r_data": True}
    assert RunConfig.cli_overrides([]) == {}
    import dataclasses
    base = RunConfig(num_iterations=7)
    assert dataclasses.replace(base, **ov).num_iterations == 20000


@pytest.mark.slow
def test_run_viewpoint_mesh_cli(tmp_path, monkeypatch):
    """--mesh_dp 8 from the CLI puts nav fine-tuning on the device mesh:
    trained params replicated over all 8 (virtual) devices."""
    import jax
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, mesh_dp=8, num_iterations=2, saving_steps=2,
               feedback_method="teacher")
    state = runner.run_viewpoint(cfg, do_val=False)
    leaves = jax.tree.leaves(state["params"])
    assert all(l.sharding.is_fully_replicated for l in leaves)
    assert all(len(l.sharding.device_set) == 8 for l in leaves)


@pytest.mark.slow
def test_classifier_inits_from_nav_checkpoint(tmp_path, monkeypatch):
    """run_classifier with --model_name_or_path pointing at a fine-tuned nav
    run loads its encoder + shared decoder weights; the question head stays
    fresh (train_classifier.py:129, classifier/agent.py:699-711)."""
    import flax
    import jax
    from visitron_tpu import run as runner
    from visitron_tpu.train.classifier import ClassifierTrainer

    _tiny_bert(monkeypatch)
    nav_dir = str(tmp_path / "nav")
    nav_cfg = _cfg(tmp_path, output_dir=nav_dir, num_iterations=2,
                   saving_steps=2, feedback_method="teacher")
    nav_state = runner.run_viewpoint(nav_cfg, do_val=False)

    cls_cfg = _cfg(tmp_path, output_dir=str(tmp_path / "cls"),
                   model_name_or_path=nav_dir, num_iterations=2)
    ws = runner._workspace_for_nav(cls_cfg)
    trainer = ClassifierTrainer(cls_cfg, ws)
    state = trainer.init_state()

    nav_dec = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, nav_state["params"]["decoder"]["params"]))
    cls_dec = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state["params"]["decoder"]["params"]))
    shared = [k for k in nav_dec if k in cls_dec]
    assert shared, "no shared decoder keys"
    for k in shared:
        np.testing.assert_array_equal(nav_dec[k], cls_dec[k])
    fresh = [k for k in cls_dec if k not in nav_dec]
    assert any("question_linear" in "/".join(k) for k in fresh)
    # Encoder grafted wholesale.
    nav_enc = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, nav_state["params"]["encoder"]))
    cls_enc = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state["params"]["encoder"]))
    assert set(nav_enc) == set(cls_enc)
    for k in nav_enc:
        np.testing.assert_array_equal(nav_enc[k], cls_enc[k])


@pytest.mark.slow
def test_run_pretrain_resume(tmp_path, monkeypatch):
    """Interrupted pretraining resumes at the recorded step with restored
    optimizer state instead of restarting epoch 0."""
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, masked_token_prediction=True, num_epochs=1)
    runner.run_pretrain(cfg)
    from visitron_tpu.train.checkpoint import CheckpointManager
    first = CheckpointManager(cfg.output_dir).latest()
    assert first is not None
    cfg2 = _cfg(tmp_path, masked_token_prediction=True, num_epochs=2, resume=True)
    runner.run_pretrain(cfg2)
    assert CheckpointManager(cfg.output_dir).latest() > first


@pytest.mark.slow
def test_run_viewpoint_rl(tmp_path, monkeypatch):
    """--feedback_method rl trains A2C end-to-end from the CLI; the saved
    checkpoint carries the critic and val still scores it (raw restore)."""
    from visitron_tpu import run as runner

    _tiny_bert(monkeypatch)
    cfg = _cfg(tmp_path, feedback_method="rl", num_iterations=2, saving_steps=2)
    state = runner.run_viewpoint(cfg, do_val=True)
    assert "critic" in state["params"]
    assert os.path.exists(os.path.join(cfg.output_dir, "val.csv"))


def test_check_finite_guard():
    """Divergence fail-fast: a NaN/inf loss at the logging boundary aborts
    with the iteration number instead of silently training on garbage."""
    import logging

    from visitron_tpu.train.logging import check_finite

    log = logging.getLogger("test_check_finite")
    assert check_finite(1.25, 3, log) == 1.25
    for bad in (float("nan"), float("inf"), float("-inf")):
        with pytest.raises(FloatingPointError, match="iteration 7"):
            check_finite(bad, 7, log)


@pytest.mark.slow
def test_viewpoint_nan_loss_aborts(tmp_path, monkeypatch):
    """A train step returning NaN aborts the run at the next logging boundary
    (the existing fetch point — the guard adds no extra device sync)."""
    import jax.numpy as jnp

    from visitron_tpu.agents import ViewpointAgent
    from visitron_tpu.train.finetune import ViewpointTrainer
    from visitron_tpu.train.workspace import Workspace
    import visitron_tpu.train.workspace as wsmod
    from visitron_tpu.models import BertConfig

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))
    orig = ViewpointAgent.train_step_fn

    def poisoned(self):
        step = orig(self)

        def wrapped(state, batch):
            state, loss = step(state, batch)
            return state, loss * jnp.nan

        return wrapped

    monkeypatch.setattr(ViewpointAgent, "train_step_fn", poisoned)
    cfg = _cfg(tmp_path, feedback_method="teacher", logging_steps=2)
    trainer = ViewpointTrainer(cfg, Workspace.synthetic_workspace(cfg))
    with pytest.raises(FloatingPointError, match="iteration 2"):
        trainer.train()
