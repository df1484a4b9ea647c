"""Preemption-safe training: SIGTERM latches -> checkpoint at the step
boundary -> exact-schedule resume.

The reference stack has no preemption story (param-only checkpoints, only
every saving_steps, train.py:151-163); these tests pin the TPU-era
contract: a termination signal never interrupts a step or an orbax write,
always leaves a full params+opt_state checkpoint at the exact iteration,
and ``--resume`` continues both the optimizer state and the data schedule.
"""

import signal
import threading

import pytest

from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.config import RunConfig
from visitron_tpu.train.preemption import PreemptionGuard


def test_guard_latches_chains_and_restores():
    seen = []

    def prev(signum, frame):
        seen.append(signum)

    old = signal.signal(signal.SIGTERM, prev)
    try:
        with PreemptionGuard() as guard:
            assert not guard.fired
            signal.raise_signal(signal.SIGTERM)
            assert guard.fired
            # The pre-existing callable handler is chained.
            assert seen == [signal.SIGTERM]
        # Original handler restored on exit.
        assert signal.getsignal(signal.SIGTERM) is prev
    finally:
        signal.signal(signal.SIGTERM, old)


def test_guard_inert_off_main_thread():
    out = {}

    def body():
        with PreemptionGuard() as g:
            out["fired"] = g.fired

    t = threading.Thread(target=body)
    t.start()
    t.join()
    assert out == {"fired": False}


def _nav_setup(world, tmp_path_factory):
    from visitron_tpu.agents import NavRuntime
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS

    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))
    root = world.write_task_data(str(tmp_path_factory.mktemp("preempt")))
    inst = build_nav_instances(root, ["train"], tok, max_seq_length=64)
    return inst, runtime


def test_skip_batches_continues_schedule(world, tmp_path_factory):
    """A fresh batcher that skips k batches yields exactly the batches an
    uninterrupted batcher yields after k draws (exact-schedule resume)."""
    inst, runtime = _nav_setup(world, tmp_path_factory)
    k, n = 3, 4
    a = NavEpisodeBatcher(inst, runtime, batch_size=4, path_type="trusted_path")
    uninterrupted = [b["inst_idx"] for b in a.train_batches(k + n)][k:]
    b = NavEpisodeBatcher(inst, runtime, batch_size=4, path_type="trusted_path")
    b.skip_batches(k)
    resumed = [bt["inst_idx"] for bt in b.train_batches(n)]
    assert resumed == uninterrupted


def _cfg(tmp_path, **kw):
    base = dict(debug=True, output_dir=str(tmp_path / "out"),
                max_seq_length=64, max_img_seq_length=32,
                lstm_img_feature_dim=48, img_feature_dim=56,
                encoder_hidden_size=16, rnn_dim=24, aemb=8,
                num_iterations=4, logging_steps=2, saving_steps=10,
                per_gpu_train_batch_size=2, per_gpu_eval_batch_size=4,
                path_type="planner_path", use_bfloat16=False)
    base.update(kw)
    return RunConfig(**base)


@pytest.fixture()
def tiny_bert(monkeypatch):
    import visitron_tpu.train.workspace as wsmod
    from visitron_tpu.models import BertConfig

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))


@pytest.mark.slow
def test_viewpoint_sigterm_checkpoints_and_resumes(tmp_path, tiny_bert, monkeypatch):
    """SIGTERM mid-training: the trainer finishes the in-flight step, writes
    checkpoint-<it> (off the saving_steps grid), stops cleanly; --resume
    completes the run with checkpoints continuing from the exact step."""
    from visitron_tpu.agents import ViewpointAgent
    from visitron_tpu.train.finetune import ViewpointTrainer
    from visitron_tpu.train.workspace import Workspace

    total = {"n": 0}
    orig = ViewpointAgent.train_step_fn

    def firing(self):
        step = orig(self)

        def wrapped(state, batch):
            out = step(state, batch)
            total["n"] += 1
            if total["n"] == 2:  # fire once, during the first run only
                signal.raise_signal(signal.SIGTERM)
            return out

        return wrapped

    monkeypatch.setattr(ViewpointAgent, "train_step_fn", firing)
    # teacher feedback -> the trainer uses train_step_fn (the patched hook);
    # saving_steps=10: no scheduled save before iter 4.
    cfg = _cfg(tmp_path, feedback_method="teacher")
    ws = Workspace.synthetic_workspace(cfg)
    trainer = ViewpointTrainer(cfg, ws)
    trainer.train()
    assert trainer.ckpt.steps() == [2]  # preemption checkpoint, exact iter
    # run.py checks this to skip the val sweep inside the grace window.
    assert trainer.preempted

    trainer2 = ViewpointTrainer(_cfg(tmp_path, feedback_method="teacher"), ws)
    state = trainer2.train(resume=True)
    assert trainer2.ckpt.steps() == [2, 4]
    assert total["n"] == 4  # 2 steps before preemption + 2 after resume
    assert state is not None
    assert not trainer2.preempted


@pytest.mark.slow
def test_pretrain_sigterm_mid_epoch_resume(tmp_path, tiny_bert, monkeypatch, caplog):
    """Pretraining preempted mid-epoch writes checkpoint-<it> and --resume
    skips exactly the completed batches of the in-progress epoch (the
    epoch-keyed shuffle is re-aligned via set_epoch)."""
    import logging

    from visitron_tpu import run as runner
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.pretrain import PretrainTrainer

    total = {"n": 0}
    orig = PretrainTrainer.step_fn

    def firing(self):
        step = orig(self)

        def wrapped(state, batch):
            out = step(state, batch)
            total["n"] += 1
            if total["n"] == 2:
                signal.raise_signal(signal.SIGTERM)
            return out

        return wrapped

    monkeypatch.setattr(PretrainTrainer, "step_fn", firing)
    cfg = _cfg(tmp_path, num_epochs=1, per_gpu_train_batch_size=1,
               masked_token_prediction=True)
    runner.run_pretrain(cfg)
    ckpt = CheckpointManager(cfg.output_dir)
    assert ckpt.steps() == [2]  # mid-epoch preemption checkpoint

    cfg2 = _cfg(tmp_path, num_epochs=1, per_gpu_train_batch_size=1,
                masked_token_prediction=True, resume=True)
    with caplog.at_level(logging.INFO, logger="visitron_tpu"):
        runner.run_pretrain(cfg2)
    assert any("skipping 2 completed batches" in r.getMessage()
               for r in caplog.records)
    final = ckpt.latest()
    assert final > 2  # finished the epoch from the exact step
    # 2 steps before preemption + the remainder after resume; no replay.
    assert total["n"] == final
