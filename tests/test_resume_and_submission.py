"""Resume-from-checkpoint and test-submission flows (debug workspace)."""

import json
import os

import numpy as np
import pytest

from visitron_tpu.config import RunConfig
from visitron_tpu.models import BertConfig


@pytest.fixture()
def tiny_bert(monkeypatch):
    import visitron_tpu.train.workspace as wsmod

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=64,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))


def _cfg(tmp_path, **kw):
    base = dict(debug=True, output_dir=str(tmp_path / "out"),
                max_seq_length=64, max_img_seq_length=32,
                lstm_img_feature_dim=48, img_feature_dim=56,
                encoder_hidden_size=16, rnn_dim=24, aemb=8,
                num_iterations=4, logging_steps=2, saving_steps=2,
                per_gpu_train_batch_size=1, per_gpu_eval_batch_size=4,
                path_type="planner_path", use_bfloat16=False)
    base.update(kw)
    return RunConfig(**base)


@pytest.mark.slow
def test_resume_and_submission(tmp_path, tiny_bert):
    from visitron_tpu.train.finetune import ViewpointTrainer
    from visitron_tpu.train.workspace import Workspace

    cfg = _cfg(tmp_path)
    ws = Workspace.synthetic_workspace(cfg)
    trainer = ViewpointTrainer(cfg, ws)
    trainer.train()
    assert trainer.ckpt.latest() == 4
    # Resume continues counting from the checkpoint.
    cfg2 = _cfg(tmp_path, num_iterations=6)
    trainer2 = ViewpointTrainer(cfg2, ws)
    trainer2.train(resume=True)
    assert trainer2.ckpt.latest() == 6

    # Test-split submission file (synthetic worlds reuse val counts).
    path = trainer2.test_submission(split="val_seen")
    data = json.loads(open(path).read())
    assert data and {"inst_idx", "trajectory"} <= set(data[0].keys())
    # submit mode: no revisited viewpoints
    for item in data:
        vps = [p[0] for p in item["trajectory"]]
        assert len(vps) == len(set(vps))
