"""On-device eval rollout must exactly match the host-loop rollout."""

import jax
import numpy as np
import pytest

from visitron_tpu.agents import NavRuntime, ViewpointAgent
from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.data import SceneFeatureTable, WordPieceTokenizer, build_wordpiece_vocab
from visitron_tpu.data.datasets import build_nav_instances
from visitron_tpu.models import BertConfig

SEQ = 64


@pytest.fixture(scope="module")
def setup(tmp_path_factory, world):
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS

    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))
    root = world.write_task_data(str(tmp_path_factory.mktemp("dr")))
    inst = build_nav_instances(root, ["train"], tok, max_seq_length=SEQ)
    cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=SEQ, type_vocab_size=4)
    agent = ViewpointAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                           episode_len=8, rnn_dim=24, encoder_hidden_size=16,
                           aemb=8, max_seq_length=SEQ)
    batcher = NavEpisodeBatcher(inst, runtime, batch_size=4, path_type="trusted_path")
    return agent, batcher


def test_device_rollout_matches_host_loop(setup):
    agent, batcher = setup
    state = agent.init_state()
    for batch in list(batcher.eval_batches())[:2]:
        host = agent.rollout_student(state["params"], batch, feedback="argmax")
        dev = agent.rollout_student_on_device(state["params"], batch, feedback="argmax")
        for h, d in zip(host, dev):
            assert h["inst_idx"] == d["inst_idx"]
            assert [p[0] for p in h["path"]] == [p[0] for p in d["path"]]
            for (_, hh, he), (_, dh, de) in zip(h["path"], d["path"]):
                assert abs(hh - dh) < 1e-9 and abs(he - de) < 1e-9


def test_test_loop_uses_device_rollout(setup):
    agent, batcher = setup
    state = agent.init_state()
    res_dev = agent.test(state["params"], batcher.eval_batches(), feedback="argmax")
    # Reference host path (submit mode forces it) produces valid trajectories too.
    res_host = agent.test(state["params"], batcher.eval_batches(), feedback="argmax",
                          submit=True)
    assert set(res_dev) == set(res_host)
