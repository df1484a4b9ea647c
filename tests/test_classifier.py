"""Question-asking classifier: dataset snapshots, frozen-encoder training."""

import functools

import jax
import numpy as np
import pytest

from visitron_tpu.agents import NavRuntime
from visitron_tpu.agents.classifier import ClassifierAgent, bce_with_logits
from visitron_tpu.data import SceneFeatureTable, WordPieceTokenizer, build_wordpiece_vocab
from visitron_tpu.data.classifier_dataset import build_classifier_instances
from visitron_tpu.models import BertConfig

SEQ = 64
EP_LEN = 12


@pytest.fixture(scope="module")
def runtime(world):
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    return NavRuntime.build(world.graphs, table)


@pytest.fixture(scope="module")
def instances(tmp_path_factory, world):
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))
    root = world.write_task_data(str(tmp_path_factory.mktemp("clf")))
    return build_classifier_instances(root, ["train"], tok, max_seq_length=SEQ), tok


def test_instances_snapshots(instances):
    inst, _ = instances
    assert inst
    for it in inst:
        assert it.token_ids.shape[0] == it.max_timestep + 1
        assert 0 in it.request_locations
        # Snapshot lengths are monotonically nondecreasing over timesteps.
        assert all(it.lengths[a] <= it.lengths[b]
                   for a, b in zip(range(len(it.lengths) - 1), range(1, len(it.lengths))))


def test_bce_pos_weight():
    import torch
    logits = np.array([[0.3, -1.2], [2.0, 0.0]], np.float32)
    targets = np.array([[1.0, 0.0], [0.0, 1.0]], np.float32)
    ours = np.asarray(bce_with_logits(logits, targets, 5.0))
    crit = torch.nn.BCEWithLogitsLoss(pos_weight=torch.tensor([5.0]), reduction="none")
    theirs = crit(torch.from_numpy(logits), torch.from_numpy(targets)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-6)


@pytest.fixture(scope="module")
def agent_and_batch(world, runtime, instances):
    inst, tok = instances
    cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=SEQ, type_vocab_size=4)
    agent = ClassifierAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                            episode_len=EP_LEN, rnn_dim=24, encoder_hidden_size=16,
                            aemb=8, max_seq_length=SEQ, learning_rate=1e-3,
                            only_finetune_classifier=True)
    batch = agent.prepare_batch(inst[:4])
    return agent, batch, inst


def test_prepare_batch_targets(agent_and_batch):
    agent, batch, inst = agent_and_batch
    b, t = batch["qa_target"].shape
    assert t == EP_LEN
    for i, it in enumerate(inst[:4]):
        for step in range(t):
            if not batch["qa_ignore"][i, step]:
                expect = 1.0 if (step + 1) in it.request_locations else 0.0
                assert batch["qa_target"][i, step] == expect
    # step2event is monotone, starts at event 0.
    s2e = batch["step2event"]
    assert s2e[0] == 0 and (np.diff(s2e) >= 0).all()


def test_classifier_training_only_updates_question_head(agent_and_batch):
    agent, batch, _ = agent_and_batch
    state = agent.init_state()
    step = agent.train_step_fn()
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    import flax
    before = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state["params"]["decoder"]["params"]))
    losses = []
    for _ in range(10):
        state, loss = step(state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    after = flax.traverse_util.flatten_dict(
        jax.tree.map(np.asarray, state["params"]["decoder"]["params"]))
    for k in before:
        name = "/".join(k)
        if "question_linear" in name:
            assert not np.allclose(before[k], after[k]), name
        else:
            np.testing.assert_array_equal(before[k], after[k], err_msg=name)


def test_classifier_learns_when_unfrozen(world, runtime, instances):
    inst, tok = instances
    cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=SEQ, type_vocab_size=4)
    agent = ClassifierAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                            episode_len=EP_LEN, rnn_dim=24, encoder_hidden_size=16,
                            aemb=8, max_seq_length=SEQ, learning_rate=3e-4,
                            dropout=0.0, only_finetune_classifier=False)
    batch = agent.prepare_batch(inst[:4])
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    state = agent.init_state()
    step = agent.train_step_fn()
    det = jax.jit(lambda p, rt: agent.loss_fn(rt, p, jb, jax.random.PRNGKey(0),
                                              True)[0])
    det = functools.partial(det, rt=agent.runtime)
    before = float(det(state["params"]))
    for _ in range(60):
        state, _ = step(state, jb)
    assert float(det(state["params"])) < before


def test_classifier_evaluate_metrics(agent_and_batch):
    agent, batch, _ = agent_and_batch
    state = agent.init_state()
    metrics = agent.evaluate(state["params"], [batch])
    for k in ["accuracy", "f1", "balanced_accuracy", "mcc", "loss"]:
        assert np.isfinite(metrics[k])


def test_load_nav_decoder_merge(world, runtime, instances):
    inst, tok = instances
    cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=SEQ, type_vocab_size=4)
    from visitron_tpu.agents import ViewpointAgent
    nav = ViewpointAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                         rnn_dim=24, encoder_hidden_size=16, aemb=8,
                         max_seq_length=SEQ)
    nav_state = nav.init_state()
    clf = ClassifierAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                          episode_len=EP_LEN, rnn_dim=24, encoder_hidden_size=16,
                          aemb=8, max_seq_length=SEQ)
    clf_state = clf.init_state()
    merged = clf.load_nav_decoder(clf_state["params"], nav_state["params"]["decoder"])
    import flax
    nav_flat = flax.traverse_util.flatten_dict(nav_state["params"]["decoder"]["params"])
    out_flat = flax.traverse_util.flatten_dict(merged["decoder"]["params"])
    for k, v in nav_flat.items():
        np.testing.assert_array_equal(np.asarray(out_flat[k]), np.asarray(v))
    assert any("question_linear" in "/".join(k) for k in out_flat)
