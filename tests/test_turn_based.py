"""Turn-based agent: teacher semantics, training, student rollout."""

import numpy as np
import pytest

from visitron_tpu import geometry as geo
from visitron_tpu.agents import NavRuntime
from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.agents.turn_based import END_ID, FORWARD_ID, TurnBasedAgent
from visitron_tpu.data import SceneFeatureTable, WordPieceTokenizer, build_wordpiece_vocab
from visitron_tpu.data.datasets import build_nav_instances
from visitron_tpu.models import BertConfig

SEQ = 64
EP_LEN = 24


@pytest.fixture(scope="module")
def runtime(world):
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    return NavRuntime.build(world.graphs, table)


@pytest.fixture(scope="module")
def tok():
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    return WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))


@pytest.fixture(scope="module")
def batcher(tmp_path_factory, world, tok, runtime):
    root = world.write_task_data(str(tmp_path_factory.mktemp("tb")))
    inst = build_nav_instances(root, ["train"], tok, max_seq_length=SEQ)
    return NavEpisodeBatcher(inst, runtime, batch_size=4, path_type="trusted_path")


def test_turn_teacher_terminates_at_goal_when_ended(world, runtime, batcher):
    """If the teacher episode terminates, it must be with <end> at the goal.

    (Termination is not guaranteed in general: 'forward' always moves to the
    most-centered neighbor — reference env_actions[4] == (1,0,0), see the
    'just the one in the middle' comment at turn_based/agent.py:70 — so on
    dense graphs the teacher can wander; the reference shares this quirk.)"""
    batch = next(batcher.train_batches(1))
    arrays = runtime.turn_based_rollout_arrays(
        batch["scans"], batch["start_rows"], batch["start_views"],
        batch["goal_rows"], 60)
    terminated = 0
    for i in range(len(batch["scans"])):
        active = arrays["active"][i]
        n_active = int(active.sum())
        last = n_active - 1
        if arrays["teacher"][i, last] == END_ID:
            terminated += 1
            assert arrays["cur_row"][i, last] == batch["goal_rows"][i]
    assert terminated >= 1


def test_turn_teacher_reaches_goal_on_line_graph():
    """On a line graph forward is unambiguous: the teacher must reach the
    goal and stop."""
    from tests.test_metrics import _line_graph
    from visitron_tpu.data.features import SceneFeatureTable as SFT

    g = _line_graph(n=6, spacing=2.0)
    graphs = {"line": g}
    table = SFT.zeros(graphs, feature_dim=8, vfov=60)
    rt = NavRuntime.build(graphs, table)
    arrays = rt.turn_based_rollout_arrays(
        ["line"], np.array([0]), np.array([0]), np.array([5]), 60)
    n_active = int(arrays["active"][0].sum())
    assert n_active < 60
    assert arrays["teacher"][0, n_active - 1] == END_ID
    assert arrays["cur_row"][0, n_active - 1] == 5


def test_turn_teacher_single_axis_moves(world, runtime, batcher):
    """Each teacher step moves one axis: heading +-30deg, elevation +-30deg,
    or a location change with pose fixed."""
    batch = next(batcher.train_batches(1))
    arrays = runtime.turn_based_rollout_arrays(
        batch["scans"], batch["start_rows"], batch["start_views"],
        batch["goal_rows"], 60)
    for i in range(len(batch["scans"])):
        rows, views = arrays["cur_row"][i], arrays["view"][i]
        for t in range(int(arrays["active"][i].sum()) - 1):
            a = arrays["teacher"][i, t]
            r0, v0, r1, v1 = rows[t], views[t], rows[t + 1], views[t + 1]
            if a == FORWARD_ID:
                assert r1 != r0 and v1 == v0
            elif a < 4:
                assert r1 == r0 and v1 != v0


def test_turn_based_training_and_rollout(world, runtime, batcher):
    cfg = BertConfig(vocab_size=600, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=SEQ, type_vocab_size=4)
    agent = TurnBasedAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                           episode_len=EP_LEN, rnn_dim=24, encoder_hidden_size=16,
                           max_seq_length=SEQ, learning_rate=1e-3)
    state = agent.init_state()
    step = agent.train_step_fn()
    batch = next(batcher.train_batches(1))
    batch = batcher.with_turn_teacher(batch, EP_LEN)
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    losses = []
    for _ in range(10):
        state, loss = step(state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all() and losses[-1] < losses[0]

    trajs = agent.rollout_student(state["params"], batch, feedback="argmax")
    for tr in trajs:
        path = tr["path"]
        assert len(path) >= 1
        # Consecutive entries either share the viewpoint (rotation) or are
        # graph neighbors (forward).
        scan = next(s for s in world.scans if path[0][0] in world.graphs[s].index)
        g = world.graphs[scan]
        for (a, _, _), (b, _, _) in zip(path[:-1], path[1:]):
            if a != b:
                assert g.adjacency[g.index[a], g.index[b]]
    results = agent.test(state["params"], batcher.eval_batches(), feedback="argmax")
    assert len(results) == len(batcher.instances)
