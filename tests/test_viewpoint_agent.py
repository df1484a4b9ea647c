"""Viewpoint agent: teacher rollouts on device, student rollouts, eval wiring."""


import jax
import numpy as np
import pytest

from visitron_tpu import geometry as geo
from visitron_tpu.agents import NavRuntime, ViewpointAgent
from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.data import SceneFeatureTable, WordPieceTokenizer, build_wordpiece_vocab
from visitron_tpu.data.datasets import build_nav_instances
from visitron_tpu.evaluation import Evaluator
from visitron_tpu.models import BertConfig

SEQ = 64
EP_LEN = 10


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
def instances(tmp_path_factory, world, tok):
    root = world.write_task_data(str(tmp_path_factory.mktemp("nav")))
    return build_nav_instances(root, ["train"], tok, max_seq_length=SEQ), root


@pytest.fixture(scope="module")
def agent(world, runtime, tok):
    cfg = BertConfig(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=SEQ,
        type_vocab_size=4)
    return ViewpointAgent(
        cfg, runtime, feature_dim=world.scene_feat_dim, episode_len=EP_LEN,
        rnn_dim=24, encoder_hidden_size=16, aemb=8, max_seq_length=SEQ,
        learning_rate=1e-3)


@pytest.fixture(scope="module")
def batcher(instances, runtime):
    inst, _ = instances
    return NavEpisodeBatcher(inst, runtime, batch_size=4, path_type="trusted_path")


def test_teacher_rollout_arrays_follow_shortest_path(world, runtime, batcher):
    batch = next(batcher.train_batches(1, episode_len=EP_LEN))
    b, t = batch["cur_row"].shape
    assert t == EP_LEN
    for i in range(b):
        scan = batch["scans"][i]
        g = world.graphs[scan]
        off = runtime.feat_table.scan_offsets[scan]
        goal = int(batch["goal_rows"][i]) - off
        rows = batch["cur_row"][i] - off
        active = batch["active"][i]
        # Distance to goal is strictly decreasing while active and moving.
        dists = [g.dist[r, goal] for r in rows]
        started = int(batch["start_rows"][i]) - off
        assert rows[0] == started
        last_active = int(active.sum()) - 1
        # At the last active step the teacher is the stop slot.
        final_row = rows[last_active]
        assert final_row == goal
        assert batch["teacher"][i, last_active] == runtime.count_h[int(batch["cur_row"][i, last_active])]
        for a, d1, d2 in zip(active[:-1], dists[:-1], dists[1:]):
            if a:
                assert d2 <= d1 + 1e-6


@pytest.mark.slow
def test_train_step_decreases_loss(agent, batcher):
    state = agent.init_state()
    step = agent.train_step_fn()
    batch = next(batcher.train_batches(1, episode_len=EP_LEN))
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    losses = []
    for _ in range(10):
        state, loss = step(state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    # Eval loss (teacher-forced, deterministic) finite.
    ev = agent.eval_loss_fn(use_dropout=False)
    val = float(ev(state["params"], jb, jax.random.PRNGKey(0)))
    assert np.isfinite(val)


def test_student_rollout_trajectories_valid(world, agent, batcher):
    state = agent.init_state()
    batch = next(batcher.eval_batches())
    traj = agent.rollout_student(state["params"], batch, feedback="argmax")
    assert len(traj) == 4
    for tr in traj:
        path = tr["path"]
        assert 1 <= len(path) <= EP_LEN + 1
        scan = world.graphs[[s for s in world.scans
                             if path[0][0] in world.graphs[s].index][0]]
        for (a, _, _), (b, _, _) in zip(path[:-1], path[1:]):
            assert scan.adjacency[scan.index[a], scan.index[b]]


def test_student_rollout_sample_feedback(agent, batcher):
    state = agent.init_state()
    batch = next(batcher.eval_batches())
    t1 = agent.rollout_student(state["params"], batch, feedback="sample",
                               rng=jax.random.PRNGKey(0))
    t2 = agent.rollout_student(state["params"], batch, feedback="sample",
                               rng=jax.random.PRNGKey(7))
    paths1 = [t["path"] for t in t1]
    paths2 = [t["path"] for t in t2]
    assert paths1 != paths2  # sampling varies with rng


def test_submit_mode_avoids_revisits(agent, batcher):
    state = agent.init_state()
    batch = next(batcher.eval_batches())
    for tr in agent.rollout_student(state["params"], batch, feedback="argmax",
                                    submit=True):
        vps = [p[0] for p in tr["path"]]
        assert len(vps) == len(set(vps))  # no cycles


def test_test_loop_and_evaluator(world, agent, batcher, instances):
    inst, root = instances
    state = agent.init_state()
    results = agent.test(state["params"], batcher.eval_batches(), feedback="argmax")
    assert set(results.keys()) == {it.inst_idx for it in inst}
    ev = Evaluator([it.raw for it in inst if isinstance(it.inst_idx, int)],
                   world.graphs, path_type="trusted_path")
    ndh_results = {k: v for k, v in results.items() if isinstance(k, int)}
    summary, _ = ev.score_results(ndh_results)
    assert np.isfinite(summary["dist_to_end_reduction"])
    assert 0.0 <= summary["success_rate"] <= 1.0


@pytest.mark.slow
def test_teacher_training_reaches_goal(world, agent, batcher, instances):
    """After overfitting on a tiny set, argmax rollouts should reach goals
    (the decisive end-to-end signal that supervision/rollout wiring agree)."""
    inst, _ = instances
    state = agent.init_state()
    step = agent.train_step_fn()
    batches = list(batcher.train_batches(4, episode_len=EP_LEN))
    jbs = [{k: np.asarray(v) for k, v in b.items() if not isinstance(v, list)}
           for b in batches]
    for epoch in range(200):
        for jb in jbs:
            state, loss = step(state, jb)
        if float(loss) < 0.15:  # overfit achieved; stop early (wall time)
            break
    # Evaluate on the same items (overfit check).
    hits = 0
    total = 0
    for b in batches:
        trajs = agent.rollout_student(state["params"], b, feedback="argmax")
        for i, tr in enumerate(trajs):
            total += 1
            goal_scan, goal_vp = agent.runtime.row_to_id(int(b["goal_rows"][i]))
            if tr["path"][-1][0] == goal_vp:
                hits += 1
    assert hits / total > 0.5, f"only {hits}/{total} rollouts reached the goal"


def test_length_sort_window_groups_batches(instances, runtime):
    """Length-grouped shuffling: every instance still appears once per epoch,
    and within-batch length spread shrinks vs plain shuffling."""
    inst, _ = instances
    n_batches = max(2, len(inst) // 4)

    def spread(window):
        b = NavEpisodeBatcher(inst, runtime, batch_size=4,
                              length_sort_window=window, seed=3)
        seen, spreads = [], []
        for batch in b.train_batches(n_batches):
            seen.extend(batch["inst_idx"])
            spreads.append(int(batch["lengths"].max() - batch["lengths"].min()))
        return seen, float(np.mean(spreads))

    seen_sorted, spread_sorted = spread(window=100)  # whole epoch sorted
    seen_plain, spread_plain = spread(window=1)
    # Epoch coverage is a permutation either way.
    assert sorted(seen_sorted[: len(inst)]) == sorted(seen_plain[: len(inst)])
    assert spread_sorted <= spread_plain


def test_bf16_adam_moments_trains(world, runtime, tok, batcher):
    """--bf16_adam_moments halves optimizer-state bytes and still learns."""
    cfg = BertConfig(
        vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=SEQ, type_vocab_size=4)
    ag = ViewpointAgent(
        cfg, runtime, feature_dim=world.scene_feat_dim, episode_len=EP_LEN,
        rnn_dim=24, encoder_hidden_size=16, aemb=8, max_seq_length=SEQ,
        learning_rate=1e-3, bf16_adam_moments=True)
    state = ag.init_state()
    import jax.numpy as jnp

    adam = state["opt_state"][1][0]
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam.mu))
    assert all(x.dtype == jnp.bfloat16 for x in jax.tree.leaves(adam.nu))
    step = ag.train_step_fn()
    batch = next(batcher.train_batches(1, episode_len=EP_LEN))
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    losses = []
    for _ in range(10):
        state, loss = step(state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
