"""End-to-end pretraining slice: datagen -> dataset -> sharded train step."""

import math

import jax
import numpy as np
import pytest

from visitron_tpu import geometry as geo
from visitron_tpu.data import RegionFeatureStore, WordPieceTokenizer, build_wordpiece_vocab
from visitron_tpu.data.candidates import build_candidate_tables
from visitron_tpu.data.pretrain_dataset import PretrainDataset
from visitron_tpu.models import BertConfig
from visitron_tpu.parallel import make_mesh
from visitron_tpu.pipelines.pretrain_datagen import (
    generate_pretrain_examples,
    walk_path_examples,
)
from visitron_tpu.sim import make_simulator
from visitron_tpu.train.checkpoint import CheckpointManager
from visitron_tpu.train.pretrain import PretrainTrainer

HFOV = geo.camera_hfov(640, 480, math.radians(60))


@pytest.fixture(scope="module")
def tables(world):
    return build_candidate_tables(world.graphs, HFOV)


@pytest.fixture(scope="module")
def tok(world):
    from visitron_tpu.testing.synthetic import _WORDS, _TARGETS
    vocab = build_wordpiece_vocab([" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512)
    return WordPieceTokenizer(vocab)


@pytest.fixture(scope="module")
def records(tmp_path_factory, world, tables):
    root = world.write_task_data(str(tmp_path_factory.mktemp("data")))
    recs = generate_pretrain_examples(root, ["train"], "NDH", world.graphs, tables)
    assert recs
    return recs


def test_walk_matches_simulator(world, tables):
    """The closed-form walk must agree with driving the simulator through
    goToNextViewpoint (generate_pretraining_data.py:152-186)."""
    sim = make_simulator(world.graphs, batch_size=1, prefer_native=False)
    g = world.graphs[world.scans[0]]
    rng = np.random.default_rng(0)
    for _ in range(5):
        u, v = rng.integers(g.num_viewpoints, size=2)
        if u == v:
            continue
        path = g.shortest_path(int(u), int(v))
        if len(path) < 2:
            continue
        heading = float(rng.uniform(0, 2 * np.pi))
        steps = walk_path_examples(g, tables[g.scan], path, heading, 0.0)
        sim.new_episode([g.scan], [path[0]], [heading], [0.0])
        for i, step in enumerate(steps):
            state = sim.get_states()[0]
            assert state.location.viewpointId == path[i]
            assert state.viewIndex == step["current_view_index"], (i, path)
            # Drive the sim like goToNextViewpoint.
            trg = step["target_abs_view_index"]
            src_level, trg_level = state.viewIndex // 12, trg // 12
            while src_level < trg_level:
                sim.make_action([0], [0.0], [1.0]); src_level += 1
            while src_level > trg_level:
                sim.make_action([0], [0.0], [-1.0]); src_level -= 1
            while sim.get_states()[0].viewIndex != trg:
                sim.make_action([0], [1.0], [0.0])
            nav = sim.get_states()[0].navigableLocations
            idx = [l.viewpointId for l in nav].index(path[i + 1])
            sim.make_action([idx], [0.0], [0.0])
        assert sim.get_states()[0].location.viewpointId == path[-1]


def test_records_have_labels(records):
    for r in records[:20]:
        assert 0 <= r["target_rel_view_index"] < 36
        assert 0 <= r["target_abs_view_index"] < 36
        assert r["inst_idx"].startswith("ndh_")


@pytest.fixture(scope="module")
def dataset(world, records, tok):
    feats, tokens = world.region_features()
    store = RegionFeatureStore(feats, tokens)
    return PretrainDataset(
        records[:16], tok, region_store=store,
        detector_classes=sorted({t for v in tokens.values() for t in v}),
        masked_token_prediction=True,
        max_seq_length=96, max_img_seq_length=64,
        region_feat_dim=world.region_feat_dim, seed=0,
    )


def test_dataset_batch_shapes(dataset, world):
    b = dataset.batch(range(4))
    assert b["input_ids"].shape == (4, 96)
    assert b["attention_mask"].shape == (4, 160)
    assert b["labels"].shape == (4, 160)
    assert b["img_feats"].shape == (4, 64, world.region_feat_dim)
    assert b["img_location_embeddings"].shape == (4, 64, 128)
    assert (b["next_action"] >= 0).all() and (b["next_action"] < 36).all()
    # Masking: some labels set, all at text positions.
    assert (b["labels"][:, :96] != -1).sum() > 0
    assert (b["labels"][:, 96:] == -1).all()
    # Dynamic masking differs between epochs.
    b2 = dataset.batch(range(4))
    assert not np.array_equal(b["input_ids"], b2["input_ids"])


def test_mtp_forces_region_token_masking(dataset):
    b = dataset.batch(range(4))
    region = b["token_labels"][:, :96] != -1
    assert region.sum() > 0
    mask_id = dataset.tokenizer.mask_token_id
    assert (b["input_ids"][region] == mask_id).all()
    # Region tokens excluded from MLM labels.
    assert (b["labels"][:, :96][region] == -1).all()


@pytest.mark.slow
def test_pretrain_train_step_runs_and_learns(dataset, tmp_path):
    cfg = BertConfig(
        vocab_size=len(dataset.tokenizer), hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64, max_position_embeddings=96,
        type_vocab_size=4, img_feature_dim=dataset.region_feat_dim,
        action_space=36, detector_classes=len(dataset.class2id),
    )
    mesh = make_mesh(dp=8)
    trainer = PretrainTrainer(cfg, mesh=mesh, total_steps=1000, schedule="constant",
                              learning_rate=3e-4)
    # Fixed batch (dynamic masking resamples per call, so sample once).
    batch = dataset.batch(range(8))
    state = trainer.init_state(batch)
    step = trainer.step_fn()
    losses = []
    for i in range(12):
        state, bundle = step(state, batch)
        losses.append(float(bundle["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]  # learning on a repeated batch

    metrics = trainer.evaluate(state["params"], dataset, batch_size=8)
    assert np.isfinite(metrics["loss"])

    ckpt = CheckpointManager(str(tmp_path / "out"))
    ckpt.save(10, state["params"], state["opt_state"], extra={"note": "test"})
    assert ckpt.steps() == [10]
    restored = ckpt.restore(10, {"params": state["params"], "opt_state": state["opt_state"]})
    leaf = jax.tree.leaves(restored["params"])[0]
    orig = jax.tree.leaves(state["params"])[0]
    np.testing.assert_allclose(np.asarray(leaf), np.asarray(orig))
