"""ZeRO-1 optimizer-state sharding over the dp mesh axis.

The reference replicates optimizer state per DDP rank (torch Adam); ZeRO-1
shards the moments over dp (parallel/mesh.py:zero1_opt_rules) with the
gradient slice / parameter-delta all-gather derived by the SPMD partitioner
— an optimizer-memory/HBM-traffic trade with bit-identical update math.
"""

import jax
import numpy as np
import pytest

from visitron_tpu.models import BertConfig
from visitron_tpu.parallel import make_mesh, make_sp_mesh, zero1_opt_rules
from visitron_tpu.train.pretrain import PretrainTrainer

from __graft_entry__ import _example_batch


def _small_cfg():
    return BertConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64, type_vocab_size=4,
                      img_feature_dim=32, action_space=36, detector_classes=8)


def _batch(n=8):
    cfg = _small_cfg()
    return _example_batch(n, 48, 16, cfg.vocab_size, cfg.img_feature_dim,
                          cfg.action_space, cfg.detector_classes,
                          np.random.default_rng(0))


def test_zero1_rules_shard_first_divisible_axis():
    mesh = make_mesh(dp=8)
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    tree = {
        "mu": jnp.zeros((512, 64)),       # dim0 divides dp
        "odd": jnp.zeros((30522, 64)),    # dim0 doesn't, dim1 does
        "tiny": jnp.zeros((3,)),          # nothing divides
        "count": jnp.zeros(()),           # scalar
    }
    rules = zero1_opt_rules(mesh, tree)
    assert rules["mu"].spec == P("dp", None)
    assert rules["odd"].spec == P(None, "dp")
    assert rules["tiny"].spec == P()
    assert rules["count"].spec == P()


def test_zero1_step_parity_and_sharding():
    """Two full steps under zero1 produce the same params as the replicated
    trainer; the moments live dp-sharded before AND after the step (the
    compiler must not silently re-replicate them), params stay replicated."""
    batch = _batch()
    plain = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=8), total_steps=10)
    z = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=8), total_steps=10,
                        zero1=True)
    ps, zs = plain.init_state(batch), z.init_state(batch)

    def biggest(state):
        return max(jax.tree.leaves(state["opt_state"]), key=lambda x: x.size)

    big = biggest(zs)
    assert big.addressable_shards[0].data.size == big.size // 8
    for _ in range(2):
        ps, pb = plain.step_fn()(ps, batch)
        zs, zb = z.step_fn()(zs, batch)
    assert np.isclose(float(pb["loss"]), float(zb["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(zs["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-6, atol=1e-7)
    big = biggest(zs)
    assert big.addressable_shards[0].data.size == big.size // 8
    assert jax.tree.leaves(zs["params"])[0].sharding.is_fully_replicated


def test_zero1_composes_with_sequence_parallelism():
    batch = _batch()
    trainer = PretrainTrainer(_small_cfg(), mesh=make_sp_mesh(dp=2, sp=4),
                              total_steps=10, zero1=True)
    state = trainer.init_state(batch)
    state, bundle = trainer.step_fn()(state, batch)
    assert np.isfinite(float(bundle["loss"]))
    big = max(jax.tree.leaves(state["opt_state"]), key=lambda x: x.size)
    # Moments shard over dp=2 only (sp axis untouched for optimizer state).
    assert big.addressable_shards[0].data.size == big.size // 2


def test_zero1_viewpoint_agent_parity():
    """The nav fine-tune agent under zero1: one teacher-forced train step
    matches the replicated agent; moments stay dp-sharded across steps."""
    import tempfile

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS

    world = SyntheticWorld(seed=5, num_scans=1, viewpoints_per_scan=12,
                           scene_feat_dim=16)
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    rt = NavRuntime.build(world.graphs, table)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))
    with tempfile.TemporaryDirectory() as d:
        world.write_task_data(d, counts={"train": 8})
        inst = build_nav_instances(d, ["train"], tok, max_seq_length=64)
    cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=4)

    def make(zero1):
        return ViewpointAgent(cfg, rt, feature_dim=16, episode_len=4,
                              rnn_dim=16, encoder_hidden_size=16, aemb=8,
                              max_seq_length=64, mesh=make_mesh(dp=8),
                              zero1=zero1)

    plain, z = make(False), make(True)
    batcher = NavEpisodeBatcher(inst, rt, batch_size=8,
                                path_type="planner_path")
    batch = next(batcher.train_batches(1, episode_len=4))
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    ps, zs = plain.init_state(), z.init_state()
    big = max(jax.tree.leaves(zs["opt_state"]), key=lambda x: x.size)
    assert big.addressable_shards[0].data.size == big.size // 8
    ps, pl = plain.train_step_fn()(ps, jb)
    zs, zl = z.train_step_fn()(zs, jb)
    assert np.isclose(float(pl), float(zl), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(zs["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-6, atol=1e-7)
    big = max(jax.tree.leaves(zs["opt_state"]), key=lambda x: x.size)
    assert big.addressable_shards[0].data.size == big.size // 8
    assert jax.tree.leaves(zs["params"])[0].sharding.is_fully_replicated


def test_zero1_cli_validation():
    from visitron_tpu.config import RunConfig

    with pytest.raises(ValueError):
        RunConfig(zero1=True, mesh_pp=2)
    assert RunConfig(zero1=True, mesh_sp=2).zero1
