"""Sequence parallelism (Ulysses-style, (dp, sp) mesh over the pretraining step).

The reference has no sequence parallelism (SURVEY §2.3: TP/PP/SP/EP absent);
this is the long-context scale-out axis: activations token-sharded between
layers, attention head-sharded inside each layer, the two all-to-alls per
layer inserted by the SPMD partitioner from sharding constraints
(models/bert.py:sp_constrain).  Parameters stay replicated, so checkpoints
are layout-identical to the plain trainer's.
"""

import dataclasses

import jax
import numpy as np
import pytest

from visitron_tpu.models import BertConfig, config_for_mesh
from visitron_tpu.parallel import make_mesh, make_sp_mesh, shard_batch
from visitron_tpu.train.pretrain import PretrainTrainer

from __graft_entry__ import _example_batch


def _small_cfg(**kw):
    return BertConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64, type_vocab_size=4,
                      img_feature_dim=32, action_space=36, detector_classes=8,
                      **kw)


def _batch(n=8, seq=48, img=16, seed=0):
    cfg = _small_cfg()
    return _example_batch(n, seq, img, cfg.vocab_size, cfg.img_feature_dim,
                          cfg.action_space, cfg.detector_classes,
                          np.random.default_rng(seed))


def test_sp_config_for_mesh():
    mesh = make_sp_mesh(dp=2, sp=4)
    cfg = _small_cfg(use_fused_attention=True, use_flash_attention=True)
    out = config_for_mesh(cfg, mesh)
    # The Pallas kernels stay reachable through their shard_map wrappers
    # (head axis = sp inside attention); XLA attention under the sp
    # constraints covers every shape the mesh gates reject (CPU included).
    assert out.sp_mesh is mesh
    assert out.attention_mesh is mesh
    # With the kernels disabled no attention_mesh is attached (pure XLA).
    plain = config_for_mesh(_small_cfg(use_fused_attention=False), mesh)
    assert plain.sp_mesh is mesh and plain.attention_mesh is None
    # Heads must divide the sp axis (attention shards the head dimension).
    bad = _small_cfg().replace(num_attention_heads=3)
    with pytest.raises(AssertionError):
        config_for_mesh(bad, mesh)
    # sp=1 meshes and plain meshes never attach sp_mesh.
    assert config_for_mesh(cfg, make_mesh(dp=8)).sp_mesh is None


def test_sp_pretrain_step_parity():
    """One full train step (fwd, loss, bwd, AdamW) under (dp=2, sp=4) matches
    the single-device trainer: same loss/metrics, same updated params."""
    batch = _batch()
    plain = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=1, tp=1),
                            total_steps=10)
    sp = PretrainTrainer(_small_cfg(), mesh=make_sp_mesh(dp=2, sp=4),
                         total_steps=10)
    ps, ss = plain.init_state(batch), sp.init_state(batch)
    # Identical seeds => identical initial parameters.
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(ss["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ps, pb = plain.step_fn()(ps, batch)
    ss, sb = sp.step_fn()(ss, batch)
    assert np.isclose(float(pb["loss"]), float(sb["loss"]), rtol=1e-5)
    assert np.isclose(float(pb["mask_loss"]), float(sb["mask_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(ss["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-4, atol=2e-6)
    # Params stay replicated — sp checkpoints load anywhere unchanged.
    leaf = jax.tree.leaves(ss["params"])[0]
    assert leaf.sharding.is_fully_replicated


def test_sp_program_is_sequence_sharded():
    """The compiled step genuinely reshards (all-to-all) instead of
    all-gathering the sequence; the MLM logits — the largest activation —
    come out token-sharded."""
    batch = _batch()
    mesh = make_sp_mesh(dp=2, sp=4)
    trainer = PretrainTrainer(_small_cfg(), mesh=mesh, total_steps=10)
    state = trainer.init_state(batch)
    db = shard_batch(mesh, batch)
    txt = trainer.raw_step_fn().lower(state, db).compile().as_text()
    # >= 2 all-to-alls per layer per direction; any regression to a
    # replicated program drops these to zero.
    assert txt.count("all-to-all") >= 4 * trainer.cfg.num_hidden_layers, (
        "sp step compiled without token<->head all-to-alls")

    # Forward-only probe: logits sharding honours the sp constraint.
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def fwd(params, b):
        out = trainer.model.apply(
            params, b["input_ids"], token_type_ids=b["token_type_ids"],
            attention_mask=b["attention_mask"], img_feats=b["img_feats"],
            img_location_embeddings=b["img_location_embeddings"])
        return out["mlm_logits"]

    logits = fwd(state["params"], db)
    expect = NamedSharding(mesh, P("dp", "sp", None))
    assert logits.sharding.is_equivalent_to(expect, logits.ndim)
    # Per-device shard really is 1/(dp*sp) of the logits.
    shard = logits.addressable_shards[0].data
    assert shard.shape[0] == logits.shape[0] // 2
    assert shard.shape[1] == logits.shape[1] // 4


def test_cli_mesh_sp_flags():
    from visitron_tpu.config import RunConfig

    with pytest.raises(ValueError):
        RunConfig(mesh_sp=0)
    with pytest.raises(ValueError):
        RunConfig(mesh_sp=2, mesh_tp=2)
    with pytest.raises(ValueError):
        RunConfig(mesh_sp=2, mesh_pp=2)
    cfg = RunConfig(mesh_sp=2)
    assert cfg.mesh_sp == 2
