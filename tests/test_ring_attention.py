"""Ring-attention context parallelism ((dp, cp) mesh, K/V ppermute ring).

The reference has no context parallelism (SURVEY §2.3: TP/PP/SP/EP/CP all
absent); this is the long-context headroom axis past Ulysses sp: tokens stay
sharded through attention itself (per-device attention memory O((S/cp)^2)),
and — unlike sp — there is no head-count constraint, so cp scales with the
sequence rather than with num_heads.  ops/attention.py:ring_attention;
models/bert.py routes self-attention through it when cp_mesh is attached.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visitron_tpu.models import BertConfig, config_for_mesh
from visitron_tpu.ops.attention import (attention_supports_ring,
                                        hash_dropout_attention,
                                        multi_head_attention, ring_attention)
from visitron_tpu.ops.masking import make_attention_bias
from visitron_tpu.parallel import make_cp_mesh, make_mesh, shard_batch
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


def _qkv_bias(B=4, H=3, S=32, D=16, seed=0):
    # H=3 deliberately does NOT divide cp=4: ring has no head constraint.
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, S, D)), jnp.float32)
    keep = (rng.random((B, S)) > 0.2).astype(np.float32)
    keep[:, :4] = 1.0  # never a fully masked row
    bias = make_attention_bias(keep)
    return q, k, v, bias


def test_ring_gate():
    mesh = make_cp_mesh(dp=2, cp=4)
    assert attention_supports_ring(mesh, 32, 32, 4)
    assert not attention_supports_ring(None, 32, 32, 4)
    assert not attention_supports_ring(mesh, 30, 30, 4)   # S % cp != 0
    assert not attention_supports_ring(mesh, 32, 64, 4)   # cross-attention
    assert not attention_supports_ring(mesh, 32, 32, 3)   # B % dp != 0
    assert not attention_supports_ring(make_mesh(dp=8), 32, 32, 8)  # no cp axis
    assert not attention_supports_ring(make_cp_mesh(dp=8, cp=1), 32, 32, 8)


def test_ring_matches_reference_fwd_and_grads():
    """Deterministic ring == plain attention, values AND gradients, on a
    (dp=2, cp=4) mesh with masked keys and a non-divisible head count."""
    mesh = make_cp_mesh(dp=2, cp=4)
    q, k, v, bias = _qkv_bias()
    key_bias = bias[:, 0, 0, :]
    out_ring = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v, key_bias)
    out_ref = multi_head_attention(q, k, v, bias=bias)
    np.testing.assert_allclose(np.asarray(out_ring), np.asarray(out_ref),
                               atol=2e-6)

    g_ring = jax.jit(jax.grad(
        lambda q, k, v: jnp.sum(ring_attention(q, k, v, key_bias, mesh=mesh) ** 2),
        argnums=(0, 1, 2)))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(multi_head_attention(q, k, v, bias=bias) ** 2),
        argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-6)


def test_ring_dropout_matches_global_hash_oracle():
    """The fused position-hash dropout depends only on GLOBAL (b, h, q, k)
    coordinates, so the sharded ring reproduces the single-device oracle
    bit-for-bit (up to fp32 reduction order) — and refuses a missing seed."""
    mesh = make_cp_mesh(dp=2, cp=4)
    q, k, v, bias = _qkv_bias(seed=1)
    key_bias = bias[:, 0, 0, :]
    seed = jnp.asarray(12345, jnp.int32)
    out = jax.jit(lambda *a: ring_attention(*a, 0.3, mesh=mesh))(
        q, k, v, key_bias, seed)
    oracle = hash_dropout_attention(q, k, v, key_bias, seed, 0.3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(oracle), atol=2e-6)
    # The mask really drops ~30%: outputs differ from the no-dropout ones.
    base = jax.jit(lambda *a: ring_attention(*a, mesh=mesh))(q, k, v, key_bias)
    assert float(jnp.max(jnp.abs(out - base))) > 1e-3
    with pytest.raises(ValueError):
        ring_attention(q, k, v, key_bias, None, 0.3, mesh=mesh)


def test_cp_config_for_mesh():
    mesh = make_cp_mesh(dp=2, cp=4)
    cfg = _small_cfg(use_fused_attention=True, use_flash_attention=True)
    out = config_for_mesh(cfg, mesh)
    assert out.cp_mesh is mesh
    # The single-device Pallas kernels must be hard-disabled under cp: their
    # gates would otherwise plant an unpartitionable Mosaic call in the
    # GSPMD-partitioned program.
    assert out.attention_mesh is None
    assert not out.use_fused_attention and not out.use_flash_attention
    # Odd head counts are fine (ring's advantage over Ulysses sp).
    config_for_mesh(_small_cfg().replace(num_attention_heads=3), mesh)
    # cp=1 meshes and plain meshes never attach cp_mesh.
    assert config_for_mesh(cfg, make_mesh(dp=8)).cp_mesh is None


def test_cp_pretrain_step_parity():
    """One full train step (fwd, loss, bwd, AdamW) under (dp=2, cp=4) matches
    the single-device trainer.  Attention-prob dropout is zeroed in BOTH arms
    (the ring uses the position-hash stream, single-device uses bernoulli —
    same distribution, different draws); every other dropout uses the same
    key and global shape on both meshes, so the comparison is exact."""
    batch = _batch()
    cfg = _small_cfg(attention_probs_dropout_prob=0.0)
    plain = PretrainTrainer(cfg, mesh=make_mesh(dp=1, tp=1), total_steps=10)
    cp = PretrainTrainer(cfg, mesh=make_cp_mesh(dp=2, cp=4), total_steps=10)
    ps, cs = plain.init_state(batch), cp.init_state(batch)
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(cs["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ps, pb = plain.step_fn()(ps, batch)
    cs, cb = cp.step_fn()(cs, batch)
    assert np.isclose(float(pb["loss"]), float(cb["loss"]), rtol=1e-5)
    assert np.isclose(float(pb["mask_loss"]), float(cb["mask_loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(cs["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=2e-4, atol=2e-6)
    # Params stay replicated — cp checkpoints load anywhere unchanged.
    assert jax.tree.leaves(cs["params"])[0].sharding.is_fully_replicated


def test_cp_program_is_ring_sharded():
    """The compiled step rotates K/V via collective-permute (the ring) and
    keeps the MLM logits — the largest activation — token-sharded; nothing
    all-gathers the sequence."""
    batch = _batch()
    mesh = make_cp_mesh(dp=2, cp=4)
    trainer = PretrainTrainer(_small_cfg(), mesh=mesh, total_steps=10)
    state = trainer.init_state(batch)
    db = shard_batch(mesh, batch)
    txt = trainer.raw_step_fn().lower(state, db).compile().as_text()
    # Per layer: (cp-1) rotations x 3 tensors (K, V, bias) forward, mirrored
    # in the vjp.  Conservative floor: 2 per layer would already prove the
    # ring survived compilation.
    n_layers = trainer.cfg.num_hidden_layers
    assert txt.count("collective-permute") >= 2 * n_layers, (
        "cp step compiled without the K/V ppermute ring")

    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def fwd(params, b):
        out = trainer.model.apply(
            params, b["input_ids"], token_type_ids=b["token_type_ids"],
            attention_mask=b["attention_mask"], img_feats=b["img_feats"],
            img_location_embeddings=b["img_location_embeddings"])
        return out["mlm_logits"]

    logits = fwd(state["params"], db)
    expect = NamedSharding(mesh, P("dp", "cp", None))
    assert logits.sharding.is_equivalent_to(expect, logits.ndim)
    shard = logits.addressable_shards[0].data
    assert shard.shape[0] == logits.shape[0] // 2
    assert shard.shape[1] == logits.shape[1] // 4


def test_cli_mesh_cp_flags():
    from visitron_tpu.config import RunConfig

    with pytest.raises(ValueError):
        RunConfig(mesh_cp=0)
    with pytest.raises(ValueError):
        RunConfig(mesh_cp=2, mesh_tp=2)
    with pytest.raises(ValueError):
        RunConfig(mesh_cp=2, mesh_sp=2)
    assert RunConfig(mesh_cp=2).mesh_cp == 2
