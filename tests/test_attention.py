"""Attention cores: flash (Pallas) vs jnp parity, and the model routing flag."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visitron_tpu.ops.attention import (attention_supports_flash,
                                        flash_attention, multi_head_attention)
from visitron_tpu.ops.masking import NEG_INF, make_attention_bias


def test_flash_matches_jnp_attention():
    """Interpret-mode Pallas kernel == XLA-fused jnp attention on padded keys."""
    rng = np.random.default_rng(0)
    b, h, s, d = 2, 3, 256, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    keep = np.ones((b, s), np.float32)
    keep[0, 200:] = 0.0  # padded tail
    keep[1, 64:] = 0.0
    key_bias = (1.0 - keep) * NEG_INF
    ref = multi_head_attention(q, k, v, bias=jnp.asarray(key_bias)[:, None, None, :])
    got = flash_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(key_bias), None, 0.0, 128, 128, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_supports_flash_predicate():
    on_tpu = jax.default_backend() == "tpu"
    assert attention_supports_flash(768, 768, 64) == on_tpu
    assert not attention_supports_flash(100, 768, 64)   # q not tiled
    assert not attention_supports_flash(768, 768, 48)   # head dim


def test_bert_flag_routes_safely_off_tpu():
    """use_flash_attention=True must not break on a non-TPU backend (the
    predicate gates it to the jnp path) and gives identical outputs."""
    from visitron_tpu.models import BertConfig, BertTextModel

    cfg = BertConfig(vocab_size=128, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=2, intermediate_size=64,
                     max_position_embeddings=128, type_vocab_size=4,
                     hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    ids = np.ones((2, 128), np.int32)
    mask = np.ones((2, 128), np.int32)
    m0 = BertTextModel(cfg)
    params = m0.init(jax.random.PRNGKey(0), jnp.asarray(ids),
                     attention_mask=jnp.asarray(mask))
    out0 = m0.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    m1 = BertTextModel(cfg.replace(use_flash_attention=True))
    out1 = m1.apply(params, jnp.asarray(ids), attention_mask=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out0[0]), np.asarray(out1[0]),
                               rtol=1e-5, atol=1e-5)


def test_flash_attention_grad_matches_jnp():
    """custom_vjp: gradients through the flash path equal the jnp path's
    (the backward recomputes via XLA — flash-style)."""
    rng = np.random.default_rng(1)
    b, h, s, d = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    key_bias = jnp.zeros((b, s), jnp.float32)

    def loss_flash(q, k, v):
        return flash_attention(q, k, v, key_bias, None, 0.0, 128, 128, True).sum()

    def loss_ref(q, k, v):
        return multi_head_attention(q, k, v,
                                    bias=key_bias[:, None, None, :]).sum()

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def _flash_do(q, k, v, key_bias, seed, rate):
    return flash_attention(q, k, v, key_bias, seed, rate, 128, 128, True)


def test_flash_dropout_unbiased_and_deterministic():
    """Fused-dropout flash: E[out] ~= deterministic out (1/(1-r) scaling);
    same seed -> same mask; different seed -> different mask."""
    rng = np.random.default_rng(2)
    b, h, s, d = 1, 4, 128, 64
    q = jnp.zeros((b, h, s, d), jnp.float32)  # uniform attention
    k = jnp.zeros((b, h, s, d), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    bias = jnp.zeros((b, s), jnp.float32)
    det = _flash_do(q, k, v, bias, None, 0.0)
    outs = [np.asarray(_flash_do(q, k, v, bias, jnp.int32(i), 0.5))
            for i in range(16)]
    assert not np.allclose(outs[0], np.asarray(det))
    np.testing.assert_array_equal(
        outs[3], np.asarray(_flash_do(q, k, v, bias, jnp.int32(3), 0.5)))
    assert not np.array_equal(outs[0], outs[1])
    # Unbiasedness: mean over seeds approaches the deterministic output.
    mean = np.mean(outs, axis=0)
    err = np.abs(mean - np.asarray(det)).mean()
    scale = np.abs(np.asarray(det)).mean() + 1e-6
    assert err / scale < 0.35, err / scale


def test_flash_dropout_grads_consistent():
    """Finite-difference check of the Pallas backward kernels WITH dropout:
    the mask is a pure function of (seed, positions), so numerical
    differentiation is valid and must match the custom_vjp."""
    from jax.test_util import check_grads

    rng = np.random.default_rng(3)
    b, h, s, d = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.3, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.3, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.3, jnp.float32)
    keep = np.ones((b, s), np.float32)
    keep[0, 100:] = 0.0
    bias = jnp.asarray((1.0 - keep) * NEG_INF)
    seed = jnp.int32(7)

    def f(q, k, v):
        return _flash_do(q, k, v, bias, seed, 0.3).sum()

    check_grads(f, (q, k, v), order=1, modes=["rev"], rtol=0.01)


def test_fused_matches_jnp_attention():
    """Small-S single-pass kernel (interpret) == jnp attention, padded keys,
    multiple heads per program (h=4, hpb divides h)."""
    from visitron_tpu.ops.attention import fused_attention

    rng = np.random.default_rng(5)
    b, h, s, d = 2, 4, 256, 64
    q = rng.standard_normal((b, h, s, d)).astype(np.float32)
    k = rng.standard_normal((b, h, s, d)).astype(np.float32)
    v = rng.standard_normal((b, h, s, d)).astype(np.float32)
    keep = np.ones((b, s), np.float32)
    keep[0, 200:] = 0.0
    keep[1, 64:] = 0.0
    key_bias = (1.0 - keep) * NEG_INF
    ref = multi_head_attention(q, k, v, bias=jnp.asarray(key_bias)[:, None, None, :])
    got = fused_attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          jnp.asarray(key_bias), None, 0.0, True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_grad_matches_jnp():
    """Single-kernel backward (dq/dk/dv in one program) == jnp gradients."""
    from visitron_tpu.ops.attention import fused_attention

    rng = np.random.default_rng(6)
    b, h, s, d = 1, 2, 128, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    keep = np.ones((b, s), np.float32)
    keep[0, 100:] = 0.0
    key_bias = jnp.asarray((1.0 - keep) * NEG_INF)

    def loss_fused(q, k, v):
        return fused_attention(q, k, v, key_bias, None, 0.0, True).sum()

    def loss_ref(q, k, v):
        return multi_head_attention(q, k, v,
                                    bias=key_bias[:, None, None, :]).sum()

    gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_fused_dropout_matches_masked_reference():
    """Fused-dropout fwd+bwd vs a jnp reference applying the SAME
    reconstructed (seed, position)-hash mask."""
    from visitron_tpu.ops.attention import (_keep_mask, _threshold,
                                            fused_attention)

    rng = np.random.default_rng(7)
    b, h, s, d = 1, 2, 128, 64
    rate, seed = 0.4, jnp.int32(13)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    bias = jnp.zeros((b, s), jnp.float32)
    masks = []
    for bh in range(b * h):
        seed_mix = (jnp.uint32(13) ^ (jnp.uint32(bh) * jnp.uint32(0xC2B2AE3D)))
        masks.append(np.asarray(_keep_mask(seed_mix, 0, 0, (s, s),
                                           _threshold(rate))))
    mask = jnp.asarray(np.stack(masks).reshape(b, h, s, s))

    def ref_loss(q, k, v):
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(d), -1)
        p = jnp.where(mask, p, 0.0) / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v).sum()

    def fused_loss(q, k, v):
        return fused_attention(q, k, v, bias, seed, rate, True).sum()

    np.testing.assert_allclose(np.asarray(fused_loss(q, k, v)),
                               np.asarray(ref_loss(q, k, v)), rtol=2e-4)
    gf = jax.grad(fused_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_flash_dropout_bwd_matches_masked_reference():
    """Extract the kernel's dropout mask (via indicator values), then compare
    flash gradients against a jnp reference applying the SAME mask."""
    rng = np.random.default_rng(4)
    b, h, s, d = 1, 2, 128, 64
    rate, seed = 0.4, jnp.int32(11)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    bias = jnp.zeros((b, s), jnp.float32)

    # Reconstruct the mask exactly as the kernels compute it (bh-mixed seed,
    # absolute positions) and use it in a jnp reference implementation.
    from visitron_tpu.ops.attention import _keep_mask, _threshold
    masks = []
    for bh in range(b * h):
        seed_mix = (jnp.uint32(11) ^ (jnp.uint32(bh) * jnp.uint32(0xC2B2AE3D)))
        masks.append(np.asarray(_keep_mask(seed_mix, 0, 0, (s, s),
                                           _threshold(rate))))
    mask = jnp.asarray(np.stack(masks).reshape(b, h, s, s))

    def ref_loss(q, k, v):
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(d), -1)
        p = jnp.where(mask, p, 0.0) / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v).sum()

    v = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)

    def flash_loss(q, k, v):
        return _flash_do(q, k, v, bias, seed, rate).sum()

    np.testing.assert_allclose(np.asarray(flash_loss(q, k, v)),
                               np.asarray(ref_loss(q, k, v)), rtol=2e-4)
    gf = jax.grad(flash_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


# -- fused_attention_mesh: the shard_map wrapper (multi-chip kernel path) ----


def test_fused_mesh_matches_jnp_attention():
    """shard_map-wrapped fused kernel (interpret, 4x2 CPU mesh) == jnp
    attention, forward AND gradients — one per-shard kernel per device."""
    from visitron_tpu.ops.attention import fused_attention_mesh
    from visitron_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(8)
    b, h, s, d = 4, 4, 256, 64  # local shards: (1, 2, 256, 64)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    keep = np.ones((b, s), np.float32)
    keep[0, 200:] = 0.0
    keep[2, 64:] = 0.0
    key_bias = jnp.asarray((1.0 - keep) * NEG_INF)

    def loss_mesh(q, k, v):
        return fused_attention_mesh(q, k, v, key_bias, None, 0.0,
                                    mesh=mesh, interpret=True).sum()

    def loss_ref(q, k, v):
        return multi_head_attention(q, k, v,
                                    bias=key_bias[:, None, None, :]).sum()

    got = fused_attention_mesh(q, k, v, key_bias, None, 0.0,
                               mesh=mesh, interpret=True)
    ref = multi_head_attention(q, k, v, bias=key_bias[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    gm = jax.grad(loss_mesh, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_fused_mesh_on_sequence_parallel_mesh():
    """The same wrapper serves a (dp, sp) sequence-parallel mesh: heads
    shard over sp (inside attention, Ulysses sequence parallelism IS head
    sharding), forward and gradients match jnp attention."""
    from visitron_tpu.ops import attention as A
    from visitron_tpu.parallel import make_sp_mesh

    mesh = make_sp_mesh(dp=2, sp=4)
    assert A._mesh_head_axis(mesh) == "sp"
    rng = np.random.default_rng(9)
    b, h, s, d = 2, 4, 256, 64  # local shards: (1, 1, 256, 64)
    q = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    keep = np.ones((b, s), np.float32)
    keep[1, 128:] = 0.0
    key_bias = jnp.asarray((1.0 - keep) * NEG_INF)

    def loss_mesh(q, k, v):
        return A.fused_attention_mesh(q, k, v, key_bias, None, 0.0,
                                      mesh=mesh, interpret=True).sum()

    def loss_ref(q, k, v):
        return multi_head_attention(q, k, v,
                                    bias=key_bias[:, None, None, :]).sum()

    got = A.fused_attention_mesh(q, k, v, key_bias, None, 0.0,
                                 mesh=mesh, interpret=True)
    ref = multi_head_attention(q, k, v, bias=key_bias[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    gm = jax.grad(loss_mesh, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)
    # Gates: divisibility runs against the sp axis on sp meshes (TPU-only
    # shape gate is monkeypatched elsewhere; here both would fail off-TPU,
    # so only check the head-axis resolution and non-(dp,sp|tp) rejection).
    from jax.sharding import Mesh
    import jax as _jax
    odd = Mesh(np.asarray(_jax.devices()[:4]).reshape(2, 2), ("dp", "pp"))
    assert A._mesh_head_axis(odd) is None
    assert not A.attention_supports_fused_mesh(odd, 256, 256, 64, 8, 12)


def test_fused_mesh_dropout_decorrelated_across_shards():
    """Under dropout, every dp shard folds its mesh coordinates into the
    seed (no two devices reuse a mask stream), and fwd+bwd stay consistent:
    both match a jnp reference applying the SAME reconstructed per-shard
    masks."""
    from visitron_tpu.ops.attention import (_keep_mask, _threshold,
                                            fused_attention_mesh)
    from visitron_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=1)
    rng = np.random.default_rng(9)
    b, h, s, d = 4, 2, 128, 64  # local shards: (1, 2, 128, 64)
    rate, seed = 0.4, 21
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    bias = jnp.zeros((b, s), jnp.float32)

    # Reconstruct each shard's mask: local_b=1, so shard bi holds batch item
    # bi with per-shard seed = seed + bi*1000003 (tp index 0), and local bh
    # index = head index.
    masks = np.zeros((b, h, s, s), bool)
    for bi in range(b):
        shard_seed = np.uint32(np.int32(seed) + np.int32(bi) * np.int32(1000003))
        for hh in range(h):
            mix = jnp.uint32(shard_seed) ^ (jnp.uint32(hh) * jnp.uint32(0xC2B2AE3D))
            masks[bi, hh] = np.asarray(
                _keep_mask(mix, 0, 0, (s, s), _threshold(rate)))
    mask = jnp.asarray(masks)
    # Decorrelation: distinct shards must not share a mask stream.
    assert not np.array_equal(masks[0], masks[1])

    def ref_loss(q, k, v):
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(d), -1)
        p = jnp.where(mask, p, 0.0) / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v).sum()

    def mesh_loss(q, k, v):
        return fused_attention_mesh(q, k, v, bias, jnp.int32(seed), rate,
                                    mesh=mesh, interpret=True).sum()

    np.testing.assert_allclose(np.asarray(mesh_loss(q, k, v)),
                               np.asarray(ref_loss(q, k, v)), rtol=2e-4)
    gm = jax.grad(mesh_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_fused_mesh_gate(monkeypatch):
    """attention_supports_fused_mesh: divisibility over the mesh axes plus
    the per-shard single-device gate."""
    from visitron_tpu.ops import attention as A
    from visitron_tpu.parallel import make_mesh

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    mesh = make_mesh(dp=4, tp=2)
    assert A.attention_supports_fused_mesh(mesh, 256, 256, 64, 8, 12)
    assert not A.attention_supports_fused_mesh(mesh, 256, 256, 64, 6, 12)  # b % dp
    assert not A.attention_supports_fused_mesh(mesh, 256, 256, 64, 8, 9)   # h % tp
    assert not A.attention_supports_fused_mesh(mesh, 96, 96, 64, 8, 12)    # S gate
    assert not A.attention_supports_fused_mesh(None, 256, 256, 64, 8, 12)


# -- flash_attention_mesh: the shard_map wrapper (multi-chip long-S path) ----


def test_flash_mesh_matches_jnp_attention():
    """shard_map-wrapped blockwise flash kernel (interpret, 4x2 CPU mesh) ==
    jnp attention, forward AND gradients, on a non-square (Q != K) shape —
    the long-joint-sequence regime the fused kernel's VMEM gate excludes."""
    from visitron_tpu.ops.attention import flash_attention_mesh
    from visitron_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(12)
    b, h, qs, ks, d = 4, 4, 256, 384, 64  # local shards: (1, 2, 256/384, 64)
    q = jnp.asarray(rng.standard_normal((b, h, qs, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, ks, d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, ks, d)), jnp.float32)
    keep = np.ones((b, ks), np.float32)
    keep[0, 300:] = 0.0
    keep[2, 128:] = 0.0
    key_bias = jnp.asarray((1.0 - keep) * NEG_INF)

    def loss_mesh(q, k, v):
        return flash_attention_mesh(q, k, v, key_bias, None, 0.0,
                                    mesh=mesh, interpret=True).sum()

    def loss_ref(q, k, v):
        return multi_head_attention(q, k, v,
                                    bias=key_bias[:, None, None, :]).sum()

    got = flash_attention_mesh(q, k, v, key_bias, None, 0.0,
                               mesh=mesh, interpret=True)
    ref = multi_head_attention(q, k, v, bias=key_bias[:, None, None, :])
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
    gm = jax.grad(loss_mesh, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-4)


def test_flash_mesh_dropout_decorrelated_across_shards():
    """Under dropout, every dp shard folds its mesh coordinates into the
    seed (no two devices reuse a mask stream), and fwd+bwd stay consistent:
    both match a jnp reference applying the SAME reconstructed per-shard
    masks (flash kernels hash absolute (q, k) coordinates, so the
    reconstruction is block-layout independent)."""
    from visitron_tpu.ops.attention import (_keep_mask, _threshold,
                                            flash_attention_mesh)
    from visitron_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=1)
    rng = np.random.default_rng(13)
    b, h, s, d = 4, 2, 128, 64  # local shards: (1, 2, 128, 64)
    rate, seed = 0.4, 33
    q = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, s, d)) * 0.5, jnp.float32)
    bias = jnp.zeros((b, s), jnp.float32)

    # Reconstruct each shard's mask: local_b=1, so shard bi holds batch item
    # bi with per-shard seed = seed + bi*1000003 (tp index 0), and local bh
    # index = head index.
    masks = np.zeros((b, h, s, s), bool)
    for bi in range(b):
        shard_seed = np.uint32(np.int32(seed) + np.int32(bi) * np.int32(1000003))
        for hh in range(h):
            mix = jnp.uint32(shard_seed) ^ (jnp.uint32(hh) * jnp.uint32(0xC2B2AE3D))
            masks[bi, hh] = np.asarray(
                _keep_mask(mix, 0, 0, (s, s), _threshold(rate)))
    mask = jnp.asarray(masks)
    assert not np.array_equal(masks[0], masks[1])

    def ref_loss(q, k, v):
        p = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k,
                       preferred_element_type=jnp.float32) / np.sqrt(d), -1)
        p = jnp.where(mask, p, 0.0) / (1.0 - rate)
        return jnp.einsum("bhqk,bhkd->bhqd", p, v).sum()

    def mesh_loss(q, k, v):
        return flash_attention_mesh(q, k, v, bias, jnp.int32(seed), rate,
                                    mesh=mesh, interpret=True).sum()

    np.testing.assert_allclose(np.asarray(mesh_loss(q, k, v)),
                               np.asarray(ref_loss(q, k, v)), rtol=2e-4)
    gm = jax.grad(mesh_loss, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gm, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=3e-4, atol=3e-4)


def test_flash_mesh_gate(monkeypatch):
    """attention_supports_flash_mesh: divisibility over the mesh axes plus
    the per-shard single-device flash gate (Q may differ from K)."""
    from visitron_tpu.ops import attention as A
    from visitron_tpu.parallel import make_mesh

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    mesh = make_mesh(dp=4, tp=2)
    assert A.attention_supports_flash_mesh(mesh, 1024, 1024, 64, 8, 12)
    assert A.attention_supports_flash_mesh(mesh, 1024, 1280, 128, 4, 2)
    assert not A.attention_supports_flash_mesh(mesh, 1024, 1024, 64, 6, 12)  # b % dp
    assert not A.attention_supports_flash_mesh(mesh, 1024, 1024, 64, 8, 9)   # h % tp
    assert not A.attention_supports_flash_mesh(mesh, 1000, 1024, 64, 8, 12)  # tiling
    assert not A.attention_supports_flash_mesh(None, 1024, 1024, 64, 8, 12)


def test_fused_packed_matches_unpacked_exactly():
    """The packed (B, S, H*D) kernel is BIT-identical to the unpacked
    (B, H, S, D) kernel on equivalent views — same bodies, same per-head
    dropout stream ids (i == b*H + h) — values, grads, and dropout all."""
    from visitron_tpu.ops.attention import fused_attention, fused_attention_packed

    rng = np.random.default_rng(9)
    b, h, s, d = 2, 4, 256, 64
    q4 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k4 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v4 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    unpack = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    keep = np.ones((b, s), np.float32)
    keep[0, 180:] = 0.0
    key_bias = jnp.asarray((1.0 - keep) * NEG_INF)

    for seed, rate in ((None, 0.0), (jnp.int32(77), 0.3)):
        ref = fused_attention(q4, k4, v4, key_bias, seed, rate, True)
        got = fused_attention_packed(pack(q4), pack(k4), pack(v4), key_bias,
                                     h, seed, rate, True)
        np.testing.assert_array_equal(np.asarray(unpack(got)), np.asarray(ref))

    def loss_packed(q, k, v):
        return (fused_attention_packed(pack(q), pack(k), pack(v), key_bias,
                                       h, jnp.int32(5), 0.2, True) ** 2).sum()

    def loss_unpacked(q, k, v):
        return (unpack(pack(fused_attention(q, k, v, key_bias, jnp.int32(5),
                                            0.2, True))) ** 2).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q4, k4, v4)
    gu = jax.grad(loss_unpacked, argnums=(0, 1, 2))(q4, k4, v4)
    for a, b_ in zip(gp, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-6, atol=1e-6)


def test_bert_packed_layout_flag_parity():
    """BertTextModel output is identical with fused_packed_layout on/off
    (interpret-mode kernels route identically; eval mode => no dropout)."""
    import dataclasses

    from visitron_tpu.models import BertConfig
    from visitron_tpu.models.bert import BertTextModel
    import visitron_tpu.ops.attention as atn

    cfg = BertConfig(vocab_size=128, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=1, intermediate_size=128,
                     max_position_embeddings=128, type_vocab_size=2,
                     use_fused_attention=True)
    # Force the fused gates open off-TPU and route kernels via interpret.
    orig_gate, orig_fused, orig_packed = (
        atn.attention_supports_fused, atn.fused_attention,
        atn.fused_attention_packed)
    import visitron_tpu.models.bert as bert_mod

    bert_mod.attention_supports_fused = lambda *a, **k: True
    bert_mod.fused_attention = lambda q, k, v, kb, s, r: orig_fused(
        q, k, v, kb, s, r, True)
    bert_mod.fused_attention_packed = lambda q, k, v, kb, h, s, r: orig_packed(
        q, k, v, kb, h, s, r, True)
    try:
        ids = np.array([[5, 9, 11, 2] * 16, [7, 3, 1, 2] * 16], np.int32)
        mask = np.ones_like(ids)
        outs = {}
        for packed in (False, True):
            c = dataclasses.replace(cfg, fused_packed_layout=packed)
            model = BertTextModel(c)
            params = jax.jit(model.init)(jax.random.PRNGKey(0), ids,
                                         attention_mask=mask)
            seq, _ = model.apply(params, ids, attention_mask=mask)
            outs[packed] = np.asarray(seq)
        np.testing.assert_allclose(outs[True], outs[False], rtol=2e-5, atol=2e-5)
    finally:
        bert_mod.attention_supports_fused = orig_gate
        bert_mod.fused_attention = orig_fused
        bert_mod.fused_attention_packed = orig_packed


def test_fused_mesh_packed_matches_unpacked_mesh():
    """Packed mesh wrapper (head-group column sharding) == the unpacked mesh
    wrapper on equivalent views — values, grads, and the per-shard dropout
    streams (same (dp, head-axis) seed folds, same local head ids)."""
    from visitron_tpu.ops.attention import (fused_attention_mesh,
                                            fused_attention_mesh_packed)
    from visitron_tpu.parallel import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    rng = np.random.default_rng(12)
    b, h, s, d = 4, 4, 256, 64
    q4 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    k4 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    v4 = jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
    pack = lambda x: x.transpose(0, 2, 1, 3).reshape(b, s, h * d)
    unpack = lambda x: x.reshape(b, s, h, d).transpose(0, 2, 1, 3)
    keep = np.ones((b, s), np.float32)
    keep[1, 128:] = 0.0
    key_bias = jnp.asarray((1.0 - keep) * NEG_INF)

    for seed, rate in ((None, 0.0), (jnp.int32(21), 0.25)):
        ref = fused_attention_mesh(q4, k4, v4, key_bias, seed, rate,
                                   mesh=mesh, interpret=True)
        got = fused_attention_mesh_packed(pack(q4), pack(k4), pack(v4),
                                          key_bias, h, seed, rate,
                                          mesh=mesh, interpret=True)
        np.testing.assert_allclose(np.asarray(unpack(got)), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)

    def loss_packed(q, k, v):
        return (fused_attention_mesh_packed(pack(q), pack(k), pack(v),
                                            key_bias, h, jnp.int32(4), 0.2,
                                            mesh=mesh, interpret=True) ** 2).sum()

    def loss_unpacked(q, k, v):
        return (fused_attention_mesh(q, k, v, key_bias, jnp.int32(4), 0.2,
                                     mesh=mesh, interpret=True) ** 2).sum()

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q4, k4, v4)
    gu = jax.grad(loss_unpacked, argnums=(0, 1, 2))(q4, k4, v4)
    for a, b_ in zip(gp, gu):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-5, atol=1e-5)
