"""Fused residual-add+LayerNorm kernels: interpret-mode parity vs the jnp
twin (fwd + all grads, both dtypes, with/without residual), the shape gate,
and the model-level fallback's bit-exactness vs flax nn.LayerNorm."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visitron_tpu.ops.layernorm import (fused_add_layernorm,
                                        layernorm_reference,
                                        layernorm_supports)


@pytest.mark.parametrize("has_res", [True, False])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_reference(has_res, dt):
    rng = np.random.default_rng(0)
    shape = (4, 64, 768)
    x = jnp.asarray(rng.standard_normal(shape), dt)
    res = jnp.asarray(rng.standard_normal(shape), dt) if has_res else None
    g = jnp.asarray(rng.standard_normal(768), jnp.float32)
    b = jnp.asarray(rng.standard_normal(768), jnp.float32)
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    def f(x, res, g, b):
        y = fused_add_layernorm(x, res, g, b, 1e-12, interpret=True)
        return (y.astype(jnp.float32) * w).sum()

    def fr(x, res, g, b):
        return (layernorm_reference(x, res, g, b, 1e-12)
                .astype(jnp.float32) * w).sum()

    yk = fused_add_layernorm(x, res, g, b, 1e-12, interpret=True)
    yr = layernorm_reference(x, res, g, b, 1e-12)
    tol = 1e-5 if dt == jnp.float32 else 4e-3
    gtol = 1e-4 if dt == jnp.float32 else 2e-2
    np.testing.assert_allclose(np.asarray(yk, np.float32),
                               np.asarray(yr, np.float32), atol=tol)
    argnums = (0, 1, 2, 3) if has_res else (0, 2, 3)
    gk = jax.jit(jax.grad(f, argnums=argnums))(x, res, g, b)
    gr = jax.jit(jax.grad(fr, argnums=argnums))(x, res, g, b)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a, np.float32),
                                   np.asarray(c, np.float32), atol=gtol)


def test_dx_equals_dresidual():
    """The fused add's gradient fans out identically to both operands."""
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 32, 256)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((2, 32, 256)), jnp.float32)
    g = jnp.ones((256,), jnp.float32)
    b = jnp.zeros((256,), jnp.float32)

    def f(x, res):
        return (fused_add_layernorm(x, res, g, b, 1e-12, interpret=True)
                ** 2).sum()

    dx, dres = jax.grad(f, argnums=(0, 1))(x, res)
    np.testing.assert_array_equal(np.asarray(dx), np.asarray(dres))


def test_supports_gate(monkeypatch):
    from visitron_tpu.ops import layernorm as L

    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    assert L.layernorm_supports(64 * 512, 768)
    assert L.layernorm_supports(256, 128)
    assert not L.layernorm_supports(100, 768)   # rows not 16-tileable
    assert not L.layernorm_supports(256, 2054)  # hidden not %128 (img LN)
    monkeypatch.setattr(L.jax, "default_backend", lambda: "cpu")
    assert not L.layernorm_supports(64 * 512, 768)


@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_module_fallback_matches_flax(dt):
    """Off-TPU the FusedResidualLayerNorm module reproduces
    nn.LayerNorm(dtype=f32)(x + res): bit-exact at fp32; at bf16 the only
    divergence is jit's own promotion of the residual add to f32 inside a
    fused program (the previous inline ``ln(attn + hidden)`` call sites
    compiled the same way), so bf16 compares at bf16-rounding tolerance."""
    import flax.linen as nn

    from visitron_tpu.models.bert import BertConfig, FusedResidualLayerNorm

    if jax.default_backend() == "tpu":
        pytest.skip("fallback path is the off-TPU route")
    rng = np.random.default_rng(2)
    cfg = BertConfig(dtype=dt)
    x = jnp.asarray(rng.standard_normal((2, 128, 768)), dt)
    res = jnp.asarray(rng.standard_normal((2, 128, 768)), dt)
    mod = FusedResidualLayerNorm(cfg)
    params = mod.init(jax.random.PRNGKey(0), x, res)
    # Non-trivial scale/bias so the apply order matters.
    params = jax.tree.map(
        lambda p: jnp.asarray(rng.standard_normal(p.shape), p.dtype), params)
    got = mod.apply(params, x, res)
    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32)
    want = ln.apply({"params": params["params"]}, x + res)
    if dt == jnp.float32:
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    else:
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(want, np.float32), atol=5e-2)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="hardware kernel path")
def test_bert_fused_layernorm_flag_parity_tpu():
    """BertTextModel with use_fused_layernorm on vs off at bf16 tolerance on
    real hardware (mirrors test_bert_packed_layout_flag_parity)."""
    from visitron_tpu.models.bert import BertConfig, BertTextModel

    rng = np.random.default_rng(3)
    ids = jnp.asarray(rng.integers(0, 1000, (2, 128)), jnp.int32)
    mask = jnp.ones((2, 128), jnp.int32)
    outs = []
    for flag in (False, True):
        cfg = BertConfig(vocab_size=1000, num_hidden_layers=2,
                         max_position_embeddings=128, dtype=jnp.bfloat16,
                         use_fused_layernorm=flag)
        model = BertTextModel(cfg)
        params = model.init(jax.random.PRNGKey(0), ids, mask)
        outs.append(np.asarray(
            model.apply(params, ids, mask)[0], np.float32))
    np.testing.assert_allclose(outs[0], outs[1], atol=2e-2)


@pytest.mark.parametrize("axes", [("dp",), ("dp", "sp")])
def test_mesh_kernel_matches_reference(axes):
    """fused_add_layernorm_mesh (interpret kernels, 8-device CPU mesh) ==
    the jnp twin — fwd and ALL FOUR grads.  dgamma/dbeta are the critical
    check: they are grads of REPLICATED shard_map inputs, accumulated via
    the stacked-partials out_spec rather than transpose-inserted psums."""
    from jax.sharding import Mesh

    from visitron_tpu.ops.layernorm import fused_add_layernorm_mesh

    devs = np.array(jax.devices()[:8])
    if axes == ("dp",):
        mesh = Mesh(devs.reshape(8), ("dp",))
    else:
        mesh = Mesh(devs.reshape(4, 2), ("dp", "sp"))
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((8, 64, 256)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((8, 64, 256)), jnp.float32)
    g = jnp.asarray(1.0 + 0.1 * rng.standard_normal(256), jnp.float32)
    b = jnp.asarray(0.1 * rng.standard_normal(256), jnp.float32)
    w = jnp.asarray(rng.standard_normal((8, 64, 256)), jnp.float32)

    def f(x, res, g, b):
        y = fused_add_layernorm_mesh(x, res, g, b, 1e-12, mesh=mesh,
                                     interpret=True)
        return (y * w).sum()

    def fr(x, res, g, b):
        return (layernorm_reference(x, res, g, b, 1e-12) * w).sum()

    yk = fused_add_layernorm_mesh(x, res, g, b, 1e-12, mesh=mesh,
                                  interpret=True)
    yr = layernorm_reference(x, res, g, b, 1e-12)
    np.testing.assert_allclose(np.asarray(yk), np.asarray(yr), atol=1e-5)
    gk = jax.jit(jax.grad(f, argnums=(0, 1, 2, 3)))(x, res, g, b)
    gr = jax.jit(jax.grad(fr, argnums=(0, 1, 2, 3)))(x, res, g, b)
    for a, c in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=2e-4)


def test_mesh_supports_gate(monkeypatch):
    from jax.sharding import Mesh

    from visitron_tpu.ops import layernorm as L

    devs = np.array(jax.devices()[:8]).reshape(4, 2)
    mesh = Mesh(devs, ("dp", "sp"))
    monkeypatch.setattr(L.jax, "default_backend", lambda: "tpu")
    assert L.layernorm_supports_mesh(mesh, (8, 64), 256)
    assert not L.layernorm_supports_mesh(mesh, (6, 64), 256)   # B % dp != 0
    assert not L.layernorm_supports_mesh(mesh, (8, 63), 256)   # S % sp != 0
    assert not L.layernorm_supports_mesh(mesh, (8, 64), 2054)  # H % 128
    assert not L.layernorm_supports_mesh(None, (8, 64), 256)
    monkeypatch.setattr(L.jax, "default_backend", lambda: "cpu")
    assert not L.layernorm_supports_mesh(mesh, (8, 64), 256)


def test_bert_mesh_ln_routing(monkeypatch):
    """Model-level mesh routing: a (dp, sp)-mesh BertTextModel with the
    mesh-LN path FORCED (backend gate patched, kernels in interpret mode)
    matches the same model with use_fused_layernorm off — loss and grads.
    This is the wiring a real multi-chip session will execute; no real
    multi-chip hardware exists here, so pin it on the virtual mesh."""
    import functools

    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from visitron_tpu.models import bert as B

    mesh = Mesh(np.array(jax.devices()[:8]).reshape(4, 2), ("dp", "sp"))
    monkeypatch.setattr(
        B, "layernorm_supports_mesh",
        lambda m, rs, h: h % 128 == 0 and rs[0] % 4 == 0 and rs[1] % 2 == 0)
    monkeypatch.setattr(
        B, "fused_add_layernorm_mesh",
        functools.partial(B.fused_add_layernorm_mesh, interpret=True))
    rng = np.random.default_rng(7)
    ids = jnp.asarray(rng.integers(0, 500, (8, 64)), jnp.int32)
    mask = jnp.ones((8, 64), jnp.int32)
    outs = []
    for flag in (False, True):
        cfg = B.BertConfig(vocab_size=500, num_hidden_layers=2,
                           hidden_size=128, num_attention_heads=2,
                           intermediate_size=256,
                           max_position_embeddings=64,
                           use_fused_attention=False,
                           use_fused_layernorm=flag)
        cfg = B.config_for_mesh(cfg, mesh)
        model = B.BertTextModel(cfg)
        params = model.init(jax.random.PRNGKey(0), ids, mask)

        def loss(params, ids, mask):
            return (model.apply(params, ids, mask)[0]
                    .astype(jnp.float32) ** 2).mean()

        with jax.set_mesh(mesh) if hasattr(jax, "set_mesh") else mesh:
            sh = NamedSharding(mesh, P("dp", None))
            ids_s = jax.device_put(ids, sh)
            mask_s = jax.device_put(mask, sh)
            l, g = jax.jit(jax.value_and_grad(loss))(params, ids_s, mask_s)
            outs.append((float(l), jax.tree.map(np.asarray, g)))
    l0, g0 = outs[0]
    l1, g1 = outs[1]
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, c in zip(jax.tree.leaves(g0), jax.tree.leaves(g1)):
        np.testing.assert_allclose(a, c, atol=5e-4)
