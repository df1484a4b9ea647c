"""Fused masked softmax-CE kernels: interpret-mode parity vs the jnp path
(masked_cross_entropy), ignored-row zero-gradient semantics, the ragged
vocabulary edge (30525 is not a chunk multiple), and the gate."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visitron_tpu.models.pretrain import masked_cross_entropy
from visitron_tpu.ops.crossentropy import (ce_supports,
                                           fused_masked_softmax_ce)


@pytest.mark.parametrize("vocab", [4096, 30525])
@pytest.mark.parametrize("dt", [jnp.float32, jnp.bfloat16])
def test_kernel_matches_jnp(vocab, dt):
    rng = np.random.default_rng(0)
    rows = 64
    logits = jnp.asarray(rng.standard_normal((rows, vocab)) * 3, dt)
    labels = jnp.asarray(np.where(rng.random(rows) < 0.2, -1,
                                  rng.integers(0, vocab, rows)), jnp.int32)

    def loss_k(lg):
        ce = fused_masked_softmax_ce(lg, labels, interpret=True)
        return ce.sum() / jnp.maximum((labels != -1).sum(), 1)

    def loss_r(lg):
        return masked_cross_entropy(lg[None], labels[None])[0]

    lk, gk = jax.jit(jax.value_and_grad(loss_k))(logits)
    lr, gr = jax.jit(jax.value_and_grad(loss_r))(logits)
    np.testing.assert_allclose(float(lk), float(lr), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(gr, np.float32), atol=1e-6)


def test_ignored_rows_zero_ce_and_zero_grad():
    """label == -1 rows contribute exactly 0 loss AND 0 dlogits even under
    a uniform (unmasked) upstream cotangent — the zeroing is in-kernel, so
    the caller's plain mean is safe."""
    rng = np.random.default_rng(1)
    rows, vocab = 32, 4096
    logits = jnp.asarray(rng.standard_normal((rows, vocab)), jnp.float32)
    labels = jnp.asarray([-1] * 16 + list(rng.integers(0, vocab, 16)),
                         jnp.int32)
    ce = fused_masked_softmax_ce(logits, labels, interpret=True)
    assert np.all(np.asarray(ce[:16]) == 0.0)
    assert np.all(np.asarray(ce[16:]) > 0.0)
    # Uniform cotangent: every row's g is 1, ignored rows must still get 0.
    dlogits = jax.grad(
        lambda lg: fused_masked_softmax_ce(lg, labels, interpret=True).sum()
    )(logits)
    assert float(jnp.abs(dlogits[:16]).max()) == 0.0
    assert float(jnp.abs(dlogits[16:]).max()) > 0.0


def test_ce_gate(monkeypatch):
    from visitron_tpu.ops import crossentropy as C

    monkeypatch.setattr(C.jax, "default_backend", lambda: "tpu")
    assert C.ce_supports(16 * 768, 30525)
    assert not C.ce_supports(100, 30525)   # rows not block-tileable
    assert not C.ce_supports(256, 1601)    # small head: jnp path
    monkeypatch.setattr(C.jax, "default_backend", lambda: "cpu")
    assert not C.ce_supports(16 * 768, 30525)


def test_pretrain_loss_fused_flag_cpu_equivalence():
    """With use_fused_mlm_ce on, the CPU/f32 path is numerically unchanged
    (gate falls back; heads' logits dtype cast is a no-op at f32)."""
    from visitron_tpu.models.bert import BertConfig
    from visitron_tpu.models.pretrain import PretrainModel, pretrain_loss

    rng = np.random.default_rng(3)
    outs = []
    for flag in (False, True):
        cfg = BertConfig(vocab_size=3000, num_hidden_layers=2,
                         max_position_embeddings=96, type_vocab_size=4,
                         use_fused_attention=False, use_fused_mlm_ce=flag)
        model = PretrainModel(cfg)
        ids = jnp.asarray(rng.integers(0, 3000, (2, 64)), jnp.int32)
        feats = jnp.asarray(rng.standard_normal((2, 32, cfg.img_feature_dim)),
                            jnp.float32)
        locs = jnp.asarray(rng.standard_normal((2, 32, 128)), jnp.float32)
        labels = jnp.asarray(np.where(rng.random((2, 96)) < 0.15,
                                      rng.integers(0, 3000, (2, 96)), -1),
                             jnp.int32)
        mask = jnp.ones((2, 96), jnp.int32)
        params = model.init(jax.random.PRNGKey(0), ids, attention_mask=mask,
                            img_feats=feats, img_location_embeddings=locs)
        out = model.apply(params, ids, attention_mask=mask, img_feats=feats,
                          img_location_embeddings=locs)
        bundle = pretrain_loss(out, labels, cfg=cfg)
        outs.append(float(bundle["loss"]))
        rng = np.random.default_rng(3)  # same data both arms
    assert outs[0] == outs[1]
