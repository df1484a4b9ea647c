import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visitron_tpu.models import (
    AttnDecoderLSTM,
    AttnDecoderLSTMwithClassifier,
    BertConfig,
    OscarEncoder,
    PretrainModel,
    SoftDotAttention,
    TurnBasedDecoderLSTM,
    VisitronBert,
    pretrain_loss,
)
from visitron_tpu.models.lstm import LSTM, lstm_cell_step

CFG = BertConfig(
    vocab_size=128,
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=4,
    intermediate_size=64,
    max_position_embeddings=64,
    type_vocab_size=4,
    img_feature_dim=20,
    action_space=36,
    detector_classes=11,
)


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


def test_bert_text_shapes(rng):
    model = VisitronBert(CFG)
    ids = jnp.ones((2, 16), jnp.int32)
    params = model.init(rng, ids)
    seq, pooled = model.apply(params, ids)
    assert seq.shape == (2, 16, 32)
    assert pooled.shape == (2, 32)


def test_bert_multimodal_shapes_and_mask(rng):
    model = VisitronBert(CFG)
    ids = jnp.ones((2, 16), jnp.int32)
    img = jnp.ones((2, 8, 20))
    loc = jnp.ones((2, 8, 128))
    mask = jnp.ones((2, 24), jnp.int32)
    params = model.init(rng, ids, img_feats=img, img_location_embeddings=loc,
                        attention_mask=mask)
    seq, pooled = model.apply(params, ids, img_feats=img, img_location_embeddings=loc,
                              attention_mask=mask)
    assert seq.shape == (2, 24, 32)


def test_bert_padding_invariance(rng):
    """Masked-out positions must not change unmasked outputs."""
    model = VisitronBert(CFG)
    ids = jnp.array(np.random.default_rng(0).integers(1, 128, (1, 12)), jnp.int32)
    params = model.init(rng, ids)
    mask = jnp.concatenate([jnp.ones((1, 8), jnp.int32), jnp.zeros((1, 4), jnp.int32)], -1)
    seq1, _ = model.apply(params, ids, attention_mask=mask)
    ids2 = ids.at[:, 8:].set(77)  # corrupt padded positions
    seq2, _ = model.apply(params, ids2, attention_mask=mask)
    np.testing.assert_allclose(seq1[:, :8], seq2[:, :8], atol=1e-5)


def test_history_state_matches_joint_encoding(rng):
    """Prepending per-layer history K/V must equal re-encoding... it does NOT
    in general (queries differ), but single-token suffixes with history equal
    the corresponding joint rows when positions/masks line up and history is
    the same tokens' layer inputs. We verify the structural contract instead:
    output shape and that history changes the result."""
    model = VisitronBert(CFG)
    ids = jnp.ones((2, 4), jnp.int32)
    params = model.init(rng, ids)
    hist = [jnp.ones((2, 6, 32)) * 0.1 for _ in range(CFG.num_hidden_layers)]
    seq, _ = model.apply(params, ids, history_states=hist)
    assert seq.shape == (2, 4, 32)
    seq0, _ = model.apply(params, ids)
    assert not np.allclose(seq, seq0)


def test_pretrain_model_and_loss(rng):
    model = PretrainModel(CFG)
    ids = jnp.ones((2, 16), jnp.int32)
    img = jnp.ones((2, 8, 20))
    loc = jnp.zeros((2, 8, 128))
    mask = jnp.ones((2, 24), jnp.int32)
    params = model.init(rng, ids, img_feats=img, img_location_embeddings=loc,
                        attention_mask=mask)
    out = model.apply(params, ids, img_feats=img, img_location_embeddings=loc,
                      attention_mask=mask)
    # Heads run over the full joint (text+image) sequence; image positions
    # carry ignore-labels (encoder.py:377-389, data_loader_pretrain.py:692-700).
    assert out["mlm_logits"].shape == (2, 24, 128)
    assert out["action_logits"].shape == (2, 36)
    assert out["token_logits"].shape == (2, 24, 11)
    labels = jnp.full((2, 24), -1, jnp.int32).at[:, 2].set(5)
    token_labels = jnp.full((2, 24), -1, jnp.int32).at[:, 3].set(7)
    next_action = jnp.array([1, 2], jnp.int32)
    bundle = pretrain_loss(out, labels, next_action, token_labels)
    for k in ["loss", "mask_loss", "next_loss", "token_loss",
              "words_accuracy", "action_accuracy", "token_accuracy"]:
        assert np.isfinite(float(bundle[k])), k
    assert float(bundle["loss"]) > 0


def test_mlm_weights_are_tied(rng):
    """Gradient of MLM loss must flow into the word embeddings through the
    decoder (tied weights)."""
    model = PretrainModel(CFG)
    ids = jnp.ones((1, 8), jnp.int32)
    params = model.init(rng, ids, attention_mask=jnp.ones((1, 8), jnp.int32))
    labels = jnp.full((1, 8), -1, jnp.int32).at[:, 1].set(3)

    def loss_fn(p):
        out = model.apply(p, ids, attention_mask=jnp.ones((1, 8), jnp.int32))
        return pretrain_loss(out, labels)["loss"]

    grads = jax.jit(jax.grad(loss_fn))(params)
    g = grads["params"]["bert"]["word_embeddings"]["embedding"]
    # Rows other than the input token must receive decoder-side gradient.
    assert float(jnp.abs(g[3]).sum()) > 0


def test_lstm_matches_torch_pack_padded():
    import torch

    b, t, i, h = 3, 7, 5, 6
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, t, i)).astype(np.float32)
    lengths = np.array([7, 4, 2])
    tl = torch.nn.LSTM(i, h, 1, batch_first=True)
    params = {
        "wi": tl.weight_ih_l0.detach().numpy(),
        "wh": tl.weight_hh_l0.detach().numpy(),
        "bi": tl.bias_ih_l0.detach().numpy(),
        "bh": tl.bias_hh_l0.detach().numpy(),
    }
    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths, batch_first=True, enforce_sorted=True)
    out, (h_t, c_t) = tl(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True)
    from visitron_tpu.models.lstm import masked_lstm_scan

    ys, (h_j, c_j) = masked_lstm_scan(
        {k: jnp.asarray(v) for k, v in params.items()}, jnp.asarray(x), jnp.asarray(lengths))
    np.testing.assert_allclose(np.asarray(ys), out.detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_j), h_t[0].detach().numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_j), c_t[0].detach().numpy(), atol=2e-5)


def test_lstm_cell_matches_torch():
    import torch

    b, i, h = 2, 5, 4
    rng = np.random.default_rng(1)
    x = rng.standard_normal((b, i)).astype(np.float32)
    h0 = rng.standard_normal((b, h)).astype(np.float32)
    c0 = rng.standard_normal((b, h)).astype(np.float32)
    tc = torch.nn.LSTMCell(i, h)
    params = {
        "wi": jnp.asarray(tc.weight_ih.detach().numpy()),
        "wh": jnp.asarray(tc.weight_hh.detach().numpy()),
        "bi": jnp.asarray(tc.bias_ih.detach().numpy()),
        "bh": jnp.asarray(tc.bias_hh.detach().numpy()),
    }
    th, tcc = tc(torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0)))
    jh, jc = lstm_cell_step(params, jnp.asarray(x), jnp.asarray(h0), jnp.asarray(c0))
    np.testing.assert_allclose(np.asarray(jh), th.detach().numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(jc), tcc.detach().numpy(), atol=1e-6)


def test_soft_dot_attention(rng):
    att = SoftDotAttention(query_dim=8, ctx_dim=6)
    h = jnp.ones((2, 8))
    ctx = jnp.asarray(np.random.default_rng(0).standard_normal((2, 5, 6)), jnp.float32)
    params = att.init(rng, h, ctx)
    h_tilde, probs = att.apply(params, h, ctx)
    assert h_tilde.shape == (2, 8)
    np.testing.assert_allclose(np.asarray(probs.sum(-1)), 1.0, rtol=1e-5)
    mask = jnp.zeros((2, 5), bool).at[:, 3:].set(True)
    _, probs = att.apply(params, h, ctx, mask=mask)
    assert float(probs[:, 3:].max()) < 1e-6
    _, logits = att.apply(params, h, ctx, output_prob=False)
    assert not np.allclose(np.asarray(logits).sum(-1), 1.0)


def test_oscar_encoder(rng):
    enc = OscarEncoder(CFG, hidden_size=16, decoder_hidden_size=24, dropout_ratio=0.3)
    ids = jnp.ones((2, 10), jnp.int32)
    lengths = jnp.array([10, 6])
    params = enc.init(rng, ids, lengths)
    ctx, h0, c0 = enc.apply(params, ids, lengths)
    assert ctx.shape == (2, 10, 16)
    assert h0.shape == (2, 24) and c0.shape == (2, 24)
    # Padded ctx rows are zeroed by the masked LSTM.
    assert float(jnp.abs(ctx[1, 6:]).max()) == 0.0


def test_viewpoint_decoder_step(rng):
    dec = AttnDecoderLSTM(feature_size=24, hidden_size=16, embedding_size=8)
    B, K = 2, 5
    action = jnp.ones((B, 4))
    feature = jnp.ones((B, 36, 24))
    cand = jnp.ones((B, K, 24))
    h1 = jnp.zeros((B, 16))
    c = jnp.zeros((B, 16))
    ctx = jnp.ones((B, 7, 16))
    params = dec.init(rng, action, feature, cand, h1, c, ctx)
    h_1, c_1, logit, h_tilde = dec.apply(params, action, feature, cand, h1, c, ctx)
    assert logit.shape == (B, K)
    assert h_1.shape == h_tilde.shape == (B, 16)


def test_classifier_decoder_step(rng):
    dec = AttnDecoderLSTMwithClassifier(feature_size=24, hidden_size=16, embedding_size=8)
    B, K = 2, 5
    args = (jnp.ones((B, 4)), jnp.ones((B, 36, 24)), jnp.ones((B, K, 24)),
            jnp.zeros((B, 16)), jnp.zeros((B, 16)), jnp.ones((B, 7, 16)))
    params = dec.init(rng, *args)
    h_1, c_1, nav_logit, qa_logit, h_tilde = dec.apply(params, *args)
    assert nav_logit.shape == (B, K) and qa_logit.shape == (B, 1)


def test_turn_based_decoder_step(rng):
    dec = TurnBasedDecoderLSTM(feature_size=24, hidden_size=16)
    B = 2
    args = (jnp.zeros((B,), jnp.int32), jnp.ones((B, 24)), jnp.zeros((B, 16)),
            jnp.zeros((B, 16)), jnp.ones((B, 7, 16)))
    params = dec.init(rng, *args)
    h_1, c_1, alpha, logit = dec.apply(params, *args)
    assert logit.shape == (B, 6)


def test_dropout_rng_changes_output(rng):
    model = VisitronBert(CFG)
    ids = jnp.ones((2, 8), jnp.int32)
    params = model.init(rng, ids)
    s1, _ = model.apply(params, ids, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(1)})
    s2, _ = model.apply(params, ids, deterministic=False,
                        rngs={"dropout": jax.random.PRNGKey(2)})
    s3, _ = model.apply(params, ids, deterministic=True)
    assert not np.allclose(s1, s2)
    assert np.isfinite(np.asarray(s3)).all()


def test_remat_preserves_values_and_grads(rng):
    """cfg.remat=True (layer-wise jax.checkpoint) must be semantics-free:
    identical outputs and gradients, same parameter tree."""
    ids = jnp.ones((2, 8), jnp.int32)
    mask = jnp.ones((2, 8), jnp.int32)
    base = PretrainModel(CFG)
    rem = PretrainModel(CFG.replace(remat=True))
    params = base.init(rng, ids, attention_mask=mask)
    labels = jnp.full((2, 8), -1, jnp.int32).at[:, 2].set(5)

    def loss(model, p):
        out = model.apply(p, ids, attention_mask=mask)
        return pretrain_loss(out, labels)["loss"]

    lb, gb = jax.jit(jax.value_and_grad(lambda p: loss(base, p)))(params)
    lr, gr = jax.jit(jax.value_and_grad(lambda p: loss(rem, p)))(params)
    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    flat_b = jax.tree.leaves(gb)
    flat_r = jax.tree.leaves(gr)
    for a, b in zip(flat_b, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_attention_mesh_config_falls_back_identically(rng):
    """A config carrying attention_mesh must be semantics-free whenever the
    per-shard gate rejects (here: CPU backend) — identical outputs and
    gradients to the mesh-less config, same parameter tree.  This pins the
    config_for_mesh routing so attaching a mesh can never silently change
    numerics on the fallback path."""
    from visitron_tpu.parallel import make_mesh

    ids = jnp.ones((8, 8), jnp.int32)
    mask = jnp.ones((8, 8), jnp.int32)
    base = PretrainModel(CFG)
    meshed = PretrainModel(CFG.replace(attention_mesh=make_mesh(dp=4, tp=2)))
    params = base.init(rng, ids, attention_mask=mask)
    labels = jnp.full((8, 8), -1, jnp.int32).at[:, 2].set(5)

    def loss(model, p):
        out = model.apply(p, ids, attention_mask=mask)
        return pretrain_loss(out, labels)["loss"]

    lb, gb = jax.jit(jax.value_and_grad(lambda p: loss(base, p)))(params)
    lm, gm = jax.jit(jax.value_and_grad(lambda p: loss(meshed, p)))(params)
    np.testing.assert_allclose(float(lb), float(lm), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gm)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)
