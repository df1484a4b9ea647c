"""Oscar/BERT torch -> flax import: numerical equivalence with HF BertModel."""

import numpy as np
import pytest
import torch

from visitron_tpu.models import BertConfig, VisitronBert
from visitron_tpu.models.oscar_import import (
    convert_bert_to_flax,
    load_oscar_weights,
    resize_rows,
)


@pytest.fixture(scope="module")
def hf_pair():
    from transformers import BertConfig as HFConfig, BertModel

    hf_cfg = HFConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=2,
        hidden_act="gelu", hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    model = BertModel(hf_cfg).eval()
    cfg = BertConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=48, type_vocab_size=2,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0)
    return model, cfg


def test_bert_forward_matches_hf(hf_pair):
    model, cfg = hf_pair
    state = {k: v.numpy() for k, v in model.state_dict().items()}
    params_sub = convert_bert_to_flax(state, cfg)

    flax_model = VisitronBert(cfg)
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 120, (2, 16)).astype(np.int32)
    segs = rng.integers(0, 2, (2, 16)).astype(np.int32)
    mask = np.ones((2, 16), np.int32)
    mask[1, 10:] = 0

    with torch.no_grad():
        out = model(input_ids=torch.from_numpy(ids.astype(np.int64)),
                    token_type_ids=torch.from_numpy(segs.astype(np.int64)),
                    attention_mask=torch.from_numpy(mask.astype(np.int64)))
    import jax.numpy as jnp

    seq, pooled = flax_model.apply(
        {"params": params_sub}, jnp.asarray(ids), token_type_ids=jnp.asarray(segs),
        attention_mask=jnp.asarray(mask))
    ours = np.asarray(seq)
    theirs = out.last_hidden_state.numpy()
    # Compare only unmasked positions (masked rows differ by design).
    np.testing.assert_allclose(ours[0], theirs[0], atol=2e-5)
    np.testing.assert_allclose(ours[1, :10], theirs[1, :10], atol=2e-5)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(), atol=2e-5)


def test_resize_rows():
    rng = np.random.default_rng(0)
    a = np.ones((4, 3), np.float32)
    b = resize_rows(a, 6, rng)
    assert b.shape == (6, 3)
    np.testing.assert_array_equal(b[:4], a)
    assert resize_rows(a, 2, rng).shape == (2, 3)


def test_embedding_resize_roundtrip(hf_pair, tmp_path):
    """Import with grown vocab/type/position tables (model_utils.py:101-109)."""
    model, cfg = hf_pair
    grown = cfg.replace(vocab_size=123, type_vocab_size=4, max_position_embeddings=64)
    state = {f"bert.{k}": v for k, v in model.state_dict().items()}
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                {k: v.numpy() for k, v in state.items()}.items()},
               tmp_path / "pytorch_model.bin")
    import jax

    from visitron_tpu.models import PretrainModel

    pm = PretrainModel(grown)
    template = jax.jit(lambda r: pm.init(
        r, np.ones((1, 8), np.int32)))(jax.random.PRNGKey(0))
    params = load_oscar_weights(str(tmp_path), grown, template)
    emb = params["params"]["bert"]["word_embeddings"]["embedding"]
    assert emb.shape == (123, 32)
    np.testing.assert_array_equal(
        np.asarray(emb[:120]), model.state_dict()["embeddings.word_embeddings.weight"].numpy())
    # Heads kept from template (fresh init).
    assert params["params"]["next_action"]["kernel"].shape[-1] == grown.action_space
    # Model applies cleanly with imported params.
    out = pm.apply(params, np.ones((1, 8), np.int32))
    assert np.isfinite(np.asarray(out["mlm_logits"])).all()
