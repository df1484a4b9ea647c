"""Speaker/critic models, decoding strategies, legacy tokenizer, timers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from visitron_tpu.agents.decoding import FEEDBACK_OPTIONS, select_action
from visitron_tpu.data.legacy_tokenizer import (
    LegacyTokenizer,
    build_legacy_vocab,
    split_sentence,
)
from visitron_tpu.models.speaker import Critic, SpeakerDecoder, SpeakerEncoder
from visitron_tpu.utils import Timer, time_since


def test_speaker_encoder_decoder_shapes():
    rng = jax.random.PRNGKey(0)
    B, T, F, H, V, L = 2, 5, 16, 8, 50, 7
    enc = SpeakerEncoder(feature_size=F, hidden_size=H)
    a = jnp.ones((B, T, F))
    feat = jnp.ones((B, T, 36, F))
    lengths = jnp.array([5, 3])
    p = enc.init(rng, a, feat, lengths)
    ctx = enc.apply(p, a, feat, lengths)
    assert ctx.shape == (B, T, H)

    dec = SpeakerDecoder(vocab_size=V, embedding_size=6, hidden_size=H)
    words = jnp.ones((B, L), jnp.int32)
    mask = jnp.zeros((B, T), bool)
    h0 = jnp.zeros((B, H)); c0 = jnp.zeros((B, H))
    pd = dec.init(rng, words, ctx, mask, h0, c0)
    logits, h1, c1 = dec.apply(pd, words, ctx, mask, h0, c0)
    assert logits.shape == (B, L, V)
    assert h1.shape == (B, H)

    critic = Critic(hidden_size=H)
    pc = critic.init(rng, h1)
    v = critic.apply(pc, h1)
    assert v.shape == (B,)


def test_select_action_strategies():
    rng = jax.random.PRNGKey(0)
    logit = jnp.asarray(np.random.default_rng(0).standard_normal((4, 6)), jnp.float32)
    target = jnp.array([1, 2, 3, 4])
    assert (select_action("teacher", logit, rng, target=target) == target).all()
    a = select_action("argmax", logit, rng)
    assert (a == jnp.argmax(logit, -1)).all()
    for fb in ["sample", "temperature", "penalty", "topk", "nucleus"]:
        acts = select_action(fb, logit, rng, temperature=0.7,
                             taken_mask=jnp.zeros((4, 6), bool))
        assert acts.shape == (4,)
        assert ((acts >= 0) & (acts < 6)).all()
    # topk only ever picks the top-3.
    top3 = set(np.asarray(jax.lax.top_k(logit, 3)[1]).ravel().tolist())
    for seed in range(10):
        acts = select_action("topk", logit, jax.random.PRNGKey(seed))
        for i, act in enumerate(np.asarray(acts)):
            assert act in np.asarray(jax.lax.top_k(logit, 3)[1][i])
    with pytest.raises(ValueError):
        select_action("bogus", logit, rng)


def test_penalty_downweights_taken():
    logit = jnp.asarray([[4.0, 3.9, -5.0, -5.0]])
    taken = jnp.asarray([[True, False, False, False]])
    counts = np.zeros(4)
    for seed in range(50):
        a = select_action("penalty", logit, jax.random.PRNGKey(seed),
                          temperature=0.2, taken_mask=taken)
        counts[int(a[0])] += 1
    # Penalized action 0 (logit scaled by 0.2 then /0.2 => 4.0 -> ... ) should
    # lose to action 1 most of the time.
    assert counts[1] > counts[0]


def test_legacy_tokenizer_roundtrip():
    items = [
        {"dialog_history": [{"message": "go to the red lamp"}], "target": "lamp"},
        {"dialog_history": [{"message": "go past the red door"}], "target": "door"},
    ]
    vocab = build_legacy_vocab(items, min_count=1)
    assert vocab[:6] == ["<PAD>", "<UNK>", "<EOS>", "<NAV>", "<ORA>", "<TAR>"]
    tok = LegacyTokenizer(vocab, encoding_length=12)
    enc = tok.encode_sentence(["go to the red lamp"], seps=["<NAV>"])
    assert len(enc) == 12
    assert "go to the red lamp" in tok.decode_sentence(enc)
    assert split_sentence("Hello, world!!") == ["hello", ",", "world", "!", "!"]
    shrunk = tok.shrink(list(enc))
    assert tok._word_to_index["<EOS>"] not in shrunk


def test_timer():
    t = Timer()
    t.tic()
    avg = t.toc()
    assert avg >= 0
    assert "m" in time_since(__import__("time").time() - 10, 0.5)
