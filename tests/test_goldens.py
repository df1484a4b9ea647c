"""Golden regression tests: exact byte-level outputs for fixed inputs.

The reference has no tests; subtle tokenization/truncation/masking changes
would silently alter training data.  These goldens pin the exact outputs."""

import numpy as np

from visitron_tpu.data import WordPieceTokenizer, build_dialog_sequence

GOLDEN_VOCAB = [
    "[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "[TAR]", "[QUES]", "[ANS]",
    "go", "left", "right", "the", "lamp", "red", "##s", "to", "a", "b", "c",
    "##mp", "la",
]


def test_dialog_sequence_golden():
    tok = WordPieceTokenizer(GOLDEN_VOCAB)
    turns = [tok.tokenize("go left to the lamp"), tok.tokenize("go right")]
    target = tok.tokenize("lamp")
    seq = build_dialog_sequence(tok, turns, target_tokens=target, max_seq_length=20)
    assert seq.tokens == [
        "[CLS]", "[TAR]", "lamp",
        "[QUES]", "go", "left", "to", "the", "lamp",
        "[ANS]", "go", "right",
        "[SEP]",
    ]
    np.testing.assert_array_equal(
        seq.token_ids,
        [2, 5, 12, 6, 8, 9, 15, 11, 12, 7, 8, 10, 3, 0, 0, 0, 0, 0, 0, 0])
    np.testing.assert_array_equal(
        seq.segment_ids,
        [0, 1, 1, 2, 2, 2, 2, 2, 2, 3, 3, 3, 0, 0, 0, 0, 0, 0, 0, 0])
    assert seq.length == 13


def test_wordpiece_golden():
    tok = WordPieceTokenizer(GOLDEN_VOCAB)
    assert tok.tokenize("lamps") == ["lamp", "##s"]
    assert tok.tokenize("lamp") == ["lamp"]
    assert tok.tokenize("la") == ["la"]
    assert tok.tokenize("lamps!") == ["lamp", "##s", "[UNK]"]
    assert tok.tokenize("zzz") == ["[UNK]"]
    assert tok.tokenize("Lamp") == ["lamp"]  # lowercasing


def test_masking_golden():
    """Fixed seed -> exact masking decisions (regression pin)."""
    from visitron_tpu.data.pretrain_dataset import PretrainDataset

    tok = WordPieceTokenizer(GOLDEN_VOCAB)
    ds = PretrainDataset.__new__(PretrainDataset)
    ds.tokenizer = tok
    ds.mlm_probability = 0.5
    ds.mtp = False
    ds.rng = np.random.default_rng(123)
    ids = np.array([2, 8, 9, 15, 11, 12, 3, 0, 0, 0], np.int32)
    inputs, labels = ds._mask_tokens(ids, None)
    # Specials and pads never masked.
    assert labels[0] == -1 and labels[6] == -1 and (labels[7:] == -1).all()
    assert inputs[0] == 2 and inputs[6] == 3 and (inputs[7:] == 0).all()
    # Exact decisions for this seed (regression values): positions 1,3 masked
    # to [MASK], position 2 replaced by a random word (10), position 4 masked,
    # position 5 kept unmasked.
    np.testing.assert_array_equal(inputs, [2, 4, 10, 4, 4, 12, 3, 0, 0, 0])
    np.testing.assert_array_equal(labels, [-1, 8, 9, 15, 11, -1, -1, -1, -1, -1])
    # Masked positions carry their original ids as labels.
    masked = labels != -1
    np.testing.assert_array_equal(np.asarray(ids)[masked], labels[masked])


def test_loc_embedding_golden():
    from visitron_tpu import geometry as geo

    e = geo.viewpoint_loc_embedding(0)
    # View 3 relative to base 0: rel heading 90deg, elevation -30deg.
    np.testing.assert_allclose(e[3, 0], 1.0, atol=1e-6)       # sin(90)
    np.testing.assert_allclose(e[3, 32], 0.0, atol=1e-6)      # cos(90)
    np.testing.assert_allclose(e[3, 64], -0.5, atol=1e-6)     # sin(-30)
    np.testing.assert_allclose(e[3, 96], np.sqrt(3) / 2, atol=1e-6)
