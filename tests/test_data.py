import numpy as np
import pytest

from visitron_tpu.data import (
    NavInstance,
    RegionFeatureStore,
    SceneFeatureTable,
    WordPieceTokenizer,
    build_dialog_sequence,
    build_nav_instances,
    build_wordpiece_vocab,
    load_classifier_episodes,
    read_tsv_img_features,
    truncate_dialogs,
    write_tsv_img_features,
)


@pytest.fixture(scope="module")
def tok():
    vocab = build_wordpiece_vocab(
        ["go left and right into the kitchen", "turn around the lamp sofa plant",
         "unaffiliated precomputed overlong", "yes why say abcdefghijklmnopqrstuvwxyz"],
        vocab_size=512)
    return WordPieceTokenizer(vocab)


def test_wordpiece_basics(tok):
    assert tok.tokenize("Go LEFT!") == ["go", "left", "!"] or "go" in tok.tokenize("Go LEFT!")
    toks = tok.tokenize("go left")
    ids = tok.convert_tokens_to_ids(toks)
    assert tok.convert_ids_to_tokens(ids) == toks


def test_wordpiece_subword_fallback(tok):
    # "lefty" is not a whole word in the vocab -> split into pieces, no [UNK]
    pieces = tok.wordpiece("lefty")
    assert all(p in tok.vocab for p in pieces)
    joined = pieces[0] + "".join(p[2:] for p in pieces[1:])
    assert joined == "lefty"


def test_wordpiece_matches_hf_on_shared_vocab(tok):
    """Cross-check against the HF BertTokenizer algorithm on our vocab."""
    from transformers import BertTokenizer
    import tempfile, os
    with tempfile.TemporaryDirectory() as d:
        vp = os.path.join(d, "vocab.txt")
        tok.save_vocab(vp)
        hf = BertTokenizer(vp, do_lower_case=True)
        for text in [
            "Go left, and RIGHT into the kitchen!",
            "turn... around?? the lamp",
            "weird xylophone zzz",
            "café naïve",  # accent stripping
        ]:
            assert tok.tokenize(text) == hf.tokenize(text), text


def test_special_token_resize(tok):
    n = len(tok)
    added = tok.add_special_tokens(("[NEW1]", "[NEW2]"))
    assert added == 2 and len(tok) == n + 2
    assert tok.convert_tokens_to_ids(["[NEW1]"])[0] == n


def test_truncate_dialogs_keeps_latest():
    turns = [["a"] * 5, ["b"] * 5, ["c"] * 5]
    # total cost = 18; cap at 13 -> keep c (6), b (6), 1 token of a
    out = truncate_dialogs(turns, amount=13, left=True)
    assert out[-1] == ["c"] * 5 and out[-2] == ["b"] * 5
    assert len(out[0]) == 0 or out[0] == ["a"] * len(out[0])
    cost = sum(len(t) + 1 for t in out)
    assert cost <= 13
    # No-op when under budget.
    assert truncate_dialogs(turns, amount=100) == turns
    assert truncate_dialogs(turns, amount=None) == turns


def test_truncate_dialogs_right():
    turns = [["a"] * 5, ["b"] * 5]
    out = truncate_dialogs(turns, amount=8, left=False)
    assert out[0] == ["a"] * 5
    assert sum(len(t) + 1 for t in out) <= 8


def test_build_dialog_sequence_segments(tok):
    turns = [tok.tokenize("go left"), tok.tokenize("the lamp")]
    target = tok.tokenize("lamp")[:2]
    seq = build_dialog_sequence(tok, turns, target_tokens=target, max_seq_length=64)
    toks = seq.tokens
    assert toks[0] == "[CLS]"
    assert toks[1] == "[TAR]"
    assert "[QUES]" in toks and "[ANS]" in toks
    assert toks[-1] == "[SEP]"
    segs = seq.segment_ids[: seq.length]
    assert segs[0] == 0
    assert segs[1] == 1  # target span
    assert 2 in segs and 3 in segs  # question / answer spans
    # Padding is real [PAD].
    assert np.all(seq.token_ids[seq.length:] == tok.pad_token_id)
    assert seq.attention_mask.sum() == seq.length


def test_build_dialog_sequence_oscar_mode(tok):
    turns = [tok.tokenize("go left")]
    seq = build_dialog_sequence(tok, turns, target_tokens=tok.tokenize("lamp"),
                                oscar_setting=True, max_seq_length=64)
    assert "[TAR]" not in seq.tokens and "[QUES]" not in seq.tokens
    assert seq.tokens.count("[SEP]") >= 2


def test_build_dialog_sequence_tar_back(tok):
    turns = [tok.tokenize("go left")]
    target = tok.tokenize("lamp")
    seq = build_dialog_sequence(tok, turns, target_tokens=target, tar_back=True,
                                max_seq_length=64)
    # [TAR] appears after the dialog turns.
    assert seq.tokens.index("[TAR]") > seq.tokens.index("[QUES]")


def test_build_nav_instances(tmp_path, world, tok):
    root = world.write_task_data(str(tmp_path))
    inst = build_nav_instances(root, ["train"], tok, add_ndh=True, add_r2r=True)
    assert len(inst) > 12  # NDH items + 3 instructions per R2R item
    ndh = [i for i in inst if isinstance(i.inst_idx, int)]
    r2r = [i for i in inst if str(i.inst_idx).startswith("R2R_")]
    assert ndh and r2r
    for i in ndh:
        assert i.trusted_path in (i.player_path, i.planner_path)
        assert i.token_ids.shape == (512,)
        assert i.length > 0
    for i in r2r:
        assert i.trusted_path == i.planner_path == i.player_path


def test_classifier_episodes(tmp_path, world):
    root = world.write_task_data(str(tmp_path))
    eps = load_classifier_episodes(root, ["train"])
    assert eps
    for ep in eps:
        assert 0 in ep["dialog_history"]
        ts = sorted(ep["dialog_history"].keys())
        # Snapshots accumulate monotonically.
        for a, b in zip(ts[:-1], ts[1:]):
            assert len(ep["dialog_history"][a]) <= len(ep["dialog_history"][b])
        assert ep["request_locations"] == list(ep["dialog_history"].keys())


def test_tsv_roundtrip(tmp_path, world):
    feats = world.scene_features()
    path = str(tmp_path / "feats.tsv")
    write_tsv_img_features(path, feats, vfov=60)
    loaded = read_tsv_img_features(path, feature_size=world.scene_feat_dim)
    assert loaded["vfov"] == 60
    for k, v in feats.items():
        np.testing.assert_array_equal(loaded["features"][k], v)
    blind = read_tsv_img_features(path, feature_size=world.scene_feat_dim, blind=True)
    assert not blind["features"][k].any()


def test_scene_feature_table(world):
    feats = world.scene_features()
    table = SceneFeatureTable.pack(world.graphs, feats)
    total = sum(g.num_viewpoints for g in world.graphs.values())
    assert table.table.shape == (total, 36, world.scene_feat_dim)
    for scan, g in world.graphs.items():
        rows = table.rows_for(g)
        for i, vp in enumerate(g.viewpoints):
            np.testing.assert_array_equal(table.table[rows[i]], feats[f"{scan}_{vp}"])
            assert table.row(scan, vp) == rows[i]


def test_region_store_pickle_roundtrip(tmp_path, world):
    feats, tokens = world.region_features()
    store = RegionFeatureStore(feats, tokens)
    store.to_pickle(str(tmp_path / "regions"))
    loaded = RegionFeatureStore.from_pickle(str(tmp_path / "regions"))
    key = store.keys[0]
    np.testing.assert_array_equal(loaded[key], store[key])
    assert loaded.get_region_tokens(key) == store.get_region_tokens(key)
    with pytest.raises(TypeError):
        loaded[b"nope"]
