"""Differential parity: execute the reference's own code against visitron_tpu.

Every other parity test in the suite checks our implementation against
goldens we derived by reading the reference.  These tests instead IMPORT the
reference's pure-Python modules (tasks/viewpoint_select/*.py — runnable here:
torch+cpu, transformers, networkx are installed and none of these modules
need MatterSim or a GPU) and run them side-by-side with ours on randomized
inputs:

  * Evaluation.score (eval.py:20-246)  vs  evaluation.metrics.Evaluator
  * truncate_dialogs (utils_data.py:287-328)  vs  data.dialog.truncate_dialogs
  * PretrainDataset._mask_tokens (data_loader_pretrain.py:549-613)  vs
    data.pretrain_dataset.PretrainDataset._mask_tokens  (matched RNG draws)
  * SoftDotAttention / AttnDecoderLSTM / AttnDecoderLSTMwithClassifier
    (agent_models.py:313-509)  vs  models.decoder  (ported weights)
  * the turn_based decoder (turn_based/agent_models.py:277-319) and torch
    pack_padded_sequence LSTM vs the masked lax.scan LSTM
  * FeaturesReader on-disk interop (utils_data.py:398-498 reads OUR stores)
  * CaptionBertEncoder with history states (oscar/modeling_bert.py:26-169)
    vs models.bert.BertEncoder (ported fused-QKV weights)

This converts formula-by-eye transcription parity into executed proof.
"""

from __future__ import annotations

import json
import os
from types import SimpleNamespace

import numpy as np
import pytest

from reference_loader import load_reference_module, requires_reference

pytestmark = requires_reference


# ---------------------------------------------------------------------------
# 1. Trajectory evaluation: Evaluation.score vs Evaluator
# ---------------------------------------------------------------------------

SUMMARY_KEYS = [
    "length", "hops", "nav_error", "oracle_success_rate", "success_rate",
    "spl", "oracle_path_success_rate", "dist_to_end_reduction", "ndtw", "cls",
]


def _random_trajectory(graph, start_vp, rng, goal_vp=None):
    """A valid edge walk starting at ``start_vp`` (entries (vp, heading, elev))."""
    kind = rng.integers(3)
    if kind == 0 and goal_vp is not None:
        vps = graph.shortest_path(start_vp, goal_vp)
    else:
        vps = [start_vp]
        cur = graph.index[start_vp]
        for _ in range(int(rng.integers(0, 9))):
            nbrs = graph.neighbors(cur)
            if len(nbrs) == 0:
                break
            cur = int(rng.choice(nbrs))
            vps.append(graph.viewpoints[cur])
        if kind == 2 and len(vps) > 2:
            vps = vps[: int(rng.integers(2, len(vps) + 1))]
    return [(vp, float(rng.uniform(0, 6.28)), 0.0) for vp in vps]


@pytest.fixture(scope="module")
def eval_world(tmp_path_factory):
    """Synthetic NDH world written in the reference's on-disk layout."""
    from visitron_tpu.testing import SyntheticWorld

    world = SyntheticWorld(seed=31, num_scans=2, viewpoints_per_scan=14,
                          scene_feat_dim=8, region_feat_dim=8)
    root = tmp_path_factory.mktemp("refworld")
    world.write_task_data(str(root / "srv" / "task_data"),
                          counts={"val_seen": 10})
    world.write_connectivity(str(root / "connectivity"))
    return world, root


@pytest.mark.parametrize("path_type", ["planner_path", "trusted_path"])
def test_evaluation_score_matches_reference(eval_world, path_type, monkeypatch):
    """All 10 summary metrics and every per-item score array agree with the
    reference Evaluation run on the same gt + predictions (eval.py:20-246)."""
    from visitron_tpu.evaluation.metrics import Evaluator

    world, root = eval_world
    ref_eval_mod = load_reference_module("eval")

    with open(root / "srv" / "task_data" / "NDH" / "data" / "val_seen.json") as f:
        gt_items = json.load(f)

    rng = np.random.default_rng({"planner_path": 101, "trusted_path": 202}[path_type])
    results = []
    for item in gt_items:
        graph = world.graphs[item["scan"]]
        start = item["planner_path"][0]
        goal = item["planner_path"][-1]
        results.append({
            "inst_idx": item["inst_idx"],
            "trajectory": _random_trajectory(graph, start, rng, goal_vp=goal),
        })
    out_file = str(root / f"results_{path_type}.json")
    with open(out_file, "w") as f:
        json.dump(results, f)

    # Reference reads srv/task_data + connectivity relative to CWD.
    monkeypatch.chdir(root)
    ref = ref_eval_mod.Evaluation(["val_seen"], path_type=path_type,
                                  dataset_type="NDH")
    ref_summary, ref_scores = ref.score(out_file)

    ours = Evaluator(gt_items, world.graphs, path_type=path_type)
    our_summary, our_scores = ours.score(out_file)

    for key in SUMMARY_KEYS:
        assert our_summary[key] == pytest.approx(ref_summary[key], abs=1e-8), key
    for key in ["nav_errors", "oracle_errors", "oracle_plan_errors",
                "dist_to_end_reductions", "trajectory_lengths",
                "trajectory_hops", "shortest_path_lengths", "ndtw", "cls"]:
        np.testing.assert_allclose(our_scores[key], ref_scores[key],
                                   atol=1e-8, err_msg=key)


def test_trusted_path_derivation_matches_reference(eval_world, monkeypatch):
    """The trusted-path rule (trust the player iff it passes the planner goal
    after the start, eval.py:36-46) selects the same path per item."""
    from visitron_tpu.evaluation.metrics import Evaluator

    world, root = eval_world
    ref_eval_mod = load_reference_module("eval")
    with open(root / "srv" / "task_data" / "NDH" / "data" / "val_seen.json") as f:
        gt_items = json.load(f)
    monkeypatch.chdir(root)
    ref = ref_eval_mod.Evaluation(["val_seen"], path_type="trusted_path",
                                  dataset_type="NDH")
    ours = Evaluator(gt_items, world.graphs, path_type="trusted_path")
    for item in gt_items:
        idx = item["inst_idx"]
        assert ours.gt[idx]["trusted_path"] == ref.gt[idx]["trusted_path"], idx


# ---------------------------------------------------------------------------
# 2. truncate_dialogs fuzz
# ---------------------------------------------------------------------------

def _dialog_cost(sentences):
    return sum(len(t) + 1 for t in sentences)


def test_truncate_dialogs_fuzz_matches_reference():
    """Fuzz both directions across random dialogs/amounts.  Equality holds
    everywhere except the reference's left-branch ``remaining == 1`` budget
    overflow (utils_data.py:310: ``turn[-0:]`` keeps the WHOLE turn), which we
    fixed; the divergence is asserted to fire exactly there and nowhere else
    (data/dialog.py:60-67)."""
    ref = load_reference_module("utils_data").truncate_dialogs
    from visitron_tpu.data.dialog import truncate_dialogs as ours

    rng = np.random.default_rng(5)
    divergences = 0
    for case in range(400):
        n_turns = int(rng.integers(1, 6))
        sentences = [[f"t{case}_{i}_{j}" for j in range(int(rng.integers(0, 7)))]
                     for i in range(n_turns)]
        amount = int(rng.integers(0, _dialog_cost(sentences) + 3))
        for left in (True, False):
            r = ref([list(t) for t in sentences], amount, left=left)
            o = ours([list(t) for t in sentences], amount, left=left)
            if _dialog_cost(r) <= amount:
                # Reference respected the budget (this includes the
                # no-truncation early return): outputs must be identical.
                assert o == r, (case, left, amount)
            else:
                # Reference overflowed: only possible in the left branch with
                # remaining == 1 at the truncating turn.  Our output keeps the
                # budget, drops that turn's tokens, and agrees on the rest.
                divergences += 1
                assert left, (case, amount)
                assert _dialog_cost(o) <= amount
                assert o[0] == []  # the truncated oldest-kept turn, emptied
                assert o[1:] == r[1:]
                # The overflowing reference turn is the full original turn.
                assert r[0] in sentences
    assert divergences > 0, "fuzz never hit the documented divergence"


def test_truncate_dialogs_none_and_exact_budget():
    ref = load_reference_module("utils_data").truncate_dialogs
    from visitron_tpu.data.dialog import truncate_dialogs as ours

    sents = [["a", "b"], ["c"], ["d", "e", "f"]]
    assert ours(sents, None) == ref(sents, None) == sents
    # Exact-fit budget: no truncation on either side.
    assert ours(sents, _dialog_cost(sents)) == ref(sents, _dialog_cost(sents))


# ---------------------------------------------------------------------------
# 3. Pretraining dynamic masking under matched RNG draws
# ---------------------------------------------------------------------------

class _ScriptedRng:
    """np.random.Generator stand-in replaying pre-drawn uniforms/integers in
    the exact order data.pretrain_dataset._mask_tokens consumes them."""

    def __init__(self, uniforms, integers):
        self._uniforms = list(uniforms)
        self._integers = list(integers)

    def random(self, shape):
        u = self._uniforms.pop(0)
        assert u.shape == tuple(np.atleast_1d(shape)) or u.shape == shape
        return u

    def integers(self, low, high, size=None):
        vals = np.asarray(self._integers.pop(0), dtype=np.int64)
        assert vals.size == int(size)
        return vals


class _TokenizerAdapter:
    """Adds the HF-isms the reference masking code calls on its tokenizer."""

    def __init__(self, tk):
        self._tk = tk
        self.all_special_ids = tk.all_special_ids
        self.pad_token_id = tk.pad_token_id
        self.mask_token = tk.mask_token

    def convert_tokens_to_ids(self, tokens):
        if isinstance(tokens, str):
            return self._tk.convert_tokens_to_ids([tokens])[0]
        return self._tk.convert_tokens_to_ids(tokens)

    def __len__(self):
        return len(self._tk)


@pytest.mark.parametrize("mtp", [False, True])
def test_mask_tokens_matches_reference_exactly(mtp, monkeypatch):
    """Drive the reference's _mask_tokens (data_loader_pretrain.py:549-613)
    and ours with IDENTICAL random draws (torch.bernoulli/randint patched to
    replay the same uniforms ours replays through a scripted np Generator);
    inputs, labels, and the derived attention mask must match elementwise."""
    import torch

    from visitron_tpu.data.pretrain_dataset import PretrainDataset
    from visitron_tpu.data.tokenization import WordPieceTokenizer, build_wordpiece_vocab

    dlp = load_reference_module("data_loader_pretrain")

    vocab = build_wordpiece_vocab(
        ["go left down the hall", "turn right at the sofa", "stop near the door"],
        vocab_size=200)
    tk = WordPieceTokenizer(vocab)
    tk.add_special_tokens()
    seq_len = 48
    base = np.random.default_rng(17)

    for trial in range(6):
        nonspecial = [i for i in range(len(tk)) if i not in tk.all_special_ids]
        n_real = int(base.integers(10, seq_len - 2))
        ids = np.full(seq_len, tk.pad_token_id, np.int64)
        ids[0] = tk.vocab[tk.cls_token]
        ids[1:n_real - 1] = base.choice(nonspecial, n_real - 2)
        ids[n_real - 1] = tk.vocab[tk.sep_token]
        token_classes = np.full(seq_len, -1, np.int64)
        if mtp:
            k = int(base.integers(1, 5))
            token_classes[base.choice(np.arange(1, n_real - 1), k, replace=False)] = (
                base.integers(0, 40, k))

        # Shared draws, in both implementations' consumption order.
        u1, u2, u3 = (base.random(seq_len) for _ in range(3))
        full_ints = base.integers(0, len(tk), seq_len)

        # Simulate the selection masks to size ours' integer draw (the two
        # implementations draw random words differently: full matrix indexed
        # vs exact-count fill — both row-major over the same positions).
        prob = np.where(np.isin(ids, tk.all_special_ids), 0.0, 0.15)
        masked = u1 < prob
        if mtp:
            masked |= token_classes != -1
        replace = (u2 < 0.8) & masked
        if mtp:
            replace |= token_classes != -1
        random_sel = (u3 < 0.5) & masked & ~replace

        ours = PretrainDataset.__new__(PretrainDataset)
        ours.tokenizer = tk
        ours.mlm_probability = 0.15
        ours.mtp = mtp
        ours.rng = _ScriptedRng([u1, u2, u3], [full_ints[random_sel]])
        our_inputs, our_labels = ours._mask_tokens(ids.copy(), token_classes)

        draws = iter([u1, u2, u3])

        def fake_bernoulli(t):
            u = torch.from_numpy(next(draws))
            return (u < t.double()).double()

        def fake_randint(high, shape, dtype=None):
            return torch.from_numpy(full_ints.copy())

        monkeypatch.setattr(torch, "bernoulli", fake_bernoulli)
        monkeypatch.setattr(torch, "randint", fake_randint)
        ref_self = SimpleNamespace(
            tokenizer=_TokenizerAdapter(tk),
            args=SimpleNamespace(mlm_probability=0.15, masked_token_prediction=mtp),
        )
        ref_inputs, ref_labels, ref_att = dlp.PretrainDataset._mask_tokens(
            ref_self, torch.from_numpy(ids.copy()), torch.from_numpy(token_classes))

        np.testing.assert_array_equal(our_inputs, ref_inputs.numpy(), err_msg=f"trial {trial}")
        np.testing.assert_array_equal(our_labels, ref_labels.numpy(), err_msg=f"trial {trial}")
        # Reference returns attention over non-pad; ours derives it from the
        # sequence length — same thing for contiguous padding.
        np.testing.assert_array_equal(ref_att.numpy(), ids != tk.pad_token_id)


# ---------------------------------------------------------------------------
# 3b. Feature-store on-disk format interop with the reference FeaturesReader
# ---------------------------------------------------------------------------

def test_feature_store_files_read_by_reference_reader(tmp_path):
    """Our RegionFeatureStore's LMDB and pickle outputs are read back by the
    REFERENCE's FeaturesReader (utils_data.py:398-498) byte-for-byte: keys,
    per-key features, region tokens, and image meta all match — the on-disk
    formats interoperate, not just round-trip with ourselves."""
    ud = load_reference_module("utils_data")
    from visitron_tpu.data.features import RegionFeatureStore

    rng = np.random.default_rng(23)
    feats = {f"scan{i % 2}_vp{i}_{i % 3}".encode():
             rng.standard_normal((4, 12)).astype(np.float32) for i in range(6)}
    toks = {k: [f"obj{i}"] * 4 for i, k in enumerate(feats)}
    store = RegionFeatureStore(feats, toks, 640, 480, 60)

    store.to_lmdb(str(tmp_path / "st"))
    reader = ud.FeaturesReader(str(tmp_path / "st"), use_lmdb=True)
    assert set(reader.keys) == set(store.keys)
    assert (reader.image_w, reader.image_h, reader.vfov) == (640, 480, 60)
    for k in store.keys:
        np.testing.assert_array_equal(reader[k], store[k])
        assert reader.get_region_tokens(k) == store.get_region_tokens(k)
    # Reference derives the scan -> viewpoint map from the key format.
    assert set(reader.viewpoints) == {"scan0", "scan1"}

    store.to_pickle(str(tmp_path / "pk"))
    reader_pk = ud.FeaturesReader(str(tmp_path / "pk"), use_lmdb=False)
    assert set(reader_pk.keys) == set(store.keys)
    for k in store.keys:
        np.testing.assert_array_equal(reader_pk[k], store[k])
        assert reader_pk.get_region_tokens(k) == store.get_region_tokens(k)


# ---------------------------------------------------------------------------
# 4. Decoder modules with ported weights
# ---------------------------------------------------------------------------

def _t2n(t):
    return np.asarray(t.detach().numpy())


def _port_softdot(ref_mod, has_out=True):
    p = {"linear_in": {"kernel": _t2n(ref_mod.linear_in.weight).T}}
    if has_out:
        p["linear_out"] = {"kernel": _t2n(ref_mod.linear_out.weight).T}
    return p


def _port_lstm_cell(cell):
    return {
        "wi": _t2n(cell.weight_ih), "wh": _t2n(cell.weight_hh),
        "bi": _t2n(cell.bias_ih), "bh": _t2n(cell.bias_hh),
    }


def test_softdot_attention_matches_reference_module():
    """agent_models.SoftDotAttention (:313-357) vs models.decoder.SoftDotAttention
    with the torch module's weights, over all output_tilde/output_prob modes."""
    import torch

    am = load_reference_module("agent_models")
    from visitron_tpu.models.decoder import SoftDotAttention

    torch.manual_seed(3)
    q_dim, c_dim, b, s = 24, 32, 5, 7
    ref = am.SoftDotAttention(q_dim, c_dim).eval()
    params = {"params": _port_softdot(ref)}

    rng = np.random.default_rng(3)
    h = rng.standard_normal((b, q_dim)).astype(np.float32)
    ctx = rng.standard_normal((b, s, c_dim)).astype(np.float32)
    mask = rng.random((b, s)) < 0.3
    mask[:, 0] = False  # keep at least one attendable slot

    th, tc, tm = torch.from_numpy(h), torch.from_numpy(ctx), torch.from_numpy(mask)
    for output_tilde in (True, False):
        for output_prob in (True, False):
            with torch.no_grad():
                r1, r2 = ref(th.clone(), tc, mask=tm.clone(),
                             output_tilde=output_tilde, output_prob=output_prob)
            o1, o2 = SoftDotAttention(q_dim, c_dim).apply(
                params, h, ctx, mask=mask,
                output_tilde=output_tilde, output_prob=output_prob)
            np.testing.assert_allclose(np.asarray(o1), _t2n(r1), atol=2e-5)
            o2, r2 = np.asarray(o2), _t2n(r2)
            if not output_prob:
                # output_prob=False returns the reference's aliased MASKED
                # logits (-inf at masked slots; ours uses a finite NEG_INF
                # sentinel — XLA-friendly, same softmax result).
                assert np.all(np.isneginf(r2[mask]))
                assert np.all(o2[mask] <= -1e8)
                np.testing.assert_allclose(o2[~mask], r2[~mask], atol=2e-5)
            else:
                np.testing.assert_allclose(o2, r2, atol=2e-5)


def _decoder_inputs(rng, b, angle, feat, hid, k=6, s=9):
    return dict(
        action=rng.standard_normal((b, angle)).astype(np.float32),
        feature=rng.standard_normal((b, 36, feat)).astype(np.float32),
        cand_feat=rng.standard_normal((b, k, feat)).astype(np.float32),
        prev_h1=rng.standard_normal((b, hid)).astype(np.float32),
        c_0=rng.standard_normal((b, hid)).astype(np.float32),
        ctx=rng.standard_normal((b, s, hid)).astype(np.float32),
        ctx_mask=np.concatenate(
            [np.zeros((b, s - 3), bool), np.ones((b, 3), bool)], axis=1),
    )


def test_attn_decoder_lstm_matches_reference_module():
    """agent_models.AttnDecoderLSTM (:360-428) single step vs ours with the
    torch module's weights: h_1, c_1, candidate logits, h_tilde all match."""
    import torch

    am = load_reference_module("agent_models")
    from visitron_tpu.models.decoder import AttnDecoderLSTM

    torch.manual_seed(11)
    angle, emb, hid, feat = 8, 16, 32, 20
    ref = am.AttnDecoderLSTM(angle, emb, hid, dropout_ratio=0.5,
                             feature_size=feat).eval()
    params = {"params": {
        "embedding": {"kernel": _t2n(ref.embedding[0].weight).T,
                      "bias": _t2n(ref.embedding[0].bias)},
        "lstm": _port_lstm_cell(ref.lstm),
        "feat_att_layer": _port_softdot(ref.feat_att_layer, has_out=False),
        "attention_layer": _port_softdot(ref.attention_layer),
        "candidate_att_layer": _port_softdot(ref.candidate_att_layer, has_out=False),
    }}

    rng = np.random.default_rng(11)
    inp = _decoder_inputs(rng, 4, angle, feat, hid)
    with torch.no_grad():
        rh1, rc1, rlogit, rtilde = ref(
            torch.from_numpy(inp["action"]), torch.from_numpy(inp["feature"]),
            torch.from_numpy(inp["cand_feat"]), None,
            torch.from_numpy(inp["prev_h1"]), torch.from_numpy(inp["c_0"]),
            torch.from_numpy(inp["ctx"]), ctx_mask=torch.from_numpy(inp["ctx_mask"]))
    h1, c1, logit, tilde = AttnDecoderLSTM(
        angle_feat_size=angle, embedding_size=emb, hidden_size=hid,
        feature_size=feat).apply(
        params, inp["action"], inp["feature"], inp["cand_feat"],
        inp["prev_h1"], inp["c_0"], inp["ctx"], ctx_mask=inp["ctx_mask"],
        deterministic=True)
    np.testing.assert_allclose(np.asarray(h1), _t2n(rh1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), _t2n(rc1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logit), _t2n(rlogit), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tilde), _t2n(rtilde), atol=2e-5)


def test_attn_decoder_lstm_with_classifier_matches_reference_module():
    """agent_models.AttnDecoderLSTMwithClassifier (:431-509) vs ours: adds the
    2-layer question head (qa_logit) to the nav step."""
    import torch

    am = load_reference_module("agent_models")
    from visitron_tpu.models.decoder import AttnDecoderLSTMwithClassifier

    torch.manual_seed(13)
    angle, emb, hid, feat = 8, 16, 32, 20
    ref = am.AttnDecoderLSTMwithClassifier(angle, emb, hid, dropout_ratio=0.5,
                                           feature_size=feat).eval()
    params = {"params": {
        "embedding": {"kernel": _t2n(ref.embedding[0].weight).T,
                      "bias": _t2n(ref.embedding[0].bias)},
        "lstm": _port_lstm_cell(ref.lstm),
        "feat_att_layer": _port_softdot(ref.feat_att_layer, has_out=False),
        "attention_layer": _port_softdot(ref.attention_layer),
        "candidate_att_layer": _port_softdot(ref.candidate_att_layer, has_out=False),
        "question_linear_0": {"kernel": _t2n(ref.question_linear[0].weight).T,
                              "bias": _t2n(ref.question_linear[0].bias)},
        "question_linear_1": {"kernel": _t2n(ref.question_linear[2].weight).T,
                              "bias": _t2n(ref.question_linear[2].bias)},
    }}

    rng = np.random.default_rng(13)
    inp = _decoder_inputs(rng, 3, angle, feat, hid)
    with torch.no_grad():
        rh1, rc1, rnav, rqa, rtilde = ref(
            torch.from_numpy(inp["action"]), torch.from_numpy(inp["feature"]),
            torch.from_numpy(inp["cand_feat"]),
            torch.from_numpy(inp["prev_h1"]), torch.from_numpy(inp["c_0"]),
            torch.from_numpy(inp["ctx"]), ctx_mask=torch.from_numpy(inp["ctx_mask"]))
    h1, c1, nav, qa, tilde = AttnDecoderLSTMwithClassifier(
        angle_feat_size=angle, embedding_size=emb, hidden_size=hid,
        feature_size=feat).apply(
        params, inp["action"], inp["feature"], inp["cand_feat"],
        inp["prev_h1"], inp["c_0"], inp["ctx"], ctx_mask=inp["ctx_mask"],
        deterministic=True)
    np.testing.assert_allclose(np.asarray(h1), _t2n(rh1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c1), _t2n(rc1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(nav), _t2n(rnav), atol=2e-5)
    np.testing.assert_allclose(np.asarray(qa), _t2n(rqa), atol=2e-5)
    np.testing.assert_allclose(np.asarray(tilde), _t2n(rtilde), atol=2e-5)


def test_turn_based_decoder_matches_reference_module():
    """tasks/turn_based/agent_models.py:277-319 AttnDecoderLSTM (the 6-action
    low-level decoder) vs models.decoder.TurnBasedDecoderLSTM with ported
    weights."""
    import torch

    from reference_loader import TURN_BASED_DIR

    am = load_reference_module("agent_models", task_dir=TURN_BASED_DIR)
    from visitron_tpu.models.decoder import TurnBasedDecoderLSTM

    torch.manual_seed(5)
    in_act, out_act, emb, hid, feat = 8, 6, 16, 32, 32  # ctx dim == hid
    ref = am.AttnDecoderLSTM(in_act, out_act, emb, hid, dropout_ratio=0.5,
                             feature_size=feat).eval()
    params = {"params": {
        "embedding": {"embedding": _t2n(ref.embedding.weight)},
        "lstm": _port_lstm_cell(ref.lstm),
        "attention_layer": _port_softdot(ref.attention_layer),
        "decoder2action": {"kernel": _t2n(ref.decoder2action.weight).T,
                           "bias": _t2n(ref.decoder2action.bias)},
    }}
    rng = np.random.default_rng(5)
    b, s = 4, 7
    action = rng.integers(0, in_act, (b, 1))
    feature = rng.standard_normal((b, feat)).astype(np.float32)
    h0 = rng.standard_normal((b, hid)).astype(np.float32)
    c0 = rng.standard_normal((b, hid)).astype(np.float32)
    ctx = rng.standard_normal((b, s, hid)).astype(np.float32)
    mask = np.zeros((b, s), bool)
    mask[:, -2:] = True
    import torch as th

    with th.no_grad():
        rh, rc, ralpha, rlogit = ref(th.from_numpy(action),
                                     th.from_numpy(feature),
                                     th.from_numpy(h0), th.from_numpy(c0),
                                     th.from_numpy(ctx),
                                     ctx_mask=th.from_numpy(mask))
    h, c, alpha, logit = TurnBasedDecoderLSTM(
        input_action_size=in_act, output_action_size=out_act,
        embedding_size=emb, hidden_size=hid, feature_size=feat).apply(
        params, action[:, 0], feature, h0, c0, ctx, ctx_mask=mask,
        deterministic=True)
    np.testing.assert_allclose(np.asarray(h), _t2n(rh), atol=2e-5)
    np.testing.assert_allclose(np.asarray(c), _t2n(rc), atol=2e-5)
    np.testing.assert_allclose(np.asarray(alpha), _t2n(ralpha), atol=2e-5)
    np.testing.assert_allclose(np.asarray(logit), _t2n(rlogit), atol=2e-5)


def test_masked_lstm_scan_matches_torch_pack_padded():
    """models/lstm.py claims masked ``lax.scan`` reproduces
    pack_padded_sequence semantics exactly (the reference's cuDNN encoder
    path, agent_models.py:223-310): outputs zero at pads, final (h, c) from
    each sequence's true last step.  Prove it against torch itself."""
    import torch

    from visitron_tpu.models.lstm import masked_lstm_scan

    torch.manual_seed(7)
    b, t, inp, hid = 5, 9, 12, 16
    lstm = torch.nn.LSTM(inp, hid, num_layers=1, batch_first=True).eval()
    params = {
        "wi": _t2n(lstm.weight_ih_l0), "wh": _t2n(lstm.weight_hh_l0),
        "bi": _t2n(lstm.bias_ih_l0), "bh": _t2n(lstm.bias_hh_l0),
    }
    rng = np.random.default_rng(7)
    x = rng.standard_normal((b, t, inp)).astype(np.float32)
    lengths = np.array([9, 4, 7, 1, 6])

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), torch.from_numpy(lengths), batch_first=True,
        enforce_sorted=False)
    with torch.no_grad():
        out, (hn, cn) = lstm(packed)
    out, _ = torch.nn.utils.rnn.pad_packed_sequence(out, batch_first=True,
                                                    total_length=t)

    ours, (h_last, c_last) = masked_lstm_scan(params, x, lengths)
    np.testing.assert_allclose(np.asarray(ours), _t2n(out), atol=2e-5)
    np.testing.assert_allclose(np.asarray(h_last), _t2n(hn)[0], atol=2e-5)
    np.testing.assert_allclose(np.asarray(c_last), _t2n(cn)[0], atol=2e-5)


# ---------------------------------------------------------------------------
# 5. The Oscar encoder stack itself: CaptionBertEncoder vs models.bert
# ---------------------------------------------------------------------------

def _load_oscar_modeling_bert():
    """Import /root/reference/oscar/modeling_bert.py.

    Its only dependency is ``transformers.pytorch_transformers.modeling_bert``
    (an unfetched git submodule pinning the OLD HF package); the Caption*
    subclasses override every forward and use only attributes/submodules
    (query/key/value/dropout/transpose_for_scores, BertSelfOutput,
    BertIntermediate, BertOutput) that exist IDENTICALLY in the installed
    modern transformers — so re-exporting the modern classes under the old
    module path reproduces the reference stack faithfully."""
    import importlib.util
    import sys
    import types

    import transformers.models.bert.modeling_bert as hfb

    if "transformers.pytorch_transformers.modeling_bert" not in sys.modules:
        pkg = types.ModuleType("transformers.pytorch_transformers")
        mb = types.ModuleType("transformers.pytorch_transformers.modeling_bert")

        import torch
        from torch import nn as _tnn

        class _PreTrained(hfb.BertPreTrainedModel):
            # Old-HF init pattern ``self.apply(self.init_weights)``: modern
            # init_weights takes no module arg — accept-and-delegate.
            def init_weights(self, module=None):
                if module is None:
                    return super().init_weights()
                self._init_weights(module)

        class _SelfAttention(hfb.BertSelfAttention):
            # transformers >= 4.5x dropped the classic helper and the
            # output_attentions attribute the reference forward uses;
            # restore both (standard old-HF surface).
            def __init__(self, config, **kw):
                super().__init__(config, **kw)
                self.output_attentions = config.output_attentions

            def transpose_for_scores(self, x):
                shape = x.size()[:-1] + (self.num_attention_heads,
                                         self.attention_head_size)
                return x.view(shape).permute(0, 2, 1, 3)

        for n in ("BertAttention", "BertEncoder", "BertIntermediate",
                  "BertLayer", "BertOutput", "BertSelfOutput",
                  "BertEmbeddings", "BertOnlyMLMHead", "BertPooler"):
            setattr(mb, n, getattr(hfb, n))
        mb.BertSelfAttention = _SelfAttention
        mb.BertPreTrainedModel = _PreTrained
        mb.BertLayerNorm = _tnn.LayerNorm
        pkg.modeling_bert = mb
        sys.modules["transformers.pytorch_transformers"] = pkg
        sys.modules["transformers.pytorch_transformers.modeling_bert"] = mb
    spec = importlib.util.spec_from_file_location(
        "ref_oscar_modeling_bert",
        os.path.join("/root/reference", "oscar", "modeling_bert.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_caption_bert_encoder_matches_reference_with_history_states():
    """The reference's OWN CaptionBertEncoder (oscar/modeling_bert.py:26-169:
    history_state K/V-prepend per layer) vs models.bert.BertEncoder with the
    torch weights ported (fused-QKV concat) — with and without history."""
    import torch
    from transformers import BertConfig as HFConfig

    import jax
    import jax.numpy as jnp

    from visitron_tpu.models import BertConfig
    from visitron_tpu.models.bert import BertEncoder

    mod = _load_oscar_modeling_bert()
    hf_cfg = HFConfig(vocab_size=64, hidden_size=32, num_hidden_layers=3,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, type_vocab_size=2)
    hf_cfg.output_attentions = False
    hf_cfg.output_hidden_states = False
    # Constructing HF submodules outside a PreTrainedModel: pick the eager
    # attention implementation explicitly (only its attributes are used).
    hf_cfg._attn_implementation = "eager"
    torch.manual_seed(2)
    ref = mod.CaptionBertEncoder(hf_cfg).eval()

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=3,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=2)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    g = lambda k: sd[k]
    params = {"params": {}}
    for i in range(cfg.num_hidden_layers):
        pre = f"layer.{i}."
        params["params"][f"layer_{i}"] = {
            "attention": {"qkv": {
                "kernel": np.concatenate(
                    [g(pre + "attention.self.query.weight").T,
                     g(pre + "attention.self.key.weight").T,
                     g(pre + "attention.self.value.weight").T], axis=1),
                "bias": np.concatenate(
                    [g(pre + "attention.self.query.bias"),
                     g(pre + "attention.self.key.bias"),
                     g(pre + "attention.self.value.bias")], axis=0)}},
            "attention_output": {
                "kernel": g(pre + "attention.output.dense.weight").T,
                "bias": g(pre + "attention.output.dense.bias")},
            "attention_layer_norm": {
                "scale": g(pre + "attention.output.LayerNorm.weight"),
                "bias": g(pre + "attention.output.LayerNorm.bias")},
            "intermediate": {"kernel": g(pre + "intermediate.dense.weight").T,
                             "bias": g(pre + "intermediate.dense.bias")},
            "output": {"kernel": g(pre + "output.dense.weight").T,
                       "bias": g(pre + "output.dense.bias")},
            "output_layer_norm": {
                "scale": g(pre + "output.LayerNorm.weight"),
                "bias": g(pre + "output.LayerNorm.bias")},
        }

    rng = np.random.default_rng(2)
    b, s, hist = 2, 16, 6
    hidden = rng.standard_normal((b, s, 32)).astype(np.float32)

    # -- no history ---------------------------------------------------------
    keep = np.ones((b, s), np.float32)
    keep[1, 12:] = 0.0
    bias = ((1.0 - keep) * -10000.0)[:, None, None, :].astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(hidden), torch.from_numpy(bias),
                      head_mask=[None] * cfg.num_hidden_layers)[0]
    ours = BertEncoder(cfg).apply({"params": params["params"]},
                                  jnp.asarray(hidden), jnp.asarray(bias),
                                  deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                               rtol=2e-5, atol=2e-5)

    # -- with per-layer history states (K/V prepend) ------------------------
    histories = [rng.standard_normal((b, hist, 32)).astype(np.float32)
                 for _ in range(cfg.num_hidden_layers)]
    keep_h = np.concatenate([np.ones((b, hist), np.float32), keep], axis=1)
    keep_h[0, 2] = 0.0  # mask part of the history too
    bias_h = ((1.0 - keep_h) * -10000.0)[:, None, None, :].astype(np.float32)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(hidden), torch.from_numpy(bias_h),
                      head_mask=[None] * cfg.num_hidden_layers,
                      encoder_history_states=[torch.from_numpy(h)
                                              for h in histories])[0]
    ours = BertEncoder(cfg).apply(
        {"params": params["params"]}, jnp.asarray(hidden), jnp.asarray(bias_h),
        history_states=[jnp.asarray(h) for h in histories],
        deterministic=True)
    np.testing.assert_allclose(np.asarray(ours), ref_out.numpy(),
                               rtol=2e-5, atol=2e-5)


def _load_reference_oscar_models():
    """Load tasks/viewpoint_select/encoder.py (BertImgModelwithLocationEmbeds
    + PreTrainOscar) — needs the old-HF shim plus an ``oscar`` package entry
    for its ``from oscar.modeling_bert import CaptionBertEncoder``."""
    import importlib.util
    import sys
    import types

    mod = _load_oscar_modeling_bert()
    if "oscar" not in sys.modules:
        pkg = types.ModuleType("oscar")
        pkg.modeling_bert = mod
        sys.modules["oscar"] = pkg
        sys.modules["oscar.modeling_bert"] = mod
    spec = importlib.util.spec_from_file_location(
        "ref_vp_encoder",
        "/root/reference/tasks/viewpoint_select/encoder.py")
    enc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(enc)
    return enc


def test_pretrain_oscar_full_model_matches_reference():
    """The reference's OWN PreTrainOscar (encoder.py:161-441: VisitronBert
    joint embedding + pooler + the three pretraining heads) vs our
    PretrainModel with weights ported through models/oscar_import.py:
    sequence/pooled outputs, MLM logits (tied decoder), mask/next losses and
    all accuracies match exactly; the ONLY deviation is the reference's
    token head applying Softmax BEFORE CrossEntropyLoss (feeding
    probabilities where torch expects logits — CE(softmax(x)) != CE(x)),
    which we correct; the test proves ref_token_loss == CE-of-softmax of
    OUR logits, so the deviation is exactly that documented quirk."""
    import torch
    from transformers import BertConfig as HFConfig

    import jax.numpy as jnp

    from visitron_tpu.models import BertConfig
    from visitron_tpu.models.oscar_import import convert_pretrain_to_flax
    from visitron_tpu.models.pretrain import PretrainModel, pretrain_loss

    enc_mod = _load_reference_oscar_models()
    hf_cfg = HFConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=64,
                      max_position_embeddings=64, type_vocab_size=2)
    hf_cfg.output_attentions = False
    hf_cfg.output_hidden_states = False
    hf_cfg._attn_implementation = "eager"
    hf_cfg.img_feature_dim = 24
    hf_cfg.img_feature_type = "faster_r-cnn"
    hf_cfg.use_img_layernorm = False
    hf_cfg.action_space = 9
    hf_cfg.detector_classes = 7
    torch.manual_seed(4)
    ref = enc_mod.PreTrainOscar(hf_cfg).eval()

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=2,
                     img_feature_dim=24, action_space=9, detector_classes=7,
                     use_img_layernorm=False)
    sd = {k: v.numpy() for k, v in ref.state_dict().items()}
    params = {"params": convert_pretrain_to_flax(sd, cfg)}

    rng = np.random.default_rng(4)
    b, s, n_img = 2, 12, 4
    ids = rng.integers(3, 64, (b, s)).astype(np.int32)
    segs = rng.integers(0, 2, (b, s)).astype(np.int32)
    mask = np.ones((b, s + n_img), np.int32)
    mask[1, 9:s] = 0
    img = rng.standard_normal((b, n_img, 24)).astype(np.float32)
    loc = rng.standard_normal((b, n_img, 128)).astype(np.float32)
    labels = np.full((b, s + n_img), -1, np.int64)
    labels[0, 2], labels[0, 5], labels[1, 3] = 7, 11, 19
    token_labels = np.full((b, s + n_img), -1, np.int64)
    token_labels[0, s + 1], token_labels[1, s + 3] = 2, 5
    next_action = np.array([1, 6], np.int64)

    with torch.no_grad():
        (ref_loss, ref_mask_loss, ref_next_loss, ref_token_loss,
         ref_words_acc, ref_action_acc, ref_token_acc) = ref(
            torch.from_numpy(ids.astype(np.int64)),
            token_type_ids=torch.from_numpy(segs.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            labels=torch.from_numpy(labels),
            token_labels=torch.from_numpy(token_labels),
            img_feats=torch.from_numpy(img),
            img_location_embeddings=torch.from_numpy(loc),
            next_action=torch.from_numpy(next_action))[:7]
        ref_seq, ref_pooled = ref.bert(
            torch.from_numpy(ids.astype(np.int64)),
            token_type_ids=torch.from_numpy(segs.astype(np.int64)),
            attention_mask=torch.from_numpy(mask.astype(np.int64)),
            img_feats=torch.from_numpy(img),
            img_location_embeddings=torch.from_numpy(loc))[:2]

    model = PretrainModel(cfg)
    out = model.apply(params, jnp.asarray(ids), token_type_ids=jnp.asarray(segs),
                      attention_mask=jnp.asarray(mask),
                      img_feats=jnp.asarray(img),
                      img_location_embeddings=jnp.asarray(loc),
                      deterministic=True)
    bundle = pretrain_loss(out, jnp.asarray(labels), jnp.asarray(next_action),
                           jnp.asarray(token_labels))

    np.testing.assert_allclose(np.asarray(out["sequence_output"]),
                               ref_seq.numpy(), rtol=3e-5, atol=3e-5)
    np.testing.assert_allclose(np.asarray(out["pooled_output"]),
                               ref_pooled.numpy(), rtol=3e-5, atol=3e-5)
    assert float(bundle["mask_loss"]) == pytest.approx(float(ref_mask_loss), abs=1e-5)
    assert float(bundle["next_loss"]) == pytest.approx(float(ref_next_loss), abs=1e-5)
    assert float(bundle["words_accuracy"]) == pytest.approx(float(ref_words_acc), abs=1e-6)
    assert float(bundle["action_accuracy"]) == pytest.approx(float(ref_action_acc), abs=1e-6)
    assert float(bundle["token_accuracy"]) == pytest.approx(float(ref_token_acc), abs=1e-6)
    # The documented token-head deviation: the reference's CE-of-softmax
    # reproduces EXACTLY from our raw logits.
    tl = torch.from_numpy(np.asarray(out["token_logits"], np.float32))
    ce_of_softmax = torch.nn.CrossEntropyLoss(ignore_index=-1)(
        torch.softmax(tl, dim=-1).view(-1, 7), torch.from_numpy(token_labels).view(-1))
    assert float(ref_token_loss) == pytest.approx(float(ce_of_softmax), abs=1e-5)
    assert float(bundle["token_loss"]) != pytest.approx(float(ref_token_loss), abs=1e-3)
