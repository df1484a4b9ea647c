"""Import Oscar / BERT torch checkpoints into VisitronBert flax parameters.

Covers the reference's ``load_oscar_weights`` responsibilities
(tasks/viewpoint_select/model_utils.py:36-111): loading the pretrained Oscar
(BERT-base) state dict, patching the multimodal config, and resizing
embeddings for the +3 special tokens / 4 token types / extended positions.
The torch->flax mapping fuses the per-layer Q/K/V projections into our single
qkv kernel and transposes all dense kernels.

Numerically validated against the HuggingFace BertModel in
tests/test_oscar_import.py.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from visitron_tpu.models.bert import BertConfig


def load_torch_state_dict(path: str) -> dict:
    import torch

    if os.path.isdir(path):
        path = os.path.join(path, "pytorch_model.bin")
    state = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in state.items()}


def _strip_prefix(state: dict, prefix: str) -> dict:
    if any(k.startswith(prefix) for k in state):
        return {k[len(prefix):]: v for k, v in state.items() if k.startswith(prefix)}
    return state


def resize_rows(arr: np.ndarray, new_rows: int, rng: np.random.Generator,
                init_range: float = 0.02) -> np.ndarray:
    """Grow (or truncate) the leading dim; new rows ~ N(0, init_range)
    (HF _get_resized_embeddings parity, used via model_utils.py:101-109)."""
    old = arr.shape[0]
    if new_rows == old:
        return arr
    if new_rows < old:
        return arr[:new_rows]
    extra = rng.normal(0.0, init_range, (new_rows - old,) + arr.shape[1:]).astype(arr.dtype)
    return np.concatenate([arr, extra], axis=0)


def convert_bert_to_flax(state: dict, cfg: BertConfig, seed: int = 0) -> dict:
    """torch (HF/pytorch_transformers layout) -> VisitronBert params subtree.

    ``state`` keys are expected *without* any ``bert.`` prefix (use
    ``_strip_prefix`` first).  Embedding tables are resized to cfg sizes.
    """
    rng = np.random.default_rng(seed)
    g = lambda k: np.asarray(state[k])
    p: dict = {}

    p["word_embeddings"] = {"embedding": resize_rows(
        g("embeddings.word_embeddings.weight"), cfg.vocab_size, rng,
        cfg.initializer_range)}
    p["embeddings"] = {
        "position_embeddings": {"embedding": resize_rows(
            g("embeddings.position_embeddings.weight"),
            cfg.max_position_embeddings, rng, cfg.initializer_range)},
        "token_type_embeddings": {"embedding": resize_rows(
            g("embeddings.token_type_embeddings.weight"),
            cfg.type_vocab_size, rng, cfg.initializer_range)},
        "layer_norm": {"scale": g("embeddings.LayerNorm.weight"),
                       "bias": g("embeddings.LayerNorm.bias")},
    }
    enc = {}
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        qkv_kernel = np.concatenate(
            [g(pre + "attention.self.query.weight").T,
             g(pre + "attention.self.key.weight").T,
             g(pre + "attention.self.value.weight").T], axis=1)
        qkv_bias = np.concatenate(
            [g(pre + "attention.self.query.bias"),
             g(pre + "attention.self.key.bias"),
             g(pre + "attention.self.value.bias")], axis=0)
        enc[f"layer_{i}"] = {
            "attention": {"qkv": {"kernel": qkv_kernel, "bias": qkv_bias}},
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
    p["encoder"] = enc
    p["pooler"] = {"dense": {"kernel": g("pooler.dense.weight").T,
                             "bias": g("pooler.dense.bias")}}

    def maybe_dense(torch_name, flax_name):
        if torch_name + ".weight" in state:
            p[flax_name] = {"kernel": g(torch_name + ".weight").T,
                            "bias": g(torch_name + ".bias")}

    maybe_dense("img_embedding", "img_embedding")
    maybe_dense("location_embeds", "location_embeds")
    return p


def convert_pretrain_to_flax(state: dict, cfg: BertConfig, seed: int = 0) -> dict:
    """Full PreTrainOscar checkpoint -> PretrainModel params subtree
    (heads: mlmhead -> mlm_transform/mlm_layer_norm/mlm_bias,
    next_action.linear, token_head.0; encoder.py:317-335)."""
    rng = np.random.default_rng(seed)
    bert_state = _strip_prefix(state, "bert.")
    out = {"bert": convert_bert_to_flax(bert_state, cfg, seed)}
    g = lambda k: np.asarray(state[k])
    if "mlmhead.predictions.transform.dense.weight" in state:
        out["mlm_transform"] = {
            "kernel": g("mlmhead.predictions.transform.dense.weight").T,
            "bias": g("mlmhead.predictions.transform.dense.bias")}
        out["mlm_layer_norm"] = {
            "scale": g("mlmhead.predictions.transform.LayerNorm.weight"),
            "bias": g("mlmhead.predictions.transform.LayerNorm.bias")}
        out["mlm_bias"] = resize_rows(
            g("mlmhead.predictions.bias"), cfg.vocab_size, rng, 0.0)
    if "next_action.linear.weight" in state:
        out["next_action"] = {"kernel": g("next_action.linear.weight").T,
                              "bias": g("next_action.linear.bias")}
    if "token_head.0.weight" in state:
        out["token_head"] = {"kernel": g("token_head.0.weight").T,
                             "bias": g("token_head.0.bias")}
    return out


def graft_bert_into_encoder(encoder_params: dict, model_path: str, cfg: BertConfig,
                            seed: int = 0) -> dict:
    """Load a torch Oscar/BERT checkpoint into an OscarEncoder's BERT subtree
    (the fine-tune initialization path: train.py:40 + agent.py:110-117).

    ``encoder_params`` is the OscarEncoder init result; its
    params/bert/bert/... subtree is replaced where the checkpoint provides
    weights (LSTM/projection layers keep their fresh init).
    """
    import flax

    state = load_torch_state_dict(model_path)
    state = _strip_prefix(state, "module.")
    state = _strip_prefix(state, "bert.")
    converted = convert_bert_to_flax(state, cfg, seed)
    tgt = flax.traverse_util.flatten_dict(
        encoder_params["params"]["bert"]["bert"])
    src = flax.traverse_util.flatten_dict(converted)
    for k, v in src.items():
        if k in tgt:
            assert tgt[k].shape == v.shape, (k, tgt[k].shape, v.shape)
            tgt[k] = np.asarray(v, np.float32)
    out = flax.traverse_util.unflatten_dict(tgt)
    import copy

    new = copy.deepcopy(jax.tree.map(np.asarray, encoder_params))
    new["params"]["bert"]["bert"] = out
    return new


def graft_pretrain_checkpoint_into_encoder(encoder_params: dict,
                                           model_path: str) -> dict:
    """Initialize the dialog encoder's BERT from one of OUR stage-2
    pretraining checkpoints (orbax; ``run.py pretrain`` output).

    This is the ablation-chain initialization the reference performs with
    torch checkpoints (``model_name_or_path output/.../checkpoint-30000`` in
    run_scripts/ablations/*finetune*.sh + train.py:40): the pretrained
    VisitronBert subtree replaces the encoder's fresh BERT; LSTM/projection
    layers keep their init.  ``model_path`` may name a specific
    ``.../checkpoint-N`` directory or a pretraining output dir (latest
    completed checkpoint wins).
    """
    import re

    import flax

    from visitron_tpu.train.checkpoint import CheckpointManager

    base = os.path.basename(os.path.normpath(model_path))
    m = re.fullmatch(r"checkpoint-(\d+)", base)
    if m:
        mgr = CheckpointManager(os.path.dirname(os.path.normpath(model_path)))
        step = int(m.group(1))
    else:
        mgr = CheckpointManager(model_path)
        step = mgr.latest()
        if step is None:
            raise FileNotFoundError(
                f"no completed pretraining checkpoint under {model_path}")
    restored = mgr.restore_raw(step)
    src = flax.traverse_util.flatten_dict(restored["params"]["bert"])
    tgt = flax.traverse_util.flatten_dict(
        encoder_params["params"]["bert"]["bert"])
    replaced = 0
    for k, v in src.items():
        if k in tgt:
            assert tgt[k].shape == v.shape, (k, tgt[k].shape, v.shape)
            tgt[k] = np.asarray(v, np.float32)
            replaced += 1
    if not replaced:
        raise ValueError(f"checkpoint at {model_path} shares no BERT "
                         "parameters with the encoder (wrong dims?)")
    out = flax.traverse_util.unflatten_dict(tgt)
    import copy

    new = copy.deepcopy(jax.tree.map(np.asarray, encoder_params))
    new["params"]["bert"]["bert"] = out
    return new


def is_pretrain_checkpoint(model_path: str) -> bool:
    """True when ``model_path`` is one of OUR orbax pretraining outputs (a
    ``checkpoint-N`` dir or a run dir containing completed ones) rather than
    a torch ``pytorch_model.bin`` checkpoint."""
    if not os.path.isdir(model_path):
        return False
    if os.path.exists(os.path.join(model_path, "pytorch_model.bin")):
        return False
    if os.path.isdir(os.path.join(model_path, "params")):
        return True
    try:
        entries = os.listdir(model_path)
    except OSError:
        return False
    return any(e.startswith("checkpoint-") for e in entries)


def load_oscar_weights(model_path: str, cfg: BertConfig, template_params: dict,
                       seed: int = 0) -> dict:
    """Load a torch Oscar/BERT checkpoint into a full params pytree, keeping
    template values for any missing heads (fresh init backfill)."""
    import flax

    state = load_torch_state_dict(model_path)
    state = _strip_prefix(state, "module.")  # DDP-saved checkpoints
    converted = convert_pretrain_to_flax(state, cfg, seed)
    flat_t = flax.traverse_util.flatten_dict(template_params["params"])
    flat_c = flax.traverse_util.flatten_dict(converted)
    missing = [k for k in flat_t if k not in flat_c]
    for k, v in flat_c.items():
        if k in flat_t:
            assert flat_t[k].shape == v.shape, (k, flat_t[k].shape, v.shape)
            flat_t[k] = v.astype(np.float32)
    out = {"params": flax.traverse_util.unflatten_dict(flat_t)}
    return out
