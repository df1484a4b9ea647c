"""Auxiliary-workload throughput on the real TPU: turn-based, classifier,
speaker train steps.

bench.py covers the headline NDH viewpoint fine-tune and tools/bench_pretrain
covers pretraining; this tool measures the remaining trainable workloads at
reference model scale (BERT-base encoder, 2048-d scene features, 512-token
dialogs) with the on-device fori-loop timing harness, one JSON line each:

  * turn_based  — low-level 6-action training step (reference
    tasks/turn_based/train.py; per-GPU batch 4 in the run scripts),
  * classifier  — question-asking BCE step with frozen nav encoder
    (train_classifier.py; reference per-GPU batch 1),
  * speaker     — trajectory->instruction speaker step (the wired extension).

Weights are random (identical FLOPs/memory to trained weights).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEQ = 512
FEAT_DIM = 2048
# BENCH_TASKS_SMALL=1: tiny dims on the CPU backend — an API/wiring smoke
# (used by the test suite), not a measurement.
SMALL = os.environ.get("BENCH_TASKS_SMALL", "0") == "1"


def dominant_shape_group(batches: list[dict]) -> list[dict]:
    """The largest same-shapes subset (one jit program; stackable pool)."""
    from collections import Counter

    def sig(b):
        return tuple(sorted((k, v.shape) for k, v in b.items()))

    dom = Counter(sig(b) for b in batches).most_common(1)[0][0]
    return [b for b in batches if sig(b) == dom]


def main() -> None:
    import jax

    if SMALL:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from visitron_tpu.agents import NavRuntime
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.agents.classifier import ClassifierAgent
    from visitron_tpu.agents.speaker import SpeakerAgent
    from visitron_tpu.agents.turn_based import TurnBasedAgent
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.classifier_dataset import build_classifier_instances
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    from visitron_tpu.utils.benchmark import stack_batches, time_step_fn

    device = jax.devices()[0].device_kind
    seq, feat_dim = (64, 32) if SMALL else (SEQ, FEAT_DIM)
    world = SyntheticWorld(seed=3, num_scans=2 if SMALL else 4,
                           viewpoints_per_scan=16 if SMALL else 60,
                           scene_feat_dim=feat_dim,
                           dialog_turns=(2, 6), words_per_turn=(10, 30))
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=4096))
    import shutil

    tmp = tempfile.mkdtemp(prefix="bench_tasks_")
    import atexit

    atexit.register(shutil.rmtree, tmp, True)
    root = world.write_task_data(tmp, counts={"train": 128})
    instances = build_nav_instances(root, ["train"], tok, max_seq_length=seq)
    if SMALL:
        cfg = BertConfig(vocab_size=len(tok), hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=4,
                         intermediate_size=64, max_position_embeddings=seq,
                         type_vocab_size=4)
    else:
        cfg = BertConfig(vocab_size=len(tok), max_position_embeddings=seq,
                         type_vocab_size=4, dtype=jnp.bfloat16)

    def report(name, batch_size, episode_len, ms, windows):
        print(json.dumps({
            "metric": f"{name}_train_examples_per_sec_per_chip",
            "value": round(batch_size * 1000.0 / ms, 2),
            "unit": "examples/s/chip", "step_ms": round(ms, 2),
            "batch": batch_size, "episode_len": episode_len,
            "device": device,
            "spread_ms": {"min": round(min(windows), 2),
                          "max": round(max(windows), 2)},
        }), flush=True)

    def run(name, agent, batches, batch_size, episode_len):
        # A pool of one (or identical) batches lets XLA hoist batch-only
        # subcomputations out of the timing loop (utils/benchmark.py PITFALL
        # — measured 19 -> 0.5 ms on the classifier's frozen encode).
        assert len(batches) >= 2, f"{name}: timing pool needs >= 2 batches"
        first = jax.tree.leaves(batches[0])[0]
        assert not all(np.array_equal(first, jax.tree.leaves(b)[0])
                       for b in batches[1:]), f"{name}: pool batches identical"
        state = agent.init_state()
        step = agent.train_step_jit()
        stacked = stack_batches(batches)
        ms, windows = time_step_fn(step, state, stacked, n_lo=3, n_hi=13,
                                   detail=True, extra_args=(runtime,))
        report(name, batch_size, episode_len, ms, windows)

    small_kw = ({"rnn_dim": 16, "encoder_hidden_size": 16} if SMALL else {})

    # -- turn-based: low-level 6-action decoder over per-view features ------
    tb_batch, tb_T = (8, 6) if SMALL else (64, 40)
    agent = TurnBasedAgent(cfg, runtime, feature_dim=feat_dim, episode_len=tb_T,
                           max_seq_length=seq, **small_kw)
    batcher = NavEpisodeBatcher(instances, runtime, batch_size=tb_batch,
                                path_type="trusted_path")
    from visitron_tpu.agents import ViewpointAgent

    batches = []
    for b in batcher.train_batches(8):
        b = batcher.with_turn_teacher(b, tb_T)
        b = {k: np.asarray(v) for k, v in b.items() if not isinstance(v, list)}
        # The production path length-buckets dialogs (_place_batch ->
        # ViewpointAgent.trim_batch); time the same shapes it runs.
        batches.append(ViewpointAgent.trim_batch(b))
    run("turn_based", agent, dominant_shape_group(batches), tb_batch, tb_T)

    # -- classifier: per-step question-asking BCE, frozen-nav encode --------
    cl_batch, cl_T = (4, 6) if SMALL else (8, 40)
    cl_instances = build_classifier_instances(root, ["train"], tok,
                                              max_seq_length=seq)
    cagent = ClassifierAgent(cfg, runtime, feature_dim=feat_dim,
                             episode_len=cl_T, max_seq_length=seq, **small_kw)
    cbatches = []
    for s in range(0, 8 * cl_batch, cl_batch):
        idx = [(s + j) % len(cl_instances) for j in range(cl_batch)]
        b = cagent.prepare_batch([cl_instances[i] for i in idx])
        cbatches.append({k: np.asarray(v) for k, v in b.items()
                         if not isinstance(v, list)})
    # prepare_batch shapes vary with content (snapshot length buckets, the
    # max_encode_events-rounded event dim) — stack only one shape group.
    run("classifier", cagent, dominant_shape_group(cbatches), cl_batch, cl_T)

    # -- speaker: trajectory -> instruction word-CE -------------------------
    sp_batch, sp_T = (8, 4) if SMALL else (64, 10)
    speaker = SpeakerAgent(runtime=runtime, feature_dim=feat_dim,
                           vocab_size=len(tok),
                           bos_id=tok.vocab[tok.cls_token],
                           eos_id=tok.vocab[tok.sep_token],
                           pad_id=tok.pad_token_id, episode_len=sp_T,
                           **({"hidden_size": 32, "wemb": 16} if SMALL else {}))
    text_by_idx = {i.inst_idx: SpeakerAgent.instance_text(i) for i in instances}
    sbatcher = NavEpisodeBatcher(instances, runtime, batch_size=sp_batch,
                                 path_type="planner_path")
    sbatches = [speaker.attach_words(b, tok, text_by_idx)
                for b in sbatcher.train_batches(4, episode_len=sp_T)]
    run("speaker", speaker, sbatches, sp_batch, sp_T)


if __name__ == "__main__":
    main()
