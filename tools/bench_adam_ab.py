"""Within-window A/B: fp32 vs bf16 Adam moments on the nav train step.

Runs the bench.py protocol's timed window twice in ONE session — identical
shapes, same relay-load regime — toggling only the optimizer-state dtype,
so the comparison is immune to the documented ±25% cross-window relay
variance.  Prints one JSON line per arm plus the speedup.

Usage: python tools/bench_adam_ab.py  (TPU; ~2 compiles of the train step)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 64))
EPISODE_LEN = int(os.environ.get("BENCH_EPISODE_LEN", 10))
PATH_TYPE = os.environ.get("BENCH_PATH_TYPE", "planner_path")
# BENCH_TINY=1: CPU-sized harness smoke (mechanics only, meaningless numbers).
TINY = os.environ.get("BENCH_TINY", "0") == "1"
SEQ = 64 if TINY else 512
FEAT_DIM = 32 if TINY else 2048
TIMED_STEPS = 2 if TINY else 20


def main() -> None:
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    from visitron_tpu.utils.benchmark import stack_batches, time_step_fn

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    world = SyntheticWorld(
        seed=3, num_scans=1 if TINY else 4,
        viewpoints_per_scan=12 if TINY else 60, scene_feat_dim=FEAT_DIM,
        dialog_turns=(2, 6), words_per_turn=(10, 30))
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=4096))
    with tempfile.TemporaryDirectory() as d:
        root = world.write_task_data(d, counts={"train": 128})
        instances = build_nav_instances(root, ["train"], tok, max_seq_length=SEQ)

    if TINY:
        cfg = BertConfig(vocab_size=len(tok), hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=32, max_position_embeddings=SEQ,
                         type_vocab_size=4)
    else:
        cfg = BertConfig(vocab_size=len(tok), max_position_embeddings=SEQ,
                         type_vocab_size=4, dtype=jnp.bfloat16)
    batcher = NavEpisodeBatcher(instances, runtime, batch_size=BATCH,
                                path_type=PATH_TYPE)
    batches = [
        {k: np.asarray(v) for k, v in b.items() if not isinstance(v, list)}
        for b in batcher.train_batches(8, episode_len=EPISODE_LEN)
    ]

    results = {}
    for bf16 in (False, True):
        agent = ViewpointAgent(cfg, runtime, feature_dim=FEAT_DIM,
                               episode_len=EPISODE_LEN, max_seq_length=SEQ,
                               bf16_adam_moments=bf16)
        state = agent.init_state()
        train_step = agent.train_step_jit()

        groups: dict[int, list] = {}
        for b in batches:
            t = agent.trim_batch(b)
            groups.setdefault(t["ids"].shape[1], []).append(t)

        total_ms = 0.0
        for seq_len, group in sorted(groups.items()):
            stacked = stack_batches(group)
            ms, _ = time_step_fn(train_step, state, stacked,
                                 n_lo=5, n_hi=5 + TIMED_STEPS,
                                 repeats=3, detail=True,
                                 extra_args=(runtime,))
            total_ms += ms * len(group)
        actions = BATCH * EPISODE_LEN * len(batches)
        aps = actions / (total_ms / 1e3)
        results["bf16" if bf16 else "fp32"] = aps
        print(json.dumps({"arm": "bf16_adam" if bf16 else "fp32_adam",
                          "actions_per_sec_per_chip": round(aps, 2),
                          "step_ms_total": round(total_ms, 2)}), flush=True)

    print(json.dumps({"speedup_bf16_over_fp32":
                      round(results["bf16"] / results["fp32"], 4)}), flush=True)


if __name__ == "__main__":
    main()
