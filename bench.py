"""Headline benchmark: NDH viewpoint fine-tuning throughput (nav actions/sec/chip).

Measures the full training path — BERT dialog encoder (512 tokens) once per
episode, 10 teacher-forced decoder steps over panorama/candidate features,
full-BPTT backward, Adam update — at reference-parity model scale (BERT-base
encoder, 2048-d scene features + 4-d angle, rnn 512) on one chip, using a
synthetic world with Matterport-like graph stats.

Baseline: the reference trains NDH fine-tuning with DDP on 4 GPUs at per-GPU
batch 8 (run_scripts/viewpoint_train/pretrain_ndh_r2r.sh), stepping a C++
simulator and shipping (B,36,2052)+(B,K,2052) float features host->device
every rollout step with a device->host action sync (agent.py:379-441).
BASELINE.md records no published numbers; we use a documented estimate of
25 nav actions/sec/chip for the reference path (batch 8 x 10 steps per
~3.2 s/iter per GPU — 2020-era V100-class hardware, torch 1.6, dominated by
the 512-token BERT encode + per-step host/sim round trips).  The driver's
north star is >=10x this (BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_ACTIONS_PER_SEC_PER_CHIP = 25.0
BATCH = 64
EPISODE_LEN = 10
SEQ = 512
FEAT_DIM = 2048
TIMED_STEPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import SceneFeatureTable, WordPieceTokenizer, build_wordpiece_vocab
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    import tempfile

    # Dialog lengths follow the NDH profile (several QA turns, ~60-250
    # wordpiece tokens): the framework buckets padded length to 128-multiples,
    # so throughput is measured on realistic, not degenerate, dialog lengths.
    world = SyntheticWorld(seed=3, num_scans=4, viewpoints_per_scan=60,
                           scene_feat_dim=FEAT_DIM,
                           dialog_turns=(2, 6), words_per_turn=(10, 30))
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=4096))
    with tempfile.TemporaryDirectory() as d:
        root = world.write_task_data(d, counts={"train": 128})
        instances = build_nav_instances(root, ["train"], tok, max_seq_length=SEQ)

    cfg = BertConfig(vocab_size=len(tok), max_position_embeddings=SEQ,
                     type_vocab_size=4, dtype=jnp.bfloat16)
    agent = ViewpointAgent(cfg, runtime, feature_dim=FEAT_DIM,
                           episode_len=EPISODE_LEN, max_seq_length=SEQ)
    batcher = NavEpisodeBatcher(instances, runtime, batch_size=BATCH,
                                path_type="planner_path")
    batches = [
        {k: np.asarray(v) for k, v in b.items() if not isinstance(v, list)}
        for b in batcher.train_batches(4, episode_len=EPISODE_LEN)
    ]

    state = agent.init_state()
    step = agent.train_step_fn()
    # Warmup/compile.
    state, loss = step(state, batches[0])
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for i in range(TIMED_STEPS):
        state, loss = step(state, batches[i % len(batches)])
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    actions = BATCH * EPISODE_LEN * TIMED_STEPS
    per_chip = actions / dt / max(jax.local_device_count(), 1)
    print(json.dumps({
        "metric": "ndh_finetune_nav_actions_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "actions/s/chip",
        "vs_baseline": round(per_chip / BASELINE_ACTIONS_PER_SEC_PER_CHIP, 2),
    }))


if __name__ == "__main__":
    main()
