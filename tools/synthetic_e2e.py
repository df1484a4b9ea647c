"""End-to-end science run on a synthetic world at reference model scale.

Trains the viewpoint-selection agent (BERT-base dialog encoder, 2048-d scene
features) on synthetic NDH episodes and reports Goal Progress / Success Rate
on its training episodes before and after training (overfit check) — the
full train -> rollout -> Evaluator loop exercised at real sizes on the
available accelerator.  Prints one JSON line per evaluation.

Usage: python tools/synthetic_e2e.py [--iters 300] [--batch 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--episodes", type=int, default=200)
    ap.add_argument("--seq", type=int, default=512)
    # Reference-default workload: --episode-len 40 --path-type trusted_path
    # (train.py:551-554 maps trusted_path/player_path to max_episode_len 40).
    ap.add_argument("--episode-len", type=int, default=10)
    ap.add_argument("--path-type", default="planner_path",
                    choices=["planner_path", "player_path", "trusted_path"])
    ap.add_argument("--remat", action="store_true",
                    help="layer-wise rematerialization (fit longer episodes)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.evaluation import Evaluator
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS

    world = SyntheticWorld(seed=5, num_scans=4, viewpoints_per_scan=50,
                           scene_feat_dim=2048)
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=4096))
    with tempfile.TemporaryDirectory() as d:
        world.write_task_data(d, counts={"train": args.episodes})
        train_inst = build_nav_instances(d, ["train"], tok, max_seq_length=args.seq)
        # Synthetic dialogs are random text: there is nothing to generalize
        # from, so the meaningful end-to-end signal is fitting the training
        # episodes (rollouts must reach their goals after training).
        val_inst = train_inst[:48]

    cfg = BertConfig(vocab_size=len(tok), max_position_embeddings=args.seq,
                     type_vocab_size=4, dtype=jnp.bfloat16, remat=args.remat)
    agent = ViewpointAgent(cfg, runtime, feature_dim=2048,
                           episode_len=args.episode_len,
                           max_seq_length=args.seq, learning_rate=1e-4)
    train_b = NavEpisodeBatcher(train_inst, runtime, batch_size=args.batch,
                                path_type=args.path_type)
    val_b = NavEpisodeBatcher(val_inst, runtime, batch_size=args.batch,
                              path_type=args.path_type)
    evaluator = Evaluator([it.raw for it in val_inst], world.graphs,
                          path_type=args.path_type)

    def evaluate(params, tag, step):
        results = agent.test(params, val_b.eval_batches(), feedback="argmax")
        scored = {k: v for k, v in results.items() if k in evaluator.instr_ids}
        summary, _ = evaluator.score_results(scored)
        print(json.dumps({"tag": tag, "step": step,
                          "gp": round(summary["dist_to_end_reduction"], 3),
                          "sr": round(summary["success_rate"], 3),
                          "spl": round(summary["spl"], 3),
                          "ndtw": round(summary["ndtw"], 3)}), flush=True)
        return summary

    state = agent.init_state()
    evaluate(state["params"], "before", 0)
    step = agent.train_step_fn()
    t0 = time.time()
    for i, batch in enumerate(train_b.train_batches(args.iters,
                                                    episode_len=args.episode_len)):
        jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
        state, loss = step(state, jb)
        if (i + 1) % 50 == 0:
            print(json.dumps({"tag": "train", "step": i + 1,
                              "loss": round(float(loss), 4),
                              "actions_per_sec": round(
                                  args.batch * args.episode_len * (i + 1)
                                  / (time.time() - t0), 1)}),
                  flush=True)
    summary = evaluate(state["params"], "after", args.iters)
    assert np.isfinite(summary["dist_to_end_reduction"])


if __name__ == "__main__":
    main()
