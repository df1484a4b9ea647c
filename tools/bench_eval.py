"""Eval/serving-path throughput: the one-dispatch argmax rollout.

The production inference path (the reference's ``agent.test(feedback=argmax)``
loop, tasks/viewpoint_select/agent.py:49-63 + train.py:326) is here a SINGLE
device dispatch per batch: BERT dialog encode + an episode-length
``lax.scan`` of decode/act steps, all on device
(agents/viewpoint.py:_device_rollout_fn).  This tool measures that program
at reference model scale and prints one JSON line per episode length.

Timing uses the on-device loop (utils/benchmark.time_fn): host-side timing
on this environment's remote-relay TPU measures RPC enqueue, not compute
(see bench.py docstring).  Within-window numbers; the relay carries ~±25%
cross-window variance.

``measure(episode_len)`` is importable (bench.py's ``secondary`` block
records the serving north star officially in BENCH_r*.json).

Usage: python tools/bench_eval.py   (TPU; a few compiles through the relay)
Env: BENCH_BATCH (default 64), BENCH_TINY=1 for a CPU mechanics smoke.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TINY = os.environ.get("BENCH_TINY", "0") == "1"
BATCH = int(os.environ.get("BENCH_BATCH", 4 if TINY else 64))
SEQ = 64 if TINY else 512
FEAT_DIM = 32 if TINY else 2048
EPISODE_LENS = (2,) if TINY else (10, 40)
N_LO, N_HI = (1, 3) if TINY else (3, 13)


def measure(episode_len: int, batch: int = BATCH, repeats: int = 3) -> dict:
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
    from visitron_tpu.utils.benchmark import PEAK_BF16_FLOPS, time_fn

    world = SyntheticWorld(
        seed=3, num_scans=1 if TINY else 4,
        viewpoints_per_scan=12 if TINY else 60, scene_feat_dim=FEAT_DIM,
        dialog_turns=(2, 6), words_per_turn=(10, 30))
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=4096))
    with tempfile.TemporaryDirectory() as d:
        root = world.write_task_data(d, counts={"val_unseen": 128})
        instances = build_nav_instances(root, ["val_unseen"], tok,
                                        max_seq_length=SEQ)

    cfg = BertConfig(vocab_size=len(tok), max_position_embeddings=SEQ,
                     type_vocab_size=4, dtype=jnp.bfloat16,
                     **({"num_hidden_layers": 2, "hidden_size": 128,
                         "num_attention_heads": 2, "intermediate_size": 256}
                        if TINY else {}))
    peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)

    agent = ViewpointAgent(cfg, runtime, feature_dim=FEAT_DIM,
                           episode_len=episode_len, max_seq_length=SEQ)
    params = agent.init_state()["params"]
    batcher = NavEpisodeBatcher(instances, runtime, batch_size=batch)
    b = agent.trim_batch(next(iter(batcher.eval_batches())))
    rollout = agent._device_rollout_fn("argmax")
    rng = jax.random.PRNGKey(0)
    args = (runtime, params, jnp.asarray(b["ids"]),
            jnp.asarray(b["segs"]), jnp.asarray(b["lengths"]),
            jnp.asarray(b["start_rows"]),
            jnp.asarray(b["start_views"]), rng)

    # Fold the (integer) trajectory outputs into a float scalar so the
    # timing loop carries a real data dependence on the rollout — without
    # it XLA could hoist or dead-code the body (time_fn's perturbation
    # only rides floating-point outputs).
    def timed(rt, p, ids, segs, lengths, rows0, views0, r):
        rows, views, moved = rollout(rt, p, ids, segs, lengths,
                                     rows0, views0, r)
        return (rows.astype(jnp.float32).sum()
                + moved.astype(jnp.float32).sum())

    ms = time_fn(timed, *args, n_lo=N_LO, n_hi=N_HI,
                 repeats=1 if TINY else repeats)
    out = {
        "metric": "ndh_eval_rollout_throughput",
        "episodes_per_sec_per_chip": round(
            batch / (ms / 1000.0) / max(jax.local_device_count(), 1), 2),
        "actions_per_sec_per_chip": round(
            batch * episode_len / (ms / 1000.0)
            / max(jax.local_device_count(), 1), 2),
        "batch": batch, "episode_len": episode_len,
        "seq_bucket": int(b["ids"].shape[1]),
        "ms_per_batch": round(ms, 2),
        "device": jax.devices()[0].device_kind,
    }
    try:
        cost = rollout.lower(*args).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        if flops and peak:
            out["mfu_cost_model"] = round(flops / (ms / 1000.0) / peak, 4)
            out["batch_tflops"] = round(flops / 1e12, 3)
    except Exception:
        pass
    return out


def main() -> None:
    import jax

    if TINY:
        jax.config.update("jax_platforms", "cpu")
    for episode_len in EPISODE_LENS:
        print(json.dumps(measure(episode_len)), flush=True)


if __name__ == "__main__":
    main()
