"""Real-Matterport-scale residency smoke (REALDATA readiness).

The production deployment keeps the WHOLE world on device: 10,800 viewpoints
x 36 views x 2048-d scene features (~1.6 GB bf16) plus candidate/next-hop
tables, passed to the jitted train step as arguments (VALIDATION.md "world
tables as jit arguments").  This script proves that shape on the real chip:

  * builds a synthetic world with Matterport's exact statistics
    (90 scans x 120 viewpoints, precompute_bottom-up_features.py:410-420
    accounting),
  * packs + places the full bf16 table set,
  * runs TWO full train steps at the headline protocol (BERT-base, batch 64,
    episode_len 10) AND at the reference-default trusted_path shape
    (episode_len 40), printing losses and device memory stats.

Success = finite losses at both shapes with the full-scale tables resident —
the only real-data unknowns left are the asset bytes themselves (REALDATA.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEQ = 512
FEAT_DIM = 2048
BATCH = 64


def main() -> None:
    import jax

    jax.config.update("jax_default_prng_impl", "rbg")
    import jax.numpy as jnp
    import ml_dtypes

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    import tempfile

    t0 = time.time()
    world = SyntheticWorld(seed=7, num_scans=90, viewpoints_per_scan=120,
                           scene_feat_dim=FEAT_DIM,
                           dialog_turns=(2, 6), words_per_turn=(10, 30))
    # bf16 on the HOST so the one-time relay transfer is 1.6 GB, not 3.2.
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(),
                                   vfov=60, dtype=ml_dtypes.bfloat16)
    runtime = NavRuntime.build(world.graphs, table, device_dtype=jnp.bfloat16)
    n_vps = table.table.shape[0]
    print(f"world built: {n_vps} viewpoints, table "
          f"{table.table.nbytes / 1e9:.2f} GB bf16, {time.time() - t0:.0f}s",
          flush=True)

    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=4096))
    with tempfile.TemporaryDirectory() as d:
        root = world.write_task_data(d, counts={"train": 128})
        instances = build_nav_instances(root, ["train"], tok, max_seq_length=SEQ)

    cfg = BertConfig(vocab_size=len(tok), max_position_embeddings=SEQ,
                     type_vocab_size=4, dtype=jnp.bfloat16)
    for path_type, episode_len in (("planner_path", 10), ("trusted_path", 40)):
        agent = ViewpointAgent(cfg, runtime, feature_dim=FEAT_DIM,
                               episode_len=episode_len, max_seq_length=SEQ)
        batcher = NavEpisodeBatcher(instances, runtime, batch_size=BATCH,
                                    path_type=path_type)
        batch = next(batcher.train_batches(1, episode_len=episode_len))
        batch = {k: np.asarray(v) for k, v in batch.items()
                 if not isinstance(v, list)}
        batch = agent.trim_batch(batch)
        state = agent.init_state()
        step = agent.train_step_jit()
        t1 = time.time()
        state, loss = step(state, batch, runtime)
        l0 = float(loss)
        state, loss = step(state, batch, runtime)
        l1 = float(loss)
        assert np.isfinite(l0) and np.isfinite(l1), (l0, l1)
        stats = {}
        try:
            ms = jax.local_devices()[0].memory_stats() or {}
            stats = {k: round(v / 2**30, 2) for k, v in ms.items()
                     if k in ("bytes_in_use", "peak_bytes_in_use",
                              "bytes_limit")}
        except Exception:
            pass
        print(json.dumps({
            "shape": f"T={episode_len} {path_type} batch={BATCH}",
            "viewpoints": int(n_vps), "losses": [round(l0, 4), round(l1, 4)],
            "first_two_steps_s": round(time.time() - t1, 1),
            "device_mem_gib": stats,
        }), flush=True)
    print("realscale smoke ok", flush=True)


if __name__ == "__main__":
    main()
