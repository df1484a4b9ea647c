"""Profile the production-scale nav train step and summarize op time.

Closes the nav-MFU roofline argument (VALIDATION.md) with trace evidence:
captures a jax.profiler trace of the exact bench.py train step (BERT-base
dialog encode + 10-step scan + full BPTT, batch 64) and prints the top ops
by self time with their category, so the "remaining ~5-10 ms is
bandwidth-bound LN/residual/GELU boundaries" claim cites measured numbers
instead of ablation timing.

The xplane protobuf is parsed with tensorboard_plugin_profile (installed in
this image).  On the remote-relay TPU the device trace rides the relay; if
the capture comes back host-only (no device planes), the tool says so
explicitly rather than printing a misleading summary.

Usage: python tools/profile_nav_step.py [outdir]   (defaults to /tmp/navprof)
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = int(os.environ.get("BENCH_BATCH", 64))
SEQ = 512
FEAT_DIM = 2048
EPISODE_LEN = 10


def build_step():
    import jax
    import jax.numpy as jnp

    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    import tempfile

    jax.config.update("jax_default_prng_impl", "rbg")
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
    batch = agent.trim_batch(next(batcher.train_batches(1,
                                                        episode_len=EPISODE_LEN)))
    batch = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    state = agent.init_state()
    step = agent.train_step_jit()
    return step, state, batch, runtime


def summarize_xspace(logdir: str, top: int = 20, steps: int = 3) -> dict | None:
    """Parse the captured xplane(s) into per-step op-time groups.

    Reads the device plane directly with the xplane proto that ships inside
    this image's tensorflow (the tensorboard_plugin_profile converter is
    version-incompatible with tf 2.20 here: its _pywrap hook is gone and its
    _pb2 files predate protobuf 4).  Groups the "XLA Ops" line by HLO name
    prefix (%fusion / %attention / %copy / ...), which maps cleanly onto
    compute vs bandwidth vs control categories.  Returns None when no device
    plane was captured (e.g. a relay that returned host-only traces)."""
    files = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not files:
        return None
    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    groups: dict[str, float] = defaultdict(float)
    ops: dict[str, float] = defaultdict(float)
    step_ms = 0.0
    found_device = False
    for path in files:
        xs = xplane_pb2.XSpace()
        with open(path, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if not plane.name.startswith("/device:TPU"):
                continue
            found_device = True
            md = {m.id: m for m in plane.event_metadata.values()}
            for line in plane.lines:
                if line.name == "Steps":
                    step_ms += sum(e.duration_ps for e in line.events) / 1e9
                if line.name != "XLA Ops":
                    continue
                for e in line.events:
                    name = md[e.metadata_id].name
                    ms = e.duration_ps / 1e9
                    ops[name.split(" ")[0]] += ms
                    groups[name.split(".")[0].split(" ")[0]] += ms
    if not found_device:
        return None
    return {
        "ms_per_step": round(step_ms / max(steps, 1), 2),
        "groups_ms_per_step": {
            k: round(v / max(steps, 1), 2)
            for k, v in sorted(groups.items(), key=lambda kv: -kv[1])[:top]},
        "top_ops_ms_per_step": {
            k[:80]: round(v / max(steps, 1), 2)
            for k, v in sorted(ops.items(), key=lambda kv: -kv[1])[:top]},
        "raw_files": files,
    }


def main() -> None:
    import jax

    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/navprof"
    os.makedirs(outdir, exist_ok=True)
    step, state, batch, runtime = build_step()
    # Warm/compile outside the trace.
    state, loss = step(state, batch, runtime)
    print("warm loss:", float(loss), flush=True)
    jax.profiler.start_trace(outdir)
    for _ in range(3):
        state, loss = step(state, batch, runtime)
    _ = float(loss)  # force execution inside the trace window
    jax.profiler.stop_trace()
    summary = summarize_xspace(outdir)
    if summary is None:
        print(json.dumps({
            "error": "no xplane captured — the relay backend did not return "
                     "a device trace; roofline remains ablation-argued"}))
        return
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
