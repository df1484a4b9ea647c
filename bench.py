"""Headline benchmark: NDH viewpoint fine-tuning throughput (nav actions/sec/chip).

Measures the full training path — BERT dialog encoder (512 tokens) once per
episode, 10 teacher-forced decoder steps over panorama/candidate features,
full-BPTT backward, Adam update — at reference-parity model scale (BERT-base
encoder, 2048-d scene features + 4-d angle, rnn 512) on one chip, using a
synthetic world with Matterport-like graph stats.

Reported numbers:
  * value            — nav actions (batch x episode steps) per second per chip.
  * mfu              — model FLOPs utilization: the XLA cost model's FLOPs for
                       one train step (jit .cost_analysis()) divided by
                       (measured step time x chip peak bf16 FLOPs).
  * vs_baseline      — against a DERIVED speed-of-light upper bound for the
                       reference's per-GPU path, not a measured number (the
                       reference repo publishes none, BASELINE.md):

Reference upper-bound derivation (favors the reference):
  The reference trains fp32 on 2020-era V100-class GPUs (torch 1.6, no AMP in
  any run script; Dockerfile CUDA 10.2).  Per iteration at per-GPU batch 8:
  the BERT-base dialog encode of 8x512 tokens costs >= 6*P*T FLOPs
  (fwd+bwd, P = 85M encoder matmul params, T = 4096 tokens) ~ 2.1 TFLOP,
  so >= 0.134 s at V100 fp32 peak 15.7 TFLOPs even at 100% MFU.
  The 10 decoder steps each require a device->host action sync, per-item C++
  simulator stepping, and a (8,36,2052)+(8,K,2052) f32 feature H2D copy
  (agent.py:379-441): >= 9.5 MB/step, ~8 ms on PCIe3 + >= 2 ms
  latency/dispatch floor -> >= 0.10 s/iter.  Lower bound ~0.23 s/iter =
  80 actions / 0.23 s ~ 350 actions/s/GPU at physically impossible 100%
  efficiency; at a generous 40% end-to-end efficiency ~ 140 actions/s/GPU.
  We use BASELINE_ACTIONS_PER_SEC_PER_CHIP = 140 (so vs_baseline is a floor
  on the true speedup; the previously documented estimate from observed
  ~3.2 s/iter torch runs was 25 actions/s/GPU, i.e. 5.6x lower).

Timing method: the step runs inside ONE jitted ``lax.fori_loop`` (batch pool
indexed by iteration) and time is taken between two host fetches of the final
loss scalar, differencing two iteration counts to cancel the RPC constant —
see visitron_tpu/utils/benchmark.py.  Absolute numbers on the remote-relay
chip carry ~±25% run-to-run variance from external load on the relay host
(measured: identical code at 117/163/184 ms across sessions, VALIDATION.md);
within-run comparisons are reliable.  On this environment's remote-attached
TPU, ``jax.block_until_ready`` returns without syncing, so host-side loop
timing measures RPC enqueue rather than compute; the on-device loop measures
true step time (validated at 97% of v5e peak on a bare 4096^3 matmul).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "mfu", ...}.
"""

from __future__ import annotations

import json
import os

import numpy as np

def derived_reference_baseline() -> float:
    """The reference's speed-of-light actions/s/GPU, from named inputs.

    Reproduces the docstring derivation so ``vs_baseline`` is auditable
    (tests/test_tools.py pins the published 140 to this arithmetic):
    fp32 V100, per-GPU batch 8, BERT-base dialog encode + 10 synced decoder
    steps with per-step H2D feature copies (agent.py:379-441).
    """
    ENCODER_MATMUL_PARAMS = 85e6        # BERT-base matmul params
    TOKENS_PER_ITER = 8 * 512           # batch 8 x 512-token dialogs
    FLOPS_PER_PARAM_TOKEN = 6.0         # fwd + bwd
    V100_FP32_PEAK = 15.7e12
    encode_s = (FLOPS_PER_PARAM_TOKEN * ENCODER_MATMUL_PARAMS
                * TOKENS_PER_ITER / V100_FP32_PEAK)        # ~0.133 s at 100% MFU
    DECODER_STEPS = 10
    H2D_BYTES_PER_STEP = 9.5e6          # (8,36,2052) + (8,K,2052) f32 feats
    PAGEABLE_H2D_BW = 1.2e9             # pageable-memory PCIe3 effective
    DISPATCH_FLOOR_S = 2e-3             # kernel-launch + action sync floor
    steps_s = DECODER_STEPS * (H2D_BYTES_PER_STEP / PAGEABLE_H2D_BW
                               + DISPATCH_FLOOR_S)          # ~0.10 s
    actions = 8 * DECODER_STEPS
    speed_of_light = actions / (encode_s + steps_s)         # ~343 actions/s
    GENEROUS_EFFICIENCY = 0.4           # end-to-end, favoring the reference
    return speed_of_light * GENEROUS_EFFICIENCY            # ~137 -> 140


# round-to-ten of derived_reference_baseline(); pinned by test_tools.py.
BASELINE_ACTIONS_PER_SEC_PER_CHIP = 140.0
BATCH = int(os.environ.get("BENCH_BATCH", 64))
# Default protocol: episode_len 10 (planner_path parity, train.py:551-554).
# BENCH_EPISODE_LEN=40 + BENCH_PATH_TYPE=trusted_path measures the
# reference-default 40-step workload; BENCH_REMAT=1 enables layer remat for
# batch scaling beyond HBM at long episodes.
EPISODE_LEN = int(os.environ.get("BENCH_EPISODE_LEN", 10))
PATH_TYPE = os.environ.get("BENCH_PATH_TYPE", "planner_path")
REMAT = os.environ.get("BENCH_REMAT", "0") == "1"
SEQ = 512
FEAT_DIM = 2048
TIMED_STEPS = 20

from visitron_tpu.utils.benchmark import PEAK_BF16_FLOPS  # noqa: E402


def _wait_for_backend(deadline_s: float) -> None:
    """Ride out a relay outage instead of hanging the driver.

    The remote-relay TPU goes down for stretches during which
    ``jax.devices()`` blocks indefinitely (no timeout in the client).
    Probe the backend in a killable subprocess; retry until ``deadline_s``,
    then exit nonzero with a clear message.  On healthy backends (or CPU
    hosts) the first probe returns in seconds and costs nothing."""
    import subprocess
    import sys
    import time

    t0 = time.time()
    attempt = 0
    while True:
        attempt += 1
        try:
            proc = subprocess.run(
                [sys.executable, "-c", "import jax; jax.devices()"],
                timeout=120, capture_output=True, text=True)
            if proc.returncode == 0:
                return
            err = proc.stderr[-500:]
        except subprocess.TimeoutExpired:
            err = "probe timed out after 120 s (relay down?)"
        remaining = deadline_s - (time.time() - t0)
        if remaining <= 0:
            print(f"bench: accelerator backend unreachable after "
                  f"{attempt} probes over {deadline_s:.0f} s: {err}",
                  file=sys.stderr)
            sys.exit(2)
        time.sleep(min(120, remaining))


def main() -> None:
    _wait_for_backend(float(os.environ.get("BENCH_STARTUP_DEADLINE", 1800)))
    import jax

    # Counter-based RBG PRNG: same dropout semantics, ~24% faster than
    # threefry at these shapes (the framework CLI default, config.rng_impl).
    jax.config.update("jax_default_prng_impl", "rbg")
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
                     type_vocab_size=4, dtype=jnp.bfloat16, remat=REMAT,
                     # BENCH_FUSED_LN=0: A/B control for the fused
                     # add+LayerNorm kernel (ops/layernorm.py).
                     use_fused_layernorm=os.environ.get(
                         "BENCH_FUSED_LN", "1") == "1")
    # BENCH_BF16_ADAM=1 stores Adam moments in bf16 (--bf16_adam_moments):
    # same update math in fp32, half the optimizer-state HBM traffic.
    bf16_adam = os.environ.get("BENCH_BF16_ADAM", "0") == "1"
    agent = ViewpointAgent(cfg, runtime, feature_dim=FEAT_DIM,
                           episode_len=EPISODE_LEN, max_seq_length=SEQ,
                           bf16_adam_moments=bf16_adam)
    batcher = NavEpisodeBatcher(instances, runtime, batch_size=BATCH,
                                path_type=PATH_TYPE)
    # One epoch-representative mix of batches: length-grouped shuffling means
    # batches land in different 128-multiple dialog buckets; time each bucket
    # shape and weight by how often it occurs.
    batches = [
        {k: np.asarray(v) for k, v in b.items() if not isinstance(v, list)}
        for b in batcher.train_batches(8, episode_len=EPISODE_LEN)
    ]

    state = agent.init_state()
    train_step = agent.train_step_jit()  # raw jit: (state, batch, rt)

    # True-FLOP control: with the fused Pallas attention kernel active, XLA's
    # cost model no longer sees the attention matmuls (custom-call FLOPs are
    # invisible), understating MFU by ~5%.  An XLA-attention control step —
    # identical math, never executed, compiled only for cost_analysis() —
    # provides the honest FLOP count for the same shapes.
    # BENCH_TRUE_MFU=0 skips the control compiles (one per bucket) if a slow
    # relay window makes the extra compile time a problem; the headline
    # actions/s is unaffected either way.
    ctrl_step = None
    if cfg.use_fused_attention and os.environ.get("BENCH_TRUE_MFU", "1") == "1":
        import dataclasses

        ctrl_agent = ViewpointAgent(
            dataclasses.replace(cfg, use_fused_attention=False), runtime,
            feature_dim=FEAT_DIM, episode_len=EPISODE_LEN, max_seq_length=SEQ)
        ctrl_step = ctrl_agent.train_step_jit()

    from visitron_tpu.utils.benchmark import (TimingWindowCollapsed,
                                              stack_batches, time_step_fn)

    groups: dict[int, list] = {}
    for b in batches:
        t = agent.trim_batch(b)
        groups.setdefault(t["ids"].shape[1], []).append(t)

    def step_fn(state, batch, rt):
        return train_step(state, batch, rt)

    peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    # Per-window totals across the bucket mix: window w of every group is
    # timed in the same relay-load regime; the headline is the best window
    # and the spread quantifies the external-load variance (±25% documented).
    n_windows = 3
    window_ms = [0.0] * n_windows
    total_flops = 0.0
    have_flops = True
    total_true_flops = 0.0
    have_true_flops = True
    for seq_len, group in sorted(groups.items()):
        stacked = stack_batches(group)
        # time_step_fn refuses (raises) on a collapsed window even after its
        # internal warm-up retry; give the headline one more full attempt
        # before letting the failure surface — a lost BENCH record is worse
        # than one extra measurement pass.
        for attempt in (0, 1):
            try:
                _, windows = time_step_fn(step_fn, state, stacked,
                                          n_lo=5, n_hi=5 + TIMED_STEPS,
                                          repeats=n_windows, detail=True,
                                          extra_args=(runtime,))
                break
            except TimingWindowCollapsed:
                if attempt:
                    raise
        for w in range(n_windows):
            window_ms[w] += windows[w] * len(group)
        try:
            cost = train_step.lower(state, group[0],
                                    runtime).compile().cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            total_flops += float(cost.get("flops", 0.0)) * len(group)
        except Exception:
            have_flops = False
        if ctrl_step is not None:
            try:
                ctrl_cost = ctrl_step.lower(state, group[0],
                                            runtime).compile().cost_analysis()
                if isinstance(ctrl_cost, list):
                    ctrl_cost = ctrl_cost[0]
                total_true_flops += float(ctrl_cost.get("flops", 0.0)) * len(group)
            except Exception:
                have_true_flops = False
    per_window_chip = [
        BATCH * EPISODE_LEN / (ms / len(batches) / 1000.0)
        / max(jax.local_device_count(), 1) for ms in window_ms]
    per_step_ms = min(window_ms) / len(batches)
    per_chip = max(per_window_chip)

    # MFU: XLA cost-model FLOPs over measured time, weighted over the mix.
    step_flops = total_flops / len(batches) if have_flops and total_flops else None
    mfu = (step_flops / (per_step_ms / 1000.0) / peak
           if step_flops and peak else None)
    true_step_flops = (total_true_flops / len(batches)
                       if ctrl_step is not None and have_true_flops
                       and total_true_flops else None)
    true_mfu = (true_step_flops / (per_step_ms / 1000.0) / peak
                if true_step_flops and peak else None)

    out = {
        "metric": "ndh_finetune_nav_actions_per_sec_per_chip",
        "value": round(per_chip, 2),
        "unit": "actions/s/chip",
        "vs_baseline": round(per_chip / BASELINE_ACTIONS_PER_SEC_PER_CHIP, 2),
        "baseline_kind": "derived_reference_upper_bound_140_actions_per_s",
        "device": jax.devices()[0].device_kind,
        "episode_len": EPISODE_LEN,
        "windows": n_windows,
        "spread": {"min": round(min(per_window_chip), 2),
                   "max": round(max(per_window_chip), 2)},
    }
    if true_mfu is not None:
        # Headline MFU = the honest one (XLA-attention control's FLOP count
        # over the fused step's measured time); cost_model fields keep the
        # fused program's own (attention-blind) accounting for continuity.
        out["mfu"] = round(true_mfu, 4)
        out["step_tflops"] = round(true_step_flops / 1e12, 3)
        if mfu is not None:
            out["mfu_cost_model"] = round(mfu, 4)
    elif mfu is not None:
        out["mfu"] = round(mfu, 4)
        out["step_tflops"] = round(step_flops / 1e12, 3)
    if os.environ.get("BENCH_SECONDARY", "1") == "1":
        out["secondary"] = _secondary_north_stars()
    print(json.dumps(out))


def _secondary_north_stars() -> dict:
    """The non-headline BASELINE.md north stars, measured in-process so the
    driver's BENCH_r*.json records them officially (they previously lived
    only in VALIDATION.md prose): pretraining examples/s, scene/region
    feature-extraction frames/s (device and end-to-end fused-render), and
    serving episodes/s.  Each probe is independent — one failure (e.g. an
    HBM-tight relay window) reports an error string without costing the
    headline or the other probes.  BENCH_SECONDARY=0 skips the block."""
    import sys
    import traceback

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "tools"))
    sec: dict = {}

    def probe(name, fn, keys):
        try:
            r = fn()
            sec[name] = {k: r[k] for k in keys if k in r}
        except Exception as e:
            traceback.print_exc(limit=3, file=sys.stderr)
            sec[name] = {"error": f"{type(e).__name__}: {e}"[:160]}

    import bench_pretrain

    probe("pretrain", lambda: bench_pretrain.run(16),
          ("value", "unit", "mfu", "ms_per_step", "batch"))

    import bench_features

    scene_params = None
    try:
        scene_params = bench_features._scene_params()
    except Exception as e:
        sec["scene_device"] = sec["scene_fused"] = {
            "error": f"{type(e).__name__}: {e}"[:160]}
    if scene_params is not None:
        probe("scene_device",
              lambda: bench_features.measure_scene_device("bf16", scene_params),
              ("value", "unit", "view_ms", "matterport_sweep_hours"))
        probe("scene_fused",
              lambda: bench_features.measure_scene_fused(scene_params),
              ("value", "unit", "view_ms", "matterport_sweep_hours"))
    probe("regions", lambda: bench_features.measure_regions("batch6"),
          ("value", "unit", "frame_ms", "matterport_sweep_hours"))

    import bench_eval

    for t in (10, 40):
        probe(f"serving_t{t}", lambda t=t: bench_eval.measure(t, repeats=1),
              ("episodes_per_sec_per_chip", "actions_per_sec_per_chip",
               "batch", "ms_per_batch"))
    return sec


if __name__ == "__main__":
    main()
