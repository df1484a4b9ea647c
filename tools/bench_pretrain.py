"""Pretraining-step throughput/MFU probe (reference-scale joint encoder).

Measures the jitted multimodal pretraining step (BERT-base, 512 text tokens +
image regions, MLM + action + token heads, AdamW, training dropout active)
on the attached accelerator and prints one JSON line per variant.

Timing uses the ON-DEVICE fori_loop method (utils/benchmark.time_step_fn):
on this environment's remote-relay TPU, host loops + block_until_ready
measure RPC enqueue rather than compute (see bench.py docstring), which is
how an earlier revision of this tool over-reported throughput (e.g. "830
examples/s" at batch 32 — the honest number is ~112 ex/s at batch 8; batch
32 does not even fit v5e HBM without flash or remat).  Companion to bench.py
(which stays the single driver-facing benchmark).
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

SEQ = 512
IMG = 256  # joint 768 tokens: flash-eligible (%128)



def _batch(rng, vocab, img_dim, batch):
    return {
        "input_ids": rng.integers(0, vocab, (batch, SEQ)).astype(np.int32),
        "token_type_ids": rng.integers(0, 4, (batch, SEQ)).astype(np.int32),
        "attention_mask": np.ones((batch, SEQ + IMG), np.int32),
        "labels": np.where(rng.random((batch, SEQ + IMG)) < 0.15,
                           rng.integers(0, vocab, (batch, SEQ + IMG)), -1).astype(np.int32),
        "token_labels": np.full((batch, SEQ + IMG), -1, np.int32),
        "img_feats": rng.standard_normal((batch, IMG, img_dim)).astype(np.float32),
        "img_location_embeddings": rng.standard_normal((batch, IMG, 128)).astype(np.float32),
        "next_action": rng.integers(0, 36, (batch,)).astype(np.int32),
    }


def run(batch: int, use_flash: bool = False, remat: bool = False,
        use_fused: bool = True, bf16_adam: bool = False,
        fused_ln: bool = True, fused_ce: bool = True) -> dict:
    import jax
    import jax.numpy as jnp

    from visitron_tpu.models import BertConfig
    from visitron_tpu.train.pretrain import PretrainTrainer
    from visitron_tpu.utils.benchmark import (PEAK_BF16_FLOPS,
                                              stack_batches, time_step_fn)

    cfg = BertConfig(vocab_size=30525, max_position_embeddings=768,
                     type_vocab_size=4, dtype=jnp.bfloat16,
                     use_flash_attention=use_flash, remat=remat,
                     use_fused_attention=use_fused,
                     use_fused_layernorm=fused_ln,
                     use_fused_mlm_ce=fused_ce)
    trainer = PretrainTrainer(cfg, total_steps=100, bf16_adam_moments=bf16_adam)
    rng = np.random.default_rng(0)
    batches = [_batch(rng, cfg.vocab_size, cfg.img_feature_dim, batch)
               for _ in range(2)]
    state = trainer.init_state(batches[0])

    raw = trainer.raw_step_fn()  # the exact training program

    def step(state, b):
        state, bundle = raw(state, b)
        return state, bundle["loss"]

    jb = [jax.tree.map(jnp.asarray, b) for b in batches]
    ms = time_step_fn(step, state, stack_batches(jb), n_lo=3, n_hi=13)
    # Relay-noise guard: the remote relay's per-fetch RPC constant can swing
    # by seconds between calls; when it swamps a 10-step window the
    # difference clamps to ~0 and the naive division reports absurd
    # throughput (seen in-process after a long headline bench).  A BERT-base
    # pretrain step cannot run under 1 ms — widen the window, then refuse.
    if ms < 1.0:
        ms = time_step_fn(step, state, stack_batches(jb), n_lo=5, n_hi=45,
                          repeats=4)
    if ms < 1.0:
        raise RuntimeError(
            f"pretrain timing window collapsed ({ms:.2g} ms/step) — relay "
            "RPC variance swamped the measurement; rerun in a quieter window")
    out = {"metric": "pretrain_examples_per_sec_per_chip",
           "value": round(batch / (ms / 1000.0) /
                          max(jax.local_device_count(), 1), 2),
           "unit": "examples/s/chip", "batch": batch, "flash": use_flash,
           "fused": use_fused, "remat": remat, "bf16_adam": bf16_adam,
           "fused_ln": fused_ln, "fused_ce": fused_ce,
           "ms_per_step": round(ms, 2)}
    def _flops(step_fn) -> float:
        cost = step_fn.lower(state, jb[0]).compile().cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        return float(cost.get("flops", 0.0))

    peak = PEAK_BF16_FLOPS.get(jax.devices()[0].device_kind)
    try:
        flops = _flops(raw)
        if flops and peak:
            out["mfu"] = round(flops / (ms / 1000.0) / peak, 4)
            out["step_tflops"] = round(flops / 1e12, 2)
    except Exception:
        pass
    if use_fused or use_flash:
        # True-FLOP control (same approach as bench.py's headline): the
        # Pallas attention custom calls are invisible to XLA's cost model,
        # so the fused program's own accounting understates MFU.  Compile an
        # XLA-attention twin — identical math, never executed — only for its
        # cost_analysis(); one extra compile per run().
        try:
            import dataclasses

            ctrl_cfg = dataclasses.replace(cfg, use_flash_attention=False,
                                           use_fused_attention=False,
                                           use_fused_layernorm=False,
                                           use_fused_mlm_ce=False)
            ctrl = PretrainTrainer(ctrl_cfg, total_steps=100,
                                   bf16_adam_moments=bf16_adam).raw_step_fn()
            true_flops = _flops(ctrl)
            if true_flops and peak:
                if "mfu" in out:
                    out["mfu_cost_model"] = out["mfu"]
                out["mfu"] = round(true_flops / (ms / 1000.0) / peak, 4)
                out["step_tflops"] = round(true_flops / 1e12, 2)
        except Exception:
            pass
    if out.get("mfu", 0) > 1.0:
        # Physically impossible: the timing window collapsed in a way the
        # ms >= 1 guard cannot catch (seen: a "32.77 ms" batch-24 step, MFU
        # 2.34, in a chaotic relay regime).  Refuse rather than publish.
        raise RuntimeError(
            f"measured MFU {out['mfu']} > 1 is physically impossible — "
            f"relay timing window invalid (ms_per_step={ms:.2f}); rerun")
    return out


if __name__ == "__main__":
    # Fused attention (default) removes the stored (B, H, S, S) probs
    # activations, so larger plain batches fit than in round 2 — probe the
    # new ceiling; keep one no-fused control for the within-window A/B.
    # Measured (VALIDATION.md round 3): fused batch 16 is optimal (264 ex/s,
    # 0.84 true MFU); batch >=24 fits HBM but hits XLA auto-remat and
    # craters (239 / 1884 ms at 24 / 32), so no point probing past 32 —
    # scale global batch across the dp mesh instead.
    # bf16_adam rows: half the optimizer state (440 MB on BERT-base) — probes
    # whether the batch >= 24 XLA auto-remat cliff is HBM-pressure-driven.
    for batch, flash, remat, fused, bf16_adam in (
            (16, False, False, False, False),   # round-2 configuration (control)
            (8, False, False, True, False), (16, False, False, True, False),
            (24, False, False, True, False), (32, False, False, True, False),
            (32, False, True, True, False),
            (16, False, False, True, True), (24, False, False, True, True),
            (32, False, False, True, True)):
        try:
            print(json.dumps(run(batch, flash, remat, fused, bf16_adam)),
                  flush=True)
        except Exception as e:  # OOM configs report instead of crash
            print(json.dumps({"batch": batch, "flash": flash, "remat": remat,
                              "fused": fused, "bf16_adam": bf16_adam,
                              "error": str(e)[:160]}), flush=True)
