"""Pretraining-step throughput/MFU probe (reference-scale joint encoder).

Measures the jitted multimodal pretraining step (BERT-base, 512 text tokens +
192-bucketed image regions, MLM + action + token heads, AdamW) on the
attached accelerator, with and without the Pallas flash-attention kernel,
and prints one JSON line per variant.  Companion to bench.py (which stays
the single driver-facing benchmark).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, __import__("os").path.dirname(__import__("os").path.dirname(
    __import__("os").path.abspath(__file__))))

BATCH = 16
SEQ = 512
IMG = 256  # joint 768 tokens: flash-eligible (%128)
TIMED = 20


def _batch(rng, vocab, img_dim):
    return {
        "input_ids": rng.integers(0, vocab, (BATCH, SEQ)).astype(np.int32),
        "token_type_ids": rng.integers(0, 4, (BATCH, SEQ)).astype(np.int32),
        "attention_mask": np.ones((BATCH, SEQ + IMG), np.int32),
        "labels": np.where(rng.random((BATCH, SEQ + IMG)) < 0.15,
                           rng.integers(0, vocab, (BATCH, SEQ + IMG)), -1).astype(np.int32),
        "token_labels": np.full((BATCH, SEQ + IMG), -1, np.int32),
        "img_feats": rng.standard_normal((BATCH, IMG, img_dim)).astype(np.float32),
        "img_location_embeddings": rng.standard_normal((BATCH, IMG, 128)).astype(np.float32),
        "next_action": rng.integers(0, 36, (BATCH,)).astype(np.int32),
    }


def run(use_flash: bool) -> dict:
    import jax
    import jax.numpy as jnp

    from visitron_tpu.models import BertConfig
    from visitron_tpu.train.pretrain import PretrainTrainer

    cfg = BertConfig(vocab_size=30525, max_position_embeddings=768,
                     type_vocab_size=4, dtype=jnp.bfloat16,
                     attention_probs_dropout_prob=0.0,
                     use_flash_attention=use_flash)
    trainer = PretrainTrainer(cfg, total_steps=100)
    rng = np.random.default_rng(0)
    batch = _batch(rng, cfg.vocab_size, cfg.img_feature_dim)
    state = trainer.init_state(batch)
    step = trainer.step_fn()
    state, bundle = step(state, batch)
    jax.block_until_ready(bundle["loss"])
    t0 = time.perf_counter()
    for _ in range(TIMED):
        state, bundle = step(state, batch)
    jax.block_until_ready(bundle["loss"])
    dt = time.perf_counter() - t0
    ex_s = BATCH * TIMED / dt
    return {"metric": "pretrain_examples_per_sec_per_chip",
            "value": round(ex_s / max(jax.local_device_count(), 1), 2),
            "unit": "examples/s/chip", "flash": use_flash,
            "ms_per_step": round(dt / TIMED * 1000, 2)}


if __name__ == "__main__":
    for flash in (False, True, False, True):
        print(json.dumps(run(flash)), flush=True)
