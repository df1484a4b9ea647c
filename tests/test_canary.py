"""Canary for the suite's speed shims (conftest).

The suite runs with ``jax_disable_most_optimizations=True`` and routes flax
``Module.init``/``apply`` through ``jax.jit`` (conftest) — both purely for
compile speed on a 1-core host.  This canary proves a representative model
produces the same numerics through the PRODUCTION path: eager (un-routed)
flax apply under the full default XLA optimization pipeline.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_batch(rng, vocab=512, img_dim=32):
    return {
        "input_ids": rng.integers(0, vocab, (2, 48)).astype(np.int32),
        "token_type_ids": rng.integers(0, 4, (2, 48)).astype(np.int32),
        "attention_mask": np.ones((2, 48 + 16), np.int32),
        "img_feats": rng.standard_normal((2, 16, img_dim)).astype(np.float32),
        "img_location_embeddings": rng.standard_normal((2, 16, 128)).astype(np.float32),
    }


def test_canary_production_pipeline_matches_suite_shims():
    import conftest

    from visitron_tpu.models import BertConfig, PretrainModel

    cfg = BertConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=128,
                     max_position_embeddings=64, type_vocab_size=4,
                     img_feature_dim=32, action_space=36, detector_classes=8)
    model = PretrainModel(cfg)
    b = _tiny_batch(np.random.default_rng(0))
    args = dict(token_type_ids=jnp.asarray(b["token_type_ids"]),
                attention_mask=jnp.asarray(b["attention_mask"]),
                img_feats=jnp.asarray(b["img_feats"]),
                img_location_embeddings=jnp.asarray(b["img_location_embeddings"]))
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(b["input_ids"]), **args)
    routed = model.apply(params, jnp.asarray(b["input_ids"]), **args)

    try:
        jax.config.update("jax_disable_most_optimizations", False)
        prod = conftest._ORIG_MODULE_APPLY(
            model, params, jnp.asarray(b["input_ids"]), **args)
    finally:
        # conftest pins this True for the whole suite.
        jax.config.update("jax_disable_most_optimizations", True)

    for key in ("mlm_logits", "action_logits"):
        np.testing.assert_allclose(np.asarray(routed[key], np.float32),
                                   np.asarray(prod[key], np.float32),
                                   rtol=2e-4, atol=2e-4, err_msg=key)
