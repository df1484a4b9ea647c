"""FSDP / ZeRO-3: parameter + optimizer-state sharding over the dp axis.

The reference's only distribution mode is replicated DDP (SURVEY §2.3);
--fsdp shards the parameters themselves over dp (parallel/mesh.py:
fsdp_param_rules) with the per-layer all-gathers and gradient
reduce-scatter derived by the SPMD partitioner — per-chip
param+grad+moment memory ~1/dp with update math unchanged.
"""

import jax
import numpy as np
import pytest

from visitron_tpu.models import BertConfig
from visitron_tpu.parallel import fsdp_param_rules, make_mesh
from visitron_tpu.train.pretrain import PretrainTrainer

from __graft_entry__ import _example_batch


def _small_cfg():
    return BertConfig(vocab_size=512, hidden_size=64, num_hidden_layers=2,
                      num_attention_heads=4, intermediate_size=128,
                      max_position_embeddings=64, type_vocab_size=4,
                      img_feature_dim=32, action_space=36, detector_classes=8)


def _batch(n=8):
    cfg = _small_cfg()
    return _example_batch(n, 48, 16, cfg.vocab_size, cfg.img_feature_dim,
                          cfg.action_space, cfg.detector_classes,
                          np.random.default_rng(0))


def test_fsdp_rules_shard_weights_and_compose_with_tp():
    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(dp=4, tp=2)
    params = {
        "qkv": {"kernel": jnp.zeros((64, 192))},       # tp rule wins
        "dense": {"kernel": jnp.zeros((64, 64))},      # fsdp: dim0 over dp
        "scale": jnp.zeros((64,)),                     # fsdp: dim0 over dp
        "tiny": jnp.zeros((3,)),                       # nothing divides
    }
    rules = fsdp_param_rules(mesh, params)
    assert rules["qkv"]["kernel"].spec == P(None, "tp")
    assert rules["dense"]["kernel"].spec == P("dp", None)
    assert rules["scale"].spec == P("dp")
    assert rules["tiny"].spec == P()


def _sharded_fraction(leaf):
    return leaf.addressable_shards[0].data.size / leaf.size


def test_fsdp_step_parity_and_sharding():
    """Two full steps under fsdp produce the same params as the replicated
    trainer; params AND moments live dp-sharded before and after each step
    (the compiler must not silently re-replicate either)."""
    batch = _batch()
    plain = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=8), total_steps=10)
    f = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=8), total_steps=10,
                        fsdp=True)
    ps, fs = plain.init_state(batch), f.init_state(batch)

    def biggest(tree):
        return max(jax.tree.leaves(tree), key=lambda x: x.size)

    assert _sharded_fraction(biggest(fs["params"])) == 1 / 8
    assert _sharded_fraction(biggest(fs["opt_state"])) == 1 / 8
    for _ in range(2):
        ps, pb = plain.step_fn()(ps, batch)
        fs, fb = f.step_fn()(fs, batch)
    assert np.isclose(float(pb["loss"]), float(fb["loss"]), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(ps["params"]), jax.tree.leaves(fs["params"])):
        np.testing.assert_allclose(np.asarray(a, np.float64),
                                   np.asarray(b, np.float64),
                                   rtol=1e-6, atol=1e-7)
    assert _sharded_fraction(biggest(fs["params"])) == 1 / 8
    assert _sharded_fraction(biggest(fs["opt_state"])) == 1 / 8


def test_fsdp_eval_and_checkpoint_roundtrip(tmp_path):
    """eval_fn runs on dp-sharded params; a checkpoint written from sharded
    state restores onto the sharded template (the --resume path restores to
    the template's shardings, run.py:252-260)."""
    from visitron_tpu.train.checkpoint import CheckpointManager

    batch = _batch()
    trainer = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=8),
                              total_steps=10, fsdp=True)
    state = trainer.init_state(batch)
    state, _ = trainer.step_fn()(state, batch)
    bundle = trainer.eval_fn()(state["params"], batch)
    assert np.isfinite(float(bundle["loss"]))

    ckpt = CheckpointManager(str(tmp_path))
    ckpt.save(1, state["params"], state["opt_state"])
    restored = ckpt.restore(
        1, {"params": state["params"], "opt_state": state["opt_state"]})
    for a, b in zip(jax.tree.leaves(state["params"]),
                    jax.tree.leaves(restored["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    from visitron_tpu.parallel import reshard_state

    shardings = jax.tree.map(lambda x: x.sharding, state["params"])
    placed = reshard_state(restored["params"], shardings)
    assert _sharded_fraction(
        max(jax.tree.leaves(placed), key=lambda x: x.size)) == 1 / 8


def test_fsdp_composes_with_sequence_parallelism():
    """dp=2 x sp=4: activations token-sharded, params/moments dp-sharded."""
    from visitron_tpu.parallel import make_sp_mesh

    batch = _batch()
    trainer = PretrainTrainer(_small_cfg(), mesh=make_sp_mesh(dp=2, sp=4),
                              total_steps=10, fsdp=True)
    state = trainer.init_state(batch)
    state, bundle = trainer.step_fn()(state, batch)
    assert np.isfinite(float(bundle["loss"]))
    big = max(jax.tree.leaves(state["params"]), key=lambda x: x.size)
    assert _sharded_fraction(big) == 1 / 2  # dp=2 only; sp untouched


def test_fsdp_composes_with_tensor_parallelism():
    batch = _batch()
    trainer = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=4, tp=2),
                              total_steps=10, fsdp=True)
    state = trainer.init_state(batch)
    state, bundle = trainer.step_fn()(state, batch)
    assert np.isfinite(float(bundle["loss"]))
    # The fused qkv kernel shards over tp; plain kernels shard over dp.
    leaves = jax.tree_util.tree_leaves_with_path(state["params"])
    qkv = [x for p, x in leaves if "qkv" in "/".join(str(q) for q in p)]
    assert qkv and all(_sharded_fraction(x) == 1 / 2 for x in qkv if x.ndim == 2)


def test_fsdp_cli_validation():
    from visitron_tpu.config import RunConfig

    with pytest.raises(ValueError):
        RunConfig(fsdp=True, mesh_pp=2)
    assert RunConfig(fsdp=True, mesh_tp=2).fsdp


def test_zero_flags_rejected_on_unsupported_tasks():
    """--fsdp/--zero1 on a task that does not consume them must error, not
    silently no-op (run.py main dispatch guard)."""
    from visitron_tpu import run as runner

    with pytest.raises(SystemExit):
        runner.main(["viewpoint", "--fsdp", "--debug"])
    with pytest.raises(SystemExit):
        runner.main(["turn_based", "--zero1", "--debug"])


def test_fsdp_moments_co_sharded_with_tp_params():
    """Under --fsdp --mesh_tp, the Adam moments of tp-split kernels take the
    PARAM's tp sharding (fsdp_opt_rules), not a dp reshard — the update is
    shard-local for every leaf (no per-step reshard collectives)."""
    batch = _batch()
    trainer = PretrainTrainer(_small_cfg(), mesh=make_mesh(dp=4, tp=2),
                              total_steps=10, fsdp=True)
    state = trainer.init_state(batch)

    def qkv_specs(tree):
        return {"/".join(str(q) for q in p): x.sharding.spec
                for p, x in jax.tree_util.tree_leaves_with_path(tree)
                if "qkv" in "/".join(str(q) for q in p) and x.ndim == 2}

    param_specs = qkv_specs(state["params"])
    assert param_specs, "no qkv kernels found"
    moment_specs = qkv_specs(state["opt_state"])
    assert moment_specs, "no qkv moments found"
    for key, spec in moment_specs.items():
        suffix = key[key.index("['params']"):]  # strip the optax state prefix
        assert param_specs.get(suffix) == spec, (key, spec, param_specs)
    # The co-sharding survives the jitted step (fsdp_pin_layouts).
    state, _ = trainer.step_fn()(state, batch)
    assert qkv_specs(state["opt_state"]) == moment_specs


def test_fsdp_composes_with_context_parallelism():
    """dp=2 x cp=4 (ring attention): params/moments dp-sharded, step runs
    (the --fsdp --mesh_cp CLI combination was previously accepted but
    unverified)."""
    from visitron_tpu.parallel import make_cp_mesh

    batch = _batch()
    plain = PretrainTrainer(_small_cfg(), mesh=make_cp_mesh(dp=2, cp=4),
                            total_steps=10)
    f = PretrainTrainer(_small_cfg(), mesh=make_cp_mesh(dp=2, cp=4),
                        total_steps=10, fsdp=True)
    ps, fs = plain.init_state(batch), f.init_state(batch)
    for _ in range(2):
        ps, pb = plain.step_fn()(ps, batch)
        fs, fb = f.step_fn()(fs, batch)
    assert np.isclose(float(pb["loss"]), float(fb["loss"]), rtol=1e-6)
    big = max(jax.tree.leaves(fs["params"]), key=lambda x: x.size)
    assert _sharded_fraction(big) == 1 / 2  # dp=2 only; cp untouched


def test_zero_flags_from_config_file_warn_not_abort(tmp_path, capsys):
    """A shared config file with zero1/fsdp true must NOT abort tasks that
    ignore those flags (only explicit CLI flags are a hard error) — a reused
    pretrain config keeps driving nav/turn_based runs."""
    import json

    from visitron_tpu import run as runner

    p = tmp_path / "shared.json"
    p.write_text(json.dumps({"zero1": True, "fsdp": True,
                             "output_dir": str(tmp_path / "out")}))
    seen = {}

    orig = runner.run_turn_based
    runner.run_turn_based = lambda cfg: seen.setdefault("cfg", cfg)
    try:
        runner.main(["turn_based", "--config", str(p), "--debug"])
    finally:
        runner.run_turn_based = orig
    assert seen["cfg"].zero1 is False and seen["cfg"].fsdp is False
    err = capsys.readouterr().err
    assert "ignored by task" in err
