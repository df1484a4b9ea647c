"""Multi-device sharding: dp nav training, dp x tp pretraining, dryrun entry."""

import jax
import numpy as np
import pytest

from visitron_tpu.parallel import make_mesh, shard_params_rules


def test_mesh_construction():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2
    mesh = make_mesh()  # all devices on dp
    assert mesh.shape["dp"] == len(jax.devices())


def test_viewpoint_agent_dp_training(world):
    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                                   build_wordpiece_vocab)
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
    import tempfile

    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    runtime = NavRuntime.build(world.graphs, table)
    tok = WordPieceTokenizer(build_wordpiece_vocab(
        [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))
    with tempfile.TemporaryDirectory() as d:
        root = world.write_task_data(d)
        inst = build_nav_instances(root, ["train"], tok, max_seq_length=64)
    cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=64, type_vocab_size=4)
    mesh = make_mesh(dp=8)
    agent = ViewpointAgent(cfg, runtime, feature_dim=world.scene_feat_dim,
                           episode_len=6, rnn_dim=24, encoder_hidden_size=16,
                           aemb=8, max_seq_length=64, mesh=mesh)
    batcher = NavEpisodeBatcher(inst, runtime, batch_size=8, path_type="trusted_path")
    state = agent.init_state()
    step = agent.train_step_fn()
    batch = next(batcher.train_batches(1, episode_len=6))
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    losses = []
    for _ in range(3):
        state, loss = step(state, jb)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    # Params remain replicated (every device has the full tree).
    leaf = jax.tree.leaves(state["params"])[0]
    assert leaf.sharding.is_fully_replicated


def test_params_tp_sharding_rules():
    mesh = make_mesh(dp=4, tp=2)
    params = {
        "layer": {
            "qkv": {"kernel": np.zeros((32, 96)), "bias": np.zeros((96,))},
            "intermediate": {"kernel": np.zeros((32, 128))},
            "output": {"kernel": np.zeros((128, 32))},
            "layer_norm": {"scale": np.zeros((32,))},
        }
    }
    rules = shard_params_rules(mesh, params)
    assert rules["layer"]["qkv"]["kernel"].spec == jax.sharding.PartitionSpec(None, "tp")
    assert rules["layer"]["output"]["kernel"].spec == jax.sharding.PartitionSpec("tp", None)
    assert rules["layer"]["layer_norm"]["scale"].spec == jax.sharding.PartitionSpec()


@pytest.mark.slow
def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as entry

    entry.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_never_allocates_tpu():
    """dryrun_multichip is a CPU-mesh correctness check: it must pass even
    when the process's default jax backend is completely broken (MULTICHIP_r02
    went red because the old code probed jax.devices() and died on a transient
    libtpu mismatch).  Poison the default platform to a nonexistent backend;
    the dryrun must scrub the env, re-exec CPU-only, and succeed."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "bogus_accelerator"  # default backend = broken
    env.pop("VISITRON_DRYRUN_CHILD", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, "-c",
         "from __graft_entry__ import dryrun_multichip; dryrun_multichip(8)"],
        env=env, cwd=repo, capture_output=True, text=True, timeout=1200)
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "dryrun_multichip ok" in proc.stdout


def test_mesh_routes_pallas_attention():
    """Pallas kernels are Mosaic custom calls GSPMD cannot partition: every
    mesh-aware agent/trainer must route its config through config_for_mesh,
    which on a >1-device mesh attaches the mesh so self-attention takes the
    shard_map-wrapped kernels (models/bert.py:config_for_mesh,
    ops/attention.py: fused_attention_mesh / flash_attention_mesh; the
    plain kernels are gated off whenever attention_mesh is set);
    single-device configs pass through untouched."""
    from visitron_tpu.models import BertConfig, config_for_mesh

    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     use_fused_attention=True, use_flash_attention=True)
    mesh = make_mesh(dp=4, tp=2)
    out = config_for_mesh(cfg, mesh)
    assert out.use_fused_attention and out.attention_mesh is mesh
    assert out.use_flash_attention  # long-S shapes route via flash_attention_mesh
    assert config_for_mesh(cfg, None) is cfg
    one = make_mesh(dp=1, tp=1)
    assert config_for_mesh(cfg, one) is cfg

    # The plumbing: an agent constructed WITH a multi-device mesh carries
    # the mesh in its config; without one it keeps the plain kernel path.
    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.data import SceneFeatureTable
    from visitron_tpu.testing import SyntheticWorld

    world = SyntheticWorld(seed=3, num_scans=1, viewpoints_per_scan=8,
                           scene_feat_dim=16)
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    rt = NavRuntime.build(world.graphs, table)
    meshed = ViewpointAgent(cfg, rt, feature_dim=16, episode_len=2,
                            max_seq_length=64, mesh=mesh)
    assert meshed.cfg.attention_mesh is mesh
    solo = ViewpointAgent(cfg, rt, feature_dim=16, episode_len=2,
                          max_seq_length=64)
    assert solo.cfg.attention_mesh is None
    assert solo.cfg.use_fused_attention


def test_agents_place_runtime_on_mesh():
    """Every mesh-aware agent's train step must feed a mesh-replicated
    runtime (step_runtime), not the raw host-local tables — mixing
    host-local leaves with mesh-sharded batch/state is an
    incompatible-devices error under jax.distributed (the multi-host
    regression this pins: classifier/turn_based lacked step_runtime)."""
    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.classifier import ClassifierAgent
    from visitron_tpu.agents.turn_based import TurnBasedAgent
    from visitron_tpu.data import SceneFeatureTable
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld

    world = SyntheticWorld(seed=4, num_scans=1, viewpoints_per_scan=8,
                           scene_feat_dim=16)
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    rt = NavRuntime.build(world.graphs, table)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=64, type_vocab_size=4)
    mesh = make_mesh(dp=8)
    n_dev = len(jax.devices())
    for agent in (
        ViewpointAgent(cfg, rt, feature_dim=16, episode_len=2,
                       max_seq_length=64, mesh=mesh),
        ClassifierAgent(cfg, rt, feature_dim=16, episode_len=2,
                        max_seq_length=64, mesh=mesh),
        TurnBasedAgent(cfg, rt, feature_dim=16, episode_len=2,
                       max_seq_length=64, mesh=mesh),
    ):
        placed = agent.step_runtime()
        leaf = jax.tree.leaves(placed)[0]
        assert len(leaf.sharding.device_set) == n_dev, type(agent).__name__
        assert leaf.sharding.is_fully_replicated, type(agent).__name__
        # Cached until the runtime object is swapped.
        assert agent.step_runtime() is placed
        agent.runtime = NavRuntime.build(world.graphs, table)
        assert agent.step_runtime() is not placed


def test_entry_compiles():
    import __graft_entry__ as entry

    fn, args = entry.entry()
    out = jax.jit(fn)(*args)
    assert out[0].shape[0] == 2


def test_eval_paths_use_mesh_free_encoder():
    """Validation/rollout jits are host-local (they feed self.runtime, not
    the mesh-placed tables), so their encoder must NOT carry attention_mesh:
    a shard_map over the global mesh inside a host-local jit is an
    incompatible-devices error under jax.distributed.  Each mesh-aware agent
    therefore keeps a mesh-free eval twin sharing the same params."""
    from visitron_tpu.agents import NavRuntime, ViewpointAgent
    from visitron_tpu.agents.classifier import ClassifierAgent
    from visitron_tpu.agents.turn_based import TurnBasedAgent
    from visitron_tpu.data import SceneFeatureTable
    from visitron_tpu.models import BertConfig
    from visitron_tpu.testing import SyntheticWorld

    world = SyntheticWorld(seed=6, num_scans=1, viewpoints_per_scan=8,
                           scene_feat_dim=16)
    table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
    rt = NavRuntime.build(world.graphs, table)
    cfg = BertConfig(vocab_size=64, hidden_size=32, num_hidden_layers=1,
                     num_attention_heads=2, intermediate_size=32,
                     max_position_embeddings=64, type_vocab_size=4,
                     use_fused_attention=True)
    mesh = make_mesh(dp=4, tp=2)
    agents = [cls(cfg, rt, feature_dim=16, episode_len=2,
                  max_seq_length=64, mesh=mesh)
              for cls in (ViewpointAgent, ClassifierAgent, TurnBasedAgent)]
    for agent in agents:
        name = type(agent).__name__
        assert agent.encoder.cfg.attention_mesh is mesh, name
        assert agent.eval_encoder.cfg.attention_mesh is None, name
    # Same module structure => same params: init trees must match (the
    # attention routing is param-free; one agent covers the shared code path).
    import jax.numpy as jnp
    agent = agents[0]
    ids = jnp.zeros((2, 64), jnp.int32)
    lens = jnp.full((2,), 8, jnp.int32)
    p1 = agent.encoder.init(jax.random.PRNGKey(0), ids, lens,
                            token_type_ids=jnp.zeros_like(ids),
                            deterministic=True)
    p2 = agent.eval_encoder.init(jax.random.PRNGKey(0), ids, lens,
                                 token_type_ids=jnp.zeros_like(ids),
                                 deterministic=True)
    assert jax.tree_util.tree_structure(p1) == jax.tree_util.tree_structure(p2)
    # Single-device agents reuse the same module object (no twin needed).
    solo = ViewpointAgent(cfg, rt, feature_dim=16, episode_len=2,
                          max_seq_length=64)
    assert solo.eval_encoder is solo.encoder
