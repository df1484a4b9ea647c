"""Multi-host data parallelism: two real processes, one global SPMD mesh.

Spawns two CPU processes (2 virtual devices each) joined through
``run._maybe_init_multihost`` (the torch.distributed.launch replacement,
reference run_scripts/*:4), builds the dp=4 mesh spanning both, shards each
host's half of the global batch with ``parallel.shard_batch``
(DistributedSampler parity), and runs real viewpoint train steps.  Both
processes must see the same (replicated) loss.
"""

import os
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
os.environ["JAX_PLATFORMS"] = "cpu"
# Workers share the suite's persistent compile cache via the inherited
# JAX_COMPILATION_CACHE_DIR (cache keys include device topology, so 2-device
# 2-process entries never collide with the 8-device single-process suite's).
# NOTE: mutating jax env vars here would be a silent no-op — sitecustomize
# imports jax at interpreter startup, before this script body runs; only
# jax.config.update(...) after import takes effect (XLA_FLAGS above works
# because XLA reads it at first backend init, which happens later).
os.environ["JAX_COORDINATOR_ADDRESS"] = "127.0.0.1:%PORT%"
os.environ["JAX_NUM_PROCESSES"] = "2"
os.environ["JAX_PROCESS_ID"] = sys.argv[1]
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "3")
import jax
jax.config.update("jax_platforms", "cpu")

from visitron_tpu import run as runner
runner._maybe_init_multihost()
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 4, jax.device_count()

import numpy as np
import jax.numpy as jnp
from visitron_tpu.agents import NavRuntime, ViewpointAgent
from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.data import (SceneFeatureTable, WordPieceTokenizer,
                               build_wordpiece_vocab, build_nav_instances)
from visitron_tpu.models import BertConfig
from visitron_tpu.parallel import make_mesh
from visitron_tpu.testing import SyntheticWorld
from visitron_tpu.testing.synthetic import _TARGETS, _WORDS
import tempfile

world = SyntheticWorld(seed=5, num_scans=1, viewpoints_per_scan=16,
                       scene_feat_dim=32)
table = SceneFeatureTable.pack(world.graphs, world.scene_features(), vfov=60)
runtime = NavRuntime.build(world.graphs, table)
tok = WordPieceTokenizer(build_wordpiece_vocab(
    [" ".join(_WORDS), " ".join(_TARGETS)], vocab_size=512))
with tempfile.TemporaryDirectory() as d:
    world.write_task_data(d, counts={"train": 8})
    instances = build_nav_instances(d, ["train"], tok, max_seq_length=64)

mesh = make_mesh(dp=4, tp=1)  # spans both processes
# 1 layer: the multihost contract (replicated loss, global bucketing) is
# depth-independent, and each layer costs two full SPMD compiles (2 procs).
cfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=1,
                 num_attention_heads=4, intermediate_size=64,
                 max_position_embeddings=64, type_vocab_size=4)
agent = ViewpointAgent(cfg, runtime, feature_dim=32, episode_len=4,
                       rnn_dim=16, encoder_hidden_size=16, aemb=8,
                       max_seq_length=64, mesh=mesh)
# Per-host strided instance shard + per-host half of the global batch 4.
# length_bucket 16: both hosts must independently derive the same GLOBAL
# sub-64 dialog bucket (max length across both hosts' concurrent batches)
# so the SPMD step sees identical shapes without any collective.
batcher = NavEpisodeBatcher(instances, runtime, batch_size=2,
                            host_id=jax.process_index(), num_hosts=2,
                            length_bucket=16)
state = agent.init_state()
agent.train_step_fn()
from visitron_tpu.parallel import shard_batch
placed = []
shapes = []
for batch in batcher.train_batches(2, episode_len=4):
    jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
    shapes.append(jb["ids"].shape[1])
    placed.append(shard_batch(mesh, jb))
assert any(s < 64 for s in shapes), shapes  # bucketing really trimmed
# Compile BEFORE any cross-process collective executes, then meet at a
# barrier: compile-time skew between the processes (cold vs warm persistent
# cache) must not eat into Gloo's 30 s collective rendezvous timeout.
# Globally-replicated runtime tables (each host holds an identical copy);
# the raw SPMD step takes them as a pytree argument.
rt_global = agent.step_runtime()
compiled = {}
for pb in placed:  # one AOT executable per distinct dialog-bucket shape
    s = pb["ids"].shape[1]
    if s not in compiled:
        compiled[s] = agent.train_step_jit().lower(state, pb, rt_global).compile()
try:
    # Not yet public API: coordination-service barrier keyed on a name.  If
    # the import or call signature moves in a jax upgrade, fall back to
    # running unsynced (the warm collective below still has its own timeout).
    from jax._src import distributed as _dist
    _dist.global_state.client.wait_at_barrier("compiled", 300_000)
except Exception as e:  # barrier API moved: fall back to running unsynced
    print("barrier skipped:", e, flush=True)
# Warm the Gloo context with a minimal collective while both processes are
# barrier-synced: context creation is the step with the 30 s KV-store
# timeout; established TCP links serve the real steps afterwards.
from jax.sharding import NamedSharding, PartitionSpec
ones = jax.make_array_from_process_local_data(
    NamedSharding(mesh, PartitionSpec("dp")), np.ones(2, np.float32))
warm = jax.jit(lambda x: x.sum(),
               out_shardings=NamedSharding(mesh, PartitionSpec()))(ones)
assert float(warm) == 4.0, float(warm)
losses = []
for pb in placed:
    state, loss = compiled[pb["ids"].shape[1]](state, pb, rt_global)
    losses.append(float(loss))
assert all(np.isfinite(losses)), losses
print(f"RESULT {jax.process_index()} {losses[0]:.6f} {losses[1]:.6f}", flush=True)
print(f"SHAPES {jax.process_index()} {shapes[0]} {shapes[1]}", flush=True)

# ---- pretraining multi-host: strided example shards -> one global dp batch
# (PretrainTrainer.step_fn routes through shard_batch; epoch_batches yields
# the host's slice from an epoch-keyed global shuffle).
import math
from visitron_tpu import geometry as geo
from visitron_tpu.data import RegionFeatureStore
from visitron_tpu.data.candidates import build_candidate_tables
from visitron_tpu.data.pretrain_dataset import PretrainDataset
from visitron_tpu.pipelines.pretrain_datagen import generate_pretrain_examples
from visitron_tpu.train.pretrain import PretrainTrainer

hfov = geo.camera_hfov(640, 480, math.radians(60))
cand_tables = build_candidate_tables(world.graphs, hfov)
with tempfile.TemporaryDirectory() as d2:
    world.write_task_data(d2, counts={"train": 8})
    recs = generate_pretrain_examples(d2, ["train"], "NDH", world.graphs,
                                      cand_tables)
feats, tokens = world.region_features()
store = RegionFeatureStore(feats, tokens)
pds = PretrainDataset(
    recs[:8], tok, region_store=store,
    detector_classes=sorted({t for v in tokens.values() for t in v}),
    masked_token_prediction=True, max_seq_length=48, max_img_seq_length=16,
    region_feat_dim=world.region_feat_dim, seed=0)
pcfg = BertConfig(vocab_size=len(tok), hidden_size=32, num_hidden_layers=1,
                  num_attention_heads=4, intermediate_size=64,
                  max_position_embeddings=64, type_vocab_size=4,
                  img_feature_dim=world.region_feat_dim, action_space=36,
                  detector_classes=len(pds.class2id))
trainer = PretrainTrainer(pcfg, mesh=mesh, total_steps=10, schedule="constant")
pstate = trainer.init_state(pds.batch(range(2)))
pstep = trainer.step_fn()
plosses = []
for batch in pds.epoch_batches(2, host_id=jax.process_index(), num_hosts=2):
    pstate, bundle = pstep(pstate, batch)
    plosses.append(float(bundle["loss"]))
assert len(plosses) == 2, len(plosses)  # 8 examples / 2 hosts / batch 2
assert all(np.isfinite(plosses)), plosses
print(f"PRETRAIN {jax.process_index()} {plosses[0]:.6f} {plosses[1]:.6f}", flush=True)

# ---- ZeRO-1 under jax.distributed: moments sharded ACROSS processes.  Same
# seed/data as the plain trainer above, so the losses must match exactly;
# checkpoint save/restore must round-trip the cross-process shards (the
# numpy path cannot — train/checkpoint.py restores them via abstract
# sharded targets).
ztrainer = PretrainTrainer(pcfg, mesh=mesh, total_steps=10,
                           schedule="constant", zero1=True)
zstate = ztrainer.init_state(pds.batch(range(2)))
def _zbig(st):
    return max(jax.tree.leaves(st["opt_state"]), key=lambda x: x.size)
big = _zbig(zstate)
assert not big.is_fully_addressable  # spans both processes
local = sum(sh.data.size for sh in big.addressable_shards)
assert local == big.size // 2, (local, big.size)
zstep = ztrainer.step_fn()
zlosses = []
pds.set_epoch(0)  # replay the exact epoch-0 shuffle/masking the plain
                  # trainer consumed, so the losses are comparable
for batch in pds.epoch_batches(2, host_id=jax.process_index(), num_hosts=2):
    zstate, zb = zstep(zstate, batch)
    zlosses.append(float(zb["loss"]))
big = _zbig(zstate)
assert not big.is_fully_addressable
from visitron_tpu.train.checkpoint import CheckpointManager as _CM
cm = _CM(sys.argv[2])
cm.save(1, zstate["params"], zstate["opt_state"], wait=True)
restored = cm.restore(1, {"params": zstate["params"],
                          "opt_state": zstate["opt_state"]})
rbig = _zbig(restored)
assert rbig.sharding.is_equivalent_to(big.sharding, rbig.ndim)
np.testing.assert_array_equal(
    np.asarray(rbig.addressable_shards[0].data),
    np.asarray(big.addressable_shards[0].data))
print(f"ZERO1 {jax.process_index()} {zlosses[0]:.6f} {zlosses[1]:.6f}", flush=True)

# ---- preemption consensus: SIGTERM lands on host 0 ONLY; both hosts must
# agree to stop at the same sync boundary (a lone stopping host would hang
# the other's next collective forever — see train/preemption.py).
import signal as _signal
from visitron_tpu.train.preemption import PreemptionGuard
with PreemptionGuard(sync_every=2) as g:
    if jax.process_index() == 0:
        _signal.raise_signal(_signal.SIGTERM)
    stopped_at = 0
    for it in range(1, 7):
        # A real SPMD collective per step: both hosts must keep entering
        # these right up to the agreed boundary.
        s = float(jax.jit(lambda x: x.sum(),
                          out_shardings=NamedSharding(mesh, PartitionSpec()))(ones))
        assert s == 4.0, s
        if g.should_stop(it):
            stopped_at = it
            break
print(f"PREEMPT {jax.process_index()} {stopped_at} {int(g.fired)}", flush=True)
"""


def _run_workers(tmp_path, attempt: int):
    import socket

    with socket.socket() as s:  # free port
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    script = _WORKER.replace("%PORT%", str(port))
    path = tmp_path / f"worker_{attempt}.py"
    path.write_text(script)
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")
    shared_ckpt = tmp_path / f"zckpt_{attempt}"  # one dir, both processes
    procs = [subprocess.Popen([sys.executable, str(path), str(i),
                               str(shared_ckpt)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env, cwd=os.getcwd())
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=540)
        outs.append(out)
    return procs, outs


@pytest.mark.slow
def test_two_process_data_parallel_train(tmp_path):
    procs, outs = _run_workers(tmp_path, 0)
    if any(p.returncode != 0 for p in procs) and any(
            "DEADLINE_EXCEEDED" in o for o in outs):
        # Gloo's 30 s rendezvous (not configurable) can starve out when this
        # single-core host is oversubscribed; one retry once warm.
        procs, outs = _run_workers(tmp_path, 1)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
    results = {}
    shapes = {}
    pretrain = {}
    zero1 = {}
    preempt = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("RESULT"):
                _, pid, l0, l1 = line.split()
                results[pid] = (float(l0), float(l1))
            elif line.startswith("SHAPES"):
                _, pid, s0, s1 = line.split()
                shapes[pid] = (int(s0), int(s1))
            elif line.startswith("PRETRAIN"):
                _, pid, l0, l1 = line.split()
                pretrain[pid] = (float(l0), float(l1))
            elif line.startswith("ZERO1"):
                _, pid, l0, l1 = line.split()
                zero1[pid] = (float(l0), float(l1))
            elif line.startswith("PREEMPT"):
                _, pid, stop_it, fired = line.split()
                preempt[pid] = (int(stop_it), int(fired))
    assert set(results) == {"0", "1"}, outs
    # Replicated loss: both hosts computed the same global value.
    assert results["0"] == results["1"], results
    # Global length bucketing: both hosts independently derived the same
    # (collective-free) per-batch dialog bucket, at least one below max_seq.
    assert shapes["0"] == shapes["1"], shapes
    assert min(shapes["0"]) < 64, shapes
    # Pretraining leg: strided example shards assembled into one dp batch,
    # same replicated loss on both hosts.
    assert set(pretrain) == {"0", "1"}, outs
    assert pretrain["0"] == pretrain["1"], pretrain
    # ZeRO-1 leg: cross-process moment shards, identical losses to the
    # replicated trainer (same seed/data => same update math), checkpoint
    # round-trip asserted in-worker.
    assert set(zero1) == {"0", "1"}, outs
    assert zero1["0"] == zero1["1"], zero1
    for a, b in zip(zero1["0"], pretrain["0"]):
        assert abs(a - b) < 5e-5, (zero1, pretrain)
    # Preemption consensus: only host 0 received SIGTERM (fired 1 vs 0),
    # yet BOTH hosts stopped at the same sync boundary (step 2).
    assert preempt == {"0": (2, 1), "1": (2, 0)}, preempt
