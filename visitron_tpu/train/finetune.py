"""Viewpoint fine-tuning trainer + validation (reference train.py parity).

train(): iterate jitted teacher-forced train steps over shuffled episode
batches, log losses, checkpoint every saving_steps (train.py:120-173).

val(): per checkpoint — (a) teacher-forced loss pass with dropout
(allow_cheat parity, train.py:318-320), (b) argmax student rollout over each
val split, scored by the Evaluator (train.py:326-348); predictions JSON is
written in the EvalAI submission format.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from visitron_tpu.agents import ViewpointAgent
from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.config import RunConfig
from visitron_tpu.data.datasets import build_nav_instances
from visitron_tpu.evaluation import Evaluator
from visitron_tpu.train.checkpoint import CheckpointManager
from visitron_tpu.train.logging import (MetricsLogger, check_finite,
                                          setup_logger)
from visitron_tpu.train.workspace import Workspace


@dataclass
class ViewpointTrainer:
    cfg: RunConfig
    ws: Workspace

    def __post_init__(self):
        from visitron_tpu.parallel import maybe_mesh

        self.logger = setup_logger(output_dir=self.cfg.output_dir)
        # --mesh_dp/--mesh_tp (or >1 visible devices) put the whole workload on
        # a device mesh: batch dp-sharded, params replicated (reference DDP
        # covers all trainers, run_scripts/viewpoint_train/*:4).
        self.mesh = maybe_mesh(self.cfg.mesh_dp, self.cfg.mesh_tp)
        self.agent = ViewpointAgent(
            self.ws.bert_config,
            self.ws.runtime,
            feature_dim=self.cfg.lstm_img_feature_dim,
            episode_len=self.cfg.episode_len,
            aemb=self.cfg.aemb,
            rnn_dim=self.cfg.rnn_dim,
            encoder_hidden_size=self.cfg.encoder_hidden_size,
            dropout=self.cfg.dropout,
            learning_rate=self.cfg.learning_rate,
            max_grad_norm=self.cfg.agent_max_grad_norm,
            bf16_adam_moments=self.cfg.bf16_adam_moments,
            zero1=self.cfg.zero1 and self.mesh is not None,
            seed=self.cfg.seed,
            max_seq_length=self.cfg.max_seq_length,
            temperature=self.cfg.temperature,
            mesh=self.mesh,
        )
        self.ckpt = CheckpointManager(self.cfg.output_dir,
                                      async_save=self.cfg.async_checkpoints)

    def _instances(self, splits):
        if self.ws.synthetic is not None:
            import tempfile

            d = getattr(self.ws, "_synth_root", None)
            if d is None:
                d = tempfile.mkdtemp(prefix="visitron_synth_")
                self.ws.synthetic.write_task_data(d)
                self.ws._synth_root = d
            root = d
        else:
            root = self.cfg.data_root
        instances = build_nav_instances(
            root, splits, self.ws.tokenizer,
            path_type=self.cfg.path_type,
            add_ndh=self.cfg.add_ndh_data, add_r2r=self.cfg.add_r2r_data,
            add_r4r=self.cfg.add_r4r_data, add_rxr=self.cfg.add_rxr_data,
            oscar_setting=self.cfg.oscar_setting, tar_back=self.cfg.tar_back,
            max_seq_length=self.cfg.max_seq_length)
        if self.cfg.aug_data and "train" in splits:
            from visitron_tpu.agents.speaker import build_aug_instances

            aug = build_aug_instances(
                self.cfg.aug_data, self.ws.tokenizer,
                max_seq_length=self.cfg.max_seq_length,
                oscar_setting=self.cfg.oscar_setting,
                tar_back=self.cfg.tar_back)
            self.logger.info("aug_data: +%d speaker-generated instances", len(aug))
            instances = instances + aug
        return instances

    def _batcher(self, instances, batch_size, per_host: bool = False):
        """``per_host``: shard instances + batch size across processes so each
        host feeds its slice of the global dp batch (DistributedSampler
        parity, train.py:66-70)."""
        host_id, num_hosts = (jax.process_index(), jax.process_count()) \
            if per_host else (0, 1)
        return NavEpisodeBatcher(
            instances, self.ws.runtime, batch_size=batch_size // num_hosts,
            path_type=self.cfg.path_type, seed=self.cfg.seed,
            host_id=host_id, num_hosts=num_hosts,
            length_sort_window=self.cfg.length_sort_window)

    def train(self, state=None, resume: bool = False, profile_steps: int = 0) -> dict:
        """Train loop.  ``resume`` restores the latest checkpoint (params +
        optimizer state — exact-resume the reference lacked); ``profile_steps``
        captures a jax profiler trace of that many early steps into
        <output_dir>/profile."""
        cfg = self.cfg
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        batch_size = cfg.train_batch_size(n_dev)
        instances = self._instances(["train"])
        self.logger.info("training on %d instances, global batch %d (%d devices), "
                         "%d iterations", len(instances), batch_size, n_dev,
                         cfg.num_iterations)
        batcher = self._batcher(instances, batch_size, per_host=True)
        rl = cfg.feedback_method == "rl"
        if state is None:
            state = self.agent.init_state(with_critic=rl)
            state = self._maybe_load_pretrained(state)
        start_it = 0
        if resume and self.ckpt.latest() is not None:
            start_it = self.ckpt.latest()
            restored = self.ckpt.restore(
                start_it, {"params": state["params"], "opt_state": state["opt_state"]})
            if self.mesh is not None:
                # Restore to the template state's shardings (replicated
                # normally, dp-sharded moments under --zero1) via the
                # multi-host-safe placement path.
                from visitron_tpu.parallel import reshard_state

                shardings = jax.tree.map(
                    lambda x: x.sharding,
                    {"params": state["params"],
                     "opt_state": state["opt_state"]})
                restored = reshard_state(restored, shardings)
            state = {**state, **restored}
            batcher.skip_batches(start_it)
            self.logger.info("resumed from checkpoint-%d", start_it)
        # feedback_method selects the rollout policy during training
        # (reference params.py:201-207 allows sample|teacher; the extended
        # strategies of utils.py:381-427 are wired as student variants here;
        # "rl" is the A2C extension).
        student = cfg.feedback_method != "teacher"
        if rl:
            step = self.agent.rl_train_step_fn()
        elif student:
            step = self.agent.sample_train_step_fn(cfg.feedback_method)
        else:
            step = self.agent.train_step_fn()
        metrics = MetricsLogger(cfg.output_dir, "train")
        losses = []
        remaining = cfg.num_iterations - start_it
        self.logger.info(
            "compiling the train step (first iteration; can take minutes on "
            "remote-attached accelerators)...")
        profiling = False
        episode_len = None if student else cfg.episode_len
        from visitron_tpu.train.preemption import PreemptionGuard

        with PreemptionGuard() as guard:
            for i, batch in enumerate(
                    batcher.train_batches(remaining, episode_len=episode_len)):
                if student:
                    batch = batcher.with_sample_teacher(batch)
                it = start_it + i + 1
                if profile_steps and i == 1:  # skip compile step
                    jax.profiler.start_trace(os.path.join(cfg.output_dir, "profile"))
                    profiling = True
                jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
                state, out = step(state, jb)
                loss, aux = out if isinstance(out, tuple) else (out, None)
                if profiling and i == profile_steps:
                    jax.block_until_ready(loss)
                    jax.profiler.stop_trace()
                    profiling = False
                # Defer the device->host fetch to the logging boundary: a
                # per-step float(loss) forces a sync (an RPC round-trip on
                # remote-attached accelerators) and stops host batch prep from
                # overlapping device compute via async dispatch.
                losses.append(loss)
                if it % cfg.logging_steps == 0:
                    # One stacked fetch, not len(losses) sequential round-trips.
                    avg = check_finite(
                        float(jnp.stack(losses).mean()), it, self.logger)
                    losses.clear()
                    extra = {k: float(v) for k, v in (aux or {}).items()}
                    self.logger.info("iter %d loss %.4f %s", it, avg, extra or "")
                    metrics.log({"loss": avg, **extra}, step=it)
                saved = it % cfg.saving_steps == 0 or it == cfg.num_iterations
                if saved:
                    self.ckpt.save(it, state["params"], state["opt_state"])
                if guard.should_stop(it):
                    if not saved:
                        self.ckpt.save(it, state["params"], state["opt_state"],
                                       wait=True)
                    self.logger.info(
                        "termination signal: saved checkpoint-%d, stopping "
                        "(restart with --resume)", it)
                    break
        if profiling:
            jax.profiler.stop_trace()
        self.ckpt.wait_until_finished()
        metrics.close()
        # A SIGTERM grace window cannot afford the post-training val sweep:
        # callers (run.py) check this flag and return right after the
        # preemption checkpoint.
        self.preempted = guard.stop
        return state

    def _maybe_load_pretrained(self, state: dict) -> dict:
        """Initialize the dialog encoder's BERT from the Oscar checkpoint
        (train.py:40 + --no_pretrained_model parity, params.py:61-66)."""
        cfg = self.cfg
        if cfg.no_pretrained_model or not cfg.model_name_or_path:
            return state
        if not os.path.exists(cfg.model_name_or_path):
            self.logger.warning("model_name_or_path %s not found; training from scratch",
                                cfg.model_name_or_path)
            return state
        from visitron_tpu.models.oscar_import import (
            graft_bert_into_encoder, graft_pretrain_checkpoint_into_encoder,
            is_pretrain_checkpoint)

        params = dict(state["params"])
        if is_pretrain_checkpoint(cfg.model_name_or_path):
            # The ablation chain: stage-2 pretraining (run.py pretrain, orbax)
            # -> nav fine-tune, the reference's checkpoint-30000 handoff
            # (run_scripts/ablations/*finetune*.sh).
            params["encoder"] = graft_pretrain_checkpoint_into_encoder(
                params["encoder"], cfg.model_name_or_path)
            self.logger.info("loaded pretraining checkpoint from %s",
                             cfg.model_name_or_path)
        else:
            params["encoder"] = graft_bert_into_encoder(
                params["encoder"], cfg.model_name_or_path, self.ws.bert_config)
            self.logger.info("loaded Oscar/BERT weights from %s",
                             cfg.model_name_or_path)
        return {**state, "params": params}

    def test_submission(self, state=None, split: str = "test") -> str:
        """Roll out the test split and write the EvalAI submission JSON
        (train.py:367-499 parity; cyclic-path avoidance enabled)."""
        cfg = self.cfg
        if state is None:
            latest = self.ckpt.latest()
            state = self.agent.init_state()
            if latest is not None:
                # Raw restore: tolerates checkpoints with extra subtrees
                # (e.g. the RL critic) — rollouts use encoder/decoder only.
                state["params"] = self.ckpt.restore_raw(latest)
        instances = self._instances([split])
        batcher = self._batcher(instances, cfg.per_gpu_eval_batch_size)
        results = self.agent.test(state["params"], batcher.eval_batches(),
                                  feedback="argmax", submit=True)
        self.agent.results = results
        path = os.path.join(cfg.output_dir, f"submission_{split}.json")
        self.agent.write_results(path)
        self.logger.info("wrote %d trajectories to %s", len(results), path)
        return path

    def val(self, steps=None, splits=("val_seen", "val_unseen")) -> dict:
        cfg = self.cfg
        steps = steps if steps is not None else (self.ckpt.steps() or [None])
        metrics = MetricsLogger(cfg.output_dir, "val")
        out = {}
        # Val data is checkpoint-independent: build/tokenize once per split.
        split_assets = {}
        for split in splits:
            instances = self._instances([split])
            split_assets[split] = (
                instances, self._batcher(instances, cfg.per_gpu_eval_batch_size))
        template_params = self.agent.init_state()["params"]
        for ckpt_step in steps:
            if ckpt_step is None:
                params = template_params
            else:
                # Raw restore tolerates RL checkpoints (extra critic subtree).
                params = self.ckpt.restore_raw(ckpt_step)
            for split in splits:
                instances, batcher = split_assets[split]
                # Loss pass: teacher-forced with dropout (train.py:318-320).
                eval_loss = self.agent.eval_loss_fn(use_dropout=True)
                losses = []
                rng = jax.random.PRNGKey(cfg.seed)
                for batch in batcher.eval_batches(episode_len=cfg.episode_len):
                    jb = {k: np.asarray(v) for k, v in batch.items()
                          if not isinstance(v, list)}
                    rng, r = jax.random.split(rng)
                    losses.append(eval_loss(params, jb, r))  # fetch after loop
                losses = ([float(jnp.stack(losses).mean())] if losses else [])
                # Argmax rollout pass.
                results = self.agent.test(params, batcher.eval_batches(),
                                          feedback="argmax", submit=cfg.submit)
                self.agent.results = results
                pred_path = os.path.join(
                    cfg.output_dir, f"preds_{split}_{ckpt_step}.json")
                self.agent.write_results(pred_path)
                gt = [it.raw for it in instances if it.raw.get("end_panos")]
                evaluator = Evaluator(gt, self.ws.graphs, path_type=cfg.path_type)
                scored = {k: v for k, v in results.items()
                          if k in evaluator.instr_ids}
                summary, _ = evaluator.score_results(scored)
                summary["loss"] = float(np.mean(losses)) if losses else 0.0
                self.logger.info("ckpt %s %s: %s", ckpt_step, split, summary)
                metrics.log(summary, step=ckpt_step or 0, prefix=f"{split}/")
                out[(ckpt_step, split)] = summary
        metrics.close()
        return out
