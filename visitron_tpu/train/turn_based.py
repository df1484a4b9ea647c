"""Turn-based (low-level action space) trainer + validation.

Reference: tasks/turn_based/train.py — the same train/val skeleton as the
viewpoint trainer over the 6-action agent: shuffled teacher-forced training
with TensorBoard/CSV logging and checkpoints, and a per-checkpoint val loop
that scores argmax rollouts on val_seen/val_unseen with the NDH metrics
(turn_based/train.py val(); eval.py parity).
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from visitron_tpu.agents.batcher import NavEpisodeBatcher
from visitron_tpu.agents.turn_based import TurnBasedAgent
from visitron_tpu.config import RunConfig
from visitron_tpu.data.datasets import build_nav_instances
from visitron_tpu.evaluation import Evaluator
from visitron_tpu.train.checkpoint import CheckpointManager
from visitron_tpu.train.logging import (MetricsLogger, check_finite,
                                          setup_logger)
from visitron_tpu.train.workspace import Workspace


@dataclass
class TurnBasedTrainer:
    cfg: RunConfig
    ws: Workspace

    def __post_init__(self):
        from visitron_tpu.parallel import maybe_mesh

        self.logger = setup_logger(output_dir=self.cfg.output_dir)
        self.mesh = maybe_mesh(self.cfg.mesh_dp, self.cfg.mesh_tp)
        self.agent = TurnBasedAgent(
            self.ws.bert_config, self.ws.runtime,
            feature_dim=self.cfg.lstm_img_feature_dim,
            episode_len=self.cfg.episode_len, aemb=self.cfg.aemb,
            rnn_dim=self.cfg.rnn_dim,
            encoder_hidden_size=self.cfg.encoder_hidden_size,
            dropout=self.cfg.dropout, learning_rate=self.cfg.learning_rate,
            bf16_adam_moments=self.cfg.bf16_adam_moments,
            seed=self.cfg.seed, max_seq_length=self.cfg.max_seq_length,
            mesh=self.mesh)
        self.ckpt = CheckpointManager(self.cfg.output_dir,
                                      async_save=self.cfg.async_checkpoints)

    def _data_root(self) -> str:
        if self.ws.synthetic is not None:
            import tempfile

            d = getattr(self.ws, "_synth_root", None)
            if d is None:
                d = tempfile.mkdtemp(prefix="visitron_synth_")
                self.ws.synthetic.write_task_data(d)
                self.ws._synth_root = d
            return d
        return self.cfg.data_root

    def _instances(self, splits):
        return build_nav_instances(
            self._data_root(), splits, self.ws.tokenizer,
            path_type=self.cfg.path_type,
            add_ndh=self.cfg.add_ndh_data, add_r2r=self.cfg.add_r2r_data,
            add_r4r=self.cfg.add_r4r_data, add_rxr=self.cfg.add_rxr_data,
            oscar_setting=self.cfg.oscar_setting, tar_back=self.cfg.tar_back,
            max_seq_length=self.cfg.max_seq_length)

    def _batcher(self, instances, batch_size, per_host: bool = False):
        host_id, num_hosts = (jax.process_index(), jax.process_count()) \
            if per_host else (0, 1)
        return NavEpisodeBatcher(
            instances, self.ws.runtime, batch_size=batch_size // num_hosts,
            path_type=self.cfg.path_type, seed=self.cfg.seed,
            host_id=host_id, num_hosts=num_hosts,
            length_sort_window=self.cfg.length_sort_window)

    def train(self, state=None, resume: bool = False) -> dict:
        cfg = self.cfg
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        batch_size = cfg.train_batch_size(n_dev)
        instances = self._instances(["train"])
        self.logger.info("turn-based: %d instances, global batch %d, %d iterations",
                         len(instances), batch_size, cfg.num_iterations)
        batcher = self._batcher(instances, batch_size, per_host=True)
        if state is None:
            state = self.agent.init_state()
        start_it = 0
        if resume and self.ckpt.latest() is not None:
            start_it = self.ckpt.latest()
            restored = self.ckpt.restore(
                start_it, {"params": state["params"], "opt_state": state["opt_state"]})
            if self.mesh is not None:
                from visitron_tpu.parallel import replicate_state

                restored = replicate_state(self.mesh, restored)
            state = {**state, **restored}
            batcher.skip_batches(start_it)
            self.logger.info("resumed from checkpoint-%d", start_it)
        step = self.agent.train_step_fn()
        metrics = MetricsLogger(cfg.output_dir, "train")
        losses = []
        from visitron_tpu.train.preemption import PreemptionGuard

        with PreemptionGuard() as guard:
            for i, batch in enumerate(
                    batcher.train_batches(cfg.num_iterations - start_it)):
                batch = batcher.with_turn_teacher(batch, cfg.episode_len)
                jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
                state, loss = step(state, jb)
                it = start_it + i + 1
                # Fetch only at the logging boundary (see finetune.py: a
                # per-step float() sync defeats async dispatch overlap).
                losses.append(loss)
                if it % cfg.logging_steps == 0:
                    # One stacked fetch, not len(losses) round-trips.
                    avg = check_finite(
                        float(jnp.stack(losses).mean()), it, self.logger)
                    losses.clear()
                    self.logger.info("iter %d loss %.4f", it, avg)
                    metrics.log({"loss": avg}, step=it)
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
        self.ckpt.wait_until_finished()
        metrics.close()
        # run.py skips the post-training val sweep when preempted (the
        # SIGTERM grace window ends at the checkpoint).
        self.preempted = guard.stop
        return state

    def val(self, steps=None, splits=("val_seen", "val_unseen")) -> dict:
        """Per-checkpoint val: teacher-forced loss + argmax rollout scored with
        the NDH metrics (turn_based/train.py val loop parity)."""
        cfg = self.cfg
        steps = steps if steps is not None else (self.ckpt.steps() or [None])
        metrics = MetricsLogger(cfg.output_dir, "val")
        out = {}
        split_assets = {}
        for split in splits:
            instances = self._instances([split])
            split_assets[split] = (
                instances, self._batcher(instances, cfg.per_gpu_eval_batch_size))
        template_params = self.agent.init_state()["params"]
        for ckpt_step in steps:
            params = template_params if ckpt_step is None else self.ckpt.restore(
                ckpt_step, {"params": template_params})["params"]
            for split in splits:
                instances, batcher = split_assets[split]
                eval_loss = self.agent.eval_loss_fn(use_dropout=True)
                losses = []
                rng = jax.random.PRNGKey(cfg.seed)
                for batch in batcher.eval_batches():
                    batch = batcher.with_turn_teacher(batch, cfg.episode_len)
                    jb = {k: np.asarray(v) for k, v in batch.items()
                          if not isinstance(v, list)}
                    rng, r = jax.random.split(rng)
                    losses.append(eval_loss(params, jb, r))  # fetch after loop
                losses = ([float(jnp.stack(losses).mean())] if losses else [])
                results = self.agent.test(params, batcher.eval_batches(),
                                          feedback="argmax")
                self.agent.results = results
                pred_path = os.path.join(
                    cfg.output_dir, f"preds_turn_{split}_{ckpt_step}.json")
                _write_results(results, pred_path)
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


def _write_results(results: dict, path: str) -> None:
    import json

    with open(path, "w") as f:
        json.dump([{"inst_idx": k, "trajectory": v} for k, v in results.items()], f)
