"""Question-asking classifier trainer + per-checkpoint validation.

Reference: tasks/viewpoint_select/train_classifier.py — loads a FINE-TUNED
navigation checkpoint (``--model_name_or_path`` is the nav run directory,
train_classifier.py:45-47,129), backfills the fresh question head
(classifier/agent.py:699-711), optionally freezes everything but
``question_linear`` (--only_finetune_classifier, classifier/agent.py:141-147),
trains with pos-weighted BCE, and logs classification metrics on the val
splits per checkpoint (train_classifier.py:179-184,352-370).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from visitron_tpu.agents.classifier import ClassifierAgent
from visitron_tpu.config import RunConfig
from visitron_tpu.data.classifier_dataset import build_classifier_instances
from visitron_tpu.train.checkpoint import CheckpointManager
from visitron_tpu.train.logging import (MetricsLogger, check_finite,
                                          setup_logger)
from visitron_tpu.train.workspace import Workspace


@dataclass
class ClassifierTrainer:
    cfg: RunConfig
    ws: Workspace

    def __post_init__(self):
        from visitron_tpu.parallel import maybe_mesh

        self.logger = setup_logger(output_dir=self.cfg.output_dir)
        self.mesh = maybe_mesh(self.cfg.mesh_dp, self.cfg.mesh_tp)
        self.agent = ClassifierAgent(
            self.ws.bert_config, self.ws.runtime,
            feature_dim=self.cfg.lstm_img_feature_dim,
            episode_len=self.cfg.episode_len, aemb=self.cfg.aemb,
            rnn_dim=self.cfg.rnn_dim,
            encoder_hidden_size=self.cfg.encoder_hidden_size,
            dropout=self.cfg.dropout, learning_rate=self.cfg.learning_rate,
            pos_weight=self.cfg.question_asking_class_weight,
            only_finetune_classifier=self.cfg.only_finetune_classifier,
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
        return build_classifier_instances(
            self._data_root(), splits, self.ws.tokenizer,
            oscar_setting=self.cfg.oscar_setting, tar_back=self.cfg.tar_back,
            max_seq_length=self.cfg.max_seq_length)

    def init_state(self) -> dict:
        """Fresh state, then — the reference's whole premise — initialize the
        encoder and the shared decoder weights from the fine-tuned nav
        checkpoint at --model_name_or_path (train_classifier.py:129)."""
        state = self.agent.init_state()
        nav_dir = self.cfg.model_name_or_path
        if not nav_dir:
            return state
        import os

        if not os.path.isdir(nav_dir):
            self.logger.warning(
                "nav checkpoint dir %s not found; classifier starts from "
                "scratch", nav_dir)
            return state
        nav_ckpt = CheckpointManager(nav_dir)
        latest = nav_ckpt.latest()
        if latest is None:
            self.logger.warning("no checkpoint-* under %s; starting from scratch",
                                nav_dir)
            return state
        nav_params = nav_ckpt.restore_raw(latest)
        params = dict(state["params"])
        params["encoder"] = jax.tree.map(np.asarray, nav_params["encoder"])
        params = self.agent.load_nav_decoder(params, nav_params["decoder"])
        state = {**state, "params": params}
        # The optimizer state templates the params; rebuild after the graft.
        state["opt_state"] = jax.jit(self.agent.optimizer.init)(state["params"])
        if self.mesh is not None:
            from visitron_tpu.parallel import replicate_state

            state = replicate_state(self.mesh, state)
        self.logger.info("initialized from nav checkpoint-%d at %s", latest, nav_dir)
        return state

    def train(self, state=None, resume: bool = False) -> dict:
        cfg = self.cfg
        if state is None:
            state = self.init_state()
        start_it = 0
        if resume and self.ckpt.latest() is not None:
            start_it = self.ckpt.latest()
            restored = self.ckpt.restore(
                start_it, {"params": state["params"], "opt_state": state["opt_state"]})
            if self.mesh is not None:
                from visitron_tpu.parallel import replicate_state

                restored = replicate_state(self.mesh, restored)
            state = {**state, **restored}
            self.logger.info("resumed from checkpoint-%d", start_it)
        n_dev = self.mesh.devices.size if self.mesh is not None else 1
        host_id, num_hosts = jax.process_index(), jax.process_count()
        bs = max(cfg.train_batch_size(n_dev) // num_hosts, 1)
        instances = self._instances(["train"])[host_id::num_hosts]
        self.logger.info("classifier: %d instances, per-host batch %d, %d iterations",
                         len(instances), bs, cfg.num_iterations)
        if len(instances) < bs:
            # The epoch loop below takes full batches only; a shard smaller
            # than the batch would make zero progress per epoch and spin
            # forever.  Fail loudly instead.
            raise ValueError(
                f"classifier: per-host shard has {len(instances)} instances "
                f"< batch size {bs}; lower --per_gpu_train_batch_size or add "
                f"data")
        step = self.agent.train_step_fn()
        metrics = MetricsLogger(cfg.output_dir, "train")
        order = np.arange(len(instances))
        rng = np.random.default_rng(cfg.seed)
        losses = []
        it = start_it
        # Exact-schedule resume: replay the completed epochs' shuffles and
        # skip the completed slice of the in-progress epoch, so the resumed
        # run sees the batches an uninterrupted run would have.
        steps_per_epoch = max(len(range(0, len(order) - bs + 1, bs)), 1)
        for _ in range(start_it // steps_per_epoch):
            rng.shuffle(order)
        skip = start_it % steps_per_epoch
        from visitron_tpu.train.preemption import PreemptionGuard

        with PreemptionGuard() as guard:
            while it < cfg.num_iterations and not guard.stop:
                rng.shuffle(order)
                for start in range(0, len(order) - bs + 1, bs):
                    if skip:
                        skip -= 1
                        continue
                    items = [instances[j] for j in order[start:start + bs]]
                    batch = self.agent.prepare_batch(items)
                    jb = {k: np.asarray(v) for k, v in batch.items()
                          if not isinstance(v, list)}
                    state, loss = step(state, jb)
                    it += 1
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
                    saved = it % cfg.saving_steps == 0 or it >= cfg.num_iterations
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
                    if it >= cfg.num_iterations:
                        break
        self.ckpt.wait_until_finished()
        metrics.close()
        # run.py skips the post-training val sweep when preempted (the
        # SIGTERM grace window ends at the checkpoint).
        self.preempted = guard.stop
        return state

    def _eval_batches(self, instances):
        bs = self.cfg.per_gpu_eval_batch_size
        out = []
        for start in range(0, len(instances) - bs + 1, bs):
            out.append(self.agent.prepare_batch(instances[start:start + bs]))
        if not out and instances:
            out.append(self.agent.prepare_batch(instances))
        return out

    def val(self, steps=None, splits=("val_seen", "val_unseen")) -> dict:
        """Classification metrics (accuracy/F1/balanced-acc/MCC) per checkpoint
        per split (train_classifier.py:352-370, classifier/agent.py:596-603)."""
        cfg = self.cfg
        steps = steps if steps is not None else (self.ckpt.steps() or [None])
        metrics = MetricsLogger(cfg.output_dir, "val")
        out = {}
        split_batches = {}
        for split in splits:
            try:
                split_batches[split] = self._eval_batches(self._instances([split]))
            except FileNotFoundError:
                continue
        template_params = self.agent.init_state()["params"]
        for ckpt_step in steps:
            params = template_params if ckpt_step is None else self.ckpt.restore(
                ckpt_step, {"params": template_params})["params"]
            for split, batches in split_batches.items():
                if not batches:
                    continue
                m = self.agent.evaluate(params, batches)
                self.logger.info("ckpt %s %s: %s", ckpt_step, split, m)
                metrics.log(m, step=ckpt_step or 0, prefix=f"{split}/")
                out[(ckpt_step, split)] = m
        metrics.close()
        return out
