"""CLI entry point: ``python -m visitron_tpu.run <task> [--flags]``.

Replaces the reference's four train mains + 37 run shell scripts
(run_scripts/**) with subcommands over the unified RunConfig flag surface:

  viewpoint   NDH(+R2R/R4R/RxR) viewpoint-selection fine-tuning + validation
  turn_based  low-level action-space training
  classifier  question-asking classifier training/evaluation
  pretrain    multimodal (MLM + action + region-token) pretraining
  datagen     pretraining-example generation (path walks)

Run-mode dispatch (cpu / single-chip / multi-chip) is implicit: jax device
discovery + the (dp, tp) mesh replace CUDA_VISIBLE_DEVICES / DataParallel /
torch.distributed.launch (reference run_scripts/*:1-24).
"""

from __future__ import annotations

import sys

import numpy as np

from visitron_tpu.config import RunConfig
from visitron_tpu.train.workspace import Workspace


def run_viewpoint(cfg: RunConfig, do_val: bool = True):
    from visitron_tpu.train.finetune import ViewpointTrainer

    ws = _workspace_for_nav(cfg)
    trainer = ViewpointTrainer(cfg, ws)
    state = trainer.train()
    if do_val:
        # --eval_iters selects checkpoint iterations; [-1] means all
        # (reference train.py:182-189).
        steps = None if cfg.eval_iters == [-1] else cfg.eval_iters
        trainer.val(steps=steps)
    return state


def _workspace_for_nav(cfg: RunConfig) -> Workspace:
    if cfg.debug:
        return Workspace.synthetic_workspace(cfg)
    from visitron_tpu.data.datasets import load_split

    scans = set()
    for splits in (["train"], ["val_seen"], ["val_unseen"]):
        try:
            for item in load_split(cfg.data_root, splits, "NDH"):
                scans.add(item["scan"])
        except FileNotFoundError:
            pass
    for ds, flag in (("R2R", cfg.add_r2r_data), ("R4R", cfg.add_r4r_data)):
        if flag:
            for item in load_split(cfg.data_root, ["train"], ds):
                scans.add(item["scan"])
    if cfg.add_rxr_data:
        for item in load_split(cfg.data_root, ["train"], "RxR"):
            scans.add(item["scan"])
    return Workspace.from_config(cfg, scans=scans)


def run_turn_based(cfg: RunConfig):
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.agents.turn_based import TurnBasedAgent
    from visitron_tpu.data.datasets import build_nav_instances
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.logging import MetricsLogger, setup_logger
    import jax

    ws = _workspace_for_nav(cfg)
    logger = setup_logger(output_dir=cfg.output_dir)
    if ws.synthetic is not None:
        import tempfile

        root = tempfile.mkdtemp(prefix="visitron_synth_")
        ws.synthetic.write_task_data(root)
    else:
        root = cfg.data_root
    instances = build_nav_instances(
        root, ["train"], ws.tokenizer, path_type=cfg.path_type,
        add_ndh=cfg.add_ndh_data, add_r2r=cfg.add_r2r_data,
        add_r4r=cfg.add_r4r_data, add_rxr=cfg.add_rxr_data,
        oscar_setting=cfg.oscar_setting, tar_back=cfg.tar_back,
        max_seq_length=cfg.max_seq_length)
    agent = TurnBasedAgent(
        ws.bert_config, ws.runtime, feature_dim=cfg.lstm_img_feature_dim,
        episode_len=cfg.episode_len, aemb=cfg.aemb, rnn_dim=cfg.rnn_dim,
        encoder_hidden_size=cfg.encoder_hidden_size, dropout=cfg.dropout,
        learning_rate=cfg.learning_rate, seed=cfg.seed,
        max_seq_length=cfg.max_seq_length)
    batcher = NavEpisodeBatcher(instances, ws.runtime,
                                batch_size=cfg.train_batch_size(jax.local_device_count()),
                                path_type=cfg.path_type, seed=cfg.seed)
    state = agent.init_state()
    step = agent.train_step_fn()
    ckpt = CheckpointManager(cfg.output_dir)
    metrics = MetricsLogger(cfg.output_dir, "train")
    losses = []
    for i, batch in enumerate(batcher.train_batches(cfg.num_iterations)):
        batch = batcher.with_turn_teacher(batch, cfg.episode_len)
        jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
        state, loss = step(state, jb)
        losses.append(float(loss))
        it = i + 1
        if it % cfg.logging_steps == 0:
            logger.info("iter %d loss %.4f", it, float(np.mean(losses[-cfg.logging_steps:])))
            metrics.log({"loss": float(np.mean(losses[-cfg.logging_steps:]))}, step=it)
        if it % cfg.saving_steps == 0 or it == cfg.num_iterations:
            ckpt.save(it, state["params"], state["opt_state"])
    metrics.close()
    return state


def run_classifier(cfg: RunConfig):
    from visitron_tpu.agents.classifier import ClassifierAgent
    from visitron_tpu.data.classifier_dataset import build_classifier_instances
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.logging import MetricsLogger, setup_logger

    ws = _workspace_for_nav(cfg)
    logger = setup_logger(output_dir=cfg.output_dir)
    if ws.synthetic is not None:
        import tempfile

        root = tempfile.mkdtemp(prefix="visitron_synth_")
        ws.synthetic.write_task_data(root)
    else:
        root = cfg.data_root
    instances = build_classifier_instances(
        root, ["train"], ws.tokenizer, oscar_setting=cfg.oscar_setting,
        tar_back=cfg.tar_back, max_seq_length=cfg.max_seq_length)
    agent = ClassifierAgent(
        ws.bert_config, ws.runtime, feature_dim=cfg.lstm_img_feature_dim,
        episode_len=cfg.episode_len, aemb=cfg.aemb, rnn_dim=cfg.rnn_dim,
        encoder_hidden_size=cfg.encoder_hidden_size, dropout=cfg.dropout,
        learning_rate=cfg.learning_rate,
        pos_weight=cfg.question_asking_class_weight,
        only_finetune_classifier=cfg.only_finetune_classifier,
        seed=cfg.seed, max_seq_length=cfg.max_seq_length)
    state = agent.init_state()
    step = agent.train_step_fn()
    ckpt = CheckpointManager(cfg.output_dir)
    metrics = MetricsLogger(cfg.output_dir, "train")
    bs = cfg.per_gpu_train_batch_size
    order = np.arange(len(instances))
    rng = np.random.default_rng(cfg.seed)
    it = 0
    while it < cfg.num_iterations:
        rng.shuffle(order)
        for start in range(0, len(order) - bs + 1, bs):
            items = [instances[j] for j in order[start:start + bs]]
            batch = agent.prepare_batch(items)
            jb = {k: np.asarray(v) for k, v in batch.items() if not isinstance(v, list)}
            state, loss = step(state, jb)
            it += 1
            if it % cfg.logging_steps == 0:
                logger.info("iter %d loss %.4f", it, float(loss))
                metrics.log({"loss": float(loss)}, step=it)
            if it % cfg.saving_steps == 0 or it >= cfg.num_iterations:
                ckpt.save(it, state["params"], state["opt_state"])
            if it >= cfg.num_iterations:
                break
    # Final evaluation pass (classification metrics).
    eval_batches = []
    for start in range(0, len(instances) - bs + 1, bs):
        eval_batches.append(agent.prepare_batch(instances[start:start + bs]))
    if eval_batches:
        m = agent.evaluate(state["params"], eval_batches)
        logger.info("classifier metrics: %s", m)
        metrics.log(m, step=cfg.num_iterations, prefix="eval/")
    metrics.close()
    return state


def run_pretrain(cfg: RunConfig):
    import jax

    from visitron_tpu.data import RegionFeatureStore
    from visitron_tpu.data.candidates import build_candidate_tables
    from visitron_tpu.data.pretrain_dataset import PretrainDataset
    from visitron_tpu.parallel import make_mesh
    from visitron_tpu.pipelines.pretrain_datagen import generate_pretrain_examples
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.logging import MetricsLogger, setup_logger
    from visitron_tpu.train.pretrain import PretrainTrainer
    from visitron_tpu import geometry as geo

    ws = _workspace_for_nav(cfg)
    logger = setup_logger(output_dir=cfg.output_dir)
    hfov = geo.camera_hfov(ws.feat_table.image_w, ws.feat_table.image_h,
                           np.radians(ws.feat_table.vfov))
    tables = {s: ws.runtime.tables[s] for s in ws.graphs}
    if ws.synthetic is not None:
        import tempfile

        root = tempfile.mkdtemp(prefix="visitron_synth_")
        ws.synthetic.write_task_data(root)
        feats, tokens = ws.synthetic.region_features()
        store = RegionFeatureStore(feats, tokens)
        detector_classes = sorted({t for v in tokens.values() for t in v})
        if cfg.debug and "wall" not in detector_classes:
            # --debug substitutes constant "wall" region labels
            # (data_loader_pretrain.py:524-525); keep it classifiable.
            detector_classes.append("wall")
    else:
        root = cfg.data_root
        store = RegionFeatureStore.from_pickle(cfg.region_feature_prefix)
        detector_classes = sorted({t for v in store.region_tokens.values() for t in v})

    def make_dataset(splits):
        records = []
        for ds, flag in (("NDH", cfg.add_ndh_data), ("R2R", cfg.add_r2r_data),
                         ("R4R", cfg.add_r4r_data), ("RxR", cfg.add_rxr_data)):
            if not flag:
                continue
            if ds == "RxR" and splits != ["train"]:
                continue  # RxR ships train-guide annotations only
            try:
                records += generate_pretrain_examples(root, splits, ds, ws.graphs, tables)
            except FileNotFoundError:
                if splits == ["train"]:
                    raise
        if not records:
            return None
        return PretrainDataset(
            records, ws.tokenizer, region_store=store,
            detector_classes=detector_classes,
            masked_token_prediction=cfg.masked_token_prediction,
            no_action_grounding=cfg.no_action_grounding,
            mlm_probability=cfg.mlm_probability,
            max_seq_length=cfg.max_seq_length,
            max_img_seq_length=cfg.max_img_seq_length,
            region_feat_dim=cfg.img_feature_dim,
            oscar_setting=cfg.oscar_setting, tar_back=cfg.tar_back,
            debug=cfg.debug, seed=cfg.seed)

    dataset = make_dataset(["train"])
    mesh = make_mesh(dp=cfg.mesh_dp or None, tp=cfg.mesh_tp)
    bcfg = ws.bert_config.replace(detector_classes=len(detector_classes))
    steps_per_epoch = max(len(dataset) // cfg.train_batch_size(mesh.devices.size), 1)
    trainer = PretrainTrainer(
        bcfg, learning_rate=cfg.learning_rate, warmup_steps=cfg.warmup_steps,
        total_steps=cfg.num_epochs * steps_per_epoch, schedule=cfg.scheduler,
        weight_decay=cfg.weight_decay, adam_epsilon=cfg.adam_epsilon,
        max_grad_norm=cfg.max_grad_norm, mesh=mesh, seed=cfg.seed)
    batch_size = cfg.train_batch_size(mesh.devices.size)
    state = trainer.init_state(dataset.batch(range(min(batch_size, len(dataset)))))
    ckpt = CheckpointManager(cfg.output_dir)
    metrics = MetricsLogger(cfg.output_dir, "train")
    step = trainer.step_fn()
    it = 0
    for epoch in range(cfg.num_epochs):
        for batch in dataset.epoch_batches(batch_size):
            state, bundle = step(state, batch)
            it += 1
            if it % cfg.logging_steps == 0:
                vals = {k: float(v) for k, v in bundle.items()}
                logger.info("epoch %d iter %d %s", epoch, it, vals)
                metrics.log(vals, step=it)
        ckpt.save(it, state["params"], state["opt_state"])
        # Per-epoch validation over the val splits (pretrain.py:273-579 parity).
        for split in ("val_seen", "val_unseen"):
            val_ds = make_dataset([split])
            if val_ds is None or len(val_ds) < batch_size:
                continue
            vals = trainer.evaluate(state["params"], val_ds, batch_size)
            logger.info("epoch %d %s %s", epoch, split, vals)
            metrics.log(vals, step=it, prefix=f"{split}/")
    metrics.close()
    return state


def _maybe_init_multihost() -> None:
    """Multi-host SPMD: when launched under a multi-host runtime (coordinator
    address in the environment), join the global mesh.  This replaces
    torch.distributed.launch + NCCL init (reference run_scripts/*:4,
    train.py:536-548): afterwards jax.devices() spans all hosts and every
    jitted step is a single global SPMD program."""
    import os

    if os.environ.get("JAX_COORDINATOR_ADDRESS"):
        import jax

        jax.distributed.initialize()


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    _maybe_init_multihost()
    task, rest = argv[0], argv[1:]
    if rest and rest[0] == "--config":
        # Experiment-config file (run_configs/*.json) + CLI overrides.
        import dataclasses

        base = RunConfig.from_json(rest[1])
        cfg = RunConfig.from_args(rest[2:])
        defaults = RunConfig()
        overrides = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(RunConfig)
                     if getattr(cfg, f.name) != getattr(defaults, f.name)}
        cfg = dataclasses.replace(base, **overrides)
    else:
        cfg = RunConfig.from_args(rest)
    if task == "viewpoint":
        run_viewpoint(cfg)
    elif task == "turn_based":
        run_turn_based(cfg)
    elif task == "classifier":
        run_classifier(cfg)
    elif task == "pretrain":
        run_pretrain(cfg)
    elif task == "datagen":
        run_datagen(cfg)
    else:
        raise SystemExit(f"unknown task {task!r}; see --help")


def run_datagen(cfg: RunConfig):
    """Write per-path-step pretraining JSONs (reference
    scripts/generate_pretraining_data.py, minus the 8-process simulator pool —
    the closed-form walk needs none)."""
    from visitron_tpu.pipelines.pretrain_datagen import write_pretrain_data
    from visitron_tpu.train.logging import setup_logger

    ws = _workspace_for_nav(cfg)
    logger = setup_logger(output_dir=cfg.output_dir)
    if ws.synthetic is not None:
        import tempfile

        root = tempfile.mkdtemp(prefix="visitron_synth_")
        ws.synthetic.write_task_data(root)
    else:
        root = cfg.data_root
    tables = {s: ws.runtime.tables[s] for s in ws.graphs}
    for ds, flag in (("NDH", cfg.add_ndh_data), ("R2R", cfg.add_r2r_data),
                     ("R4R", cfg.add_r4r_data), ("RxR", cfg.add_rxr_data)):
        if not flag:
            continue
        splits = ["train"] if ds == "RxR" else ["train", "val_seen", "val_unseen"]
        out = write_pretrain_data(root, splits, ds, ws.graphs, tables)
        logger.info("wrote %s pretraining data under %s", ds, out)


if __name__ == "__main__":
    main()
