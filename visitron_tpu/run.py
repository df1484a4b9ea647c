"""CLI entry point: ``python -m visitron_tpu.run <task> [--flags]``.

Replaces the reference's four train mains + 37 run shell scripts
(run_scripts/**) with subcommands over the unified RunConfig flag surface:

  viewpoint        NDH(+R2R/R4R/RxR) viewpoint-selection fine-tune + val
  turn_based       low-level action-space training + val
  classifier       question-asking classifier training + val
  pretrain         multimodal (MLM + action + region-token) pretraining
  datagen          pretraining-example generation (path walks)
  speaker          train a trajectory->instruction speaker (augmentation)
  augment          caption sampled walks -> R2R-format aug JSON (--aug_data)
  extract_scene    skybox JPEGs -> 36-view ResNet scene features (TSV)
  extract_regions  skybox JPEGs -> bottom-up region features (pickle store)

Run-mode dispatch (cpu / single-chip / multi-chip) is implicit: jax device
discovery + the (dp, tp) mesh replace CUDA_VISIBLE_DEVICES / DataParallel /
torch.distributed.launch (reference run_scripts/*:1-24).
"""

from __future__ import annotations

import os
import sys

import numpy as np

from visitron_tpu.config import RunConfig
from visitron_tpu.train.workspace import Workspace


def run_viewpoint(cfg: RunConfig, do_val: bool = True):
    from visitron_tpu.train.finetune import ViewpointTrainer

    ws = _workspace_for_nav(cfg)
    trainer = ViewpointTrainer(cfg, ws)
    if cfg.test_only:
        # Roll out the test split from the latest checkpoint and write the
        # EvalAI submission (train.py:575-579).
        trainer.test_submission()
        return None
    state = trainer.train(resume=cfg.resume, profile_steps=cfg.profile_steps)
    if do_val and not getattr(trainer, "preempted", False):
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


def run_turn_based(cfg: RunConfig, do_val: bool = True):
    from visitron_tpu.train.turn_based import TurnBasedTrainer

    ws = _workspace_for_nav(cfg)
    trainer = TurnBasedTrainer(cfg, ws)
    state = trainer.train(resume=cfg.resume)
    if do_val and not getattr(trainer, "preempted", False):
        steps = None if cfg.eval_iters == [-1] else cfg.eval_iters
        trainer.val(steps=steps)
    return state


def run_classifier(cfg: RunConfig, do_val: bool = True):
    from visitron_tpu.train.classifier import ClassifierTrainer

    ws = _workspace_for_nav(cfg)
    trainer = ClassifierTrainer(cfg, ws)
    state = trainer.train(resume=cfg.resume)
    if do_val and not getattr(trainer, "preempted", False):
        steps = None if cfg.eval_iters == [-1] else cfg.eval_iters
        trainer.val(steps=steps)
    return state


def run_pretrain(cfg: RunConfig):
    import jax

    from visitron_tpu.data import RegionFeatureStore
    from visitron_tpu.data.candidates import build_candidate_tables
    from visitron_tpu.data.pretrain_dataset import PretrainDataset
    from visitron_tpu.parallel import make_mesh
    from visitron_tpu.pipelines.pretrain_datagen import generate_pretrain_examples
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.logging import (MetricsLogger, check_finite,
                                              setup_logger)
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

    def make_dataset(splits, only=None):
        """Build a PretrainDataset over ``splits``; ``only`` restricts to a
        single source dataset (lowercase name) for the reference's per-dataset
        validation sweeps (pretrain.py:301-420 builds separate ndh/r2r/r4r/rxr
        val_seen+val_unseen datasets and logs each group)."""
        records = []
        for ds, flag in (("NDH", cfg.add_ndh_data), ("R2R", cfg.add_r2r_data),
                         ("R4R", cfg.add_r4r_data), ("RxR", cfg.add_rxr_data)):
            if not flag or (only is not None and ds.lower() != only):
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
        import os

        # Tokenize-once cache across epochs and runs (utils_data.py:241-284);
        # skipped in --debug where the synthetic root changes per run.
        cache = None if cfg.debug else os.path.join(
            cfg.output_dir,
            f"pretrain_cache_{only or 'all'}_{'_'.join(splits)}.pkl")
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
            debug=cfg.debug, seed=cfg.seed, cache_path=cache)

    dataset = make_dataset(["train"])
    pipeline = cfg.mesh_pp > 1
    if pipeline:
        # GPipe pipeline parallelism (parallel/pipeline.py): encoder stages
        # sharded over pp, microbatched activations over ICI.  Single-host
        # (per-host pipelines; the dp axis still shards the batch).
        assert jax.process_count() == 1, (
            "--mesh_pp is single-host; combine with multi-host dp instead")
        from visitron_tpu.parallel import PipelinePretrainTrainer, make_pp_mesh

        dp = cfg.mesh_dp or jax.device_count() // cfg.mesh_pp
        mesh = make_pp_mesh(dp=dp, pp=cfg.mesh_pp)
    elif cfg.mesh_sp > 1:
        # Ulysses-style sequence parallelism (parallel/mesh.py:make_sp_mesh):
        # activations token-sharded over sp, parameters replicated; the
        # standard PretrainTrainer runs unchanged (config_for_mesh attaches
        # the sp constraints inside the model).
        from visitron_tpu.parallel import make_sp_mesh

        dp = cfg.mesh_dp or jax.device_count() // cfg.mesh_sp
        mesh = make_sp_mesh(dp=dp, sp=cfg.mesh_sp)
    elif cfg.mesh_cp > 1:
        # Ring-attention context parallelism (parallel/mesh.py:make_cp_mesh):
        # tokens stay cp-sharded through attention itself (K/V ppermute ring,
        # ops/attention.py:ring_attention); the standard PretrainTrainer runs
        # unchanged (config_for_mesh attaches cp_mesh inside the model).
        from visitron_tpu.parallel import make_cp_mesh

        dp = cfg.mesh_dp or jax.device_count() // cfg.mesh_cp
        mesh = make_cp_mesh(dp=dp, cp=cfg.mesh_cp)
    else:
        mesh = make_mesh(dp=cfg.mesh_dp or None, tp=cfg.mesh_tp)
    bcfg = ws.bert_config.replace(detector_classes=len(detector_classes))
    steps_per_epoch = max(len(dataset) // cfg.train_batch_size(mesh.devices.size), 1)
    common = dict(
        learning_rate=cfg.learning_rate, warmup_steps=cfg.warmup_steps,
        total_steps=cfg.num_epochs * steps_per_epoch, schedule=cfg.scheduler,
        weight_decay=cfg.weight_decay, adam_epsilon=cfg.adam_epsilon,
        max_grad_norm=cfg.max_grad_norm,
        bf16_adam_moments=cfg.bf16_adam_moments, seed=cfg.seed)
    batch_size = cfg.train_batch_size(mesh.devices.size)
    if not pipeline:
        common["zero1"] = cfg.zero1
        common["fsdp"] = cfg.fsdp
    if pipeline:
        per_shard = batch_size // mesh.shape["dp"]
        microbatches = cfg.pipeline_microbatches or max(
            m for m in range(1, min(4 * cfg.mesh_pp, per_shard) + 1)
            if per_shard % m == 0)
        trainer = PipelinePretrainTrainer(
            bcfg, mesh=mesh, num_microbatches=microbatches, **common)
    else:
        trainer = PretrainTrainer(bcfg, mesh=mesh, **common)
    state = trainer.init_state(dataset.batch(range(min(batch_size, len(dataset)))))
    ckpt = CheckpointManager(cfg.output_dir, async_save=cfg.async_checkpoints)
    metrics = MetricsLogger(cfg.output_dir, "train")
    step = trainer.step_fn()

    def save_params():
        # Pipeline runs checkpoint params in the STANDARD layout so finetune /
        # classifier / eval consumers load them unchanged; opt_state keeps the
        # trainer's own layout (resume therefore needs the same --mesh_pp).
        return trainer.checkpoint_params(state) if pipeline else state["params"]

    it = 0
    start_epoch = 0
    skip = 0
    if cfg.resume and ckpt.latest() is not None:
        # Checkpoints land per epoch (and on preemption, mid-epoch); resume
        # restores the exact params + optimizer state (schedule position
        # lives in opt_state), re-aligns the epoch-keyed shuffle, and skips
        # the completed slice of an in-progress epoch.
        it = ckpt.latest()
        if pipeline:
            restored = ckpt.restore(
                it, {"params": trainer.checkpoint_params(state),
                     "opt_state": state["opt_state"]})
            from visitron_tpu.parallel import reshard_state

            opt_shardings = jax.tree.map(lambda x: x.sharding,
                                         state["opt_state"])
            state = trainer.state_from_params(restored["params"])
            state["opt_state"] = reshard_state(restored["opt_state"],
                                               opt_shardings)
        else:
            from visitron_tpu.parallel import reshard_state

            restored = ckpt.restore(
                it, {"params": state["params"], "opt_state": state["opt_state"]})
            # Restore to the template's shardings (replicated normally;
            # dp-sharded moments under --zero1); reshard_state is the
            # multi-host-safe placement path.
            shardings = jax.tree.map(
                lambda x: x.sharding,
                {"params": state["params"], "opt_state": state["opt_state"]})
            state = {**state, **reshard_state(restored, shardings)}
        start_epoch = min(it // steps_per_epoch, cfg.num_epochs)
        skip = it - start_epoch * steps_per_epoch
        logger.info("resumed from checkpoint-%d (epoch %d, skipping %d "
                    "completed batches)", it, start_epoch, skip)
    dataset.set_epoch(start_epoch)
    # Multi-host: each host feeds its strided shard of the global batch
    # (DistributedSampler parity; shard_batch assembles the global array).
    host_id, num_hosts = jax.process_index(), jax.process_count()
    local_bs = batch_size // num_hosts
    from visitron_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        for epoch in range(start_epoch, cfg.num_epochs):
            saved_it = None
            for batch in dataset.epoch_batches(local_bs, host_id=host_id,
                                               num_hosts=num_hosts):
                if skip:
                    skip -= 1
                    continue
                state, bundle = step(state, batch)
                it += 1
                if it % cfg.logging_steps == 0:
                    vals = {k: float(v) for k, v in bundle.items()}
                    check_finite(vals["loss"], it, logger)
                    logger.info("epoch %d iter %d %s", epoch, it, vals)
                    metrics.log(vals, step=it)
                if guard.should_stop(it):
                    ckpt.save(it, save_params(), state["opt_state"], wait=True)
                    saved_it = it
                    logger.info("termination signal: saved checkpoint-%d, "
                                "stopping (restart with --resume)", it)
                    break
            if guard.stop:
                break
            if saved_it != it:
                ckpt.save(it, save_params(), state["opt_state"])
            # Per-epoch, PER-DATASET validation: one val_seen + val_unseen
            # sweep per enabled source dataset, logged under
            # ``{ds}_val_seen/...`` metric groups (pretrain.py:301-579 builds
            # and scores ndh/r2r/r4r datasets separately so the ablation
            # table's per-dataset diagnostics reproduce; RxR ships train-only
            # annotations and has no val sweep).
            for ds_name, flag in (("ndh", cfg.add_ndh_data),
                                  ("r2r", cfg.add_r2r_data),
                                  ("r4r", cfg.add_r4r_data)):
                if not flag:
                    continue
                for split in ("val_seen", "val_unseen"):
                    val_ds = make_dataset([split], only=ds_name)
                    if val_ds is None or len(val_ds) < batch_size:
                        continue
                    vals = trainer.evaluate(state["params"], val_ds, local_bs)
                    logger.info("epoch %d %s_%s %s", epoch, ds_name, split, vals)
                    metrics.log(vals, step=it, prefix=f"{ds_name}_{split}/")
    ckpt.wait_until_finished()
    metrics.close()
    return state


def _speaker_for(cfg: RunConfig, ws):
    from visitron_tpu.agents.speaker import SpeakerAgent

    tok = ws.tokenizer
    return SpeakerAgent(
        runtime=ws.runtime, feature_dim=cfg.lstm_img_feature_dim,
        vocab_size=len(tok),
        bos_id=tok.vocab[tok.cls_token], eos_id=tok.vocab[tok.sep_token],
        pad_id=tok.pad_token_id, episode_len=cfg.episode_len,
        max_words=cfg.max_words, hidden_size=cfg.rnn_dim,
        dropout=cfg.dropout, learning_rate=cfg.learning_rate, seed=cfg.seed,
        feat_dropout=cfg.speaker_feat_dropout,
        movement_frame=cfg.speaker_movement_frame)


def run_speaker(cfg: RunConfig):
    """Train a speaker (trajectory -> instruction) on the nav training data.

    Exceeds the reference: its SpeakerEncoder/Decoder ship unwired
    (agent_models.py:512-629).  Checkpoints land in --output_dir for `augment`.
    """
    from visitron_tpu.agents.batcher import NavEpisodeBatcher
    from visitron_tpu.agents.speaker import SpeakerAgent
    from visitron_tpu.train.checkpoint import CheckpointManager
    from visitron_tpu.train.finetune import ViewpointTrainer
    from visitron_tpu.train.logging import check_finite, setup_logger

    ws = _workspace_for_nav(cfg)
    logger = setup_logger(output_dir=cfg.output_dir)
    helper = ViewpointTrainer(cfg, ws)
    instances = helper._instances(["train"])
    sp = _speaker_for(cfg, ws)
    batcher = NavEpisodeBatcher(
        instances, ws.runtime, batch_size=cfg.train_batch_size(1),
        path_type=cfg.path_type, seed=cfg.seed,
        length_sort_window=cfg.length_sort_window)
    text_by_idx = {i.inst_idx: SpeakerAgent.instance_text(i) for i in instances}

    # Held-out word-CE per checkpoint (val_seen when the dataset ships it).
    val_batches = []
    try:
        val_inst = helper._instances(["val_seen"])
        vb = NavEpisodeBatcher(val_inst, ws.runtime,
                               batch_size=cfg.train_batch_size(1),
                               path_type=cfg.path_type, seed=cfg.seed)
        val_text = {i.inst_idx: SpeakerAgent.instance_text(i) for i in val_inst}
        val_batches = [
            sp.attach_words(b, ws.tokenizer, val_text)
            for _, b in zip(range(4),
                            vb.train_batches(4, episode_len=cfg.episode_len))
        ]
    except FileNotFoundError:
        logger.info("no val_seen split; skipping speaker validation")

    state = sp.init_state()
    step = sp.train_step_fn()
    eval_loss = sp.eval_loss_fn()
    ckpt = CheckpointManager(cfg.output_dir, async_save=cfg.async_checkpoints)
    start_it = 0
    if cfg.resume and ckpt.latest() is not None:
        start_it = ckpt.latest()
        state = {**state, **ckpt.restore(
            start_it, {"params": state["params"], "opt_state": state["opt_state"]})}
        batcher.skip_batches(start_it)
        logger.info("speaker resumed from checkpoint-%d", start_it)
    from visitron_tpu.train.preemption import PreemptionGuard

    with PreemptionGuard() as guard:
        for i, batch in enumerate(
                batcher.train_batches(cfg.num_iterations - start_it,
                                      episode_len=cfg.episode_len)):
            state, loss = step(state, sp.attach_words(batch, ws.tokenizer, text_by_idx))
            it = start_it + i + 1
            if it % cfg.logging_steps == 0:
                logger.info("speaker iter %d loss %.4f", it,
                            check_finite(float(loss), it, logger))
            saved = it % cfg.saving_steps == 0 or it == cfg.num_iterations
            if saved:
                ckpt.save(it, state["params"], state["opt_state"])
                if val_batches:
                    v = float(np.mean([float(eval_loss(state["params"], b))
                                       for b in val_batches]))
                    logger.info("speaker ckpt %d val word-CE %.4f", it, v)
            if guard.should_stop(it):
                if not saved:
                    ckpt.save(it, state["params"], state["opt_state"], wait=True)
                logger.info("termination signal: saved checkpoint-%d, stopping "
                            "(restart with --resume)", it)
                break
    ckpt.wait_until_finished()
    return state


def run_augment(cfg: RunConfig):
    """Caption sampled shortest-path walks with a trained speaker and write
    R2R-format augmentation JSON (consumed by viewpoint --aug_data)."""
    import numpy as np

    from visitron_tpu.agents.speaker import write_aug_records
    from visitron_tpu.train.checkpoint import CheckpointManager

    ws = _workspace_for_nav(cfg)
    sp = _speaker_for(cfg, ws)
    state = sp.init_state()
    ckpt = CheckpointManager(cfg.speaker_checkpoint or cfg.output_dir)
    step = ckpt.latest()
    if step is None:
        raise SystemExit(
            f"no speaker checkpoint under {ckpt.output_dir!r}; run "
            "`run.py speaker` first or pass --speaker_checkpoint")
    params = ckpt.restore(step, {"params": state["params"]})["params"]
    target_vocab = None
    if cfg.aug_targets:
        # Targets sampled from the NDH train distribution: aug records then
        # carry the same [TAR] span as the real instances (format-matched).
        from visitron_tpu.data.datasets import load_split

        if ws.synthetic is not None:
            import tempfile

            root = tempfile.mkdtemp(prefix="visitron_synth_")
            ws.synthetic.write_task_data(root)
        else:
            root = cfg.data_root
        target_vocab = sorted({str(item["target"])
                               for item in load_split(root, ["train"], "NDH")})
    records = sp.augment(params, ws.tokenizer,
                         np.random.default_rng(cfg.seed), cfg.num_aug,
                         temperature=cfg.aug_temperature,
                         keep_fraction=cfg.aug_keep_fraction or None,
                         target_vocab=target_vocab)
    out = os.path.join(cfg.output_dir, "aug_data.json")
    os.makedirs(cfg.output_dir, exist_ok=True)
    write_aug_records(records, out)
    print(f"wrote {len(records)} augmentation records to {out}")
    return out


def _extract_graphs(cfg: RunConfig) -> dict:
    """Nav graphs for the offline pipelines (which predate feature stores, so
    no Workspace): every scan with a connectivity file."""
    import os

    from visitron_tpu.graph import load_nav_graphs

    scans = sorted(
        f.removesuffix("_connectivity.json")
        for f in os.listdir(cfg.connectivity_dir)
        if f.endswith("_connectivity.json"))
    return load_nav_graphs(cfg.connectivity_dir, scans)


def run_extract_scene(cfg: RunConfig):
    """Scene (ResNet) feature extraction from skybox JPEGs -> TSV
    (scripts/precompute_resnet_img_features.py parity; run.py extract_scene)."""
    from visitron_tpu.pipelines.rendering import SkyboxRenderer
    from visitron_tpu.pipelines.scene_features import SceneFeatureExtractor
    from visitron_tpu.train.logging import setup_logger

    logger = setup_logger(output_dir=cfg.output_dir)
    # Reference geometry: 640x480 VFOV 60 (precompute_resnet_img_features.py);
    # --debug shrinks the render for fast smoke runs.
    w, h = (64, 48) if cfg.debug and not cfg.resnet_checkpoint else (640, 480)
    renderer = SkyboxRenderer(cfg.matterport_dir, image_w=w, image_h=h, vfov=60)
    import jax.numpy as jnp

    # "default" = bf16 for scene features (config.py:feature_extract_dtype).
    dt = (jnp.float32 if cfg.feature_extract_dtype == "float32"
          else jnp.bfloat16)
    if cfg.resnet_checkpoint:
        ex = SceneFeatureExtractor.from_torch_checkpoint(
            cfg.resnet_checkpoint, image_w=w, image_h=h, vfov=60, dtype=dt)
    else:
        logger.warning("no --resnet_checkpoint; using a randomly initialized "
                       "backbone (debug only)")
        ex = SceneFeatureExtractor.random_init(
            depth=50, image_hw=(h, w), image_w=w, image_h=h, vfov=60, dtype=dt)
    out = cfg.img_feature_file or f"{cfg.output_dir}/scene_features.tsv"
    # Device-fused rendering: ship the six uint8 skybox faces and resample
    # inside the extractor jit (CubemapLUT) — the host only decodes JPEGs.
    # Host-side resampling costs ~110 ms/view/core and would render-bound
    # the sweep against the ~900 frames/s backbone (VALIDATION.md).
    ex.extract_all(_extract_graphs(cfg), renderer.load_faces, out_tsv=out,
                   logger=logger, provider="faces")
    logger.info("wrote scene features to %s", out)
    return out


def run_extract_regions(cfg: RunConfig):
    """Bottom-up region features from skybox JPEGs -> pickle store
    (scripts/precompute_bottom-up_features.py + add_orientation parity)."""
    import numpy as np_

    from visitron_tpu.models.detector import BottomUpDetector
    from visitron_tpu.pipelines.region_features import (RegionFeatureExtractor,
                                                        StubDetector)
    from visitron_tpu.pipelines.rendering import SkyboxRenderer
    from visitron_tpu.train.logging import setup_logger

    logger = setup_logger(output_dir=cfg.output_dir)
    # Reference geometry: 600x600 VFOV 80 (precompute_bottom-up_features.py);
    # --debug shrinks the render for fast smoke runs.
    side = 60 if cfg.debug and not cfg.detector_weights else 600
    renderer = SkyboxRenderer(cfg.matterport_dir, image_w=side, image_h=side,
                              vfov=80)
    if cfg.detector_weights:
        import jax.numpy as jnp

        state = dict(np_.load(cfg.detector_weights, allow_pickle=True))
        # "default" = fp32 for the detector: bf16 backbone drift can flip
        # which boxes survive NMS (config.py:feature_extract_dtype).
        detector = BottomUpDetector.from_caffe_dump(
            state, dtype=(jnp.bfloat16
                          if cfg.feature_extract_dtype == "bfloat16"
                          else jnp.float32))
        classes = open(cfg.objects_vocab).read().splitlines()
        attributes = open(cfg.attributes_vocab).read().splitlines()
    elif cfg.debug:
        logger.warning("no --detector_weights; StubDetector (--debug)")
        detector = StubDetector()
        classes = ["__background__"] + [f"c{i}" for i in range(detector.num_classes - 1)]
        attributes = ["__no_attribute__"] + [f"a{i}" for i in range(detector.num_attributes - 1)]
    else:
        raise SystemExit("extract_regions needs --detector_weights (VG Faster "
                         "R-CNN dump) + --objects_vocab/--attributes_vocab, "
                         "or --debug for the stub")
    ex = RegionFeatureExtractor(detector, classes, attributes,
                                image_w=side, image_h=side, vfov=80)
    # Device-fused rendering (see extract_scene): ship uint8 faces, resample
    # on device; views feed the detector without leaving HBM.
    store = ex.extract_all(_extract_graphs(cfg), renderer.load_faces,
                           provider="faces")
    prefix = cfg.region_feature_prefix or f"{cfg.output_dir}/region_features"
    store.to_pickle(prefix)
    logger.info("wrote region store (%d keys) to %s*", len(store), prefix)
    return prefix


def _maybe_init_multihost() -> None:
    """Multi-host SPMD: when launched under a multi-host runtime (coordinator
    address in the environment), join the global mesh.  This replaces
    torch.distributed.launch + NCCL init (reference run_scripts/*:4,
    train.py:536-548): afterwards jax.devices() spans all hosts and every
    jitted step is a single global SPMD program.

    On TPU pods the runtime provides discovery and ``initialize()`` needs no
    arguments; elsewhere (CPU/GPU clusters, tests) set JAX_COORDINATOR_ADDRESS
    plus JAX_NUM_PROCESSES / JAX_PROCESS_ID."""
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    import jax

    kw = {"coordinator_address": addr}
    if os.environ.get("JAX_NUM_PROCESSES"):
        kw["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kw["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(**kw)


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return
    _maybe_init_multihost()
    task, rest = argv[0], argv[1:]
    import dataclasses

    if rest and rest[0] == "--config":
        # Experiment-config file (run_configs/*.json) + CLI overrides: only
        # flags literally present on the command line override the file, so an
        # explicit flag set to its default value still wins.
        explicit = RunConfig.cli_overrides(rest[2:])
        cfg = dataclasses.replace(RunConfig.from_json(rest[1]), **explicit)
    else:
        explicit = RunConfig.cli_overrides(rest)
        cfg = RunConfig.from_args(rest)
    import jax

    # Counter-based RBG dropout/sampling keys: ~24% faster nav training on
    # TPU than threefry at BERT-base dropout volumes (VALIDATION.md).
    jax.config.update("jax_default_prng_impl", cfg.rng_impl)
    # ZeRO flags are consumed per-task.  Explicit CLI flags on a task that
    # does not consume them are a hard error; values inherited from a shared
    # config file only warn (a reused pretrain config with "zero1": true must
    # not abort the nav/turn_based runs that always ignored it).
    if cfg.fsdp and task != "pretrain":
        if "fsdp" in explicit:
            raise SystemExit(
                "--fsdp applies to the pretrain task; use --zero1 for the "
                "fine-tune loops")
        print(f"warning: config-file fsdp=true is ignored by task {task!r}",
              file=sys.stderr)
        cfg = dataclasses.replace(cfg, fsdp=False)
    if cfg.zero1 and task not in ("pretrain", "viewpoint"):
        if "zero1" in explicit:
            raise SystemExit(
                "--zero1 applies to the pretrain and viewpoint tasks")
        print(f"warning: config-file zero1=true is ignored by task {task!r}",
              file=sys.stderr)
        cfg = dataclasses.replace(cfg, zero1=False)
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
    elif task == "speaker":
        run_speaker(cfg)
    elif task == "augment":
        run_augment(cfg)
    elif task == "extract_scene":
        run_extract_scene(cfg)
    elif task == "extract_regions":
        run_extract_regions(cfg)
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
