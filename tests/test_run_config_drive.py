"""Drive EVERY run_configs/**.json through its trainer end-to-end.

The load-only test (test_run_configs.py) proves the JSONs parse; these drives
prove each config's flag combination still reaches its trainer (replacing the
reference's 18 ablation + train scripts under run_scripts/).  Each config runs
through the real user surface — ``run.main([task, "--config", path, ...])`` —
on the synthetic debug world with only SCALE knobs overridden (iterations,
epochs, batch, sequence length) plus paths to absent real assets.  Ablation
chains consume the PRIOR stage's real checkpoint: stage-2 pretraining output
initializes the nav fine-tune (the reference's checkpoint-30000 handoff),
the nav run initializes classifier_val, and the speaker checkpoint feeds
augment.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), os.pardir))
RC = os.path.join(REPO, "run_configs")

# (relpath, task, scale overrides, chain key produced / consumed).
# Order matters: chained stages run after their producers.
SMALL = ["--debug", "--logging_steps", "1", "--max_seq_length", "64",
         "--per_gpu_eval_batch_size", "4"]
NAV = SMALL + ["--num_iterations", "2", "--saving_steps", "2",
               "--per_gpu_train_batch_size", "1"]
PRETRAIN = SMALL + ["--num_epochs", "1", "--per_gpu_train_batch_size", "1",
                    "--max_img_seq_length", "16"]

PLAN = [
    # -- standalone trainer configs -------------------------------------
    ("viewpoint_train/ndh_oscar_setting.json", "viewpoint", NAV, None, None),
    ("viewpoint_train/ndh_tar_back.json", "viewpoint", NAV, None, None),
    ("viewpoint_train/ndh_rxr.json", "viewpoint", NAV, None, None),
    ("viewpoint_train/pretrain_ndh_r2r.json", "viewpoint", NAV,
     "nav_ckpt_dir", None),
    ("turn_based_train/ndh.json", "turn_based", NAV, None, None),
    ("turn_based_train/ndh_blind.json", "turn_based", NAV, None, None),
    ("turn_based_train/ndh_oscar_setting.json", "turn_based", NAV, None, None),
    ("turn_based_train/ndh_rxr.json", "turn_based", NAV, None, None),
    ("turn_based_train/ndh_tar_back.json", "turn_based", NAV, None, None),
    ("ablations/1_no_pretraining.json", "viewpoint", NAV, None, None),
    ("ablations/2_only_oscar_pretraining.json", "viewpoint", NAV, None, None),
    ("ablations/2_only_oscar_pretraining-finetune_ndh.json", "viewpoint",
     NAV, None, None),
    # -- pretraining stages (each leaves a checkpoint for its finetune) --
    ("ablations/3_only_oscar_mlm.json", "pretrain", PRETRAIN,
     "abl3_ckpt", None),
    ("ablations/4_oscar_with_stage2_mlm_pretraining.json", "pretrain",
     PRETRAIN, "abl4_ckpt", None),
    ("ablations/5_oscar_with_stage2_mlm_mtp_pretraining.json", "pretrain",
     PRETRAIN, "abl5_ckpt", None),
    ("ablations/6_oscar_with_stage2_all_pretraining.json", "pretrain",
     PRETRAIN, "abl6_ckpt", None),
    ("pretrain/pretrain_ndh_r2r.json", "pretrain", PRETRAIN, None, None),
    # -- chained fine-tunes: consume the stage's real checkpoint ---------
    ("ablations/3_only_oscar_mlm-finetune_ndh.json", "viewpoint", NAV,
     None, ("model_name_or_path", "abl3_ckpt")),
    ("ablations/4_oscar_with_stage2_mlm-finetune_ndh.json", "viewpoint", NAV,
     None, ("model_name_or_path", "abl4_ckpt")),
    ("ablations/5_oscar_with_stage2_mlm_mtp-finetune_ndh.json", "viewpoint",
     NAV, None, ("model_name_or_path", "abl5_ckpt")),
    ("ablations/6_oscar_with_stage2_all-finetune_ndh.json", "viewpoint", NAV,
     None, ("model_name_or_path", "abl6_ckpt")),
    # -- classifier: train, then val from the nav checkpoint -------------
    ("classifier/classifier.json", "classifier", NAV, "cls_out", None),
    ("classifier/classifier_val.json", "classifier",
     NAV + ["--num_iterations", "0"], None, ("model_name_or_path",
                                             "nav_ckpt_dir")),
    # -- speaker -> augment chain ----------------------------------------
    ("pipeline/speaker.json", "speaker",
     NAV + ["--per_gpu_train_batch_size", "2", "--max_words", "12"],
     "speaker_out", None),
    ("pipeline/augment.json", "augment", SMALL + ["--num_aug", "3"],
     None, ("speaker_checkpoint", "speaker_out")),
    # -- offline extraction (skybox fixture world) -----------------------
    ("pipeline/extract_scene.json", "extract_scene", SMALL, None, None),
    ("pipeline/extract_regions.json", "extract_regions", SMALL, None, None),
]


@pytest.fixture(scope="module")
def art(tmp_path_factory):
    """Cross-stage artifact registry + the skybox fixture world."""
    base = tmp_path_factory.mktemp("rcdrive")
    store = {"base": base}
    # Skybox world for the extract_* configs (mirrors test_rendering.py).
    from PIL import Image

    conn = base / "conn"
    conn.mkdir()
    entries = [
        {"image_id": "vpA", "pose": [1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
         "included": True, "unobstructed": [False, True], "height": 1.5},
        {"image_id": "vpB", "pose": [1, 0, 0, 2.0, 0, 1, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1],
         "included": True, "unobstructed": [True, False], "height": 1.5},
    ]
    (conn / "sc1_connectivity.json").write_text(json.dumps(entries))
    rng = np.random.default_rng(0)
    sky = base / "mp" / "sc1" / "matterport_skybox_images"
    sky.mkdir(parents=True)
    for vp in ("vpA", "vpB"):
        for i in range(6):
            Image.fromarray(rng.integers(0, 255, (16, 16, 3), dtype=np.uint8)).save(
                str(sky / f"{vp}_skybox{i}_sami.jpg"))
    store["conn"], store["mp"] = str(conn), str(base / "mp")
    return store


@pytest.fixture()
def tiny_bert(monkeypatch):
    from visitron_tpu.models import BertConfig
    import visitron_tpu.train.workspace as wsmod

    def tiny(cfg_, tokenizer):
        return BertConfig(vocab_size=len(tokenizer), hidden_size=32,
                          num_hidden_layers=2, num_attention_heads=4,
                          intermediate_size=64, max_position_embeddings=96,
                          type_vocab_size=4, img_feature_dim=cfg_.img_feature_dim,
                          detector_classes=cfg_.detector_classes)

    monkeypatch.setattr(wsmod.Workspace, "_bert_config", staticmethod(tiny))


@pytest.mark.parametrize("relpath,task,scale,produces,consumes",
                         PLAN, ids=[p[0] for p in PLAN])
def test_run_config_drives_trainer(relpath, task, scale, produces, consumes,
                                   art, tiny_bert, caplog):
    import logging

    from visitron_tpu import run as runner

    caplog.set_level(logging.INFO, logger="visitron_tpu")

    cfg_path = os.path.join(RC, relpath)
    out = art["base"] / relpath.replace("/", "_").replace(".json", "")
    args = [task, "--config", cfg_path, *scale, "--output_dir", str(out)]
    if consumes is not None:
        flag, key = consumes
        if key not in art:
            pytest.skip(f"producer stage for {key} did not run")
        args += [f"--{flag}", str(art[key])]
    if task in ("extract_scene", "extract_regions"):
        args += ["--matterport_dir", art["mp"], "--connectivity_dir",
                 art["conn"], "--img_feat_dir", str(out),
                 "--img_feature_file", str(out / "scene.tsv"),
                 "--region_feature_prefix", str(out / "regions"),
                 "--resnet_checkpoint", "", "--detector_weights", ""]
        out.mkdir(parents=True, exist_ok=True)
    if relpath == "classifier/classifier_val.json":
        # classifier_val evaluates the TRAINED classifier's checkpoints
        # (its output_dir is the classifier run's, run_scripts parity).
        args[args.index("--output_dir") + 1] = str(art["cls_out"])

    runner.main(args)

    if task in ("viewpoint", "turn_based", "classifier", "pretrain"):
        target = (art["cls_out"] if relpath.endswith("classifier_val.json")
                  else out)
        assert os.path.exists(os.path.join(str(target), "train.csv")) or \
            os.path.exists(os.path.join(str(target), "val.csv")), relpath
    if task == "speaker":
        from visitron_tpu.train.checkpoint import CheckpointManager

        assert CheckpointManager(str(out)).latest() is not None, relpath
    if task == "augment":
        recs = json.load(open(out / "aug_data.json"))
        assert recs and all("instructions" in r for r in recs)
    if task == "extract_scene":
        assert os.path.exists(out / "scene.tsv")
    if task == "extract_regions":
        assert os.path.exists(str(out / "regions") + ".pickle")
    if consumes and consumes[0] == "model_name_or_path" and task == "viewpoint":
        # The chained fine-tune must actually consume the pretraining
        # checkpoint, not silently fall back to scratch init.  (caplog, not
        # train.log: setup_logger's file handler attaches once per process,
        # so in-suite log FILES all land in the first drive's output dir.)
        assert "loaded pretraining checkpoint" in caplog.text, relpath

    if produces:
        if task == "pretrain":
            from visitron_tpu.train.checkpoint import CheckpointManager

            mgr = CheckpointManager(str(out))
            assert mgr.latest() is not None, relpath
            art[produces] = mgr.path(mgr.latest())
        else:
            art[produces] = str(out)
