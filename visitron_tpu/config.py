"""Unified run configuration with a reference-compatible flag surface.

Replaces the per-task argparse singletons (tasks/viewpoint_select/params.py,
tasks/turn_based/params.py) and the 37 run shell scripts with one dataclass
parseable from CLI flags; flag names match the reference so existing run
commands translate directly.  Derived values (episode length from path_type,
train batch = per-device x n-devices) follow train.py:551-554,65.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field


@dataclass
class RunConfig:
    # paths / data
    data_root: str = "srv/task_data"
    connectivity_dir: str = "connectivity"
    img_feat_dir: str = "srv/img_features"
    img_feature_file: str = ""
    region_feature_prefix: str = ""
    model_name_or_path: str = ""       # pretrained Oscar weights (torch/HF dir)
    output_dir: str = "output"
    vocab_file: str = ""
    # offline feature pipeline inputs (run.py extract_scene / extract_regions)
    matterport_dir: str = ""           # Matterport root with skybox JPEGs
    resnet_checkpoint: str = ""        # torchvision ResNet-152 .pth
    detector_weights: str = ""         # VG Faster R-CNN weight dump (.npz)
    objects_vocab: str = ""            # 1601-line class vocab (VG)
    attributes_vocab: str = ""         # 401-line attribute vocab (VG)

    # model dims (params.py:132-179)
    max_seq_length: int = 512
    max_img_seq_length: int = 256
    angle_feat_size: int = 4
    views: int = 36
    action_space: int = 36
    img_feature_dim: int = 2054
    lstm_img_feature_dim: int = 2048
    encoder_hidden_size: int = 512
    rnn_dim: int = 512
    aemb: int = 64
    wemb: int = 256
    bidir: bool = False
    detector_classes: int = 1601

    # task flags
    path_type: str = "trusted_path"    # planner_path | player_path | trusted_path
    feedback_method: str = "sample"
    add_ndh_data: bool = True
    add_r2r_data: bool = False
    add_r4r_data: bool = False
    add_rxr_data: bool = False
    oscar_setting: bool = False
    tar_back: bool = False
    masked_token_prediction: bool = False
    no_action_grounding: bool = False
    no_pretrained_model: bool = False
    only_finetune_classifier: bool = False
    question_asking_class_weight: float = 5.0
    blind: bool = False
    submit: bool = False
    test_only: bool = False            # skip training; write test submission

    # optimization (params.py:251-307)
    per_gpu_train_batch_size: int = 8
    per_gpu_eval_batch_size: int = 8
    learning_rate: float = 5e-5
    weight_decay: float = 0.0
    adam_epsilon: float = 1e-8
    scheduler: str = "linear"
    max_grad_norm: float = 1.0
    agent_max_grad_norm: float = 40.0
    num_iterations: int = 20000
    num_epochs: int = 10
    warmup_steps: int = 0
    drop_out: float = 0.1              # BERT dropout
    dropout: float = 0.5               # agent dropout
    mlm_probability: float = 0.15
    ignoreid: int = -100

    # extended decoding (utils.py:381-427): logit scale for the
    # temperature/penalty feedback strategies
    temperature: float = 1.0

    # bookkeeping
    logging_steps: int = 50
    saving_steps: int = 1000
    eval_iters: list[int] = field(default_factory=lambda: [-1])
    seed: int = 88
    debug: bool = False
    resume: bool = False               # restore latest checkpoint and continue
    profile_steps: int = 0             # capture a jax profiler trace of N steps
    # Async checkpoint saves: orbax commits from a background thread so the
    # train loop overlaps checkpoint I/O with the next steps; meta.json (the
    # completeness marker --resume enumerates by) is committed at the next
    # save / end of training.  Preemption + final saves are always synchronous.
    async_checkpoints: bool = False

    # hardware
    mesh_dp: int = 0                   # 0 => all devices
    mesh_tp: int = 1
    mesh_pp: int = 1                   # >1: pipeline-parallel pretraining
                                       # (GPipe stages over a (dp, pp) mesh,
                                       # parallel/pipeline.py; pretrain task
                                       # only, single-host, excludes mesh_tp)
    pipeline_microbatches: int = 0     # 0 => auto (<= 4*pp, divides the
                                       # per-dp-shard batch)
    mesh_sp: int = 1                   # >1: Ulysses-style sequence-parallel
                                       # pretraining over a (dp, sp) mesh —
                                       # activations token-sharded, attention
                                       # head-sharded via two all-to-alls per
                                       # layer (models/bert.py sp_constrain);
                                       # pretrain task only, excludes
                                       # mesh_tp/mesh_pp
    mesh_cp: int = 1                   # >1: ring-attention context-parallel
                                       # pretraining over a (dp, cp) mesh —
                                       # activations AND attention token-
                                       # sharded, K/V rotating around the cp
                                       # ring via ppermute (ops/attention.py
                                       # ring_attention); no head-count
                                       # limit; pretrain task only, excludes
                                       # mesh_tp/mesh_pp/mesh_sp
    use_bfloat16: bool = True
    use_flash_attention: bool = False  # Pallas blockwise attention (TPU)
    use_fused_attention: bool = True   # Pallas small-S single-pass kernel (TPU)
    use_fused_layernorm: bool = True   # Pallas one-pass add+LayerNorm (TPU;
                                       # auto-falls back off-TPU/mesh/odd
                                       # shapes — ops/layernorm.py)
    use_fused_mlm_ce: bool = True      # Pallas chunked-logsumexp MLM CE:
                                       # no (B, S, vocab) fp32 tensor
                                       # (ops/crossentropy.py; same gates)
    remat: bool = False                # rematerialize BERT layers in bwd
                                       # (activation memory ~ O(layers) less;
                                       # enables batch scaling beyond HBM)
    # PRNG implementation for dropout/sampling: XLA's counter-based RBG is
    # ~24% faster end-to-end on TPU than threefry at BERT-base dropout
    # volumes (VALIDATION.md); set threefry2x32 for cross-impl key
    # reproducibility.
    rng_impl: str = "rbg"
    # Store Adam first/second moments in bfloat16 (arithmetic stays fp32).
    # Halves optimizer-state HBM traffic; see train/optim.py:scale_by_adam_lowp.
    bf16_adam_moments: bool = False
    # ZeRO-1 (pretrain + viewpoint fine-tune): shard the optimizer state
    # over the dp mesh axis — each chip holds 1/dp of the Adam moments; the
    # SPMD partitioner derives the gradient slice and parameter-delta
    # all-gather (parallel/mesh.py:zero1_opt_rules).  Composes with
    # --mesh_sp; needs a multi-device mesh (no-op on one chip).
    zero1: bool = False
    # FSDP / ZeRO-3 (pretrain): additionally shard the PARAMETERS over dp
    # (parallel/mesh.py:fsdp_param_rules) — per-chip param+grad+moment
    # memory ~1/dp, per-layer all-gathers + gradient reduce-scatter derived
    # by the SPMD partitioner.  Implies the ZeRO-1 moment sharding and
    # composes with --mesh_tp; needs a multi-device mesh.
    fsdp: bool = False
    # Conv compute dtype for the offline feature extractors.  "default" =
    # per-pipeline: extract_scene runs bfloat16 (1.64x faster on v5e at ~2%
    # mean drift of the globally pooled features), extract_regions runs
    # float32 (bf16 backbone drift can flip which boxes survive NMS, so
    # published-VG-weight parity keeps fp32 unless asked).  Explicit
    # "bfloat16"/"float32" forces both pipelines.
    feature_extract_dtype: str = "default"
    # Length-grouped shuffle batching: window (in batches) within which
    # instances are ordered by dialog length so padded length per batch stays
    # near its own maximum (pack_padded work-skipping equivalent); 0/1 = off.
    length_sort_window: int = 8

    # Speaker (back-translation augmentation; exceeds the reference, whose
    # SpeakerEncoder/Decoder ship unwired — agent_models.py:512-629).
    aug_data: str = ""                # speaker-generated R2R-format JSON to
                                      # append to viewpoint training data
    speaker_checkpoint: str = ""      # speaker output_dir for `augment`
    num_aug: int = 1000               # walks to caption in `augment`
    max_words: int = 64               # speaker decode length
    aug_temperature: float = 0.0      # 0 = greedy captions; >0 samples
    # Stamp each aug record with a target word sampled from the NDH train
    # targets, so build_aug_instances emits the NDH sequence format ([TAR]
    # span) instead of the bare R2R format — aug and real instances then
    # share one input population (see tools/aug_ab.py).
    aug_targets: bool = False
    aug_keep_fraction: float = 0.0    # 0 = no gate; in (0, 1] over-generate
                                      # 1/frac and keep the best speaker-CE
    speaker_feat_dropout: float = 0.3  # EnvDrop featdrop on visual dims
                                       # (angle feats kept); the decisive
                                       # caption-faithfulness lever in the
                                       # aug A/B (tools/aug_ab.py)
    speaker_movement_frame: bool = False  # action angle feats as turn deltas
                                          # (vs the snapped current view)

    def __post_init__(self):
        valid = ("planner_path", "player_path", "trusted_path")
        if self.path_type not in valid:
            raise ValueError(f"--path_type must be one of {valid}, got {self.path_type!r}")
        # "rl" (A2C with critic baseline) is an extension beyond the
        # reference's sample|teacher surface; the rest mirror utils.py:381-427.
        if self.feedback_method not in ("teacher", "argmax", "sample", "topk",
                                        "nucleus", "temperature", "penalty", "rl"):
            raise ValueError(f"invalid --feedback_method {self.feedback_method!r}")
        if self.scheduler not in ("linear", "constant"):
            raise ValueError(f"--scheduler must be linear or constant, got {self.scheduler!r}")
        if self.rng_impl not in ("rbg", "threefry2x32", "unsafe_rbg"):
            raise ValueError(f"invalid --rng_impl {self.rng_impl!r}")
        if self.feature_extract_dtype not in ("default", "bfloat16", "float32"):
            raise ValueError(f"--feature_extract_dtype must be default, "
                             f"bfloat16 or float32, got "
                             f"{self.feature_extract_dtype!r}")
        if not (0.0 <= self.aug_keep_fraction <= 1.0):
            raise ValueError(
                f"--aug_keep_fraction must be in [0, 1] (0 disables the "
                f"gate), got {self.aug_keep_fraction}")
        if not (0.0 <= self.speaker_feat_dropout < 1.0):
            raise ValueError(
                f"--speaker_feat_dropout must be in [0, 1), got "
                f"{self.speaker_feat_dropout}")
        if self.mesh_pp < 1:
            raise ValueError(f"--mesh_pp must be >= 1, got {self.mesh_pp}")
        if self.mesh_pp > 1 and self.mesh_tp > 1:
            raise ValueError("--mesh_pp composes with dp only; drop --mesh_tp")
        if self.mesh_sp < 1:
            raise ValueError(f"--mesh_sp must be >= 1, got {self.mesh_sp}")
        if self.mesh_sp > 1 and (self.mesh_tp > 1 or self.mesh_pp > 1):
            raise ValueError(
                "--mesh_sp composes with dp only; drop --mesh_tp/--mesh_pp")
        if self.mesh_cp < 1:
            raise ValueError(f"--mesh_cp must be >= 1, got {self.mesh_cp}")
        if self.mesh_cp > 1 and (self.mesh_tp > 1 or self.mesh_pp > 1
                                 or self.mesh_sp > 1):
            raise ValueError("--mesh_cp composes with dp only; drop "
                             "--mesh_tp/--mesh_pp/--mesh_sp")
        if self.zero1 and self.mesh_pp > 1:
            raise ValueError(
                "--zero1 applies to the standard pretrain trainer; the "
                "pipeline trainer stage-shards its own optimizer state")
        if self.fsdp and self.mesh_pp > 1:
            raise ValueError(
                "--fsdp applies to the standard pretrain trainer; the "
                "pipeline trainer stage-shards its own parameters")

    @property
    def episode_len(self) -> int:
        # train.py:551-554: 10 with planner supervision, 40 otherwise.
        return 10 if self.path_type == "planner_path" else 40

    def train_batch_size(self, num_devices: int) -> int:
        return self.per_gpu_train_batch_size * num_devices

    # -- (de)serialization -------------------------------------------------
    def to_json(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(dataclasses.asdict(self), f, indent=2)

    @classmethod
    def from_json(cls, path: str) -> "RunConfig":
        with open(path) as f:
            return cls(**json.load(f))

    @classmethod
    def parser(cls) -> argparse.ArgumentParser:
        p = argparse.ArgumentParser(description="visitron-tpu run config")
        for f in dataclasses.fields(cls):
            flag = "--" + f.name
            default = f.default if f.default is not dataclasses.MISSING else None
            if f.type == "bool" or isinstance(default, bool):
                p.add_argument(flag, action="store_true", default=default)
                p.add_argument("--no_" + f.name, dest=f.name, action="store_false")
            elif f.name == "eval_iters":
                p.add_argument(flag, nargs="+", type=int, default=[-1])
            else:
                typ = type(default) if default is not None else str
                p.add_argument(flag, type=typ, default=default)
        return p

    @classmethod
    def from_args(cls, argv=None) -> "RunConfig":
        ns = cls.parser().parse_args(argv)
        return cls(**vars(ns))

    @classmethod
    def cli_overrides(cls, argv) -> dict:
        """Only the flags actually present on the command line (so an explicit
        flag equal to its default still overrides a config-file value)."""
        p = argparse.ArgumentParser(description="visitron-tpu config overrides")
        for f in dataclasses.fields(cls):
            flag = "--" + f.name
            default = f.default if f.default is not dataclasses.MISSING else None
            if f.type == "bool" or isinstance(default, bool):
                p.add_argument(flag, action="store_true", default=argparse.SUPPRESS)
                p.add_argument("--no_" + f.name, dest=f.name,
                               action="store_false", default=argparse.SUPPRESS)
            elif f.name == "eval_iters":
                p.add_argument(flag, nargs="+", type=int, default=argparse.SUPPRESS)
            else:
                typ = type(default) if default is not None else str
                p.add_argument(flag, type=typ, default=argparse.SUPPRESS)
        return vars(p.parse_args(argv))
