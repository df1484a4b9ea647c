from visitron_tpu.data.tokenization import WordPieceTokenizer, build_wordpiece_vocab
from visitron_tpu.data.dialog import truncate_dialogs, build_dialog_sequence, SEGMENT_IDS
from visitron_tpu.data.datasets import (
    load_split,
    load_classifier_episodes,
    NavInstance,
    build_nav_instances,
)
from visitron_tpu.data.features import (
    SceneFeatureTable,
    RegionFeatureStore,
    read_tsv_img_features,
    write_tsv_img_features,
)

__all__ = [
    "WordPieceTokenizer",
    "build_wordpiece_vocab",
    "truncate_dialogs",
    "build_dialog_sequence",
    "SEGMENT_IDS",
    "load_split",
    "load_classifier_episodes",
    "NavInstance",
    "build_nav_instances",
    "SceneFeatureTable",
    "RegionFeatureStore",
    "read_tsv_img_features",
    "write_tsv_img_features",
]

from visitron_tpu.data.candidates import (
    ScanCandidateTable,
    build_candidate_table,
    build_candidate_tables,
)
from visitron_tpu.data.classifier_dataset import ClassifierInstance, build_classifier_instances
from visitron_tpu.data.env import EnvBatch, SimNavEnv
from visitron_tpu.data.legacy_tokenizer import LegacyTokenizer, build_legacy_vocab
from visitron_tpu.data.pretrain_dataset import PretrainDataset

__all__ += [
    "ScanCandidateTable",
    "build_candidate_table",
    "build_candidate_tables",
    "ClassifierInstance",
    "build_classifier_instances",
    "EnvBatch",
    "SimNavEnv",
    "LegacyTokenizer",
    "build_legacy_vocab",
    "PretrainDataset",
]
