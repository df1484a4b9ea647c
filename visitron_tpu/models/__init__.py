from visitron_tpu.models.bert import (BertConfig, BertTextModel,
                                      VisitronBert, config_for_mesh)
from visitron_tpu.models.pretrain import PretrainModel, pretrain_loss
from visitron_tpu.models.encoder import OscarEncoder
from visitron_tpu.models.decoder import (
    SoftDotAttention,
    AttnDecoderLSTM,
    AttnDecoderLSTMwithClassifier,
    TurnBasedDecoderLSTM,
)
from visitron_tpu.models.lstm import LSTM, lstm_cell_step

__all__ = [
    "BertConfig",
    "config_for_mesh",
    "VisitronBert",
    "BertTextModel",
    "PretrainModel",
    "pretrain_loss",
    "OscarEncoder",
    "SoftDotAttention",
    "AttnDecoderLSTM",
    "AttnDecoderLSTMwithClassifier",
    "TurnBasedDecoderLSTM",
    "LSTM",
    "lstm_cell_step",
]

from visitron_tpu.models.classification import ImageBertForActionPrediction
from visitron_tpu.models.resnet import ResNet, convert_torchvision_resnet
from visitron_tpu.models.speaker import Critic, SpeakerDecoder, SpeakerEncoder

__all__ += [
    "ImageBertForActionPrediction",
    "ResNet",
    "convert_torchvision_resnet",
    "Critic",
    "SpeakerDecoder",
    "SpeakerEncoder",
]

from visitron_tpu.models.detector import (
    BottomUpDetector,
    FasterRCNN,
    convert_caffe_bottomup,
)

__all__ += [
    "BottomUpDetector",
    "FasterRCNN",
    "convert_caffe_bottomup",
]
