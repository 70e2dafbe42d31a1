from deepfake_video_detection_tpu.models.efficientnet import EfficientNet  # noqa: F401
from deepfake_video_detection_tpu.models.resnet import ResNet  # noqa: F401
from deepfake_video_detection_tpu.models.vit import VisionTransformer  # noqa: F401
from deepfake_video_detection_tpu.models.backbone_detector import (  # noqa: F401
    BackboneDetector,
    EnsembleDetector,
    build_backbone,
)
from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid  # noqa: F401
from deepfake_video_detection_tpu.models.gcn import SimpleGCN, FrameGraphDetector  # noqa: F401
from deepfake_video_detection_tpu.models.logic_rnn import LogicRNNLSTM  # noqa: F401
