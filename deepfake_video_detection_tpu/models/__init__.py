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
from deepfake_video_detection_tpu.models.vit_gnn import (  # noqa: F401
    FallbackModel,
    SimpleGNN as PatchGNN,
    ViTGNNModel,
)
from deepfake_video_detection_tpu.models.vlm_gan import (  # noqa: F401
    Discriminator,
    Generator,
    TextProjector,
)
from deepfake_video_detection_tpu.models.feature_extractors import (  # noqa: F401
    CLIPVisionFeatureExtractor,
    DINOv2VisionFeatureExtractor,
    ViTFeatureExtractor,
    build_feature_extractor,
)
from deepfake_video_detection_tpu.models.mtcnn import MTCNN  # noqa: F401
from deepfake_video_detection_tpu.models.temporal_transformer import (  # noqa: F401
    TemporalTransformerDetector,
)
