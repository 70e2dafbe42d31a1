from deepfake_video_detection_tpu.ops.preprocess import (  # noqa: F401
    fused_normalize,
)
from deepfake_video_detection_tpu.ops.attention import flash_attention  # noqa: F401
