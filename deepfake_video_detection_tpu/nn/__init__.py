from deepfake_video_detection_tpu.nn import layers as layers  # noqa: F401
from deepfake_video_detection_tpu.nn import init as init  # noqa: F401
