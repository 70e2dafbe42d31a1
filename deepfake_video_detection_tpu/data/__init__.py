from deepfake_video_detection_tpu.data.dataset import (  # noqa: F401
    VideoFacesDataset,
    infer_label,
    pad_or_sample_frames,
)
from deepfake_video_detection_tpu.data.normalize import (  # noqa: F401
    imagenet_normalize,
    clip_normalize,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from deepfake_video_detection_tpu.data.loader import Loader, prefetch_to_device  # noqa: F401
from deepfake_video_detection_tpu.data.video_dataset import VideoClipsDataset  # noqa: F401
