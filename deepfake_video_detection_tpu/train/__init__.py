from deepfake_video_detection_tpu.train.losses import (  # noqa: F401
    cross_entropy_loss,
    focal_loss,
    binary_cross_entropy_with_logits,
)
from deepfake_video_detection_tpu.train.optim import (  # noqa: F401
    build_optimizer,
    step_lr_schedule,
    cosine_schedule,
    cosine_warm_restarts,
    ReduceLROnPlateau,
    EarlyStopping,
)
from deepfake_video_detection_tpu.train.state import TrainState  # noqa: F401
from deepfake_video_detection_tpu.train.steps import make_train_step, make_eval_step  # noqa: F401
