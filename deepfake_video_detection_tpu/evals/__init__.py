from deepfake_video_detection_tpu.evals.metrics import (  # noqa: F401
    binary_metrics,
    confusion_matrix,
    roc_auc,
    classification_report,
    threshold_sweep,
)
