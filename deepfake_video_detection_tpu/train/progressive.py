"""Progressive fine-tuning schedule (≙ ``ProgressiveFineTuner``,
``src/pretrained_detector.py:221-274``).

Three stages: head-only at lr 1e-3 → unfreeze the last 2 backbone blocks at
lr 1e-4 → full network at lr 1e-5. Freezing is an optax gradient mask built
from ``BackboneDetector.trainable_mask`` — parameters never mutate
``requires_grad`` flags (there are none); the optimizer just zeroes updates
for frozen leaves, so the jitted train step is reused across stages.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List


@dataclass(frozen=True)
class StageConfig:
    name: str
    lr: float
    freeze_backbone: bool
    unfreeze_blocks: int   # -1 = all


_STAGES: List[StageConfig] = [
    StageConfig("head_only", 1e-3, True, 0),
    StageConfig("partial_unfreeze", 1e-4, True, 2),
    StageConfig("full_finetune", 1e-5, False, -1),
]


class ProgressiveFineTuner:
    def __init__(self, model: Any, epochs_per_stage: int = 5):
        self.model = model
        self.epochs_per_stage = epochs_per_stage
        self.stage_idx = 0

    @property
    def current_stage(self) -> StageConfig:
        return _STAGES[min(self.stage_idx, len(_STAGES) - 1)]

    def get_stage_config(self) -> Dict[str, Any]:
        s = self.current_stage
        return {"stage": self.stage_idx, "name": s.name, "lr": s.lr,
                "freeze_backbone": s.freeze_backbone,
                "unfreeze_blocks": s.unfreeze_blocks,
                "epochs": self.epochs_per_stage}

    def advance_stage(self) -> bool:
        """Move to the next stage; returns False once past the last."""
        if self.stage_idx >= len(_STAGES) - 1:
            return False
        self.stage_idx += 1
        return True

    def trainable_mask(self, variables: Dict[str, Any]):
        s = self.current_stage
        return self.model.trainable_mask(
            variables, freeze_backbone=s.freeze_backbone,
            unfreeze_blocks=s.unfreeze_blocks)

    def make_optimizer(self, variables: Dict[str, Any],
                       weight_decay: float = 1e-4, grad_clip: float = 1.0):
        from deepfake_video_detection_tpu.train.optim import build_optimizer

        s = self.current_stage
        return build_optimizer("adamw", s.lr, weight_decay, grad_clip,
                               trainable_mask=self.trainable_mask(variables))
