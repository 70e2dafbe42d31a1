"""Typed configuration tree with environment-variable overlays.

The reference scatters ~35 env knobs plus per-script argparse flags plus
checkpoint-embedded ``model_config`` dicts (SURVEY.md §5.6; ``app.py`` env
helpers ``_env_str:775``, ``_env_float:1802``, ``_env_int:1819``). Here that
surface is unified: one dataclass tree, each field overridable by the same
env-var names the reference uses, so deployments configured for the reference
keep working unchanged.
"""

from __future__ import annotations

import dataclasses
import os
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


# ---------------------------------------------------------------------------
# env parsing helpers (same tolerant semantics as the reference's app.py)
# ---------------------------------------------------------------------------

def env_str(name: str, default: Optional[str] = None) -> Optional[str]:
    v = os.environ.get(name)
    if v is None:
        return default
    v = v.strip()
    return v if v else default


def env_int(name: str, default: int) -> int:
    v = os.environ.get(name)
    if v is None or not str(v).strip():
        return default
    try:
        return int(str(v).strip())
    except ValueError:
        return default


def env_float(name: str, default: float) -> float:
    v = os.environ.get(name)
    if v is None or not str(v).strip():
        return default
    try:
        return float(str(v).strip())
    except ValueError:
        return default


def env_bool(name: str, default: bool = False) -> bool:
    v = os.environ.get(name)
    if v is None:
        return default
    return str(v).strip().lower() in ("1", "true", "yes", "on", "y")


# ---------------------------------------------------------------------------
# config tree
# ---------------------------------------------------------------------------

@dataclass
class PreprocessConfig:
    """Video → face-crop batch pipeline knobs (reference env surface:
    VIDEO_SAMPLE_RATE app.py:1918, FACE_SIZE :1924, FACE_DETECTOR :1929,
    KEEP_ALL_FACES :1930, MAX_FRAMES :2050, MIN_FACES :2063, VIDEO_BACKEND
    src/utils.py:34)."""

    sample_rate: int = 5
    max_frames: int = 8
    min_faces: int = 1
    face_size: int = 224
    face_detector: str = "auto"          # auto | mtcnn | haar | center | none
    keep_all_faces: bool = False
    video_backend: str = "auto"          # auto | imageio | opencv

    @classmethod
    def from_env(cls) -> "PreprocessConfig":
        c = cls()
        c.sample_rate = max(1, env_int("VIDEO_SAMPLE_RATE", c.sample_rate))
        c.max_frames = min(64, max(1, env_int("MAX_FRAMES", c.max_frames)))
        c.min_faces = max(1, env_int("MIN_FACES", c.min_faces))
        c.face_size = env_int("FACE_SIZE", c.face_size)
        c.face_detector = (env_str("FACE_DETECTOR", c.face_detector) or c.face_detector).lower()
        c.keep_all_faces = env_bool("KEEP_ALL_FACES", c.keep_all_faces)
        c.video_backend = (env_str("VIDEO_BACKEND", c.video_backend) or c.video_backend).lower()
        return c


@dataclass
class DecisionConfig:
    """Thresholding / abstain policy (DETECT_FAKE_THRESHOLD app.py:1903,
    DETECT_ABSTAIN_CONF :2035, DETECT_ABSTAIN_MARGIN :2042,
    FAKE_CLASS_INDEX :1846, ALLOW_EXTREME_CALIBRATION_THRESHOLD :2107,
    DISABLE_ENHANCED_AGENT :2120)."""

    fake_threshold: Optional[float] = None   # None → calibration file → 0.5
    abstain_confidence: float = 0.60
    abstain_margin: float = 0.0
    fake_class_index: Optional[int] = None   # None → from checkpoint metadata → 1
    allow_extreme_calibration_threshold: bool = False
    disable_enhanced_agent: bool = False

    @classmethod
    def from_env(cls) -> "DecisionConfig":
        c = cls()
        thr = os.environ.get("DETECT_FAKE_THRESHOLD")
        if thr and thr.strip():
            try:
                c.fake_threshold = float(thr)
            except ValueError:
                pass
        c.abstain_confidence = env_float("DETECT_ABSTAIN_CONF", c.abstain_confidence)
        c.abstain_margin = env_float("DETECT_ABSTAIN_MARGIN", c.abstain_margin)
        fci = os.environ.get("FAKE_CLASS_INDEX")
        if fci and fci.strip():
            try:
                c.fake_class_index = int(fci)
            except ValueError:
                pass
        c.allow_extreme_calibration_threshold = env_bool(
            "ALLOW_EXTREME_CALIBRATION_THRESHOLD", c.allow_extreme_calibration_threshold)
        c.disable_enhanced_agent = env_bool("DISABLE_ENHANCED_AGENT", c.disable_enhanced_agent)
        return c


@dataclass
class ModelConfig:
    """Model selection + checkpoint resolution (MODEL_PATH/CHECKPOINT_PATH,
    MODEL_URL/CHECKPOINT_URL, MODEL_TYPE, ENSEMBLE_BACKBONES — app.py:607-612)."""

    model_type: str = "pretrained"       # pretrained | ensemble | vit_gcn | cnn_lstm | rnn
    backbone: str = "efficientnet_b0"
    ensemble_backbones: Tuple[str, ...] = ("efficientnet_b0", "resnet18")
    checkpoint_path: Optional[str] = None
    checkpoint_url: Optional[str] = None
    num_classes: int = 2
    dropout_rate: float = 0.5
    use_temporal_attention: bool = True
    compute_dtype: str = "auto"          # auto: bf16 on accelerators, f32 on
                                         # CPU backends; params stay f32
                                         # (consumed by serve.loader.serving_dtype)
    quantize: str = "none"               # none | int8 — int8 stores matmul/conv
                                         # weights at rest as int8 + per-channel
                                         # scales (nn/quant.py, serving only)

    @classmethod
    def from_env(cls) -> "ModelConfig":
        c = cls()
        c.model_type = (env_str("MODEL_TYPE", c.model_type) or c.model_type).lower()
        c.checkpoint_path = env_str("MODEL_PATH", env_str("CHECKPOINT_PATH"))
        c.checkpoint_url = env_str("MODEL_URL", env_str("CHECKPOINT_URL"))
        eb = env_str("ENSEMBLE_BACKBONES")
        if eb:
            c.ensemble_backbones = tuple(s.strip() for s in eb.split(",") if s.strip())
        cd = env_str("COMPUTE_DTYPE")
        if cd:
            c.compute_dtype = cd.lower()
        qz = env_str("QUANTIZE")
        if qz:
            c.quantize = qz.lower()
        return c


@dataclass
class TrainConfig:
    """Trainer knobs covering the union of train.py / train_improved.py /
    ensemble_trainer.py CLI surfaces (SURVEY.md §2.3)."""

    batch_size: int = 8
    num_frames: int = 16
    epochs: int = 10
    lr: float = 1e-4
    weight_decay: float = 1e-4
    optimizer: str = "adamw"             # adam | adamw
    schedule: str = "cosine"             # step | cosine | warm_restarts | none
    step_size: int = 5
    step_gamma: float = 0.5
    warm_restart_t0: int = 10
    warm_restart_mult: int = 2
    loss: str = "ce"                     # ce | focal
    label_smoothing: float = 0.0
    focal_gamma: float = 2.0
    grad_clip: float = 1.0
    balance: str = "none"                # none | weights | sampler
    early_stop_patience: int = 20
    best_metric: str = "f1"              # f1 | accuracy | val_acc | ...
    seed: int = 42
    smoke: bool = False
    data_dir: str = "data"
    out_dir: str = "checkpoints"
    resume: bool = False
    init_from: Optional[str] = None
    val_frac: float = 0.2
    threshold_sweep: bool = True
    # parallelism
    mesh_shape: Tuple[int, ...] = (-1,)  # -1 → all devices on the data axis
    mesh_axes: Tuple[str, ...] = ("data",)


@dataclass
class ServeConfig:
    """Serving-process knobs (UI_BG_WORKERS app.py:128, TTLs :122-126,
    NO_AUTOLOAD :3274, UI_ENABLE_AGENT/JUSTIFICATION :2645)."""

    host: str = "0.0.0.0"
    port: int = 5000
    debug: bool = False
    no_autoload: bool = False
    bg_workers: int = 1
    results_ttl_seconds: int = 1800
    results_max_items: int = 100
    job_ttl_seconds: int = 1800
    enable_agent: bool = True
    enable_justification: bool = True
    upload_dir: str = "uploads"

    @classmethod
    def from_env(cls) -> "ServeConfig":
        c = cls()
        c.port = env_int("PORT", c.port)
        c.host = env_str("HOST", c.host) or c.host
        c.debug = env_bool("DEBUG", c.debug)
        c.no_autoload = env_bool("NO_AUTOLOAD", c.no_autoload)
        c.bg_workers = max(1, env_int("UI_BG_WORKERS", c.bg_workers))
        c.results_ttl_seconds = env_int("UI_RESULTS_TTL_SECONDS", c.results_ttl_seconds)
        c.results_max_items = env_int("UI_RESULTS_MAX_ITEMS", c.results_max_items)
        c.job_ttl_seconds = env_int("UI_JOB_TTL_SECONDS", c.job_ttl_seconds)
        c.enable_agent = env_bool("UI_ENABLE_AGENT", c.enable_agent)
        c.enable_justification = env_bool("UI_ENABLE_JUSTIFICATION", c.enable_justification)
        return c


@dataclass
class Config:
    preprocess: PreprocessConfig = field(default_factory=PreprocessConfig)
    decision: DecisionConfig = field(default_factory=DecisionConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)

    @classmethod
    def from_env(cls) -> "Config":
        return cls(
            preprocess=PreprocessConfig.from_env(),
            decision=DecisionConfig.from_env(),
            model=ModelConfig.from_env(),
            train=TrainConfig(),
            serve=ServeConfig.from_env(),
        )

    def to_dict(self) -> Dict[str, Any]:
        return dataclasses.asdict(self)

    def override(self, **sections: Dict[str, Any]) -> "Config":
        """Return a copy with per-section field overrides, e.g.
        ``cfg.override(model={"backbone": "resnet18"})``."""
        new = dataclasses.replace(self)
        for sec, fields in sections.items():
            cur = getattr(new, sec)
            setattr(new, sec, dataclasses.replace(cur, **fields))
        return new
