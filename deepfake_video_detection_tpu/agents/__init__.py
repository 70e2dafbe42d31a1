from deepfake_video_detection_tpu.agents.system import (  # noqa: F401
    AlertLevel,
    PredictionResult,
    Agent,
    InferenceAgent,
    DecisionAgent,
    MonitoringAgent,
    ActionAgent,
    MultiAgentOrchestrator,
)
from deepfake_video_detection_tpu.agents.enhanced import (  # noqa: F401
    EnhancedDecisionAgent,
    EnsemblePrediction,
    DecisionAggregator,
)
from deepfake_video_detection_tpu.agents.active_learning import ActiveLearner  # noqa: F401
from deepfake_video_detection_tpu.agents.telemetry import TelemetryLogger  # noqa: F401
