"""Agent-layer tests: decision thresholds, enhanced agent math, aggregation,
monitoring/action artifacts, active-learning queue."""

import json
import os

import numpy as np
import pytest

from deepfake_video_detection_tpu.agents import (
    ActionAgent, ActiveLearner, AlertLevel, DecisionAgent, DecisionAggregator,
    EnhancedDecisionAgent, MonitoringAgent, MultiAgentOrchestrator,
    TelemetryLogger)


def test_decision_agent_levels():
    agent = DecisionAgent()
    # authentic
    r = agent.process({"video_id": "v", "probs": np.array([0.9, 0.1]),
                       "frame_scores": np.linspace(0, 1, 8)})
    assert r.alert_level == AlertLevel.SAFE and r.is_fake is False
    # fake, mid confidence → DANGER (0.7 < c <= 0.95)
    r = agent.process({"video_id": "v", "probs": np.array([0.2, 0.8]),
                       "frame_scores": np.linspace(0, 1, 8)})
    assert r.alert_level == AlertLevel.DANGER and r.is_fake is True
    # fake, very high confidence → CRITICAL
    r = agent.process({"video_id": "v", "probs": np.array([0.02, 0.98]),
                       "frame_scores": np.linspace(0, 1, 8)})
    assert r.alert_level == AlertLevel.CRITICAL
    # honors the app's pred_class over raw probs
    r = agent.process({"video_id": "v", "probs": np.array([0.4, 0.6]),
                       "pred_class": 0, "confidence": 0.9,
                       "frame_scores": np.zeros(4)})
    assert r.is_fake is False and r.alert_level == AlertLevel.SAFE


def test_enhanced_agent_decision_math():
    agent = EnhancedDecisionAgent()
    # strong fake consensus
    ens = np.array([-3.0, 3.0])
    members = [np.array([-2.0, 2.0]), np.array([-2.5, 2.5])]
    p = agent.process_ensemble_output(ens, members, np.zeros(8), "vid", 0.0)
    assert p.is_fake is True
    assert p.alert_level in (AlertLevel.DANGER, AlertLevel.CRITICAL)
    # adjusted prob formula: (0.7*ens + 0.3*mean_ind) with u=0
    fake_prob = 1 / (1 + np.exp(-6.0))
    ind = [1 / (1 + np.exp(-4.0)), 1 / (1 + np.exp(-5.0))]
    expected_adj = 0.7 * fake_prob + 0.3 * np.mean(ind)
    agreement = 1.0 - np.std(ind)
    expected_conf = abs(expected_adj - 0.5) * 2 * agreement
    assert p.confidence == pytest.approx(expected_conf, rel=1e-6)


def test_enhanced_agent_abstains():
    agent = EnhancedDecisionAgent()
    # disagreeing members (agreement < 0.6) + high uncertainty → abstain
    ens = np.array([0.0, 0.0])
    members = [np.array([-5.0, 5.0]), np.array([5.0, -5.0])]
    p = agent.process_ensemble_output(ens, members, np.zeros(8), "vid", 0.9)
    assert p.is_fake is None
    assert p.alert_level == AlertLevel.WARNING
    assert "Abstained" in p.explanation


def test_aggregator_strategies():
    agent = EnhancedDecisionAgent()
    preds = [
        agent.process_ensemble_output(np.array([-2.0, 2.0]), [], np.zeros(4), f"v{i}")
        for i in range(3)
    ]
    agg = DecisionAggregator()
    w = agg.aggregate_predictions(preds, "confidence_weighted")
    assert w["is_fake"] is True or w["is_fake"] == np.True_
    v = agg.aggregate_predictions(preds, "majority_voting")
    assert v["fake_votes"] == 3 and v["agreement"] == 1.0
    u = agg.aggregate_predictions(preds, "unanimous")
    assert u["unanimity"] is True


def test_monitoring_and_action_artifacts(tmp_path):
    mon = MonitoringAgent(str(tmp_path / "monitoring"))
    act = ActionAgent(str(tmp_path / "actions"))
    dec = DecisionAgent()
    r = dec.process({"video_id": "vid1", "probs": np.array([0.01, 0.99]),
                     "frame_scores": np.linspace(0, 1, 8)})
    m = mon.process(r)
    assert m["total_fake_detected"] == 1
    assert os.path.exists(tmp_path / "monitoring" / "predictions.jsonl")
    summary = act.process(r)  # CRITICAL → report + admin notification
    assert any("report filed" in a for a in summary["actions_taken"])
    assert os.path.isdir(tmp_path / "actions" / "reports")
    report = mon.get_report()
    assert report["fake_percentage"] == 100.0


def test_orchestrator_with_stub_forward(tmp_path):
    def fwd(frames):
        B = frames.shape[0]
        return (np.tile(np.array([[2.0, -2.0]], np.float32), (B, 1)),
                np.full((B, frames.shape[1]), 0.5, np.float32))

    orch = MultiAgentOrchestrator(forward_fn=fwd, log_root=str(tmp_path))
    out = orch.process_video(np.zeros((1, 4, 8, 8, 3), np.uint8), "clip")
    assert out["inference"]["is_fake"] is False
    assert out["inference"]["alert_level"] == "SAFE"


def test_active_learner_queue_and_drain(tmp_path):
    tel = TelemetryLogger(str(tmp_path / "telemetry.log"))
    al = ActiveLearner(str(tmp_path / "q.jsonl"), str(tmp_path / "l.jsonl"),
                       retrain_threshold=2, telemetry=tel)
    al.queue_for_label({"video_id": "a", "confidence": 0.01})
    al.queue_for_label({"video_id": "b", "confidence": 0.02})
    al.queue_for_label({"video_id": "c", "confidence": 0.03})
    # provider knows labels for a and c only
    labels = {"a": 1, "c": 0}
    n = al.process_queue_with_label_provider(lambda vid: labels.get(vid))
    assert n == 2
    assert al.labeled_count() == 2
    assert al.should_retrain() is True
    # b stays queued
    remaining = open(tmp_path / "q.jsonl").read()
    assert "\"b\"" in remaining and "\"a\"" not in remaining
    # telemetry wrote events
    events = [json.loads(x) for x in open(tmp_path / "telemetry.log")]
    assert any(e["event"] == "queued_for_label" for e in events)


def test_enhanced_agent_confidence_clamped_with_calibrated_threshold():
    """With a calibrated threshold far from 0.5, |p-thr|*2 exceeds 1 — the
    agent must clamp (the reference reports >100% confidence here)."""
    agent = EnhancedDecisionAgent(decision_threshold=0.05)
    p = agent.process_ensemble_output(np.array([-4.0, 4.0]), [], np.zeros(4),
                                      "v", 0.0)
    assert p.is_fake is True
    assert 0.0 <= p.confidence <= 1.0


def test_active_learner_export_and_finetune_dataset(tmp_path):
    """The labelled queue materializes into the framework's .npz dataset
    format (faces + label) so a warm-start fine-tune can consume it —
    closing the retrain loop the reference only recommends
    (src/active_learning.py:111)."""
    from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
    from deepfake_video_detection_tpu.data.faces import FaceExtractor
    from deepfake_video_detection_tpu.data.video import encode_video

    vids = tmp_path / "uploads"
    vids.mkdir()
    rng = np.random.default_rng(0)
    for name in ("clip_f.avi", "clip_r.avi"):
        frames = rng.integers(0, 255, (12, 64, 64, 3)).astype(np.uint8)
        encode_video(str(vids / name), frames, fps=10)

    al = ActiveLearner(str(tmp_path / "q.jsonl"), str(tmp_path / "l.jsonl"))
    # serving queues the upload BASENAME as video_id (serve/predict.py)
    al.queue_for_label({"video_id": "clip_f.avi", "confidence": 0.1})
    al.queue_for_label({"video_id": "clip_r.avi", "confidence": 0.2})
    al.queue_for_label({"video_id": "gone.avi", "confidence": 0.3})
    labels = {"clip_f.avi": 1, "clip_r.avi": 0, "gone.avi": 1}
    assert al.process_queue_with_label_provider(lambda v: labels.get(v)) == 3

    out_dir = tmp_path / "al_dataset"
    stats = al.export_labeled_dataset(
        str(out_dir), videos_dir=str(vids),
        extractor=FaceExtractor(detector="center", face_size=32),
        num_frames=4)
    assert stats == {"exported": 2, "skipped": 1}

    ds = VideoFacesDataset(str(out_dir), num_frames=4)
    assert len(ds) == 2
    assert sorted(ds.labels().tolist()) == [0, 1]
    faces, label, _ = ds[0]
    assert faces.shape == (4, 32, 32, 3) and faces.dtype == np.uint8
