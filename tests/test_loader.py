"""Checkpoint resolver tests: architecture search, match-ratio gating,
autoload candidate scoring + fallback on corrupt checkpoints."""

import json
import os

import numpy as np
import pytest

import jax

from deepfake_video_detection_tpu.checkpoint.store import (
    save_checkpoint, save_torch_checkpoint)
from deepfake_video_detection_tpu.models.backbone_detector import BackboneDetector
from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid
from deepfake_video_detection_tpu.serve import loader


@pytest.fixture(scope="module")
def ckpt_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("ckpts")
    model = CNNLSTMHybrid()
    v = model.init(jax.random.PRNGKey(0))
    good = root / "dfdc" / "checkpoint_best.npz"
    save_checkpoint(str(good), v,
                    meta={"model_config": {"model_type": "cnn_lstm"}})
    return root, str(good)


def test_load_model_infers_type(ckpt_tree):
    _, good = ckpt_tree
    model, variables, stats = loader.load_model(good)
    assert stats["model_type"] == "cnn_lstm"
    assert stats["match_ratio"] == 1.0


def test_load_model_rejects_garbage(tmp_path):
    bad = tmp_path / "bad.npz"
    np.savez(bad, **{"params.nonsense.weight": np.zeros((3, 3)),
                     "__meta_json__": np.frombuffer(b"{}", np.uint8)})
    with pytest.raises(ValueError):
        loader.load_model(str(bad))


def test_autoload_skips_corrupt_candidate(ckpt_tree, monkeypatch):
    root, good = ckpt_tree
    # plant a HIGHER-priority corrupt checkpoint (dfdc200 beats dfdc)
    bad_dir = root / "dfdc200"
    bad_dir.mkdir(exist_ok=True)
    bad = bad_dir / "checkpoint_best.npz"
    bad.write_bytes(b"this is not a checkpoint")
    cands = loader.build_autoload_candidates(str(root))
    assert cands[0][0] == str(bad)  # corrupt one ranks first...
    out = loader.attempt_autoload(str(root))
    assert out is not None          # ...but autoload falls through to good
    _, _, stats = out
    assert stats["path"] == good


def test_calibration_penalty_downranks_extreme(tmp_path):
    d1 = tmp_path / "a"
    d2 = tmp_path / "b"
    for d in (d1, d2):
        d.mkdir()
        (d / "checkpoint_best.npz").write_bytes(b"x")
    (d1 / "calibration_best.json").write_text(
        json.dumps({"best_thr_accuracy": 0.99}))  # extreme → penalised
    (d2 / "calibration_best.json").write_text(
        json.dumps({"best_thr_accuracy": 0.55}))
    best = loader.pick_best_checkpoint_for_autoload(str(tmp_path))
    assert best == str(d2 / "checkpoint_best.npz")


def test_infer_backbone_from_keys():
    sd_eff = {"backbone.conv_stem.weight": np.zeros((3, 3, 3, 32))}
    assert loader.infer_backbone_from_keys(sd_eff) == "efficientnet_b0"
    sd_r50 = {"backbone.layer4.0.conv3.weight": np.zeros((1, 1, 64, 256))}
    assert loader.infer_backbone_from_keys(sd_r50) == "resnet50"
    sd_r18 = {"backbone.layer4.0.conv1.weight": np.zeros((3, 3, 64, 64)),
              "backbone.layer3.1.conv1.weight": np.zeros((3, 3, 64, 64))}
    assert loader.infer_backbone_from_keys(sd_r18) == "resnet18"
    sd_vit = {"backbone.cls_token": np.zeros((1, 1, 768))}
    assert loader.infer_backbone_from_keys(sd_vit) == "vit_base_patch16_224"
    assert loader.infer_backbone_from_keys({}, "my_resnet18_model.pt") == "resnet18"


def test_torch_checkpoint_roundtrip_via_loader(tmp_path):
    torch = pytest.importorskip("torch")
    model = BackboneDetector("resnet18")
    v = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "detector.pt")
    save_torch_checkpoint(path, v, layout="model_config",
                          meta={"model_config": {"model_type": "pretrained",
                                                 "backbone": "resnet18"}})
    m2, v2, stats = loader.load_model(path)
    assert stats["model_type"] == "pretrained"
    assert stats["match_ratio"] == 1.0
    w1 = np.asarray(v["params"]["fc1"]["weight"])
    w2 = np.asarray(v2["params"]["fc1"]["weight"])
    np.testing.assert_allclose(w1, w2, rtol=1e-6)


def test_loader_honors_compute_dtype_env(tmp_path, monkeypatch, caplog):
    """COMPUTE_DTYPE selects the served model's activation dtype (params
    stay f32); unset on a CPU backend it defaults to float32 so the torch
    parity tests stay exact, while accelerators default to bfloat16
    (ModelConfig.compute_dtype)."""
    import jax.numpy as jnp

    model = BackboneDetector("resnet18")
    v = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "d.npz")
    save_checkpoint(path, v, meta={"model_type": "pretrained",
                                   "backbone": "resnet18"})

    monkeypatch.delenv("COMPUTE_DTYPE", raising=False)
    assert loader.serving_dtype() == jnp.float32  # CPU test backend

    monkeypatch.setenv("COMPUTE_DTYPE", "bf16")
    m_bf, v_bf, _ = loader.load_model(path)
    assert m_bf.compute_dtype == jnp.bfloat16
    # params stay f32 and the forward is finite in bf16
    leaf = np.asarray(v_bf["params"]["fc1"]["weight"])
    assert leaf.dtype == np.float32
    x = jnp.zeros((1, 2, 64, 64, 3), jnp.float32)
    (logits, _), _ = jax.jit(lambda vv, xx: m_bf.apply(vv, xx))(v_bf, x)
    assert np.isfinite(np.asarray(logits)).all()

    monkeypatch.setenv("COMPUTE_DTYPE", "float32")
    m_f32, _, _ = loader.load_model(path)
    assert m_f32.compute_dtype == jnp.float32

    # unsupported value → float32 WITH a warning, never a silent bf16/crash
    monkeypatch.setenv("COMPUTE_DTYPE", "float16")
    with caplog.at_level("WARNING",
                         logger="deepfake_video_detection_tpu.serve.loader"):
        assert loader.serving_dtype() == jnp.float32
    assert any("COMPUTE_DTYPE" in r.message for r in caplog.records)


def test_load_model_prefers_ema_sibling(tmp_path):
    """A checkpoint whose meta says metrics were scored on the EMA weights
    (``metrics_scored_on: ema``, written by the trainer under --ema_decay)
    must serve the sibling *_ema.npz — the weights that actually earned the
    recorded metrics — not the raw training params."""
    model = CNNLSTMHybrid()
    v = model.init(jax.random.PRNGKey(0))
    raw = tmp_path / "checkpoint_best.npz"
    save_checkpoint(str(raw), v,
                    meta={"model_config": {"model_type": "cnn_lstm"},
                          "metrics_scored_on": "ema"})
    # EMA weights: recognisably different on one leaf
    v_ema = jax.tree_util.tree_map(lambda x: np.array(x, copy=True), v)
    leaf = v_ema["params"]["classifier"]["0"]["weight"]
    v_ema["params"]["classifier"]["0"]["weight"] = leaf * 0.0 + 7.0
    save_checkpoint(str(tmp_path / "checkpoint_best_ema.npz"), v_ema,
                    meta={"model_config": {"model_type": "cnn_lstm"},
                          "metrics_scored_on": "ema"})
    _, variables, stats = loader.load_model(str(raw))
    got = np.asarray(variables["params"]["classifier"]["0"]["weight"])
    np.testing.assert_allclose(got, 7.0)
    assert stats["match_ratio"] == 1.0


def test_load_model_ema_meta_without_sibling_serves_raw(tmp_path):
    """Missing *_ema.npz: fall back to the raw weights (with a warning) —
    never fail the load."""
    model = CNNLSTMHybrid()
    v = model.init(jax.random.PRNGKey(1))
    raw = tmp_path / "checkpoint_best.npz"
    save_checkpoint(str(raw), v,
                    meta={"model_config": {"model_type": "cnn_lstm"},
                          "metrics_scored_on": "ema"})
    _, variables, stats = loader.load_model(str(raw))
    assert stats["match_ratio"] == 1.0
