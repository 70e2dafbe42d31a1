"""Input-gradient saliency (serve/saliency.py): the spatial half of the
result explanation — beyond the reference's text-only justification
(``app.py:2324-2460``)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.serve.saliency import (
    make_saliency_fn, saliency_payload)


class _QuadrantModel:
    """Stub with the pretrained-family apply signature whose fake logit is
    the pixel sum of the TOP-LEFT quadrant — its input gradient is exactly
    the quadrant indicator, so the pooled saliency must light up those grid
    cells and nothing else."""

    def init(self, rng):
        return {"params": {}, "state": {}}

    def apply(self, variables, x, train=False, rng=None):
        b = x.shape[0]
        h, w = x.shape[2], x.shape[3]
        fake = jnp.sum(x[:, :, : h // 2, : w // 2, :].astype(jnp.float32),
                       axis=(1, 2, 3, 4))
        logits = jnp.stack([jnp.zeros((b,), jnp.float32), fake], axis=1)
        scores = jnp.full((b, x.shape[1]), 1.0 / x.shape[1], jnp.float32)
        return (logits, scores), {}


def test_saliency_localizes_to_evidence_region():
    model = _QuadrantModel()
    fn = jax.jit(make_saliency_fn(model, grid=(4, 4)))
    frames = np.random.default_rng(0).integers(
        0, 255, size=(1, 3, 32, 32, 3), dtype=np.uint8)
    sal = np.asarray(fn(model.init(None), frames))  # (1, 3, 4, 4)
    assert sal.shape == (1, 3, 4, 4)
    assert np.all(sal >= 0.0) and np.all(sal <= 1.0 + 1e-6)
    hot = sal[0, :, :2, :2]   # top-left quadrant cells
    cold = sal[0].sum() - hot.sum()
    # the gradient is zero outside the quadrant; everything inside is equal
    assert np.all(hot > 0.99), hot
    assert cold < 1e-6 * max(hot.sum(), 1.0), cold


def test_saliency_payload_schema():
    grids = np.linspace(0, 1, 2 * 3 * 3).reshape(2, 3, 3)
    p = saliency_payload(grids)
    assert p["grid"] == [3, 3]
    assert len(p["frames"]) == 2 and len(p["frames"][0]) == 9
    assert all(0.0 <= v <= 1.0 for f in p["frames"] for v in f)


def test_predictor_explain_end_to_end(monkeypatch):
    """predict_faces(explain=True) on a REAL backbone attaches the additive
    saliency key; the plain call leaves the reference schema untouched."""
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)
    from deepfake_video_detection_tpu.serve.predict import Predictor

    monkeypatch.setenv("SERVE_WARMUP", "0")
    monkeypatch.setenv("DETECT_ABSTAIN_CONF", "0.0")
    monkeypatch.setenv("MIN_FACES", "1")
    model = BackboneDetector("resnet18")
    variables = model.init(jax.random.PRNGKey(0))
    pred = Predictor(model, variables, "pretrained")
    faces = np.random.default_rng(1).integers(
        0, 255, size=(3, 32, 32, 3), dtype=np.uint8)

    plain = pred.predict_faces(faces, "clip")
    assert "saliency" not in plain and "error" not in plain

    out = pred.predict_faces(faces, "clip", explain=True)
    assert "error" not in out
    sal = out["saliency"]
    gh, gw = sal["grid"]
    assert len(sal["frames"]) == 3
    assert all(len(f) == gh * gw for f in sal["frames"])
    flat = np.asarray(sal["frames"], np.float64)
    assert flat.min() >= 0.0 and flat.max() <= 1.0
    # every frame is max-normalised: its hottest cell is ~1
    assert np.allclose(flat.max(axis=1), 1.0, atol=1e-3)
    # the verdict fields are identical with and without explain
    for key in ("prediction", "prob_fake", "prob_real"):
        assert out[key] == plain[key], key


def test_voting_ensemble_saliency_not_blank():
    """A voting ensemble's combined logits are one_hot(argmax) with zero
    input gradient — the saliency fn must differentiate the MEAN of member
    logits instead of rendering an all-zero heat map (advisor r3)."""
    from deepfake_video_detection_tpu.models.backbone_detector import (
        EnsembleDetector)

    model = EnsembleDetector(backbone_names=("resnet18", "resnet18"),
                             ensemble_method="voting")
    v = model.init(jax.random.PRNGKey(0))
    fn = jax.jit(make_saliency_fn(model, grid=(4, 4), fake_idx=1))
    frames = np.random.default_rng(0).integers(
        0, 255, (1, 2, 64, 64, 3), np.uint8)
    grids = np.asarray(fn(v, frames))
    assert grids.shape == (1, 2, 4, 4)
    # per-frame max-normalised: a non-degenerate gradient gives max == 1
    assert np.allclose(grids.max(axis=(2, 3)), 1.0, atol=1e-5), grids


def test_fake_class_index_passed_per_call():
    """fake_idx is a builder arg resolved by the caller — the two indices
    of a binary head must explain OPPOSITE classes (negated contrastive
    score -> different normalised grids in general)."""
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)

    model = BackboneDetector("resnet18", use_temporal_attention=False)
    v = model.init(jax.random.PRNGKey(1))
    frames = np.random.default_rng(1).integers(
        0, 255, (1, 1, 64, 64, 3), np.uint8)
    g1 = np.asarray(jax.jit(make_saliency_fn(model, (4, 4), fake_idx=1))(v, frames))
    g0 = np.asarray(jax.jit(make_saliency_fn(model, (4, 4), fake_idx=0))(v, frames))
    # |grad| of score and -score are identical; the POINT is both compile
    # and run with the host-resolved index (the r3 bug froze the env value
    # at first trace) — shapes and normalisation must hold for both
    assert g1.shape == g0.shape == (1, 1, 4, 4)
    assert np.allclose(g1, g0, atol=1e-5)
