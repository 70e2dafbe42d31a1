"""The hard-corpus generator (tools/make_hard_corpus.py) must be what it
claims: NOT linearly separable from pixels, yet separable from local
spectral structure — the property the round-1 validation corpus lacked
(VERDICT round 1, weak #5)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_hard_corpus import synth_clip  # noqa: E402

from deepfake_video_detection_tpu.evals.metrics import roc_auc  # noqa: E402


def _make_set(n: int, h: int = 32, w: int = 32, seed: int = 0):
    rng = np.random.default_rng(seed)
    X = np.empty((n, h, w, 3), np.float64)
    y = np.empty(n, np.int64)
    for i in range(n):
        fake = i % 2 == 1
        X[i] = synth_clip(rng, fake, frames=1, h=h, w=w)[0]
        y[i] = int(fake)
    return X, y


def test_linear_probe_fails():
    """Ridge-regression probe on raw pixels ≈ chance: per-class means are
    equal and artifacts are sign-randomized, so no linear score separates."""
    Xtr, ytr = _make_set(120, seed=0)
    Xte, yte = _make_set(60, seed=1)
    A = Xtr.reshape(len(Xtr), -1)
    B = Xte.reshape(len(Xte), -1)
    mu, sd = A.mean(0), A.std(0) + 1e-6
    A = (A - mu) / sd
    B = (B - mu) / sd
    # closed-form ridge: w = (AᵀA + λI)⁻¹ Aᵀ y±
    lam = 10.0
    t = ytr * 2.0 - 1.0
    w = np.linalg.solve(A.T @ A + lam * np.eye(A.shape[1]), A.T @ t)
    auc = roc_auc(yte, B @ w)
    assert max(auc, 1 - auc) < 0.70, f"linear probe separates: AUC {auc:.3f}"


def test_spectral_probe_succeeds():
    """Energy at the period-4 checkerboard frequency separates the classes —
    the signal exists and is a texture-structure feature."""
    X, y = _make_set(60, seed=2)
    h, w = X.shape[1:3]
    scores = []
    for img in X:
        f = np.fft.fft2(img.mean(-1))
        scores.append(np.abs(f[h // 4, w // 4]) + np.abs(f[-(h // 4), -(w // 4)]))
    auc = roc_auc(y, np.asarray(scores))
    assert auc > 0.85, f"spectral probe too weak: AUC {auc:.3f}"


def test_moments_match():
    """Global mean/std inside-region statistics carry no class signal."""
    X, y = _make_set(80, seed=3)
    feats = np.stack([X.reshape(len(X), -1).mean(1),
                      X.reshape(len(X), -1).std(1)], axis=1)
    for j in range(feats.shape[1]):
        auc = roc_auc(y, feats[:, j])
        assert max(auc, 1 - auc) < 0.70, f"moment {j} separates: {auc:.3f}"


def test_artifact_survives_codec(tmp_path):
    """The checkerboard must survive the mpeg4 encode→native decode round
    trip at corpus resolution, or the hardware corpus would be unlearnable."""
    pytest.importorskip("ctypes")
    from deepfake_video_detection_tpu.data.video import (
        encode_video, sample_video_frames)

    rng = np.random.default_rng(4)
    clip = synth_clip(rng, fake=True, frames=8, h=240, w=240)
    p = str(tmp_path / "f.avi")
    encode_video(p, clip, fps=25)
    dec = sample_video_frames(p, sample_rate=1, max_frames=1)[0]
    f = np.fft.fft2(dec.astype(np.float64).mean(-1))
    peak = np.abs(f[60, 60])
    # same-seed REAL clip: no peak at the lattice frequency after the codec
    rng = np.random.default_rng(4)
    clip_r = synth_clip(rng, fake=False, frames=8, h=240, w=240)
    pr = str(tmp_path / "r.avi")
    encode_video(pr, clip_r, fps=25)
    dec_r = sample_video_frames(pr, sample_rate=1, max_frames=1)[0]
    fr = np.fft.fft2(dec_r.astype(np.float64).mean(-1))
    peak_r = np.abs(fr[60, 60])
    assert peak > 3.0 * peak_r, f"artifact lost in codec: {peak:.1f} vs {peak_r:.1f}"
