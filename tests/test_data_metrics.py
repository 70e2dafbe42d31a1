"""Tests for device-side augmentation, normalization, loader, and metrics
(cross-checked against sklearn where available)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.data.augment import (
    AugmentConfig, augment_batch, jpeg_recompress)
from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
from deepfake_video_detection_tpu.data.dataset import pad_or_sample_frames
from deepfake_video_detection_tpu.evals.metrics import (
    binary_metrics, confusion_matrix, classification_report, roc_auc,
    threshold_sweep, full_metrics)


def test_imagenet_normalize():
    x = np.full((2, 4, 4, 3), 128, np.uint8)
    y = np.asarray(imagenet_normalize(jnp.asarray(x)))
    expected = (128 / 255.0 - np.array([0.485, 0.456, 0.406])) / \
        np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(y[0, 0, 0], expected, rtol=1e-5)


def test_pad_or_sample():
    faces = np.arange(3 * 4 * 4 * 3, dtype=np.uint8).reshape(3, 4, 4, 3)
    up = pad_or_sample_frames(faces, 5)
    assert up.shape[0] == 5
    np.testing.assert_array_equal(up[3], faces[-1])  # repeat-last pad
    down = pad_or_sample_frames(faces, 2)
    assert down.shape[0] == 2
    np.testing.assert_array_equal(down[0], faces[0])
    np.testing.assert_array_equal(down[1], faces[-1])  # uniform endpoints


def test_augment_batch_shapes_and_range(rng):
    x = rng.integers(0, 256, size=(2, 3, 32, 32, 3)).astype(np.uint8)
    out = np.asarray(augment_batch(jax.random.PRNGKey(0), jnp.asarray(x)))
    assert out.shape == x.shape
    assert out.dtype == np.float32
    assert out.min() >= 0.0 and out.max() <= 255.0
    # different clips draw different params → different outputs
    assert not np.allclose(out[0], out[1])


def test_jpeg_recompress_degrades_but_preserves(rng):
    x = jnp.asarray(rng.integers(0, 256, size=(1, 32, 32, 3)).astype(np.float32))
    y = jpeg_recompress(jax.random.PRNGKey(1), x, p=1.0, q_min=35, q_max=36)
    y = np.asarray(y)
    err = np.abs(y - np.asarray(x)).mean()
    assert 1.0 < err < 60.0  # artefacts present but image recognisable
    y95 = np.asarray(jpeg_recompress(jax.random.PRNGKey(1), x, p=1.0,
                                     q_min=95, q_max=96))
    err95 = np.abs(y95 - np.asarray(x)).mean()
    assert err95 < err  # higher quality → less distortion


def test_metrics_vs_sklearn(rng):
    sk = pytest.importorskip("sklearn.metrics")
    y = rng.integers(0, 2, 200)
    p = rng.random(200)
    pred = (p >= 0.5).astype(np.int64)
    m = binary_metrics(y, pred)
    assert m["accuracy"] == pytest.approx(sk.accuracy_score(y, pred))
    assert m["precision"] == pytest.approx(
        sk.precision_score(y, pred, zero_division=0))
    assert m["recall"] == pytest.approx(sk.recall_score(y, pred, zero_division=0))
    assert m["f1"] == pytest.approx(sk.f1_score(y, pred, zero_division=0))
    assert roc_auc(y, p) == pytest.approx(sk.roc_auc_score(y, p))
    np.testing.assert_array_equal(confusion_matrix(y, pred),
                                  sk.confusion_matrix(y, pred))


def test_threshold_sweep_picks_separator():
    y = np.array([0] * 50 + [1] * 50)
    p = np.concatenate([np.linspace(0.0, 0.4, 50), np.linspace(0.6, 1.0, 50)])
    best = threshold_sweep(y, p)
    assert best["best_accuracy"] == 1.0
    assert 0.4 < best["best_thr_accuracy"] < 0.65
    fm = full_metrics(y, p, threshold=best["best_thr_accuracy"])
    assert fm["accuracy"] == 1.0 and fm["auc"] == 1.0
    assert "report" in fm and "real" in fm["report"]
