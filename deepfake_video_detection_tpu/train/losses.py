"""Loss functions used across the trainers.

Capability parity (reference):
* weighted cross-entropy — ``src/train.py:306-314`` builds per-class weights
  from inverse label frequency and passes them to ``nn.CrossEntropyLoss``;
* ``FocalLoss`` with label smoothing — ``src/train_improved.py:29-78``
  (alpha/gamma focal term over smoothed targets);
* BCE/hinge GAN losses live in ``models/vlm_gan.py``.

All are pure functions of (logits, labels) computed in float32 regardless of
the model's compute dtype — softmax/log-sum-exp in bf16 loses too much
precision for stable training.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _smoothed_one_hot(labels: jnp.ndarray, num_classes: int, smoothing: float) -> jnp.ndarray:
    one = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    if smoothing > 0.0:
        one = one * (1.0 - smoothing) + smoothing / num_classes
    return one


def _weighted_mean(per_sample: jnp.ndarray, labels: jnp.ndarray,
                   class_weights, sample_mask) -> jnp.ndarray:
    """torch-semantics weighted mean: sum(w·x)/sum(w), where w combines the
    per-class weight and the validity mask (padded loader slots get w=0, so
    partial batches train identically to their unpadded equivalents)."""
    w = jnp.ones_like(per_sample)
    if class_weights is not None:
        w = w * jnp.asarray(class_weights, jnp.float32)[labels]
    if sample_mask is not None:
        w = w * sample_mask.astype(jnp.float32)
    return jnp.sum(per_sample * w) / jnp.maximum(jnp.sum(w), 1e-8)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: Optional[jnp.ndarray] = None,
    label_smoothing: float = 0.0,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Weighted-mean CE over the batch."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    targets = _smoothed_one_hot(labels, logits.shape[-1], label_smoothing)
    ce = -jnp.sum(targets * logp, axis=-1)
    return _weighted_mean(ce, labels, class_weights, sample_mask)


def focal_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    alpha: float = 1.0,
    gamma: float = 2.0,
    label_smoothing: float = 0.1,
    class_weights: Optional[jnp.ndarray] = None,
    sample_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Focal loss over smoothed targets (≙ ``src/train_improved.py:29-78``):
    ``alpha * (1 - p_t)^gamma * CE`` with p_t the true-class probability."""
    logits = logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    targets = _smoothed_one_hot(labels, logits.shape[-1], label_smoothing)
    ce = -jnp.sum(targets * logp, axis=-1)
    pt = jnp.exp(-ce)
    loss = alpha * jnp.power(1.0 - pt, gamma) * ce
    return _weighted_mean(loss, labels, class_weights, sample_mask)


def binary_cross_entropy_with_logits(
    logits: jnp.ndarray, targets: jnp.ndarray
) -> jnp.ndarray:
    """Numerically-stable BCEWithLogits, mean-reduced."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.mean(
        jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def inverse_frequency_class_weights(labels, num_classes: int = 2):
    """Host-side inverse-frequency weights (≙ ``src/train.py:306-310`` and
    ``src/ensemble_trainer.py:491-546``): w_c = N / (C * count_c)."""
    import numpy as np

    labels = np.asarray(labels)
    counts = np.bincount(labels, minlength=num_classes).astype(np.float64)
    counts = np.maximum(counts, 1.0)
    w = labels.shape[0] / (num_classes * counts)
    return (w / w.mean()).astype(np.float32)
