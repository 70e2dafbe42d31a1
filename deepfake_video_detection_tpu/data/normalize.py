"""Image normalisation constants and ops.

≙ ``imagenet_normalize`` (``app.py:1772-1780``) and the CLIP/DINOv2
normalisations the backbone wrappers apply (``src/models.py:110-196``).
Channel-last (NHWC / (B,T,H,W,C)) — the TPU-native layout everywhere in this
framework. Accepts uint8 [0,255] or float [0,1].
"""

from __future__ import annotations

import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def imagenet_normalize(x: jnp.ndarray, scaled: bool = False) -> jnp.ndarray:
    """``x``: (..., H, W, 3) uint8 [0,255] (or float [0,1] with
    ``scaled=True``) → float32 normalised."""
    x = x.astype(jnp.float32)
    if not scaled:
        x = x / 255.0
    mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
    std = jnp.asarray(IMAGENET_STD, jnp.float32)
    return (x - mean) / std


def clip_normalize(x: jnp.ndarray, scaled: bool = False) -> jnp.ndarray:
    x = x.astype(jnp.float32)
    if not scaled:
        x = x / 255.0
    mean = jnp.asarray(CLIP_MEAN, jnp.float32)
    std = jnp.asarray(CLIP_STD, jnp.float32)
    return (x - mean) / std
