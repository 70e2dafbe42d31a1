"""Batched, jittable train-time augmentations.

Capability parity with the reference's DFDC-style PIL/torchvision pipeline
(``src/dataset.py:107-142``): RandomResizedCrop, horizontal flip, ColorJitter
(brightness/contrast/saturation/hue-lite), random grayscale,
downscale-upscale, JPEG recompression (quality 35-95), Gaussian blur.

TPU-native redesign — this is NOT a per-image PIL loop:

* every augmentation is a batched JAX op over the whole (B, T, H, W, 3)
  clip tensor, jitted once and fused by XLA;
* the same random draw applies to all frames of a clip (per-video
  consistency, matching the reference which samples transform params once
  per clip via identical transform objects);
* JPEG recompression is implemented *in maths* — 8×8 blockwise DCT →
  quantisation with quality-scaled standard tables → IDCT — instead of a
  host JPEG codec round-trip. Same artefact distribution, zero host work.

Eval transform = resize only (``src/dataset.py:125-129``), provided by
``ops/image.py``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


@dataclass(frozen=True)
class AugmentConfig:
    crop_scale: Tuple[float, float] = (0.8, 1.0)
    crop_ratio: Tuple[float, float] = (0.9, 1.1)
    p_flip: float = 0.5
    p_jitter: float = 0.8
    brightness: float = 0.15
    contrast: float = 0.15
    saturation: float = 0.15
    p_gray: float = 0.05
    p_downscale: float = 0.15
    downscale_min: float = 0.5
    p_jpeg: float = 0.30
    jpeg_q_min: int = 35
    jpeg_q_max: int = 95
    p_blur: float = 0.10
    blur_sigma_max: float = 1.5


# ---------------------------------------------------------------------------
# geometric
# ---------------------------------------------------------------------------


def _resized_crop(clip: jnp.ndarray, y0, x0, ch, cw) -> jnp.ndarray:
    """Crop box (dynamic position, static output size) + bilinear resize back
    to the input resolution, batched over frames via scale_and_translate."""
    T, H, W, C = clip.shape
    # scale_and_translate maps output pixel o to input o/scale - translate/scale
    scale_y = H / ch
    scale_x = W / cw
    # want output pixel 0 ↔ input y0 → translate = -y0*scale
    return jax.image.scale_and_translate(
        clip.astype(jnp.float32),
        shape=(T, H, W, C),
        spatial_dims=(1, 2),
        scale=jnp.stack([scale_y, scale_x]),
        translation=jnp.stack([-y0 * scale_y, -x0 * scale_x]),
        method="bilinear",
    )


def random_resized_crop(rng: jax.Array, clip: jnp.ndarray,
                        scale=(0.8, 1.0), ratio=(0.9, 1.1)) -> jnp.ndarray:
    T, H, W, C = clip.shape
    k1, k2, k3, k4 = jax.random.split(rng, 4)
    area = jax.random.uniform(k1, (), minval=scale[0], maxval=scale[1])
    log_r = jax.random.uniform(k2, (), minval=math.log(ratio[0]), maxval=math.log(ratio[1]))
    r = jnp.exp(log_r)
    ch = jnp.clip(jnp.sqrt(area / r) * H, 8.0, H)
    cw = jnp.clip(jnp.sqrt(area * r) * W, 8.0, W)
    y0 = jax.random.uniform(k3, (), minval=0.0, maxval=1.0) * (H - ch)
    x0 = jax.random.uniform(k4, (), minval=0.0, maxval=1.0) * (W - cw)
    return _resized_crop(clip, y0, x0, ch, cw)


def random_hflip(rng: jax.Array, clip: jnp.ndarray, p: float = 0.5) -> jnp.ndarray:
    flip = jax.random.bernoulli(rng, p)
    return jnp.where(flip, clip[:, :, ::-1, :], clip)


# ---------------------------------------------------------------------------
# photometric
# ---------------------------------------------------------------------------

_LUMA = jnp.asarray([0.299, 0.587, 0.114], jnp.float32)


def color_jitter(rng: jax.Array, clip: jnp.ndarray, brightness: float,
                 contrast: float, saturation: float) -> jnp.ndarray:
    kb, kc, ks = jax.random.split(rng, 3)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    x = clip * b
    mean = jnp.mean(x * _LUMA, axis=(-3, -2, -1), keepdims=True) * 3.0
    x = (x - mean) * c + mean
    gray = jnp.sum(x * _LUMA, axis=-1, keepdims=True)
    x = (x - gray) * s + gray
    return x


def random_grayscale(rng: jax.Array, clip: jnp.ndarray, p: float) -> jnp.ndarray:
    on = jax.random.bernoulli(rng, p)
    gray = jnp.sum(clip * _LUMA, axis=-1, keepdims=True)
    return jnp.where(on, jnp.broadcast_to(gray, clip.shape), clip)


def random_downscale_upscale(rng: jax.Array, clip: jnp.ndarray, p: float,
                             min_scale: float) -> jnp.ndarray:
    """≙ ``_RandomDownscaleUpscale`` (``src/dataset.py:107``): soften by a
    down-up resample. Implemented with a dynamic scale_and_translate pair so
    the blur strength varies continuously without dynamic shapes."""
    T, H, W, C = clip.shape
    k1, k2 = jax.random.split(rng)
    on = jax.random.bernoulli(k1, p)
    s = jax.random.uniform(k2, (), minval=min_scale, maxval=0.95)
    # antialiased downsample to the SAME canvas (content in top-left s-fraction)
    down = jax.image.scale_and_translate(
        clip, (T, H, W, C), (1, 2),
        scale=jnp.stack([s, s]), translation=jnp.zeros(2),
        method="linear", antialias=True)
    up = jax.image.scale_and_translate(
        down, (T, H, W, C), (1, 2),
        scale=jnp.stack([1.0 / s, 1.0 / s]), translation=jnp.zeros(2),
        method="linear", antialias=False)
    return jnp.where(on, up, clip)


def gaussian_blur(rng: jax.Array, clip: jnp.ndarray, p: float,
                  sigma_max: float, ksize: int = 5) -> jnp.ndarray:
    k1, k2 = jax.random.split(rng)
    on = jax.random.bernoulli(k1, p)
    sigma = jax.random.uniform(k2, (), minval=0.1, maxval=sigma_max)
    half = ksize // 2
    xs = jnp.arange(-half, half + 1, dtype=jnp.float32)
    g = jnp.exp(-0.5 * jnp.square(xs / sigma))
    g = g / jnp.sum(g)
    # separable depthwise conv via two 1-D convolutions
    T, H, W, C = clip.shape
    x = jnp.moveaxis(clip, -1, 1).reshape(T * C, 1, H, W)
    kh = g.reshape(1, 1, ksize, 1)
    kw = g.reshape(1, 1, 1, ksize)
    x = jax.lax.conv_general_dilated(x, kh, (1, 1), [(half, half), (0, 0)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    x = jax.lax.conv_general_dilated(x, kw, (1, 1), [(0, 0), (half, half)],
                                     dimension_numbers=("NCHW", "OIHW", "NCHW"))
    blurred = jnp.moveaxis(x.reshape(T, C, H, W), 1, -1)
    return jnp.where(on, blurred, clip)


# ---------------------------------------------------------------------------
# JPEG recompression in maths (8×8 DCT quantisation)
# ---------------------------------------------------------------------------

# ITU-T T.81 Annex K standard luminance quantisation table
_Q_LUMA = jnp.asarray([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], jnp.float32)


def _dct_matrix(n: int = 8) -> jnp.ndarray:
    k = jnp.arange(n, dtype=jnp.float32)
    grid = jnp.cos(jnp.pi * (2 * k[None, :] + 1) * k[:, None] / (2 * n))
    m = grid * jnp.sqrt(2.0 / n)
    return m.at[0].mul(1.0 / jnp.sqrt(2.0))


def jpeg_recompress(rng: jax.Array, clip: jnp.ndarray, p: float,
                    q_min: int, q_max: int) -> jnp.ndarray:
    """Quality-q JPEG artefact simulation (≙ ``_RandomJPEGCompression``,
    ``src/dataset.py:83``): per-channel 8×8 DCT → quantise with the standard
    table scaled by libjpeg's quality curve → dequantise → IDCT. All matmuls —
    pure MXU work."""
    T, H, W, C = clip.shape
    assert H % 8 == 0 and W % 8 == 0, "JPEG aug needs 8-aligned sizes"
    k1, k2 = jax.random.split(rng)
    on = jax.random.bernoulli(k1, p)
    q = jax.random.uniform(k2, (), minval=float(q_min), maxval=float(q_max))
    # libjpeg scale factor
    scale = jnp.where(q < 50.0, 5000.0 / q, 200.0 - 2.0 * q)
    table = jnp.clip(jnp.floor((_Q_LUMA * scale + 50.0) / 100.0), 1.0, 255.0)

    D = _dct_matrix(8)
    x = clip - 128.0
    xb = x.reshape(T, H // 8, 8, W // 8, 8, C)
    xb = jnp.einsum("ij,thjwkc,lk->thiwlc", D, xb, D,
                    preferred_element_type=jnp.float32)
    coeff = jnp.round(xb / table[None, None, :, None, :, None]) * \
        table[None, None, :, None, :, None]
    yb = jnp.einsum("ji,thjwkc,kl->thiwlc", D, coeff, D,
                    preferred_element_type=jnp.float32)
    y = yb.reshape(T, H, W, C) + 128.0
    return jnp.where(on, jnp.clip(y, 0.0, 255.0), clip)


# ---------------------------------------------------------------------------
# full pipeline
# ---------------------------------------------------------------------------


def augment_clip(rng: jax.Array, clip: jnp.ndarray,
                 cfg: AugmentConfig = AugmentConfig()) -> jnp.ndarray:
    """Augment one clip (T, H, W, 3) float32 in [0, 255]."""
    ks = jax.random.split(rng, 8)
    x = clip.astype(jnp.float32)
    x = random_resized_crop(ks[0], x, cfg.crop_scale, cfg.crop_ratio)
    x = random_hflip(ks[1], x, cfg.p_flip)
    jit_on = jax.random.bernoulli(ks[2], cfg.p_jitter)
    x = jnp.where(jit_on,
                  color_jitter(ks[3], x, cfg.brightness, cfg.contrast, cfg.saturation),
                  x)
    x = random_grayscale(ks[4], x, cfg.p_gray)
    x = random_downscale_upscale(ks[5], x, cfg.p_downscale, cfg.downscale_min)
    x = jpeg_recompress(ks[6], x, cfg.p_jpeg, cfg.jpeg_q_min, cfg.jpeg_q_max)
    x = gaussian_blur(ks[7], x, cfg.p_blur, cfg.blur_sigma_max)
    return jnp.clip(x, 0.0, 255.0)


@partial(jax.jit, static_argnames=("cfg",))
def augment_batch(rng: jax.Array, batch: jnp.ndarray,
                  cfg: AugmentConfig = AugmentConfig()) -> jnp.ndarray:
    """(B, T, H, W, 3) uint8/float → augmented float32 [0,255], vmapped so
    every clip draws independent parameters."""
    B = batch.shape[0]
    keys = jax.random.split(rng, B)
    return jax.vmap(lambda k, c: augment_clip(k, c, cfg))(keys, batch.astype(jnp.float32))
