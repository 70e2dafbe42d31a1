"""Device-side YUV420 → RGB conversion.

The serving host ships face crops to the chip as planar YUV420 (HALF the
bytes of RGB24 — the host→device link, not the MXU, is the single-chip
serving bottleneck; see ``native/videodec.cc:vd_sample_seek_crop_yuv``).
The colorspace matrix runs here on device, where XLA fuses it into the
ImageNet normalization and the detector's stem conv.

The reference never had this problem (decoder and model shared one host,
``src/utils.py:19-93``); this op is part of the TPU-native serving design,
not a ported component.

Convention: limited-range BT.601 (what swscale emits for AV_PIX_FMT_YUV420P),
Y in [16, 235], U/V in [16, 240] centred at 128.
"""

from __future__ import annotations

import jax.numpy as jnp


def yuv420_to_rgb(y: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray
                  ) -> jnp.ndarray:
    """(..., H, W) luma + (..., H/2, W/2) chroma → (..., H, W, 3) float32 RGB
    in [0, 255].

    Chroma is upsampled 2× with a repeat (nearest): at 224px detector inputs
    the difference from bilinear is sub-quantization-noise, and the repeat is
    a pure reshape/broadcast — zero FLOPs, fuses away entirely.
    """
    yf = y.astype(jnp.float32) - 16.0
    uf = u.astype(jnp.float32) - 128.0
    vf = v.astype(jnp.float32) - 128.0
    # nearest 2x upsample on the last two axes
    uf = jnp.repeat(jnp.repeat(uf, 2, axis=-1), 2, axis=-2)
    vf = jnp.repeat(jnp.repeat(vf, 2, axis=-1), 2, axis=-2)
    # BT.601 limited range
    yl = 1.164383 * yf
    r = yl + 1.596027 * vf
    g = yl - 0.391762 * uf - 0.812968 * vf
    b = yl + 2.017232 * uf
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def unpack_yuv420(packed: jnp.ndarray, height: int, width: int):
    """Split a packed (..., H*W*3//2) uint8 buffer (Y then U then V, the
    native decoder's layout) into (y, u, v) planes."""
    hw = height * width
    qw = (height // 2) * (width // 2)
    y = packed[..., :hw].reshape(packed.shape[:-1] + (height, width))
    u = packed[..., hw:hw + qw].reshape(
        packed.shape[:-1] + (height // 2, width // 2))
    v = packed[..., hw + qw:hw + 2 * qw].reshape(
        packed.shape[:-1] + (height // 2, width // 2))
    return y, u, v


def yuv420_packed_to_rgb(packed: jnp.ndarray, height: int, width: int
                         ) -> jnp.ndarray:
    """Packed (..., H*W*3//2) uint8 → (..., H, W, 3) float32 RGB [0, 255]."""
    return yuv420_to_rgb(*unpack_yuv420(packed, height, width))
