"""Fused preprocessing Pallas kernel: uint8 frames → normalized bf16.

When the normalized tensor must be **materialised** (handed to a separate
program, cached between steps, or produced by the augmentation pipeline),
XLA lays out a (…, 3) channel-last tensor by padding the last dim to 128
lanes — 42× the useful bytes. This kernel instead views the buffer as flat
(M, 128) lanes and does uint8→scale→normalize→bf16 in ONE HBM pass:
measured 55 ms vs 815 ms for the standalone XLA equivalent on a v5e chip
for a (64, 8, 224, 224, 3) batch (≈15×).

Do NOT insert it *inside* a model's jit program right before a conv — there
XLA fuses the normalize into the stem convolution for free, and an opaque
pallas_call blocks that fusion (measured: 1223 → 581 clips/s on the
flagship bench). Use it at program boundaries only.

Layout trick: a (N, H, W, 3) image tensor is viewed as (M, 128) lanes
(224·224·3 = 150 528 = 1176·128, so real face batches tile exactly).
Per-channel mean/std are selected with ``flat_index mod 3`` computed from a
2-D iota — no gather, just three ``where`` selects on the VPU.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deepfake_video_detection_tpu.data.normalize import IMAGENET_MEAN, IMAGENET_STD

_LANES = 128
_BLOCK_ROWS = 256  # (256, 128) u8 block = 32 KiB in, 64 KiB out — VMEM-friendly


def _kernel(x_ref, out_ref, *, mean: Tuple[float, ...], std: Tuple[float, ...],
            out_dtype):
    i = pl.program_id(0)
    # Mosaic has no direct u8→f32 cast — widen through int32 first
    x = x_ref[:].astype(jnp.int32).astype(jnp.float32) * (1.0 / 255.0)
    rows, lanes = x.shape
    # channel id of each element: (global_flat_index) mod 3
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 0)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, lanes), 1)
    flat = (i * _BLOCK_ROWS + row_ids) * lanes + col_ids
    ch = jax.lax.rem(flat, 3)
    m = jnp.where(ch == 0, mean[0], jnp.where(ch == 1, mean[1], mean[2]))
    inv = jnp.where(ch == 0, 1.0 / std[0],
                    jnp.where(ch == 1, 1.0 / std[1], 1.0 / std[2]))
    out_ref[:] = ((x - m) * inv).astype(out_dtype)


@functools.partial(jax.jit,
                   static_argnames=("mean", "std", "out_dtype", "interpret"))
def fused_normalize(
    frames_u8: jnp.ndarray,
    mean: Tuple[float, float, float] = IMAGENET_MEAN,
    std: Tuple[float, float, float] = IMAGENET_STD,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> jnp.ndarray:
    """``frames_u8``: any shape ending in channel=3 (e.g. (B, T, H, W, 3)),
    uint8 [0, 255]. Returns the same shape, normalized, in ``out_dtype``.

    Falls back to plain XLA ops when the flattened size doesn't tile into
    128 lanes (non-standard resolutions) or off-TPU (``interpret=True``
    forces the kernel through the Pallas interpreter for testing).
    """
    shape = frames_u8.shape
    total = 1
    for s in shape:
        total *= s
    on_tpu = jax.default_backend() in ("tpu", "axon") or interpret
    if total % _LANES != 0 or frames_u8.dtype != jnp.uint8 or not on_tpu:
        x = frames_u8.astype(jnp.float32) / 255.0
        return ((x - jnp.asarray(mean, jnp.float32))
                / jnp.asarray(std, jnp.float32)).astype(out_dtype)

    rows = total // _LANES
    grid = pl.cdiv(rows, _BLOCK_ROWS)
    flat = frames_u8.reshape(rows, _LANES)
    out = pl.pallas_call(
        functools.partial(_kernel, mean=tuple(mean), std=tuple(std),
                          out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), out_dtype),
        grid=(grid,),
        in_specs=[pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat)
    return out.reshape(shape)
