"""Functional NN layers with torch-compatible numerics, TPU-native layout.

Design (differs deliberately from the reference's ``nn.Module`` graphs):

* **Pure functions over pytrees.** Every layer is ``apply(params, x) -> y``
  (plus explicit ``state`` for batch-norm running stats). Models compose these
  inside a single jitted function — XLA sees the whole graph and fuses.
* **NHWC activations, HWIO kernels.** The MXU-friendly layout; the torch
  bridge transposes OIHW→HWIO once at load time.
* **Param dicts mirror torch ``state_dict`` names** (``weight``, ``bias``,
  ``running_mean`` …) so flattened dotted paths line up with the reference's
  checkpoints (SURVEY.md §5.4).
* **Mixed precision**: ``compute_dtype`` (bf16 by default in model configs)
  is applied at the call site; params stay f32. Convolutions/matmuls request
  f32 accumulation via ``preferred_element_type``.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, Any]

# ---------------------------------------------------------------------------
# dense / conv
# ---------------------------------------------------------------------------


def linear(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """torch.nn.Linear: weight (out, in), y = x @ W^T + b."""
    w = p["weight"].astype(x.dtype)
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


def conv2d(
    p: Params,
    x: jnp.ndarray,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] | str = 0,
    groups: int = 1,
    dilation: int | Tuple[int, int] = 1,
) -> jnp.ndarray:
    """2-D cross-correlation matching ``torch.nn.Conv2d`` numerics.

    ``x``: (N, H, W, C); kernel in ``p['weight']``: (kH, kW, C/groups, O).
    """
    w = p["weight"].astype(x.dtype)
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(dilation, int):
        dilation = (dilation, dilation)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    elif isinstance(padding, tuple):
        pad = [(padding[0], padding[0]), (padding[1], padding[1])]
    else:
        pad = padding  # 'SAME' / 'VALID'
    # NOTE: no preferred_element_type here — jax's conv transpose rule feeds
    # the f32 cotangent back into a conv against the bf16 operand and fails
    # ("requires arguments to have the same dtypes"), breaking every bf16
    # train step. The TPU MXU accumulates bf16 convolutions in f32 natively,
    # so dropping it costs nothing on the target hardware.
    y = lax.conv_general_dilated(
        x, w,
        window_strides=stride,
        padding=pad,
        rhs_dilation=dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    ).astype(x.dtype)
    if "bias" in p and p["bias"] is not None:
        y = y + p["bias"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# normalisation
# ---------------------------------------------------------------------------


def batch_norm(
    p: Params,
    state: Params,
    x: jnp.ndarray,
    train: bool = False,
    eps: float = 1e-5,
    momentum: float = 0.1,
    axis: int = -1,
) -> Tuple[jnp.ndarray, Params]:
    """BatchNorm with torch semantics (biased batch var for normalisation,
    unbiased for the running-stat update). Channels on ``axis`` (NHWC: -1).

    Returns ``(y, new_state)``; state passes through untouched in eval mode.
    """
    gamma = p["weight"]
    beta = p["bias"]
    if train:
        reduce_axes = tuple(i for i in range(x.ndim) if i != (axis % x.ndim))
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=reduce_axes)
        var = jnp.mean(jnp.square(xf), axis=reduce_axes) - jnp.square(mean)
        n = x.size // x.shape[axis]
        unbiased = var * (n / max(n - 1, 1))
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"] + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"] + momentum * unbiased,
        }
    else:
        mean = state["running_mean"]
        var = state["running_var"]
        new_state = state
    # fold into a single scale/shift → one fused multiply-add on the VPU
    inv = lax.rsqrt(var + eps) * gamma
    shift = beta - mean * inv
    shape = [1] * x.ndim
    shape[axis % x.ndim] = x.shape[axis]
    y = x * inv.reshape(shape).astype(x.dtype) + shift.reshape(shape).astype(x.dtype)
    return y, new_state


def layer_norm(p: Params, x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * lax.rsqrt(var + eps)
    return (y * p["weight"] + p["bias"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# pooling
# ---------------------------------------------------------------------------


def max_pool2d(
    x: jnp.ndarray,
    kernel: int,
    stride: int,
    padding: int = 0,
) -> jnp.ndarray:
    """torch.nn.MaxPool2d on NHWC (pads with -inf like torch).

    The init value must be ``-inf`` (not ``finfo.min``) — JAX's reverse-mode
    rule for ``reduce_window`` only recognises the canonical max monoid.
    """
    neg = -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min
    return lax.reduce_window(
        x, neg, lax.max,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )


def avg_pool2d(x: jnp.ndarray, kernel: int, stride: int, padding: int = 0) -> jnp.ndarray:
    s = lax.reduce_window(
        x.astype(jnp.float32), 0.0, lax.add,
        window_dimensions=(1, kernel, kernel, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (padding, padding), (padding, padding), (0, 0)),
    )
    return (s / (kernel * kernel)).astype(x.dtype)


def global_avg_pool(x: jnp.ndarray) -> jnp.ndarray:
    """AdaptiveAvgPool2d(1) + flatten: (N,H,W,C) → (N,C)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


# ---------------------------------------------------------------------------
# regularisation
# ---------------------------------------------------------------------------


def dropout(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


def drop_path(rng: Optional[jax.Array], x: jnp.ndarray, rate: float, train: bool) -> jnp.ndarray:
    """Stochastic depth (per-sample). Used by EfficientNet/ViT blocks."""
    if not train or rate <= 0.0 or rng is None:
        return x
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(rng, keep, shape)
    return jnp.where(mask, x / keep, 0.0).astype(x.dtype)


# ---------------------------------------------------------------------------
# recurrent (scan-based, TPU-friendly)
# ---------------------------------------------------------------------------


def lstm(
    layer_params: Sequence[Params],
    x: jnp.ndarray,
    dropout_rate: float = 0.0,
    train: bool = False,
    rng: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, Tuple[jnp.ndarray, jnp.ndarray]]:
    """Multi-layer LSTM matching ``torch.nn.LSTM(batch_first=True)``.

    The input projection ``x @ W_ih^T`` for the *whole sequence* is hoisted out
    of the recurrence into one large MXU matmul; only the (small) recurrent
    matmul runs inside ``lax.scan``. Gate order i,f,g,o as in torch, so bridged
    torch ``weight_ih_l{k}``/``weight_hh_l{k}`` tensors drop straight in.

    ``x``: (B, T, F). Returns (outputs (B,T,H), (h_n (L,B,H), c_n (L,B,H))).
    """
    B = x.shape[0]
    h_ns, c_ns = [], []
    for k, p in enumerate(layer_params):
        H = p["weight_hh"].shape[1]
        w_ih = p["weight_ih"].astype(x.dtype)   # (4H, in)
        w_hh = p["weight_hh"].astype(x.dtype)   # (4H, H)
        bias = (p["bias_ih"] + p["bias_hh"]).astype(jnp.float32)
        # (B, T, 4H) — one big matmul over the flattened sequence
        zx = jax.lax.dot_general(
            x, w_ih, dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        zx = zx + bias

        def cell(carry, z_t):
            h, c = carry
            z = z_t + jax.lax.dot_general(
                h, w_hh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            i, f, g, o = jnp.split(z, 4, axis=-1)
            i = jax.nn.sigmoid(i)
            f = jax.nn.sigmoid(f)
            g = jnp.tanh(g)
            o = jax.nn.sigmoid(o)
            c_new = f * c + i * g
            h_new = o * jnp.tanh(c_new)
            return (h_new, c_new), h_new

        h0 = jnp.zeros((B, H), jnp.float32)
        c0 = jnp.zeros((B, H), jnp.float32)
        (h_T, c_T), ys = lax.scan(cell, (h0, c0), jnp.swapaxes(zx, 0, 1))
        x = jnp.swapaxes(ys, 0, 1).astype(x.dtype)
        h_ns.append(h_T)
        c_ns.append(c_T)
        if dropout_rate > 0.0 and k < len(layer_params) - 1 and train and rng is not None:
            rng, sub = jax.random.split(rng)
            x = dropout(sub, x, dropout_rate, train)
    return x, (jnp.stack(h_ns), jnp.stack(c_ns))


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def _use_fused_attn() -> bool:
    """Fused (Pallas) attention policy for the ViT backbones.

    ``VIT_FUSED_ATTN=1`` opts in; the default is the XLA path — MEASURED
    faster at ViT shapes on this chip (r5 A/B, tools/bench_vit_attention.py
    + docs/performance.md "Short-N fused attention A/B"): at N = 197 with
    B·T·heads ≈ 1.5k the XLA batched einsum (28.5 ms/pass attention halves)
    beats both the per-head single-block Pallas kernel (46.6 ms — TPU
    Pallas grids run sequentially, 18k programs) and the G=8
    head-grouped variant (41.4 ms — thin d=64 batched matmuls under-fill
    the MXU tiles). The score tensor's HBM traffic is real but XLA's
    pipelining of one huge contraction wins anyway at this N; the short-N
    kernel remains the right engine for long-sequence shapes
    (``models/temporal_transformer.py`` thresholds)."""
    import os

    v = os.environ.get("VIT_FUSED_ATTN", "").strip()
    return v in ("1", "true", "yes")


def multi_head_attention(
    p: Params,
    x: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """timm-style fused-QKV self-attention. ``x``: (B, N, C).

    Param names (``qkv.weight`` (3C, C), ``qkv.bias``, ``proj.weight``,
    ``proj.bias``) mirror ``timm`` ViT blocks for bridge compatibility.
    """
    B, N, C = x.shape
    head = C // num_heads
    qkv = linear(p["qkv"], x)                           # (B, N, 3C)
    qkv = qkv.reshape(B, N, 3, num_heads, head)
    q, k, v = jnp.moveaxis(qkv, 2, 0)                   # each (B, N, nh, hd)
    q = jnp.swapaxes(q, 1, 2)                           # (B, nh, N, hd)
    k = jnp.swapaxes(k, 1, 2)
    v = jnp.swapaxes(v, 1, 2)
    if _use_fused_attn():
        from deepfake_video_detection_tpu.ops.attention import flash_attention

        out = flash_attention(q, k, v)                  # (B, nh, N, hd)
    else:
        scale = 1.0 / math.sqrt(head)
        attn = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                          preferred_element_type=jnp.float32) * scale
        attn = jax.nn.softmax(attn, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v,
                         preferred_element_type=jnp.float32).astype(x.dtype)
    out = jnp.swapaxes(out, 1, 2).reshape(B, N, C)
    return linear(p["proj"], out)
