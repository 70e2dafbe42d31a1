"""Parameter initialisers with PyTorch-default semantics.

The reference's models rely on torch's default inits plus a couple of explicit
ones (kaiming_normal fan_out for heads, normal(0, 0.01) — see
``src/pretrained_detector.py:80-85``). Reproducing the distributions keeps our
from-scratch training runs statistically comparable to the reference's.
All conv kernels here are **HWIO** (TPU-native); fan computations account for
that.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _conv_fans(shape: Sequence[int]) -> Tuple[int, int]:
    """(fan_in, fan_out) for an HWIO conv kernel or (out,in) linear weight."""
    if len(shape) == 4:  # H, W, I, O
        rf = shape[0] * shape[1]
        return shape[2] * rf, shape[3] * rf
    if len(shape) == 2:  # torch Linear: (out, in)
        return shape[1], shape[0]
    raise ValueError(f"unsupported weight shape {shape}")


def kaiming_uniform(key, shape, a: float = math.sqrt(5), dtype=jnp.float32):
    """torch's default conv/linear weight init."""
    fan_in, _ = _conv_fans(shape)
    gain = math.sqrt(2.0 / (1 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def kaiming_normal(key, shape, mode: str = "fan_out", dtype=jnp.float32):
    fan_in, fan_out = _conv_fans(shape)
    fan = fan_out if mode == "fan_out" else fan_in
    std = math.sqrt(2.0 / fan)
    return std * jax.random.normal(key, shape, dtype)


def uniform_bias(key, shape, fan_in: int, dtype=jnp.float32):
    """torch's default bias init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal(key, shape, std: float = 0.01, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


def trunc_normal(key, shape, std: float = 0.02, dtype=jnp.float32):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype)


def zeros(shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)


def ones(shape, dtype=jnp.float32):
    return jnp.ones(shape, dtype)
