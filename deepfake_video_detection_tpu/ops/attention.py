"""Flash attention Pallas kernel (single chip).

Self-attention for the ViT backbones and — the real motivation — the
long-clip temporal path SURVEY.md §5.7 plans for: when clips stop being
capped at 16-64 frames, attention over the frame axis becomes quadratic in
HBM traffic. This kernel computes softmax(QKᵀ/√d)V **without materialising
the (N, N) attention matrix**: the K/V sequence is streamed block-by-block
through VMEM with a running (max, sum, accumulator) — the standard
flash-attention recurrence.

Grid: (batch·heads, Q blocks); the K loop is a ``fori_loop`` inside the
kernel over VMEM-resident K/V (loaded per (b, h) by the BlockSpec). Shapes
are padded to the (128, head_dim) tile by the wrapper and un-padded on exit;
padding keys are masked to -inf before the softmax.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BLOCK_Q = 128
_BLOCK_K = 128
_NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, *, n_valid: int, scale: float):
    """One (batch·head, q-block) program. q_ref: (1, BLOCK_Q, d);
    k_ref/v_ref: (1, N_pad, d) for this batch·head; out: (1, BLOCK_Q, d)."""
    q = q_ref[0].astype(jnp.float32) * scale
    n_pad = k_ref.shape[1]
    d = q.shape[1]
    num_kb = n_pad // _BLOCK_K

    def body(kb, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(kb * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # (BQ, BK)
        # mask padding keys
        key_ids = kb * _BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < n_valid, s, _NEG_INF)
        m_cur = jnp.max(s, axis=1, keepdims=True)         # (BQ, 1)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)                            # (BQ, BK)
        alpha = jnp.exp(m_prev - m_new)
        l_new = l_prev * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p, v, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    acc0 = jnp.zeros((q.shape[0], d), jnp.float32)
    m0 = jnp.full((q.shape[0], 1), _NEG_INF, jnp.float32)
    l0 = jnp.zeros((q.shape[0], 1), jnp.float32)
    acc, m, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    out_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)


def _pad_to(x: jnp.ndarray, axis: int, mult: int) -> jnp.ndarray:
    pad = (-x.shape[axis]) % mult
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


@functools.partial(jax.jit, static_argnames=("interpret",))
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    interpret: bool = False) -> jnp.ndarray:
    """``q, k, v``: (B, H, N, d) — returns softmax(QKᵀ/√d)V, same shape/dtype.

    ``d`` should be ≤ 256 (whole head fits VMEM lanes); N is arbitrary
    (padded to 128 internally).

    Differentiable: the Pallas kernel carries a ``custom_vjp`` whose
    backward recomputes the attention in plain XLA and differentiates that
    (exact softmax-attention gradients; the (N, N) matrix materialises in
    the BACKWARD pass only, so training memory matches the plain path
    while the forward keeps the flash memory profile). Round 3 shipped the
    kernel without it, which made every long-clip (N ≥ 256) TRAINING step
    on TPU fail at trace time — CPU tests never hit the TPU-gated branch.
    A streaming Pallas backward kernel is the natural next optimization.
    """
    return _flash(q, k, v, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, interpret):
    return _flash_impl(q, k, v, interpret)


def _flash_fwd(q, k, v, interpret):
    return _flash_impl(q, k, v, interpret), (q, k, v)


def _flash_bwd(interpret, res, g):
    q, k, v = res
    scale = 1.0 / math.sqrt(q.shape[-1])
    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = g.astype(jnp.float32)
    s = jnp.einsum("bhnd,bhmd->bhnm", qf, kf) * scale
    p = jax.nn.softmax(s, axis=-1)
    dv = jnp.einsum("bhnm,bhnd->bhmd", p, gf)
    dp = jnp.einsum("bhnd,bhmd->bhnm", gf, vf)
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhnm,bhmd->bhnd", ds, kf) * scale
    dk = jnp.einsum("bhnm,bhnd->bhmd", ds, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_flash.defvjp(_flash_fwd, _flash_bwd)


def _flash_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                interpret: bool = False) -> jnp.ndarray:
    B, H, N, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qf = _pad_to(q.reshape(B * H, N, d), 1, _BLOCK_Q)
    kf = _pad_to(k.reshape(B * H, N, d), 1, _BLOCK_K)
    vf = _pad_to(v.reshape(B * H, N, d), 1, _BLOCK_K)
    n_q_pad = qf.shape[1]
    n_k_pad = kf.shape[1]

    out = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=N, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, n_q_pad, d), q.dtype),
        grid=(B * H, n_q_pad // _BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N].reshape(B, H, N, d)
