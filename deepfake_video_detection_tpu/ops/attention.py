"""Flash attention Pallas kernels (single chip), forward AND backward.

Self-attention for the ViT backbones and — the real motivation — the
long-clip temporal path SURVEY.md §5.7 plans for: when clips stop being
capped at 16-64 frames, attention over the frame axis becomes quadratic in
HBM traffic. The forward computes softmax(QKᵀ/√d)V **without materialising
the (N, N) attention matrix**: the K/V sequence is streamed block-by-block
through VMEM with a running (max, sum, accumulator) — the standard
flash-attention recurrence — and additionally emits the per-row logsumexp
``L`` so the backward can reconstruct any P-block as ``exp(S − L)`` on the
fly.

The backward is the FlashAttention-2 scheme, also streaming:

* ``D = rowsum(dO ⊙ O)`` (one cheap XLA reduction);
* a dQ kernel (grid: q blocks) re-streams K/V:  ``P = exp(S − L)``,
  ``dS = P ⊙ (dO Vᵀ − D)``, ``dQ += dS·K · scale``;
* a dK/dV kernel (grid: k blocks) re-streams Q/dO:  ``dV += Pᵀ dO``,
  ``dK += dSᵀ Q · scale``.

Nothing (N, N)-shaped ever lives in HBM in either direction, so training
memory scales O(N) like the forward. Gradients are mathematically exact
softmax-attention gradients (regression-tested against the XLA path).

Grid: (batch·heads, Q or K blocks); the inner loop is a ``fori_loop`` over
VMEM-resident blocks. Shapes are padded to the (128, head_dim) tile by the
wrapper and un-padded on exit; padding keys are masked to -inf before the
softmax (and to P=0 in the backward).
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


def _attn_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, *, n_valid: int,
                 scale: float):
    """One (batch·head, q-block) program. q_ref: (1, BLOCK_Q, d);
    k_ref/v_ref: (1, N_pad, d) for this batch·head; out: (1, BLOCK_Q, d);
    lse_ref: (1, BLOCK_Q, 1) — per-row logsumexp of the SCALED scores."""
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
    lse_ref[0] = m + jnp.log(jnp.maximum(l, 1e-30))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dq_ref, *,
                   n_valid: int, scale: float):
    """dQ for one (batch·head, q-block): re-stream K/V. lse/dcap:
    (1, BLOCK_Q, 1)."""
    q = q_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse = lse_ref[0]                                      # (BQ, 1) f32
    dcap = dcap_ref[0]                                    # (BQ, 1) f32
    n_pad = k_ref.shape[1]
    num_kb = n_pad // _BLOCK_K

    def body(kb, dq):
        k = k_ref[0, pl.ds(kb * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        v = v_ref[0, pl.ds(kb * _BLOCK_K, _BLOCK_K), :].astype(jnp.float32)
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)
        key_ids = kb * _BLOCK_K + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 1)
        s = jnp.where(key_ids < n_valid, s, _NEG_INF)
        p = jnp.exp(s - lse)                              # (BQ, BK)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, BK)
        ds = p * (dp - dcap)
        return dq + jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    dq0 = jnp.zeros(q.shape, jnp.float32)
    dq = jax.lax.fori_loop(0, num_kb, body, dq0)
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref, dk_ref,
                    dv_ref, *, n_valid: int, scale: float):
    """dK/dV for one (batch·head, k-block): re-stream Q/dO. q/do/lse/dcap
    refs hold the FULL (padded) sequence for this batch·head."""
    k = k_ref[0].astype(jnp.float32)                      # (BK, d)
    v = v_ref[0].astype(jnp.float32)
    kb = pl.program_id(1)
    n_pad = q_ref.shape[1]
    num_qb = n_pad // _BLOCK_Q
    key_ids = kb * _BLOCK_K + jax.lax.broadcasted_iota(
        jnp.int32, (1, k.shape[0]), 1)[0]                 # (BK,)

    def body(qb, carry):
        dk, dv = carry
        q = q_ref[0, pl.ds(qb * _BLOCK_Q, _BLOCK_Q), :].astype(jnp.float32)
        do = do_ref[0, pl.ds(qb * _BLOCK_Q, _BLOCK_Q), :].astype(jnp.float32)
        lse = lse_ref[0, pl.ds(qb * _BLOCK_Q, _BLOCK_Q), :]   # (BQ, 1)
        dcap = dcap_ref[0, pl.ds(qb * _BLOCK_Q, _BLOCK_Q), :]
        s = jax.lax.dot_general(
            q, k, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * scale   # (BQ, BK)
        s = jnp.where(key_ids[None, :] < n_valid, s, _NEG_INF)
        # padded QUERY rows: _pad_to ZERO-pads lse, so exp(s - 0) is a
        # finite all-ones-ish P row — dV stays correct (dO is zero-padded)
        # but dS = P*(dP - D) would silently corrupt dK; zero P explicitly
        q_ids = qb * _BLOCK_Q + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, 0)
        p = jnp.where(q_ids < n_valid, jnp.exp(s - lse), 0.0)  # (BQ, BK)
        dv_new = dv + jax.lax.dot_general(
            p, do, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BK, d)
        dp = jax.lax.dot_general(
            do, v, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BQ, BK)
        ds = p * (dp - dcap)
        dk_new = dk + jax.lax.dot_general(
            ds, q, dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (BK, d)
        return dk_new, dv_new

    dk0 = jnp.zeros(k.shape, jnp.float32)
    dv0 = jnp.zeros(v.shape, jnp.float32)
    dk, dv = jax.lax.fori_loop(0, num_qb, body, (dk0, dv0))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


_SHORT_MAX = 512  # n_pad up to this: single-block kernels (s fits VMEM)


def _short_group(nbh: int, n_pad: int, budget_bytes: int) -> int:
    """Batch·heads per short-N program: the largest divisor of ``nbh``
    whose (G, Np, Np) f32 score slab fits ``budget_bytes`` of VMEM. TPU
    Pallas grids run sequentially, so more heads per program = fewer
    program launches AND fatter batched matmuls for the MXU."""
    for g in (16, 8, 4, 2):
        if nbh % g == 0 and g * n_pad * n_pad * 4 <= budget_bytes:
            return g
    return 1


def _short_attn_kernel(q_ref, k_ref, v_ref, out_ref, lse_ref, *,
                       n_valid: int, scale: float):
    """Short-N forward: one program per GROUP of G batch·heads — the whole
    (G, Np, d) slab sits in VMEM, scores stay in registers/VMEM, softmax is
    plain (no streaming recurrence). The ViT backbones live here (N = 197
    at 224 px): the XLA path materialises ~240 MB of f32 scores per layer
    in HBM (capped the attention half at 24% MFU, VERDICT r4 item 4), and
    a one-program-per-head kernel is grid-overhead-bound (TPU Pallas grids
    run SEQUENTIALLY — B·T·H ≈ 18k tiny programs measured SLOWER than XLA;
    docs/performance.md r5). Batched in-kernel dot_generals over G heads
    keep the MXU fed with far fewer programs."""
    q = q_ref[...].astype(jnp.float32) * scale            # (G, Np, d)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (G, Np, Np)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(key_ids < n_valid, s, _NEG_INF)
    m = jnp.max(s, axis=2, keepdims=True)                 # (G, Np, 1)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=2, keepdims=True)
    acc = jax.lax.dot_general(
        p, v, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (G, Np, d)
    out_ref[...] = (acc / jnp.maximum(l, 1e-30)).astype(out_ref.dtype)
    lse_ref[...] = m + jnp.log(jnp.maximum(l, 1e-30))


def _short_bwd_kernel(q_ref, k_ref, v_ref, do_ref, lse_ref, dcap_ref,
                      dq_ref, dk_ref, dv_ref, *, n_valid: int, scale: float):
    """Short-N backward: dQ, dK and dV in ONE program per group of G
    batch·heads — S and P are recomputed once (the streaming scheme
    recomputes them twice, once in each of its two kernels)."""
    q = q_ref[...].astype(jnp.float32)                    # (G, Np, d)
    k = k_ref[...].astype(jnp.float32)
    v = v_ref[...].astype(jnp.float32)
    do = do_ref[...].astype(jnp.float32)
    lse = lse_ref[...]                                    # (G, Np, 1)
    dcap = dcap_ref[...]
    s = jax.lax.dot_general(
        q, k, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32) * scale       # (G, Np, Np)
    key_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 2)
    s = jnp.where(key_ids < n_valid, s, _NEG_INF)
    # padded query rows carry lse = 0 (zero-pad): exp(s) would be finite
    # there and corrupt dK/dV — zero P on those rows (dO is zero-padded,
    # so dV would survive, but dS = P*(dP − D) would not)
    q_ids = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(q_ids < n_valid, jnp.exp(s - lse), 0.0)  # (G, Np, Np)
    dv = jax.lax.dot_general(
        p, do, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (G, Np, d)
    dp = jax.lax.dot_general(
        do, v, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (G, Np, Np)
    ds = p * (dp - dcap)
    dq = jax.lax.dot_general(
        ds, k, dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)
    dk = jax.lax.dot_general(
        ds, q, dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)               # (G, Np, d)
    dq_ref[...] = (dq * scale).astype(dq_ref.dtype)
    dk_ref[...] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[...] = dv.astype(dv_ref.dtype)


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

    Differentiable with streaming Pallas backward kernels (FlashAttention-2
    scheme): gradients are exact softmax-attention gradients and nothing
    (N, N)-shaped is ever materialised in HBM, forward or backward. Round 3
    shipped the kernel without any VJP, which made every long-clip
    (N ≥ 256) TRAINING step on TPU fail at trace time — CPU tests never
    hit the TPU-gated branch.
    """
    return _flash(q, k, v, interpret)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _flash(q, k, v, interpret):
    out, _ = _flash_impl(q, k, v, interpret)
    return out


def _flash_fwd(q, k, v, interpret):
    out, lse = _flash_impl(q, k, v, interpret)
    return out, (q, k, v, out, lse)


def _flash_bwd(interpret, res, g):
    q, k, v, out, lse = res
    B, H, N, d = q.shape
    scale = 1.0 / math.sqrt(d)
    # D = rowsum(dO ⊙ O), the FlashAttention-2 correction term
    dcap = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                   axis=-1)                                # (B, H, N)

    qf = _pad_to(q.reshape(B * H, N, d), 1, _BLOCK_Q)
    kf = _pad_to(k.reshape(B * H, N, d), 1, _BLOCK_K)
    vf = _pad_to(v.reshape(B * H, N, d), 1, _BLOCK_K)
    gf = _pad_to(g.reshape(B * H, N, d), 1, _BLOCK_Q)
    lsef = _pad_to(lse.reshape(B * H, N, 1), 1, _BLOCK_Q)
    dcapf = _pad_to(dcap.reshape(B * H, N, 1), 1, _BLOCK_Q)
    n_q_pad, n_k_pad = qf.shape[1], kf.shape[1]

    if n_q_pad <= _SHORT_MAX:
        G = _short_group(B * H, n_q_pad, budget_bytes=1024 * 1024)
        full = lambda shape: pl.BlockSpec(shape, lambda b: (b, 0, 0),
                                          memory_space=pltpu.VMEM)
        dq, dk, dv = pl.pallas_call(
            functools.partial(_short_bwd_kernel, n_valid=N, scale=scale),
            out_shape=[jax.ShapeDtypeStruct((B * H, n_q_pad, d), q.dtype),
                       jax.ShapeDtypeStruct((B * H, n_k_pad, d), k.dtype),
                       jax.ShapeDtypeStruct((B * H, n_k_pad, d), v.dtype)],
            grid=(B * H // G,),
            in_specs=[full((G, n_q_pad, d)), full((G, n_k_pad, d)),
                      full((G, n_k_pad, d)), full((G, n_q_pad, d)),
                      full((G, n_q_pad, 1)), full((G, n_q_pad, 1))],
            out_specs=[full((G, n_q_pad, d)), full((G, n_k_pad, d)),
                       full((G, n_k_pad, d))],
            interpret=interpret,
        )(qf, kf, vf, gf, lsef, dcapf)
        return (dq[:, :N].reshape(B, H, N, d),
                dk[:, :N].reshape(B, H, N, d),
                dv[:, :N].reshape(B, H, N, d))

    full_q = pl.BlockSpec((1, n_q_pad, d), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    full_q1 = pl.BlockSpec((1, n_q_pad, 1), lambda b, i: (b, 0, 0),
                           memory_space=pltpu.VMEM)
    full_k = pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    blk_q = pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)
    blk_q1 = pl.BlockSpec((1, _BLOCK_Q, 1), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    blk_k = pl.BlockSpec((1, _BLOCK_K, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, n_valid=N, scale=scale),
        out_shape=jax.ShapeDtypeStruct((B * H, n_q_pad, d), q.dtype),
        grid=(B * H, n_q_pad // _BLOCK_Q),
        in_specs=[blk_q, full_k, full_k, blk_q, blk_q1, blk_q1],
        out_specs=blk_q,
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, dcapf)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, n_valid=N, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((B * H, n_k_pad, d), k.dtype),
                   jax.ShapeDtypeStruct((B * H, n_k_pad, d), v.dtype)],
        grid=(B * H, n_k_pad // _BLOCK_K),
        in_specs=[full_q, blk_k, blk_k, full_q, full_q1, full_q1],
        out_specs=[blk_k, blk_k],
        interpret=interpret,
    )(qf, kf, vf, gf, lsef, dcapf)

    dq = dq[:, :N].reshape(B, H, N, d)
    dk = dk[:, :N].reshape(B, H, N, d)
    dv = dv[:, :N].reshape(B, H, N, d)
    return dq, dk, dv


_flash.defvjp(_flash_fwd, _flash_bwd)


def _flash_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                interpret: bool = False):
    B, H, N, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qf = _pad_to(q.reshape(B * H, N, d), 1, _BLOCK_Q)
    kf = _pad_to(k.reshape(B * H, N, d), 1, _BLOCK_K)
    vf = _pad_to(v.reshape(B * H, N, d), 1, _BLOCK_K)
    n_q_pad = qf.shape[1]
    n_k_pad = kf.shape[1]

    if n_q_pad <= _SHORT_MAX:
        G = _short_group(B * H, n_q_pad, budget_bytes=2 * 1024 * 1024)
        full = lambda shape: pl.BlockSpec(shape, lambda b: (b, 0, 0),
                                          memory_space=pltpu.VMEM)
        out, lse = pl.pallas_call(
            functools.partial(_short_attn_kernel, n_valid=N, scale=scale),
            out_shape=[jax.ShapeDtypeStruct((B * H, n_q_pad, d), q.dtype),
                       jax.ShapeDtypeStruct((B * H, n_q_pad, 1),
                                            jnp.float32)],
            grid=(B * H // G,),
            in_specs=[full((G, n_q_pad, d)), full((G, n_k_pad, d)),
                      full((G, n_k_pad, d))],
            out_specs=[full((G, n_q_pad, d)), full((G, n_q_pad, 1))],
            interpret=interpret,
        )(qf, kf, vf)
        return (out[:, :N].reshape(B, H, N, d),
                lse[:, :N].reshape(B, H, N, 1))

    out, lse = pl.pallas_call(
        functools.partial(_attn_kernel, n_valid=N, scale=scale),
        out_shape=[jax.ShapeDtypeStruct((B * H, n_q_pad, d), q.dtype),
                   jax.ShapeDtypeStruct((B * H, n_q_pad, 1), jnp.float32)],
        grid=(B * H, n_q_pad // _BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n_k_pad, d), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _BLOCK_Q, d), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N].reshape(B, H, N, d), lse[:, :N].reshape(B, H, N, 1)
