"""Pallas kernel tests (CPU via the Pallas interpreter; numerics checked
against plain-XLA references)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
from deepfake_video_detection_tpu.ops.attention import flash_attention
from deepfake_video_detection_tpu.ops.preprocess import fused_normalize


def _reference_attention(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum("bhnd,bhmd->bhnm", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))


def test_fused_normalize_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.integers(0, 256, (2, 2, 32, 32, 3)).astype(np.uint8)  # 128-tileable
    out = np.asarray(fused_normalize(jnp.asarray(x), out_dtype=jnp.float32,
                                     interpret=True))
    ref = np.asarray(imagenet_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_normalize_fallback_odd_shape():
    # 5×5×3 = 75 elements — not 128-tileable → XLA fallback path
    x = np.full((1, 5, 5, 3), 128, np.uint8)
    out = np.asarray(fused_normalize(jnp.asarray(x), out_dtype=jnp.float32))
    ref = np.asarray(imagenet_normalize(jnp.asarray(x)))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_fused_normalize_bf16_output():
    x = np.random.default_rng(1).integers(0, 256, (1, 32, 32, 3)).astype(np.uint8)
    out = fused_normalize(jnp.asarray(x), interpret=True)
    assert out.dtype == jnp.bfloat16


@pytest.mark.parametrize("n", [64, 128, 200, 384, 640])
def test_flash_attention_matches_reference(n):
    """n <= 512 exercises the single-block short-N kernel (r5 — the ViT
    shapes), n = 640 the streaming flash recurrence."""
    rng = np.random.default_rng(0)
    B, H, d = 2, 3, 64
    q = jnp.asarray(rng.normal(size=(B, H, n, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, n, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, n, d)), jnp.float32)
    out = flash_attention(q, k, v, interpret=True)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_flash_attention_long_sequence_padding():
    """Odd N exercises the padded-key masking path."""
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(1, 1, 130, 32)), jnp.float32)
    out = flash_attention(q, q, q, interpret=True)
    ref = _reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)
    assert out.shape == (1, 1, 130, 32)


def test_ring_attention_matches_reference():
    """Exact attention with the sequence sharded over a 4-way ring (the
    remaining 2 mesh devices carry data-parallel batch)."""
    from jax.sharding import Mesh
    from deepfake_video_detection_tpu.ops.ring_attention import ring_attention

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    rng = np.random.default_rng(0)
    B, H, N, d = 2, 2, 64, 16  # N=64 → 16 per ring member
    q = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    out = jax.jit(lambda q, k, v: ring_attention(q, k, v, mesh))(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ring_attention_single_device_ring():
    """ring size 1 degenerates to plain attention (no permute steps)."""
    from jax.sharding import Mesh
    from deepfake_video_detection_tpu.ops.ring_attention import ring_attention

    devices = np.array(jax.devices()[:8]).reshape(8, 1)
    mesh = Mesh(devices, axis_names=("data", "model"))
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.normal(size=(8, 1, 8, 8)), jnp.float32)
    out = ring_attention(q, q, q, mesh)
    ref = _reference_attention(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ulysses_attention_matches_reference():
    """Ulysses SP (all-to-all to head-sharded layout, ops/ulysses_attention.py)
    must be exact like the ring: same contract, different collective."""
    from jax.sharding import Mesh
    from deepfake_video_detection_tpu.ops.ulysses_attention import (
        ulysses_attention)

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    rng = np.random.default_rng(2)
    B, H, N, d = 2, 4, 64, 16  # H=4 divides the 4-way seq degree
    q = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(B, H, N, d)), jnp.float32)
    out = jax.jit(lambda q, k, v: ulysses_attention(q, k, v, mesh))(q, k, v)
    ref = _reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ulysses_attention_rejects_indivisible_heads():
    from jax.sharding import Mesh
    from deepfake_video_detection_tpu.ops.ulysses_attention import (
        ulysses_attention)

    devices = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devices, axis_names=("data", "model"))
    q = jnp.zeros((2, 2, 64, 16), jnp.float32)  # H=2 not divisible by 4
    with pytest.raises(ValueError, match="divisible"):
        ulysses_attention(q, q, q, mesh)


def test_flash_attention_grad_matches_reference():
    """r4 regression: the Pallas flash kernel carries a custom_vjp (exact
    softmax-attention gradients via XLA recompute) — round 3 shipped it
    without one and every long-clip TRAINING step on TPU died at trace
    time (`Linearization failed`), invisible to the CPU suite because the
    flash branch is TPU-gated."""
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.ops.attention import flash_attention

    B, H, N, d = 1, 2, 160, 32
    rng = np.random.default_rng(7)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
               for _ in range(3))
    run_flash_grad_check(q, k, v, d)


def test_flash_attention_grad_streaming_matches_reference():
    """N > 512: the streaming two-kernel FlashAttention-2 backward (the
    short-N single-program backward is covered above at N = 160)."""
    B, H, N, d = 1, 1, 640, 32
    rng = np.random.default_rng(8)
    q, k, v = (jnp.asarray(rng.standard_normal((B, H, N, d)), jnp.float32)
               for _ in range(3))
    run_flash_grad_check(q, k, v, d)


def run_flash_grad_check(q, k, v, d):

    def ref(q, k, v):
        s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / jnp.sqrt(1.0 * d)
        return jnp.einsum("bhnm,bhmd->bhnd", jax.nn.softmax(s, -1), v)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, interpret=True) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(ref(q, k, v) ** 2)

    g1 = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)
