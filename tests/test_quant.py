"""Int8 weight-only quantized serving (nn/quant.py + QUANTIZE=int8).

Beyond reference parity: the reference serves f32 torch weights unmodified;
here matmul/conv weights can be held at rest as int8 + per-output-channel
scales with the dequant fused into the forward (docs/serving.md)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import layers as L
from deepfake_video_detection_tpu.nn.quant import (
    Int8Weight, dequantize_tree, quantize_tree, quantize_variables,
    quantize_weight, quantized_bytes)


def _randw(rng, shape, scale=0.05):
    return jnp.asarray(rng.normal(0, scale, shape).astype(np.float32))


def test_quantize_weight_error_bound_and_scales():
    """Per-element |w - deq| <= scale/2 (symmetric rounding), scales are
    per-OUTPUT-channel: axis 0 for (out, in) linears, axis 3 for HWIO."""
    rng = np.random.default_rng(0)
    for shape, axis in [((64, 32), 0), ((3, 3, 8, 16), 3)]:
        w = _randw(rng, shape)
        qw = quantize_weight(w)
        assert qw.q.dtype == jnp.int8 and qw.q.shape == shape
        assert qw.scale.shape[axis] == shape[axis]
        assert qw.scale.size == shape[axis]  # 1 everywhere else
        deq = qw.astype(jnp.float32)
        assert bool(jnp.all(jnp.abs(w - deq) <= qw.scale / 2 + 1e-8))
        # scales really are per-channel maxima / 127
        amax = jnp.max(jnp.abs(w), axis=tuple(i for i in range(w.ndim)
                                              if i != axis))
        np.testing.assert_allclose(np.asarray(qw.scale).ravel(),
                                   np.asarray(amax) / 127.0, rtol=1e-6)


def test_zero_channel_is_safe():
    w = jnp.zeros((8, 16), jnp.float32)
    qw = quantize_weight(w)
    assert bool(jnp.all(qw.astype(jnp.float32) == 0.0))
    assert bool(jnp.all(jnp.isfinite(qw.scale)))


def test_quantize_tree_selects_only_big_matmul_weights():
    rng = np.random.default_rng(1)
    tree = {
        "fc": {"weight": _randw(rng, (128, 64)), "bias": _randw(rng, (128,))},
        "conv": {"weight": _randw(rng, (3, 3, 16, 32))},
        "bn": {"weight": _randw(rng, (32,)), "bias": _randw(rng, (32,))},
        "tiny": {"weight": _randw(rng, (2, 2))},
        "ens": {"weights": _randw(rng, (3,))},  # ensemble mix coeffs: not a matmul
    }
    qt, n = quantize_tree(tree, min_elems=1024)
    assert n == 2
    assert isinstance(qt["fc"]["weight"], Int8Weight)
    assert isinstance(qt["conv"]["weight"], Int8Weight)
    for k in ("bn", "tiny", "ens"):
        assert not any(isinstance(v, Int8Weight) for v in qt[k].values())
    # dequantize restores plain f32 arrays everywhere
    back = dequantize_tree(qt)
    assert back["fc"]["weight"].dtype == jnp.float32
    assert not isinstance(back["fc"]["weight"], Int8Weight)
    # at-rest bytes: int8 q + f32 scales vs all-f32
    now, f32 = quantized_bytes({"w": qt["fc"]["weight"]})
    assert now < 0.3 * f32


def test_layers_consume_quantized_leaves_under_jit():
    """linear / conv2d work UNCHANGED on Int8Weight leaves (the node's
    astype dequantizes), inside and outside jit, in bf16 and f32."""
    rng = np.random.default_rng(2)
    p = {"weight": _randw(rng, (96, 48)), "bias": _randw(rng, (96,), 0.01)}
    qp, _ = quantize_tree(p, min_elems=1)
    x = _randw(rng, (4, 48), 1.0)
    y_ref = L.linear(p, x)
    for dtype in (jnp.float32, jnp.bfloat16):
        y_q = jax.jit(lambda p, x: L.linear(p, x))(qp, x.astype(dtype))
        rel = float(jnp.max(jnp.abs(y_ref - y_q.astype(jnp.float32)))
                    / jnp.max(jnp.abs(y_ref)))
        assert rel < (0.02 if dtype == jnp.float32 else 0.05), rel

    pc = {"weight": _randw(rng, (3, 3, 8, 16))}
    qc, _ = quantize_tree(pc, min_elems=1)
    xc = _randw(rng, (2, 10, 10, 8), 1.0)
    y0 = L.conv2d(pc, xc, padding=1)
    y1 = jax.jit(lambda p, x: L.conv2d(p, x, padding=1))(qc, xc)
    rel = float(jnp.max(jnp.abs(y0 - y1)) / jnp.max(jnp.abs(y0)))
    assert rel < 0.02, rel


def test_backbone_detector_quantized_forward_close():
    """Full detector forward: quantized probs track f32 probs closely on a
    real (randomly initialised) model."""
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)

    model = BackboneDetector("resnet18")
    v = model.init(jax.random.PRNGKey(0))
    vq, n = quantize_variables(v)
    assert n > 10  # every conv + fc layer
    x = jnp.asarray(np.random.default_rng(3).normal(
        0, 1, (2, 3, 64, 64, 3)).astype(np.float32))
    (logits, scores), _ = model.apply(v, x, train=False)
    (logits_q, scores_q), _ = jax.jit(
        lambda v: model.apply(v, x, train=False))(vq)
    p0 = jax.nn.softmax(logits, -1)
    p1 = jax.nn.softmax(logits_q, -1)
    assert float(jnp.max(jnp.abs(p0 - p1))) < 0.05
    assert float(jnp.max(jnp.abs(scores - scores_q))) < 0.05


def test_homogeneous_ensemble_stacks_quantized_trees():
    """The vmap-stacked homogeneous-ensemble path tree-stacks member params;
    Int8Weight is a pytree node so q/scales stack member-wise."""
    from deepfake_video_detection_tpu.models.backbone_detector import (
        EnsembleDetector)

    model = EnsembleDetector(("resnet18", "resnet18"))
    v = model.init(jax.random.PRNGKey(0))
    vq, _ = quantize_variables(v)
    x = jnp.asarray(np.random.default_rng(4).normal(
        0, 1, (2, 2, 64, 64, 3)).astype(np.float32))
    (l0, s0), _ = model.apply(v, x, train=False)
    (l1, s1), _ = model.apply(vq, x, train=False)
    assert float(jnp.max(jnp.abs(jax.nn.softmax(l0, -1)
                                 - jax.nn.softmax(l1, -1)))) < 0.05


def test_loader_quantize_env(tmp_path, monkeypatch):
    """QUANTIZE=int8 quantizes post-load for any checkpoint format; stats
    record the count; unknown values warn + disable."""
    from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)
    from deepfake_video_detection_tpu.serve import loader

    model = BackboneDetector("resnet18")
    v = model.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "checkpoint_best.npz")
    save_checkpoint(path, v, meta={"model_config": {
        "model_type": "pretrained", "backbone": "resnet18"}})

    monkeypatch.setenv("QUANTIZE", "int8")
    m_q, v_q, stats = loader.load_model(path)
    assert stats["quantized_weights"] > 10
    leaves = jax.tree_util.tree_leaves(
        v_q["params"], is_leaf=lambda x: isinstance(x, Int8Weight))
    assert any(isinstance(leaf, Int8Weight) for leaf in leaves)

    # quantized serving forward ≈ unquantized
    monkeypatch.setenv("QUANTIZE", "none")
    m0, v0, stats0 = loader.load_model(path)
    assert stats0["quantized_weights"] == 0
    x = jnp.asarray(np.random.default_rng(5).normal(
        0, 1, (1, 2, 64, 64, 3)).astype(np.float32))
    (l0, _), _ = m0.apply(v0, x, train=False)
    (l1, _), _ = m_q.apply(v_q, x, train=False)
    assert float(jnp.max(jnp.abs(jax.nn.softmax(l0, -1)
                                 - jax.nn.softmax(l1, -1)))) < 0.05

    monkeypatch.setenv("QUANTIZE", "int4")  # unsupported → off, not crash
    _, v_bad, stats_bad = loader.load_model(path)
    assert stats_bad["quantized_weights"] == 0
