"""Model-family tests: shapes, jit-compilability, and EfficientNet numerics
cross-checked against a stateless torch re-execution of the same weights
(the bridge's export path provides the torch-layout tensors)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.models import (
    BackboneDetector,
    CNNLSTMHybrid,
    EfficientNet,
    EnsembleDetector,
    FrameGraphDetector,
    LogicRNNLSTM,
    ResNet,
    VisionTransformer,
)
from deepfake_video_detection_tpu.checkpoint import export_to_torch_state_dict
from deepfake_video_detection_tpu.utils import normalize_adjacency, chain_adjacency


# ---------------------------------------------------------------------------
# torch functional re-execution of EfficientNet for numerics validation
# ---------------------------------------------------------------------------

def _torch_effnet_forward(model: EfficientNet, sd: dict, x_nchw):
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}

    def bn(prefix, x, eps=1e-5):
        return F.batch_norm(x, t[f"{prefix}.running_mean"], t[f"{prefix}.running_var"],
                            t[f"{prefix}.weight"], t[f"{prefix}.bias"],
                            training=False, eps=eps)

    def se(prefix, x):
        s = x.mean(dim=(2, 3), keepdim=True)
        s = F.silu(F.conv2d(s, t[f"{prefix}.conv_reduce.weight"], t[f"{prefix}.conv_reduce.bias"]))
        s = torch.sigmoid(F.conv2d(s, t[f"{prefix}.conv_expand.weight"], t[f"{prefix}.conv_expand.bias"]))
        return x * s

    x = torch.from_numpy(x_nchw)
    x = F.silu(bn("bn1", F.conv2d(x, t["conv_stem.weight"], stride=2, padding=1)))
    for si, stage in enumerate(model.stages):
        for bi, spec in enumerate(stage):
            p = f"blocks.{si}.{bi}"
            pad = spec.kernel // 2
            sc = x
            if spec.kind == "ds":
                y = F.conv2d(x, t[f"{p}.conv_dw.weight"], stride=spec.stride,
                             padding=pad, groups=spec.in_ch)
                y = F.silu(bn(f"{p}.bn1", y))
                y = se(f"{p}.se", y)
                y = bn(f"{p}.bn2", F.conv2d(y, t[f"{p}.conv_pw.weight"]))
            else:
                mid = spec.in_ch * spec.expand
                y = F.silu(bn(f"{p}.bn1", F.conv2d(x, t[f"{p}.conv_pw.weight"])))
                y = F.conv2d(y, t[f"{p}.conv_dw.weight"], stride=spec.stride,
                             padding=pad, groups=mid)
                y = F.silu(bn(f"{p}.bn2", y))
                y = se(f"{p}.se", y)
                y = bn(f"{p}.bn3", F.conv2d(y, t[f"{p}.conv_pwl.weight"]))
            if spec.stride == 1 and spec.in_ch == spec.out_ch:
                y = y + sc
            x = y
    x = F.silu(bn("bn2", F.conv2d(x, t["conv_head.weight"])))
    return x.mean(dim=(2, 3)).numpy()


def test_efficientnet_b0_matches_torch_reexecution():
    model = EfficientNet("b0")
    variables = model.init(jax.random.key(0))
    sd = export_to_torch_state_dict(variables)

    x = np.random.default_rng(1).standard_normal((2, 3, 96, 96)).astype(np.float32)
    ref = _torch_effnet_forward(model, sd, x)
    got, _ = model.apply(variables, jnp.asarray(np.transpose(x, (0, 2, 3, 1))))
    assert got.shape == (2, 1280)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-4)


def test_efficientnet_b0_feature_dim_and_state():
    model = EfficientNet("b0")
    v = model.init(jax.random.key(0))
    assert model.feature_dim == 1280
    # timm-compatible key layout spot checks
    assert "conv_stem" in v["params"] and "blocks" in v["params"]
    assert "conv_pwl" in v["params"]["blocks"]["1"]["0"]
    assert "running_mean" in v["state"]["bn1"]


@pytest.mark.parametrize("variant,dim", [("resnet18", 512), ("resnet50", 2048)])
def test_resnet_shapes(variant, dim):
    model = ResNet(variant)
    v = model.init(jax.random.key(0))
    x = jnp.zeros((2, 64, 64, 3))
    feats, ns = model.apply(v, x)
    assert feats.shape == (2, dim)
    assert "layer4" in v["params"]
    if variant == "resnet50":
        assert "conv3" in v["params"]["layer1"]["0"]
        assert "downsample" in v["params"]["layer1"]["0"]


def test_vit_shapes_and_tokens():
    model = VisionTransformer("vit_tiny_patch16_224", img_size=32, patch_size=16)
    v = model.init(jax.random.key(0))
    x = jnp.zeros((2, 32, 32, 3))
    feats, _ = model.apply(v, x)
    assert feats.shape == (2, 192)
    tokens, _ = model.apply(v, x, return_tokens=True)
    assert tokens.shape == (2, 4, 192)


def test_backbone_detector_forward_and_jit():
    det = BackboneDetector("resnet18")
    v = det.init(jax.random.key(0))
    x = jnp.zeros((2, 4, 64, 64, 3))

    @jax.jit
    def fwd(v, x):
        (logits, scores), _ = det.apply(v, x)
        return logits, scores

    logits, scores = fwd(v, x)
    assert logits.shape == (2, 2)
    assert scores.shape == (2, 4)
    np.testing.assert_allclose(np.asarray(scores).sum(axis=1), 1.0, rtol=1e-5)


def test_backbone_detector_trainable_mask():
    det = BackboneDetector("resnet18")
    v = det.init(jax.random.key(0))
    mask = det.trainable_mask(v, freeze_backbone=True, unfreeze_blocks=2)
    flat = jax.tree_util.tree_leaves(mask["backbone"])
    assert any(flat) and not all(flat)
    assert all(jax.tree_util.tree_leaves(mask["fc1"]))


@pytest.mark.parametrize("method", ["average", "weighted", "voting"])
def test_ensemble_detector(method):
    ens = EnsembleDetector(("resnet18", "resnet18"), ensemble_method=method)
    v = ens.init(jax.random.key(0))
    x = jnp.zeros((2, 3, 64, 64, 3))
    (logits, scores, member_logits), _ = ens.apply(v, x, return_member_logits=True)
    assert logits.shape == (2, 2)
    assert scores.shape == (2, 3)
    assert member_logits.shape == (2, 2, 2)
    if method == "weighted":
        assert v["params"]["weights"].shape == (2,)


def test_cnn_lstm_forward():
    model = CNNLSTMHybrid()
    v = model.init(jax.random.key(0))
    x = jnp.zeros((2, 5, 64, 64, 3))
    logits, ns = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    assert logits.shape == (2, 2)
    # param layout mirrors the reference Sequential indices
    assert "0" in v["params"]["cnn"] and "13" in v["params"]["cnn"]
    assert "weight_ih_l0" in v["params"]["lstm"]


def test_frame_graph_detector_forward():
    model = FrameGraphDetector(vit_out=192, vit_variant="vit_tiny_patch16_224", img_size=32)
    v = model.init(jax.random.key(0))
    B, N = 2, 4
    images = jnp.zeros((B, N, 32, 32, 3))
    A = normalize_adjacency(jnp.broadcast_to(jnp.asarray(chain_adjacency(N)), (B, N, N)))
    logits, _ = model.apply(v, images, A)
    assert logits.shape == (B, 2)


def test_frame_graph_detector_compute_dtype_reaches_all_backbones():
    """--bf16 must not be a silent no-op on any backbone flavor: the
    clip/dinov2 path goes through build_feature_extractor, which has to
    forward compute_dtype to the wrapped VisionTransformer."""
    for flavor in ("timm", "clip", "dinov2"):
        m = FrameGraphDetector(vit_out=192, vit_variant="vit_tiny_patch16_224",
                               img_size=32, backbone=flavor,
                               compute_dtype=jnp.bfloat16)
        assert m.vit.compute_dtype == jnp.bfloat16, flavor


def test_logic_rnn_forward_with_lengths():
    model = LogicRNNLSTM(input_size=32, hidden_size=16, num_layers=2)
    v = model.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).standard_normal((3, 6, 32)), jnp.float32)
    probs, _ = model.apply(v, x, lengths=jnp.asarray([6, 3, 1]))
    assert probs.shape == (3, 1)
    assert ((np.asarray(probs) >= 0) & (np.asarray(probs) <= 1)).all()
    preds = model.predict(v, x)
    assert set(np.unique(np.asarray(preds))) <= {0.0, 1.0}


def test_homogeneous_ensemble_vmap_matches_loop():
    """The vmapped homogeneous path must produce the same outputs as the
    per-member loop (checked by building a heterogeneous-looking twin)."""
    import jax.numpy as jnp

    ens = EnsembleDetector(("resnet18", "resnet18"))
    assert ens.homogeneous
    v = ens.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((1, 2, 32, 32, 3)),
                    jnp.float32)
    (lg_vmap, sc_vmap, member), _ = ens.apply(v, x, return_member_logits=True)

    # force the loop path on the same params
    ens.backbone_names = ("resnet18", "resnet18b")  # disables homogeneity
    (lg_loop, sc_loop, member_loop), _ = ens.apply(v, x,
                                                   return_member_logits=True)
    np.testing.assert_allclose(np.asarray(lg_vmap), np.asarray(lg_loop),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(member), np.asarray(member_loop),
                               rtol=2e-5, atol=2e-5)
