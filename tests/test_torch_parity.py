"""Numerics parity vs stateless torch re-executions of the same weights
(beyond the EfficientNet check in test_models.py): ResNet-18/50 and the
Vision Transformer. These pin the conv padding/stride conventions, BN eval
semantics, attention math, and the OIHW↔HWIO bridge."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from deepfake_video_detection_tpu.checkpoint import export_to_torch_state_dict
from deepfake_video_detection_tpu.models.resnet import ResNet
from deepfake_video_detection_tpu.models.vit import VisionTransformer


def _t(sd, k):
    # copy: jax host buffers are read-only and torch.from_numpy warns on them
    return torch.from_numpy(np.array(sd[k]))


def _bn(sd, prefix, x):
    return F.batch_norm(x, _t(sd, f"{prefix}.running_mean"),
                        _t(sd, f"{prefix}.running_var"),
                        _t(sd, f"{prefix}.weight"), _t(sd, f"{prefix}.bias"),
                        training=False, eps=1e-5)


def _torch_resnet(model: ResNet, sd, x_nchw):
    x = torch.from_numpy(x_nchw)
    x = F.relu(_bn(sd, "bn1", F.conv2d(x, _t(sd, "conv1.weight"),
                                       stride=2, padding=3)))
    x = F.max_pool2d(x, 3, 2, 1)
    for li, n_blocks in enumerate(model.stage_sizes):
        for bi in range(n_blocks):
            p = f"layer{li + 1}.{bi}"
            stride = 2 if (li > 0 and bi == 0) else 1
            identity = x
            if model.block_type == "basic":
                y = F.relu(_bn(sd, f"{p}.bn1",
                               F.conv2d(x, _t(sd, f"{p}.conv1.weight"),
                                        stride=stride, padding=1)))
                y = _bn(sd, f"{p}.bn2",
                        F.conv2d(y, _t(sd, f"{p}.conv2.weight"), padding=1))
            else:
                y = F.relu(_bn(sd, f"{p}.bn1",
                               F.conv2d(x, _t(sd, f"{p}.conv1.weight"))))
                y = F.relu(_bn(sd, f"{p}.bn2",
                               F.conv2d(y, _t(sd, f"{p}.conv2.weight"),
                                        stride=stride, padding=1)))
                y = _bn(sd, f"{p}.bn3",
                        F.conv2d(y, _t(sd, f"{p}.conv3.weight")))
            if f"{p}.downsample.0.weight" in sd:
                identity = _bn(sd, f"{p}.downsample.1",
                               F.conv2d(x, _t(sd, f"{p}.downsample.0.weight"),
                                        stride=stride))
            x = F.relu(y + identity)
    return x.mean(dim=(2, 3))


@pytest.mark.parametrize("variant", ["resnet18", "resnet50"])
def test_resnet_matches_torch(variant):
    model = ResNet(variant=variant, num_classes=0)
    # random BN stats so eval-mode normalisation is actually exercised
    variables = model.init(jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)
    variables["state"] = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype)
        if a.ndim else a, variables["state"])
    sd = export_to_torch_state_dict(variables)

    x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
    ours, _ = jax.jit(lambda v, x: model.apply(v, x))(variables, jnp.asarray(x))
    theirs = _torch_resnet(model, sd, np.transpose(x, (0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=2e-4)


def _torch_vit(model: VisionTransformer, sd, x_nchw):
    x = torch.from_numpy(x_nchw)
    B = x.shape[0]
    D = model.embed_dim
    y = F.conv2d(x, _t(sd, "patch_embed.proj.weight"),
                 _t(sd, "patch_embed.proj.bias"), stride=model.patch_size)
    y = y.flatten(2).transpose(1, 2)                       # (B, N, D)
    cls = _t(sd, "cls_token").expand(B, -1, -1)
    y = torch.cat([cls, y], dim=1) + _t(sd, "pos_embed")
    nh = model.num_heads
    for i in range(model.depth):
        p = f"blocks.{i}"
        h = F.layer_norm(y, (D,), _t(sd, f"{p}.norm1.weight"),
                         _t(sd, f"{p}.norm1.bias"), eps=1e-6)
        qkv = F.linear(h, _t(sd, f"{p}.attn.qkv.weight"),
                       _t(sd, f"{p}.attn.qkv.bias"))
        q, k, v = qkv.reshape(B, -1, 3, nh, D // nh).permute(2, 0, 3, 1, 4)
        attn = F.scaled_dot_product_attention(q, k, v)
        attn = attn.transpose(1, 2).reshape(B, -1, D)
        y = y + F.linear(attn, _t(sd, f"{p}.attn.proj.weight"),
                         _t(sd, f"{p}.attn.proj.bias"))
        h = F.layer_norm(y, (D,), _t(sd, f"{p}.norm2.weight"),
                         _t(sd, f"{p}.norm2.bias"), eps=1e-6)
        h = F.gelu(F.linear(h, _t(sd, f"{p}.mlp.fc1.weight"),
                            _t(sd, f"{p}.mlp.fc1.bias")))
        y = y + F.linear(h, _t(sd, f"{p}.mlp.fc2.weight"),
                         _t(sd, f"{p}.mlp.fc2.bias"))
    y = F.layer_norm(y, (D,), _t(sd, "norm.weight"), _t(sd, "norm.bias"),
                     eps=1e-6)
    return y[:, 0].numpy()


def test_vit_matches_torch():
    model = VisionTransformer(variant="vit_tiny_patch16_224", img_size=32)
    variables = model.init(jax.random.PRNGKey(1))
    sd = export_to_torch_state_dict(variables)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    ours, _ = jax.jit(lambda v, x: model.apply(v, x))(variables, jnp.asarray(x))
    with torch.no_grad():
        theirs = _torch_vit(model, sd, np.transpose(x, (0, 3, 1, 2)))
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=2e-4, rtol=2e-3)


def _torch_full_detector(sd, x_bt_nchw, B, T, F_dim):
    """Stateless torch re-execution of the COMPLETE BackboneDetector:
    EfficientNet-B0 backbone (reused from test_models) + temporal attention
    MLP + fc head (≙ src/pretrained_detector.py:103-143)."""
    from test_models import _torch_effnet_forward

    from deepfake_video_detection_tpu.models.efficientnet import EfficientNet

    bb_sd = {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}
    feats = _torch_effnet_forward(EfficientNet(variant="b0", num_classes=0),
                                  bb_sd, x_bt_nchw)           # (B*T, F)
    feats = torch.as_tensor(np.asarray(feats)).reshape(B, T, F_dim)
    a = F.relu(F.linear(feats, _t(sd, "temporal_attention.0.weight"),
                        _t(sd, "temporal_attention.0.bias")))
    a = torch.sigmoid(F.linear(a, _t(sd, "temporal_attention.2.weight"),
                               _t(sd, "temporal_attention.2.bias")))[..., 0]
    attn = torch.softmax(a, dim=1)                            # (B, T)
    pooled = (feats * attn[..., None]).sum(dim=1)             # (B, F)
    h = F.relu(F.linear(pooled, _t(sd, "fc1.weight"), _t(sd, "fc1.bias")))
    logits = F.linear(h, _t(sd, "fc2.weight"), _t(sd, "fc2.bias"))
    return logits.numpy(), attn.numpy()


def test_full_detector_matches_torch_through_serve_loader(tmp_path):
    """AUC-parity anchor (VERDICT r1 item 6): the complete flagship detector
    (backbone + temporal attention + head), exported to a reference-layout
    .pt, re-executed stateless in torch, AND loaded back through the serving
    loader — all three must produce the same logits on the same frames
    (≙ src/pretrained_detector.py:103-143 + app.py:1327-1769)."""
    from deepfake_video_detection_tpu.checkpoint.store import (
        save_torch_checkpoint)
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)
    from deepfake_video_detection_tpu.serve import loader as loader_mod

    model = BackboneDetector("efficientnet_b0")
    variables = model.init(jax.random.PRNGKey(3))
    # random BN stats so eval-mode normalisation is actually exercised
    rng = np.random.default_rng(3)
    variables["state"] = jax.tree_util.tree_map(
        lambda a: jnp.asarray(rng.uniform(0.5, 1.5, a.shape), a.dtype)
        if a.ndim else a, variables["state"])

    B, T, S = 2, 3, 64
    x = rng.normal(size=(B, T, S, S, 3)).astype(np.float32)

    (logits_j, scores_j), _ = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(variables, jnp.asarray(x))

    sd = export_to_torch_state_dict(variables)
    with torch.no_grad():
        logits_t, attn_t = _torch_full_detector(
            sd, np.transpose(x.reshape(B * T, S, S, 3), (0, 3, 1, 2)),
            B, T, model.feature_dim)
    np.testing.assert_allclose(np.asarray(logits_j), logits_t,
                               atol=5e-4, rtol=5e-4)
    np.testing.assert_allclose(np.asarray(scores_j), attn_t,
                               atol=5e-5, rtol=5e-4)

    # .pt → serving loader → identical logits (the predict_video model path)
    pt = str(tmp_path / "checkpoint_best_efficientnet_b0.pt")
    save_torch_checkpoint(pt, variables, layout="model_config",
                          meta={"model_config": {
                              "model_type": "pretrained",
                              "backbone": "efficientnet_b0"}})
    lmodel, lvars, stats = loader_mod.load_model(pt, "pretrained")
    assert stats["match_ratio"] >= 0.99, stats
    (logits_l, _), _ = jax.jit(
        lambda v, x: lmodel.apply(v, x, train=False))(lvars, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(logits_l), logits_t,
                               atol=5e-4, rtol=5e-4)


def test_timm_b0_full_manifest_imports_at_ratio_1():
    """VERDICT r4 item 5: the exact timm `efficientnet_b0` detector key
    manifest (keys + shapes incl. BN `num_batches_tracked` aux keys,
    Sequential-wrapped backbone numbering, reference head naming —
    tests/fixtures/timm_efficientnet_b0_detector_manifest.json, generated
    by tools/make_timm_b0_manifest.py INDEPENDENTLY of our model code)
    must flow through the bridge with match_ratio 1.0 and ZERO unexpected
    keys: every template leaf filled, every manifest tensor consumed."""
    import json
    import os

    from deepfake_video_detection_tpu.checkpoint.torch_bridge import (
        canonicalize_detector_keys, import_into_variables)
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)

    path = os.path.join(os.path.dirname(__file__), "fixtures",
                        "timm_efficientnet_b0_detector_manifest.json")
    with open(path) as f:
        manifest = json.load(f)
    assert len(manifest) == 366  # pin the manifest itself against edits

    rng = np.random.default_rng(0)
    sd = {k: rng.normal(size=shape).astype(np.float32)
          for k, shape in manifest.items()}
    canon = canonicalize_detector_keys(sd, "efficientnet_b0")

    model = BackboneDetector("efficientnet_b0")
    template = model.init(jax.random.PRNGKey(0))
    variables, report = import_into_variables(canon, template)

    assert report["missing"] == [], report["missing"][:10]
    assert report["shape_mismatch"] == [], report["shape_mismatch"][:10]
    assert report["unexpected"] == [], report["unexpected"][:10]
    assert report["match_ratio"] == 1.0

    # and the imported tree must actually run
    (logits, scores), _ = jax.jit(
        lambda v, x: model.apply(v, x, train=False))(
        variables, jnp.zeros((1, 2, 64, 64, 3), jnp.float32))
    assert logits.shape == (1, 2) and scores.shape == (1, 2)
