"""Tests for the GAN, ViT-GNN family, feature-extractor wrappers, LR finder,
progressive fine-tuning, and calibration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from deepfake_video_detection_tpu.models.vlm_gan import (
    Discriminator, Generator, TextProjector, adversarial_loss_d,
    adversarial_loss_g, load_gan_checkpoint, make_gan_steps,
    save_gan_checkpoint)
from deepfake_video_detection_tpu.models.vit_gnn import (
    FallbackModel, SimpleGNN, ViTGNNModel, make_fully_connected_edge_index)
from deepfake_video_detection_tpu.models.feature_extractors import (
    CLIPVisionFeatureExtractor, build_feature_extractor,
    import_hf_vision_state_dict)
from deepfake_video_detection_tpu.train.calibration import (
    ConfidenceCalibrator, UncertaintyEstimator)
from deepfake_video_detection_tpu.train.progressive import ProgressiveFineTuner


# ---------------------------------------------------------------------------
# GAN
# ---------------------------------------------------------------------------

def test_generator_discriminator_shapes():
    G = Generator(latent_dim=32, cond_dim=8, base_channels=16, img_size=56)
    D = Discriminator(cond_dim=8, base_channels=16)
    gv = G.init(jax.random.PRNGKey(0))
    dv = D.init(jax.random.PRNGKey(1))
    z = jnp.asarray(np.random.default_rng(0).normal(size=(2, 32)), jnp.float32)
    cond = jnp.ones((2, 8), jnp.float32)
    imgs, _ = jax.jit(lambda v, z, c: G.apply(v, z, c))(gv, z, cond)
    assert imgs.shape == (2, 56, 56, 3)
    assert float(jnp.abs(imgs).max()) <= 1.0  # tanh range
    logits, _ = jax.jit(lambda v, x, c: D.apply(v, x, c))(dv, imgs, cond)
    assert logits.ndim == 4 and logits.shape[-1] == 1  # patch logits


def test_gan_losses():
    real = jnp.full((4, 3, 3, 1), 2.0)
    fake = jnp.full((4, 3, 3, 1), -2.0)
    # perfect D → hinge loss 0
    assert float(adversarial_loss_d(real, fake, "hinge")) == 0.0
    assert float(adversarial_loss_d(fake, real, "hinge")) == pytest.approx(6.0)
    # G wants fake logits high
    assert float(adversarial_loss_g(fake)) > float(adversarial_loss_g(real))
    # bce variant is finite and ordered
    assert float(adversarial_loss_d(real, fake, "bce")) < \
        float(adversarial_loss_d(fake, real, "bce"))


def test_gan_steps_and_checkpoint(tmp_path):
    G = Generator(latent_dim=16, cond_dim=0, base_channels=8, img_size=64)
    D = Discriminator(cond_dim=0, base_channels=8)
    gv = G.init(jax.random.PRNGKey(0))
    dv = D.init(jax.random.PRNGKey(1))
    opt_g, opt_d = optax.adam(1e-3), optax.adam(1e-3)
    gs, ds_ = opt_g.init(gv["params"]), opt_d.init(dv["params"])
    d_step, g_step = make_gan_steps(G, D, opt_g, opt_d)
    rng = np.random.default_rng(0)
    real = jnp.asarray(rng.uniform(-1, 1, (2, 64, 64, 3)), jnp.float32)
    z = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    dv, ds_, d_loss = d_step(dv, ds_, gv, real, z, None)
    gv, gs, g_loss = g_step(gv, gs, dv, z, None, real)
    assert np.isfinite(float(d_loss)) and np.isfinite(float(g_loss))

    path = str(tmp_path / "gan.npz")
    save_gan_checkpoint(path, gv, dv, extra={"step": 1})
    g2, d2, meta = load_gan_checkpoint(path)
    assert meta["kind"] == "vlm_gan"
    np.testing.assert_allclose(np.asarray(g2["params"]["fc"]["weight"]),
                               np.asarray(gv["params"]["fc"]["weight"]))


# ---------------------------------------------------------------------------
# ViT-GNN
# ---------------------------------------------------------------------------

def test_vit_gnn_forward():
    model = ViTGNNModel(vit_variant="vit_tiny_patch16_224", img_size=32)
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)), jnp.float32)
    logits, _ = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    assert logits.shape == (2, 2)
    assert model.encoder.num_patches == 4


def test_fallback_model_and_edges():
    model = FallbackModel()
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.ones((2, 32, 32, 3), jnp.float32)
    logits, _ = model.apply(v, x)
    assert logits.shape == (2, 2)
    edges = make_fully_connected_edge_index(4)
    assert edges.shape == (2, 12)  # 4*3 directed edges, no self-loops


def test_vit_gnn_smoke_trainer(tmp_path):
    from deepfake_video_detection_tpu.train.cli_vit_gnn import main

    out = str(tmp_path / "ck.npz")
    rc = main(["--epochs", "2", "--samples", "8", "--img_size", "32",
               "--vit", "vit_tiny_patch16_224", "--out", out])
    assert rc == 0
    from deepfake_video_detection_tpu.evals.infer_vit_gnn import main as infer
    npz = tmp_path / "sample.npz"
    np.savez(npz, faces=np.random.default_rng(0).integers(
        0, 255, (4, 32, 32, 3)).astype(np.uint8), label=np.int64(1))
    assert infer([str(npz), "--checkpoint", out]) == 0


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------

def test_feature_extractor_wrappers():
    for flavor in ("timm", "clip", "dinov2"):
        fx = build_feature_extractor(flavor, "vit_tiny_patch16_224", 32)
        v = fx.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).random((2, 32, 32, 3)),
                        jnp.float32)
        feats, _ = fx.apply(v, x)
        assert feats.shape == (2, 192)
    # clip vs timm normalisation differs → different features
    t = build_feature_extractor("timm", "vit_tiny_patch16_224", 32)
    c = CLIPVisionFeatureExtractor("vit_tiny_patch16_224", 32)
    v = t.init(jax.random.PRNGKey(0))
    x = jnp.full((1, 32, 32, 3), 0.5, jnp.float32)
    ft, _ = t.apply(v, x)
    fc, _ = c.apply(v, x)
    assert not np.allclose(np.asarray(ft), np.asarray(fc))


def test_hf_key_import_clip():
    D = 192
    sd = {
        "vision_model.embeddings.class_embedding": np.zeros(D),
        "vision_model.embeddings.position_embedding.weight": np.zeros((5, D)),
        "vision_model.embeddings.patch_embedding.weight":
            np.zeros((D, 3, 16, 16)),
        "vision_model.post_layernorm.weight": np.ones(D),
        "vision_model.encoder.layers.0.layer_norm1.weight": np.ones(D),
        "vision_model.encoder.layers.0.self_attn.q_proj.weight":
            np.zeros((D, D)),
        "vision_model.encoder.layers.0.self_attn.k_proj.weight":
            np.zeros((D, D)),
        "vision_model.encoder.layers.0.self_attn.v_proj.weight":
            np.zeros((D, D)),
        "vision_model.encoder.layers.0.self_attn.out_proj.weight":
            np.zeros((D, D)),
        "vision_model.encoder.layers.0.mlp.fc1.weight": np.zeros((4 * D, D)),
    }
    out = import_hf_vision_state_dict(sd, "clip")
    assert out["cls_token"].shape == (1, 1, D)
    assert out["pos_embed"].shape == (1, 5, D)
    assert out["blocks.0.attn.qkv.weight"].shape == (3 * D, D)
    assert "blocks.0.attn.proj.weight" in out
    assert "patch_embed.proj.weight" in out


# ---------------------------------------------------------------------------
# calibration / progressive / lr finder
# ---------------------------------------------------------------------------

def test_temperature_scaling_recovers_temperature():
    rng = np.random.default_rng(0)
    n = 5000
    # calibrated logits: label drawn from the model's own probability,
    # then artificially over-confident ×4 → optimal temperature ≈ 4
    margins = rng.normal(0.0, 2.0, n)
    labels = (rng.random(n) < 1.0 / (1.0 + np.exp(-margins))).astype(np.int64)
    base = np.stack([np.zeros(n), margins], -1)
    overconfident = base * 4.0
    cal = ConfidenceCalibrator()
    t = cal.fit(overconfident, labels)
    assert 3.0 < t < 5.5  # recovered ≈4 (sampling noise tolerance)
    probs = cal.calibrate(overconfident)
    assert probs.shape == (n, 2)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-6)


def test_uncertainty_estimator():
    est = UncertaintyEstimator()
    member = np.array([[[0.0, 5.0]], [[5.0, 0.0]]])  # (M=2, B=1, C=2) disagree
    d = est.disagreement(member)
    assert d[0] > 0.4
    agree = np.array([[[0.0, 5.0]], [[0.0, 5.0]]])
    assert est.disagreement(agree)[0] < 1e-6
    m = est.margin(np.array([[0.5, 0.5]]))
    assert m[0] == pytest.approx(1.0)  # right at the boundary


def test_progressive_finetuner_stages():
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)

    model = BackboneDetector("resnet18")
    v = model.init(jax.random.PRNGKey(0))
    ft = ProgressiveFineTuner(model)
    cfg = ft.get_stage_config()
    assert cfg["name"] == "head_only" and cfg["lr"] == 1e-3
    mask = ft.trainable_mask(v)
    # head trainable, backbone frozen
    assert mask["fc1"]["weight"] is True
    assert not any(jax.tree_util.tree_leaves(mask["backbone"]))
    assert ft.advance_stage()
    mask2 = ft.trainable_mask(v)
    # stage 2: last 2 resnet layers trainable
    assert any(jax.tree_util.tree_leaves(mask2["backbone"]["layer4"]))
    assert any(jax.tree_util.tree_leaves(mask2["backbone"]["layer3"]))
    assert not any(jax.tree_util.tree_leaves(mask2["backbone"]["layer1"]))
    assert ft.advance_stage()
    assert not ft.advance_stage()  # exhausted
    assert all(jax.tree_util.tree_leaves(ft.trainable_mask(v)))


def test_lr_finder_on_toy_problem():
    from deepfake_video_detection_tpu.train.lr_finder import LRFinder
    from deepfake_video_detection_tpu.train.losses import cross_entropy_loss
    from deepfake_video_detection_tpu.nn import init as I
    from deepfake_video_detection_tpu.nn import layers as L

    class Toy:
        def init(self, rng):
            return {"params": {"w": {"weight": I.kaiming_uniform(rng, (2, 3)),
                                     "bias": I.zeros(2)}}, "state": {}}

        def apply(self, variables, x, train=False, rng=None):
            feats = jnp.mean(x, axis=(1, 2, 3))
            return L.linear(variables["params"]["w"], feats), {}

    model = Toy()
    rng = np.random.default_rng(0)
    labels = np.arange(16) % 2
    frames = np.stack([np.full((2, 4, 4, 3), 1.0 if l else -1.0)
                       for l in labels]).astype(np.float32)
    batch = {"frames": jnp.asarray(frames), "labels": jnp.asarray(labels)}
    finder = LRFinder(model, cross_entropy_loss, num_steps=40)
    out = finder.find(model.init(jax.random.PRNGKey(0)), [batch])
    assert 1e-4 <= out["best_lr"] <= 10.0
    assert len(finder.history) > 10

    # loss-vs-LR plot artifact (≙ src/lr_finder.py:96-117)
    import os
    import tempfile
    import xml.etree.ElementTree as ET

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "lr.svg")
        finder.save_plot(p)
        root = ET.parse(p).getroot()
        assert root.tag.endswith("svg")
        body = open(p).read()
        assert "polyline" in body and "steepest" in body


def test_validate_improvements_demo(capsys):
    from deepfake_video_detection_tpu.evals.validate_improvements import main

    assert main([]) == 0
    out = capsys.readouterr().out
    assert "simulated" in out and "sanity check" in out


def test_temporal_transformer_detector():
    from deepfake_video_detection_tpu.models.temporal_transformer import (
        TemporalTransformerDetector)

    model = TemporalTransformerDetector("resnet18", d_model=64, depth=2,
                                        num_heads=2)
    v = model.init(jax.random.PRNGKey(0))
    x = jnp.asarray(np.random.default_rng(0).random((2, 6, 32, 32, 3)),
                    jnp.float32)
    (logits, scores), _ = jax.jit(lambda v, x: model.apply(v, x))(v, x)
    assert logits.shape == (2, 2)
    assert scores.shape == (2, 6)
    np.testing.assert_allclose(np.asarray(scores).sum(-1), 1.0, rtol=1e-5)
    # longer clip, same params — time encoding extrapolates
    x2 = jnp.asarray(np.random.default_rng(1).random((1, 24, 32, 32, 3)),
                     jnp.float32)
    (l2, s2), _ = model.apply(v, x2)
    assert l2.shape == (1, 2) and s2.shape == (1, 24)
