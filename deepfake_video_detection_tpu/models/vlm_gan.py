"""Conditional GAN for face synthesis experiments, TPU-native.

Capability parity with ``src/VLM_GAN.py`` (SURVEY.md §2.2): upsampling
``Generator`` (latent 256 + optional conditioning, 7×7 start → img_size,
nearest-upsample conv blocks, tanh RGB head, ``:67-145``), PatchGAN
``Discriminator`` with conditioning injected as an extra channel
(``:149-206``), ``TextProjector`` (``:210-229``), hinge/BCE adversarial
losses (``:234-258``), jitted ``gan_d_step``/``gan_g_step`` (``:263-324``),
image-conditioned variants using a ViT feature extractor (``:328-384``), and
checkpoint save/load (``:397-417``).

TPU-native design: the D and G updates are each ONE jitted program
(forward G + forward D + loss + grads + optax update); BN state threads
functionally. NHWC throughout; N(0, 0.02) init mirrors the reference.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]


def _conv_init(key, k, cin, cout):
    kw, kb = jax.random.split(key)
    return {"weight": I.normal(kw, (k, k, cin, cout), std=0.02),
            "bias": I.zeros(cout)}


def _lin_init(key, cin, cout):
    kw, kb = jax.random.split(key)
    return {"weight": I.normal(kw, (cout, cin), std=0.02),
            "bias": I.zeros(cout)}


def _bn_init(ch):
    return ({"weight": I.ones(ch), "bias": I.zeros(ch)},
            {"running_mean": I.zeros(ch), "running_var": I.ones(ch)})


def _upsample_nearest(x: jnp.ndarray) -> jnp.ndarray:
    N, H, W, C = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class Generator:
    """z (B, latent) [+ cond (B, cond_dim)] → images (B, H, W, 3) in [-1, 1]."""

    def __init__(self, latent_dim: int = 256, cond_dim: int = 0,
                 base_channels: int = 64, out_channels: int = 3,
                 img_size: int = 224):
        self.latent_dim = latent_dim
        self.cond_dim = cond_dim or 0
        self.base_channels = base_channels
        self.out_channels = out_channels
        self.img_size = img_size
        self.start_spatial = 7
        self.start_channels = base_channels * 8
        # upsample chain 7 → ≥img_size (doubling, ≙ reference loop :100-110)
        chain = []
        ch, spatial = self.start_channels, self.start_spatial
        while spatial < img_size:
            out = max(base_channels, ch // 2)
            chain.append((ch, out))
            ch, spatial = out, spatial * 2
        self.up_chain = chain
        self.final_ch = ch

    def init(self, rng) -> Dict[str, Params]:
        ks = iter(jax.random.split(rng, len(self.up_chain) + 3))
        in_dim = self.latent_dim + self.cond_dim
        params: Params = {
            "fc": _lin_init(next(ks), in_dim,
                            self.start_channels * self.start_spatial ** 2)}
        state: Params = {"ups": {}}
        ups: Params = {}
        for i, (cin, cout) in enumerate(self.up_chain):
            p = {"conv": _conv_init(next(ks), 3, cin, cout)}
            p["bn"], state["ups"][str(i)] = _bn_init(cout)
            ups[str(i)] = p
        params["ups"] = ups
        params["to_rgb"] = _conv_init(next(ks), 3, self.final_ch,
                                      self.out_channels)
        return {"params": params, "state": state}

    def apply(self, variables, z: jnp.ndarray,
              cond: Optional[jnp.ndarray] = None,
              train: bool = False) -> Tuple[jnp.ndarray, Params]:
        p, s = variables["params"], variables["state"]
        x = z if (self.cond_dim == 0 or cond is None) else \
            jnp.concatenate([z, cond], axis=-1)
        x = jax.nn.relu(L.linear(p["fc"], x))
        B = z.shape[0]
        x = x.reshape(B, self.start_spatial, self.start_spatial,
                      self.start_channels)
        new_state: Params = {"ups": {}}
        for i in range(len(self.up_chain)):
            x = _upsample_nearest(x)
            x = L.conv2d(p["ups"][str(i)]["conv"], x, stride=1, padding=1)
            x, new_state["ups"][str(i)] = L.batch_norm(
                p["ups"][str(i)]["bn"], s["ups"][str(i)], x, train)
            x = jax.nn.relu(x)
        if x.shape[1] != self.img_size:  # 7·2^k overshoot → center resize
            x = jax.image.resize(
                x, (B, self.img_size, self.img_size, x.shape[-1]), "linear")
        img = jnp.tanh(L.conv2d(p["to_rgb"], x, stride=1, padding=1))
        return img, new_state


class Discriminator:
    """PatchGAN: images (B, H, W, 3) [+ cond] → patch logits (B, h', w', 1)."""

    def __init__(self, in_channels: int = 3, cond_dim: int = 0,
                 base_channels: int = 64):
        self.cond_dim = cond_dim or 0
        self.in_channels = in_channels + (1 if self.cond_dim > 0 else 0)
        self.base_channels = base_channels
        chain = [(self.in_channels, base_channels)]
        ch = base_channels
        for _ in range(3):
            out = min(ch * 2, 512)
            chain.append((ch, out))
            ch = out
        self.chain = chain
        self.final_ch = ch

    def init(self, rng) -> Dict[str, Params]:
        ks = iter(jax.random.split(rng, len(self.chain) + 3))
        params: Params = {"net": {}}
        state: Params = {"net": {}}
        for i, (cin, cout) in enumerate(self.chain):
            params["net"][str(i)] = {"conv": _conv_init(next(ks), 4, cin, cout)}
            if i > 0:
                params["net"][str(i)]["bn"], state["net"][str(i)] = _bn_init(cout)
        params["final"] = _conv_init(next(ks), 4, self.final_ch, 1)
        if self.cond_dim > 0:
            params["cond_proj"] = _lin_init(next(ks), self.cond_dim, 1)
        return {"params": params, "state": state}

    def apply(self, variables, x: jnp.ndarray,
              cond: Optional[jnp.ndarray] = None,
              train: bool = False) -> Tuple[jnp.ndarray, Params]:
        p, s = variables["params"], variables["state"]
        if self.cond_dim > 0 and cond is not None:
            proj = L.linear(p["cond_proj"], cond)          # (B, 1)
            pmap = jnp.broadcast_to(proj[:, None, None, :],
                                    x.shape[:3] + (1,))
            x = jnp.concatenate([x, pmap], axis=-1)
        new_state: Params = {"net": {}}
        for i in range(len(self.chain)):
            x = L.conv2d(p["net"][str(i)]["conv"], x, stride=2, padding=1)
            if i > 0:
                x, new_state["net"][str(i)] = L.batch_norm(
                    p["net"][str(i)]["bn"], s["net"][str(i)], x, train)
            x = jax.nn.leaky_relu(x, 0.2)
        logits = L.conv2d(p["final"], x, stride=1, padding=1)
        if 0 in logits.shape:  # static under jit — catches too-small inputs
            raise ValueError(
                f"Discriminator input too small: patch output {logits.shape}; "
                f"use images ≥ 64px for this 4-stride PatchGAN")
        return logits, new_state


class TextProjector:
    """Text embedding (B, text_dim) → conditioning (B, cond_dim)
    (≙ ``:210-229``)."""

    def __init__(self, text_dim: int = 768, cond_dim: int = 128):
        self.text_dim = text_dim
        self.cond_dim = cond_dim

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {"fc1": _lin_init(k1, self.text_dim, self.cond_dim * 2),
                "fc2": _lin_init(k2, self.cond_dim * 2, self.cond_dim)}

    def apply(self, p: Params, txt: jnp.ndarray) -> jnp.ndarray:
        return L.linear(p["fc2"], jax.nn.relu(L.linear(p["fc1"], txt)))


# ---------------------------------------------------------------------------
# losses (≙ :234-258)
# ---------------------------------------------------------------------------


def adversarial_loss_d(logits_real, logits_fake, loss_type: str = "hinge"):
    lr = logits_real.astype(jnp.float32)
    lf = logits_fake.astype(jnp.float32)
    if loss_type == "hinge":
        return (jnp.mean(jax.nn.relu(1.0 - lr))
                + jnp.mean(jax.nn.relu(1.0 + lf)))
    # BCE with logits on real=1 / fake=0
    return (jnp.mean(jax.nn.softplus(-lr)) + jnp.mean(jax.nn.softplus(lf)))


def adversarial_loss_g(logits_fake, loss_type: str = "hinge"):
    lf = logits_fake.astype(jnp.float32)
    if loss_type == "hinge":
        return -jnp.mean(lf)
    return jnp.mean(jax.nn.softplus(-lf))


# ---------------------------------------------------------------------------
# jitted train steps (≙ :263-324)
# ---------------------------------------------------------------------------


def make_gan_steps(G: Generator, D: Discriminator, opt_g, opt_d,
                   loss_type: str = "hinge", lambda_l1: float = 0.0):
    """Build jitted (d_step, g_step). Each is a full fused update."""

    @jax.jit
    def d_step(d_vars, d_opt_state, g_vars, real_imgs, z, cond):
        def loss_fn(d_params):
            dv = {"params": d_params, "state": d_vars["state"]}
            fake_imgs, _ = G.apply(g_vars, z, cond, train=False)
            lr, ns1 = D.apply(dv, real_imgs, cond, train=True)
            dv2 = {"params": d_params, "state": ns1}
            lf, ns2 = D.apply(dv2, jax.lax.stop_gradient(fake_imgs), cond,
                              train=True)
            return adversarial_loss_d(lr, lf, loss_type), ns2

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(d_vars["params"])
        updates, new_opt = opt_d.update(grads, d_opt_state, d_vars["params"])
        new_params = jax.tree_util.tree_map(
            lambda a, u: (a + u).astype(a.dtype), d_vars["params"], updates)
        return {"params": new_params, "state": new_state}, new_opt, loss

    @jax.jit
    def g_step(g_vars, g_opt_state, d_vars, z, cond, target_imgs):
        def loss_fn(g_params):
            gv = {"params": g_params, "state": g_vars["state"]}
            fake_imgs, g_ns = G.apply(gv, z, cond, train=True)
            lf, _ = D.apply(d_vars, fake_imgs, cond, train=False)
            loss = adversarial_loss_g(lf, loss_type)
            if lambda_l1 > 0.0:
                loss = loss + lambda_l1 * jnp.mean(
                    jnp.abs(fake_imgs - target_imgs))
            return loss, g_ns

        (loss, new_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(g_vars["params"])
        updates, new_opt = opt_g.update(grads, g_opt_state, g_vars["params"])
        new_params = jax.tree_util.tree_map(
            lambda a, u: (a + u).astype(a.dtype), g_vars["params"], updates)
        return {"params": new_params, "state": new_state}, new_opt, loss

    return d_step, g_step


# ---------------------------------------------------------------------------
# image-conditioned variant (≙ :328-384) + factories + checkpoints
# ---------------------------------------------------------------------------


def extract_image_condition(feat_extractor, variables, imgs: jnp.ndarray,
                            projector: Optional[TextProjector] = None,
                            proj_params: Optional[Params] = None) -> jnp.ndarray:
    """ViT features of conditioning images → cond vector (≙ ``:328-344``)."""
    feats, _ = feat_extractor.apply(variables, imgs, train=False)
    if projector is not None and proj_params is not None:
        feats = projector.apply(proj_params, feats)
    return feats


def create_generator(latent_dim=256, cond_dim=128, base_channels=64,
                     img_size=224) -> Generator:
    return Generator(latent_dim, cond_dim, base_channels, img_size=img_size)


def create_discriminator(cond_dim=128, base_channels=64) -> Discriminator:
    return Discriminator(cond_dim=cond_dim, base_channels=base_channels)


def create_image_conditioned_gan(latent_dim: int = 256,
                                 cond_dim: int = 128,
                                 base_channels: int = 64,
                                 img_size: int = 224,
                                 vit_variant: str = "vit_tiny_patch16_224"):
    """(G, D, feature extractor, projector) for image conditioning."""
    from deepfake_video_detection_tpu.models.vit import VisionTransformer

    vit = VisionTransformer(variant=vit_variant, num_classes=0)
    proj = TextProjector(text_dim=vit.feature_dim, cond_dim=cond_dim)
    G = Generator(latent_dim, cond_dim, base_channels, img_size=img_size)
    D = Discriminator(cond_dim=cond_dim, base_channels=base_channels)
    return G, D, vit, proj


def save_gan_checkpoint(path: str, g_vars, d_vars,
                        extra: Optional[Dict[str, Any]] = None) -> None:
    """≙ ``save_checkpoint`` (``:397-409``): both nets in one file."""
    from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint

    combined = {"params": {"G": g_vars["params"], "D": d_vars["params"]},
                "state": {"G": g_vars.get("state", {}),
                          "D": d_vars.get("state", {})}}
    save_checkpoint(path, combined, meta=dict(extra or {}, kind="vlm_gan"))


def load_gan_checkpoint(path: str):
    """Returns (g_vars, d_vars, meta)."""
    from deepfake_video_detection_tpu.checkpoint.store import load_checkpoint

    combined, meta = load_checkpoint(path)
    g = {"params": combined["params"]["G"], "state": combined["state"].get("G", {})}
    d = {"params": combined["params"]["D"], "state": combined["state"].get("D", {})}
    return g, d, meta
