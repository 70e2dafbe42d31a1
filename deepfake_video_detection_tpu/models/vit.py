"""Vision Transformer, TPU-native.

Capability parity with the reference's timm ViT backbones
(``src/models.py:88-107`` ``ViTFeatureExtractor``;
``src/pretrained_detector.py:51-54``). Param paths mirror timm's
``vit_*_patch16_224`` layout (``cls_token``, ``pos_embed``,
``patch_embed.proj``, ``blocks.N.attn.qkv`` …). The whole encoder is one
jitted function: patch embedding is a strided conv (one MXU matmul per image),
blocks use the fused-QKV attention from ``nn.layers``.

With ``num_classes=0`` (the reference's feature-extractor mode) ``apply``
returns the post-norm CLS embedding; ``return_tokens=True`` yields all patch
tokens (used by the ViT-GNN model family, reference ``src/run_vit_gnn.py:27-54``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]

_VARIANTS = {
    # embed_dim, depth, heads, mlp_ratio
    "vit_tiny_patch16_224": (192, 12, 3, 4.0),
    "vit_small_patch16_224": (384, 12, 6, 4.0),
    "vit_base_patch16_224": (768, 12, 12, 4.0),
    "vit_large_patch16_224": (1024, 24, 16, 4.0),
}


class VisionTransformer:
    def __init__(self, variant: str = "vit_base_patch16_224", img_size: int = 224,
                 patch_size: int = 16, num_classes: int = 0,
                 compute_dtype: jnp.dtype = jnp.float32,
                 embed_dim: Optional[int] = None, depth: Optional[int] = None,
                 num_heads: Optional[int] = None, mlp_ratio: float = 4.0,
                 ln_eps: float = 1e-6):
        if variant in _VARIANTS:
            d, dep, nh, mr = _VARIANTS[variant]
        else:
            d, dep, nh, mr = 768, 12, 12, 4.0
        self.variant = variant
        self.embed_dim = embed_dim or d
        self.depth = depth or dep
        self.num_heads = num_heads or nh
        self.mlp_ratio = mlp_ratio or mr
        self.img_size = img_size
        self.patch_size = patch_size
        self.num_patches = (img_size // patch_size) ** 2
        self.num_classes = num_classes
        self.compute_dtype = compute_dtype
        self.ln_eps = ln_eps
        self.feature_dim = self.embed_dim

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        D = self.embed_dim
        H = int(D * self.mlp_ratio)
        keys = iter(jax.random.split(rng, 6 * self.depth + 6))
        params: Params = {
            "cls_token": I.trunc_normal(next(keys), (1, 1, D), std=1e-6),
            "pos_embed": I.trunc_normal(next(keys), (1, self.num_patches + 1, D), std=0.02),
            "patch_embed": {"proj": {
                "weight": I.trunc_normal(next(keys), (self.patch_size, self.patch_size, 3, D), std=0.02),
                "bias": I.zeros(D),
            }},
        }
        blocks: Params = {}
        for i in range(self.depth):
            blocks[str(i)] = {
                "norm1": {"weight": I.ones(D), "bias": I.zeros(D)},
                "attn": {
                    "qkv": {"weight": I.trunc_normal(next(keys), (3 * D, D), std=0.02),
                            "bias": I.zeros(3 * D)},
                    "proj": {"weight": I.trunc_normal(next(keys), (D, D), std=0.02),
                             "bias": I.zeros(D)},
                },
                "norm2": {"weight": I.ones(D), "bias": I.zeros(D)},
                "mlp": {
                    "fc1": {"weight": I.trunc_normal(next(keys), (H, D), std=0.02),
                            "bias": I.zeros(H)},
                    "fc2": {"weight": I.trunc_normal(next(keys), (D, H), std=0.02),
                            "bias": I.zeros(D)},
                },
            }
        params["blocks"] = blocks
        params["norm"] = {"weight": I.ones(D), "bias": I.zeros(D)}
        if self.num_classes > 0:
            params["head"] = {"weight": I.trunc_normal(next(keys), (self.num_classes, D), std=0.02),
                              "bias": I.zeros(self.num_classes)}
        return {"params": params, "state": {}}

    def apply(self, variables: Dict[str, Params], x: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None,
              return_tokens: bool = False) -> Tuple[jnp.ndarray, Params]:
        """``x``: (B, H, W, 3) NHWC. Returns (CLS features | logits | tokens, {})."""
        p = variables["params"]
        x = x.astype(self.compute_dtype)
        B = x.shape[0]
        # patch embed: strided conv → (B, H/ps, W/ps, D) → (B, N, D)
        y = L.conv2d(p["patch_embed"]["proj"], x, stride=self.patch_size, padding=0)
        y = y.reshape(B, -1, self.embed_dim)
        cls = jnp.broadcast_to(p["cls_token"].astype(y.dtype), (B, 1, self.embed_dim))
        y = jnp.concatenate([cls, y], axis=1) + p["pos_embed"].astype(y.dtype)

        for i in range(self.depth):
            bp = p["blocks"][str(i)]
            h = L.layer_norm(bp["norm1"], y, self.ln_eps)
            y = y + L.multi_head_attention(bp["attn"], h, self.num_heads)
            h = L.layer_norm(bp["norm2"], y, self.ln_eps)
            h = L.linear(bp["mlp"]["fc1"], h)
            h = jax.nn.gelu(h, approximate=False)
            y = y + L.linear(bp["mlp"]["fc2"], h)

        y = L.layer_norm(p["norm"], y, self.ln_eps)
        if return_tokens:
            return y[:, 1:, :], {}
        feats = y[:, 0, :]
        if self.num_classes > 0:
            feats = L.linear(p["head"], feats)
        return feats, {}
