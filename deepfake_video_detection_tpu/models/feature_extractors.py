"""Per-frame feature extractor wrappers (ViT / CLIP-vision / DINOv2 styles).

Capability parity with the reference's backbone wrappers
(``src/models.py:88-196``): ``ViTFeatureExtractor`` (timm ViT, conv fallback
when unavailable), ``CLIPVisionFeatureExtractor`` (CLIP pixel normalisation,
pooler/CLS output), ``DINOv2VisionFeatureExtractor`` (ImageNet normalisation,
CLS token). The reference instantiates HF/timm torch models; here each
wrapper runs our TPU-native ``VisionTransformer`` and differs only in input
normalisation, pooling convention, and the checkpoint key layout its
importer accepts (timm, HF CLIPVisionModel, HF Dinov2Model) — so public
pretrained weights load without torch at serving time.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfake_video_detection_tpu.data.normalize import clip_normalize, imagenet_normalize
from deepfake_video_detection_tpu.models.vit import VisionTransformer

Params = Dict[str, Any]


class _VitWrapperBase:
    normalize = staticmethod(imagenet_normalize)
    use_cls = True

    def __init__(self, variant: str = "vit_base_patch16_224",
                 img_size: int = 224, compute_dtype=jnp.float32):
        self.vit = VisionTransformer(variant=variant, img_size=img_size,
                                     num_classes=0,
                                     compute_dtype=compute_dtype)
        self.feature_dim = self.vit.feature_dim

    def init(self, rng) -> Dict[str, Params]:
        return self.vit.init(rng)

    def apply(self, variables, images_01: jnp.ndarray, train: bool = False,
              rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, Params]:
        """``images_01``: (B, H, W, 3) float in [0, 1] (or uint8)."""
        x = self.normalize(images_01, scaled=jnp.issubdtype(
            images_01.dtype, jnp.floating))
        feats, ns = self.vit.apply(variables, x, train=train, rng=rng)
        return feats, ns


class ViTFeatureExtractor(_VitWrapperBase):
    """≙ ``src/models.py:88-107`` (timm ViT, ImageNet normalise, CLS)."""


class CLIPVisionFeatureExtractor(_VitWrapperBase):
    """≙ ``src/models.py:110-159`` (CLIP normalise, CLS/pooler output)."""

    normalize = staticmethod(clip_normalize)


class DINOv2VisionFeatureExtractor(_VitWrapperBase):
    """≙ ``src/models.py:162-196`` (ImageNet normalise, CLS token)."""


# ---------------------------------------------------------------------------
# HF checkpoint key-layout importers → our ViT tree (timm-style keys)
# ---------------------------------------------------------------------------

# HF CLIPVisionModel → timm-style key rewrites (prefix-stripped)
_CLIP_MAP = [
    (r"^vision_model\.embeddings\.class_embedding$", "cls_token"),
    (r"^vision_model\.embeddings\.position_embedding\.weight$", "pos_embed"),
    (r"^vision_model\.embeddings\.patch_embedding\.weight$",
     "patch_embed.proj.weight"),
    (r"^vision_model\.post_layernorm\.(weight|bias)$", r"norm.\1"),
    (r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm1\.(weight|bias)$",
     r"blocks.\1.norm1.\2"),
    (r"^vision_model\.encoder\.layers\.(\d+)\.layer_norm2\.(weight|bias)$",
     r"blocks.\1.norm2.\2"),
    (r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc1\.(weight|bias)$",
     r"blocks.\1.mlp.fc1.\2"),
    (r"^vision_model\.encoder\.layers\.(\d+)\.mlp\.fc2\.(weight|bias)$",
     r"blocks.\1.mlp.fc2.\2"),
    (r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.out_proj\.(weight|bias)$",
     r"blocks.\1.attn.proj.\2"),
]

# DINOv2 (HF Dinov2Model) → timm-style
_DINO_MAP = [
    (r"^embeddings\.cls_token$", "cls_token"),
    (r"^embeddings\.position_embeddings$", "pos_embed"),
    (r"^embeddings\.patch_embeddings\.projection\.(weight|bias)$",
     r"patch_embed.proj.\1"),
    (r"^layernorm\.(weight|bias)$", r"norm.\1"),
    (r"^encoder\.layer\.(\d+)\.norm1\.(weight|bias)$", r"blocks.\1.norm1.\2"),
    (r"^encoder\.layer\.(\d+)\.norm2\.(weight|bias)$", r"blocks.\1.norm2.\2"),
    (r"^encoder\.layer\.(\d+)\.mlp\.fc1\.(weight|bias)$", r"blocks.\1.mlp.fc1.\2"),
    (r"^encoder\.layer\.(\d+)\.mlp\.fc2\.(weight|bias)$", r"blocks.\1.mlp.fc2.\2"),
    (r"^encoder\.layer\.(\d+)\.attention\.output\.dense\.(weight|bias)$",
     r"blocks.\1.attn.proj.\2"),
]


def _apply_map(key: str, table) -> Optional[str]:
    for pat, repl in table:
        if re.match(pat, key):
            return re.sub(pat, repl, key)
    return None


def _merge_qkv(sd: Dict[str, np.ndarray], layer_fmt: Dict[str, str],
               out: Dict[str, np.ndarray]) -> None:
    """Fuse separate q/k/v projections into timm's fused ``qkv``."""
    layers = set()
    for k in sd:
        m = re.match(layer_fmt["probe"], k)
        if m:
            layers.add(int(m.group(1)))
    for i in sorted(layers):
        try:
            qw = sd[layer_fmt["q"].format(i=i) + ".weight"]
            kw = sd[layer_fmt["k"].format(i=i) + ".weight"]
            vw = sd[layer_fmt["v"].format(i=i) + ".weight"]
            out[f"blocks.{i}.attn.qkv.weight"] = np.concatenate([qw, kw, vw], 0)
            qb = sd.get(layer_fmt["q"].format(i=i) + ".bias")
            kb = sd.get(layer_fmt["k"].format(i=i) + ".bias")
            vb = sd.get(layer_fmt["v"].format(i=i) + ".bias")
            if qb is not None and kb is not None and vb is not None:
                out[f"blocks.{i}.attn.qkv.bias"] = np.concatenate([qb, kb, vb], 0)
        except KeyError:
            continue


def import_hf_vision_state_dict(sd: Dict[str, np.ndarray],
                                flavor: str) -> Dict[str, np.ndarray]:
    """Rewrite an HF CLIP-vision / DINOv2 state dict into timm-style keys
    consumable by ``VisionTransformer`` through the torch bridge."""
    table = _CLIP_MAP if flavor == "clip" else _DINO_MAP
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        nk = _apply_map(k, table)
        if nk is not None:
            arr = np.asarray(v)
            if nk == "cls_token":
                arr = arr.reshape(1, 1, -1)
            if nk == "pos_embed" and arr.ndim == 2:
                arr = arr[None]
            out[nk] = arr
    if flavor == "clip":
        _merge_qkv(sd, {
            "probe": r"^vision_model\.encoder\.layers\.(\d+)\.self_attn\.q_proj\.weight$",
            "q": "vision_model.encoder.layers.{i}.self_attn.q_proj",
            "k": "vision_model.encoder.layers.{i}.self_attn.k_proj",
            "v": "vision_model.encoder.layers.{i}.self_attn.v_proj",
        }, out)
    else:
        _merge_qkv(sd, {
            "probe": r"^encoder\.layer\.(\d+)\.attention\.attention\.query\.weight$",
            "q": "encoder.layer.{i}.attention.attention.query",
            "k": "encoder.layer.{i}.attention.attention.key",
            "v": "encoder.layer.{i}.attention.attention.value",
        }, out)
    return out


def build_feature_extractor(backbone: str = "timm",
                            variant: str = "vit_base_patch16_224",
                            img_size: int = 224,
                            compute_dtype=jnp.float32):
    """Factory mirroring the reference's backbone kwarg dispatch
    (``src/models.py:240-248``): 'timm' | 'clip' | 'dinov2'."""
    if backbone == "clip":
        return CLIPVisionFeatureExtractor(variant, img_size, compute_dtype)
    if backbone == "dinov2":
        return DINOv2VisionFeatureExtractor(variant, img_size, compute_dtype)
    return ViTFeatureExtractor(variant, img_size, compute_dtype)
