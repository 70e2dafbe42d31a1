"""Frame-graph (ViT + GCN) detector, TPU-native.

Capability parity with the reference's ``SimpleGCN`` + ``DeepfakeModel``
(``src/models.py:199-291``): frames are graph nodes; a ViT extracts per-frame
embeddings, a 2-layer spectral GCN (``H' = ReLU(A_norm @ H @ W)``) passes
messages over the (chain or dense) frame graph, mean-pool → MLP classifier.

The GCN is *ideal* XLA territory — batched dense matmuls on the MXU — which is
why no PyG-style gather/scatter machinery exists here (SURVEY.md §7.3). The
adjacency is expected pre-normalised (``utils.normalize_adjacency``).

Param paths mirror the reference (``vit.*`` under timm names, ``vit_proj``,
``gcn.fc1/fc2``, ``classifier.0/.3``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L
from deepfake_video_detection_tpu.models.vit import VisionTransformer

Params = Dict[str, Any]


def _lin_init(key, out_d, in_d):
    kw, kb = jax.random.split(key)
    return {"weight": I.kaiming_uniform(kw, (out_d, in_d)),
            "bias": I.uniform_bias(kb, (out_d,), in_d)}


class SimpleGCN:
    """2-layer message passing: fc(A@H) → ReLU → dropout → fc → ReLU."""

    def __init__(self, in_dim: int, hid_dim: int = 256, out_dim: int = 128,
                 dropout: float = 0.3):
        self.in_dim, self.hid_dim, self.out_dim = in_dim, hid_dim, out_dim
        self.dropout = dropout

    def init(self, rng: jax.Array) -> Params:
        k1, k2 = jax.random.split(rng)
        return {"fc1": _lin_init(k1, self.hid_dim, self.in_dim),
                "fc2": _lin_init(k2, self.out_dim, self.hid_dim)}

    def apply(self, p: Params, H: jnp.ndarray, A_norm: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None) -> jnp.ndarray:
        """``H``: (B, N, F); ``A_norm``: (B, N, N)."""
        H = jnp.einsum("bnm,bmf->bnf", A_norm.astype(H.dtype), H,
                       preferred_element_type=jnp.float32).astype(H.dtype)
        H = jax.nn.relu(L.linear(p["fc1"], H))
        H = L.dropout(rng, H, self.dropout, train)
        return jax.nn.relu(L.linear(p["fc2"], H))


class FrameGraphDetector:
    """≙ reference ``DeepfakeModel`` (ViT+GCN, ``src/models.py:222-291``)."""

    def __init__(self, vit_out: int = 768, gcn_hid: int = 256, gcn_out: int = 128,
                 num_classes: int = 2, vit_variant: str = "vit_base_patch16_224",
                 img_size: int = 224, compute_dtype: jnp.dtype = jnp.float32,
                 backbone: str = "timm"):
        self.vit_out = vit_out
        self.num_classes = num_classes
        self.backbone_flavor = backbone
        if backbone in ("clip", "dinov2"):
            # ≙ the reference's backbone kwarg dispatch (src/models.py:240-248).
            # The flavor selects the checkpoint key layout (HF importers in
            # models/feature_extractors.py) and which pixel normalisation the
            # data pipeline applies (TrainerConfig.normalize); the encoder
            # itself is the same TPU-native ViT.
            from deepfake_video_detection_tpu.models.feature_extractors import (
                build_feature_extractor)
            self.vit = build_feature_extractor(backbone, vit_variant,
                                               img_size, compute_dtype).vit
        else:
            self.vit = VisionTransformer(variant=vit_variant, img_size=img_size,
                                         num_classes=0,
                                         compute_dtype=compute_dtype)
        self.needs_proj = self.vit.feature_dim != vit_out
        self.gcn = SimpleGCN(vit_out, gcn_hid, gcn_out)
        self.gcn_out = gcn_out

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        kv, kp, kg, k1, k2 = jax.random.split(rng, 5)
        vvars = self.vit.init(kv)
        params: Params = {"vit": vvars["params"]}
        if self.needs_proj:
            params["vit_proj"] = _lin_init(kp, self.vit_out, self.vit.feature_dim)
        params["gcn"] = self.gcn.init(kg)
        params["classifier"] = {"0": _lin_init(k1, 64, self.gcn_out),
                                "3": _lin_init(k2, self.num_classes, 64)}
        return {"params": params, "state": {}}

    def apply(self, variables: Dict[str, Params], images: jnp.ndarray,
              A_norm: jnp.ndarray, train: bool = False,
              rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, Params]:
        """``images``: (B, N, H, W, C); ``A_norm``: (B, N, N) pre-normalised."""
        p = variables["params"]
        B, N = images.shape[0], images.shape[1]
        r1 = r2 = r3 = None
        if rng is not None:
            rng, r1, r2, r3 = jax.random.split(rng, 4)
        feats, _ = self.vit.apply({"params": p["vit"], "state": {}},
                                  images.reshape((B * N,) + images.shape[2:]),
                                  train=train, rng=r1)
        if self.needs_proj:
            feats = L.linear(p["vit_proj"], feats)
        feats = feats.reshape(B, N, self.vit_out)
        g = self.gcn.apply(p["gcn"], feats, A_norm, train=train, rng=r2)
        pooled = jnp.mean(g, axis=1)
        h = jax.nn.relu(L.linear(p["classifier"]["0"], pooled))
        h = L.dropout(r3, h, 0.3, train)
        logits = L.linear(p["classifier"]["3"], h).astype(jnp.float32)
        return logits, {}
