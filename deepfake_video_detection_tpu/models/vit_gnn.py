"""ViT-patch-graph classifier (the reference's PyG experiment), TPU-native.

Capability parity with ``src/run_vit_gnn.py`` (SURVEY.md §2.2):
``ViTEncoder`` returning patch tokens (B, N, C) (``:27-54``), a 2-layer GNN
with global mean pooling (``:57-70``), ``ViT_GNN_Model.build()`` lazy dim
inference (``:83-86``), a fully-connected edge helper (``:98-109``), and an
MLP fallback when the ViT is unavailable (``:119-126``).

TPU-native redesign: torch_geometric's sparse ``edge_index`` gather/scatter
is replaced by **dense normalized-adjacency matmuls** — for the ≤196-node
fully-connected patch graphs used here, one (B, N, N) @ (B, N, C) einsum on
the MXU beats any scatter pipeline, and it jits with static shapes. The
``make_fully_connected_edge_index`` helper is kept (as an adjacency builder)
for API parity.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L
from deepfake_video_detection_tpu.models.vit import VisionTransformer
from deepfake_video_detection_tpu.utils.graph import (
    fully_connected_adjacency, normalize_adjacency)

Params = Dict[str, Any]


def _lin_init(key, out_d, in_d):
    kw, kb = jax.random.split(key)
    return {"weight": I.kaiming_uniform(kw, (out_d, in_d)),
            "bias": I.uniform_bias(kb, (out_d,), in_d)}


def make_fully_connected_edge_index(num_nodes: int) -> np.ndarray:
    """(2, E) COO edge list of the dense graph — API parity with
    ``run_vit_gnn.py:98-109``; the models below consume the dense adjacency."""
    idx = np.arange(num_nodes)
    src, dst = np.meshgrid(idx, idx, indexing="ij")
    mask = src != dst
    return np.stack([src[mask], dst[mask]])


class ViTEncoder:
    """ViT returning patch tokens (B, N, C) (≙ ``:27-54``)."""

    def __init__(self, variant: str = "vit_small_patch16_224",
                 img_size: int = 224):
        self.vit = VisionTransformer(variant=variant, img_size=img_size,
                                     num_classes=0)
        self.feature_dim = self.vit.feature_dim
        self.num_patches = self.vit.num_patches

    def init(self, rng):
        return self.vit.init(rng)

    def apply(self, variables, x: jnp.ndarray) -> jnp.ndarray:
        # return_tokens already excludes the CLS token → (B, N_patches, C)
        tokens, _ = self.vit.apply(variables, x, return_tokens=True)
        return tokens


class SimpleGNN:
    """2 message-passing layers + global mean pool → logits (≙ ``:57-70``)."""

    def __init__(self, in_channels: int, hidden: int = 128,
                 out_channels: int = 2):
        self.in_channels = in_channels
        self.hidden = hidden
        self.out_channels = out_channels

    def init(self, rng) -> Params:
        k1, k2 = jax.random.split(rng)
        return {"conv1": _lin_init(k1, self.hidden, self.in_channels),
                "conv2": _lin_init(k2, self.hidden, self.hidden)}

    def apply(self, p: Params, x: jnp.ndarray, A_norm: jnp.ndarray) -> jnp.ndarray:
        """``x`` (B, N, C), ``A_norm`` (B, N, N) or (N, N)."""
        if A_norm.ndim == 2:
            A_norm = A_norm[None]
        A = A_norm.astype(x.dtype)
        h = jax.nn.relu(L.linear(p["conv1"], jnp.einsum(
            "bnm,bmc->bnc", A, x, preferred_element_type=jnp.float32
        ).astype(x.dtype)))
        h = jax.nn.relu(L.linear(p["conv2"], jnp.einsum(
            "bnm,bmc->bnc", A, h, preferred_element_type=jnp.float32
        ).astype(x.dtype)))
        return jnp.mean(h, axis=1)  # global mean pool


class ViTGNNModel:
    """≙ ``ViT_GNN_Model`` (``:73-96``) with eager dim inference (``build``
    kept for parity — a no-op since dims are static here)."""

    def __init__(self, vit_variant: str = "vit_small_patch16_224",
                 gnn_hidden: int = 128, out_classes: int = 2,
                 img_size: int = 224):
        self.encoder = ViTEncoder(vit_variant, img_size)
        self.gnn = SimpleGNN(self.encoder.feature_dim, gnn_hidden)
        self.out_classes = out_classes
        self.gnn_hidden = gnn_hidden
        A = normalize_adjacency(fully_connected_adjacency(
            self.encoder.num_patches))
        self._A = np.asarray(A)

    def build(self, sample_input=None) -> "ViTGNNModel":
        return self

    def init(self, rng) -> Dict[str, Params]:
        kv, kg, kh = jax.random.split(rng, 3)
        vvars = self.encoder.init(kv)
        return {"params": {"vit": vvars["params"],
                           "gnn": self.gnn.init(kg),
                           "head": _lin_init(kh, self.out_classes,
                                             self.gnn_hidden)},
                "state": {}}

    def apply(self, variables, images: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> Tuple[jnp.ndarray, Params]:
        """``images``: (B, H, W, 3) — patches of each image are graph nodes."""
        p = variables["params"]
        tokens = self.encoder.apply({"params": p["vit"], "state": {}}, images)
        pooled = self.gnn.apply(p["gnn"], tokens, jnp.asarray(self._A))
        logits = L.linear(p["head"], pooled).astype(jnp.float32)
        return logits, {}


class FallbackModel:
    """Conv fallback when a ViT is unavailable (≙ ``FallbackModel``,
    ``src/train_vit_gnn.py:27``)."""

    def __init__(self, out_classes: int = 2):
        self.out_classes = out_classes

    def init(self, rng) -> Dict[str, Params]:
        k1, k2, k3 = jax.random.split(rng, 3)
        return {"params": {
            "conv1": {"weight": I.kaiming_uniform(k1, (3, 3, 3, 16)),
                      "bias": I.zeros(16)},
            "conv2": {"weight": I.kaiming_uniform(k2, (3, 3, 16, 32)),
                      "bias": I.zeros(32)},
            "head": _lin_init(k3, self.out_classes, 32)},
            "state": {}}

    def apply(self, variables, images: jnp.ndarray, train: bool = False,
              rng=None) -> Tuple[jnp.ndarray, Params]:
        p = variables["params"]
        x = images.astype(jnp.float32)
        x = jax.nn.relu(L.conv2d(p["conv1"], x, stride=2, padding=1))
        x = jax.nn.relu(L.conv2d(p["conv2"], x, stride=2, padding=1))
        x = L.global_avg_pool(x)
        return L.linear(p["head"], x).astype(jnp.float32), {}
