"""Per-frame backbone + temporal-attention detector, and its ensemble.

Capability parity with the reference's production models
(``src/pretrained_detector.py``):

* ``BackboneDetector`` ≙ ``PretrainedBackboneDetector`` (:15-143): per-frame
  backbone features → temporal attention MLP (feat→64→1, sigmoid, softmax over
  T) → attention-weighted feature pooling → dropout+fc(feat→256→num_classes).
  Input ``(B, T, H, W, C)``; returns ``(logits (B,C), frame_scores (B,T))``.
* ``EnsembleDetector`` ≙ reference ``EnsembleDetector`` (:146-218): N member
  detectors combined by ``average`` / ``weighted`` (learnable softmax weights)
  / ``voting`` (majority class one-hot).

TPU-native design notes:

* The backbone runs over the flattened ``(B·T)`` frame batch — one big MXU
  workload per step, exactly the hot loop SURVEY.md §3.1 identifies.
* Homogeneous-backbone ensembles could be ``vmap``-stacked; heterogeneous ones
  (the reference default pairs efficientnet+resnet) cannot share shapes, so
  members run as separate jitted subgraphs and fuse at the logits
  (SURVEY.md §7 "hard parts").
* Freezing is expressed as an optax gradient mask (``trainable_mask``), not
  mutable ``requires_grad`` flags — the progressive fine-tuning schedule of
  the reference's ``ProgressiveFineTuner`` (:221-274) lives in
  ``train/progressive.py`` on top of this.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L
from deepfake_video_detection_tpu.models.efficientnet import EfficientNet
from deepfake_video_detection_tpu.models.resnet import ResNet
from deepfake_video_detection_tpu.models.vit import VisionTransformer

Params = Dict[str, Any]


class TinyConvBackbone:
    """2-conv stub backbone for sharding dryruns and fast tests.

    The multi-chip dryrun phases that validate ring-attention / MoE / GPipe
    collectives don't exercise the backbone at all — embedding a full
    EfficientNet-B0 there only multiplies XLA compile time (the round-3
    driver gate timed out on exactly that). This stub keeps the same
    interface (``init``/``apply``/``feature_dim``) at ~1/1000 the graph size.
    """

    feature_dim = 32

    def __init__(self, compute_dtype=jnp.float32):
        self.compute_dtype = compute_dtype

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        k1, k2 = jax.random.split(rng)
        params = {
            "conv1": {"weight": I.kaiming_normal(k1, (3, 3, 3, 16))},
            "conv2": {"weight": I.kaiming_normal(k2, (3, 3, 16, self.feature_dim))},
        }
        return {"params": params, "state": {}}

    def apply(self, variables, x, train: bool = False, rng=None):
        p = variables["params"]
        x = x.astype(self.compute_dtype)
        x = jax.nn.relu(L.conv2d(p["conv1"], x, stride=2, padding=1))
        x = jax.nn.relu(L.conv2d(p["conv2"], x, stride=2, padding=1))
        return L.global_avg_pool(x), variables.get("state", {})


def build_backbone(name: str, compute_dtype=jnp.float32):
    """Backbone factory mirroring the reference's name dispatch
    (``src/pretrained_detector.py:37-57``); ``tinyconv`` is a first-party
    stub for sharding dryruns (no reference counterpart)."""
    name = name.lower()
    if name == "tinyconv":
        return TinyConvBackbone(compute_dtype=compute_dtype)
    if name.startswith("resnet"):
        return ResNet(variant=name, num_classes=0, compute_dtype=compute_dtype)
    if name.startswith("efficientnet"):
        variant = name.split("_")[-1] if "_" in name else "b0"
        return EfficientNet(variant=variant, num_classes=0, compute_dtype=compute_dtype)
    if name.startswith("vit"):
        variant = name if name in (
            "vit_tiny_patch16_224", "vit_small_patch16_224",
            "vit_base_patch16_224", "vit_large_patch16_224") else "vit_base_patch16_224"
        return VisionTransformer(variant=variant, num_classes=0, compute_dtype=compute_dtype)
    raise ValueError(f"Unsupported backbone: {name}")


class BackboneDetector:
    def __init__(
        self,
        backbone_name: str = "efficientnet_b0",
        num_classes: int = 2,
        dropout_rate: float = 0.5,
        use_temporal_attention: bool = True,
        compute_dtype: jnp.dtype = jnp.float32,
    ):
        self.backbone_name = backbone_name
        self.num_classes = num_classes
        self.dropout_rate = dropout_rate
        self.use_temporal_attention = use_temporal_attention
        self.compute_dtype = compute_dtype
        self.backbone = build_backbone(backbone_name, compute_dtype)
        self.feature_dim = self.backbone.feature_dim

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        kb, k1, k2, k3, k4 = jax.random.split(rng, 5)
        bvars = self.backbone.init(kb)
        F = self.feature_dim
        params: Params = {"backbone": bvars["params"]}
        if self.use_temporal_attention:
            params["temporal_attention"] = {
                "0": {"weight": I.kaiming_uniform(k1, (64, F)),
                      "bias": I.uniform_bias(k2, (64,), F)},
                "2": {"weight": I.kaiming_uniform(k3, (1, 64)),
                      "bias": I.uniform_bias(k4, (1,), 64)},
            }
        kh1, kh2 = jax.random.split(k1)
        # head init mirrors the reference's explicit head init (:80-85):
        # kaiming_normal fan_out for fc1, N(0, 0.01) for fc2, zero biases.
        params["fc1"] = {"weight": I.kaiming_normal(kh1, (256, F), mode="fan_out"),
                         "bias": I.zeros(256)}
        params["fc2"] = {"weight": I.normal(kh2, (self.num_classes, 256), std=0.01),
                         "bias": I.zeros(self.num_classes)}
        return {"params": params, "state": {"backbone": bvars["state"]}}

    def apply(
        self,
        variables: Dict[str, Params],
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[Tuple[jnp.ndarray, jnp.ndarray], Params]:
        """``x``: (B, T, H, W, C) float (already normalised frames)."""
        p, s = variables["params"], variables["state"]
        B, T = x.shape[0], x.shape[1]
        x_flat = x.reshape((B * T,) + x.shape[2:])
        r_bb = r_d1 = r_d2 = None
        if rng is not None:
            rng, r_bb, r_d1, r_d2 = jax.random.split(rng, 4)
        feats_flat, ns_bb = self.backbone.apply(
            {"params": p["backbone"], "state": s["backbone"]}, x_flat, train=train, rng=r_bb)
        feats = feats_flat.reshape(B, T, self.feature_dim)

        if self.use_temporal_attention:
            a = L.linear(p["temporal_attention"]["0"], feats)
            a = jax.nn.relu(a)
            a = L.linear(p["temporal_attention"]["2"], a)
            a = jax.nn.sigmoid(a)[..., 0]                       # (B, T)
            attn = jax.nn.softmax(a.astype(jnp.float32), axis=1).astype(feats.dtype)
            frame_scores = attn
            pooled = jnp.sum(feats * attn[..., None], axis=1)   # (B, F)
        else:
            pooled = jnp.mean(feats, axis=1)
            frame_scores = jnp.full((B, T), 1.0 / T, dtype=feats.dtype)

        h = L.dropout(r_d1, pooled, self.dropout_rate, train)
        h = jax.nn.relu(L.linear(p["fc1"], h))
        h = L.dropout(r_d2, h, self.dropout_rate, train)
        logits = L.linear(p["fc2"], h).astype(jnp.float32)
        return (logits, frame_scores), {"backbone": ns_bb}

    # -- fine-tuning support -------------------------------------------------

    def trainable_mask(self, variables: Dict[str, Params],
                       freeze_backbone: bool = False,
                       unfreeze_blocks: int = 0) -> Params:
        """Boolean pytree: True = trainable. ``unfreeze_blocks=N`` keeps the
        last N backbone block-stages trainable even when frozen
        (≙ ``unfreeze_backbone``, reference :87-101); ``-1`` = all."""
        def head_mask(tree):
            return jax.tree_util.tree_map(lambda _: True, tree)

        params = variables["params"]
        mask = {k: head_mask(v) for k, v in params.items() if k != "backbone"}
        bb = params["backbone"]
        if not freeze_backbone or unfreeze_blocks == -1:
            mask["backbone"] = jax.tree_util.tree_map(lambda _: True, bb)
            return mask
        bmask = jax.tree_util.tree_map(lambda _: False, bb)
        if unfreeze_blocks > 0 and "blocks" in bb:
            stage_keys = sorted(bb["blocks"].keys(), key=int)
            for k in stage_keys[-unfreeze_blocks:]:
                bmask["blocks"][k] = jax.tree_util.tree_map(lambda _: True, bb["blocks"][k])
        elif unfreeze_blocks > 0:
            # resnet: layer4, layer3, ...
            layer_keys = sorted([k for k in bb if k.startswith("layer")])
            for k in layer_keys[-unfreeze_blocks:]:
                bmask[k] = jax.tree_util.tree_map(lambda _: True, bb[k])
        mask["backbone"] = bmask
        return mask


class EnsembleDetector:
    def __init__(
        self,
        backbone_names: Sequence[str] = ("efficientnet_b0", "resnet18"),
        num_classes: int = 2,
        dropout_rate: float = 0.5,
        ensemble_method: str = "average",
        compute_dtype: jnp.dtype = jnp.float32,
    ):
        self.backbone_names = tuple(backbone_names)
        self.num_classes = num_classes
        self.ensemble_method = ensemble_method
        self.members: List[BackboneDetector] = [
            BackboneDetector(n, num_classes, dropout_rate, True, compute_dtype)
            for n in backbone_names
        ]

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        keys = jax.random.split(rng, len(self.members))
        params: Params = {"models": {}}
        state: Params = {"models": {}}
        for i, (m, k) in enumerate(zip(self.members, keys)):
            v = m.init(k)
            params["models"][str(i)] = v["params"]
            state["models"][str(i)] = v["state"]
        if self.ensemble_method == "weighted":
            params["weights"] = jnp.full((len(self.members),), 1.0 / len(self.members))
        return {"params": params, "state": state}

    @property
    def homogeneous(self) -> bool:
        return len(set(self.backbone_names)) == 1

    def apply(
        self,
        variables: Dict[str, Params],
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
        return_member_logits: bool = False,
    ):
        p, s = variables["params"], variables["state"]
        n = len(self.members)
        new_state: Params = {"models": {}}
        if self.homogeneous:
            # identical architectures → stack member trees on a leading axis
            # and vmap: ONE batched XLA program instead of M sequential
            # subgraphs (SURVEY.md §7: heterogeneous defaults can't do this)
            member = self.members[0]
            stacked_p = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[p["models"][str(i)] for i in range(n)])
            stacked_s = jax.tree_util.tree_map(
                lambda *xs: jnp.stack(xs),
                *[s["models"][str(i)] for i in range(n)])
            rngs = jax.random.split(rng, n) if rng is not None else None

            def one(mp, ms, r):
                return member.apply({"params": mp, "state": ms}, x,
                                    train=train, rng=r)

            if rngs is None:
                (logits, scores), ns = jax.vmap(
                    lambda mp, ms: one(mp, ms, None))(stacked_p, stacked_s)
            else:
                (logits, scores), ns = jax.vmap(one)(stacked_p, stacked_s, rngs)
            for i in range(n):
                new_state["models"][str(i)] = jax.tree_util.tree_map(
                    lambda a: a[i], ns)
        else:
            logits_list, scores_list = [], []
            for i, m in enumerate(self.members):
                sub = None
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                (lg, sc), ns = m.apply(
                    {"params": p["models"][str(i)], "state": s["models"][str(i)]},
                    x, train=train, rng=sub)
                logits_list.append(lg)
                scores_list.append(sc)
                new_state["models"][str(i)] = ns
            logits = jnp.stack(logits_list)     # (M, B, C)
            scores = jnp.stack(scores_list)     # (M, B, T)

        if self.ensemble_method == "average":
            out_logits = jnp.mean(logits, axis=0)
            out_scores = jnp.mean(scores, axis=0)
        elif self.ensemble_method == "weighted":
            w = jax.nn.softmax(p["weights"])
            out_logits = jnp.sum(logits * w[:, None, None], axis=0)
            out_scores = jnp.sum(scores * w[:, None, None], axis=0)
        elif self.ensemble_method == "voting":
            preds = jnp.argmax(logits, axis=-1)                      # (M, B)
            counts = jnp.sum(jax.nn.one_hot(preds, self.num_classes), axis=0)  # (B, C)
            out_logits = jax.nn.one_hot(jnp.argmax(counts, axis=-1), self.num_classes)
            out_scores = jnp.mean(scores, axis=0)
        else:
            raise ValueError(f"Unknown ensemble method: {self.ensemble_method}")

        if return_member_logits:
            return (out_logits, out_scores, logits), new_state
        return (out_logits, out_scores), new_state
