"""EfficientNet family, TPU-native.

Capability parity with the reference's timm-backed EfficientNet backbone
(``src/pretrained_detector.py:42-49`` builds ``timm.create_model(
"efficientnet_b0")`` and uses its 1280-d pooled features). This is a
from-scratch JAX implementation:

* one jitted pure function for the whole network — XLA fuses BN/SiLU/SE
  elementwise chains into the surrounding convs and schedules them on the MXU;
* NHWC activations / HWIO kernels (TPU-native layouts);
* parameter tree whose dotted paths equal the timm ``state_dict`` key layout
  (``conv_stem.weight``, ``blocks.3.1.conv_pwl.weight`` …) so the torch
  checkpoint bridge is a pure key-path + transpose mapping;
* stochastic depth (drop-path) for training parity with timm defaults.

Architecture spec follows the EfficientNet paper (Tan & Le, 2019) scaling
rules; B0's stage table is written out explicitly below.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]


@dataclass(frozen=True)
class BlockSpec:
    kind: str          # 'ds' (depthwise-separable) or 'ir' (inverted residual)
    in_ch: int
    out_ch: int
    kernel: int
    stride: int
    expand: int
    se_ratio: float = 0.25


# EfficientNet-B0 stage table: (kind, out_ch, repeats, stride, kernel, expand)
_B0_STAGES = [
    ("ds", 16, 1, 1, 3, 1),
    ("ir", 24, 2, 2, 3, 6),
    ("ir", 40, 2, 2, 5, 6),
    ("ir", 80, 3, 2, 3, 6),
    ("ir", 112, 3, 1, 5, 6),
    ("ir", 192, 4, 2, 5, 6),
    ("ir", 320, 1, 1, 3, 6),
]


def _round_channels(ch: float, multiplier: float, divisor: int = 8) -> int:
    """EfficientNet channel rounding (paper Appendix; keeps multiples of 8)."""
    ch *= multiplier
    new_ch = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new_ch < 0.9 * ch:
        new_ch += divisor
    return int(new_ch)


_VARIANTS = {
    # width_mult, depth_mult, head feature dim
    "b0": (1.0, 1.0, 1280),
    "b1": (1.0, 1.1, 1280),
    "b2": (1.1, 1.2, 1408),
    "b3": (1.2, 1.4, 1536),
    "b4": (1.4, 1.8, 1792),
}


def _build_specs(variant: str) -> Tuple[int, List[List[BlockSpec]], int]:
    width, depth, head_ch = _VARIANTS[variant]
    stem_ch = _round_channels(32, width)
    stages: List[List[BlockSpec]] = []
    in_ch = stem_ch
    for kind, out, repeats, stride, kernel, expand in _B0_STAGES:
        out_ch = _round_channels(out, width)
        reps = int(math.ceil(repeats * depth))
        blocks = []
        for j in range(reps):
            blocks.append(BlockSpec(
                kind=kind, in_ch=in_ch, out_ch=out_ch, kernel=kernel,
                stride=stride if j == 0 else 1, expand=expand))
            in_ch = out_ch
        stages.append(blocks)
    return stem_ch, stages, head_ch


def _bn_init(ch: int) -> Tuple[Params, Params]:
    return ({"weight": I.ones(ch), "bias": I.zeros(ch)},
            {"running_mean": I.zeros(ch), "running_var": I.ones(ch)})


class EfficientNet:
    """Functional EfficientNet. ``num_classes=0`` → pooled features.

    ``apply`` signature: ``(variables, x NHWC float, train, rng) ->
    (features_or_logits, new_state)``.
    """

    def __init__(
        self,
        variant: str = "b0",
        num_classes: int = 0,
        bn_eps: float = 1e-5,
        bn_momentum: float = 0.1,
        drop_path_rate: float = 0.2,
        compute_dtype: jnp.dtype = jnp.float32,
    ):
        self.variant = variant
        self.num_classes = num_classes
        self.bn_eps = bn_eps
        self.bn_momentum = bn_momentum
        self.drop_path_rate = drop_path_rate
        self.compute_dtype = compute_dtype
        self.stem_ch, self.stages, self.head_ch = _build_specs(variant)
        self.feature_dim = self.head_ch
        self.num_blocks = sum(len(s) for s in self.stages)

    # -- init ---------------------------------------------------------------

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        keys = iter(jax.random.split(rng, 4 * self.num_blocks + 8))
        params: Params = {}
        state: Params = {}

        params["conv_stem"] = {"weight": I.kaiming_normal(next(keys), (3, 3, 3, self.stem_ch))}
        params["bn1"], state["bn1"] = _bn_init(self.stem_ch)

        pb: Params = {}
        sb: Params = {}
        for si, stage in enumerate(self.stages):
            pstage: Params = {}
            sstage: Params = {}
            for bi, spec in enumerate(stage):
                p, s = self._init_block(next(keys), spec)
                pstage[str(bi)] = p
                sstage[str(bi)] = s
            pb[str(si)] = pstage
            sb[str(si)] = sstage
        params["blocks"] = pb
        state["blocks"] = sb

        last_ch = self.stages[-1][-1].out_ch
        params["conv_head"] = {"weight": I.kaiming_normal(next(keys), (1, 1, last_ch, self.head_ch))}
        params["bn2"], state["bn2"] = _bn_init(self.head_ch)

        if self.num_classes > 0:
            k = next(keys)
            params["classifier"] = {
                "weight": I.kaiming_uniform(k, (self.num_classes, self.head_ch)),
                "bias": I.zeros(self.num_classes),
            }
        return {"params": params, "state": state}

    def _init_block(self, rng: jax.Array, spec: BlockSpec) -> Tuple[Params, Params]:
        ks = iter(jax.random.split(rng, 8))
        p: Params = {}
        s: Params = {}
        mid = spec.in_ch * spec.expand
        rd = max(1, int(spec.in_ch * spec.se_ratio))
        if spec.kind == "ds":
            p["conv_dw"] = {"weight": I.kaiming_normal(next(ks), (spec.kernel, spec.kernel, 1, spec.in_ch))}
            p["bn1"], s["bn1"] = _bn_init(spec.in_ch)
            p["se"] = {
                "conv_reduce": {"weight": I.kaiming_normal(next(ks), (1, 1, spec.in_ch, rd)),
                                "bias": I.zeros(rd)},
                "conv_expand": {"weight": I.kaiming_normal(next(ks), (1, 1, rd, spec.in_ch)),
                                "bias": I.zeros(spec.in_ch)},
            }
            p["conv_pw"] = {"weight": I.kaiming_normal(next(ks), (1, 1, spec.in_ch, spec.out_ch))}
            p["bn2"], s["bn2"] = _bn_init(spec.out_ch)
        else:
            p["conv_pw"] = {"weight": I.kaiming_normal(next(ks), (1, 1, spec.in_ch, mid))}
            p["bn1"], s["bn1"] = _bn_init(mid)
            p["conv_dw"] = {"weight": I.kaiming_normal(next(ks), (spec.kernel, spec.kernel, 1, mid))}
            p["bn2"], s["bn2"] = _bn_init(mid)
            p["se"] = {
                "conv_reduce": {"weight": I.kaiming_normal(next(ks), (1, 1, mid, rd)),
                                "bias": I.zeros(rd)},
                "conv_expand": {"weight": I.kaiming_normal(next(ks), (1, 1, rd, mid)),
                                "bias": I.zeros(mid)},
            }
            p["conv_pwl"] = {"weight": I.kaiming_normal(next(ks), (1, 1, mid, spec.out_ch))}
            p["bn3"], s["bn3"] = _bn_init(spec.out_ch)
        return p, s

    # -- apply --------------------------------------------------------------

    def apply(
        self,
        variables: Dict[str, Params],
        x: jnp.ndarray,
        train: bool = False,
        rng: Optional[jax.Array] = None,
    ) -> Tuple[jnp.ndarray, Params]:
        params, state = variables["params"], variables["state"]
        new_state: Params = {"blocks": {}}
        x = x.astype(self.compute_dtype)

        x = L.conv2d(params["conv_stem"], x, stride=2, padding=1)
        x, new_state["bn1"] = L.batch_norm(
            params["bn1"], state["bn1"], x, train, self.bn_eps, self.bn_momentum)
        x = jax.nn.silu(x)

        block_idx = 0
        for si, stage in enumerate(self.stages):
            ns_stage: Params = {}
            for bi, spec in enumerate(stage):
                dp = self.drop_path_rate * block_idx / max(self.num_blocks - 1, 1)
                if rng is not None:
                    rng, sub = jax.random.split(rng)
                else:
                    sub = None
                x, ns = self._apply_block(
                    params["blocks"][str(si)][str(bi)],
                    state["blocks"][str(si)][str(bi)],
                    x, spec, train, dp, sub)
                ns_stage[str(bi)] = ns
                block_idx += 1
            new_state["blocks"][str(si)] = ns_stage

        x = L.conv2d(params["conv_head"], x, stride=1, padding=0)
        x, new_state["bn2"] = L.batch_norm(
            params["bn2"], state["bn2"], x, train, self.bn_eps, self.bn_momentum)
        x = jax.nn.silu(x)
        feats = L.global_avg_pool(x)

        if self.num_classes > 0:
            feats = L.linear(params["classifier"], feats)
        return feats, new_state

    def _apply_block(
        self,
        p: Params,
        s: Params,
        x: jnp.ndarray,
        spec: BlockSpec,
        train: bool,
        dp_rate: float,
        rng: Optional[jax.Array],
    ) -> Tuple[jnp.ndarray, Params]:
        ns: Params = {}
        shortcut = x
        pad = spec.kernel // 2
        if spec.kind == "ds":
            y = L.conv2d(p["conv_dw"], x, stride=spec.stride, padding=pad, groups=spec.in_ch)
            y, ns["bn1"] = L.batch_norm(p["bn1"], s["bn1"], y, train, self.bn_eps, self.bn_momentum)
            y = jax.nn.silu(y)
            y = _squeeze_excite(p["se"], y)
            y = L.conv2d(p["conv_pw"], y, stride=1, padding=0)
            y, ns["bn2"] = L.batch_norm(p["bn2"], s["bn2"], y, train, self.bn_eps, self.bn_momentum)
        else:
            mid = spec.in_ch * spec.expand
            y = L.conv2d(p["conv_pw"], x, stride=1, padding=0)
            y, ns["bn1"] = L.batch_norm(p["bn1"], s["bn1"], y, train, self.bn_eps, self.bn_momentum)
            y = jax.nn.silu(y)
            y = L.conv2d(p["conv_dw"], y, stride=spec.stride, padding=pad, groups=mid)
            y, ns["bn2"] = L.batch_norm(p["bn2"], s["bn2"], y, train, self.bn_eps, self.bn_momentum)
            y = jax.nn.silu(y)
            y = _squeeze_excite(p["se"], y)
            y = L.conv2d(p["conv_pwl"], y, stride=1, padding=0)
            y, ns["bn3"] = L.batch_norm(p["bn3"], s["bn3"], y, train, self.bn_eps, self.bn_momentum)
        if spec.stride == 1 and spec.in_ch == spec.out_ch:
            y = L.drop_path(rng, y, dp_rate, train) + shortcut
        return y, ns


def _squeeze_excite(p: Params, x: jnp.ndarray) -> jnp.ndarray:
    """SE block: global-pool → reduce(SiLU) → expand(sigmoid) gate."""
    pooled = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True).astype(x.dtype)
    g = L.conv2d(p["conv_reduce"], pooled, stride=1, padding=0)
    g = jax.nn.silu(g)
    g = L.conv2d(p["conv_expand"], g, stride=1, padding=0)
    return x * jax.nn.sigmoid(g)
