"""ResNet-18/34/50, TPU-native.

Capability parity with the reference's torchvision ResNet backbones
(``src/pretrained_detector.py:37-40``). Param-tree dotted paths equal the
torchvision ``state_dict`` layout (``conv1.weight``, ``layer2.0.downsample.0.
weight`` …) so the torch bridge maps checkpoints directly. Uses the
torchvision v1.5 convention for Bottleneck (stride on the 3×3 conv).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]

_SPECS = {
    # block type, layers-per-stage, expansion, feature dim
    "resnet18": ("basic", (2, 2, 2, 2), 1, 512),
    "resnet34": ("basic", (3, 4, 6, 3), 1, 512),
    "resnet50": ("bottleneck", (3, 4, 6, 3), 4, 2048),
}


def _bn_init(ch: int) -> Tuple[Params, Params]:
    return ({"weight": I.ones(ch), "bias": I.zeros(ch)},
            {"running_mean": I.zeros(ch), "running_var": I.ones(ch)})


class ResNet:
    def __init__(self, variant: str = "resnet18", num_classes: int = 0,
                 compute_dtype: jnp.dtype = jnp.float32):
        self.variant = variant
        self.block_type, self.stage_sizes, self.expansion, self.feature_dim = _SPECS[variant]
        self.num_classes = num_classes
        self.compute_dtype = compute_dtype

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        n_keys = 4 + sum(self.stage_sizes) * 8
        keys = iter(jax.random.split(rng, n_keys))
        params: Params = {"conv1": {"weight": I.kaiming_normal(next(keys), (7, 7, 3, 64))}}
        state: Params = {}
        params["bn1"], state["bn1"] = _bn_init(64)

        in_ch = 64
        for li, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** li)
            out_ch = width * self.expansion
            pl: Params = {}
            sl: Params = {}
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                p, s = self._init_block(next(keys), in_ch, width, stride)
                pl[str(bi)] = p
                sl[str(bi)] = s
                in_ch = out_ch
            params[f"layer{li + 1}"] = pl
            state[f"layer{li + 1}"] = sl

        if self.num_classes > 0:
            k = next(keys)
            params["fc"] = {"weight": I.kaiming_uniform(k, (self.num_classes, self.feature_dim)),
                            "bias": I.zeros(self.num_classes)}
        return {"params": params, "state": state}

    def _init_block(self, rng, in_ch: int, width: int, stride: int) -> Tuple[Params, Params]:
        ks = iter(jax.random.split(rng, 8))
        p: Params = {}
        s: Params = {}
        out_ch = width * self.expansion
        if self.block_type == "basic":
            p["conv1"] = {"weight": I.kaiming_normal(next(ks), (3, 3, in_ch, width))}
            p["bn1"], s["bn1"] = _bn_init(width)
            p["conv2"] = {"weight": I.kaiming_normal(next(ks), (3, 3, width, width))}
            p["bn2"], s["bn2"] = _bn_init(width)
        else:
            p["conv1"] = {"weight": I.kaiming_normal(next(ks), (1, 1, in_ch, width))}
            p["bn1"], s["bn1"] = _bn_init(width)
            p["conv2"] = {"weight": I.kaiming_normal(next(ks), (3, 3, width, width))}
            p["bn2"], s["bn2"] = _bn_init(width)
            p["conv3"] = {"weight": I.kaiming_normal(next(ks), (1, 1, width, out_ch))}
            p["bn3"], s["bn3"] = _bn_init(out_ch)
        if stride != 1 or in_ch != out_ch:
            dp, ds = _bn_init(out_ch)
            p["downsample"] = {
                "0": {"weight": I.kaiming_normal(next(ks), (1, 1, in_ch, out_ch))},
                "1": dp,
            }
            s["downsample"] = {"1": ds}
        return p, s

    def apply(self, variables: Dict[str, Params], x: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, Params]:
        params, state = variables["params"], variables["state"]
        ns: Params = {}
        x = x.astype(self.compute_dtype)
        x = L.conv2d(params["conv1"], x, stride=2, padding=3)
        x, ns["bn1"] = L.batch_norm(params["bn1"], state["bn1"], x, train)
        x = jax.nn.relu(x)
        x = L.max_pool2d(x, 3, 2, 1)

        in_ch = 64
        for li, n_blocks in enumerate(self.stage_sizes):
            width = 64 * (2 ** li)
            lname = f"layer{li + 1}"
            nsl: Params = {}
            for bi in range(n_blocks):
                stride = 2 if (li > 0 and bi == 0) else 1
                x, nsb = self._apply_block(
                    params[lname][str(bi)], state[lname][str(bi)], x, width, stride, train)
                nsl[str(bi)] = nsb
                in_ch = width * self.expansion
            ns[lname] = nsl

        feats = L.global_avg_pool(x)
        if self.num_classes > 0:
            feats = L.linear(params["fc"], feats)
        return feats, ns

    def _apply_block(self, p: Params, s: Params, x: jnp.ndarray, width: int,
                     stride: int, train: bool) -> Tuple[jnp.ndarray, Params]:
        ns: Params = {}
        identity = x
        if self.block_type == "basic":
            y = L.conv2d(p["conv1"], x, stride=stride, padding=1)
            y, ns["bn1"] = L.batch_norm(p["bn1"], s["bn1"], y, train)
            y = jax.nn.relu(y)
            y = L.conv2d(p["conv2"], y, stride=1, padding=1)
            y, ns["bn2"] = L.batch_norm(p["bn2"], s["bn2"], y, train)
        else:
            y = L.conv2d(p["conv1"], x, stride=1, padding=0)
            y, ns["bn1"] = L.batch_norm(p["bn1"], s["bn1"], y, train)
            y = jax.nn.relu(y)
            y = L.conv2d(p["conv2"], y, stride=stride, padding=1)
            y, ns["bn2"] = L.batch_norm(p["bn2"], s["bn2"], y, train)
            y = jax.nn.relu(y)
            y = L.conv2d(p["conv3"], y, stride=1, padding=0)
            y, ns["bn3"] = L.batch_norm(p["bn3"], s["bn3"], y, train)
        if "downsample" in p:
            identity = L.conv2d(p["downsample"]["0"], x, stride=stride, padding=0)
            identity, ns_ds = L.batch_norm(p["downsample"]["1"], s["downsample"]["1"],
                                           identity, train)
            ns["downsample"] = {"1": ns_ds}
        return jax.nn.relu(y + identity), ns
