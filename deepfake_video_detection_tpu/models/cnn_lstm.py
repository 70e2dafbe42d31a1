"""CNN+LSTM temporal classifier, TPU-native.

Capability parity with the reference's ``CNNLSTMHybrid`` (``src/models.py:20-85``):
4-block scratch CNN per frame → 2-layer LSTM → additive attention over time →
MLP classifier. Differences by design: the CNN runs over the flattened (B·T)
frame batch in NHWC, the LSTM is the scan-based kernel from ``nn.layers``
(input projection hoisted to one MXU matmul), and the whole model is a single
jitted function. Param paths mirror the reference's ``nn.Sequential`` indices
(``cnn.0`` … ``cnn.13``, ``lstm.weight_ih_l0``, ``attention.0``,
``classifier.0``) for checkpoint-bridge compatibility.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]

# (conv index, bn index, in_ch, out_ch, kernel, stride, pad, pool_after)
_CNN_SPEC = [
    ("0", "1", 3, 64, 7, 2, 3, True),
    ("4", "5", 64, 128, 5, 1, 2, True),
    ("8", "9", 128, 256, 3, 1, 1, True),
    ("12", "13", 256, 512, 3, 1, 1, False),
]


class CNNLSTMHybrid:
    def __init__(self, input_channels: int = 3, hidden_size: int = 256,
                 num_layers: int = 2, num_classes: int = 2, dropout: float = 0.3,
                 compute_dtype: jnp.dtype = jnp.float32):
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.num_classes = num_classes
        self.dropout = dropout
        self.compute_dtype = compute_dtype
        self.cnn_out_features = 512

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        keys = iter(jax.random.split(rng, 32))
        cnn_p: Params = {}
        cnn_s: Params = {}
        for ci, bi, cin, cout, k, _, _, _ in _CNN_SPEC:
            kw, kb = jax.random.split(next(keys))
            fan_in = cin * k * k
            cnn_p[ci] = {"weight": I.kaiming_uniform(kw, (k, k, cin, cout)),
                         "bias": I.uniform_bias(kb, (cout,), fan_in)}
            cnn_p[bi] = {"weight": I.ones(cout), "bias": I.zeros(cout)}
            cnn_s[bi] = {"running_mean": I.zeros(cout), "running_var": I.ones(cout)}

        H, F = self.hidden_size, self.cnn_out_features
        lstm_p: Params = {}
        for layer in range(self.num_layers):
            in_dim = F if layer == 0 else H
            k1, k2, k3, k4 = jax.random.split(next(keys), 4)
            lstm_p[f"weight_ih_l{layer}"] = I.uniform_bias(k1, (4 * H, in_dim), H)
            lstm_p[f"weight_hh_l{layer}"] = I.uniform_bias(k2, (4 * H, H), H)
            lstm_p[f"bias_ih_l{layer}"] = I.uniform_bias(k3, (4 * H,), H)
            lstm_p[f"bias_hh_l{layer}"] = I.uniform_bias(k4, (4 * H,), H)

        def lin(key, out_d, in_d):
            kw, kb = jax.random.split(key)
            return {"weight": I.kaiming_uniform(kw, (out_d, in_d)),
                    "bias": I.uniform_bias(kb, (out_d,), in_d)}

        params: Params = {
            "cnn": cnn_p,
            "lstm": lstm_p,
            "attention": {"0": lin(next(keys), H, H), "2": lin(next(keys), 1, H)},
            "classifier": {"0": lin(next(keys), 128, H),
                           "3": lin(next(keys), self.num_classes, 128)},
        }
        return {"params": params, "state": {"cnn": cnn_s}}

    def _cnn(self, p: Params, s: Params, x: jnp.ndarray, train: bool) -> Tuple[jnp.ndarray, Params]:
        ns: Params = {}
        for ci, bi, _, _, k, stride, pad, pool in _CNN_SPEC:
            x = L.conv2d(p[ci], x, stride=stride, padding=pad)
            x, ns[bi] = L.batch_norm(p[bi], s[bi], x, train)
            x = jax.nn.relu(x)
            if pool:
                x = L.max_pool2d(x, 3, 2, 1)
        return L.global_avg_pool(x), ns

    def apply(self, variables: Dict[str, Params], x: jnp.ndarray,
              train: bool = False, rng: Optional[jax.Array] = None
              ) -> Tuple[jnp.ndarray, Params]:
        """``x``: (B, T, H, W, C). Returns (logits (B, num_classes), new_state)."""
        p, s = variables["params"], variables["state"]
        B, T = x.shape[0], x.shape[1]
        x = x.astype(self.compute_dtype)
        feats, ns_cnn = self._cnn(p["cnn"], s["cnn"], x.reshape((B * T,) + x.shape[2:]), train)
        feats = feats.reshape(B, T, self.cnn_out_features)

        lstm_layers = [
            {"weight_ih": p["lstm"][f"weight_ih_l{k}"],
             "weight_hh": p["lstm"][f"weight_hh_l{k}"],
             "bias_ih": p["lstm"][f"bias_ih_l{k}"],
             "bias_hh": p["lstm"][f"bias_hh_l{k}"]}
            for k in range(self.num_layers)
        ]
        r1 = r2 = None
        if rng is not None:
            rng, r1, r2 = jax.random.split(rng, 3)
        seq, _ = L.lstm(lstm_layers, feats.astype(jnp.float32),
                        dropout_rate=self.dropout if self.num_layers > 1 else 0.0,
                        train=train, rng=r1)

        a = L.linear(p["attention"]["0"], seq)
        a = jnp.tanh(a)
        a = L.linear(p["attention"]["2"], a)                  # (B, T, 1)
        attn = jax.nn.softmax(a, axis=1)
        context = jnp.sum(attn * seq, axis=1)                 # (B, H)

        h = jax.nn.relu(L.linear(p["classifier"]["0"], context))
        h = L.dropout(r2, h, self.dropout, train)
        logits = L.linear(p["classifier"]["3"], h).astype(jnp.float32)
        return logits, {"cnn": ns_cnn}
