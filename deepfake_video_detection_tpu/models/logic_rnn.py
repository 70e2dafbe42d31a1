"""Logic-gated LSTM ("Logic RNN"), TPU-native.

Capability parity with the reference's legacy ``LogicRNNLSTM``
(``src/RNNModel.py:43-170``): an LSTM cell augmented with AND/OR/NOT gate
mixing, stacked ``num_layers`` deep, additive attention over time, sigmoid
binary head.

The reference unrolls time in a Python loop (``:103-115``); here the time axis
is a single ``lax.scan`` whose carry is the last layer's ``(h, c)`` —
replicating the reference's (idiosyncratic) carry semantics exactly: one
shared ``(h, c)`` threads through the layer stack within a step, and the
post-stack values carry to the next step. Param paths mirror
``logic_cells.{i}.{and,or,not,forget,input,cell,output}_gate`` etc.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.nn import init as I
from deepfake_video_detection_tpu.nn import layers as L

Params = Dict[str, Any]

_GATES = ("and_gate", "or_gate", "not_gate", "forget_gate",
          "input_gate", "cell_gate", "output_gate")


def _lin_init(key, out_d, in_d):
    kw, kb = jax.random.split(key)
    return {"weight": I.kaiming_uniform(kw, (out_d, in_d)),
            "bias": I.uniform_bias(kb, (out_d,), in_d)}


def _logic_cell(p: Params, x: jnp.ndarray, h: jnp.ndarray, c: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    comb = jnp.concatenate([x, h], axis=-1)
    and_out = jax.nn.sigmoid(L.linear(p["and_gate"], comb))
    or_out = jax.nn.sigmoid(L.linear(p["or_gate"], comb))
    not_out = jnp.tanh(L.linear(p["not_gate"], h))
    forget = jax.nn.sigmoid(L.linear(p["forget_gate"], comb))
    input_g = jax.nn.sigmoid(L.linear(p["input_gate"], comb))
    cell_tilde = jnp.tanh(L.linear(p["cell_gate"], comb))
    c_new = forget * c + input_g * cell_tilde
    c_logic = and_out * c_new + or_out * not_out
    out = jax.nn.sigmoid(L.linear(p["output_gate"], comb))
    h_new = out * jnp.tanh(c_logic)
    return h_new, c_logic


class LogicRNNLSTM:
    def __init__(self, input_size: int = 1024, hidden_size: int = 512,
                 num_layers: int = 2, dropout: float = 0.5):
        self.input_size = input_size
        self.hidden_size = hidden_size
        self.num_layers = num_layers
        self.dropout = dropout

    def init(self, rng: jax.Array) -> Dict[str, Params]:
        keys = iter(jax.random.split(rng, 7 * self.num_layers + 4))
        H = self.hidden_size
        cells: Params = {}
        for i in range(self.num_layers):
            in_dim = self.input_size if i == 0 else H
            cell: Params = {}
            for g in _GATES:
                gd = H if g == "not_gate" else in_dim + H
                cell[g] = _lin_init(next(keys), H, gd)
            cells[str(i)] = cell
        params: Params = {
            "logic_cells": cells,
            "attention": {"0": _lin_init(next(keys), H, H),
                          "2": _lin_init(next(keys), 1, H)},
            "classifier": {"0": _lin_init(next(keys), H, H),
                           "3": _lin_init(next(keys), 1, H)},
        }
        return {"params": params, "state": {}}

    def apply(self, variables: Dict[str, Params], x: jnp.ndarray,
              lengths: Optional[jnp.ndarray] = None, train: bool = False,
              rng: Optional[jax.Array] = None) -> Tuple[jnp.ndarray, Params]:
        """``x``: (B, T, input_size) face embeddings. Returns sigmoid probs (B, 1)."""
        p = variables["params"]
        B, T, _ = x.shape
        H = self.hidden_size
        cells = [p["logic_cells"][str(i)] for i in range(self.num_layers)]

        def step(carry, x_t):
            h, c = carry
            h_t, c_t = h, c
            for i, cell in enumerate(cells):
                h_t, c_t = _logic_cell(cell, x_t if i == 0 else h_t, h_t, c_t)
            return (h_t, c_t), h_t

        h0 = jnp.zeros((B, H), x.dtype)
        c0 = jnp.zeros((B, H), x.dtype)
        _, outputs = jax.lax.scan(step, (h0, c0), jnp.swapaxes(x, 0, 1))
        outputs = jnp.swapaxes(outputs, 0, 1)                 # (B, T, H)

        if lengths is not None:
            mask = (jnp.arange(T)[None, :] < lengths[:, None]).astype(outputs.dtype)
            outputs = outputs * mask[..., None]

        a = jnp.tanh(L.linear(p["attention"]["0"], outputs))
        a = L.linear(p["attention"]["2"], a)
        attn = jax.nn.softmax(a, axis=1)                      # (B, T, 1)
        context = jnp.sum(attn * outputs, axis=1)

        r = None
        if rng is not None:
            rng, r = jax.random.split(rng)
        h = jax.nn.relu(L.linear(p["classifier"]["0"], context))
        h = L.dropout(r, h, self.dropout, train)
        out = L.linear(p["classifier"]["3"], h)
        return jax.nn.sigmoid(out.astype(jnp.float32)), {}

    def predict(self, variables: Dict[str, Params], x: jnp.ndarray,
                lengths: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        probs, _ = self.apply(variables, x, lengths)
        return (probs >= 0.5).astype(jnp.float32)


def create_model(config: Optional[Dict[str, Any]] = None) -> LogicRNNLSTM:
    """Factory mirroring the reference's ``create_model`` (``src/RNNModel.py:149``)."""
    config = config or {}
    return LogicRNNLSTM(
        input_size=config.get("input_size", 1024),
        hidden_size=config.get("hidden_size", 512),
        num_layers=config.get("num_layers", 2),
        dropout=config.get("dropout", 0.5),
    )
