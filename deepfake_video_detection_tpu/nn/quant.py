"""Int8 weight-only quantization for serving (beyond reference parity).

The reference serves f32 torch weights as-is; this framework already serves
bf16 activations with f32 params (``COMPUTE_DTYPE``, serve/loader.py). This
module adds the next rung on the TPU serving ladder: **weights at rest in
int8**, dequantized inside the jitted forward.

Why this is the TPU-native shape of quantization:

* Serving forwards at production batch sizes are frequently **HBM-bound on
  weight traffic**, not MXU-bound. Storing weights as int8 (+ one f32 scale
  per output channel) halves weight bytes vs bf16 and quarters them vs f32;
  XLA keeps the int8 tensor in HBM and fuses the ``q * scale`` dequant into
  the matmul/conv read, so the MXU still computes in bf16/f32 with f32
  accumulation — no accuracy cliff from int8 *arithmetic*.
* No layer rewrites: ``Int8Weight`` is a registered pytree node whose
  ``astype(dtype)`` dequantizes, so ``nn.layers.linear`` / ``conv2d`` /
  ``multi_head_attention`` (which all read ``p["weight"].astype(x.dtype)``)
  work unchanged, as does ensemble tree-stacking and ``jax.device_put``.

Scheme: symmetric per-output-channel, ``q = round(w / s)`` clipped to
[-127, 127] with ``s = max|w| / 127`` over the non-output axes (torch
``(out, in)`` linears → axis 0; HWIO convs → axis 3). Per-element error is
bounded by ``s/2``. 1-D leaves (norms, biases) and small leaves stay f32.

Enable in serving with ``QUANTIZE=int8`` (serve/loader.py) or explicitly via
``quantize_variables``.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

Params = Dict[str, Any]

_QMAX = 127.0


@jax.tree_util.register_pytree_node_class
class Int8Weight:
    """An int8-quantized weight that dequantizes on ``astype``.

    ``q``: int8, the original weight's shape. ``scale``: f32, the same ndim
    with size 1 everywhere except the output-channel axis — so dequant is a
    single broadcast multiply XLA fuses into the consuming matmul/conv.
    """

    def __init__(self, q: jnp.ndarray, scale: jnp.ndarray):
        self.q = q
        self.scale = scale

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        return (self.q, self.scale), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        q, scale = children
        return cls(q, scale)

    # -- array-ish surface (what the layer fns / models actually touch) ----
    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):
        # the *logical* dtype: consumers that branch on floating-ness (e.g.
        # optax masks, dtype promotion) should see the dequantized view
        return jnp.float32

    def astype(self, dtype) -> jnp.ndarray:
        """Dequantize to ``dtype``. The multiply happens in f32 before the
        downcast so bf16 targets don't quantize the *scales* too."""
        w = self.q.astype(jnp.float32) * self.scale
        return w.astype(dtype)

    def __jax_array__(self) -> jnp.ndarray:
        # lets any jnp op consume the leaf directly (jnp.asarray honours this)
        return self.astype(jnp.float32)

    @property
    def T(self) -> jnp.ndarray:
        return self.astype(jnp.float32).T

    def __repr__(self) -> str:
        return f"Int8Weight(shape={tuple(self.q.shape)}, axis_scales={tuple(self.scale.shape)})"


def _out_axis(ndim: int) -> int:
    """Output-channel axis by this repo's layout conventions: torch-layout
    ``(out, in)`` 2-D linears → 0; HWIO 4-D conv kernels → 3."""
    return 0 if ndim == 2 else 3


def quantize_weight(w) -> Int8Weight:
    """Symmetric per-output-channel int8 quantization of one weight leaf.

    Pure HOST-side numpy: quantization is a load-time transform over
    checkpoint arrays, and eager per-leaf jnp ops would dispatch hundreds of
    tiny programs through the TPU relay at server start (seconds-to-minutes
    in a bad window). The quantized tree reaches the device later in ONE
    ``jax.device_put``; the dequant multiply runs inside the jitted forward.
    """
    axis = _out_axis(w.ndim)
    reduce_axes = tuple(i for i in range(w.ndim) if i != axis)
    wf = np.asarray(w, np.float32)
    amax = np.max(np.abs(wf), axis=reduce_axes, keepdims=True)
    scale = np.where(amax > 0, amax / _QMAX, np.float32(1.0)).astype(np.float32)
    # np.rint == jnp.round (round-half-to-even), so the numerics match the
    # previous on-device implementation bit-for-bit
    q = np.clip(np.rint(wf / scale), -_QMAX, _QMAX).astype(np.int8)
    return Int8Weight(q, scale)


def _is_quantizable(key: str, leaf: Any, min_elems: int) -> bool:
    if not key.endswith("weight") or isinstance(leaf, Int8Weight):
        return False
    if not hasattr(leaf, "ndim") or leaf.ndim not in (2, 4):
        return False  # norms/biases (1-D), embeddings kept f32
    # dtype-metadata check only — no jnp.asarray, which would eagerly move
    # the leaf to the default device one dispatch at a time
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return False
    return leaf.size >= min_elems


def quantize_tree(tree: Params, min_elems: int = 4096) -> Tuple[Params, int]:
    """Replace every matmul/conv ``weight`` leaf of ``tree`` (a nested dict)
    with an :class:`Int8Weight`. Leaves smaller than ``min_elems`` (heads,
    norms, the MoE router) stay f32 — they're HBM-negligible and often
    accuracy-sensitive. Returns ``(new_tree, n_quantized)``."""
    n = 0

    def walk(node):
        nonlocal n
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if not isinstance(v, dict) and _is_quantizable(k, v, min_elems):
                out[k] = quantize_weight(v)
                n += 1
            else:
                out[k] = walk(v)
        return out

    return walk(tree), n


def dequantize_tree(node: Params) -> Params:
    """Inverse view: every ``Int8Weight`` back to a plain f32 array (lossy —
    you get the quantized values, not the originals)."""
    if isinstance(node, Int8Weight):
        return node.astype(jnp.float32)
    if isinstance(node, dict):
        return {k: dequantize_tree(v) for k, v in node.items()}
    return node


def quantize_variables(variables: Params, min_elems: int = 4096) -> Tuple[Params, int]:
    """Quantize ``variables['params']`` (batch-norm ``state`` and everything
    else pass through untouched). Returns ``(variables, n_quantized)``."""
    qparams, n = quantize_tree(variables["params"], min_elems=min_elems)
    out = dict(variables)
    out["params"] = qparams
    return out, n


def quantized_bytes(tree: Params) -> Tuple[int, int]:
    """(bytes_now, bytes_if_f32) over the tree — the HBM-at-rest saving."""
    now = tot = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        now += leaf.size * leaf.dtype.itemsize
        tot += leaf.size * 4
    return now, tot
