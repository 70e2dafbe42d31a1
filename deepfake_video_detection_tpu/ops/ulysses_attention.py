"""Ulysses attention: sequence parallelism via head-dimension all-to-all.

The second sequence-parallel strategy next to ``ops/ring_attention.py``
(SURVEY.md §2.6 checklist). Where ring attention keeps the sequence sharded
and rotates KV blocks around the ICI ring, Ulysses (DeepSpeed-Ulysses,
arXiv:2309.14509) RESHARDS: an all-to-all converts the sequence-sharded
layout (B, H, N/s, d) into a head-sharded layout (B, H/s, N, d), every chip
then runs plain full attention over its head subset with the WHOLE sequence
local, and a second all-to-all restores the sequence sharding.

Trade-off on TPU: two all-to-alls move 4·B·H·N·d/s elements total but the
attention itself needs no per-step collectives and no flash-combine math, so
Ulysses wins when the head count comfortably divides over the mesh and the
sequence is short enough for one chip to hold (N, N/heads-group) score
blocks; ring attention wins at extreme N (memory stays O(N/s)). Both are
exact; both compose with data parallelism on an orthogonal mesh axis.

Requires H % mesh.shape[seq_axis] == 0 and N % mesh.shape[seq_axis] == 0.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
try:  # jax.shard_map is the stable home (>= 0.4.35)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def ulysses_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "model",
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Exact softmax(QKᵀ/√d)V with N sharded over ``seq_axis``.

    ``q, k, v``: (B, H, N, d) global shapes, sequence axis N sharded over
    ``seq_axis`` (same contract as ``ring_attention``). Batch additionally
    sharded over ``batch_axis`` when given.
    """
    d = q.shape[-1]
    h = q.shape[1]
    scale = 1.0 / math.sqrt(d)
    s = mesh.shape[seq_axis]
    if h % s != 0:
        raise ValueError(
            f"ulysses needs num_heads ({h}) divisible by the seq-parallel "
            f"degree ({s}); use ring_attention otherwise")
    n = q.shape[2]
    if n % s != 0:
        raise ValueError(
            f"ulysses needs the global sequence length ({n}) divisible by "
            f"the seq-parallel degree ({s}) — pad the sequence or pick a "
            f"mesh whose '{seq_axis}' axis divides it")

    def local(qs, ks, vs):
        # qs/ks/vs: (B_shard, H, N/s, d) — seq-sharded layout.
        # all-to-all: split the head axis s ways, concat the seq axis →
        # (B_shard, H/s, N, d): each chip now owns H/s heads, full sequence.
        def to_heads(x):
            return jax.lax.all_to_all(x, seq_axis, split_axis=1,
                                      concat_axis=2, tiled=True)

        qh, kh, vh = to_heads(qs), to_heads(ks), to_heads(vs)
        sc = jnp.einsum("bhnd,bhmd->bhnm", qh.astype(jnp.float32),
                        kh.astype(jnp.float32),
                        preferred_element_type=jnp.float32) * scale
        a = jax.nn.softmax(sc, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", a, vh.astype(jnp.float32),
                         preferred_element_type=jnp.float32).astype(qs.dtype)
        # reverse all-to-all: split seq, concat heads → (B_shard, H, N/s, d)
        return jax.lax.all_to_all(out, seq_axis, split_axis=2,
                                  concat_axis=1, tiled=True)

    bspec = batch_axis if batch_axis and batch_axis in mesh.shape else None
    spec = P(bspec, None, seq_axis, None)
    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    try:  # stable jax.shard_map renamed check_rep → check_vma
        wrapped = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        wrapped = shard_map(local, check_rep=False, **kwargs)
    return wrapped(q, k, v)
