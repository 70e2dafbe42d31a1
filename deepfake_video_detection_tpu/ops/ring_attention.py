"""Ring attention: exact attention over a sequence sharded across the mesh.

The sequence-parallel path SURVEY.md §5.7 plans for: the reference avoids
long clips by capping T at 16-64 frames; this framework instead scales the
frame axis across chips. Queries stay resident; key/value shards rotate
around the ring with ``jax.lax.ppermute`` (ICI neighbour exchange), and each
device folds every visiting block into flash-style running (max, sum, acc)
statistics — exact softmax attention with O(N/d_ring) memory per chip and
communication fully overlapped with the local block matmuls by XLA's
latency-hiding scheduler.

Built on ``shard_map`` so the collective pattern is explicit; composes with
data-parallel batch sharding on an orthogonal mesh axis.
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

_NEG_INF = -1e30


def _local_flash_block(q, k, v, scale):
    """One (q-shard × kv-block) contribution: returns (scores-max, exp-sum,
    weighted-acc) for the flash combine."""
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k,
                   preferred_element_type=jnp.float32) * scale
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32),
                     preferred_element_type=jnp.float32)
    return m, l, acc


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mesh: Mesh,
    seq_axis: str = "model",
    batch_axis: Optional[str] = "data",
) -> jnp.ndarray:
    """Exact softmax(QKᵀ/√d)V with N sharded over ``seq_axis``.

    ``q, k, v``: (B, H, N, d) global shapes; N must divide by the ring size.
    Batch is additionally sharded over ``batch_axis`` when given.
    """
    d = q.shape[-1]
    scale = 1.0 / math.sqrt(d)
    ring = mesh.shape[seq_axis]

    def local(qs, ks, vs):
        # qs/ks/vs: (B_shard, H, N/ring, d) local shards
        axis_idx = jax.lax.axis_index(seq_axis)
        perm = [(i, (i + 1) % ring) for i in range(ring)]

        m0, l0, acc0 = _local_flash_block(
            qs.astype(jnp.float32), ks.astype(jnp.float32), vs, scale)

        def step(carry, _):
            m, l, acc, kb, vb = carry
            # rotate kv to the next neighbour over ICI, then fold it in
            kb = jax.lax.ppermute(kb, seq_axis, perm)
            vb = jax.lax.ppermute(vb, seq_axis, perm)
            mb, lb, accb = _local_flash_block(
                qs.astype(jnp.float32), kb.astype(jnp.float32), vb, scale)
            m_new = jnp.maximum(m, mb)
            alpha = jnp.exp(m - m_new)
            beta = jnp.exp(mb - m_new)
            l_new = l * alpha + lb * beta
            acc_new = acc * alpha + accb * beta
            return (m_new, l_new, acc_new, kb, vb), None

        (m, l, acc, _, _), _ = jax.lax.scan(
            step, (m0, l0, acc0, ks, vs), None, length=ring - 1)
        return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)

    bspec = batch_axis if batch_axis and batch_axis in mesh.shape else None
    spec = P(bspec, None, seq_axis, None)
    kwargs = dict(mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    try:  # stable jax.shard_map renamed check_rep → check_vma
        wrapped = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        wrapped = shard_map(local, check_rep=False, **kwargs)
    return wrapped(q, k, v)
