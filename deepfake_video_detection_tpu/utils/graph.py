"""Graph/adjacency math for the frame-graph (GCN) models.

Equivalent capability to the reference's ``normalize_adjacency``
(``src/utils.py:95-104``) and the chain/fully-connected adjacency builders the
trainers construct inline (``src/train.py:38-63``, ``src/run_vit_gnn.py:98-109``),
re-expressed as batched, jit-friendly JAX ops (no ``np.diag`` materialisation —
degree scaling is applied as row/col broadcasts, which XLA fuses).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_adjacency(A: jnp.ndarray) -> jnp.ndarray:
    """Symmetric normalisation ``D^{-1/2} (A + I) D^{-1/2}``.

    Accepts ``(N, N)`` or batched ``(..., N, N)`` adjacency matrices.
    """
    A = jnp.asarray(A, dtype=jnp.float32)
    n = A.shape[-1]
    A = A + jnp.eye(n, dtype=A.dtype)
    deg = jnp.sum(A, axis=-1)
    dis = jnp.where(deg > 0, jax_rsqrt(deg), 0.0)
    return A * dis[..., :, None] * dis[..., None, :]


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    return 1.0 / jnp.sqrt(x)


def chain_adjacency(n: int) -> np.ndarray:
    """Temporal chain graph over ``n`` frames: frame t ↔ frame t+1."""
    A = np.zeros((n, n), dtype=np.float32)
    idx = np.arange(n - 1)
    A[idx, idx + 1] = 1.0
    A[idx + 1, idx] = 1.0
    return A


def fully_connected_adjacency(n: int, self_loops: bool = False) -> np.ndarray:
    """Dense all-to-all graph over ``n`` nodes."""
    A = np.ones((n, n), dtype=np.float32)
    if not self_loops:
        np.fill_diagonal(A, 0.0)
    return A
