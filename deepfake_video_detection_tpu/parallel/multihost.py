"""Multi-host (multi-process) data feeding helpers.

SURVEY.md §5.8's stated plan: host-local data loading with
``jax.make_array_from_process_local_data`` so each host decodes only its own
shard of the batch while the global array is sharded over the full mesh.
Single-process runs degrade to a plain ``device_put`` — the same call sites
work from 1 host to a pod.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def global_batch_from_local(batch: Dict[str, Any], mesh: Mesh,
                            axis: str = "data") -> Dict[str, Any]:
    """Assemble a globally-sharded batch from per-process local arrays.

    ``batch`` leaves are this process's slice of the global batch (dim 0).
    On one process this is exactly ``shard_batch``; on many, each process
    contributes its slice and JAX stitches the global array across hosts
    without any cross-host copy of the data itself.
    """
    sharding = NamedSharding(mesh, P(axis))

    def put(x):
        if jax.process_count() == 1:
            return jax.device_put(x, sharding)
        global_shape = (x.shape[0] * jax.process_count(),) + tuple(x.shape[1:])
        return jax.make_array_from_process_local_data(sharding, x, global_shape)

    return jax.tree_util.tree_map(put, batch)


def local_batch_size(global_batch_size: int) -> int:
    """Per-process share of the global batch (must divide evenly)."""
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(f"global batch {global_batch_size} not divisible by "
                         f"{n} processes")
    return global_batch_size // n
