"""Device mesh + sharding helpers — the framework's parallelism substrate.

The reference has *no* distributed layer (SURVEY.md §2.6: single process, one
device; the only vestige is checkpoint `module.` prefix stripping). This is
the TPU-native replacement designed from scratch:

* one `jax.sharding.Mesh` over all chips with named axes
  ``("data", "model")`` — data parallelism shards the flattened video batch,
  the model axis is available for tensor-parallel sharding of the wide head
  / ensemble members;
* `NamedSharding` + `jit`'s ``in_shardings`` drive XLA to insert the
  collectives (gradient `psum` over ``data`` rides the ICI, never DCN);
* helpers return committed device arrays so repeated steps don't re-transfer.

No NCCL/MPI analogue is written (none is needed): collectives ship with XLA.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Sequence

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclass(frozen=True)
class MeshSpec:
    """Logical mesh shape. ``data`` × ``model`` must cover all devices used."""

    data: int = -1     # -1: all remaining devices
    model: int = 1

    def resolve(self, n_devices: int) -> "MeshSpec":
        model = max(1, self.model)
        data = self.data if self.data > 0 else max(1, n_devices // model)
        return MeshSpec(data=data, model=model)


def make_mesh(
    spec: Optional[MeshSpec] = None,
    devices: Optional[Sequence[Any]] = None,
    axis_names: Sequence[str] = ("data", "model"),
) -> Mesh:
    """Build the global mesh. Default: all devices on the ``data`` axis.

    For multi-slice topologies the caller orders ``devices`` so the ``model``
    axis is innermost (ICI-adjacent) and ``data`` spans slices (DCN-tolerant:
    gradient all-reduce is latency-insensitive at our batch sizes).
    """
    devices = list(devices if devices is not None else jax.devices())
    spec = (spec or MeshSpec()).resolve(len(devices))
    n = spec.data * spec.model
    dev_array = np.asarray(devices[:n]).reshape(spec.data, spec.model)
    return Mesh(dev_array, axis_names=tuple(axis_names))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard dim 0 (batch) across ``axis``; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh, axis: str = "data",
                specs: Any = None) -> Any:
    """Device-put a pytree of host arrays with dim-0 sharded over ``axis``.

    Batch dim must be divisible by the axis size — callers pad (the data
    loader guarantees this; XLA requires static shapes anyway).

    ``specs`` (optional): ``key -> PartitionSpec`` callable for dict
    batches — model-parallel plans use it to shard e.g. the frame axis over
    ``seq`` too (``parallel.strategy.ParallelPlan.batch_spec``).
    """
    if specs is not None and isinstance(batch, dict):
        return {k: jax.device_put(v, NamedSharding(mesh, specs(k)))
                for k, v in batch.items()}
    sh = batch_sharding(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Fully replicate a pytree (params/opt state under pure DP)."""
    sh = replicated_sharding(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
