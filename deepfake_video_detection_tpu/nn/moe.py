"""Mixture-of-experts MLP with expert parallelism.

Beyond-parity infrastructure (the reference is single-device, SURVEY.md
§2.6): a router + E expert MLPs where experts shard over an ``expert`` mesh
axis. Two execution paths with identical numerics:

* **dense** (single device / no mesh): every expert computes every token,
  outputs combined by router weights — simple, exact, O(E·tokens) FLOPs.
  Fine for small E; used as the reference semantics.
* **expert-parallel** (``mesh`` + ``expert_axis``): tokens are packed into a
  capacity-bounded (E, cap, D) dispatch buffer whose expert axis is sharded
  over the mesh — the resharding into the ``shard_map`` IS the dispatch
  (XLA lowers it to the all_to_all-style collective over ICI); each device
  computes ONLY its experts' tokens, and the reverse resharding combines.
  This is the standard TPU MoE dataflow: dispatch → expert compute → combine.

Top-1 routing (switch-style) keeps the dispatch a permutation — exactness
against the dense path is testable, which is the point of this module.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax.shard_map is the stable home (>= 0.4.35)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map

from deepfake_video_detection_tpu.nn import init as I

Params = Dict[str, Any]


class MoEMLP:
    """Top-1-routed MoE feed-forward: router (D→E) + E experts (D→H→D)."""

    def __init__(self, d_model: int, hidden: int, num_experts: int,
                 capacity_factor: float = 2.0):
        self.d_model = d_model
        self.hidden = hidden
        self.num_experts = num_experts
        self.capacity_factor = capacity_factor

    def init(self, rng: jax.Array) -> Params:
        kr, k1, k2 = jax.random.split(rng, 3)
        D, H, E = self.d_model, self.hidden, self.num_experts
        return {
            "router": {"weight": I.trunc_normal(kr, (E, D), std=0.02)},
            # experts stacked on a leading E axis → shardable over `expert`
            "w1": I.trunc_normal(k1, (E, D, H), std=0.02),
            "w2": I.trunc_normal(k2, (E, H, D), std=0.02),
        }

    # -- routing ---------------------------------------------------------

    def _route(self, p: Params, x: jnp.ndarray):
        """x: (N, D) → (expert index (N,), gate weight (N,), router probs)."""
        logits = x @ p["router"]["weight"].T            # (N, E)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        idx = jnp.argmax(probs, axis=-1)
        gate = jnp.take_along_axis(probs, idx[:, None], axis=-1)[:, 0]
        return idx, gate.astype(x.dtype), probs

    @staticmethod
    def _expert_ffn(w1, w2, x):
        return jax.nn.gelu(x @ w1, approximate=False) @ w2

    # -- dense reference path ---------------------------------------------

    def apply_dense(self, p: Params, x: jnp.ndarray,
                    with_aux: bool = False):
        """(N, D) → (N, D): every expert computes every token; the router's
        one-hot picks the winner. Exact semantics, no communication.
        ``with_aux=True`` also returns the switch load-balance loss."""
        idx, gate, probs = self._route(p, x)
        all_out = jax.vmap(self._expert_ffn, in_axes=(0, 0, None))(
            p["w1"], p["w2"], x)                        # (E, N, D)
        one_hot = jax.nn.one_hot(idx, self.num_experts, dtype=x.dtype)
        picked = jnp.einsum("end,ne->nd", all_out, one_hot)
        out = picked * gate[:, None]
        if with_aux:
            return out, load_balance_loss(probs, idx, self.num_experts)
        return out

    # -- expert-parallel path ----------------------------------------------

    def apply_expert_parallel(self, p: Params, x: jnp.ndarray, mesh: Mesh,
                              expert_axis: str = "expert",
                              with_aux: bool = False):
        """(N, D) → (N, D) with experts sharded over ``expert_axis``.

        Tokens are packed into an (E, cap, D) buffer that reshards onto the
        expert axis (the collective dispatch), computed by their expert's
        device only, and reshard back. Capacity per expert =
        ceil(N/E · capacity_factor); overflow tokens get a zero output —
        standard switch-style dropping.
        """
        E = self.num_experts
        G = mesh.shape[expert_axis]                      # expert groups
        assert E % G == 0, "num_experts must divide the expert axis"
        N = x.shape[0]
        import math

        cap = max(1, math.ceil(N / E * self.capacity_factor))

        idx, gate, probs = self._route(p, x)

        # build dispatch buffers on the host side of the shard_map: for each
        # expert e, the first `cap` tokens routed to it (positions), padded
        sort = jnp.argsort(idx, stable=True)             # tokens grouped by e
        sorted_e = idx[sort]
        # rank of each token within its expert group
        rank = jnp.arange(N) - jnp.searchsorted(sorted_e, sorted_e, side="left")
        keep = rank < cap
        # slot in the (E, cap) buffer
        slot = jnp.where(keep, sorted_e * cap + rank, E * cap)  # E*cap = drop
        buf = jnp.zeros((E * cap + 1, x.shape[1]), x.dtype)
        buf = buf.at[slot].set(x[sort])
        buf = buf[:-1].reshape(E, cap, x.shape[1])       # (E, cap, D)

        def local(w1_l, w2_l, buf_l):
            # buf arrives sharded over experts: (E/G, cap, D) per device
            # (the all_to_all happened in the in_specs resharding — tokens
            # land on their expert's device); compute local experts only.
            return jax.vmap(self._expert_ffn)(w1_l, w2_l, buf_l)

        espec = P(expert_axis)
        kwargs = dict(mesh=mesh,
                      in_specs=(espec, espec, espec),
                      out_specs=espec)
        try:
            wrapped = shard_map(local, check_vma=False, **kwargs)
        except TypeError:  # pragma: no cover - older jax
            wrapped = shard_map(local, check_rep=False, **kwargs)
        out_buf = wrapped(p["w1"], p["w2"], buf)         # (E, cap, D)

        # gather results back to token order (reverse dispatch)
        flat = jnp.concatenate(
            [out_buf.reshape(E * cap, x.shape[1]),
             jnp.zeros((1, x.shape[1]), x.dtype)])       # drop slot → 0
        y_sorted = flat[slot]
        y = jnp.zeros_like(x).at[sort].set(y_sorted)
        out = y * gate[:, None]
        if with_aux:
            return out, load_balance_loss(probs, idx, self.num_experts)
        return out


def load_balance_loss(router_probs: jnp.ndarray, expert_idx: jnp.ndarray,
                      num_experts: int) -> jnp.ndarray:
    """Switch-transformer auxiliary loss: E · Σ_e fraction_e · prob_e."""
    one_hot = jax.nn.one_hot(expert_idx, num_experts, dtype=jnp.float32)
    fraction = one_hot.mean(axis=0)
    prob = router_probs.astype(jnp.float32).mean(axis=0)
    return num_experts * jnp.sum(fraction * prob)
