"""Pipeline parallelism: GPipe-style microbatch pipeline over a mesh axis.

The reference has no distributed execution at all (SURVEY.md §2.6); this is
part of the TPU-native parallelism layer built new. Pattern: a stack of
IDENTICAL blocks (transformer depth, repeated conv stages) is split across
the ``stage`` mesh axis — each device holds its stages' params only — and
microbatches flow through the ring with ``jax.lax.ppermute`` (ICI neighbour
exchange). The whole schedule is ONE ``shard_map``-ed XLA program: a
``lax.scan`` over ``M + S - 1`` ticks where every device, every tick,
applies its local blocks and forwards the activation to the next stage.

Differentiable end to end (the transpose of ``ppermute`` is the reverse
``ppermute``, so backprop runs the reverse pipeline automatically) — usable
inside a jitted train step. Composes with a ``data`` axis for DP x PP.
"""

from __future__ import annotations

from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax.shard_map is the stable home (>= 0.4.35)
    from jax import shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map


def pipeline_blocks(
    block_fn: Callable[[Any, jnp.ndarray], jnp.ndarray],
    stacked_params: Any,
    x_microbatches: jnp.ndarray,
    mesh: Mesh,
    stage_axis: str = "stage",
    batch_axis: Optional[str] = None,
) -> jnp.ndarray:
    """Apply ``L`` stacked blocks as an ``S``-stage pipeline.

    ``block_fn(params_i, x) -> y``: one block, same shapes in and out.
    ``stacked_params``: pytree whose leaves have leading axis ``L`` (the
    block stack, ``L % S == 0``); sharded over ``stage_axis`` so each device
    holds ``L/S`` consecutive blocks.
    ``x_microbatches``: ``(M, mb, ...)`` — M microbatches.
    Returns ``(M, mb, ...)`` outputs, identical to applying all L blocks
    sequentially (pipelining is a schedule, not a numerics change).
    """
    S = mesh.shape[stage_axis]
    M = x_microbatches.shape[0]
    perm = [(i, (i + 1) % S) for i in range(S)]

    def local(params_local, xs):
        # params_local: leaves (L/S, ...); xs: (M, mb, ...) replicated
        idx = jax.lax.axis_index(stage_axis)

        def apply_local_blocks(x):
            def body(h, p_i):
                return block_fn(p_i, h), None

            h, _ = jax.lax.scan(body, x, params_local)
            return h

        outs0 = jnp.zeros_like(xs)
        buf0 = jnp.zeros_like(xs[0])

        def tick(carry, t):
            buf, outs = carry
            # stage 0 injects microbatch t; later stages consume their buffer
            inject = xs[jnp.clip(t, 0, M - 1)]
            x_in = jnp.where(idx == 0, inject, buf)
            y = apply_local_blocks(x_in)
            # the LAST stage's y at tick t is microbatch (t - S + 1)'s result
            oidx = t - (S - 1)
            valid = (oidx >= 0) & (oidx < M) & (idx == S - 1)
            oclip = jnp.clip(oidx, 0, M - 1)
            outs = outs.at[oclip].set(jnp.where(valid, y, outs[oclip]))
            # forward the activation to the next stage over ICI
            buf = jax.lax.ppermute(y, stage_axis, perm)
            return (buf, outs), None

        (_, outs), _ = jax.lax.scan(tick, (buf0, outs0),
                                    jnp.arange(M + S - 1))
        # replicate the last stage's collected outputs to every stage
        return jax.lax.psum(
            jnp.where(idx == S - 1, outs, jnp.zeros_like(outs)), stage_axis)

    bspec = batch_axis if batch_axis and batch_axis in mesh.shape else None
    pspec = jax.tree_util.tree_map(lambda _: P(stage_axis), stacked_params)
    xspec = P(None, bspec)
    kwargs = dict(mesh=mesh, in_specs=(pspec, xspec), out_specs=xspec)
    try:  # stable jax.shard_map renamed check_rep -> check_vma
        wrapped = shard_map(local, check_vma=False, **kwargs)
    except TypeError:  # pragma: no cover - older jax
        wrapped = shard_map(local, check_rep=False, **kwargs)
    return wrapped(stacked_params, x_microbatches)
