"""Jitted train/eval steps with data-parallel sharding baked in.

This is the TPU-native replacement for the reference's per-batch loops
(``src/train.py:104-199``, ``src/train_improved.py:186-236``,
``src/ensemble_trainer.py:173-240``): forward, loss, backward, optimizer
update, and metric accumulation are ONE compiled XLA program.

Parallelism: the step is jitted with ``in_shardings`` that shard the batch
over the mesh's ``data`` axis and replicate params. XLA inserts the gradient
all-reduce (psum over ICI) automatically — no hand-written collectives, no
NCCL analogue (SURVEY.md §2.6/§5.8).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deepfake_video_detection_tpu.train.state import TrainState


def _model_outputs(model, variables, batch, train, rng):
    """Dispatch over the two model calling conventions (frames-only vs
    frames+adjacency) and normalise the output to (logits, new_state)."""
    if "adjacency" in batch:
        out, new_state = model.apply(variables, batch["frames"], batch["adjacency"],
                                     train=train, rng=rng)
    else:
        out, new_state = model.apply(variables, batch["frames"], train=train, rng=rng)
    logits = out[0] if isinstance(out, tuple) else out
    return logits, new_state


def _build_step(
    model: Any,
    tx: Any,
    loss_fn: Callable[..., jnp.ndarray],
    remat: bool = False,
    aux_loss_weight: float = 0.01,
) -> Callable[[TrainState, dict, jax.Array], Tuple[TrainState, dict]]:
    """Build the PURE (unjitted) train step — shared by the single-step
    and scan-of-steps compilers below.

    ``batch``: dict with ``frames`` (B,T,H,W,C), ``labels`` (B,), optionally
    ``adjacency`` (B,N,N) — every leaf is batch-major so it shards on dim 0.
    Returns ``(new_state, metrics)`` with loss and per-batch correct count.

    ``remat=True`` rematerialises the forward in the backward pass
    (``jax.checkpoint``): activations of the whole model are recomputed
    instead of stored — ~2× less HBM for ~1.3× FLOPs, the standard trade for
    fitting larger (B·T) frame batches per chip.
    """
    forward = _model_outputs
    if remat:
        forward = jax.checkpoint(
            _model_outputs, static_argnums=(0, 3), policy=None)

    def step(state: TrainState, batch: dict, rng: jax.Array):
        def compute_loss(params):
            variables = {"params": params, "state": state.model_state}
            logits, new_model_state = forward(model, variables, batch, True, rng)
            # class weights are baked into loss_fn via functools.partial —
            # keeping them out of `batch` lets every batch leaf shard on dim 0.
            # `valid` masks loader padding out of the gradient, so a padded
            # partial batch trains identically to its unpadded equivalent.
            loss = loss_fn(logits, batch["labels"],
                           sample_mask=batch.get("valid"))
            # model-reported auxiliary losses (e.g. the MoE router's switch
            # load-balance term, models/temporal_transformer.py): popped so
            # they never persist into the stored model state / checkpoints
            if isinstance(new_model_state, dict):
                aux = new_model_state.pop("aux_losses", None)
                if aux is not None:
                    for v in jax.tree_util.tree_leaves(aux):
                        loss = loss + aux_loss_weight * v
            return loss, (logits, new_model_state)

        (loss, (logits, new_model_state)), grads = jax.value_and_grad(
            compute_loss, has_aux=True)(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        valid = batch.get("valid")
        hit = (preds == batch["labels"])
        if valid is not None:
            hit = hit & valid
            count = jnp.sum(valid.astype(jnp.int32))
        else:
            count = jnp.asarray(batch["labels"].shape[0], jnp.int32)
        metrics = {
            "loss": loss,
            "correct": jnp.sum(hit),
            "count": count,
            "grad_norm": optax_global_norm(grads),
        }
        new_state = TrainState(new_params, new_model_state, new_opt_state,
                               state.step + 1)
        return new_state, metrics

    return step


def make_train_step(
    model: Any,
    tx: Any,
    loss_fn: Callable[..., jnp.ndarray],
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    remat: bool = False,
    aux_loss_weight: float = 0.01,
) -> Callable[[TrainState, dict, jax.Array], Tuple[TrainState, dict]]:
    """Compile the single-batch train step (see ``_build_step``)."""
    step = _build_step(model, tx, loss_fn, remat=remat,
                       aux_loss_weight=aux_loss_weight)
    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())       # params/opt state: replicated (pure DP)
    data = NamedSharding(mesh, P("data"))  # batch: sharded on dim 0
    return jax.jit(
        step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_multi_step(
    model: Any,
    tx: Any,
    loss_fn: Callable[..., jnp.ndarray],
    k: int,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    remat: bool = False,
    aux_loss_weight: float = 0.01,
    prep: Optional[Callable[[dict, jax.Array], dict]] = None,
) -> Callable[[TrainState, dict, jax.Array], Tuple[TrainState, dict]]:
    """Compile ``k`` optimizer steps into ONE device dispatch.

    ``batches``: the single-step batch dict with every leaf stacked on a new
    leading axis of length ``k`` — one host→device transfer and one XLA
    program execute ``k`` full train steps via ``lax.scan``. This amortizes
    the per-dispatch host/runtime overhead (~30 ms through a TPU relay,
    still significant on direct-attached hosts), which dominates small-model
    epochs: the reference's per-batch Python loop has no analogue of this.

    ``prep(batch, rng) -> batch`` (optional) runs INSIDE the scan body —
    pass the trainer's augment+normalize so aug, norm, forward, backward and
    update all fuse into the one program.

    Numerics are identical to ``k`` sequential single steps with the same
    per-step rng keys (``tests/test_train.py::test_multi_step_matches_sequential``);
    note the trainer's epoch loops derive those keys differently per path,
    so stochastic prep/dropout sees a different (still seeded) stream under
    ``steps_per_call > 1`` — see ``Trainer._train_epoch_multi``.
    """
    step = _build_step(model, tx, loss_fn, remat=remat,
                       aux_loss_weight=aux_loss_weight)

    def multi(state: TrainState, batches: dict, rng: jax.Array):
        rngs = jax.random.split(rng, 2 * k)

        def body(st, xs):
            b, r_prep, r_step = xs
            if prep is not None:
                b = prep(b, r_prep)
            st2, m = step(st, b, r_step)
            return st2, m

        state, ms = jax.lax.scan(body, state,
                                 (batches, rngs[:k], rngs[k:]))
        # per-step metrics reduce to the same totals the epoch loop keeps
        metrics = {
            "loss": jnp.sum(ms["loss"] * ms["count"]) /
                    jnp.maximum(jnp.sum(ms["count"]), 1),
            "correct": jnp.sum(ms["correct"]),
            "count": jnp.sum(ms["count"]),
            "grad_norm": ms["grad_norm"][-1],
        }
        return state, metrics

    if mesh is None:
        return jax.jit(multi, donate_argnums=(0,) if donate else ())

    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))  # (k, B, ...): shard dim 1
    return jax.jit(
        multi,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_accum_step(
    model: Any,
    tx: Any,
    loss_fn: Callable[..., jnp.ndarray],
    accum: int,
    mesh: Optional[Mesh] = None,
    donate: bool = True,
    remat: bool = False,
    aux_loss_weight: float = 0.01,
    prep: Optional[Callable[[dict, jax.Array], dict]] = None,
    sample_weight_fn: Optional[Callable[..., jnp.ndarray]] = None,
) -> Callable[[TrainState, dict, jax.Array], Tuple[TrainState, dict]]:
    """Compile ONE optimizer step whose gradient is accumulated over
    ``accum`` sequential microbatches — the standard large-effective-batch
    trade: peak activation memory is that of ONE microbatch (the scan frees
    each microbatch's activations before the next), so batches that cannot
    fit per-chip in one forward still train with exact big-batch gradients.

    ``batches``: the batch dict with every leaf reshaped to
    ``(accum, B/accum, ...)``. ``prep(batch, rng) -> batch`` (the trainer's
    augment+normalize) runs inside the scan body, per microbatch.

    Exactness: the trainer's losses are weighted means
    ``sum(w*x)/sum(w)`` (class weights x validity mask — see
    ``losses._weighted_mean``), so microbatch gradients are combined by
    their weight sums: grad = Σ_k grad(mean_k)·den_k / Σ_k den_k, with
    ``den_k = sum(w)`` over microbatch k computed by ``sample_weight_fn``
    (labels, valid) — constants w.r.t. params, so the accumulated gradient
    equals the full-batch gradient bit-for-bit up to float addition order
    (``tests/test_train.py::test_grad_accum_matches_full_batch``). Two
    caveats, both standard for gradient accumulation: batch-statistics
    models (BatchNorm in train mode) normalize per MICRObatch, so their
    forward differs from one full-batch pass exactly as it would on a
    smaller real batch (running stats thread through the scan
    sequentially); and per-microbatch rng means dropout/augment draw a
    different (still seeded) stream than a single full-batch step.
    Model-reported aux losses (MoE router balance) contribute ``1/accum``
    each — the mean over microbatches.
    """
    forward = _model_outputs
    if remat:
        forward = jax.checkpoint(
            _model_outputs, static_argnums=(0, 3), policy=None)
    if sample_weight_fn is None:
        def sample_weight_fn(labels, valid):  # noqa: F811 — default: mask only
            w = jnp.ones(labels.shape, jnp.float32)
            return w if valid is None else w * valid.astype(jnp.float32)

    def accum_step(state: TrainState, batches: dict, rng: jax.Array):
        rngs = jax.random.split(rng, 2 * accum)
        den = jnp.sum(sample_weight_fn(batches["labels"],
                                       batches.get("valid")), axis=1)
        scale = den / jnp.maximum(jnp.sum(den), 1e-8)  # (accum,)

        def body(carry, xs):
            ms, g_acc, loss_acc, corr, cnt = carry
            b, r_prep, r_step, s = xs
            if prep is not None:
                b = prep(b, r_prep)

            def micro_loss(params):
                variables = {"params": params, "state": ms}
                logits, new_ms = forward(model, variables, b, True, r_step)
                mean_k = loss_fn(logits, b["labels"],
                                 sample_mask=b.get("valid"))
                scaled = mean_k * s
                if isinstance(new_ms, dict):
                    aux = new_ms.pop("aux_losses", None)
                    if aux is not None:
                        for v in jax.tree_util.tree_leaves(aux):
                            scaled = scaled + aux_loss_weight * v / accum
                return scaled, (mean_k, logits, new_ms)

            (_, (mean_k, logits, new_ms)), g = jax.value_and_grad(
                micro_loss, has_aux=True)(state.params)
            g_acc = jax.tree_util.tree_map(jnp.add, g_acc, g)
            preds = jnp.argmax(logits, axis=-1)
            valid = b.get("valid")
            hit = (preds == b["labels"])
            if valid is not None:
                hit = hit & valid
                n = jnp.sum(valid.astype(jnp.int32))
            else:
                n = jnp.asarray(b["labels"].shape[0], jnp.int32)
            return (new_ms, g_acc, loss_acc + mean_k * s,
                    corr + jnp.sum(hit), cnt + n), None

        zeros = jax.tree_util.tree_map(
            lambda p: jnp.zeros(p.shape, jnp.float32), state.params)
        init = (state.model_state, zeros, jnp.zeros((), jnp.float32),
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        (new_ms, grads, loss, correct, count), _ = jax.lax.scan(
            body, init, (batches, rngs[:accum], rngs[accum:], scale))
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: (p + u).astype(p.dtype), state.params, updates)
        metrics = {
            "loss": loss,
            "correct": correct,
            "count": count,
            "grad_norm": optax_global_norm(grads),
        }
        return TrainState(new_params, new_ms, new_opt_state,
                          state.step + 1), metrics

    if mesh is None:
        return jax.jit(accum_step, donate_argnums=(0,) if donate else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(None, "data"))  # (accum, mB, ...): shard dim 1
    return jax.jit(
        accum_step,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_eval_step(model: Any, mesh: Optional[Mesh] = None) -> Callable:
    """Compiled eval forward: returns softmax probabilities (B, C) and logits."""

    def step(variables: dict, batch: dict):
        logits, _ = _model_outputs(model, variables, batch, False, None)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        return {"logits": logits, "probs": probs}

    if mesh is None:
        return jax.jit(step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    return jax.jit(step, in_shardings=(repl, data), out_shardings=data)


def optax_global_norm(tree: Any) -> jnp.ndarray:
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32))) for x in leaves))
