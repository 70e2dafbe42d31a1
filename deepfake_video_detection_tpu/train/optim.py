"""Optimizers, LR schedules, and host-side training callbacks.

Capability parity (reference):
* Adam + StepLR(5, 0.5) — ``src/train.py:323,343``;
* AdamW + CosineAnnealingLR + ReduceLROnPlateau (both stepped every epoch) —
  ``src/train_improved.py:320-327``;
* AdamW + CosineAnnealingWarmRestarts(T_0=10, T_mult=2) —
  ``src/ensemble_trainer.py`` optimizer setup;
* grad-clip 1.0 — ``src/train_improved.py``;
* EarlyStoppingCallback(patience=20) — ``src/train_improved.py:81-101``.

TPU-native shape: schedules are **pure functions of the step/epoch** passed
to optax via ``optax.scale_by_schedule`` / injected hyperparams, so the whole
update stays inside one jitted train step. ReduceLROnPlateau is inherently
host-side (depends on val metrics) and is implemented as a multiplicative
factor fed through ``optax.inject_hyperparams``.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


# ---------------------------------------------------------------------------
# schedules (epoch-granular, like the reference's torch schedulers)
# ---------------------------------------------------------------------------


def step_lr_schedule(base_lr: float, step_size: int, gamma: float = 0.5,
                     steps_per_epoch: int = 1) -> Callable[[int], float]:
    """torch StepLR semantics: lr * gamma^(epoch // step_size)."""

    def fn(step):
        epoch = step // steps_per_epoch
        return base_lr * gamma ** (epoch // step_size)

    return fn


def cosine_schedule(base_lr: float, total_epochs: int, eta_min: float = 0.0,
                    steps_per_epoch: int = 1) -> Callable[[int], float]:
    """torch CosineAnnealingLR(T_max=total_epochs)."""

    def fn(step):
        epoch = jnp.minimum(step // steps_per_epoch, total_epochs)
        return eta_min + (base_lr - eta_min) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * epoch / jnp.maximum(total_epochs, 1)))

    return fn


def cosine_warm_restarts(base_lr: float, t_0: int = 10, t_mult: int = 2,
                         eta_min: float = 0.0,
                         steps_per_epoch: int = 1) -> Callable[[int], float]:
    """torch CosineAnnealingWarmRestarts(T_0, T_mult). Pure function of the
    step so it jits; the restart index is computed with logs, not a loop."""

    def fn(step):
        epoch = (step // steps_per_epoch).astype(jnp.float32) if hasattr(step, "astype") \
            else float(step // steps_per_epoch)
        e = jnp.asarray(epoch, jnp.float32)
        if t_mult == 1:
            t_cur = jnp.mod(e, t_0)
            t_i = float(t_0)
        else:
            # epoch lies in cycle n where t_0*(t_mult^n - 1)/(t_mult-1) <= e
            n = jnp.floor(jnp.log1p(e * (t_mult - 1) / t_0) / math.log(t_mult))
            start = t_0 * (jnp.power(float(t_mult), n) - 1.0) / (t_mult - 1)
            t_i = t_0 * jnp.power(float(t_mult), n)
            t_cur = e - start
        return eta_min + (base_lr - eta_min) * 0.5 * (1.0 + jnp.cos(jnp.pi * t_cur / t_i))

    return fn


# ---------------------------------------------------------------------------
# optimizer factory
# ---------------------------------------------------------------------------


class EmaState(NamedTuple):
    """Optimizer-state slot holding the parameter EMA (``ema_params``)."""

    ema: Any


def ema_params(decay: float) -> optax.GradientTransformation:
    """Exponential moving average of the *parameters*, kept as optimizer
    state (beyond reference parity — the standard production-training
    stabilizer the reference lacks).

    Append at the END of the chain — after the lr scale and any freeze
    mask — so ``updates`` are the final deltas: the transform computes
    ``new_params = params + updates`` and folds them in with
    ``ema += (1 - decay) * (new_params - ema)`` (torch ``ModelEmaV2``
    semantics: seeded from the initial params, no debiasing). Updates pass
    through unchanged, so training numerics are identical with or without
    it; because it lives in ``opt_state`` it checkpoints/resumes and
    shards (replicated, like the rest of the optimizer state) for free.
    Retrieve with :func:`get_ema_params`."""
    if not 0.0 < decay < 1.0:
        raise ValueError(f"ema decay must be in (0, 1), got {decay}")

    def init_fn(params):
        # REAL copies, not jnp.asarray views: the train step donates the
        # TrainState, and an EMA slot aliasing the param buffers would be
        # "the same buffer donated twice" at execute time
        return EmaState(ema=jax.tree_util.tree_map(
            lambda p: jnp.array(p, copy=True), params))

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("ema_params requires params in tx.update()")
        new_ema = jax.tree_util.tree_map(
            lambda e, p, u: (e + (1.0 - decay) * ((p + u) - e)).astype(e.dtype),
            state.ema, params, updates)
        return updates, EmaState(ema=new_ema)

    return optax.GradientTransformation(init_fn, update_fn)


def get_ema_params(opt_state: Any) -> Optional[Any]:
    """Find the :class:`EmaState` anywhere in a (possibly nested —
    inject_hyperparams / chain / multi_transform) optimizer state and return
    its parameter tree, or None if the optimizer has no EMA slot."""
    hits = [leaf for leaf in jax.tree_util.tree_flatten(
        opt_state, is_leaf=lambda x: isinstance(x, EmaState))[0]
        if isinstance(leaf, EmaState)]
    return hits[0].ema if hits else None


def build_optimizer(
    name: str = "adamw",
    schedule: Callable[[int], float] | float = 1e-3,
    weight_decay: float = 1e-4,
    grad_clip: Optional[float] = 1.0,
    trainable_mask: Optional[Any] = None,
    ema_decay: Optional[float] = None,
) -> optax.GradientTransformation:
    """Compose clip → adam(w) → schedule → plateau-factor → freeze-mask
    [→ params-EMA].

    The returned transformation is wrapped in ``optax.inject_hyperparams`` so
    the host can scale ``plateau_factor`` after validation (ReduceLROnPlateau)
    without recompiling the train step.
    """
    sched = schedule if callable(schedule) else (lambda _, s=schedule: s)

    def make(plateau_factor: float = 1.0):
        chain = []
        if grad_clip is not None and grad_clip > 0:
            chain.append(optax.clip_by_global_norm(grad_clip))
        lname = name.lower()
        if lname == "adamw":
            chain.append(optax.scale_by_adam())
            chain.append(optax.add_decayed_weights(weight_decay))
        elif lname == "adam":
            chain.append(optax.scale_by_adam())
        elif lname == "sgd":
            chain.append(optax.trace(decay=0.9))
        else:
            raise ValueError(f"unknown optimizer {name!r}")
        chain.append(optax.scale_by_schedule(lambda step: -sched(step) * plateau_factor))
        tx = optax.chain(*chain)
        if trainable_mask is not None:
            tx = optax.multi_transform(
                {"train": tx, "freeze": optax.set_to_zero()},
                jax.tree_util.tree_map(
                    lambda t: "train" if t else "freeze", trainable_mask),
            )
        if ema_decay is not None:
            # OUTSIDE the freeze mask: multi_transform's inner states only
            # see masked sub-trees, but the EMA must track the full params
            # (frozen leaves simply stay constant under zero updates)
            tx = optax.chain(tx, ema_params(ema_decay))
        return tx

    return optax.inject_hyperparams(make)()


# ---------------------------------------------------------------------------
# host-side callbacks
# ---------------------------------------------------------------------------


class ReduceLROnPlateau:
    """torch-semantics plateau scheduler producing a multiplicative factor.

    Feed ``factor`` into the optimizer's ``plateau_factor`` hyperparam.
    (≙ ``src/train_improved.py:322-327``.)
    """

    def __init__(self, mode: str = "min", factor: float = 0.5, patience: int = 10,
                 min_factor: float = 1e-3):
        self.mode = mode
        self.factor_step = factor
        self.patience = patience
        self.min_factor = min_factor
        self.best: Optional[float] = None
        self.bad_epochs = 0
        self.factor = 1.0

    def update(self, metric: float) -> float:
        better = (self.best is None
                  or (self.mode == "min" and metric < self.best - 1e-12)
                  or (self.mode == "max" and metric > self.best + 1e-12))
        if better:
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.factor = max(self.factor * self.factor_step, self.min_factor)
                self.bad_epochs = 0
        return self.factor


class EarlyStopping:
    """≙ ``EarlyStoppingCallback`` (``src/train_improved.py:81-101``)."""

    def __init__(self, patience: int = 20, mode: str = "max", min_delta: float = 0.0):
        self.patience = patience
        self.mode = mode
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.counter = 0
        self.should_stop = False

    def update(self, metric: float) -> bool:
        better = (self.best is None
                  or (self.mode == "max" and metric > self.best + self.min_delta)
                  or (self.mode == "min" and metric < self.best - self.min_delta))
        if better:
            self.best = metric
            self.counter = 0
        else:
            self.counter += 1
            if self.counter >= self.patience:
                self.should_stop = True
        return self.should_stop
