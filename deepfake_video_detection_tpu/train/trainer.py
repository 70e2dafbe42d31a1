"""Unified trainer.

One parameterised training loop reproducing the behaviour of all three
reference trainers (SURVEY.md §2.3, §7.4):

* basic (``src/train.py:255-413``): Adam + StepLR(5, 0.5), class-weighted CE
  or weighted sampler, per-epoch ``checkpoint_epoch_N`` + best-by-F1
  ``checkpoint_best``, ``preds_epoch_N.csv``, ``--resume``, ``--smoke``;
* improved (``src/train_improved.py``): AdamW + Cosine + ReduceLROnPlateau,
  focal loss w/ label smoothing, early stopping (patience 20), grad-clip 1.0,
  best-by-val-acc ckpt with ``model_config``, periodic every 10 epochs,
  ``--init-from`` warm start, ``training_metrics_improved.csv``;
* ensemble (``src/ensemble_trainer.py``): AdamW + CosineWarmRestarts(10, 2),
  inverse-frequency class weights, per-epoch bounded threshold sweep,
  best-by-configurable-metric (with aliases), ``calibration_best.json``,
  ``training_history.csv`` rewritten each epoch, KeyboardInterrupt →
  interrupt checkpoint.

TPU-native core: ONE jitted train step (forward+loss+backward+update, §steps)
over a batch sharded on the mesh's ``data`` axis; augmentation runs on device
inside the prefetch transform; the host loop only does IO and metrics.
"""

from __future__ import annotations

import contextlib
import csv
import functools
import json
import os
import signal
import threading
import time
from dataclasses import dataclass, field
from typing import Any, Callable, Dict, List, Optional

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.data.augment import AugmentConfig, augment_batch
from deepfake_video_detection_tpu.data.loader import Loader, prefetch_to_device
from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
from deepfake_video_detection_tpu.evals.metrics import (
    binary_metrics, confusion_matrix, real_score_quantiles, roc_auc,
    threshold_sweep)
from deepfake_video_detection_tpu.checkpoint.store import (
    load_checkpoint, restore_opt_state, save_checkpoint, save_torch_checkpoint)
from deepfake_video_detection_tpu.train import losses as losses_mod
from deepfake_video_detection_tpu.train import optim as optim_mod
from deepfake_video_detection_tpu.train.state import TrainState
from deepfake_video_detection_tpu.train.steps import (make_accum_step,
    make_eval_step, make_multi_step, make_train_step)
from deepfake_video_detection_tpu.utils.graph import chain_adjacency, normalize_adjacency

# metric-name aliases ≙ ``src/ensemble_trainer.py:393-445``
_METRIC_ALIASES = {
    "acc": "accuracy", "accuracy": "accuracy", "val_acc": "accuracy",
    "val_accuracy": "accuracy",
    "f1": "f1", "f1_score": "f1", "val_f1": "f1",
    "auc": "auc", "roc_auc": "auc",
    "precision": "precision", "recall": "recall",
    "loss": "val_loss", "val_loss": "val_loss",
}


@dataclass
class TrainerConfig:
    out_dir: str = "checkpoints"
    epochs: int = 10
    batch_size: int = 8
    num_frames: int = 16
    lr: float = 1e-3
    weight_decay: float = 1e-4
    optimizer: str = "adamw"
    schedule: str = "step"            # step | cosine | warm_restarts | const
    step_size: int = 5
    step_gamma: float = 0.5
    warm_t0: int = 10
    warm_tmult: int = 2
    loss: str = "ce"                  # ce | focal
    label_smoothing: float = 0.0
    focal_alpha: float = 1.0
    focal_gamma: float = 2.0
    balance: str = "weights"          # weights | sampler | none
    grad_clip: Optional[float] = 1.0
    remat: bool = False               # rematerialise forward in backward
    plateau: bool = False
    plateau_patience: int = 10
    early_stopping_patience: Optional[int] = None
    best_metric: str = "f1"
    threshold_sweep: bool = False
    save_every: int = 1               # per-epoch ckpt cadence
    keep_torch_export: bool = False   # also write reference-layout .pt
    seed: int = 42
    smoke: bool = False
    adjacency: Optional[str] = None   # None | chain | full — for graph models
    augment: bool = True
    normalize: str = "imagenet"       # imagenet | clip | unit (x/255 only)
    compute_dtype: str = "float32"
    steps_per_call: int = 1           # optimizer steps fused per device dispatch
    grad_accum: int = 1               # microbatches accumulated per optimizer
                                      # step (exact big-batch gradients at
                                      # 1/grad_accum the activation memory —
                                      # see steps.make_accum_step)
    ema_decay: Optional[float] = None  # params-EMA (optim.ema_params); when
                                       # set, validation + best-ckpt selection
                                       # use the EMA weights and `*_ema.npz`
                                       # servable checkpoints are written
    model_config: Dict[str, Any] = field(default_factory=dict)


class Trainer:
    def __init__(
        self,
        model: Any,
        train_ds: Any,
        val_ds: Any,
        config: TrainerConfig,
        mesh: Optional[Any] = None,
        fake_index: int = 1,
        plan: Optional[Any] = None,
        tx: Optional[Any] = None,
    ):
        """``plan`` (``parallel.strategy.ParallelPlan``): a non-DP sharding
        strategy — TP/SP/PP/EP meshes with per-leaf param placements and
        per-leaf batch specs. With a plan, steps are compiled WITHOUT fixed
        ``in_shardings`` (mesh=None) so the placements set here propagate
        through XLA — the exact wiring ``__graft_entry__.dryrun_multichip``
        validates. ``mesh`` alone keeps the pure data-parallel round-2
        behavior.

        ``tx``: an externally-built optax transform overriding the one this
        config would build — used by progressive fine-tuning, whose stages
        carry frozen-leaf gradient masks (``train/progressive.py``). The
        config's ``schedule``/``optimizer``/``ema_decay`` fields are ignored
        when ``tx`` is given."""
        self.model = model
        self.train_ds = train_ds
        self.val_ds = val_ds
        self.cfg = config
        self.plan = plan
        if plan is not None:
            mesh = plan.mesh
        self.mesh = mesh
        self._sharded_model = plan is not None and not plan.pure_dp
        self._batch_specs = plan.batch_spec if self._sharded_model else None
        if self._sharded_model and config.steps_per_call > 1 \
                and not getattr(plan, "scan_of_steps_ok", False):
            raise ValueError(
                "steps_per_call > 1 (scan-of-steps) composes with dp / tp / "
                "fsdp plans only — drop --steps_per_call or the "
                "--seq/--pp_stages/--moe_experts flags")
        self.fake_index = fake_index
        self.history: List[Dict[str, Any]] = []
        self.best_value: Optional[float] = None
        self.best_epoch = -1
        self.calibration: Dict[str, float] = {}
        self.start_epoch = 0

        os.makedirs(config.out_dir, exist_ok=True)

        # ---- loss ----
        cw = None
        if config.balance == "weights":
            cw = losses_mod.inverse_frequency_class_weights(train_ds.labels())
        if config.loss == "focal":
            self.loss_fn = functools.partial(
                losses_mod.focal_loss, alpha=config.focal_alpha,
                gamma=config.focal_gamma, label_smoothing=config.label_smoothing,
                class_weights=cw)
        else:
            self.loss_fn = functools.partial(
                losses_mod.cross_entropy_loss,
                label_smoothing=config.label_smoothing, class_weights=cw)

        # ---- optimizer / schedule ----
        steps_per_epoch = max(1, len(train_ds) // config.batch_size)
        if config.schedule == "step":
            sched = optim_mod.step_lr_schedule(config.lr, config.step_size,
                                               config.step_gamma, steps_per_epoch)
        elif config.schedule == "cosine":
            sched = optim_mod.cosine_schedule(config.lr, config.epochs,
                                              steps_per_epoch=steps_per_epoch)
        elif config.schedule == "warm_restarts":
            sched = optim_mod.cosine_warm_restarts(config.lr, config.warm_t0,
                                                   config.warm_tmult,
                                                   steps_per_epoch=steps_per_epoch)
        else:
            sched = config.lr
        self.tx = tx if tx is not None else optim_mod.build_optimizer(
            config.optimizer, sched, config.weight_decay, config.grad_clip,
            ema_decay=config.ema_decay)
        self.plateau = optim_mod.ReduceLROnPlateau(
            mode="min", patience=config.plateau_patience) if config.plateau else None
        self.early = optim_mod.EarlyStopping(config.early_stopping_patience) \
            if config.early_stopping_patience else None

        # ---- compiled steps ----
        # model-parallel plans: compile with mesh=None — the param/batch
        # placements (init_state / _shard) propagate through the program
        step_mesh = None if self._sharded_model else mesh
        self.train_step = make_train_step(model, self.tx, self.loss_fn,
                                          step_mesh, remat=config.remat)
        self.eval_step = make_eval_step(model, step_mesh)

        # ---- adjacency (graph models): fixed chain graph over T frames ----
        self._adjacency = None
        if config.adjacency:
            A = chain_adjacency(config.num_frames) if config.adjacency == "chain" \
                else np.ones((config.num_frames, config.num_frames), np.float32)
            self._adjacency = np.asarray(normalize_adjacency(A))

        # ---- device-side batch transform: augment (train) + normalize ----
        aug_cfg = AugmentConfig()
        if config.normalize == "clip":
            from deepfake_video_detection_tpu.data.normalize import clip_normalize
            norm = clip_normalize
        elif config.normalize == "unit":
            def norm(x, scaled=False):
                x = x.astype(jnp.float32)
                return x if scaled else x / 255.0
        else:
            norm = imagenet_normalize

        @jax.jit
        def _prep_train(batch, rng):
            frames = augment_batch(rng, batch["frames"], aug_cfg) if config.augment \
                else batch["frames"].astype(jnp.float32)
            frames = norm(frames / 255.0, scaled=True) \
                if config.augment else norm(frames)
            out = dict(batch, frames=frames)
            return out

        @jax.jit
        def _prep_eval(batch):
            return dict(batch, frames=norm(batch["frames"]))

        self._prep_train = _prep_train
        self._prep_eval = _prep_eval

        # ---- scan-of-steps: k optimizer steps per device dispatch ----
        # aug+norm run inside the scan body, so one XLA program covers
        # k * (augment -> forward -> backward -> update); see
        # steps.make_multi_step for why this matters on dispatch-bound hosts
        self.multi_step = None
        if config.steps_per_call > 1:
            # sharded plans (fsdp/tp) compile with mesh=None like the single
            # step above: the FSDP/TP param placements propagate through the
            # scan, and XLA keeps the per-step all-gathers/reduce-scatters
            self.multi_step = make_multi_step(
                model, self.tx, self.loss_fn, config.steps_per_call,
                step_mesh, remat=config.remat, prep=_prep_train)

        # ---- gradient accumulation: exact big-batch steps, 1/a the memory --
        self.accum_step = None
        if config.grad_accum > 1:
            if config.steps_per_call > 1:
                raise ValueError(
                    "--grad_accum and --steps_per_call are mutually "
                    "exclusive: one fuses k optimizer steps per dispatch, "
                    "the other splits one step into microbatches")
            if config.batch_size % config.grad_accum:
                raise ValueError(
                    f"batch_size ({config.batch_size}) must be divisible by "
                    f"grad_accum ({config.grad_accum})")
            if self._sharded_model and not getattr(plan, "scan_of_steps_ok",
                                                   False):
                raise ValueError(
                    "--grad_accum composes with dp / tp / fsdp plans only — "
                    "drop --grad_accum or the --seq/--pp_stages/"
                    "--moe_experts flags")
            n_data = (self.mesh.shape.get("data", 1)
                      if self.mesh is not None else 1)
            if (config.batch_size // config.grad_accum) % max(n_data, 1):
                raise ValueError(
                    f"microbatch size ({config.batch_size} / "
                    f"{config.grad_accum}) must be divisible by the data-axis "
                    f"size ({n_data})")

            def _sample_weight(labels, valid):
                # mirror losses._weighted_mean's weights (class weight ×
                # validity) so microbatch gradients recombine to the exact
                # full-batch gradient — see steps.make_accum_step
                w = jnp.ones(labels.shape, jnp.float32)
                if cw is not None:
                    w = w * jnp.asarray(cw, jnp.float32)[labels]
                if valid is not None:
                    w = w * valid.astype(jnp.float32)
                return w

            self.accum_step = make_accum_step(
                model, self.tx, self.loss_fn, config.grad_accum,
                step_mesh, remat=config.remat, prep=_prep_train,
                sample_weight_fn=_sample_weight)

    # ------------------------------------------------------------------
    # state init / resume
    # ------------------------------------------------------------------

    def init_state(self, rng: Optional[jax.Array] = None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.seed)
        variables = self.model.init(rng)
        return TrainState.create(self._place(variables), self.tx)

    def _place(self, variables):
        """Put a host variables tree on the mesh: plan-ruled shardings for
        model-parallel runs (TP head columns, PP stage-split blocks, ...),
        plain replication for DP."""
        if self._sharded_model:
            from deepfake_video_detection_tpu.parallel.strategy import (
                place_variables, sharding_summary)
            placed = place_variables(variables, self.mesh,
                                     self.plan.param_spec_fn)
            n_sh, n_tot, frac = sharding_summary(placed["params"])
            print(f"placement [{self.plan.description}]: {n_sh}/{n_tot} "
                  f"param leaves sharded ({frac:.0%} of param bytes)")
            if "fsdp" in self.plan.description and n_sh == 0:
                import warnings

                warnings.warn(
                    "--fsdp: no param leaf has a dimension divisible by the "
                    "data-axis size — params and optimizer state are FULLY "
                    "REPLICATED (no ZeRO-3 memory saving). Pick a data-axis "
                    "size that divides the model's channel dims.")
            return placed
        if self.mesh is not None:
            from deepfake_video_detection_tpu.parallel.mesh import replicate
            return replicate(variables, self.mesh)
        return variables

    def _load_variables(self, path: str, template: TrainState):
        """Native ``.npz`` loads directly; reference ``.pt`` checkpoints go
        through the torch bridge with a shape-filtered non-strict import
        against this trainer's model template."""
        if path.endswith(".pt") or path.endswith(".pth"):
            from deepfake_video_detection_tpu.checkpoint.store import load_any
            from deepfake_video_detection_tpu.checkpoint.torch_bridge import (
                import_into_variables)

            sd, meta = load_any(path)
            variables, report = import_into_variables(
                sd, {"params": template.params, "state": template.model_state})
            if report["match_ratio"] < 0.5:
                raise ValueError(
                    f"checkpoint {path} matches only "
                    f"{report['match_ratio']:.0%} of the model")
            return variables, meta
        return load_checkpoint(path)

    def resume(self, path: str, state: Optional[TrainState] = None) -> TrainState:
        """Restore params/state/opt/epoch from a checkpoint
        (≙ ``src/train.py:349-387``; accepts native or torch layouts)."""
        state = state if state is not None else self.init_state()
        variables, meta = self._load_variables(path, state)
        variables = self._place(variables)
        opt_state = restore_opt_state(state.opt_state, meta)
        self.start_epoch = int(meta.get("epoch", -1)) + 1
        self.best_value = meta.get("best_value")
        step = jnp.asarray(int(meta.get("step", 0)), jnp.int32)
        return TrainState(variables["params"], variables["state"], opt_state, step)

    def warm_start(self, path: str, state: Optional[TrainState] = None) -> TrainState:
        """Params-only init (≙ ``--init-from``, ``src/train_improved.py:570-577``)."""
        state = state if state is not None else self.init_state()
        variables, _ = self._load_variables(path, state)
        variables = self._place(variables)
        return TrainState(variables["params"], variables["state"],
                          state.opt_state, state.step)

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------

    def _make_loader(self, ds, train: bool, epoch: int = 0) -> Loader:
        if self.cfg.smoke:
            from deepfake_video_detection_tpu.data.dataset import SubsetDataset
            base = getattr(ds, "base", ds)
            idx = getattr(ds, "indices", list(range(len(ds))))[:16]
            ds = SubsetDataset(base, idx)
        mult = 1
        if self.plan is not None:
            mult = int(self.plan.batch_multiple)
        elif self.mesh is not None:
            mult = int(np.prod([self.mesh.shape[a] for a in self.mesh.axis_names
                                if a == "data"]))
        loader = Loader(ds, self.cfg.batch_size,
                        shuffle=train,
                        weighted=train and self.cfg.balance == "sampler",
                        seed=self.cfg.seed, num_workers=4,
                        pad_to_multiple=mult)
        # The loader draws indices from rng(seed + epoch): carry the trainer's
        # epoch in so each epoch sees a fresh permutation / bootstrap (the
        # reference reshuffles per epoch), and a resumed run at epoch k draws
        # the same order an uninterrupted run would.
        loader.epoch = epoch
        return loader

    def _attach_adjacency(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        if self._adjacency is not None:
            B = batch["frames"].shape[0]
            batch["adjacency"] = np.broadcast_to(
                self._adjacency, (B,) + self._adjacency.shape).copy()
        return batch

    def train_epoch(self, state: TrainState, epoch: int) -> tuple:
        if self.multi_step is not None:
            return self._train_epoch_multi(state, epoch)
        if self.accum_step is not None:
            return self._train_epoch_accum(state, epoch)
        loader = self._make_loader(self.train_ds, train=True, epoch=epoch)
        rng = jax.random.PRNGKey(self.cfg.seed * 9973 + epoch)
        tot_loss, tot_correct, tot_count = 0.0, 0, 0
        t0 = time.time()
        it = (self._attach_adjacency(b) for b in loader)
        for batch in prefetch_to_device(it, self.mesh,
                                        batch_specs=self._batch_specs):
            rng, k_aug, k_drop = jax.random.split(rng, 3)
            batch.pop("paths", None)
            batch = self._prep_train(batch, k_aug)
            state, metrics = self.train_step(state, batch, k_drop)
            n = int(metrics["count"])
            tot_loss += float(metrics["loss"]) * n
            tot_correct += int(metrics["correct"])
            tot_count += n
        return state, {
            "train_loss": tot_loss / max(tot_count, 1),
            "train_acc": tot_correct / max(tot_count, 1),
            "epoch_time_s": time.time() - t0,
        }

    def _train_epoch_accum(self, state: TrainState, epoch: int) -> tuple:
        """Epoch loop for ``grad_accum > 1``: each full-size batch is
        reshaped host-side to ``(a, B/a, ...)`` microbatches and run as ONE
        optimizer step whose gradient is accumulated over a ``lax.scan``
        (``steps.make_accum_step``) — peak activation memory is that of one
        microbatch. The loader's final partial batch is padded up to the
        full compiled shape with ``valid=False`` rows (weighted-mean losses
        give padding zero gradient weight), so a single XLA program serves
        the entire epoch — no tail-shape recompiles through the TPU relay.
        """
        loader = self._make_loader(self.train_ds, train=True, epoch=epoch)
        rng = jax.random.PRNGKey(self.cfg.seed * 9973 + epoch)
        a, B = self.cfg.grad_accum, self.cfg.batch_size
        tot_loss, tot_correct, tot_count = 0.0, 0, 0
        t0 = time.time()

        def to_micro(batch):
            batch = self._attach_adjacency(batch)
            batch.pop("paths", None)
            n = batch["frames"].shape[0]
            out = {}
            for key, v in batch.items():
                if n < B:  # tail: pad to the compiled shape; zeros => False
                    pad = np.zeros((B - n,) + v.shape[1:], v.dtype)
                    v = np.concatenate([v, pad], axis=0)
                out[key] = v.reshape((a, B // a) + v.shape[1:])
            return out

        from jax.sharding import PartitionSpec as P
        it = (to_micro(b) for b in loader)
        for dev in prefetch_to_device(it, self.mesh,
                                      batch_specs=lambda k: P(None, "data")):
            rng, sub = jax.random.split(rng)
            state, metrics = self.accum_step(state, dev, sub)
            n = int(metrics["count"])
            tot_loss += float(metrics["loss"]) * n
            tot_correct += int(metrics["correct"])
            tot_count += n
        return state, {
            "train_loss": tot_loss / max(tot_count, 1),
            "train_acc": tot_correct / max(tot_count, 1),
            "epoch_time_s": time.time() - t0,
        }

    def _train_epoch_multi(self, state: TrainState, epoch: int) -> tuple:
        """Epoch loop for ``steps_per_call > 1``: full-size batches are
        stacked in groups of k and run as ONE scan-of-steps dispatch; the
        odd-shaped tail (the loader's final partial batch) falls back to the
        single-step path. A producer thread loads/stacks/transfers the next
        group while the current dispatch runs (the multi analogue of
        ``prefetch_to_device`` — without it the epoch serializes host npz
        decode against device compute and loses more than the dispatch
        amortization wins). Step math is identical to the plain loop; the
        RNG chain is NOT — one key per k-group split into 2k subkeys here
        vs split(rng, 3) per batch there — so with augmentation or dropout
        enabled the two paths train on different (equally seeded) random
        draws. ``test_multi_step_matches_sequential`` pins the
        deterministic (augment/dropout off) equivalence."""
        import queue as _queue
        import threading as _threading

        from jax.sharding import NamedSharding, PartitionSpec as P

        loader = self._make_loader(self.train_ds, train=True, epoch=epoch)
        rng = jax.random.PRNGKey(self.cfg.seed * 9973 + epoch)
        k = self.cfg.steps_per_call
        tot_loss, tot_correct, tot_count = 0.0, 0, 0
        t0 = time.time()
        sh = (NamedSharding(self.mesh, P(None, "data"))
              if self.mesh is not None else None)

        def put_group(group):
            stacked = {key: np.stack([b[key] for b in group])
                       for key in group[0]}
            if sh is not None:
                return {key: jax.device_put(v, sh)
                        for key, v in stacked.items()}
            return jax.tree_util.tree_map(jax.device_put, stacked)

        def put_single(batch):
            if self.mesh is not None:
                from deepfake_video_detection_tpu.parallel.mesh import shard_batch
                return shard_batch(batch, self.mesh)
            return jax.tree_util.tree_map(jax.device_put, batch)

        q: _queue.Queue = _queue.Queue(maxsize=2)
        stop = _threading.Event()

        def send(item) -> bool:
            # bounded put: if the consumer died (exception in the train
            # loop), `stop` is set and the producer exits instead of
            # blocking forever on a full queue (leaking loader workers and
            # device-resident batch groups)
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except _queue.Full:
                    continue
            return False

        def producer():
            try:
                group, gshape = [], None
                for batch in loader:
                    batch = self._attach_adjacency(batch)
                    batch.pop("paths", None)
                    shape = batch["frames"].shape
                    if group and shape != gshape:
                        for b in group:  # odd-shaped tail: flush singly
                            if not send(("single", put_single(b))):
                                return
                        group = []
                    gshape = shape
                    group.append(batch)
                    if len(group) == k:
                        if not send(("multi", put_group(group))):
                            return
                        group = []
                for b in group:
                    if not send(("single", put_single(b))):
                        return
                send(None)
            except BaseException as e:  # surface loader errors in the consumer
                send(e)

        _threading.Thread(target=producer, name="multi-step-prefetch",
                          daemon=True).start()

        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                kind, dev = item
                if kind == "multi":
                    rng, sub = jax.random.split(rng)
                    state, metrics = self.multi_step(state, dev, sub)
                else:
                    rng, k_aug, k_drop = jax.random.split(rng, 3)
                    dev = self._prep_train(dev, k_aug)
                    state, metrics = self.train_step(state, dev, k_drop)
                n = int(metrics["count"])
                tot_loss += float(metrics["loss"]) * n
                tot_correct += int(metrics["correct"])
                tot_count += n
        finally:
            stop.set()
        return state, {
            "train_loss": tot_loss / max(tot_count, 1),
            "train_acc": tot_correct / max(tot_count, 1),
            "epoch_time_s": time.time() - t0,
        }

    def _eval_variables(self, state: TrainState) -> Dict[str, Any]:
        """What validation (and the best-checkpoint decision) scores: the
        EMA weights when ``ema_decay`` is set — the weights you'd deploy —
        else the live params. Model state (BN stats) is shared either way."""
        if self.cfg.ema_decay:
            ema = optim_mod.get_ema_params(state.opt_state)
            if ema is not None:
                return {"params": ema, "state": state.model_state}
        return state.variables

    def validate(self, state: TrainState, epoch: int,
                 write_preds: bool = True) -> Dict[str, Any]:
        eval_variables = self._eval_variables(state)
        loader = self._make_loader(self.val_ds, train=False)
        probs_all, labels_all, paths_all = [], [], []
        losses = []
        it = (self._attach_adjacency(b) for b in loader)
        for batch in prefetch_to_device(it, self.mesh,
                                        batch_specs=self._batch_specs):
            paths = batch.pop("paths", [])
            valid = np.asarray(batch.pop("valid"))
            batch = self._prep_eval(batch)
            out = self.eval_step(eval_variables, batch)
            probs = np.asarray(out["probs"])[valid]
            labels = np.asarray(batch["labels"])[valid]
            logits = np.asarray(out["logits"])[valid]
            if labels.size:
                lp = logits - logits.max(-1, keepdims=True)
                lse = lp - np.log(np.exp(lp).sum(-1, keepdims=True))
                losses.append(float(-lse[np.arange(labels.size), labels].mean()))
            probs_all.append(probs)
            labels_all.append(labels)
            paths_all.extend([p for p, v in zip(paths, valid) if v])
        probs = np.concatenate(probs_all) if probs_all else np.zeros((0, 2))
        labels = np.concatenate(labels_all) if labels_all else np.zeros((0,), np.int64)
        prob_fake = probs[:, self.fake_index] if probs.size else np.zeros((0,))
        preds = np.argmax(probs, axis=-1) if probs.size else np.zeros((0,), np.int64)

        m = binary_metrics(labels, preds, positive=self.fake_index)
        m["auc"] = roc_auc((labels == self.fake_index).astype(np.int64), prob_fake)
        m["val_loss"] = float(np.mean(losses)) if losses else 0.0
        m["confusion"] = confusion_matrix(labels, preds).tolist()
        if self.cfg.threshold_sweep and labels.size:
            m.update(threshold_sweep(labels, prob_fake, fake_index=self.fake_index))
            rq = real_score_quantiles(labels, prob_fake,
                                      fake_index=self.fake_index)
            if rq is not None:
                m["real_score_quantiles"] = rq
        if write_preds:
            self._write_preds_csv(epoch, paths_all, labels, preds, prob_fake)
        return m

    # ------------------------------------------------------------------
    # artifacts (CSV / calibration / checkpoints)
    # ------------------------------------------------------------------

    def _write_preds_csv(self, epoch, paths, labels, preds, prob_fake):
        """≙ ``preds_epoch_N.csv`` (``src/train.py:245-250``)."""
        path = os.path.join(self.cfg.out_dir, f"preds_epoch_{epoch}.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["path", "label", "pred", "prob_fake"])
            for row in zip(paths, labels.tolist(), preds.tolist(), prob_fake.tolist()):
                w.writerow(row)

    def _write_history(self):
        """Rewrite ``training_history.csv`` each epoch
        (≙ ``src/ensemble_trainer.py:573-609``)."""
        if not self.history:
            return
        path = os.path.join(self.cfg.out_dir, "training_history.csv")
        keys = sorted({k for row in self.history for k in row
                       if not isinstance(row[k], (list, dict))})
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=keys, extrasaction="ignore")
            w.writeheader()
            for row in self.history:
                w.writerow({k: row.get(k, "") for k in keys})

    def _write_calibration(self, metrics: Dict[str, Any], epoch: int):
        """≙ ``calibration_best.json`` (``src/ensemble_trainer.py:474-488``)."""
        self.calibration = {
            "best_thr_accuracy": metrics.get("best_thr_accuracy", 0.5),
            "best_accuracy": metrics.get("best_accuracy", metrics.get("accuracy", 0.0)),
            "best_thr_f1": metrics.get("best_thr_f1", 0.5),
            "best_f1": metrics.get("best_f1", metrics.get("f1", 0.0)),
            "epoch": epoch,
        }
        if metrics.get("real_score_quantiles") is not None:
            # real-class score CDF — lets serving correct the decision
            # threshold for max-of-W windowed scans (order statistics)
            self.calibration["real_score_quantiles"] = (
                metrics["real_score_quantiles"])
        with open(os.path.join(self.cfg.out_dir, "calibration_best.json"), "w") as f:
            json.dump(self.calibration, f, indent=2)

    def _ckpt_meta(self, epoch: int, metrics: Dict[str, Any]) -> Dict[str, Any]:
        return {"epoch": epoch,
                "metrics": {k: v for k, v in metrics.items()
                            if isinstance(v, (int, float))},
                "best_value": self.best_value,
                "model_config": self.cfg.model_config}

    def save(self, state: TrainState, name: str, epoch: int,
             metrics: Dict[str, Any], with_opt: bool = True):
        path = os.path.join(self.cfg.out_dir, f"{name}.npz")
        meta = self._ckpt_meta(epoch, metrics)
        ema = optim_mod.get_ema_params(state.opt_state) \
            if self.cfg.ema_decay else None
        if ema is not None:
            # the recorded metrics were scored on the EMA weights (see
            # _eval_variables) — tag both files so the serve loader deploys
            # the weights that actually earned the metric, not the raw ones
            meta = dict(meta, metrics_scored_on="ema")
        save_checkpoint(path, state.variables, meta,
                        opt_state=state.opt_state if with_opt else None,
                        step=int(state.step))
        if ema is not None:
            # servable EMA weights as params (the ones validation scored);
            # the raw checkpoint above still resumes exactly (the EMA slot
            # rides along inside opt_state)
            save_checkpoint(
                os.path.join(self.cfg.out_dir, f"{name}_ema.npz"),
                {"params": ema, "state": state.model_state},
                meta, step=int(state.step))
        if self.cfg.keep_torch_export:
            try:
                save_torch_checkpoint(
                    os.path.join(self.cfg.out_dir, f"{name}.pt"),
                    state.variables, layout="model_config",
                    meta={"model_config": self.cfg.model_config})
            except ImportError:
                pass

    # ------------------------------------------------------------------
    # main loop
    # ------------------------------------------------------------------

    def _metric_value(self, metrics: Dict[str, Any]) -> tuple:
        key = _METRIC_ALIASES.get(self.cfg.best_metric.lower(), "f1")
        if key == "val_loss":
            return -float(metrics.get("val_loss", np.inf)), key
        return float(metrics.get(key, 0.0)), key

    @staticmethod
    @contextlib.contextmanager
    def _sigterm_as_interrupt():
        """Preemption tolerance: TPU pods (GKE/Borg evictions, spot VMs)
        deliver SIGTERM with a grace window before the kill — convert it to
        ``KeyboardInterrupt`` so the interrupt-checkpoint path below runs
        and the job resumes where it left off. The signal API is
        main-thread-only; in worker threads (e.g. a serving-side retrain)
        this is a no-op and Ctrl-C semantics alone apply."""
        if threading.current_thread() is not threading.main_thread():
            yield
            return
        prev = signal.getsignal(signal.SIGTERM)

        def _raise(signum, frame):
            raise KeyboardInterrupt("SIGTERM (preemption)")

        signal.signal(signal.SIGTERM, _raise)
        try:
            yield
        finally:
            signal.signal(signal.SIGTERM, prev)

    def train(self, state: Optional[TrainState] = None,
              log: Callable[[str], None] = print) -> TrainState:
        state = state if state is not None else self.init_state()
        epoch = self.start_epoch
        with self._sigterm_as_interrupt():
            try:
                for epoch in range(self.start_epoch, self.cfg.epochs):
                    state, train_m = self.train_epoch(state, epoch)
                    val_m = self.validate(state, epoch)
                    value, key = self._metric_value(val_m)

                    row = {"epoch": epoch, **train_m,
                           **{k: v for k, v in val_m.items() if k != "confusion"}}
                    self.history.append(row)
                    self._write_history()
                    if self.cfg.threshold_sweep:
                        is_best_sweep = (self.best_value is None
                                         or value > self.best_value)
                        if is_best_sweep:
                            self._write_calibration(val_m, epoch)

                    if self.plateau is not None:
                        factor = self.plateau.update(val_m["val_loss"])
                        state.opt_state.hyperparams["plateau_factor"] = (
                            jnp.asarray(factor))

                    if self.cfg.save_every and (epoch + 1) % self.cfg.save_every == 0:
                        self.save(state, f"checkpoint_epoch_{epoch}", epoch, val_m)
                    if self.best_value is None or value > self.best_value:
                        self.best_value = value
                        self.best_epoch = epoch
                        self.save(state, "checkpoint_best", epoch, val_m)
                        self.save(state, f"checkpoint_best_epoch_{epoch}", epoch,
                                  val_m, with_opt=False)

                    log(f"epoch {epoch}: loss={train_m['train_loss']:.4f} "
                        f"acc={train_m['train_acc']:.4f} val_acc={val_m['accuracy']:.4f} "
                        f"val_f1={val_m['f1']:.4f} val_auc={val_m['auc']:.4f} "
                        f"({key}={value:.4f}, best={self.best_value:.4f}@{self.best_epoch}) "
                        f"[{train_m['epoch_time_s']:.1f}s]")

                    if self.early is not None and self.early.update(value):
                        log(f"early stopping at epoch {epoch} "
                            f"(no improvement for {self.early.patience})")
                        break
            except KeyboardInterrupt:
                # ≙ interrupt checkpoint (``src/ensemble_trainer.py:450-461``),
                # extended to SIGTERM preemption. epoch-1 in the meta makes
                # ``resume()`` restart AT the interrupted epoch (completed
                # epochs are never repeated; the in-progress one is).
                self.save(state, "checkpoint_interrupt", epoch - 1, {})
                log("interrupted — wrote checkpoint_interrupt.npz "
                    "(resume with --resume)")
                raise
        return state
