"""Ensemble training CLI.

The reference's ``EnsembleTrainer`` (``src/ensemble_trainer.py``) has **no CLI
driver** — ``validate_improvements.py:232`` references a ``train_ensemble.py``
that does not exist in the snapshot (SURVEY.md §2.3). This CLI supplies the
missing driver: AdamW + CosineWarmRestarts(10, 2), inverse-frequency class
weights, per-epoch threshold sweep → ``calibration_best.json``,
``training_history.csv``, best-by-configurable-metric, interrupt checkpoint.
"""

from __future__ import annotations

import argparse

import jax

from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
from deepfake_video_detection_tpu.models.backbone_detector import EnsembleDetector
from deepfake_video_detection_tpu.parallel.mesh import make_mesh
from deepfake_video_detection_tpu.train.trainer import Trainer, TrainerConfig


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train an ensemble of backbone detectors")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--backbones", default="efficientnet_b0,resnet18",
                    help="comma-separated member backbones")
    ap.add_argument("--ensemble_method", default="average",
                    choices=["average", "weighted", "voting"])
    ap.add_argument("--epochs", type=int, default=50)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--best_metric", default="f1",
                    help="accuracy|f1|auc|loss (aliases accepted)")
    ap.add_argument("--out_dir", default="checkpoints_ensemble")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--recursive", action="store_true")
    ap.add_argument("--torch-export", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 activations (params stay f32)")
    ap.add_argument("--no-augment", dest="no_augment", action="store_true")
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="optimizer steps fused into one device dispatch "
                         "(scan-of-steps; amortizes dispatch overhead)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches accumulated per optimizer step: "
                         "exact big-batch gradients at 1/N the activation "
                         "memory (batch_size must be divisible)")
    from deepfake_video_detection_tpu.parallel.strategy import (
        add_parallel_args, build_plan)
    add_parallel_args(ap, temporal=False)
    args = ap.parse_args(argv)

    # member params keep BackboneDetector leaf names (models.i.fc1.weight),
    # so the flagship TP rules apply to every ensemble member
    plan, _ = build_plan(args, "pretrained", args.num_frames)

    backbones = [b.strip() for b in args.backbones.split(",") if b.strip()]
    ds = VideoFacesDataset(args.data_dir, num_frames=args.num_frames,
                           recursive=args.recursive)
    train_ds, val_ds = ds.split(0.2)
    import jax.numpy as jnp

    model = EnsembleDetector(backbones, ensemble_method=args.ensemble_method,
                             compute_dtype=jnp.bfloat16 if args.bf16
                             else jnp.float32)
    cfg = TrainerConfig(
        out_dir=args.out_dir, epochs=args.epochs, batch_size=args.batch_size,
        num_frames=args.num_frames, lr=args.lr, weight_decay=args.weight_decay,
        optimizer="adamw", schedule="warm_restarts", warm_t0=10, warm_tmult=2,
        loss="ce", balance="weights", grad_clip=1.0,
        best_metric=args.best_metric, threshold_sweep=True,
        smoke=args.smoke, keep_torch_export=args.torch_export,
        augment=not args.no_augment, steps_per_call=args.steps_per_call,
        grad_accum=args.grad_accum,
        model_config={"model_type": "ensemble", "backbones": backbones,
                      "ensemble_method": args.ensemble_method},
    )
    if plan is not None:
        print(f"parallelism plan: {plan.description} over "
              f"{plan.mesh.devices.size} devices")
        trainer = Trainer(model, train_ds, val_ds, cfg, plan=plan)
    else:
        mesh = make_mesh() if len(jax.devices()) > 1 else None
        trainer = Trainer(model, train_ds, val_ds, cfg, mesh=mesh)
    state = trainer.resume(args.resume) if args.resume else None
    trainer.train(state)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
