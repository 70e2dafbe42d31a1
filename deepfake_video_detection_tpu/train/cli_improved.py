"""Improved training CLI (≙ ``src/train_improved.py:408-637``).

AdamW + cosine + ReduceLROnPlateau, focal loss with label smoothing, early
stopping (patience 20), grad-clip 1.0, ``--init-from`` warm start, backbone
selection, ``training_metrics_improved.csv`` (written as
``training_history.csv`` plus a compat copy).
"""

from __future__ import annotations

import argparse
import os
import shutil

import jax

from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
from deepfake_video_detection_tpu.models.gcn import FrameGraphDetector
from deepfake_video_detection_tpu.parallel.mesh import make_mesh
from deepfake_video_detection_tpu.train.trainer import Trainer, TrainerConfig


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Improved trainer (focal, cosine, early stop)")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--backbone", default="vit_tiny_patch16_224",
                    help="vit variant, or 'clip'/'dinov2' (optionally "
                         "'clip:<variant>') — ≙ the reference's backbone "
                         "selection (src/train_improved.py:434-441)")
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--weight_decay", type=float, default=1e-4)
    ap.add_argument("--label_smoothing", type=float, default=0.1)
    ap.add_argument("--patience", type=int, default=20)
    ap.add_argument("--out_dir", default="checkpoints_improved")
    ap.add_argument("--init-from", dest="init_from", default=None)
    ap.add_argument("--resume", default=None)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--recursive", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 activations (params stay f32)")
    ap.add_argument("--ema_decay", type=float, default=None,
                    help="params-EMA decay (e.g. 0.999): validation/best-"
                         "ckpt use the EMA weights; *_ema.npz written")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches accumulated per optimizer step: "
                         "exact big-batch gradients at 1/N the activation "
                         "memory (batch_size must be divisible)")
    from deepfake_video_detection_tpu.parallel.strategy import (
        add_parallel_args, build_plan)
    add_parallel_args(ap, temporal=False)
    args = ap.parse_args(argv)

    plan, _ = build_plan(args, "vit_gcn", args.num_frames)

    ds = VideoFacesDataset(args.data_dir, num_frames=args.num_frames,
                           recursive=args.recursive)
    train_ds, val_ds = ds.split(0.2)
    flavor, variant = "timm", args.backbone
    if args.backbone.split(":")[0] in ("clip", "dinov2"):
        parts = args.backbone.split(":", 1)
        flavor = parts[0]
        variant = parts[1] if len(parts) > 1 else "vit_base_patch16_224"
    import jax.numpy as jnp

    model = FrameGraphDetector(vit_variant=variant, backbone=flavor,
                               compute_dtype=jnp.bfloat16 if args.bf16
                               else jnp.float32)
    normalize = "clip" if flavor == "clip" else "imagenet"
    cfg = TrainerConfig(
        out_dir=args.out_dir, epochs=args.epochs, batch_size=args.batch_size,
        num_frames=args.num_frames, lr=args.lr, weight_decay=args.weight_decay,
        optimizer="adamw", schedule="cosine", plateau=True,
        loss="focal", label_smoothing=args.label_smoothing,
        balance="sampler", grad_clip=1.0,
        early_stopping_patience=args.patience, best_metric="accuracy",
        save_every=10, smoke=args.smoke, adjacency="chain",
        normalize=normalize, ema_decay=args.ema_decay,
        grad_accum=args.grad_accum,
        model_config={"model_type": "vit_gcn", "vit_variant": variant,
                      "backbone": flavor},
    )
    if plan is not None:
        print(f"parallelism plan: {plan.description} over "
              f"{plan.mesh.devices.size} devices")
        trainer = Trainer(model, train_ds, val_ds, cfg, plan=plan)
    else:
        mesh = make_mesh() if len(jax.devices()) > 1 else None
        trainer = Trainer(model, train_ds, val_ds, cfg, mesh=mesh)
    state = None
    if args.resume:
        state = trainer.resume(args.resume)
    elif args.init_from:
        state = trainer.warm_start(args.init_from)
    trainer.train(state)
    # compat alias for the reference's CSV name (src/train_improved.py:615-632)
    src = os.path.join(cfg.out_dir, "training_history.csv")
    if os.path.exists(src):
        shutil.copyfile(src, os.path.join(cfg.out_dir, "training_metrics_improved.csv"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
