"""ViT-GNN smoke trainer (≙ ``src/train_vit_gnn.py:44-154``).

Trains the patch-graph classifier on 16 synthetic images so "training works"
can be verified without any dataset; falls back to the small conv model with
``--fallback``. Saves ``checkpoints/vit_gnn_ckpt.npz``.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import jax
import jax.numpy as jnp
import optax

from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint
from deepfake_video_detection_tpu.models.vit_gnn import FallbackModel, ViTGNNModel
from deepfake_video_detection_tpu.train.losses import cross_entropy_loss


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Smoke-train the ViT-GNN model")
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--samples", type=int, default=16)
    ap.add_argument("--img_size", type=int, default=224)
    ap.add_argument("--vit", default="vit_small_patch16_224")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--fallback", action="store_true")
    ap.add_argument("--out", default="checkpoints/vit_gnn_ckpt.npz")
    args = ap.parse_args(argv)

    model = FallbackModel() if args.fallback else \
        ViTGNNModel(vit_variant=args.vit, img_size=args.img_size)
    variables = model.init(jax.random.PRNGKey(0))

    rng = np.random.default_rng(0)
    # separable synthetic set: class 1 bright, class 0 dark
    labels = np.arange(args.samples) % 2
    images = np.stack([
        rng.normal(0.7 if lab else 0.3, 0.1,
                   (args.img_size, args.img_size, 3)).clip(0, 1)
        for lab in labels]).astype(np.float32)
    labels = jnp.asarray(labels)
    images = jnp.asarray(images)

    tx = optax.adamw(args.lr)
    opt_state = tx.init(variables["params"])

    @jax.jit
    def step(params, opt_state, images, labels):
        def loss_fn(p):
            logits, _ = model.apply({"params": p, "state": {}}, images,
                                    train=True)
            return cross_entropy_loss(logits, labels), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = jnp.mean(jnp.argmax(logits, -1) == labels)
        return params, opt_state, loss, acc

    params = variables["params"]
    for epoch in range(args.epochs):
        t0 = time.time()
        params, opt_state, loss, acc = step(params, opt_state, images, labels)
        print(f"epoch {epoch}: loss={float(loss):.4f} acc={float(acc):.3f} "
              f"[{time.time() - t0:.1f}s]")

    save_checkpoint(args.out, {"params": params, "state": {}},
                    meta={"model_config": {
                        "model_type": "vit_gnn",
                        "vit_variant": args.vit,
                        "img_size": args.img_size,
                        "fallback": bool(args.fallback)}})
    print(f"saved {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
