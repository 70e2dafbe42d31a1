"""Single-video ViT-GNN inference CLI (≙ ``src/test_vit_gnn.py:97-172``).

Loads an ``.npz`` face stack, picks the middle frame, rebuilds the ViT-GNN
(or conv fallback) from the checkpoint's ``model_config`` / key shapes, and
prints the predicted class with probabilities.
"""

from __future__ import annotations

import argparse

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.checkpoint.store import load_checkpoint
from deepfake_video_detection_tpu.models.vit_gnn import FallbackModel, ViTGNNModel


def build_from_checkpoint(path: str):
    variables, meta = load_checkpoint(path)
    cfg = meta.get("model_config") or {}
    if cfg.get("fallback") or "conv1" in variables["params"]:
        model = FallbackModel()
    else:
        model = ViTGNNModel(vit_variant=cfg.get("vit_variant",
                                                "vit_small_patch16_224"),
                            img_size=int(cfg.get("img_size", 224)))
    return model, variables


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Classify one .npz face stack")
    ap.add_argument("npz_path")
    ap.add_argument("--checkpoint", default="checkpoints/vit_gnn_ckpt.npz")
    args = ap.parse_args(argv)

    with np.load(args.npz_path) as z:
        faces = z["faces"]
    frame = faces[len(faces) // 2].astype(np.float32) / 255.0

    model, variables = build_from_checkpoint(args.checkpoint)
    img_size = getattr(getattr(model, "encoder", None), "vit", None)
    if img_size is not None and frame.shape[0] != model.encoder.vit.img_size:
        s = model.encoder.vit.img_size
        frame = np.asarray(jax.image.resize(jnp.asarray(frame), (s, s, 3),
                                            "linear"))

    logits, _ = jax.jit(lambda v, x: model.apply(v, x))(variables,
                                                        jnp.asarray(frame)[None])
    probs = np.asarray(jax.nn.softmax(logits, -1))[0]
    pred = int(probs.argmax())
    print(f"predicted class: {pred} ({'fake' if pred == 1 else 'real'})")
    print(f"probabilities: real={probs[0]:.4f} fake={probs[1]:.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
