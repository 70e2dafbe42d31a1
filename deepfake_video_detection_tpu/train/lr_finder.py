"""Learning-rate finder (≙ ``src/lr_finder.py:29-202``).

Exponential LR sweep over N batches, tracking smoothed loss; stops on
NaN/divergence (loss > 4× best); reports the steepest-descent LR and the
min-loss LR / 10 heuristic. Writes the curve to CSV (matplotlib is optional —
the reference plotted; we persist data and print the summary).

TPU-native: one jitted step reused across the sweep; the LR is a donated
scalar input, so the sweep never recompiles.
"""

from __future__ import annotations

import argparse
import csv
import math
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp


class LRFinder:
    def __init__(self, model: Any, loss_fn: Callable,
                 start_lr: float = 1e-4, end_lr: float = 10.0,
                 num_steps: int = 100, beta: float = 0.98):
        self.model = model
        self.loss_fn = loss_fn
        self.start_lr = start_lr
        self.end_lr = end_lr
        self.num_steps = num_steps
        self.beta = beta
        self.history: List[Tuple[float, float]] = []  # (lr, smoothed loss)

        def step(params, state, batch, lr, rng):
            def compute(p):
                variables = {"params": p, "state": state}
                out, ns = model.apply(variables, batch["frames"], train=True,
                                      rng=rng)
                logits = out[0] if isinstance(out, tuple) else out
                return loss_fn(logits, batch["labels"]), ns

            (loss, ns), grads = jax.value_and_grad(compute, has_aux=True)(params)
            new_params = jax.tree_util.tree_map(
                lambda p, g: (p - lr * g).astype(p.dtype), params, grads)
            return new_params, ns, loss

        self._step = jax.jit(step)

    def find(self, variables: Dict[str, Any], batches) -> Dict[str, float]:
        params, state = variables["params"], variables.get("state", {})
        mult = (self.end_lr / self.start_lr) ** (1.0 / max(self.num_steps - 1, 1))
        lr = self.start_lr
        avg_loss, best_loss = 0.0, float("inf")
        rng = jax.random.PRNGKey(0)
        it = iter(batches)
        for i in range(self.num_steps):
            try:
                batch = next(it)
            except StopIteration:
                it = iter(batches)
                batch = next(it)
            rng, sub = jax.random.split(rng)
            params, state, loss = self._step(params, state, batch,
                                             jnp.float32(lr), sub)
            loss = float(loss)
            if math.isnan(loss) or math.isinf(loss):
                break
            avg_loss = self.beta * avg_loss + (1 - self.beta) * loss
            smoothed = avg_loss / (1 - self.beta ** (i + 1))
            self.history.append((lr, smoothed))
            if smoothed < best_loss:
                best_loss = smoothed
            if smoothed > 4.0 * best_loss and i > 10:
                break
            lr *= mult
        return self.report()

    def report(self) -> Dict[str, float]:
        if len(self.history) < 2:
            return {"best_lr": self.start_lr, "min_loss_lr": self.start_lr}
        lrs = np.array([h[0] for h in self.history])
        losses = np.array([h[1] for h in self.history])
        min_idx = int(losses.argmin())
        # steepest descent on the log-lr curve
        grads = np.gradient(losses, np.log(lrs))
        steep_idx = int(grads[: max(min_idx, 1)].argmin()) if min_idx > 0 else 0
        return {"best_lr": float(lrs[steep_idx]),
                "min_loss_lr": float(lrs[min_idx] / 10.0)}

    def save_csv(self, path: str) -> None:
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["lr", "smoothed_loss"])
            w.writerows(self.history)

    def save_plot(self, path: str) -> None:
        """Loss-vs-LR curve as a standalone SVG (≙ the reference's
        matplotlib plot, ``src/lr_finder.py:96-117`` — matplotlib isn't in
        this image, and a hand-rolled SVG needs no figure backend).
        Log-x, smoothed loss, suggested-LR markers."""
        if len(self.history) < 2:
            return
        W, H, pad = 640, 400, 56
        lrs = np.array([h[0] for h in self.history])
        losses = np.array([h[1] for h in self.history])
        x0, x1 = math.log10(lrs[0]), math.log10(lrs[-1])
        y0, y1 = float(losses.min()), float(losses.max())
        yr = (y1 - y0) or 1.0

        def X(lr):
            return pad + (math.log10(lr) - x0) / max(x1 - x0, 1e-9) * (W - 2 * pad)

        def Y(v):
            return H - pad - (v - y0) / yr * (H - 2 * pad)

        pts = " ".join(f"{X(lr):.1f},{Y(v):.1f}" for lr, v in self.history)
        rep = self.report()
        parts = [
            f'<svg xmlns="http://www.w3.org/2000/svg" width="{W}" height="{H}" '
            f'viewBox="0 0 {W} {H}" font-family="sans-serif" font-size="12">',
            f'<rect width="{W}" height="{H}" fill="white"/>',
            f'<text x="{W / 2}" y="20" text-anchor="middle" font-size="14">'
            f'LR range test (smoothed loss)</text>',
        ]
        # axes + log-decade gridlines
        parts.append(f'<line x1="{pad}" y1="{H - pad}" x2="{W - pad}" '
                     f'y2="{H - pad}" stroke="#444"/>')
        parts.append(f'<line x1="{pad}" y1="{pad}" x2="{pad}" '
                     f'y2="{H - pad}" stroke="#444"/>')
        for d in range(math.ceil(x0), math.floor(x1) + 1):
            x = X(10.0 ** d)
            parts.append(f'<line x1="{x:.1f}" y1="{pad}" x2="{x:.1f}" '
                         f'y2="{H - pad}" stroke="#ddd"/>')
            parts.append(f'<text x="{x:.1f}" y="{H - pad + 16}" '
                         f'text-anchor="middle">1e{d}</text>')
        for frac in (0.0, 0.5, 1.0):
            v = y0 + frac * yr
            parts.append(f'<text x="{pad - 6}" y="{Y(v) + 4:.1f}" '
                         f'text-anchor="end">{v:.3g}</text>')
        for lr, color, label in ((rep["best_lr"], "#2a7", "steepest"),
                                 (rep["min_loss_lr"] * 10.0, "#d55",
                                  "min loss")):
            if lrs[0] <= lr <= lrs[-1]:
                parts.append(f'<line x1="{X(lr):.1f}" y1="{pad}" '
                             f'x2="{X(lr):.1f}" y2="{H - pad}" '
                             f'stroke="{color}" stroke-dasharray="4 3"/>')
                parts.append(f'<text x="{X(lr) + 4:.1f}" y="{pad + 14}" '
                             f'fill="{color}">{label} {lr:.1e}</text>')
        parts.append(f'<polyline points="{pts}" fill="none" stroke="#36c" '
                     f'stroke-width="1.5"/>')
        parts.append(f'<text x="{W / 2}" y="{H - 12}" text-anchor="middle">'
                     f'learning rate (log)</text>')
        parts.append("</svg>")
        with open(path, "w") as f:
            f.write("\n".join(parts))


def main(argv=None) -> int:
    from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
    from deepfake_video_detection_tpu.data.loader import Loader
    from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
    from deepfake_video_detection_tpu.models.backbone_detector import BackboneDetector
    from deepfake_video_detection_tpu.train.losses import cross_entropy_loss

    ap = argparse.ArgumentParser(description="LR range test")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--backbone", default="efficientnet_b0")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_frames", type=int, default=8)
    ap.add_argument("--num_steps", type=int, default=100)
    ap.add_argument("--start_lr", type=float, default=1e-4)
    ap.add_argument("--end_lr", type=float, default=10.0)
    ap.add_argument("--out_csv", default="lr_finder.csv")
    ap.add_argument("--out_plot", default=None,
                    help="loss-vs-LR SVG (default: out_csv with .svg)")
    args = ap.parse_args(argv)

    ds = VideoFacesDataset(args.data_dir, num_frames=args.num_frames)
    model = BackboneDetector(args.backbone)
    variables = model.init(jax.random.PRNGKey(0))

    def batches():
        loader = Loader(ds, args.batch_size, shuffle=True)
        for b in loader:
            yield {"frames": imagenet_normalize(jnp.asarray(b["frames"])),
                   "labels": jnp.asarray(b["labels"])}

    finder = LRFinder(model, cross_entropy_loss, args.start_lr, args.end_lr,
                      args.num_steps)
    out = finder.find(variables, batches())
    finder.save_csv(args.out_csv)
    plot = args.out_plot or (args.out_csv.rsplit(".", 1)[0] + ".svg")
    finder.save_plot(plot)
    print(f"suggested lr (steepest descent): {out['best_lr']:.2e}")
    print(f"suggested lr (min loss / 10):    {out['min_loss_lr']:.2e}")
    print(f"curve written to {args.out_csv}; plot to {plot}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
