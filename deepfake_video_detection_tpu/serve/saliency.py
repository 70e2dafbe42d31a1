"""Input-gradient saliency for serving: WHERE in each frame the detector
sees manipulation.

Beyond reference parity: the reference explains verdicts with text only
(``app.py:2324-2460`` builds a 200-word justification); this module adds the
spatial half — a per-frame heat map of |d fake_logit / d pixel|, pooled to a
coarse grid. In JAX this is one ``jax.grad`` of the same serving forward the
verdict used: no hooks, no retained activation graphs, and the whole
backward runs on-device in the same jitted program (grad + pooling +
normalisation fuse under XLA, so an explain request costs roughly one extra
forward-equivalent of FLOPs).

Design notes (TPU):
* the gradient is taken w.r.t. the NORMALISED float input (uint8 frames are
  not differentiable); ImageNet normalisation is per-channel affine, so the
  heat map is the same up to the per-channel 1/std factor already folded in.
* per-frame max-normalisation (not softmax) keeps the map scale-free: each
  frame's hottest cell is 1.0, so the UI can render frames side by side.
* the (gh, gw) pooled grid — not the raw (H, W) map — crosses the
  host↔device link: 196 floats/frame instead of 50k.
"""

from __future__ import annotations

from typing import Any, Tuple

__all__ = ["make_saliency_fn", "saliency_payload"]


def make_saliency_fn(model: Any, grid: Tuple[int, int] = (14, 14),
                     fake_idx: int = None):
    """Build a jittable ``(variables, frames_u8) -> (B, T, gh, gw)`` map.

    ``frames_u8``: uint8 RGB ``(B, T, H, W, 3)`` — the same input the
    serving forward takes (``serve/predict.py:make_forward_fns``). Returns
    per-frame saliency grids in [0, 1] (max-normalised per frame). Works for
    every model in the pretrained family (``BackboneDetector``,
    ``EnsembleDetector``, ``TemporalTransformerDetector``): all expose
    ``apply(variables, x, train=False) -> ((logits, frame_scores), state)``.

    ``fake_idx``: the class index to explain, resolved by the CALLER on the
    host (``Predictor.explain_faces`` re-reads ``FAKE_CLASS_INDEX`` per
    request and keeps one compiled program per index) — a ``None`` freezes
    the env value at trace time, which a runtime env change would then not
    follow.

    One model-family special case: a ``voting`` ``EnsembleDetector``'s
    combined logits are ``one_hot(argmax(...))`` whose input gradient is
    identically zero — the map differentiates the MEAN of the member
    logits instead (the quantity the votes are derived from), so the heat
    map shows what moved the members rather than rendering blank. (Models
    on the Pallas flash-attention path need no special-casing since r4:
    the kernel carries a streaming custom VJP, so ``jax.grad`` goes
    through the SAME attention the serving forward used.)

    The effective grid never exceeds the input resolution; trailing pixels
    that don't divide evenly are cropped (for 224px and a 14x14 grid each
    cell is a 16x16 patch).
    """
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
    from deepfake_video_detection_tpu.serve.predict import _get_fake_class_index

    mean_members = getattr(model, "ensemble_method", None) == "voting"

    def saliency(variables, frames_u8):
        x = imagenet_normalize(frames_u8)

        def fake_logit_mass(x):
            if mean_members:
                (_, _, member_logits), _ = model.apply(
                    variables, x, train=False, return_member_logits=True)
                logits = jnp.mean(member_logits.astype(jnp.float32), axis=0)
            else:
                (logits, _), _ = model.apply(variables, x, train=False)
                logits = logits.astype(jnp.float32)
            c = logits.shape[-1]
            idx = _get_fake_class_index(c) if fake_idx is None else fake_idx
            if c == 2:
                # class-contrastive: what pushes fake UP and real DOWN —
                # cancels shared "this is a face" evidence
                score = logits[:, idx] - logits[:, 1 - idx]
            else:
                score = logits[:, idx]
            return jnp.sum(score)  # sum over batch: grads stay per-sample

        g = jax.grad(fake_logit_mass)(x)          # (B, T, H, W, 3)
        sal = jnp.sum(jnp.abs(g), axis=-1)        # (B, T, H, W)
        b, t, h, w = sal.shape
        gh, gw = min(grid[0], h), min(grid[1], w)
        ph, pw = h // gh, w // gw
        sal = sal[:, :, : gh * ph, : gw * pw]
        sal = sal.reshape(b, t, gh, ph, gw, pw).mean(axis=(3, 5))
        mx = jnp.max(sal, axis=(2, 3), keepdims=True)
        return sal / jnp.maximum(mx, 1e-12)

    return saliency


def saliency_payload(grids) -> dict:
    """JSON payload for one clip's saliency: ``grids`` (T, gh, gw) → the
    additive ``result["saliency"]`` key (reference schema untouched)."""
    import numpy as np

    a = np.asarray(grids, np.float64)
    t, gh, gw = a.shape
    return {
        "grid": [int(gh), int(gw)],
        "frames": [[round(float(v), 3) for v in frame.ravel()]
                   for frame in a],
    }
