"""Generate a TEMPORAL-necessity synthetic deepfake corpus.

Every prior hardware validation (incl. the hard corpus,
``tools/make_hard_corpus.py``) plants a *per-frame* artifact, so the
per-frame flagship (B0) reaches AUC 1.0 and the temporal families only
re-prove plumbing (VERDICT r4 weak-item 7). This corpus is the complement:
a task where **per-frame statistics carry no class signal by construction**
and only temporal structure separates.

* every clip = static textured background with a smooth camera pan + a
  textured "face" patch moving along a smooth random trajectory + a smooth
  global brightness drift;
* **real** clips keep their natural frame order;
* **fake** clips are *permutations* of the same generative process:
  - mode ``shuffle``: the finished real clip's frames are re-ordered by a
    random permutation (adjacent-frame motion coherence destroyed);
  - mode ``flicker``: motion stays smooth but the brightness SEQUENCE is
    re-ordered (temporal flicker — the classic face-swap artifact class,
    cf. "Deepfake Video Detection through Optical Flow" lineage), i.e.
    frame t gets brightness b[perm[t]].

Both fake modes are permutations of per-frame content drawn from the SAME
process, so each clip's frame MULTISET matches a real clip's draw — any
detector that pools frames order-invariantly (the reference's
``PretrainedBackboneDetector``: per-frame backbone + permutation-equivariant
attention pooling, ``src/pretrained_detector.py:103-143``) is at chance BY
ARCHITECTURE, and per-frame marginals carry nothing learnable either
(``tests/test_temporal_corpus.py`` pins both with probes). The classes ARE
separable from consecutive-frame deltas — exactly what the CNN-LSTM /
temporal-transformer families exist for (``src/models.py:20-85``).

Usage (hardware validation, docs/training.md):
    python tools/make_temporal_corpus.py --out /tmp/temporal_corpus \
        --n 128 --frames 12 --size 64
then data.prepare --detector none → train.cli --model cnn_lstm.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _texture(rng: np.random.Generator, h: int, w: int,
             blur: int = 2) -> np.ndarray:
    """Midtone random texture, lightly smoothed so mpeg4 keeps it."""
    t = rng.uniform(70, 190, (h, w)).astype(np.float64)
    for _ in range(blur):
        t = (t + np.roll(t, 1, 0) + np.roll(t, 1, 1)
             + np.roll(t, (1, 1), (0, 1))) / 4.0
    return t


def _smooth_path(rng: np.random.Generator, frames: int, amp: float,
                 center: float) -> np.ndarray:
    """Smooth 1-D trajectory: random-phase sinusoid + slow second harmonic."""
    t = np.arange(frames, dtype=np.float64)
    f1 = rng.uniform(0.5, 1.0) / frames
    f2 = rng.uniform(1.2, 2.0) / frames
    p = (np.sin(2 * np.pi * f1 * t + rng.uniform(0, 2 * np.pi))
         + 0.5 * np.sin(2 * np.pi * f2 * t + rng.uniform(0, 2 * np.pi)))
    return center + amp * p / 1.5


def synth_clip(rng: np.random.Generator, fake: bool, frames: int = 12,
               h: int = 64, w: int = 64) -> np.ndarray:
    """One clip, (frames, h, w, 3) uint8. ``fake`` applies a temporal
    permutation (mode chosen at random) to an otherwise identical draw."""
    pad = 16
    bg = _texture(rng, h + pad, w + pad, blur=4)
    ps = max(12, int(0.38 * min(h, w)))            # "face" patch side
    patch = _texture(rng, ps, ps, blur=1)
    patch += 35.0                                   # patch reads brighter
    # smooth trajectories: patch position, camera pan, brightness drift.
    # Amplitudes tuned so the consecutive-delta AUC sits ≥ 0.98 for BOTH
    # fake modes (shuffle 1.00, flicker 0.98 measured): real per-frame
    # motion small relative to a shuffle jump, flicker amplitude large
    # relative to the per-frame drift step.
    py = _smooth_path(rng, frames, amp=0.06 * h, center=(h - ps) / 2)
    px = _smooth_path(rng, frames, amp=0.06 * w, center=(w - ps) / 2)
    cy = _smooth_path(rng, frames, amp=pad / 8, center=pad / 2)
    cx = _smooth_path(rng, frames, amp=pad / 8, center=pad / 2)
    bright = _smooth_path(rng, frames, amp=rng.uniform(14, 22), center=0.0)

    mode = "shuffle" if not fake else rng.choice(["shuffle", "flicker"])
    if fake and mode == "flicker":
        bright = bright[rng.permutation(frames)]    # brightness recombined

    out = np.empty((frames, h, w, 3), np.uint8)
    for t in range(frames):
        oy = int(np.clip(cy[t], 0, pad))
        ox = int(np.clip(cx[t], 0, pad))
        fr = bg[oy:oy + h, ox:ox + w].copy()
        yy = int(np.clip(py[t], 0, h - ps))
        xx = int(np.clip(px[t], 0, w - ps))
        fr[yy:yy + ps, xx:xx + ps] = patch
        fr = np.clip(fr + bright[t], 0, 255)
        out[t] = np.repeat(fr[..., None], 3, -1).astype(np.uint8)

    if fake and mode == "shuffle":
        perm = rng.permutation(frames)
        while np.abs(np.diff(perm)).mean() < frames / 4:  # ensure real jumps
            perm = rng.permutation(frames)
        out = out[perm]
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=128)
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--fps", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from deepfake_video_detection_tpu.data.video import encode_video

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        fake = i % 2 == 1
        clip = synth_clip(rng, fake, frames=args.frames, h=args.size,
                          w=args.size)
        name = f"{'fake' if fake else 'real'}_{i:04d}.avi"
        encode_video(os.path.join(args.out, name), clip, fps=args.fps)
    print(f"wrote {args.n} clips to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
