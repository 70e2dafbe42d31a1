"""Generate a NON-linearly-separable synthetic deepfake corpus.

The round-1 hardware validation corpus used a low-frequency grid signature
for fakes — separable by a linear probe on raw pixels, so AUC 1.0 said
nothing about detector quality. This generator closes that gap with a task
whose discriminant is texture STRUCTURE, not any first- or second-moment
pixel statistic:

* every clip = smooth low-frequency "face-like" background + a soft
  elliptical patch region (the "swapped face") + temporal drift;
* **fake** clips carry a sign-randomized period-4 checkerboard inside the
  region — the classic stride-2 transposed-conv (GAN upsampler) artifact
  (cf. "Deconvolution and Checkerboard Artifacts", Odena et al.);
* **real** clips carry variance-matched white noise in the SAME region.

Per-class pixel means are equal (both artifacts are sign-randomized, zero
mean) and pixel variances inside the region are matched, so any linear
classifier on pixels — and any classifier on global mean/std — sits at
AUC ≈ 0.5 (``tests/test_hard_corpus.py`` pins this with an LDA probe).
The classes ARE separable from local spectral structure (energy at the
(π/2, π/2) checkerboard frequency), which is exactly the kind of feature a
convolutional detector must learn. The artifact period (4 px) and amplitude
survive the mpeg4 encode used by ``data/video.py:encode_video`` at 240p.

Usage (hardware validation, docs/performance.md):
    python tools/make_hard_corpus.py --out /tmp/hard_corpus --n 200 \
        --frames 40 --size 240
then data.prepare → train.cli_ensemble as in the round-1 loop.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _smooth_field(rng: np.random.Generator, h: int, w: int,
                  cutoff: int = 6) -> np.ndarray:
    """Low-frequency random field in [0, 1] via truncated Fourier synthesis."""
    spec = np.zeros((h, w), np.complex128)
    ky, kx = np.meshgrid(np.fft.fftfreq(h) * h, np.fft.fftfreq(w) * w,
                         indexing="ij")
    keep = (np.abs(ky) <= cutoff) & (np.abs(kx) <= cutoff)
    n_keep = int(keep.sum())
    spec[keep] = rng.normal(size=n_keep) + 1j * rng.normal(size=n_keep)
    f = np.fft.ifft2(spec).real
    f -= f.min()
    rng_span = f.max() - f.min()
    return f / (rng_span if rng_span > 0 else 1.0)


def _ellipse_mask(rng: np.random.Generator, h: int, w: int) -> np.ndarray:
    """Soft-edged elliptical region (the "face"), random center/axes."""
    cy = rng.uniform(0.35, 0.65) * h
    cx = rng.uniform(0.35, 0.65) * w
    ay = rng.uniform(0.18, 0.30) * h
    ax = rng.uniform(0.15, 0.25) * w
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float64),
                         np.arange(w, dtype=np.float64), indexing="ij")
    r = ((yy - cy) / ay) ** 2 + ((xx - cx) / ax) ** 2
    # smooth sigmoid edge ~3 px wide
    return 1.0 / (1.0 + np.exp((r - 1.0) * 8.0))


def _checkerboard(h: int, w: int, period: int = 4) -> np.ndarray:
    """±1 period-`period` checkerboard — the deconv-artifact lattice."""
    yy, xx = np.meshgrid(np.arange(h) // (period // 2),
                         np.arange(w) // (period // 2), indexing="ij")
    return ((yy + xx) % 2).astype(np.float64) * 2.0 - 1.0


def synth_clip(rng: np.random.Generator, fake: bool, frames: int = 40,
               h: int = 240, w: int = 240, amp: float = 14.0) -> np.ndarray:
    """One clip, (T, H, W, 3) uint8. ``fake`` switches checkerboard vs
    variance-matched white noise inside the region — nothing else differs."""
    base = np.stack([_smooth_field(rng, h, w) for _ in range(3)], axis=-1)
    base = 60.0 + 140.0 * base                       # (H, W, 3) in [60, 200]
    mask = _ellipse_mask(rng, h, w)[..., None]       # (H, W, 1)
    sign = rng.choice([-1.0, 1.0])                   # zero class-mean artifact
    if fake:
        art = sign * _checkerboard(h, w)[..., None] * np.ones(3)
    else:
        # same per-pixel variance: a ±1 Rademacher white-noise field
        art = sign * rng.choice([-1.0, 1.0], size=(h, w, 3))
    # shared per-clip contrast jitter so amplitude isn't a per-class cue
    a = amp * rng.uniform(0.8, 1.2)

    out = np.empty((frames, h, w, 3), np.uint8)
    drift = rng.uniform(0.0, 2 * np.pi)
    for t in range(frames):
        # temporal brightness drift + slow region pulsing (keeps every frame
        # distinct so the codec actually codes inter frames)
        g = 1.0 + 0.10 * np.sin(drift + t / 7.0)
        frame = base * g + a * art * mask
        out[t] = np.clip(frame, 0, 255).astype(np.uint8)
    return out


def main() -> None:
    from deepfake_video_detection_tpu.data.video import encode_video

    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=200, help="total clips (50/50)")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--size", type=int, default=240)
    ap.add_argument("--fps", type=int, default=25)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    os.makedirs(args.out, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    for i in range(args.n):
        fake = i % 2 == 1
        name = f"{'fake' if fake else 'real'}_{i:04d}.avi"
        clip = synth_clip(rng, fake, args.frames, args.size, args.size)
        encode_video(os.path.join(args.out, name), clip, fps=args.fps)
        if (i + 1) % 20 == 0:
            print(f"{i + 1}/{args.n}")
    print(f"wrote {args.n} clips to {args.out}")


if __name__ == "__main__":
    main()
