"""Benchmark: flagship inference throughput on the real chip.

Measures the production inference hot path (SURVEY.md §3.1): uint8 face
crops → ImageNet normalise → EfficientNet-B0 over the flattened (B·T) frame
batch → temporal attention → head, jitted as ONE program in bfloat16.

Prints one JSON line: clips/sec/chip at T=8 frames per clip, 224×224.
Baseline: the driver-set north star of 50 DFDC clips/sec/chip
(BASELINE.json; the reference publishes no measured numbers — SURVEY.md §6).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax

    from __graft_entry__ import entry

    fn, (variables, _) = entry()
    jfn = jax.jit(fn)

    T = 8
    B = 64  # clips per step
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(B, T, 224, 224, 3)).astype(np.uint8)
    frames = jax.device_put(frames)
    variables = jax.device_put(variables)

    # warmup / compile (fetch forces a full round-trip — block_until_ready
    # alone does not synchronise through the remote-execution relay)
    _ = np.asarray(jfn(variables, frames)[0]).sum()

    iters = 10
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = jfn(variables, frames)
        _ = np.asarray(out[0]).sum()
        times.append(time.perf_counter() - t0)

    clips_per_sec = B / float(np.median(times))
    baseline = 50.0
    print(json.dumps({
        "metric": "inference_clips_per_sec_per_chip",
        "value": round(clips_per_sec, 2),
        "unit": f"clips/s (T={T}, 224x224, bf16, batch={B})",
        "vs_baseline": round(clips_per_sec / baseline, 3),
    }))


if __name__ == "__main__":
    main()
