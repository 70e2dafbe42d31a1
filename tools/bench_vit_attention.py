"""A/B the ViT attention implementations on the real chip (VERDICT r4
item 3 / docs/performance.md "Where vit_base's remaining gap goes").

Measures, at the production training shape (128 frames = B16·T8, N = 197,
C = 768, bf16):

* the ATTENTION HALVES of all 12 encoder blocks in isolation (in-jit scan
  of ``--reps`` repetitions to amortize relay dispatch, scalar-fetch sync),
  with ``VIT_FUSED_ATTN=0`` (XLA einsum+softmax — materializes the f32
  score tensor, ~238 MB/layer) vs ``=1`` (the single-block short-N Pallas
  kernel, ``ops/attention.py::_short_attn_kernel`` — scores stay in VMEM);
* the full vit_base train step (fwd+bwd+AdamW) both ways, via
  ``bench.bench_train`` in a subprocess so the env gate is fresh.

MFU uses the analytic FLOP count against the 197 TFLOP/s v5e bf16 peak
(docs/performance.md "MFU accounting fix").

Usage:  PYTHONPATH=/root/repo:/root/.axon_site python tools/bench_vit_attention.py
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

import numpy as np

PEAK = 197e12


def bench_attn_half(fused: bool, B: int = 128, N: int = 197, C: int = 768,
                    heads: int = 12, depth: int = 12, reps: int = 8,
                    iters: int = 8) -> dict:
    os.environ["VIT_FUSED_ATTN"] = "1" if fused else "0"
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.models.vit import VisionTransformer
    from deepfake_video_detection_tpu.nn import layers as L

    vit = VisionTransformer(variant="vit_base_patch16_224", num_classes=0,
                            compute_dtype=jnp.bfloat16)
    params = vit.init(jax.random.PRNGKey(0))["params"]
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, N, C)) * 0.02, jnp.bfloat16)

    def attn_stack(params, x):
        def body(h, _):
            for i in range(depth):
                h = h + L.multi_head_attention(
                    params["blocks"][str(i)]["attn"], h, heads)
            return h, None
        h, _ = jax.lax.scan(body, x, None, length=reps)
        return h

    fn = jax.jit(attn_stack)
    out = fn(params, x)
    _ = float(np.asarray(out[0, 0, 0], np.float32))  # compile+sync (scalar)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(params, x)
    _ = float(np.asarray(out[0, 0, 0], np.float32))
    dt = (time.perf_counter() - t0) / (iters * reps)

    # analytic MACs per frame per layer: qkv (3NC²) + scores (N²C) +
    # AV (N²C) + proj (NC²); FLOPs = 2·MACs
    flops = 2.0 * B * depth * (4.0 * N * C * C + 2.0 * N * N * C)
    return {"fused": fused, "ms_per_pass": round(dt * 1e3, 2),
            "mfu": round(flops / dt / PEAK, 4)}


def bench_full_train(fused: bool) -> dict:
    env = dict(os.environ, VIT_FUSED_ATTN="1" if fused else "0")
    out = subprocess.run(
        [sys.executable, "bench.py", "--train", "--model",
         "vit_base_patch16_224"],
        capture_output=True, text=True, env=env, timeout=1800,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    d = json.loads(line)
    return {"fused": fused, "clips_per_sec": d["value"], "mfu": d["mfu"]}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-train", action="store_true")
    args = ap.parse_args()
    for fused in (False, True):
        print(json.dumps({"attn_half": bench_attn_half(fused)}), flush=True)
    if not args.skip_train:
        for fused in (False, True):
            print(json.dumps({"full_train": bench_full_train(fused)}),
                  flush=True)


if __name__ == "__main__":
    main()
