#!/usr/bin/env python
"""AOT-export the serving forward to a portable StableHLO artifact.

Beyond reference parity: the reference deploys by shipping the whole Python
stack (torch + model code + app.py) everywhere it serves. On TPU the natural
deployment unit is the **compiled program**: ``jax.export`` lowers the jitted
serving forward — YUV unpack / normalize / backbone / temporal head / softmax,
with the checkpoint's weights baked in as constants — to versioned, serialized
StableHLO that any runtime with PJRT (or a newer jax, via
``jax.export.deserialize``) can load and call WITHOUT this package's model
code or the original checkpoint file.

    # export (honours COMPUTE_DTYPE / QUANTIZE / FACE_SIZE env, like serving)
    python tools/export_serving.py --checkpoint checkpoints/dfdc/best.npz \
        --out serving_b0.shlo --batch 8 --frames 8 [--yuv] \
        [--platform tpu] [--symbolic-batch]

    # verify an artifact against the live forward on random input
    python tools/export_serving.py --checkpoint ... --out ... --check

``--symbolic-batch`` exports with a symbolic leading dimension so one
artifact serves every batch size (shape-polymorphic StableHLO); the static
default compiles the exact serving shape. ``--platform`` cross-lowers for a
device family you are not running on (e.g. export TPU artifacts from a CPU
CI host).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_serving_fn(checkpoint: str, yuv: bool, face_size: int):
    """(fn(input) -> probs, example input spec builder). Weights are closed
    over — they become constants in the exported module."""
    import jax

    from deepfake_video_detection_tpu.serve import loader
    from deepfake_video_detection_tpu.serve.predict import make_forward_fns

    model, variables, stats = loader.load_model(checkpoint)
    if stats["model_type"] not in ("pretrained", "ensemble_pretrained",
                                   "temporal"):
        raise SystemExit(f"model_type {stats['model_type']!r} has no export "
                         "path (pretrained/ensemble/temporal only)")
    is_ensemble = stats["model_type"] == "ensemble_pretrained"
    fwd, fwd_yuv = make_forward_fns(model, is_ensemble, face_size)
    variables = jax.device_put(variables)
    inner = fwd_yuv if yuv else fwd

    def serve_fn(x):
        probs, _logits, frame_scores, _member = inner(variables, x)
        return {"probs": probs, "frame_scores": frame_scores}

    return serve_fn, stats


def input_spec(batch, frames: int, face_size: int, yuv: bool):
    import jax
    import jax.numpy as jnp

    if yuv:
        shape = (batch, frames, face_size * face_size * 3 // 2)
    else:
        shape = (batch, frames, face_size, face_size, 3)
    return jax.ShapeDtypeStruct(shape, jnp.uint8)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--face-size", type=int,
                    default=int(os.environ.get("FACE_SIZE", 224)))
    ap.add_argument("--yuv", action="store_true",
                    help="export the packed-YUV420 transfer variant "
                         "(half the host->device bytes)")
    ap.add_argument("--symbolic-batch", action="store_true",
                    help="shape-polymorphic leading dim: one artifact, "
                         "every batch size")
    ap.add_argument("--platform", default=None,
                    help="lowering platform(s), comma-separated (tpu,cpu,"
                         "cuda); default: the current backend")
    ap.add_argument("--check", action="store_true",
                    help="after writing, deserialize the artifact and compare "
                         "outputs to the live forward on random input")
    args = ap.parse_args(argv)

    import jax
    import numpy as np
    from jax import export as jexport

    serve_fn, stats = build_serving_fn(args.checkpoint, args.yuv,
                                       args.face_size)
    batch = args.batch
    if args.symbolic_batch:
        (batch,) = jexport.symbolic_shape("b")
    spec = input_spec(batch, args.frames, args.face_size, args.yuv)

    platforms = (tuple(p.strip() for p in args.platform.split(","))
                 if args.platform else None)
    exported = jexport.export(jax.jit(serve_fn), platforms=platforms)(spec)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)

    summary = {
        "out": args.out,
        "bytes": len(blob),
        "platforms": list(exported.platforms),
        "input": f"uint8{tuple(str(d) for d in spec.shape)}",
        "outputs": [str(o) for o in exported.out_avals],
        "model_type": stats["model_type"],
        "backbones": stats.get("backbones"),
        "quantized_weights": stats.get("quantized_weights", 0),
        "calling_convention_version": exported.calling_convention_version,
    }
    print(json.dumps(summary))

    if args.check:
        import jax.numpy as jnp

        from deepfake_video_detection_tpu.serve.loader import serving_dtype

        rt = jexport.deserialize(bytearray(blob))
        concrete = input_spec(max(args.batch, 1), args.frames,
                              args.face_size, args.yuv)
        x = np.random.default_rng(0).integers(
            0, 255, concrete.shape, np.uint8)
        got = rt.call(x)
        want = serve_fn(x)
        # bf16 serving (accelerators): the artifact and the live jit are two
        # SEPARATE compilations of the same bf16 program — fusion order may
        # round differently, so allow bf16-scale slack; f32 is near-exact
        tol = 2e-5 if serving_dtype() == jnp.float32 else 5e-3
        np.testing.assert_allclose(np.asarray(got["probs"]),
                                   np.asarray(want["probs"]),
                                   atol=tol, rtol=tol)
        np.testing.assert_allclose(
            np.asarray(got["frame_scores"], np.float32),
            np.asarray(want["frame_scores"], np.float32),
            atol=tol, rtol=tol)
        print(json.dumps({"check": "ok",
                          "max_prob_delta": float(np.max(np.abs(
                              np.asarray(got["probs"])
                              - np.asarray(want["probs"]))))}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
