"""Concurrent-serving benchmark: the REAL HTTP server under N clients.

VERDICT r2 item 4: prove (or disprove) that the micro-batcher
(``serve/batcher.py``) + YUV transfer path convert the >90 %-idle chip into
aggregate throughput when multiple clients hit the server at once.

What it does, end-to-end over real HTTP:
1. writes a random-init flagship B0 checkpoint (.npz) + a fleet of
   DFDC-shaped clips (360p, 10 s @ 30 fps — same fixture as bench.py);
2. starts ``serve.app`` as a subprocess (stdlib WSGI server, threaded),
   pointing MODEL_PATH at the checkpoint;
3. for each concurrency level: N client threads each POST clips to
   ``/api/predict`` (multipart) back-to-back for a fixed wall-clock window;
4. reports aggregate clips/s per level as one JSON line.

Run on the TPU host:  python tools/bench_serving.py
Results are recorded in docs/serving.md.
"""

from __future__ import annotations

import argparse
import io
import json
import os
import random
import socket
import subprocess
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor as _fut_pool

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _make_checkpoint(path: str) -> None:
    import jax

    from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)

    model = BackboneDetector("efficientnet_b0")
    variables = model.init(jax.random.PRNGKey(0))
    save_checkpoint(path, variables,
                    meta={"model_config": {"model_type": "pretrained",
                                           "backbone": "efficientnet_b0"}})


def _post_clip(url: str, path: str, timeout: float = 300.0) -> dict:
    boundary = "benchboundary%016x" % random.getrandbits(64)
    with open(path, "rb") as f:
        payload = f.read()
    body = io.BytesIO()
    body.write(f"--{boundary}\r\n".encode())
    body.write(f'Content-Disposition: form-data; name="video"; '
               f'filename="{os.path.basename(path)}"\r\n'
               f"Content-Type: video/avi\r\n\r\n".encode())
    body.write(payload)
    body.write(f"\r\n--{boundary}--\r\n".encode())
    req = urllib.request.Request(
        url, data=body.getvalue(),
        headers={"Content-Type":
                 f"multipart/form-data; boundary={boundary}"})
    with urllib.request.urlopen(req, timeout=timeout) as resp:
        return json.loads(resp.read().decode())


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", default="1,2,4,8,16",
                    help="comma-separated client counts")
    ap.add_argument("--seconds", type=float, default=30.0,
                    help="measurement window per level")
    ap.add_argument("--batch_window_ms", default=None,
                    help="micro-batcher window override for the server")
    ap.add_argument("--detector", default="center",
                    choices=("center", "haar"),
                    help="server-side FACE_DETECTOR: center = crop-prior "
                         "roofline, haar = REAL in-decoder detection "
                         "(VERDICT r3 item 5)")
    args = ap.parse_args()

    import bench  # repo-root bench.py: reuse the clip fleet fixture

    clips = bench._ensure_clips()
    ckpt = "/tmp/bench_serving_ckpt.npz"
    if not os.path.exists(ckpt):
        _make_checkpoint(ckpt)

    port = _free_port()
    env = dict(os.environ)
    env.update({
        "PYTHONPATH": REPO + os.pathsep + env.get("PYTHONPATH", ""),
        "MODEL_PATH": ckpt,
        "FACE_DETECTOR": args.detector,
        "MIN_FACES": "1",
        "SERVE_MICROBATCH": "1",
    })
    if args.batch_window_ms is not None:
        env["SERVE_MICROBATCH_WAIT_MS"] = str(args.batch_window_ms)
    server = subprocess.Popen(
        [sys.executable, "-m", "deepfake_video_detection_tpu.serve.app",
         "--port", str(port)],
        env=env, cwd=REPO, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True)
    # drain stdout continuously: wsgiref logs every request, and an
    # unread 64K pipe would eventually block the server
    server_log: list = []

    def _drain():
        for line in server.stdout:
            server_log.append(line)

    threading.Thread(target=_drain, daemon=True).start()

    url = f"http://localhost:{port}"
    try:
        deadline = time.time() + 1500   # model load through a slow relay
        up = False                      # window can take many minutes
        while time.time() < deadline:
            try:
                with urllib.request.urlopen(url + "/health", timeout=5):
                    up = True
                    break
            except Exception:
                if server.poll() is not None:
                    raise RuntimeError(
                        "server died:\n" + "".join(server_log)[-3000:])
                time.sleep(1.0)
        if not up:
            raise RuntimeError(
                "server did not come up in time:\n"
                + "".join(server_log)[-3000:])
        # one warm request compiles the serving forward
        t0 = time.time()
        r = _post_clip(url + "/api/predict", clips[0], timeout=900)
        if "error" in r:
            raise RuntimeError(f"warm request failed: {r}")
        print(f"# warm request {time.time() - t0:.1f}s", file=sys.stderr)

        results = {}
        for level in [int(x) for x in args.levels.split(",") if x.strip()]:
            # pre-warm this concurrency's micro-batch bucket (server-side
            # warmup also compiles them; this guards against a cold cache)
            with _fut_pool(level) as pool:
                list(pool.map(lambda p: _post_clip(url + "/api/predict", p,
                                                   timeout=900),
                              clips[:level]))
            done = [0] * level
            stop = time.time() + args.seconds
            errs: list = []
            lats: list = []                 # per-request wall seconds

            def client(ci: int) -> None:
                i = ci
                while time.time() < stop:
                    try:
                        r0 = time.time()
                        r = _post_clip(url + "/api/predict",
                                       clips[i % len(clips)])
                        if "error" in r:
                            errs.append(r["error"])
                        else:
                            done[ci] += 1
                            lats.append(time.time() - r0)
                    except Exception as e:  # noqa: BLE001
                        errs.append(str(e))
                    i += level

            t0 = time.time()
            ts = [threading.Thread(target=client, args=(c,))
                  for c in range(level)]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            dt = time.time() - t0
            total = sum(done)
            results[str(level)] = round(total / dt, 2)
            if lats:
                lats.sort()
                p50 = lats[len(lats) // 2]
                p95 = lats[min(len(lats) - 1, int(len(lats) * 0.95))]
                results[f"{level}_latency_ms"] = {
                    "p50": round(p50 * 1e3), "p95": round(p95 * 1e3)}
            if errs:
                results[f"{level}_errors"] = len(errs)
            print(f"# {level} clients: {total} clips in {dt:.1f}s "
                  f"= {total / dt:.2f} clips/s"
                  + (f", p50 {results[f'{level}_latency_ms']['p50']} ms / "
                     f"p95 {results[f'{level}_latency_ms']['p95']} ms"
                     if lats else ""), file=sys.stderr)

        print(json.dumps({
            "metric": "concurrent_serving_clips_per_sec",
            "value": max(v for k, v in results.items()
                         if isinstance(v, (int, float))
                         and not k.endswith("_errors")),
            "unit": ("aggregate clips/s over HTTP /api/predict "
                     f"(stdlib WSGI + micro-batcher, {args.detector}+YUV "
                     f"path, {os.path.basename(os.path.dirname(clips[0]))} "
                     "fleet)"),
            "levels": results,
        }))
    finally:
        server.terminate()
        try:
            server.wait(timeout=10)
        except subprocess.TimeoutExpired:
            server.kill()


if __name__ == "__main__":
    main()
