"""Dynamic request micro-batching (serve/batcher.py).

The reference serves one request at a time (gunicorn --workers 1 --threads 1,
Procfile:1); here concurrent requests coalesce into one batched device step.
These tests pin: coalescing actually happens, per-item results are identical
to direct calls, shape/function grouping, error propagation, and the
Predictor integration returning the same verdicts concurrent-batched as
serial-unbatched.
"""

from __future__ import annotations

import concurrent.futures as fut
import os
import time

import numpy as np
import pytest

from deepfake_video_detection_tpu.serve.batcher import MicroBatcher, _bucket


def test_bucket_sizes():
    assert [_bucket(n, 16) for n in (1, 2, 3, 5, 8, 9, 16, 100)] == \
        [1, 2, 4, 8, 8, 16, 16, 16]


def test_microbatcher_coalesces_and_matches_direct():
    calls = []

    def batch_fn(stacked):
        calls.append(stacked.shape[0])
        time.sleep(0.02)  # let the remaining submitters queue up
        # outputs with batch axis 0 and batch axis 1
        return stacked.sum(axis=(1, 2)), np.moveaxis(stacked * 2.0, 0, 1)

    mb = MicroBatcher(max_batch=16, max_wait_s=0.002)
    rng = np.random.default_rng(0)
    items = [rng.random((3, 4)).astype(np.float32) for _ in range(12)]

    with fut.ThreadPoolExecutor(12) as pool:
        results = list(pool.map(
            lambda x: mb.call(batch_fn, x, out_axes=(0, 1)), items))

    for x, (s, d) in zip(items, results):
        assert s.shape == (1,) and np.allclose(s[0], x.sum())
        assert d.shape == (3, 1, 4) and np.allclose(d[:, 0], x * 2.0)
    # 12 items arrived concurrently: far fewer batches than items
    assert mb.items_run == 12
    assert mb.batches_run == len(calls) < 12
    # every launched batch is a power-of-two bucket
    assert all(c in (1, 2, 4, 8, 16) for c in calls)
    mb.close()


def test_microbatcher_single_item_prompt():
    mb = MicroBatcher(max_batch=8, max_wait_s=0.002)
    t0 = time.monotonic()
    (out,) = mb.call(lambda s: (s + 1.0,), np.zeros((2,), np.float32),
                     out_axes=(0,))
    assert time.monotonic() - t0 < 2.0
    assert out.shape == (1, 2) and np.allclose(out, 1.0)
    mb.close()


def test_microbatcher_groups_by_shape_and_fn():
    seen = []

    def fn_a(s):
        seen.append(("a", s.shape))
        return (s,)

    def fn_b(s):
        seen.append(("b", s.shape))
        return (s,)

    mb = MicroBatcher(max_batch=8, max_wait_s=0.01)
    with fut.ThreadPoolExecutor(4) as pool:
        fs = [pool.submit(mb.call, fn_a, np.zeros((2, 2)), (0,)),
              pool.submit(mb.call, fn_a, np.zeros((3, 2)), (0,)),
              pool.submit(mb.call, fn_b, np.zeros((2, 2)), (0,)),
              pool.submit(mb.call, fn_a, np.zeros((2, 2)), (0,))]
        for f in fs:
            f.result()
    # fn_a(2,2) items may share a batch; (3,2) and fn_b never mix with them
    for tag, shape in seen:
        assert shape[1:] in ((2, 2), (3, 2))
    assert ("a", (1, 3, 2)) in seen or ("a", (2, 3, 2)) in seen or \
        any(t == "a" and s[1:] == (3, 2) for t, s in seen)
    assert any(t == "b" for t, s in seen)
    mb.close()


def test_microbatcher_closed_falls_through_to_direct():
    """A closed batcher (model swap) still serves in-flight callers with a
    direct padded batch instead of raising."""
    mb = MicroBatcher(max_batch=8, max_wait_s=0.002, bucket_multiple=4)
    mb.close()
    (out,) = mb.call(lambda s: (s * 2.0,), np.ones((3,), np.float32),
                     out_axes=(0,))
    assert out.shape == (1, 3) and np.allclose(out, 2.0)


def test_microbatcher_error_propagates_to_all():
    def boom(s):
        raise ValueError("batch failed")

    mb = MicroBatcher(max_batch=8, max_wait_s=0.02)
    with fut.ThreadPoolExecutor(3) as pool:
        fs = [pool.submit(mb.call, boom, np.zeros((2,)), (0,))
              for _ in range(3)]
        for f in fs:
            with pytest.raises(ValueError, match="batch failed"):
                f.result()
    mb.close()


class _StubDetector:
    """Pretrained-shaped model: (logits (B,2), frame_scores (B,T))."""

    def init(self, rng):
        return {"params": {}, "state": {}}

    def apply(self, variables, x, train=False, rng=None):
        import jax.numpy as jnp

        B, T = x.shape[0], x.shape[1]
        m = jnp.mean(x, axis=(2, 3, 4))
        logits = jnp.stack([m.mean(1), -m.mean(1)], axis=-1) * 10.0
        return (logits, jnp.full((B, T), 1.0 / T)), {}


def test_predictor_microbatch_matches_serial(monkeypatch):
    from deepfake_video_detection_tpu.data.faces import FaceExtractor
    from deepfake_video_detection_tpu.serve.predict import Predictor

    monkeypatch.setenv("MIN_FACES", "1")
    ex = FaceExtractor(detector="center", face_size=16)
    model = _StubDetector()
    rng = np.random.default_rng(1)
    clips = [rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
             for _ in range(10)]

    monkeypatch.setenv("SERVE_MICROBATCH", "0")
    serial = Predictor(model, model.init(None), "pretrained", extractor=ex)
    assert serial._batcher is None
    want = [serial.predict_faces(c, f"v{i}") for i, c in enumerate(clips)]

    monkeypatch.setenv("SERVE_MICROBATCH", "1")
    batched = Predictor(model, model.init(None), "pretrained", extractor=ex)
    assert batched._batcher is not None
    with fut.ThreadPoolExecutor(10) as pool:
        got = list(pool.map(
            lambda ic: batched.predict_faces(ic[1], f"v{ic[0]}"),
            enumerate(clips)))

    for w, g in zip(want, got):
        assert w.keys() == g.keys()
        for k in ("prediction", "pred_class", "num_faces", "abstained"):
            assert w.get(k) == g.get(k), (k, w, g)
        for k in ("prob_real", "prob_fake", "confidence"):
            if w.get(k) is not None:
                assert g[k] == pytest.approx(w[k], abs=1e-5), k
    assert batched._batcher.items_run == 10


def test_predictor_serving_dp_over_mesh(monkeypatch):
    """With >1 device and micro-batching on, the coalesced batch shards
    over the `data` mesh axis (serving data-parallelism): buckets are
    mesh-divisible and verdicts match the unsharded serial path."""
    import jax

    from deepfake_video_detection_tpu.data.faces import FaceExtractor
    from deepfake_video_detection_tpu.serve.predict import Predictor

    assert len(jax.devices()) == 8, "conftest provisions the 8-device mesh"
    monkeypatch.setenv("MIN_FACES", "1")
    ex = FaceExtractor(detector="center", face_size=16)
    model = _StubDetector()
    rng = np.random.default_rng(2)
    clips = [rng.integers(0, 255, (4, 16, 16, 3), dtype=np.uint8)
             for _ in range(6)]

    monkeypatch.setenv("SERVE_MICROBATCH", "0")
    serial = Predictor(model, model.init(None), "pretrained", extractor=ex)
    want = [serial.predict_faces(c, f"v{i}") for i, c in enumerate(clips)]

    monkeypatch.setenv("SERVE_MICROBATCH", "1")
    monkeypatch.setenv("SERVE_DP", "1")
    dp = Predictor(model, model.init(None), "pretrained", extractor=ex)
    assert dp._batcher is not None and dp._batcher.bucket_multiple == 8
    with fut.ThreadPoolExecutor(6) as pool:
        got = list(pool.map(
            lambda ic: dp.predict_faces(ic[1], f"v{ic[0]}"),
            enumerate(clips)))

    for w, g in zip(want, got):
        for k in ("prediction", "pred_class", "num_faces", "abstained"):
            assert w.get(k) == g.get(k), (k, w, g)
        for k in ("prob_real", "prob_fake", "confidence"):
            if w.get(k) is not None:
                assert g[k] == pytest.approx(w[k], abs=1e-5), k


def test_extraction_admission_control(monkeypatch, tmp_path):
    """SERVE_EXTRACT_CONCURRENCY bounds in-flight extractions: with N
    request threads hammering predict_video, the CPU-bound extraction
    stage must never run more than the configured limit concurrently
    (the r4 sweep measured a 16-client throughput COLLAPSE without this —
    docs/serving.md)."""
    import threading

    import jax

    from deepfake_video_detection_tpu.data.video import encode_video
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector)
    from deepfake_video_detection_tpu.serve.predict import Predictor

    monkeypatch.setenv("SERVE_WARMUP", "0")
    monkeypatch.setenv("SERVE_MICROBATCH", "0")
    monkeypatch.setenv("MAX_FRAMES", "2")
    monkeypatch.setenv("SERVE_EXTRACT_CONCURRENCY", "2")

    vid = str(tmp_path / "clip_fake.avi")
    encode_video(vid, np.full((8, 64, 64, 3), 128, np.uint8), fps=8)

    model = BackboneDetector("resnet18", use_temporal_attention=False)
    ex_state = {"live": 0, "peak": 0}
    lock = threading.Lock()
    pred = Predictor(model, model.init(jax.random.PRNGKey(0)), "pretrained")
    orig = pred.extractor.extract_from_video_yuv

    def instrumented(*a, **kw):
        with lock:
            ex_state["live"] += 1
            ex_state["peak"] = max(ex_state["peak"], ex_state["live"])
        try:
            time.sleep(0.03)  # widen the race window
            return orig(*a, **kw)
        finally:
            with lock:
                ex_state["live"] -= 1

    pred.extractor.extract_from_video_yuv = instrumented
    with fut.ThreadPoolExecutor(8) as pool:
        results = list(pool.map(lambda _: pred.predict_video(vid), range(16)))
    assert all("prediction" in r or "error" in r for r in results)
    assert ex_state["peak"] <= 2, ex_state

    # knob off -> unbounded (no semaphore object at all)
    monkeypatch.setenv("SERVE_EXTRACT_CONCURRENCY", "0")
    pred2 = Predictor(model, model.init(jax.random.PRNGKey(0)), "pretrained")
    assert pred2._extract_sem is None
