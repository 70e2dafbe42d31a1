"""Fault injection across the pipeline (SURVEY.md §5.3 — the reference has
NO fault injection; these tests go beyond parity and pin the failure
containment the framework promises in docs/architecture.md).

Covered faults: undecodable / empty / truncated video files at the decode,
predict, and dataset-prep layers; corrupt and wrong-schema .npz files at the
dataset layer. Checkpoint corruption fallback is pinned in test_loader.py;
batched-forward failure propagation in test_batcher.py.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from deepfake_video_detection_tpu.data.faces import FaceExtractor
from deepfake_video_detection_tpu.data.video import VideoDecodeError, encode_video


@pytest.fixture(scope="module")
def good_video(tmp_path_factory):
    d = tmp_path_factory.mktemp("faultclips")
    p = str(d / "clip_fake.avi")
    rng = np.random.default_rng(0)
    frames = (rng.random((30, 64, 96, 3)) * 255).astype(np.uint8)
    encode_video(p, frames, fps=10)
    return p


def test_garbage_and_empty_videos_raise_decode_error(tmp_path):
    garbage = tmp_path / "garbage.avi"
    garbage.write_bytes(os.urandom(4096))
    empty = tmp_path / "empty.avi"
    empty.write_bytes(b"")
    ex = FaceExtractor(detector="center", face_size=32)
    for p in (str(garbage), str(empty)):
        with pytest.raises((VideoDecodeError, RuntimeError)):
            ex.extract_from_video(p, max_frames=4)
        with pytest.raises((VideoDecodeError, RuntimeError)):
            ex.extract_from_video_yuv(p, max_frames=4)


def test_truncated_video_still_yields_frames(good_video, tmp_path):
    """libav recovers leading frames from a truncated container — the
    extractor must return what is decodable rather than fail."""
    data = open(good_video, "rb").read()
    trunc = tmp_path / "trunc.avi"
    trunc.write_bytes(data[: len(data) // 2])
    ex = FaceExtractor(detector="center", face_size=32)
    faces = ex.extract_from_video(str(trunc), max_frames=4)
    assert faces.ndim == 4 and faces.shape[0] >= 1


def test_predict_video_contains_decode_failure(tmp_path):
    """The serving route must always get a dict, never an exception
    (≙ reference predict_video's blanket error surface, app.py:2027)."""
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.serve.predict import Predictor

    class StubDetector:
        def init(self, rng):
            return {"params": {}, "state": {}}

        def apply(self, variables, x, train=False, rng=None):
            B, T = x.shape[0], x.shape[1]
            return (jnp.zeros((B, 2)), jnp.full((B, T), 1.0 / T)), {}

    garbage = tmp_path / "garbage.mp4"
    garbage.write_bytes(os.urandom(2048))
    model = StubDetector()
    pred = Predictor(model, model.init(None), "pretrained",
                     extractor=FaceExtractor(detector="center", face_size=32))
    out = pred.predict_video(str(garbage))
    assert isinstance(out, dict) and "error" in out


def test_prepare_cli_survives_corrupt_video(good_video, tmp_path):
    """One undecodable clip must not abort a prep run (DFDC-scale corpora
    always contain a few); the good clips still produce face stacks."""
    from deepfake_video_detection_tpu.data.prepare import main

    src = tmp_path / "vids"
    src.mkdir()
    data = open(good_video, "rb").read()
    (src / "a_fake.avi").write_bytes(data)
    (src / "b_real.avi").write_bytes(data)
    (src / "broken_fake.avi").write_bytes(os.urandom(4096))
    out = tmp_path / "faces"
    rc = main(["--data_dir", str(src), "--out_dir", str(out),
               "--sample_rate", "5", "--max_frames", "4", "--size", "32",
               "--detector", "center"])
    assert rc == 0
    names = sorted(f.name for f in out.glob("*.npz"))
    assert names == ["a_fake_fake.npz", "b_real_real.npz"]


def test_dataset_skips_corrupt_and_foreign_npz(tmp_path):
    from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset

    good = tmp_path / "ok_fake.npz"
    np.savez(good, faces=np.zeros((4, 16, 16, 3), np.uint8),
             label=np.int64(1))
    # truncated npz (valid zip magic, torn body)
    data = good.read_bytes()
    (tmp_path / "torn_real.npz").write_bytes(data[: len(data) // 3])
    # pure garbage with the right extension
    (tmp_path / "junk_real.npz").write_bytes(os.urandom(512))
    # wrong schema: an .npz without a faces array (e.g. a checkpoint)
    np.savez(tmp_path / "ckpt.npz", params=np.zeros((3,)))
    ds = VideoFacesDataset(str(tmp_path))
    assert [os.path.basename(f) for f in ds.files] == ["ok_fake.npz"]
    faces, label, _ = ds[0]
    assert faces.shape[0] >= 1 and label == 1
