"""Aux-subsystem tests: legacy detector wrapper, SQLite auth, profiling
utilities, orbax checkpoint wrapper, config tree."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.serve.auth_sqlite import SQLiteAuth
from deepfake_video_detection_tpu.serve.detector import (
    DeepfakeDetector, generate_explanation)
from deepfake_video_detection_tpu.utils.profiling import StageTimer, annotate


def test_sqlite_auth_roundtrip(tmp_path):
    db = SQLiteAuth(str(tmp_path / "auth.db"))
    uid = db.create_user("a@b.c", "secret")
    assert uid is not None
    assert db.create_user("a@b.c", "other") is None  # unique email
    assert db.verify_user("a@b.c", "secret") == uid
    assert db.verify_user("a@b.c", "wrong") is None
    up = db.add_upload(uid, "clip.mp4")
    db.update_upload(up, "Real", 0.93)
    rows = db.list_uploads(uid)
    assert rows[0]["verdict"] == "Real" and rows[0]["confidence"] == 0.93
    db.delete_upload(up)
    assert db.list_uploads(uid) == []


def test_legacy_sha256_accepted(tmp_path):
    import hashlib
    import sqlite3
    import time

    db = SQLiteAuth(str(tmp_path / "auth.db"))
    # simulate a reference-era row: bare sha256 hash
    with sqlite3.connect(db.db_path) as c:
        c.execute("INSERT INTO users (email, password_hash, created_at) "
                  "VALUES (?, ?, ?)",
                  ("old@user.com",
                   hashlib.sha256(b"legacypw").hexdigest(), time.time()))
    assert db.verify_user("old@user.com", "legacypw") is not None


def test_detector_wrapper(tmp_path):
    from deepfake_video_detection_tpu.data.video import encode_video
    from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid

    os.environ["FACE_SIZE"] = "32"
    try:
        vid = str(tmp_path / "v.avi")
        encode_video(vid, np.full((6, 48, 48, 3), 100, np.uint8), fps=6)
        model = CNNLSTMHybrid()
        det = DeepfakeDetector(model, model.init(jax.random.PRNGKey(0)),
                               model_type="cnn_lstm")
        out = det.detect(vid)
        assert out["is_fake"] in (0, 1)
        assert 0.0 <= out["confidence"] <= 1.0
        assert out["num_faces"] >= 1
        assert "LIKELY" in out["explanation"]
    finally:
        os.environ.pop("FACE_SIZE", None)


def test_generate_explanation_text():
    fake = generate_explanation(1, 0.9, 5)
    real = generate_explanation(0, 0.1, 3)
    assert "DEEPFAKE" in fake and "90.0%" in fake
    assert "AUTHENTIC" in real and "90.0%" in real


def test_stage_timer():
    t = StageTimer()
    with t.stage("decode"):
        pass
    with t.stage("decode"):
        pass
    with t.stage("forward"):
        pass
    s = t.summary()
    assert s["decode"]["count"] == 2 and s["forward"]["count"] == 1
    assert "decode" in t.report()


def test_annotate_runs():
    with annotate("test-region"):
        _ = jnp.ones(4) + 1


def test_orbax_roundtrip(tmp_path):
    ocp = pytest.importorskip("orbax.checkpoint")
    from deepfake_video_detection_tpu.checkpoint.store import (
        load_orbax, save_orbax)

    variables = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
                 "state": {}}
    path = str(tmp_path / "ck_orbax")
    save_orbax(path, variables)
    out = load_orbax(path)
    np.testing.assert_array_equal(out["variables"]["params"]["w"],
                                  variables["params"]["w"])
