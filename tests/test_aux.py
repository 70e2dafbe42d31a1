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


def test_signed_sessions_survive_restart(tmp_path, monkeypatch):
    """With FLASK_SECRET set (≙ the reference's Flask signed-cookie
    sessions, app.py:84) tokens are stateless HMAC values: they verify in a
    FRESH AuthStore (server restart), reject tampering, and expire; without
    a secret the in-memory fallback logs out on restart."""
    from deepfake_video_detection_tpu.serve.auth import AuthStore

    monkeypatch.setenv("FLASK_SECRET", "test-secret-key")
    store = AuthStore(data_dir=str(tmp_path))
    token = store.signup("a@b.io", "hunter22")
    assert token and token.startswith("s.")
    assert store.user_for_token(token) == "a@b.io"
    # restart: a brand-new store still resolves the token
    fresh = AuthStore(data_dir=str(tmp_path))
    assert fresh.user_for_token(token) == "a@b.io"
    # tampered payload or signature → rejected
    head, b64, exp, sig = token.split(".")
    assert fresh.user_for_token(f"{head}.{b64}.{int(exp) + 9}.{sig}") is None
    assert fresh.user_for_token(token[:-4] + "beef") is None
    # expired → rejected
    monkeypatch.setenv("SESSION_TTL_SECONDS", "-1")
    stale = store.login("a@b.io", "hunter22")
    assert store.user_for_token(stale) is None
    monkeypatch.delenv("SESSION_TTL_SECONDS")
    # a different secret invalidates old tokens
    monkeypatch.setenv("FLASK_SECRET", "rotated")
    assert AuthStore(data_dir=str(tmp_path)).user_for_token(token) is None
    # no secret → random in-memory tokens: valid in-process, gone on restart
    monkeypatch.delenv("FLASK_SECRET")
    store2 = AuthStore(data_dir=str(tmp_path))
    t2 = store2.login("a@b.io", "hunter22")
    assert t2 and not t2.startswith("s.")
    assert store2.user_for_token(t2) == "a@b.io"
    assert AuthStore(data_dir=str(tmp_path)).user_for_token(t2) is None


def test_rtdb_upload_mirror(tmp_path, monkeypatch):
    """Uploads mirror to Firebase RTDB (`uploads/<uid>/<id>`) when
    FIREBASE_DATABASE_URL is set and the user logged in via Firebase,
    with per-call fallback to the local JSON db — the reference's
    `_load/_save_uploads_db` semantics (app.py:2880-2918)."""
    import contextlib
    import io
    import json as _json

    from deepfake_video_detection_tpu.serve.auth import AuthStore

    monkeypatch.setenv("FIREBASE_DATABASE_URL", "https://rtdb.example/")
    store = AuthStore(data_dir=str(tmp_path))
    store.fb_uids["u@x.io"] = "uid123"

    calls = []
    remote = {}

    def fake_http(req, timeout=None):
        calls.append((req.get_method(), req.full_url))
        if req.get_method() == "PUT":
            key = req.full_url.rsplit("/", 1)[1][:-len(".json")]
            remote[key] = _json.loads(req.data.decode())
            return contextlib.closing(io.BytesIO(b""))
        return contextlib.closing(io.BytesIO(_json.dumps(remote).encode()))

    store._http = fake_http

    rec = {"id": "abc", "filename": "v.mp4", "verdict": "Real"}
    store.add_upload("u@x.io", rec)
    assert calls[0] == ("PUT", "https://rtdb.example/uploads/uid123/abc.json")
    # the local mirror is ALWAYS written so a later transient RTDB read
    # failure can't make the user's history disappear
    assert (tmp_path / "uploads.json").exists()

    got = store.list_uploads("u@x.io")
    assert got == [rec]
    assert calls[-1][0] == "GET"

    # RTDB failure → local fallback, like the reference — and the earlier
    # remote-PUT record is still there thanks to the local mirror
    def broken(req, timeout=None):
        raise OSError("no egress")

    store._http = broken
    store.add_upload("u@x.io", {"id": "d2", "filename": "w.mp4"})
    assert store.list_uploads("u@x.io") == [
        rec, {"id": "d2", "filename": "w.mp4"}]

    # RTDB recovers: d2's PUT never landed remotely, but the merge keeps it
    # (local-only ∪ remote), so the record and its result page survive the
    # outage; remote-only records (another device) are appended too
    remote["ext"] = {"id": "ext", "filename": "other-device.mp4"}
    store._http = fake_http
    assert store.list_uploads("u@x.io") == [
        rec, {"id": "d2", "filename": "w.mp4"},
        {"id": "ext", "filename": "other-device.mp4"}]

    # no Firebase uid (local-fallback account) → purely local, no HTTP
    store._http = fake_http
    n_calls = len(calls)
    store.add_upload("local@x.io", {"id": "L1"})
    assert store.list_uploads("local@x.io") == [{"id": "L1"}]
    assert len(calls) == n_calls


# ---------------------------------------------------------------------------
# Live-HTTP-path coverage for the Gemini + Firebase integrations against a
# loopback mock server (VERDICT r4 item 6): request formation, response
# parsing, error fallback and the keyword guardrail — no network needed.
# ---------------------------------------------------------------------------


import contextlib
import json as _json


@contextlib.contextmanager
def _loopback_server(responder):
    """Serve ``responder(method, path, body) -> (status, json_payload)`` on
    an ephemeral loopback port; yields (base_url, recorded_calls)."""
    import http.server
    import threading

    calls = []

    class H(http.server.BaseHTTPRequestHandler):
        def _handle(self):
            n = int(self.headers.get("Content-Length") or 0)
            body = self.rfile.read(n) if n else b""
            calls.append((self.command, self.path, body))
            status, payload = responder(self.command, self.path, body)
            data = _json.dumps(payload).encode()
            self.send_response(status)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        do_GET = do_POST = do_PUT = _handle

        def log_message(self, *a):  # keep pytest output clean
            pass

    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), H)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        yield f"http://127.0.0.1:{srv.server_address[1]}", calls
    finally:
        srv.shutdown()
        srv.server_close()


def test_gemini_chat_live_path_guardrail_and_fallback(monkeypatch):
    """≙ app.py:1190-1212: the LIVE Gemini branch — prompt carries the
    last-result context, reply text is extracted from the candidates
    payload; the keyword guardrail answers off-topic messages locally
    without touching the API; HTTP errors fall back to the local reply."""
    from deepfake_video_detection_tpu.serve import chat

    def ok(method, path, body):
        assert method == "POST" and "generateContent" in path
        req = _json.loads(body)
        assert "deepfake" in req["contents"][0]["parts"][0]["text"].lower()
        return 200, {"candidates": [{"content": {"parts": [
            {"text": "Your clip scored prob_fake 0.93 — likely a deepfake."}
        ]}}]}

    last = {"prediction": "Deepfake", "prob_fake": 0.93}
    with _loopback_server(ok) as (base, calls):
        monkeypatch.setattr(
            chat, "_GEMINI_URL",
            base + "/v1beta/models/gemini-1.5-flash:generateContent?key={key}")
        out = chat.generate_chat_reply_gemini(
            "why was my video flagged as a deepfake?", last, api_key="K")
        assert out.startswith("Your clip scored prob_fake 0.93")
        assert len(calls) == 1
        assert "key=K" in calls[0][1]
        # context JSON rode along in the prompt
        assert "0.93" in calls[0][2].decode()

        # guardrail: off-topic never reaches the live API
        out2 = chat.generate_chat_reply_gemini(
            "what's the weather in Paris?", last, api_key="K")
        assert "deepfake detection topics" in out2
        assert len(calls) == 1

    def err(method, path, body):
        return 500, {"error": "boom"}

    with _loopback_server(err) as (base, calls):
        monkeypatch.setattr(
            chat, "_GEMINI_URL",
            base + "/v1beta/models/gemini-1.5-flash:generateContent?key={key}")
        out3 = chat.generate_chat_reply_gemini(
            "why was my video flagged as a deepfake?", last, api_key="K")
        assert len(calls) == 1          # live path attempted...
        assert out3 == chat.generate_chat_reply(
            "why was my video flagged as a deepfake?", last)  # ...then local


def test_gemini_report_live_and_error_fallback(monkeypatch):
    """≙ app.py:1215-1285: report generator's live path + 200-word local
    fallback on API failure."""
    from deepfake_video_detection_tpu.serve import chat
    from deepfake_video_detection_tpu.serve.predict import (
        simple_english_justification_200_words)

    result = {"prediction": "Real", "prob_fake": 0.12, "prob_real": 0.88,
              "confidence": 0.88, "num_faces": 8, "threshold": 0.5}

    def ok(method, path, body):
        assert b"200-word" in body
        return 200, {"candidates": [{"content": {"parts": [
            {"text": "REPORT TEXT"}]}}]}

    with _loopback_server(ok) as (base, calls):
        monkeypatch.setattr(
            chat, "_GEMINI_URL", base + "/gen?key={key}")
        assert chat.gemini_generate_english_report(
            result, "a.mp4", api_key="K") == "REPORT TEXT"
        assert len(calls) == 1

    def err(method, path, body):
        return 503, {}

    with _loopback_server(err) as (base, calls):
        monkeypatch.setattr(chat, "_GEMINI_URL", base + "/gen?key={key}")
        out = chat.gemini_generate_english_report(result, "a.mp4", api_key="K")
        assert out == simple_english_justification_200_words(result, "a.mp4")
        assert len(calls) == 1


def test_firebase_live_signup_signin_loopback(tmp_path, monkeypatch):
    """≙ app.py:1021-1055: the LIVE identitytoolkit branch — signUp and
    signInWithPassword request formation + localId capture; a 400 from the
    API (wrong credentials) degrades to the local users.json path."""
    from deepfake_video_detection_tpu.serve.auth import AuthStore

    accounts = {}

    def fb(method, path, body):
        req = _json.loads(body)
        assert req["returnSecureToken"] is True
        if "accounts:signUp" in path:
            accounts[req["email"]] = req["password"]
            return 200, {"localId": "uid-42", "idToken": "tok1",
                         "email": req["email"]}
        assert "accounts:signInWithPassword" in path
        if accounts.get(req["email"]) == req["password"]:
            return 200, {"localId": "uid-42", "idToken": "tok2"}
        return 400, {"error": {"message": "INVALID_PASSWORD"}}

    with _loopback_server(fb) as (base, calls):
        monkeypatch.setenv("FIREBASE_API_KEY", "fbkey")
        monkeypatch.setenv("FIREBASE_IDENTITY_BASE", base)
        auth = AuthStore(data_dir=str(tmp_path))

        token = auth.signup("User@Example.com", "hunter22")
        assert token
        assert auth.fb_uids["user@example.com"] == "uid-42"
        assert auth.user_for_token(token) == "user@example.com"
        assert "key=fbkey" in calls[0][1]

        # live sign-in with the right password
        token2 = auth.login("user@example.com", "hunter22")
        assert token2 and auth.user_for_token(token2) == "user@example.com"

        # wrong password: API 400 → local fallback → no local record → None
        assert auth.login("user@example.com", "wrong") is None
        assert len(calls) == 3


def test_firebase_rtdb_live_mirror_roundtrip(tmp_path, monkeypatch):
    """≙ app.py:815-831, 2880-2918: RTDB PUT on upload + GET/merge on list,
    through the real urllib stack against a loopback RTDB."""
    from deepfake_video_detection_tpu.serve.auth import AuthStore

    store = {}

    def rtdb(method, path, body):
        if method == "PUT":
            store[path] = _json.loads(body)
            return 200, store[path]
        if path == "/uploads/uid-7.json":
            return 200, {rec["id"]: rec for rec in store.values()}
        return 404, {}

    with _loopback_server(rtdb) as (base, calls):
        monkeypatch.setenv("FIREBASE_DATABASE_URL", base)
        auth = AuthStore(data_dir=str(tmp_path))
        auth.fb_uids["u@x.com"] = "uid-7"

        rec = {"id": "up1", "filename": "a.mp4", "prediction": "Real"}
        auth.add_upload("u@x.com", rec)
        assert "/uploads/uid-7/up1.json" in store
        # remote-only record (other device) appears after the merge
        store["/uploads/uid-7/up9.json"] = {"id": "up9", "filename": "b.mp4"}
        listed = auth.list_uploads("u@x.com")
        ids = {r["id"] for r in listed}
        assert ids == {"up1", "up9"}
