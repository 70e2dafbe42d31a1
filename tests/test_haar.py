"""First-party Viola-Jones detector (data/haar.py + native/haar.cc).

Covers the VERDICT r2 "done" bar: the haar detector crops a synthetic
OFF-CENTER face correctly while the center prior provably mis-crops it;
the numpy and C++ engines agree window-for-window; grouping semantics;
the FaceExtractor fallback chain mtcnn → haar → center; and the
config surface (FACE_DETECTOR=haar is now a real value,
utils/config.py:73). Reference behavior matched: app.py:1988-2025
(cv2 CascadeClassifier detectMultiScale(gray, 1.1, 4), keep-largest)."""

import numpy as np
import pytest

from deepfake_video_detection_tpu.data.haar import (
    HaarCascade, detect_faces, find_cascade_file, get_default_cascade,
    group_rectangles, rgb_to_gray)


def _require_cascade():
    if find_cascade_file() is None:
        pytest.skip("no Haar cascade XML installed")


def synth_face(size=100):
    """Face-like gray patch with the contrast structure frontal Haar
    stumps test: bright oval, dark eyes under brow shadow, lighter nose
    bridge, dark mouth. Passes all 25 stages of frontalface_default."""
    s = size
    img = np.full((s, s), 120.0)
    yy, xx = np.mgrid[0:s, 0:s] / (s - 1.0)
    face = ((yy - 0.52) / 0.48) ** 2 + ((xx - 0.5) / 0.40) ** 2 <= 1.0
    img[face] = 200.0

    def ellipse(cy, cx, ry, rx, val):
        m = (((yy - cy) / ry) ** 2 + ((xx - cx) / rx) ** 2 <= 1.0) & face
        img[m] = val

    ellipse(0.38, 0.32, 0.055, 0.10, 60)
    ellipse(0.38, 0.68, 0.055, 0.10, 60)
    ellipse(0.30, 0.32, 0.035, 0.11, 150)
    ellipse(0.30, 0.68, 0.035, 0.11, 150)
    ellipse(0.55, 0.5, 0.10, 0.05, 180)
    ellipse(0.72, 0.5, 0.045, 0.16, 80)
    return img


def scene_with_face(H=240, W=320, oy=30, ox=170, s=110):
    img = np.full((H, W), 120.0)
    img[oy:oy + s, ox:ox + s] = synth_face(s)
    return img


def _iou(a, b):
    ix = max(0.0, min(a[2], b[2]) - max(a[0], b[0]))
    iy = max(0.0, min(a[3], b[3]) - max(a[1], b[1]))
    inter = ix * iy
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / ua


# ---------------------------------------------------------------- parsing

def test_parse_frontalface_default():
    _require_cascade()
    c = HaarCascade()
    assert c.win_h == 24 and c.win_w == 24
    assert c.n_stages == 25
    assert len(c.feat_idx) == 2913          # stump count of the classic file
    assert c.stage_ends[-1] == len(c.feat_idx)
    assert np.all(np.diff(c.stage_ends) > 0)
    # every feature referenced, rects inside the window, 2-3 rects each
    assert c.feat_idx.max() < len(c.rects)
    used = c.rects[c.feat_idx]
    w = c.weights[c.feat_idx]
    assert np.all((w != 0).sum(1) >= 2)
    act = w != 0
    assert np.all((used[..., 0] + used[..., 2])[act] <= c.win_w)
    assert np.all((used[..., 1] + used[..., 3])[act] <= c.win_h)


# ---------------------------------------------------------------- detection

def test_detects_offcenter_synthetic_face_and_rejects_noise():
    _require_cascade()
    c = HaarCascade()
    img = scene_with_face()
    boxes, counts = c.detect(img)
    assert len(boxes) >= 1
    x, y, w, h = boxes[0]
    assert _iou([x, y, x + w, y + h], [170, 30, 280, 140]) > 0.5
    # no detections on structureless content
    rng = np.random.RandomState(0)
    for bad in (rng.rand(240, 320) * 255,
                np.tile(np.linspace(0, 255, 320), (240, 1)),
                np.full((240, 320), 128.0)):
        b, _ = c.detect(bad)
        assert len(b) == 0


def test_detection_follows_translation():
    _require_cascade()
    c = HaarCascade()
    b1, _ = c.detect(scene_with_face(ox=40, oy=50))
    b2, _ = c.detect(scene_with_face(ox=160, oy=80))
    assert len(b1) and len(b2)
    assert abs((b2[0][0] - b1[0][0]) - 120) < 15
    assert abs((b2[0][1] - b1[0][1]) - 30) < 15


def test_numpy_and_native_engines_identical():
    """The C++ scan (native/haar.cc) must reproduce the numpy engine
    window-for-window — same integer pyramid, same variance norm, same
    stage arithmetic."""
    _require_cascade()
    c = HaarCascade()
    img = scene_with_face().astype(np.float32)
    raw_np = c._detect_raw_numpy(img, 1.1, 24, None)
    raw_cc = c._detect_raw_native(img, 1.1, 24, None)
    if raw_cc is None:
        pytest.skip("native haar engine unavailable (no g++?)")
    a = set(map(tuple, np.round(raw_np, 3)))
    b = set(map(tuple, np.round(raw_cc, 3)))
    assert a == b, f"engines disagree: only-np={a - b} only-cc={b - a}"
    assert len(a) > 0


def test_simd_and_scalar_native_engines_identical(monkeypatch):
    """The AVX-512 group scan must be BIT-identical to the scalar C++ scan
    (same double-precision op sequence per lane, no FMA contraction) —
    window-for-window, including window ORDER, on both structured and
    dense-survival inputs. Skips where the host lacks AVX-512 (the scalar
    path is then the only engine and is covered above)."""
    _require_cascade()
    c = HaarCascade()
    rng = np.random.default_rng(7)
    scenes = [scene_with_face().astype(np.float32),
              scene_with_face(ox=160, oy=80).astype(np.float32),
              rng.integers(0, 256, (180, 320)).astype(np.float32)]
    any_diff_path = False
    for img in scenes:
        monkeypatch.setenv("HAAR_SIMD", "0")
        raw_scalar = c._detect_raw_native(img, 1.1, 24, None)
        monkeypatch.setenv("HAAR_SIMD", "1")
        raw_simd = c._detect_raw_native(img, 1.1, 24, None)
        if raw_scalar is None or raw_simd is None:
            pytest.skip("native haar engine unavailable (no g++?)")
        assert raw_scalar.shape == raw_simd.shape
        assert np.array_equal(raw_scalar, raw_simd)
        any_diff_path = any_diff_path or len(raw_scalar) > 0
    assert any_diff_path  # at least one scene produced windows to compare


def test_detect_faces_fullres_coords():
    """detect_faces runs at HAAR_MAX_SIDE but returns original coords."""
    _require_cascade()
    img = scene_with_face()
    rgb = np.stack([img] * 3, -1).astype(np.uint8)
    big = np.kron(rgb, np.ones((3, 3, 1), np.uint8))    # 720x960
    xyxy, counts = detect_faces(big)
    assert len(xyxy) >= 1
    assert _iou(xyxy[0], [170 * 3, 30 * 3, 280 * 3, 140 * 3]) > 0.5


def test_detect_faces_roi_and_size_pruning():
    """roi= restricts the scan but returns original full-frame coords;
    min/max_size_px prune pyramid levels without losing the face."""
    _require_cascade()
    img = scene_with_face(H=240, W=320, oy=30, ox=170, s=110)
    rgb = np.stack([img] * 3, -1).astype(np.uint8)
    full, _ = detect_faces(rgb)
    assert len(full) >= 1
    b = full[0]
    side = max(b[2] - b[0], b[3] - b[1])
    cx, cy = 0.5 * (b[0] + b[2]), 0.5 * (b[1] + b[3])
    half = side  # 2x expansion
    roi_boxes, _ = detect_faces(
        rgb, roi=(cx - half, cy - half, cx + half, cy + half),
        min_size_px=0.6 * side, max_size_px=1.6 * side)
    assert len(roi_boxes) >= 1
    assert _iou(roi_boxes[0], b) > 0.6
    # an roi away from the face finds nothing
    off, _ = detect_faces(rgb, roi=(0, 130, 110, 240))
    assert len(off) == 0
    # roi coords survive the HAAR_MAX_SIDE downscale path (scale > 1)
    big = np.kron(rgb, np.ones((3, 3, 1), np.uint8))    # 720x960
    bb = [x * 3 for x in b]
    bside = 3 * side
    bcx, bcy = 3 * cx, 3 * cy
    roi_big, _ = detect_faces(
        big, roi=(bcx - bside, bcy - bside, bcx + bside, bcy + bside),
        min_size_px=0.6 * bside, max_size_px=1.6 * bside)
    assert len(roi_big) >= 1
    assert _iou(roi_big[0], bb) > 0.5


def test_extractor_haar_tracking_matches_full_scan(monkeypatch):
    """HAAR_TRACK (default on): a moving face is followed via roi scans
    that agree with per-frame full scans, the roi fast path is actually
    exercised, and a discontinuous jump recovers via full-frame rescan."""
    _require_cascade()
    import deepfake_video_detection_tpu.data.haar as H
    from deepfake_video_detection_tpu.data.faces import FaceExtractor

    def scene(i, jump=False):
        ox = (210 if jump else 40 + 10 * i)
        img = scene_with_face(H=240, W=360, oy=20 + 4 * i, ox=ox, s=100)
        return np.stack([img] * 3, -1).astype(np.uint8)

    frames = np.stack([scene(i) for i in range(5)]
                      + [scene(5, jump=True)])     # last frame: track jump

    calls = {"roi": 0, "full": 0}
    orig = H.detect_faces

    def counting(frame, **kw):
        calls["roi" if kw.get("roi") is not None else "full"] += 1
        return orig(frame, **kw)

    monkeypatch.setattr(H, "detect_faces", counting)
    monkeypatch.setenv("HAAR_TRACK", "1")
    tracked = FaceExtractor(detector="haar", face_size=48)._detect_haar(frames)
    assert calls["roi"] >= 4          # frames 1..5 start on the roi path
    assert calls["full"] >= 2         # frame 0 + the jumped frame's rescan
    monkeypatch.setenv("HAAR_TRACK", "0")
    calls.update(roi=0, full=0)
    full = FaceExtractor(detector="haar", face_size=48)._detect_haar(frames)
    assert calls["roi"] == 0 and calls["full"] == len(frames)
    for t, f in zip(tracked, full):
        assert t is not None and f is not None
        assert _iou(t[0], f[0]) > 0.6


def test_group_rectangles_votes():
    base = np.array([100.0, 80.0, 60.0, 60.0])
    jitter = np.array([[dx, dy, 0, 0] for dx in (-2, 0, 2)
                       for dy in (-2, 0, 2)], float)
    cluster = base + jitter                       # 9 similar boxes
    outlier = np.array([[300.0, 10.0, 40.0, 40.0]])
    boxes, counts = group_rectangles(
        np.concatenate([cluster, outlier]), min_neighbors=3)
    assert len(boxes) == 1 and counts[0] == 9     # outlier voted out
    assert np.allclose(boxes[0][:2], base[:2], atol=1.0)
    # min_neighbors=1 keeps the outlier too
    boxes, counts = group_rectangles(
        np.concatenate([cluster, outlier]), min_neighbors=1)
    assert len(boxes) == 2


def test_rgb_to_gray_bt601():
    rgb = np.zeros((2, 2, 3), np.uint8)
    rgb[0, 0] = [255, 0, 0]
    rgb[0, 1] = [0, 255, 0]
    g = rgb_to_gray(rgb)
    assert abs(g[0, 0] - 76.245) < 0.01
    assert abs(g[0, 1] - 149.685) < 0.01


# ----------------------------------------------- FaceExtractor integration

def test_extractor_haar_crops_offcenter_face_center_miscrops():
    """The VERDICT r2 'done' criterion: with an off-center face, the haar
    detector crops the face while the center prior provably mis-crops."""
    _require_cascade()
    from deepfake_video_detection_tpu.data.faces import (
        FaceExtractor, center_square_boxes)

    img = scene_with_face(H=240, W=320, oy=20, ox=190, s=100)
    rgb = np.stack([img] * 3, -1).astype(np.uint8)
    frames = np.stack([rgb] * 3)
    true_box = [190, 20, 290, 120]

    ex = FaceExtractor(detector="haar", face_size=64)
    assert ex.detector == "haar"
    crops = ex.extract_from_frames(frames)
    assert crops.shape == (3, 64, 64, 3)
    # a correct crop centers the face: its middle is face interior (200,
    # minus the dark features), not the 120 background
    assert crops[:, 16:48, 16:48].mean() > 150

    # center prior: its box cannot overlap the true face much
    cb = center_square_boxes(1, 240, 320, 0.1)[0]
    assert _iou(cb, true_box) < 0.3
    center_crops = FaceExtractor(detector="center",
                                 face_size=64).extract_from_frames(frames)
    # mis-crop: the middle of the center crop is background
    assert center_crops[:, 16:48, 16:48].mean() < 130


def test_extractor_haar_keep_all_multiface():
    _require_cascade()
    from deepfake_video_detection_tpu.data.faces import FaceExtractor

    img = np.full((240, 420), 120.0)
    img[30:130, 20:120] = synth_face(100)
    img[40:140, 280:380] = synth_face(100)
    rgb = np.stack([img] * 3, -1).astype(np.uint8)

    ex1 = FaceExtractor(detector="haar", face_size=32, keep_all=False)
    assert ex1.extract_from_frames(rgb[None]).shape[0] == 1
    ex2 = FaceExtractor(detector="haar", face_size=32, keep_all=True)
    assert ex2.extract_from_frames(rgb[None]).shape[0] == 2


def test_extractor_chain_resolution(monkeypatch):
    from deepfake_video_detection_tpu.data import faces as F
    from deepfake_video_detection_tpu.data import haar as H

    _require_cascade()
    monkeypatch.delenv("FACE_DETECTOR", raising=False)
    monkeypatch.delenv("MTCNN_WEIGHTS", raising=False)
    # auto → haar when no mtcnn weights but a cascade exists
    assert F.FaceExtractor().detector == "haar"
    # mtcnn requested w/o weights → haar
    assert F.FaceExtractor(detector="mtcnn").detector == "haar"
    # no cascade anywhere → center
    monkeypatch.setenv("HAAR_CASCADE", "/nonexistent/cascade.xml")
    monkeypatch.setattr(H, "_DEFAULT", {})
    assert F.FaceExtractor().detector == "center"
    assert F.FaceExtractor(detector="haar").detector == "center"
    monkeypatch.delenv("HAAR_CASCADE", raising=False)
    monkeypatch.setattr(H, "_DEFAULT", {})
    # explicit center/none respected
    assert F.FaceExtractor(detector="center").detector == "center"
    assert F.FaceExtractor(detector="none").detector == "none"


def test_haar_no_detection_falls_back_to_center():
    _require_cascade()
    from deepfake_video_detection_tpu.data.faces import FaceExtractor

    frames = np.full((2, 120, 160, 3), 128, np.uint8)   # nothing to find
    ex = FaceExtractor(detector="haar", face_size=32)
    crops = ex.extract_from_frames(frames)
    assert crops.shape == (2, 32, 32, 3)                # center fallback


def test_prepare_cli_accepts_haar(tmp_path):
    """data/prepare.py drives the haar detector end-to-end on a real
    encoded clip (≙ src/data_prepare.py:240 using a learned detector)."""
    _require_cascade()
    from deepfake_video_detection_tpu.data.video import encode_video
    from deepfake_video_detection_tpu.data import prepare

    img = scene_with_face(H=240, W=320, oy=20, ox=190, s=100)
    rgb = np.stack([img] * 3, -1).astype(np.uint8)
    frames = np.stack([rgb] * 12)
    vdir = tmp_path / "videos"
    vdir.mkdir()
    encode_video(str(vdir / "fake_clip.avi"), frames, fps=12)
    out = tmp_path / "out"
    prepare.main(["--data_dir", str(vdir), "--out_dir", str(out),
                  "--detector", "haar", "--size", "64", "--max_frames", "4"])
    files = list(out.rglob("*.npz"))
    assert len(files) == 1
    data = np.load(files[0])
    assert data["faces"].shape[1:] == (64, 64, 3)
    assert data["faces"].mean() > 140     # the face crop, not background


def test_prepare_cli_haar_seek_fast_path_and_scan_fallback(tmp_path):
    """r4: raw-video haar prep defaults to the in-decoder seek-spread fast
    path (one GIL-free C++ call + device YUV→RGB); --no-seek-sampling
    restores the reference's every-Nth-frame scan. Both must produce
    on-face crops of the right shape."""
    _require_cascade()
    from deepfake_video_detection_tpu.data.video import encode_video
    from deepfake_video_detection_tpu.data import prepare

    img = scene_with_face(H=240, W=320, oy=20, ox=190, s=100)
    rgb = np.stack([img] * 3, -1).astype(np.uint8)
    frames = np.stack([rgb] * 16)
    vdir = tmp_path / "videos"
    vdir.mkdir()
    encode_video(str(vdir / "fake_clip.avi"), frames, fps=12)

    for extra, sub in ([], "fast"), (["--no-seek-sampling"], "scan"):
        out = tmp_path / f"out_{sub}"
        prepare.main(["--data_dir", str(vdir), "--out_dir", str(out),
                      "--detector", "haar", "--size", "64",
                      "--max_frames", "4"] + extra)
        files = list(out.rglob("*.npz"))
        assert len(files) == 1, sub
        faces = np.load(files[0])["faces"]
        assert faces.shape[1:] == (64, 64, 3), sub
        assert 1 <= faces.shape[0] <= 4, sub
        # crops sit ON the bright synthetic face, not the flat background
        assert float(faces.mean()) > 135, (sub, float(faces.mean()))
