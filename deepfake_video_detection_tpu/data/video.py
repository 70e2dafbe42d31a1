"""Video decode: ctypes bindings for the native C++ decoder.

Equivalent capability to ``sample_video_frames`` (``src/utils.py:19-93``),
which the reference implements over imageio/ffmpeg with a cv2 fallback. Here
the decoder is first-party native code (``native/videodec.cc`` on
libavformat/libavcodec/libswscale): decode every Nth frame up to
``max_frames``, swscale directly to the target size + RGB24 into a
caller-owned numpy buffer. ``VIDEO_BACKEND`` env is honoured for parity
(``native`` is the only in-tree backend; ``imageio``/``cv2`` are used if the
optional packages happen to be installed).

The shared library is compiled on first use (g++, ~2 s) and cached next to
the source; ``make -C native`` is the manual path. ctypes calls release the
GIL, so the loader's thread pool gets true parallel decode.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libvideodec.so")

_lib = None
_lib_lock = threading.Lock()


class VideoDecodeError(RuntimeError):
    pass


def _build_library() -> str:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    src = os.path.join(_NATIVE_DIR, "videodec.cc")
    haar_src = os.path.join(_NATIVE_DIR, "haar.cc")  # in-decoder face scan
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO_PATH,
           src, haar_src,
           "-lavformat", "-lavcodec", "-lavutil", "-lswscale"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, text=True)
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        detail = getattr(e, "stderr", str(e))
        raise VideoDecodeError(f"failed to build native video decoder: {detail}")
    return _SO_PATH


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        so = _SO_PATH
        srcs = [os.path.join(_NATIVE_DIR, "videodec.cc"),
                os.path.join(_NATIVE_DIR, "haar.cc")]
        if (not os.path.exists(so)
                or any(os.path.exists(s)
                       and os.path.getmtime(s) > os.path.getmtime(so)
                       for s in srcs)):
            _build_library()
        lib = ctypes.CDLL(so)
        lib.vd_probe.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64), ctypes.c_char_p, ctypes.c_int]
        lib.vd_probe.restype = ctypes.c_int
        lib.vd_sample.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_char_p, ctypes.c_int]
        lib.vd_sample.restype = ctypes.c_int
        lib.vd_sample_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_char_p, ctypes.c_int]
        lib.vd_sample_crop.restype = ctypes.c_int
        lib.vd_sample_seek_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_char_p, ctypes.c_int]
        lib.vd_sample_seek_crop.restype = ctypes.c_int
        lib.vd_sample_seek_crop_yuv.argtypes = lib.vd_sample_seek_crop.argtypes
        lib.vd_sample_seek_crop_yuv.restype = ctypes.c_int
        lib.vd_sample_seek_center.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_uint8), ctypes.c_char_p,
            ctypes.c_int]
        lib.vd_sample_seek_center.restype = ctypes.c_int
        lib.vd_sample_seek_center_yuv.argtypes = lib.vd_sample_seek_center.argtypes
        lib.vd_sample_seek_center_yuv.restype = ctypes.c_int
        lib.vd_sample_seek_faces_yuv.argtypes = [
            ctypes.c_char_p, ctypes.c_int,
            # cascade arrays (HaarCascade, data/haar.py)
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int,
            # max_side, min_neighbors, track, track_expand, acquire
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_double,
            ctypes.c_int,
            # face_size, margin_ppm
            ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_char_p, ctypes.c_int]
        lib.vd_sample_seek_faces_yuv.restype = ctypes.c_int
        lib.vd_encode.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8), ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_char_p,
            ctypes.c_int]
        lib.vd_encode.restype = ctypes.c_int
        _lib = lib
        return _lib


def probe_video(path: str) -> Tuple[int, int, float, int]:
    """(width, height, fps, container nframes — 0 when unrecorded)."""
    lib = _get_lib()
    w = ctypes.c_int()
    h = ctypes.c_int()
    fps = ctypes.c_double()
    n = ctypes.c_int64()
    err = ctypes.create_string_buffer(256)
    if lib.vd_probe(path.encode(), ctypes.byref(w), ctypes.byref(h),
                    ctypes.byref(fps), ctypes.byref(n), err, 256) != 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")
    return w.value, h.value, fps.value, int(n.value)


def sample_video_frames(
    path: str,
    sample_rate: Optional[int] = None,
    max_frames: int = 32,
    size: Optional[Tuple[int, int]] = None,
    keyframes_only: Optional[bool] = None,
) -> np.ndarray:
    """Decode every ``sample_rate``-th frame up to ``max_frames``.

    Returns (N, H, W, 3) uint8 RGB. ``size=(w, h)`` rescales during decode
    (swscale — cheaper than a separate resize pass); default keeps the
    native resolution. ``sample_rate=None`` honours ``VIDEO_SAMPLE_RATE``
    env (default 5, matching ``app.py:1918``).

    ``keyframes_only`` (env ``VIDEO_KEYFRAMES_ONLY``): decode only intra
    frames — 10-25× less decode work for sparse sampling; ``sample_rate``
    then counts keyframes.
    """
    if sample_rate is None:
        try:
            sample_rate = max(1, int(os.environ.get("VIDEO_SAMPLE_RATE", "5")))
        except ValueError:
            sample_rate = 5
    if keyframes_only is None:
        keyframes_only = os.environ.get("VIDEO_KEYFRAMES_ONLY", "").strip(
        ).lower() in ("1", "true", "yes")
    backend = os.environ.get("VIDEO_BACKEND", "native").strip().lower()
    if backend in ("imageio", "cv2"):
        frames = _optional_backend(backend, path, sample_rate, max_frames)
        if frames is not None:
            return frames
    lib = _get_lib()
    if size is None:
        w, h, _, _ = probe_video(path)
    else:
        w, h = size
    out = np.empty((max_frames, h, w, 3), np.uint8)
    err = ctypes.create_string_buffer(256)
    n = lib.vd_sample(path.encode(), int(sample_rate), int(max_frames),
                      int(w), int(h), 1 if keyframes_only else 0,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                      err, 256)
    if n < 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")
    return out[:n]


def _margin_ppm(margin: float) -> int:
    """Margin as parts-per-million of min(W,H) — the in-decoder crop's
    integer representation. round() (not truncation) so e.g. 0.07 → 70000
    exactly despite float representation error."""
    return int(round(margin * 1_000_000))


def center_crop_box(width: int, height: int, margin: float = 0.1):
    """Centered-square crop box via the SAME integer math as the in-decoder
    center crop (``native/videodec.cc:seek_sample_impl``), so the explicit
    probe-then-crop route and the one-open center route produce identical
    pixels for EVERY margin, not just values where the legacy float formula
    happens to agree. Returns ``(x0, y0, side)``; negative margins enlarge
    the square (callers/the decoder clamp to frame bounds)."""
    side = max(2, min(width, height) * (1_000_000 - _margin_ppm(margin))
               // 1_000_000)
    return (width - side) // 2, (height - side) // 2, side


def sample_video_faces_center(
    path: str,
    face_size: int = 224,
    sample_rate: int = 5,
    max_frames: int = 8,
    margin: float = 0.1,
    keyframes_only: bool = False,
) -> np.ndarray:
    """Decode + center-square-crop + resize entirely inside the C++ decoder
    (≙ the ``center`` face-prior path of ``data/faces.py`` with zero Python
    per-frame work). Returns (N, face_size, face_size, 3) uint8."""
    lib = _get_lib()
    w, h, _, _ = probe_video(path)
    x0, y0, side = center_crop_box(w, h, margin)
    out = np.empty((max_frames, face_size, face_size, 3), np.uint8)
    err = ctypes.create_string_buffer(256)
    n = lib.vd_sample_crop(path.encode(), int(sample_rate), int(max_frames),
                           x0, y0, side, side, face_size, face_size,
                           1 if keyframes_only else 0,
                           out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                           err, 256)
    if n < 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")
    return out[:n]


def sample_video_faces_spread(
    path: str,
    face_size: int = 224,
    n_frames: int = 8,
    margin: float = 0.1,
) -> np.ndarray:
    """Decode EXACTLY ``n_frames`` keyframes evenly spread over the clip,
    center-square-cropped + resized inside the C++ decoder (seek-based:
    one container seek + one intra-frame decode per sample — ~3× less
    decode work than scanning every keyframe, with full temporal coverage).
    Returns (N, face_size, face_size, 3) uint8."""
    lib = _get_lib()
    # center-square crop is computed INSIDE the decoder from the stream
    # dims (margin as ppm) — one container open per clip, no probe pass
    out = np.empty((n_frames, face_size, face_size, 3), np.uint8)
    err = ctypes.create_string_buffer(256)
    n = lib.vd_sample_seek_center(
        path.encode(), int(n_frames), _margin_ppm(margin), face_size,
        face_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err, 256)
    if n < 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")
    return out[:n]


def sample_video_faces_spread_yuv(
    path: str,
    face_size: int = 224,
    n_frames: int = 8,
    margin: float = 0.1,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Like :func:`sample_video_faces_spread` but returns PACKED planar
    YUV420 — (N, face_size*face_size*3//2) uint8, Y then U then V per frame,
    HALF the bytes of RGB. Convert on device with
    ``ops.yuv.yuv420_packed_to_rgb`` (the host→device link is the serving
    bottleneck; the colorspace matrix fuses into normalization on chip).

    ``out`` may supply a preallocated C-contiguous (n_frames, frame_bytes)
    uint8 buffer — e.g. one slot of a larger batch array — so decode workers
    write the batch in place and the caller skips the ``np.stack`` copy."""
    assert face_size % 2 == 0, "yuv420 needs an even face size"
    lib = _get_lib()
    frame_bytes = face_size * face_size * 3 // 2
    if out is None:
        out = np.empty((n_frames, frame_bytes), np.uint8)
    elif (out.dtype != np.uint8 or out.shape != (n_frames, frame_bytes)
          or not out.flags.c_contiguous):
        # a hard error, not an assert: the C decoder writes
        # n_frames*frame_bytes raw bytes through this pointer, so a wrong
        # buffer under `python -O` would be silent heap corruption
        raise ValueError(
            "out buffer must be C-contiguous uint8 of shape "
            f"{(n_frames, frame_bytes)}; got {out.dtype} {out.shape}")
    err = ctypes.create_string_buffer(256)
    n = lib.vd_sample_seek_center_yuv(
        path.encode(), int(n_frames), _margin_ppm(margin), face_size,
        face_size, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        err, 256)
    if n < 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")
    return out[:n]


def _cascade_ctypes_views(cascade):
    """Contiguous, correctly-typed views of a parsed HaarCascade's arrays,
    cached on the cascade instance (built once, reused per clip)."""
    views = getattr(cascade, "_native_views", None)
    if views is None:
        views = (
            np.ascontiguousarray(cascade.rects, np.int32),
            np.ascontiguousarray(cascade.weights, np.float64),
            np.ascontiguousarray(cascade.feat_idx, np.int32),
            np.ascontiguousarray(cascade.node_thr, np.float64),
            np.ascontiguousarray(cascade.leaves, np.float64),
            np.ascontiguousarray(cascade.stage_ends, np.int32),
            np.ascontiguousarray(cascade.stage_thr, np.float64),
        )
        cascade._native_views = views
    return views


def sample_video_faces_haar_yuv(
    path: str,
    cascade,
    face_size: int = 224,
    n_frames: int = 8,
    margin: float = 0.1,
    max_side: int = 320,
    min_neighbors: int = 4,
    track: bool = True,
    track_expand: float = 2.0,
    acquire: bool = True,
    out: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Seek-sample ``n_frames`` keyframes with REAL face detection, entirely
    inside the C++ decoder (``native/videodec.cc:vd_sample_seek_faces_yuv``):
    Viola-Jones largest-face on the decoder's luma plane at detection
    resolution (no full-res RGB conversion), temporal ROI tracking, crop
    from the native YUV planes. ≙ the reference's production detection path
    (``app.py:1988-2025``) at in-decoder cost. GIL-free for the whole call.

    ``acquire`` (default on) uses coarse-to-fine acquisition on non-tracked
    frames — a half-resolution full scan + full-res ROI refinement, ~3x
    cheaper on textured content; faces smaller than ~2 detection windows
    (~15 % of frame height at max_side=320) then rely on the full-res
    fallback scan that runs whenever the coarse pass finds nothing.

    Returns ``(packed, boxes, found)``: packed planar-YUV420 face crops
    (k, face_size²·3/2) uint8; the crop boxes (k, 4) float32 xyxy; and a
    (k,) bool mask — True where a face was detected (False frames carry the
    centered-square prior crop instead of being dropped, keeping batch
    slots dense; callers wanting the reference's drop-undetected semantics
    filter by ``found``).
    """
    assert face_size % 2 == 0, "yuv420 needs an even face size"
    if cascade.win_w != cascade.win_h:
        raise ValueError("native face pipeline assumes a square haar window")
    lib = _get_lib()
    frame_bytes = face_size * face_size * 3 // 2
    if out is None:
        out = np.empty((n_frames, frame_bytes), np.uint8)
    elif (out.dtype != np.uint8 or out.shape != (n_frames, frame_bytes)
          or not out.flags.c_contiguous):
        raise ValueError(
            "out buffer must be C-contiguous uint8 of shape "
            f"{(n_frames, frame_bytes)}; got {out.dtype} {out.shape}")
    (rects, weights, feat_idx, node_thr, leaves, stage_ends,
     stage_thr) = _cascade_ctypes_views(cascade)
    boxes = np.empty((n_frames, 4), np.float32)
    found = np.zeros((n_frames,), np.uint8)
    err = ctypes.create_string_buffer(256)

    def p(a, ct):
        return a.ctypes.data_as(ctypes.POINTER(ct))

    n = lib.vd_sample_seek_faces_yuv(
        path.encode(), int(n_frames),
        p(rects, ctypes.c_int32), p(weights, ctypes.c_double),
        p(feat_idx, ctypes.c_int32), p(node_thr, ctypes.c_double),
        p(leaves, ctypes.c_double), p(stage_ends, ctypes.c_int32),
        p(stage_thr, ctypes.c_double), int(cascade.n_stages),
        int(cascade.win_w), int(cascade.win_h),
        int(max_side), int(min_neighbors), 1 if track else 0,
        float(track_expand), 1 if acquire else 0,
        int(face_size), _margin_ppm(margin),
        p(out, ctypes.c_uint8), p(boxes, ctypes.c_float),
        p(found, ctypes.c_uint8), err, 256)
    if n < 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")
    # found codes: 0 none, 1 tracked-roi, 2 coarse-acquired, 3 full-scan
    return out[:n], boxes[:n], found[:n] > 0


def encode_video(path: str, frames: np.ndarray, fps: int = 25) -> None:
    """Write (N, H, W, 3) uint8 RGB frames as an mpeg4 video (test fixtures,
    GAN sample dumps)."""
    frames = np.ascontiguousarray(frames, np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    lib = _get_lib()
    err = ctypes.create_string_buffer(256)
    rc = lib.vd_encode(path.encode(),
                       frames.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                       n, w, h, fps, err, 256)
    if rc != 0:
        raise VideoDecodeError(f"{path}: {err.value.decode(errors='replace')}")


def _optional_backend(backend: str, path: str, sample_rate: int,
                      max_frames: int) -> Optional[np.ndarray]:
    """Parity shim for the reference's selectable backends; returns None when
    the optional package is missing (→ fall through to native)."""
    try:
        if backend == "imageio":
            import imageio.v2 as iio

            reader = iio.get_reader(path)
            frames = []
            for i, fr in enumerate(reader):
                if i % sample_rate == 0:
                    frames.append(np.asarray(fr)[..., :3])
                    if len(frames) >= max_frames:
                        break
            reader.close()
            return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
        if backend == "cv2":
            import cv2

            cap = cv2.VideoCapture(path)
            frames = []
            i = 0
            while cap.isOpened() and len(frames) < max_frames:
                ok, fr = cap.read()
                if not ok:
                    break
                if i % sample_rate == 0:
                    frames.append(cv2.cvtColor(fr, cv2.COLOR_BGR2RGB))
                i += 1
            cap.release()
            return np.stack(frames) if frames else np.zeros((0, 0, 0, 3), np.uint8)
    except ImportError:
        return None
    return None
