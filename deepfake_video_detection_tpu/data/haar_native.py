"""ctypes bindings for the C++ Haar pyramid scan (``native/haar.cc``).

Same auto-build-on-first-use pattern as the video decoder
(``data/video.py``): compiled with g++ into ``native/build/libhaar.so`` the
first time it is needed, rebuilt when the source is newer. The scan
releases the GIL for its whole duration (pure C call), so per-frame
detection overlaps the TPU forward in the serving thread pool.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO_ROOT, "native")
_SO_PATH = os.path.join(_NATIVE_DIR, "build", "libhaar.so")

_lib = None
_lib_lock = threading.Lock()


def _build_library() -> str:
    os.makedirs(os.path.dirname(_SO_PATH), exist_ok=True)
    src = os.path.join(_NATIVE_DIR, "haar.cc")
    cmd = ["g++", "-O3", "-fPIC", "-shared", "-std=c++17", "-o", _SO_PATH,
           src]
    subprocess.run(cmd, check=True, capture_output=True, text=True)
    return _SO_PATH


def _get_lib():
    global _lib
    if _lib is not None:
        return _lib
    with _lib_lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_NATIVE_DIR, "haar.cc")
        if (not os.path.exists(_SO_PATH)
                or (os.path.exists(src)
                    and os.path.getmtime(src) > os.path.getmtime(_SO_PATH))):
            _build_library()
        lib = ctypes.CDLL(_SO_PATH)
        u8p = np.ctypeslib.ndpointer  # noqa: F841 (kept simple below)
        lib.haar_scan.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_double), ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_double, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int]
        lib.haar_scan.restype = ctypes.c_int
        lib.haar_prepare.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int]
        lib.haar_prepare.restype = None
        _lib = lib
        return _lib


def prepare_gray(rgb: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Fused BT.601 gray + bilinear downscale in C (GIL-free)."""
    lib = _get_lib()
    rgb = np.ascontiguousarray(rgb, np.uint8)
    H, W = rgb.shape[0], rgb.shape[1]
    out = np.empty((out_h, out_w), np.float32)
    lib.haar_prepare(_ptr(rgb, ctypes.c_uint8), H, W,
                     _ptr(out, ctypes.c_float), out_h, out_w)
    return out


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctypes.POINTER(ctype))


def detect_raw(cascade, gray: np.ndarray, scale_factor: float,
               min_size: int, max_size: Optional[int],
               max_out: int = 4096) -> np.ndarray:
    """Run the C++ pyramid scan; returns raw (n,4) xywh float64 windows
    (pre-grouping), matching ``HaarCascade._detect_raw_numpy``."""
    if cascade.win_w != cascade.win_h:
        raise RuntimeError("native haar scan assumes a square window")
    lib = _get_lib()
    gray = np.ascontiguousarray(gray, np.float32)
    H, W = gray.shape
    rects = np.ascontiguousarray(cascade.rects, np.int32)
    weights = np.ascontiguousarray(cascade.weights, np.float64)
    feat_idx = np.ascontiguousarray(cascade.feat_idx, np.int32)
    node_thr = np.ascontiguousarray(cascade.node_thr, np.float64)
    leaves = np.ascontiguousarray(cascade.leaves, np.float64)
    stage_ends = np.ascontiguousarray(cascade.stage_ends, np.int32)
    stage_thr = np.ascontiguousarray(cascade.stage_thr, np.float64)
    while True:
        out = np.empty((max_out, 3), np.float32)
        n = lib.haar_scan(
            _ptr(gray, ctypes.c_float), H, W,
            _ptr(rects, ctypes.c_int32), _ptr(weights, ctypes.c_double),
            _ptr(feat_idx, ctypes.c_int32), _ptr(node_thr, ctypes.c_double),
            _ptr(leaves, ctypes.c_double), _ptr(stage_ends, ctypes.c_int32),
            _ptr(stage_thr, ctypes.c_double), cascade.n_stages,
            cascade.win_w, cascade.win_h, float(scale_factor), int(min_size),
            int(max_size or 0), _ptr(out, ctypes.c_float), max_out)
        if n < 0:
            raise RuntimeError("haar_scan failed")
        if n <= max_out:
            break
        # the scan found more windows than the buffer holds (returns the
        # TRUE count): retry with room for all so no detection is dropped
        # and the numpy-engine equivalence holds on dense frames
        max_out = n
    xys = out[:n].astype(np.float64)
    return np.stack([xys[:, 0], xys[:, 1], xys[:, 2], xys[:, 2]],
                    1) if n else np.zeros((0, 4))
