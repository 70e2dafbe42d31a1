"""Dataset preparation CLI (≙ ``src/data_prepare.py:215-393``).

Scans an archive or directory and writes one ``.npz{faces, label}`` per
video. Handles the reference's three input layouts:

1. raw videos (decode → face-extract per video, ``:261-285``);
2. DFDC-style flat frame folders ``<vid>_<frame>_<idx>.png`` grouped by video
   id (``:301-357``);
3. per-video frame folders (one directory per sample, ``:359-391``).

Labels resolve from a CSV (``load_labels_csv``, ``:166``) or path tokens
(``infer_label_from_path``, ``:62``). Flags mirror the reference:
``--sample_rate --max_frames --size --max_videos --max_files
--frames-are-faces --labels_csv``.

Videos decode through the native C++ decoder; face detection/crop runs
batched on device (``data/faces.py``). Multiple videos are processed by a
thread pool — decode releases the GIL, so prep saturates host cores.
"""

from __future__ import annotations

import argparse
import concurrent.futures as _fut
import csv
import os
import re
import tarfile
import zipfile
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np

from deepfake_video_detection_tpu.data.dataset import infer_label
from deepfake_video_detection_tpu.data.faces import FaceExtractor
from deepfake_video_detection_tpu.data.video import sample_video_frames

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".m4v")
IMAGE_EXTS = (".png", ".jpg", ".jpeg", ".bmp")

_FLAT_RE = re.compile(r"^(?P<vid>.+?)_(?P<frame>\d+)_(?P<idx>\d+)\.(png|jpg|jpeg)$",
                      re.IGNORECASE)


def load_labels_csv(path: str) -> Dict[str, int]:
    """CSV with (filename, label) columns; label tokens fake/real or 0/1
    (≙ ``load_labels_csv``, ``src/data_prepare.py:166``)."""
    labels: Dict[str, int] = {}
    with open(path, newline="") as f:
        reader = csv.reader(f)
        header = next(reader, None)
        rows = [header] if header and not _looks_like_header(header) else []
        rows += list(reader)
    for row in rows:
        if not row or len(row) < 2:
            continue
        name = os.path.splitext(os.path.basename(row[0].strip()))[0]
        tok = row[1].strip().lower()
        if tok in ("fake", "1", "df"):
            labels[name] = 1
        elif tok in ("real", "0", "original"):
            labels[name] = 0
    return labels


def _looks_like_header(row: List[str]) -> bool:
    joined = ",".join(row).lower()
    return "label" in joined or "filename" in joined or "video" in joined


def resolve_label(path: str, labels: Optional[Dict[str, int]]) -> Optional[int]:
    """CSV first, then path-token inference (≙ ``resolve_label``, ``:191``)."""
    stem = os.path.splitext(os.path.basename(path))[0]
    if labels:
        if stem in labels:
            return labels[stem]
        base = stem.split("_")[0]
        if base in labels:
            return labels[base]
    return infer_label(path)


def parse_flat_frames_key(name: str) -> Optional[Tuple[str, int, int]]:
    """``<vid>_<frame>_<idx>.png`` → (vid, frame, idx) (≙ ``:116``)."""
    m = _FLAT_RE.match(name)
    if not m:
        return None
    return m.group("vid"), int(m.group("frame")), int(m.group("idx"))


def is_flat_frames_layout(files: List[str], threshold: float = 0.8) -> bool:
    """≙ ``_is_flat_frames_layout`` (``:138``)."""
    imgs = [f for f in files if f.lower().endswith(IMAGE_EXTS)]
    if not imgs:
        return False
    hits = sum(1 for f in imgs if parse_flat_frames_key(os.path.basename(f)))
    return hits / len(imgs) >= threshold


def extract_archive(path: str, out_dir: str) -> str:
    os.makedirs(out_dir, exist_ok=True)
    if zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as z:
            z.extractall(out_dir)
    elif tarfile.is_tarfile(path):
        with tarfile.open(path) as t:
            t.extractall(out_dir)
    else:
        raise ValueError(f"unsupported archive: {path}")
    return out_dir


def _load_image(path: str) -> Optional[np.ndarray]:
    try:
        from PIL import Image

        with Image.open(path) as im:
            return np.asarray(im.convert("RGB"), np.uint8)
    except Exception:
        return None


def _save_npz(out_dir: str, name: str, faces: np.ndarray, label: int) -> str:
    out = os.path.join(out_dir, f"{name}.npz")
    np.savez_compressed(out, faces=faces.astype(np.uint8),
                        label=np.int64(label))
    return out


def _packed_yuv_to_rgb_u8(packed: np.ndarray, size: int) -> np.ndarray:
    """(N, size²·3/2) packed YUV420 → (N, size, size, 3) uint8 RGB on the
    HOST (same BT.601 limited-range matrix as ``ops/yuv.py``). Prep is an
    offline batch job writing uint8 npz files — a device round-trip would
    just drag the pixels across the TPU link twice (measured 249 vs
    ~60 ms/clip through the relay); serving keeps the on-device converter
    where the pixels are headed to the chip anyway."""
    hw, qw = size * size, (size // 2) * (size // 2)
    y = packed[:, :hw].reshape(-1, size, size).astype(np.float32)
    u = packed[:, hw:hw + qw].reshape(-1, size // 2, size // 2)
    v = packed[:, hw + qw:].reshape(-1, size // 2, size // 2)
    u = np.repeat(np.repeat(u, 2, axis=1), 2, axis=2).astype(np.float32) - 128.0
    v = np.repeat(np.repeat(v, 2, axis=1), 2, axis=2).astype(np.float32) - 128.0
    c = 1.164383 * (y - 16.0)  # same BT.601 constants as ops/yuv.py
    rgb = np.stack([c + 1.596027 * v,
                    c - 0.391762 * u - 0.812968 * v,
                    c + 2.017232 * u], axis=-1)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def prepare_video(path: str, out_dir: str, extractor: FaceExtractor,
                  labels: Optional[Dict[str, int]], sample_rate: int,
                  max_frames: int, seek_sampling: bool = True) -> Optional[str]:
    label = resolve_label(path, labels)
    if label is None:
        return None
    if extractor.detector == "haar" and seek_sampling and not extractor.keep_all:
        # fast path (r4): seek-decode + luma-plane detection + face crop in
        # ONE GIL-free C++ call (data/faces.py extract_from_video_yuv), RGB
        # conversion on device — ~10-20x the decode-everything RGB route.
        # Sampling semantics: exactly max_frames keyframes evenly SPREAD
        # over the whole clip (the serving sampler), not every
        # sample_rate-th of the first frames — whole-clip coverage is the
        # better training distribution; --no-seek-sampling restores the
        # reference's scan semantics (src/data_prepare.py:261-285).
        packed = extractor.extract_from_video_yuv(path, max_frames=max_frames)
        if packed.shape[0] == 0:
            return None
        faces = _packed_yuv_to_rgb_u8(packed, extractor.face_size)
    else:
        frames = sample_video_frames(path, sample_rate=sample_rate,
                                     max_frames=max_frames)
        faces = extractor.extract_from_frames(frames)
    if faces.shape[0] == 0:
        return None
    stem = os.path.splitext(os.path.basename(path))[0]
    return _save_npz(out_dir, f"{stem}_{'fake' if label else 'real'}",
                     faces, label)


def prepare_frames_group(name: str, image_paths: List[str], out_dir: str,
                         extractor: Optional[FaceExtractor],
                         labels: Optional[Dict[str, int]],
                         max_frames: int, label_hint_path: str) -> Optional[str]:
    label = resolve_label(label_hint_path, labels)
    if label is None:
        label = resolve_label(name, labels)
    if label is None:
        return None
    imgs = []
    for p in sorted(image_paths)[:max_frames]:
        arr = _load_image(p)
        if arr is not None:
            imgs.append(arr)
    if not imgs:
        return None
    shape0 = imgs[0].shape
    imgs = [im for im in imgs if im.shape == shape0]
    frames = np.stack(imgs)
    if extractor is not None:
        faces = extractor.extract_from_frames(frames)
    else:  # --frames-are-faces: resize only
        from deepfake_video_detection_tpu.data.faces import crop_and_resize_batch
        n, H, W = frames.shape[0], frames.shape[1], frames.shape[2]
        boxes = np.tile(np.array([0, 0, W, H], np.float32), (n, 1))
        faces = crop_and_resize_batch(frames, boxes, 224)
    if faces.shape[0] == 0:
        return None
    return _save_npz(out_dir, f"{name}_{'fake' if label else 'real'}",
                     faces, label)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Prepare .npz face stacks from videos/frames")
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--archive", help="zip/tar of videos or frames")
    src.add_argument("--data_dir", help="directory of videos or frames")
    ap.add_argument("--out_dir", default="data/faces")
    ap.add_argument("--sample_rate", type=int, default=5)
    ap.add_argument("--max_frames", type=int, default=32)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--max_videos", type=int, default=None)
    ap.add_argument("--max_files", type=int, default=None)
    ap.add_argument("--frames-are-faces", dest="frames_are_faces",
                    action="store_true")
    ap.add_argument("--labels_csv", default=None)
    ap.add_argument("--detector", default=None,
                    help="auto|mtcnn|haar|center|none (default: auto — "
                         "mtcnn if MTCNN_WEIGHTS else haar else center)")
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 4)
    ap.add_argument("--batch-clips", dest="batch_clips", type=int, default=16,
                    help="clips per device dispatch for --detector mtcnn "
                         "(the cascade runs once over all their frames)")
    ap.add_argument("--no-seek-sampling", dest="seek_sampling",
                    action="store_false",
                    help="haar raw-video prep: scan every sample_rate-th "
                         "frame (reference semantics) instead of the "
                         "default in-decoder seek-spread fast path")
    args = ap.parse_args(argv)

    root = args.data_dir
    if args.archive:
        root = extract_archive(args.archive,
                               os.path.join(args.out_dir, "_extracted"))
    os.makedirs(args.out_dir, exist_ok=True)
    labels = load_labels_csv(args.labels_csv) if args.labels_csv else None
    extractor = None if args.frames_are_faces else FaceExtractor(
        detector=args.detector, face_size=args.size)

    all_files: List[str] = []
    for dirpath, _, files in os.walk(root):
        for f in files:
            all_files.append(os.path.join(dirpath, f))
    if args.max_files:
        all_files = all_files[: args.max_files]

    videos = [f for f in all_files if f.lower().endswith(VIDEO_EXTS)]
    images = [f for f in all_files if f.lower().endswith(IMAGE_EXTS)]
    written: List[str] = []

    if videos:  # layout 1: raw videos
        if args.max_videos:
            videos = videos[: args.max_videos]
        ext = extractor or FaceExtractor(detector="none", face_size=args.size)
        if ext.detector == "mtcnn":
            # batched mtcnn flow (r5): decode a batch of clips on the
            # thread pool, run the cascade ONCE over all their frames
            # (extract_from_frames_batch — one device dispatch per batch
            # instead of per clip; dispatch through the TPU relay costs
            # ~30 ms and starved the per-clip path), then save per clip.
            bs = max(1, args.batch_clips)
            with _fut.ThreadPoolExecutor(args.workers) as pool:
                for start in range(0, len(videos), bs):
                    chunk = videos[start:start + bs]
                    futs = [(v, pool.submit(sample_video_frames, v,
                                            args.sample_rate,
                                            args.max_frames))
                            for v in chunk if resolve_label(v, labels)
                            is not None]
                    decoded = []
                    for v, f in futs:
                        try:
                            decoded.append((v, f.result()))
                        except Exception as e:
                            print(f"[prepare] skipping {v}: {e}")
                    if not decoded:
                        continue
                    faces_list = ext.extract_from_frames_batch(
                        [fr for _, fr in decoded])
                    for (v, _), faces in zip(decoded, faces_list):
                        if faces.shape[0] == 0:
                            continue
                        label = resolve_label(v, labels)
                        stem = os.path.splitext(os.path.basename(v))[0]
                        written.append(_save_npz(
                            args.out_dir,
                            f"{stem}_{'fake' if label else 'real'}",
                            faces, label))
        else:
            with _fut.ThreadPoolExecutor(args.workers) as pool:
                futs = [(v, pool.submit(prepare_video, v, args.out_dir, ext,
                                        labels, args.sample_rate,
                                        args.max_frames, args.seek_sampling))
                        for v in videos]
                for v, f in futs:
                    # a corrupt/undecodable clip must not abort a whole prep
                    # run (DFDC-scale corpora always contain a few)
                    try:
                        out = f.result()
                    except Exception as e:
                        print(f"[prepare] skipping {v}: {e}")
                        continue
                    if out:
                        written.append(out)
    elif is_flat_frames_layout([os.path.basename(f) for f in images]):
        # layout 2: DFDC flat frames — group by video id, bounded buffers
        groups: Dict[str, List[str]] = defaultdict(list)
        for p in images:
            parsed = parse_flat_frames_key(os.path.basename(p))
            if parsed:
                groups[parsed[0]].append(p)
        items = sorted(groups.items())
        if args.max_videos:
            items = items[: args.max_videos]
        for name, paths in items:
            out = prepare_frames_group(name, paths, args.out_dir, extractor,
                                       labels, args.max_frames, paths[0])
            if out:
                written.append(out)
    else:
        # layout 3: per-video frame folders
        folders: Dict[str, List[str]] = defaultdict(list)
        for p in images:
            folders[os.path.dirname(p)].append(p)
        items = sorted(folders.items())
        if args.max_videos:
            items = items[: args.max_videos]
        for folder, paths in items:
            name = os.path.basename(folder.rstrip(os.sep)) or "sample"
            out = prepare_frames_group(name, paths, args.out_dir, extractor,
                                       labels, args.max_frames, folder)
            if out:
                written.append(out)

    print(f"wrote {len(written)} samples to {args.out_dir}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
