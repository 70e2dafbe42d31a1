"""Train directly from raw videos — no ``.npz`` prep stage.

The reference's training pipeline REQUIRES a separate preparation pass
(``src/data_prepare.py`` → per-video ``.npz`` → ``src/dataset.py``). With a
first-party C++ decoder doing seek-based keyframe sampling + in-decoder
crop/resize (``native/videodec.cc``), decoding a clip costs single-digit
milliseconds — cheap enough to do *inside the training loader*:

* ``VideoClipsDataset`` presents the exact ``VideoFacesDataset`` interface
  (``(faces (T,H,W,3) uint8, label, path)``, ``labels()``, ``files``) over a
  directory of video files, so every trainer, CLI, splitter and the weighted
  sampler work unchanged;
* decode happens in the ``Loader``'s worker threads (the decoder releases
  the GIL), overlapping device compute exactly like npz decompression;
* labels resolve without decoding (CSV via ``load_labels_csv`` or path
  tokens via ``resolve_label`` — the prep CLI's own rules), so
  ``labels()`` / class weights stay O(1) per sample;
* a decode failure yields a zeroed clip (and a one-line warning) instead of
  killing the epoch — same containment policy as the prep CLI
  (tests/test_faults.py).

This collapses the prepare→train pipeline to one stage when disk for face
stacks is scarce or the corpus changes often; ``data/prepare.py`` remains
the better choice when many epochs re-read the same faces (decode once) or
when a learned face detector (MTCNN) should run offline.
"""

from __future__ import annotations

import glob as _glob
import os
import sys
from typing import Dict, List, Optional

import numpy as np

from deepfake_video_detection_tpu.data.dataset import pad_or_sample_frames
from deepfake_video_detection_tpu.data.faces import FaceExtractor
from deepfake_video_detection_tpu.data.prepare import (load_labels_csv,
                                                       resolve_label)

VIDEO_EXTS = (".mp4", ".avi", ".mov", ".mkv", ".webm", ".mpg", ".mpeg",
              ".m4v", ".wmv")


class VideoClipsDataset:
    """``VideoFacesDataset``-compatible view over a directory of raw videos."""

    def __init__(
        self,
        data_dir: str,
        num_frames: int = 16,
        face_size: int = 224,
        detector: str = "center",
        labels_csv: Optional[str] = None,
        recursive: bool = False,
        max_samples: Optional[int] = None,
        cache_clips: bool = False,
    ):
        pattern = os.path.join(data_dir, "**", "*") if recursive \
            else os.path.join(data_dir, "*")
        labels = load_labels_csv(labels_csv) if labels_csv else None
        self.files: List[str] = []
        self._labels: Dict[int, int] = {}
        for path in sorted(_glob.glob(pattern, recursive=recursive)):
            if not path.lower().endswith(VIDEO_EXTS):
                continue
            label = resolve_label(path, labels)
            if label is None:  # unlabeled clips are skipped, like the prep CLI
                continue
            self._labels[len(self.files)] = int(label)
            self.files.append(path)
        if max_samples is not None:
            self.files = self.files[:max_samples]
            self._labels = {i: self._labels[i] for i in range(len(self.files))}
        if not self.files:
            raise FileNotFoundError(f"no labeled video files under {data_dir}")
        self.num_frames = num_frames
        self.extractor = FaceExtractor(detector=detector, face_size=face_size)
        self._warned = False
        # optional in-memory cache: decode each clip once, reuse across
        # epochs (~T*face_size^2*3 bytes/clip; the caller sizes the corpus)
        self._cache: Optional[Dict[int, np.ndarray]] = {} if cache_clips else None

    def __len__(self) -> int:
        return len(self.files)

    def label(self, i: int) -> int:
        return self._labels[i]

    def labels(self) -> np.ndarray:
        return np.asarray([self._labels[i] for i in range(len(self.files))],
                          np.int64)

    def split(self, val_fraction: float = 0.2, seed: int = 42):
        """Deterministic random split, same semantics as
        ``VideoFacesDataset.split``."""
        from deepfake_video_detection_tpu.data.dataset import random_split

        return random_split(self, val_fraction, seed)

    def __getitem__(self, i: int):
        path = self.files[i]
        if self._cache is not None and i in self._cache:
            return self._cache[i], self._labels[i], path
        size = self.extractor.face_size
        failed = False
        try:
            faces = self.extractor.extract_from_video(
                path, max_frames=self.num_frames)
        except Exception as e:
            # one bad clip must not abort an epoch; zero frames contribute a
            # near-constant gradient for one sample and are visible in logs
            if not self._warned:
                print(f"[video_dataset] decode failed for {path}: {e} "
                      f"(zero-filling; further failures suppressed)",
                      file=sys.stderr)
                self._warned = True
            faces = np.zeros((0, size, size, 3), np.uint8)
            failed = True
        if faces.shape[0] == 0:
            faces = np.zeros((1, size, size, 3), np.uint8)
        faces = pad_or_sample_frames(faces.astype(np.uint8), self.num_frames)
        if self._cache is not None and not failed:
            # never cache a transient failure's zero-fill — the clip gets
            # retried next epoch
            self._cache[i] = faces
        return faces, self._labels[i], path
