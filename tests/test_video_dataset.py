"""Direct-from-video training (data/video_dataset.py): the prep-free path
must present the VideoFacesDataset interface over raw clips, resolve labels
without decoding, survive corrupt files, and train end-to-end through the
basic CLI on the 8-device mesh."""

from __future__ import annotations

import os

import numpy as np
import pytest

from deepfake_video_detection_tpu.data.video import encode_video
from deepfake_video_detection_tpu.data.video_dataset import VideoClipsDataset


@pytest.fixture(scope="module")
def video_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("rawclips")
    rng = np.random.default_rng(0)
    for i in range(8):
        label = i % 2
        base = 190 if label else 50
        frames = rng.integers(base - 30, base + 30,
                              (12, 64, 96, 3)).astype(np.uint8)
        encode_video(str(d / f"clip{i}_{'fake' if label else 'real'}.avi"),
                     frames, fps=10)
    (d / "notes.txt").write_text("not a video")
    (d / "unlabeled.avi").write_bytes(b"")  # no label token → skipped
    return str(d)


def test_video_clips_dataset_interface(video_dir):
    ds = VideoClipsDataset(video_dir, num_frames=4, face_size=32)
    assert len(ds) == 8  # txt + unlabeled skipped
    labels = ds.labels()
    assert labels.sum() == 4
    faces, lab, path = ds[0]
    assert faces.shape == (4, 32, 32, 3) and faces.dtype == np.uint8
    assert lab == ds.label(0)
    assert ("fake" in os.path.basename(path)) == (lab == 1)
    # labels() never decodes: timing-free sanity — label of a video whose
    # decode would fail is still resolvable
    tr, va = ds.split(0.25)
    assert len(tr) + len(va) == 8 and len(va) == 2


def test_video_clips_dataset_labels_csv(video_dir, tmp_path):
    csvp = tmp_path / "labels.csv"
    rows = ["filename,label"]
    for i in range(8):
        rows.append(f"clip{i}_{'fake' if i % 2 else 'real'},"
                    f"{'fake' if i < 4 else 'real'}")
    csvp.write_text("\n".join(rows))
    ds = VideoClipsDataset(video_dir, num_frames=2, face_size=16,
                           labels_csv=str(csvp))
    assert ds.labels().sum() == 4
    assert ds.label(0) == 1  # CSV overrides the path token


def test_video_clips_dataset_decode_failure_contained(video_dir, tmp_path):
    import shutil

    d = tmp_path / "mix"
    d.mkdir()
    for f in os.listdir(video_dir):
        if f.endswith(".avi") and "unlabeled" not in f:
            shutil.copy(os.path.join(video_dir, f), d / f)
    (d / "broken_fake.avi").write_bytes(os.urandom(2048))
    ds = VideoClipsDataset(str(d), num_frames=4, face_size=32)
    i = ds.files.index(str(d / "broken_fake.avi"))
    faces, lab, _ = ds[i]
    assert faces.shape == (4, 32, 32, 3) and lab == 1
    assert not faces.any()  # zero-filled, not crashed


def test_train_cli_from_videos(video_dir, tmp_path):
    from deepfake_video_detection_tpu.train.cli import main

    out = tmp_path / "ckpt"
    rc = main(["--data_dir", video_dir, "--from-videos", "--model",
               "cnn_lstm", "--epochs", "2", "--batch_size", "4",
               "--num_frames", "4", "--face_size", "32", "--no-augment",
               "--out_dir", str(out)])
    assert rc in (0, None)
    assert (out / "checkpoint_best.npz").exists()
    import csv

    with open(out / "training_history.csv") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 2
    assert all(np.isfinite(float(r["train_loss"])) for r in rows)

    # the evaluator consumes raw clips too (--from-videos)
    from deepfake_video_detection_tpu.evals.evaluate import main as eval_main

    out_csv = tmp_path / "eval.csv"
    rc = eval_main(["--data_dir", video_dir, "--from-videos",
                    "--checkpoint", str(out / "checkpoint_best.npz"),
                    "--num_frames", "4", "--face_size", "32",
                    "--batch_size", "4", "--out_csv", str(out_csv)])
    assert rc in (0, None)
    with open(out_csv) as f:
        erows = list(csv.DictReader(f))
    assert len(erows) == 8 and all(r["path"].endswith(".avi") for r in erows)
