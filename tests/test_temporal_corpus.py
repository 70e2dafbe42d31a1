"""The temporal-necessity corpus (tools/make_temporal_corpus.py) must be
what it claims (VERDICT r4 item 4): per-frame statistics at chance — even
after the codec round trip — while consecutive-frame deltas separate; the
slow tier then proves the MODEL-level consequence end-to-end: the per-frame
flagship (B0) sits at chance where the CNN-LSTM temporal family separates,
the first regression that makes the long-clip machinery *necessary*."""

import csv
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from make_temporal_corpus import synth_clip  # noqa: E402

from deepfake_video_detection_tpu.evals.metrics import roc_auc  # noqa: E402

FRAMES, SIZE = 12, 64


def _make_set(n: int, seed: int = 0, size: int = 32):
    # probes run at 32 px (the marginal-matching property is resolution-
    # independent, and a 64-px ridge solve would be a 12k² system)
    rng = np.random.default_rng(seed)
    clips, y = [], []
    for i in range(n):
        fake = i % 2 == 1
        clips.append(synth_clip(rng, fake, frames=FRAMES, h=size, w=size))
        y.append(int(fake))
    return np.stack(clips).astype(np.float64), np.asarray(y, np.int64)


def test_order_invariant_probe_at_chance():
    """Ridge probe on order-invariantly POOLED pixels (what any per-frame
    detector with permutation-equivariant pooling effectively sees) ≈
    chance: fakes are permutations of the same per-frame process."""
    Xtr, ytr = _make_set(96, seed=0)
    Xte, yte = _make_set(48, seed=1)
    A = Xtr.mean(axis=1).reshape(len(Xtr), -1)      # pool over frames
    B = Xte.mean(axis=1).reshape(len(Xte), -1)
    mu, sd = A.mean(0), A.std(0) + 1e-6
    A = (A - mu) / sd
    B = (B - mu) / sd
    lam = 10.0
    t = ytr * 2.0 - 1.0
    w = np.linalg.solve(A.T @ A + lam * np.eye(A.shape[1]), A.T @ t)
    auc = roc_auc(yte, B @ w)
    assert max(auc, 1 - auc) < 0.70, f"pooled probe separates: {auc:.3f}"


def test_per_frame_moment_probes_at_chance():
    """Per-frame mean/std distributions carry no class signal (shuffle and
    flicker fakes are permutations — same frame multisets)."""
    X, y = _make_set(80, seed=2)
    means = X.mean(axis=(1, 2, 3, 4))
    stds = X.std(axis=(2, 3, 4)).mean(axis=1)
    for name, s in (("mean", means), ("std", stds)):
        auc = roc_auc(y, s)
        assert max(auc, 1 - auc) < 0.70, f"{name} separates: {auc:.3f}"


def test_consecutive_delta_probe_separates():
    """The temporal signal exists and is strong: mean |frame_t − frame_{t−1}|
    separates cleanly — the feature only an order-aware model can use."""
    X, y = _make_set(80, seed=3)
    deltas = np.abs(np.diff(X, axis=1)).mean(axis=(1, 2, 3, 4))
    auc = roc_auc(y, deltas)
    assert auc > 0.95, f"delta probe too weak: {auc:.3f}"


def test_delta_signal_survives_codec(tmp_path):
    """Temporal deltas must survive the mpeg4 encode → native seek decode
    round trip, and the per-frame moments must STAY at chance post-codec
    (temporal shuffling compresses worse — a bitrate-starved encode would
    leak class into per-frame compression noise; 2 Mbps at 64 px doesn't)."""
    from deepfake_video_detection_tpu.data.video import (
        encode_video, sample_video_frames)

    rng = np.random.default_rng(4)
    deltas, means, y = [], [], []
    for i in range(24):
        fake = i % 2 == 1
        clip = synth_clip(rng, fake, frames=FRAMES, h=SIZE, w=SIZE)
        p = str(tmp_path / f"{i}.avi")
        encode_video(p, clip, fps=12)
        dec = sample_video_frames(p, sample_rate=1,
                                  max_frames=FRAMES).astype(np.float64)
        assert dec.shape[0] == FRAMES
        deltas.append(np.abs(np.diff(dec, axis=0)).mean())
        means.append(dec.mean())
        y.append(int(fake))
    y = np.asarray(y)
    assert roc_auc(y, np.asarray(deltas)) > 0.95
    auc_m = roc_auc(y, np.asarray(means))
    assert max(auc_m, 1 - auc_m) < 0.75, f"codec leaked into means: {auc_m}"


@pytest.mark.slow
def test_perframe_flagship_at_chance_cnn_lstm_separates(tmp_path):
    """End-to-end model-level regression through the real pipeline
    (encode → prepare CLI → train CLI → evaluate CLI on held-out clips):
    the per-frame B0 flagship must sit at chance (< 0.7 — its pooling is
    permutation-equivariant and the marginals are matched) while the
    CNN-LSTM temporal family separates (>= 0.9)."""
    from deepfake_video_detection_tpu.data import prepare
    from deepfake_video_detection_tpu.data.video import encode_video
    from deepfake_video_detection_tpu.evals import evaluate
    from deepfake_video_detection_tpu.train import cli

    rng = np.random.default_rng(5)
    n_train, n_heldout = 64, 24
    vid_tr = tmp_path / "videos_train"
    vid_te = tmp_path / "videos_heldout"
    vid_tr.mkdir()
    vid_te.mkdir()
    for i in range(n_train + n_heldout):
        fake = i % 2 == 1
        d = vid_tr if i < n_train else vid_te
        clip = synth_clip(rng, fake, frames=FRAMES, h=SIZE, w=SIZE)
        encode_video(str(d / f"{'fake' if fake else 'real'}_{i:04d}.avi"),
                     clip, fps=12)

    faces_tr = str(tmp_path / "faces_train")
    faces_te = str(tmp_path / "faces_heldout")
    for src, dst in ((vid_tr, faces_tr), (vid_te, faces_te)):
        rc = prepare.main(["--data_dir", str(src), "--out_dir", dst,
                           "--detector", "none", "--size", str(SIZE),
                           "--max_frames", str(FRAMES), "--sample_rate", "1",
                           "--no-seek-sampling"])
        assert rc == 0

    def train_and_eval(model: str, epochs: int, tag: str) -> float:
        out_dir = str(tmp_path / f"ckpt_{tag}")
        rc = cli.main(["--data_dir", faces_tr, "--model", model,
                       "--out_dir", out_dir, "--epochs", str(epochs),
                       "--batch_size", "8", "--num_frames", str(FRAMES),
                       "--lr", "1e-3", "--no-augment"])
        assert rc == 0
        ckpt = os.path.join(out_dir, f"checkpoint_epoch_{epochs - 1}.npz")
        assert os.path.exists(ckpt)
        eval_csv = str(tmp_path / f"eval_{tag}.csv")
        rc = evaluate.main(["--data_dir", faces_te, "--checkpoint", ckpt,
                            "--model", model, "--num_frames", str(FRAMES),
                            "--out_csv", eval_csv])
        assert rc == 0
        with open(eval_csv) as f:
            rows = list(csv.DictReader(f))
        assert len(rows) == n_heldout
        labels = np.array([int(r["label"]) for r in rows])
        probs = np.array([float(r["prob_fake"]) for r in rows])
        return roc_auc(labels, probs)

    auc_b0 = train_and_eval("pretrained", epochs=2, tag="b0")
    assert max(auc_b0, 1 - auc_b0) < 0.70, \
        f"per-frame B0 should be at chance here, got AUC {auc_b0:.3f}"

    auc_lstm = train_and_eval("cnn_lstm", epochs=10, tag="lstm")
    assert auc_lstm >= 0.90, \
        f"CNN-LSTM failed to learn the temporal signal: AUC {auc_lstm:.3f}"
