"""Evaluation CLI end-to-end on CPU: train-free checkpoint → metrics + CSV."""

import csv
import os

import numpy as np
import pytest

import jax

from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint
from deepfake_video_detection_tpu.evals.evaluate import (
    build_model_from_checkpoint, infer_logic_rnn_dims,
    infer_vit_variant_from_state_dict, main)
from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid


@pytest.fixture(scope="module")
def eval_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("evalcli")
    rng = np.random.default_rng(0)
    for i in range(8):
        label = i % 2
        base = 180 if label else 60
        faces = rng.integers(base - 20, base + 20,
                             size=(5, 32, 32, 3)).astype(np.uint8)
        np.savez_compressed(root / f"v{i}_{'fake' if label else 'real'}.npz",
                            faces=faces, label=np.int64(label))
    model = CNNLSTMHybrid()
    ckpt = root / "checkpoint_best.npz"
    save_checkpoint(str(ckpt), model.init(jax.random.PRNGKey(0)),
                    meta={"model_config": {"model_type": "cnn_lstm"}})
    return str(root), str(ckpt)


def test_evaluate_cli_end_to_end(eval_setup, capsys):
    data_dir, ckpt = eval_setup
    out_csv = os.path.join(data_dir, "evaluation_summary.csv")
    rc = main(["--data_dir", data_dir, "--checkpoint", ckpt,
               "--num_frames", "4", "--batch_size", "4", "--sweep",
               "--out_csv", out_csv])
    assert rc == 0
    text = capsys.readouterr().out
    assert "model=cnn_lstm" in text and "sweep:" in text
    with open(out_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8
    assert {"path", "label", "prob_fake", "pred"} <= set(rows[0])


def test_evaluate_cli_bf16(eval_setup):
    """--bf16 runs the same checkpoint with bfloat16 activations and still
    produces a full, finite per-file CSV (params stay f32)."""
    data_dir, ckpt = eval_setup
    out_csv = os.path.join(data_dir, "evaluation_summary_bf16.csv")
    rc = main(["--data_dir", data_dir, "--checkpoint", ckpt,
               "--num_frames", "4", "--batch_size", "4", "--bf16",
               "--out_csv", out_csv])
    assert rc == 0
    with open(out_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 8
    assert all(np.isfinite(float(r["prob_fake"])) for r in rows)


def test_arch_inference_helpers():
    assert infer_vit_variant_from_state_dict(
        {"vit.cls_token": np.zeros((1, 1, 384))}) == "vit_small_patch16_224"
    sd = {"logic_cells.0.and_gate.weight": np.zeros((64, 96)),
          "logic_cells.1.and_gate.weight": np.zeros((64, 128))}
    assert infer_logic_rnn_dims(sd) == (32, 64, 2)
    # unknown dicts fall back to the pretrained detector family
    model, _, report, mt = build_model_from_checkpoint(
        {"backbone.conv_stem.weight": np.zeros((32, 3, 3, 3))}, {}, "")
    assert mt == "pretrained"


def test_evaluate_cli_quantize_int8(eval_setup):
    """--quantize int8: evaluates the int8-weight model (the exact numerics
    QUANTIZE=int8 would serve) and the per-file scores track the f32 run."""
    data_dir, ckpt = eval_setup
    base_csv = os.path.join(data_dir, "evaluation_summary.csv")
    if not os.path.exists(base_csv):
        assert main(["--data_dir", data_dir, "--checkpoint", ckpt,
                     "--num_frames", "4", "--batch_size", "4",
                     "--out_csv", base_csv]) == 0
    out_csv = os.path.join(data_dir, "evaluation_summary_int8.csv")
    rc = main(["--data_dir", data_dir, "--checkpoint", ckpt,
               "--num_frames", "4", "--batch_size", "4",
               "--quantize", "int8", "--out_csv", out_csv])
    assert rc == 0
    with open(base_csv, newline="") as f:
        ref = {r["path"]: float(r["prob_fake"]) for r in csv.DictReader(f)}
    with open(out_csv, newline="") as f:
        got = {r["path"]: float(r["prob_fake"]) for r in csv.DictReader(f)}
    assert set(got) == set(ref) and len(got) == 8
    assert max(abs(got[p] - ref[p]) for p in ref) < 0.05
