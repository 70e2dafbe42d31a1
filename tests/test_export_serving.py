"""AOT StableHLO export of the serving forward (tools/export_serving.py).

The artifact must round-trip through jax.export serialize/deserialize and
reproduce the live forward bit-for-bit-close — including the symbolic-batch
and quantized variants."""

import json
import os
import sys

import numpy as np
import pytest

import jax

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

import export_serving  # noqa: E402

from deepfake_video_detection_tpu.checkpoint.store import save_checkpoint
from deepfake_video_detection_tpu.models.backbone_detector import (
    BackboneDetector)


@pytest.fixture(scope="module")
def small_ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("export")
    model = BackboneDetector("resnet18")
    v = model.init(jax.random.PRNGKey(0))
    path = str(d / "checkpoint_best.npz")
    save_checkpoint(path, v, meta={"model_config": {
        "model_type": "pretrained", "backbone": "resnet18"}})
    return path


def _run(args, capsys):
    rc = export_serving.main(args)
    assert rc == 0
    lines = [json.loads(line) for line in
             capsys.readouterr().out.strip().splitlines()]
    return lines


def test_export_static_and_check(small_ckpt, tmp_path, capsys):
    out = str(tmp_path / "serve.shlo")
    summary, check = _run(["--checkpoint", small_ckpt, "--out", out,
                           "--batch", "2", "--frames", "2",
                           "--face-size", "64", "--check"], capsys)
    assert os.path.getsize(out) == summary["bytes"] > 1000
    assert summary["input"] == "uint8('2', '2', '64', '64', '3')"
    assert check["check"] == "ok"


def test_export_symbolic_batch_serves_any_batch(small_ckpt, tmp_path, capsys):
    out = str(tmp_path / "serve_poly.shlo")
    (summary,) = _run(["--checkpoint", small_ckpt, "--out", out,
                       "--frames", "2", "--face-size", "64",
                       "--symbolic-batch"], capsys)
    assert summary["input"][:5] == "uint8" and "'b'" in summary["input"]
    rt = jax.export.deserialize(bytearray(open(out, "rb").read()))
    for b in (1, 3):
        x = np.random.default_rng(b).integers(0, 255, (b, 2, 64, 64, 3),
                                              np.uint8)
        got = rt.call(x)
        assert got["probs"].shape == (b, 2)
        np.testing.assert_allclose(np.asarray(got["probs"]).sum(-1),
                                   1.0, atol=1e-5)


def test_export_yuv_variant(small_ckpt, tmp_path, capsys):
    out = str(tmp_path / "serve_yuv.shlo")
    summary, check = _run(["--checkpoint", small_ckpt, "--out", out,
                           "--batch", "1", "--frames", "2",
                           "--face-size", "64", "--yuv", "--check"], capsys)
    # packed YUV420: size*size*3//2 bytes per frame
    assert summary["input"] == "uint8('1', '2', '6144')"
    assert check["check"] == "ok"


def test_export_quantized_weights_baked_in(small_ckpt, tmp_path, capsys,
                                           monkeypatch):
    """QUANTIZE=int8 flows through export: the artifact carries int8
    constants (roughly 4x smaller) and still matches ITS live forward."""
    out_f32 = str(tmp_path / "f32.shlo")
    (s_f32, c0) = _run(["--checkpoint", small_ckpt, "--out", out_f32,
                        "--batch", "1", "--frames", "2",
                        "--face-size", "64", "--check"], capsys)
    monkeypatch.setenv("QUANTIZE", "int8")
    out_q = str(tmp_path / "int8.shlo")
    (s_q, c1) = _run(["--checkpoint", small_ckpt, "--out", out_q,
                      "--batch", "1", "--frames", "2",
                      "--face-size", "64", "--check"], capsys)
    assert s_q["quantized_weights"] > 10
    assert s_q["bytes"] < 0.5 * s_f32["bytes"]
    assert c1["check"] == "ok"
