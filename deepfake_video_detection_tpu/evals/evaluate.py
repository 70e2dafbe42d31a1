"""Evaluation harness CLI (≙ ``src/evaluate.py:337-493``).

Loads a checkpoint (native ``.npz`` or reference ``.pt`` via the bridge),
rebuilds the model — from embedded ``model_config`` when present, otherwise by
key-shape inference like the reference (``_infer_timm_vit_model_name_from_
state_dict``, ``src/evaluate.py:24-62``; LogicRNN dim inference ``:399-416``)
— runs batched jitted inference over a ``VideoFacesDataset``, and prints the
full metric set (acc/precision/recall/F1/report/CM/AUC) with an optional
threshold sweep, writing a per-file CSV.
"""

from __future__ import annotations

import argparse
import csv
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from deepfake_video_detection_tpu.checkpoint.store import load_any
from deepfake_video_detection_tpu.checkpoint.torch_bridge import (
    import_into_variables, infer_ensemble_count)
from deepfake_video_detection_tpu.data.dataset import VideoFacesDataset
from deepfake_video_detection_tpu.data.loader import Loader, prefetch_to_device
from deepfake_video_detection_tpu.data.normalize import imagenet_normalize
from deepfake_video_detection_tpu.evals.metrics import full_metrics, threshold_sweep
from deepfake_video_detection_tpu.utils.graph import chain_adjacency, normalize_adjacency

# embed-dim → timm ViT variant (≙ ``src/evaluate.py:24-62``)
_EMBED_TO_VIT = {192: "vit_tiny_patch16_224", 384: "vit_small_patch16_224",
                 768: "vit_base_patch16_224", 1024: "vit_large_patch16_224"}


def infer_vit_variant_from_state_dict(sd: Dict[str, np.ndarray]) -> str:
    for key in sd:
        if key.endswith("cls_token") or key.endswith("pos_embed"):
            return _EMBED_TO_VIT.get(int(sd[key].shape[-1]), "vit_base_patch16_224")
    for key in sd:
        if "patch_embed.proj.weight" in key:
            return _EMBED_TO_VIT.get(int(sd[key].shape[0]), "vit_base_patch16_224")
    return "vit_base_patch16_224"


def infer_logic_rnn_dims(sd: Dict[str, np.ndarray]) -> Tuple[int, int, int]:
    """(input_size, hidden_size, num_layers) from ``logic_cells.*`` shapes
    (≙ ``src/evaluate.py:399-416``)."""
    layers = set()
    input_size = hidden_size = None
    for k, v in sd.items():
        if ".and_gate.weight" in k and k.startswith("logic_cells."):
            idx = int(k.split(".")[1])
            layers.add(idx)
            if idx == 0:
                hidden_size = v.shape[0]
                input_size = v.shape[1] - hidden_size
    if hidden_size is None:
        raise ValueError("not a LogicRNN checkpoint")
    return input_size, hidden_size, max(layers) + 1


class RNNVideoPipeline:
    """ViT per-frame features (+ linear projection on dim mismatch,
    ≙ ``src/evaluate.py:462-465``) → LogicRNN. Sigmoid prob → 2-class probs."""

    def __init__(self, rnn, vit_variant: str = "vit_tiny_patch16_224"):
        from deepfake_video_detection_tpu.models.vit import VisionTransformer

        self.rnn = rnn
        self.vit = VisionTransformer(variant=vit_variant, num_classes=0)
        self.needs_proj = self.vit.feature_dim != rnn.input_size

    def init(self, rng):
        kv, kp, kr = jax.random.split(rng, 3)
        params = {"rnn": self.rnn.init(kr)["params"],
                  "vit": self.vit.init(kv)["params"]}
        if self.needs_proj:
            from deepfake_video_detection_tpu.nn import init as I
            params["proj"] = {
                "weight": I.kaiming_uniform(kp, (self.rnn.input_size,
                                                 self.vit.feature_dim)),
                "bias": I.zeros(self.rnn.input_size)}
        return {"params": params, "state": {}}

    def apply(self, variables, frames, train=False, rng=None):
        from deepfake_video_detection_tpu.nn import layers as L

        p = variables["params"]
        B, T = frames.shape[0], frames.shape[1]
        feats, _ = self.vit.apply({"params": p["vit"], "state": {}},
                                  frames.reshape((B * T,) + frames.shape[2:]))
        if self.needs_proj:
            feats = L.linear(p["proj"], feats)
        feats = feats.reshape(B, T, -1)
        prob_fake, _ = self.rnn.apply({"params": p["rnn"], "state": {}}, feats)
        probs2 = jnp.concatenate([1.0 - prob_fake, prob_fake], axis=-1)
        # return as logits-like log-probs so the softmax downstream is identity-ish
        return jnp.log(jnp.clip(probs2, 1e-8, 1.0)), {}


def build_model_from_checkpoint(sd: Dict[str, np.ndarray], meta: Dict[str, Any],
                                model_type: str, compute_dtype=None):
    """Model + variables from a checkpoint, with reference-style inference of
    the architecture when ``model_config`` metadata is absent.

    ``compute_dtype`` selects the activation dtype (``--bf16`` on the CLI;
    params stay f32 — same convention as the training CLIs and the serve
    loader's ``COMPUTE_DTYPE``)."""
    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector, EnsembleDetector)
    from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid
    from deepfake_video_detection_tpu.models.gcn import FrameGraphDetector
    from deepfake_video_detection_tpu.models.logic_rnn import LogicRNNLSTM

    cfg = meta.get("model_config") or {}
    cdt = compute_dtype if compute_dtype is not None else jnp.float32
    mt = model_type or cfg.get("model_type", "")
    if not mt:
        if infer_ensemble_count(sd) > 0:
            mt = "ensemble"
        elif any(k.startswith("logic_cells.") for k in sd):
            mt = "rnn"
        elif any(k.startswith("vit.") or k.startswith("gcn.") for k in sd):
            mt = "vit_gcn"
        elif any(k.startswith("cnn.") for k in sd):
            mt = "cnn_lstm"
        else:
            mt = "pretrained"
    if mt in ("vit_gcn", "gcn"):
        variant = cfg.get("vit_variant") or infer_vit_variant_from_state_dict(sd)
        model = FrameGraphDetector(vit_variant=variant, compute_dtype=cdt)
    elif mt in ("cnn_lstm",):
        model = CNNLSTMHybrid(compute_dtype=cdt)
    elif mt in ("rnn", "logic_rnn"):
        i, h, n = infer_logic_rnn_dims(sd)
        model = RNNVideoPipeline(LogicRNNLSTM(input_size=i, hidden_size=h,
                                              num_layers=n))
        # the checkpoint holds only the RNN; the ViT extractor is fresh
        # (≙ ``src/evaluate.py:440-465``) — remap keys into the pipeline tree
        sd = {f"rnn.{k}": v for k, v in sd.items()}
    elif mt == "ensemble":
        backbones = cfg.get("backbones") or ["efficientnet_b0"] * infer_ensemble_count(sd)
        model = EnsembleDetector(backbones, compute_dtype=cdt)
    elif mt in ("temporal", "temporal_transformer"):
        from deepfake_video_detection_tpu.models.temporal_transformer import (
            TemporalTransformerDetector, infer_mlp_kwargs, normalize_state_dict)
        sd = normalize_state_dict(sd)  # PP checkpoints: stacked → loop layout
        use_cls = "cls_token" in sd
        if use_cls:
            d_model = int(np.shape(sd["cls_token"])[-1])
        elif "proj.weight" in sd:
            d_model = int(np.shape(sd["proj.weight"])[0])
        else:
            d_model = cfg.get("d_model", 256)
        depth = cfg.get("depth") or 1 + max(
            (int(k.split(".")[1]) for k in sd if k.startswith("blocks.")),
            default=3)
        moe_kw = infer_mlp_kwargs(sd, d_model, cfg)
        model = TemporalTransformerDetector(
            cfg.get("backbone", "efficientnet_b0"), d_model=d_model,
            depth=depth, num_heads=cfg.get("num_heads", 4), use_cls=use_cls,
            compute_dtype=cdt, **moe_kw)
    else:
        model = BackboneDetector(cfg.get("backbone", "efficientnet_b0"),
                                 compute_dtype=cdt)
    template = model.init(jax.random.PRNGKey(0))
    variables, report = import_into_variables(sd, template, strict=False)
    return model, variables, report, mt


def evaluate_dataset(model, variables, ds, model_type: str,
                     batch_size: int = 8, fake_index: int = 1):
    """Run inference over the dataset; returns (paths, labels, prob_fake)."""
    adjacency = None
    if model_type in ("vit_gcn", "gcn"):
        A = normalize_adjacency(chain_adjacency(ds.num_frames))
        adjacency = np.asarray(A)

    @jax.jit
    def forward(variables, frames, A=None):
        x = imagenet_normalize(frames)
        if A is not None:
            out, _ = model.apply(variables, x, A, train=False)
        else:
            out, _ = model.apply(variables, x, train=False)
        logits = out[0] if isinstance(out, tuple) else out
        return jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

    loader = Loader(ds, batch_size, shuffle=False)
    paths_all, labels_all, probs_all = [], [], []
    for batch in loader:
        frames = jnp.asarray(batch["frames"])
        if adjacency is not None:
            B = frames.shape[0]
            A = jnp.broadcast_to(adjacency, (B,) + adjacency.shape)
            probs = np.asarray(forward(variables, frames, A))
        else:
            probs = np.asarray(forward(variables, frames))
        valid = batch["valid"]
        probs_all.append(probs[valid])
        labels_all.append(np.asarray(batch["labels"])[valid])
        paths_all.extend([p for p, v in zip(batch["paths"], valid) if v])
    probs = np.concatenate(probs_all)
    labels = np.concatenate(labels_all)
    return paths_all, labels, probs[:, fake_index]


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="Evaluate a checkpoint on a faces dataset")
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--model", default="", help="vit_gcn|cnn_lstm|rnn|pretrained|ensemble "
                                                "(default: infer from checkpoint)")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--num_frames", type=int, default=16)
    ap.add_argument("--threshold", type=float, default=0.5)
    ap.add_argument("--sweep", action="store_true")
    ap.add_argument("--recursive", action="store_true")
    ap.add_argument("--out_csv", default=None)
    ap.add_argument("--fake_index", type=int, default=1)
    ap.add_argument("--from-videos", dest="from_videos", action="store_true",
                    help="evaluate directly on raw video files (in-loader "
                         "C++ decode; no .npz prep stage)")
    ap.add_argument("--labels_csv", default=None)
    ap.add_argument("--face_size", type=int, default=224)
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 activations (params stay f32) — same "
                         "convention as the training CLIs; the rnn pipeline "
                         "stays f32 (scan LSTM is not MXU-bound)")
    ap.add_argument("--quantize", default="none", choices=["none", "int8"],
                    help="evaluate with int8 weight-at-rest quantization "
                         "(nn/quant.py) — measure the quality cost of "
                         "QUANTIZE=int8 serving BEFORE enabling it")
    args = ap.parse_args(argv)

    sd, meta = load_any(args.checkpoint)
    model, variables, report, mt = build_model_from_checkpoint(
        sd, meta, args.model,
        compute_dtype=jnp.bfloat16 if args.bf16 else None)
    n_quant = 0
    if args.quantize == "int8":
        from deepfake_video_detection_tpu.nn.quant import quantize_variables
        variables, n_quant = quantize_variables(variables)
    print(f"model={mt} matched={len(report['matched'])} missing={len(report['missing'])} "
          f"match_ratio={report['match_ratio']:.3f}"
          + (f" quantized_weights={n_quant}" if n_quant else ""))

    if args.from_videos:
        from deepfake_video_detection_tpu.data.video_dataset import (
            VideoClipsDataset)
        ds = VideoClipsDataset(args.data_dir, num_frames=args.num_frames,
                               face_size=args.face_size,
                               labels_csv=args.labels_csv,
                               recursive=args.recursive)
    else:
        ds = VideoFacesDataset(args.data_dir, num_frames=args.num_frames,
                               recursive=args.recursive)
    paths, labels, prob_fake = evaluate_dataset(
        model, variables, ds, mt, args.batch_size, args.fake_index)

    m = full_metrics(labels, prob_fake, args.threshold, args.fake_index)
    print(m.pop("report"))
    print({k: v for k, v in m.items() if k != "confusion_matrix"})
    print("confusion:", m["confusion_matrix"])
    if args.sweep:
        print("sweep:", threshold_sweep(labels, prob_fake, fake_index=args.fake_index))

    out_csv = args.out_csv or os.path.join(
        os.path.dirname(args.checkpoint) or ".", "evaluation_summary.csv")
    with open(out_csv, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["path", "label", "prob_fake", "pred"])
        for p, l, pf in zip(paths, labels.tolist(), prob_fake.tolist()):
            w.writerow([p, l, pf, int(pf >= args.threshold)])
    print(f"wrote {out_csv}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
