"""PyTorch checkpoint import/export bridge.

The reference persists and consumes three checkpoint layouts plus sidecar
metadata (SURVEY.md §5.4; loader behaviours in ``app.py:1327-1769``):

1. rich dict ``{epoch, model_state, optimizer_state, scheduler_state, metrics,
   best_f1}`` (``src/train.py:398-406``),
2. ``{model_state, model_config}`` (``src/train_improved.py:333-339``),
3. raw ``state_dict`` (``src/ensemble_trainer.py:553``),

with key-prefix normalisation (``module.``/``model.``/``net.`` stripping,
``app.py:1413-1432``), ensemble-size inference from ``models.{i}`` keys
(``:1434``), and fake-class-index detection from checkpoint metadata
(``_detect_fake_idx_from_ckpt``, ``:1342-1407``).

This bridge reproduces all of that as pure functions over flat dotted-key
dicts, and additionally handles the layout conversion to our TPU-native trees:
conv kernels transpose OIHW→HWIO, everything else passes through. Backbone
subtrees that the reference wrapped in ``nn.Sequential`` (which renumbers
children: ``backbone.0`` = conv_stem, … — ``src/pretrained_detector.py:39,46``)
are rename-mapped back to their canonical timm/torchvision names.

Torch is an *optional* dependency: only ``load_torch_file`` needs it; all the
mapping logic operates on ``{key: np.ndarray}`` dicts.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from deepfake_video_detection_tpu.utils.tree import flatten_dotted, unflatten_dotted

# ---------------------------------------------------------------------------
# file loading / layout extraction
# ---------------------------------------------------------------------------


def load_torch_file(path: str) -> Dict[str, Any]:
    """Read a ``.pt`` file into plain numpy (CPU, weights-only).

    ``weights_only=True`` is the only default: full pickle deserialisation
    executes arbitrary code, and this loader is reachable from the serving
    autoload scan and the ``/api/load-model`` route. Legacy pickles that
    genuinely need it must be opted in with ``ALLOW_UNSAFE_TORCH_LOAD=1``.
    """
    import os

    import torch

    try:
        obj = torch.load(path, map_location="cpu", weights_only=True)
    except Exception as exc:
        if os.environ.get("ALLOW_UNSAFE_TORCH_LOAD", "0").lower() in (
                "1", "true", "yes"):
            obj = torch.load(path, map_location="cpu", weights_only=False)
        else:
            raise ValueError(
                f"{path}: not loadable with weights_only=True ({exc}). "
                "If this checkpoint is trusted, set ALLOW_UNSAFE_TORCH_LOAD=1 "
                "to permit full pickle deserialisation."
            ) from exc
    return _to_numpy(obj)


def _to_numpy(obj: Any) -> Any:
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, Mapping):
        return {k: _to_numpy(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_numpy(v) for v in obj)
    return obj


def extract_state_dict(ckpt: Mapping[str, Any]) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Split a checkpoint into (flat state dict, metadata) across the three
    reference layouts. Metadata keeps everything that is not a tensor map."""
    for key in ("model_state", "state_dict", "model"):
        inner = ckpt.get(key)
        if isinstance(inner, Mapping) and any(
                isinstance(v, np.ndarray) for v in inner.values()):
            meta = {k: v for k, v in ckpt.items() if k != key}
            return dict(inner), meta
    # raw state dict
    if any(isinstance(v, np.ndarray) for v in ckpt.values()):
        tensors = {k: v for k, v in ckpt.items() if isinstance(v, np.ndarray)}
        meta = {k: v for k, v in ckpt.items() if not isinstance(v, np.ndarray)}
        return tensors, meta
    raise ValueError("checkpoint contains no recognizable state dict")


def normalize_state_dict_keys(sd: Mapping[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """Strip DataParallel/wrapper prefixes (``module.``/``model.``/``net.``)."""
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        for prefix in ("module.", "model.", "net."):
            if k.startswith(prefix):
                k = k[len(prefix):]
        out[k] = v
    return out


def infer_ensemble_count(sd: Mapping[str, np.ndarray]) -> int:
    """Number of ensemble members from ``models.{i}.`` key prefixes (0 = not
    an ensemble checkpoint)."""
    idxs = set()
    for k in sd:
        m = re.match(r"models\.(\d+)\.", k)
        if m:
            idxs.add(int(m.group(1)))
    return (max(idxs) + 1) if idxs else 0


def detect_fake_index(meta: Mapping[str, Any]) -> Optional[int]:
    """Fake-class index from checkpoint metadata (class maps / idx fields),
    reproducing ``_detect_fake_idx_from_ckpt`` behaviour (``app.py:1342-1407``)."""
    for key in ("fake_class_index", "fake_idx", "fake_index"):
        v = meta.get(key)
        if isinstance(v, (int, np.integer)) and v in (0, 1):
            return int(v)
    for key in ("class_to_idx", "classes", "class_map", "label_map", "idx_to_class"):
        v = meta.get(key)
        if isinstance(v, Mapping):
            for name, idx in v.items():
                # either {"fake": 1} or {1: "fake"}
                if isinstance(name, str) and name.strip().lower().startswith("fake") \
                        and isinstance(idx, (int, np.integer)):
                    return int(idx)
                if isinstance(idx, str) and idx.strip().lower().startswith("fake") \
                        and isinstance(name, (int, np.integer)):
                    return int(name)
        elif isinstance(v, (list, tuple)):
            for i, name in enumerate(v):
                if isinstance(name, str) and name.strip().lower().startswith("fake"):
                    return i
    return None


# ---------------------------------------------------------------------------
# key renaming: Sequential-wrapped backbones → canonical names
# ---------------------------------------------------------------------------

# timm EfficientNet children order inside nn.Sequential(*children[:-1])
_EFFNET_SEQ = {"0": "conv_stem", "1": "bn1", "2": "blocks", "3": "conv_head", "4": "bn2"}
# torchvision ResNet children order (2=relu and 3=maxpool are parameterless)
_RESNET_SEQ = {"0": "conv1", "1": "bn1", "4": "layer1", "5": "layer2",
               "6": "layer3", "7": "layer4"}


def _rename_sequential_backbone(key: str, kind: str) -> Optional[str]:
    """``backbone.2.3.1.conv_pw.weight`` → ``backbone.blocks.3.1.conv_pw.weight``."""
    parts = key.split(".")
    if len(parts) < 3 or parts[0] != "backbone":
        return key
    table = _EFFNET_SEQ if kind == "efficientnet" else _RESNET_SEQ
    idx = parts[1]
    if idx.isdigit():
        name = table.get(idx)
        if name is None:
            return None  # parameterless child (pool) or unknown — drop
        return ".".join(["backbone", name] + parts[2:])
    return key


def canonicalize_detector_keys(sd: Mapping[str, np.ndarray],
                               backbone_name: str) -> Dict[str, np.ndarray]:
    """Rename a (single-member) detector state dict to canonical paths."""
    kind = "efficientnet" if backbone_name.startswith("efficientnet") else (
        "resnet" if backbone_name.startswith("resnet") else "vit")
    out: Dict[str, np.ndarray] = {}
    for k, v in sd.items():
        if kind in ("efficientnet", "resnet"):
            nk = _rename_sequential_backbone(k, kind)
            if nk is None:
                continue
        else:
            nk = k
        out[nk] = v
    return out


# ---------------------------------------------------------------------------
# tensor layout conversion + tree import
# ---------------------------------------------------------------------------

_STATE_LEAVES = ("running_mean", "running_var")
_DROP_LEAVES = ("num_batches_tracked",)


def _to_ours(key: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:  # conv OIHW → HWIO
        return np.transpose(arr, (2, 3, 1, 0))
    return arr


def _to_torch(key: str, arr: np.ndarray) -> np.ndarray:
    if arr.ndim == 4:  # HWIO → OIHW
        return np.transpose(arr, (3, 2, 0, 1))
    return arr


def _torch_lstm_to_ours(flat: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """``lstm.weight_ih_l0`` stays a flat name in our tree too — no-op hook
    kept for symmetry/documentation."""
    return flat


def import_into_variables(
    sd: Mapping[str, np.ndarray],
    template: Mapping[str, Any],
    strict: bool = False,
) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Map a canonical-key torch state dict onto ``{"params":…, "state":…}``.

    Shape-filtered non-strict load by default (≙ ``_safe_load_state_dict``,
    ``app.py:1476``): mismatched/missing keys are skipped and reported.
    Returns ``(variables, report)`` where report has ``matched``, ``missing``,
    ``unexpected``, ``shape_mismatch`` and ``match_ratio``.
    """
    flat_params = flatten_dotted(template["params"])
    flat_state = flatten_dotted(template.get("state", {}))

    new_params = dict(flat_params)
    new_state = dict(flat_state)
    matched, missing, mismatched = [], [], []
    used = set()

    for dst, (tree, cur) in {**{k: ("params", v) for k, v in flat_params.items()},
                             **{k: ("state", v) for k, v in flat_state.items()}}.items():
        tree_name, cur_val = tree, cur
        src = sd.get(dst)
        if src is None:
            missing.append(dst)
            continue
        conv = _to_ours(dst, np.asarray(src))
        if tuple(conv.shape) != tuple(np.shape(cur_val)):
            mismatched.append((dst, tuple(conv.shape), tuple(np.shape(cur_val))))
            continue
        if tree_name == "params":
            new_params[dst] = conv.astype(np.asarray(cur_val).dtype)
        else:
            new_state[dst] = conv.astype(np.asarray(cur_val).dtype)
        matched.append(dst)
        used.add(dst)

    unexpected = [k for k in sd
                  if k not in used and not any(k.endswith(s) for s in _DROP_LEAVES)]
    total = len(flat_params) + len(flat_state)
    report = {
        "matched": matched,
        "missing": missing,
        "unexpected": unexpected,
        "shape_mismatch": mismatched,
        "match_ratio": len(matched) / max(total, 1),
    }
    if strict and (missing or mismatched):
        raise ValueError(f"strict import failed: missing={missing[:5]} "
                         f"mismatched={[m[0] for m in mismatched[:5]]}")
    variables = {"params": unflatten_dotted(new_params),
                 "state": unflatten_dotted(new_state)}
    return variables, report


def export_to_torch_state_dict(variables: Mapping[str, Any]) -> Dict[str, np.ndarray]:
    """Our variables → torch-layout flat state dict (OIHW convs), so our
    checkpoints can be consumed by torch-side tooling."""
    flat = {}
    flat.update(flatten_dotted(variables["params"]))
    flat.update(flatten_dotted(variables.get("state", {})))
    return {k: _to_torch(k, np.asarray(v)) for k, v in flat.items()}
