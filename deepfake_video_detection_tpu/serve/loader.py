"""Checkpoint resolver + model loader for serving.

Capability parity with the reference's ``load_model`` and autoload machinery
(``app.py:450-675, 1327-1769``), reimplemented as pure functions with unit
tests (SURVEY.md §7 "hard parts: checkpoint-compat heuristics"):

* ``load_model(path, model_type)``: accepts native ``.npz`` and all three
  torch layouts; strips ``module./model./net.`` prefixes; detects the fake
  class index from metadata; infers ensemble size from ``models.{i}`` keys;
  runs a **shape-compatibility architecture search** over candidate backbone
  combinations (``_compat_score`` ≙ ``app.py:1449``, presets ≙ ``:1604-1619``);
  shape-filtered non-strict load; rejects below match-ratio 0.80
  (``:1735-1738``); records ``LAST_LOAD_STATS``.
* ``pick_best_checkpoint_for_autoload``: scored local glob — dfdc200 > dfdc >
  ensemble folder-name priors, ``training_history.csv`` metric tiebreak,
  extreme-calibration penalty (``:450-562``).
* ``build_autoload_candidates``: ``MODEL_URL`` download > ``MODEL_PATH`` >
  scored glob > legacy names (``:604-641``); ``attempt_autoload`` tries each
  until one loads (``:643-675``).
"""

from __future__ import annotations

import csv
import glob as _glob
import json
import logging
import os
import re
import urllib.request
from typing import Any, Dict, List, Optional, Sequence, Tuple

import numpy as np

from deepfake_video_detection_tpu.checkpoint.store import load_any
from deepfake_video_detection_tpu.checkpoint.torch_bridge import (
    canonicalize_detector_keys, detect_fake_index, import_into_variables,
    infer_ensemble_count)
from deepfake_video_detection_tpu.nn.quant import quantize_variables
from deepfake_video_detection_tpu.utils.config import env_int, env_str

logger = logging.getLogger(__name__)

LAST_LOAD_STATS: Dict[str, Any] = {}

# candidate backbone presets by ensemble size (≙ app.py:1604-1619)
_ENSEMBLE_PRESETS: Dict[int, List[List[str]]] = {
    2: [["efficientnet_b0", "resnet18"],
        ["efficientnet_b0", "efficientnet_b0"],
        ["resnet18", "resnet18"],
        ["efficientnet_b0", "resnet34"]],
    3: [["efficientnet_b0", "resnet18", "resnet34"],
        ["efficientnet_b0", "efficientnet_b0", "resnet18"]],
}
_SINGLE_CANDIDATES = ["efficientnet_b0", "resnet18", "resnet34", "resnet50",
                      "vit_base_patch16_224"]


def infer_backbone_from_keys(sd: Dict[str, np.ndarray],
                             filename: str = "") -> Optional[str]:
    """Key-signature / filename backbone inference (≙ ``app.py:1530-1574``)."""
    keys = list(sd)
    if any(".conv_pwl." in k or "conv_stem" in k for k in keys):
        return "efficientnet_b0"
    if any("patch_embed" in k or "cls_token" in k for k in keys):
        return "vit_base_patch16_224"
    if any(re.search(r"layer4\.\d+\.conv3\.", k) for k in keys):
        return "resnet50"
    if any(re.search(r"layer4\.\d+\.conv1\.", k) for k in keys):
        # basic-block resnets: distinguish 18 vs 34 by layer depth
        depths = {int(m.group(1)) for k in keys
                  for m in [re.search(r"layer3\.(\d+)\.", k)] if m}
        return "resnet34" if depths and max(depths) >= 2 else "resnet18"
    low = filename.lower()
    for name in _SINGLE_CANDIDATES:
        if name.split("_")[0] in low:
            return name
    return None


def compat_score(sd: Dict[str, np.ndarray], template_model) -> float:
    """Fraction of template params whose checkpoint entry matches in shape
    (≙ ``_compat_score``, ``app.py:1449``)."""
    import jax

    template = jax.eval_shape(lambda: template_model.init(
        jax.random.PRNGKey(0)))
    from deepfake_video_detection_tpu.utils.tree import flatten_dotted

    flat = {**flatten_dotted(template["params"]),
            **flatten_dotted(template.get("state", {}))}
    if not flat:
        return 0.0
    hits = 0
    for k, spec in flat.items():
        src = sd.get(k)
        if src is None:
            continue
        want = tuple(spec.shape)
        got = tuple(np.shape(src))
        if len(got) == 4:  # torch OIHW → our HWIO
            got = (got[2], got[3], got[1], got[0])
        if got == want:
            hits += 1
    return hits / len(flat)


def _strip_member(sd: Dict[str, np.ndarray], i: int) -> Dict[str, np.ndarray]:
    prefix = f"models.{i}."
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def serving_dtype():
    """Activation compute dtype for served models (params stay f32).

    Single source of truth: ``ModelConfig.compute_dtype`` (env override
    ``COMPUTE_DTYPE``). ``auto`` — the default — resolves to bfloat16 on
    accelerators and float32 on CPU backends, where bf16 is slower and
    exact-parity numerics (torch cross-checks, CI) matter more than
    bandwidth. Unrecognized values fall back to float32 WITH a warning
    so a typo ('float16', 'bfloat_16') can't silently halve throughput.
    """
    import jax
    import jax.numpy as jnp

    from deepfake_video_detection_tpu.utils.config import ModelConfig

    name = (ModelConfig.from_env().compute_dtype or "auto").lower()
    if name == "auto":
        name = "bfloat16" if jax.default_backend() != "cpu" else "float32"
    if name in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if name not in ("float32", "f32"):
        logger.warning("COMPUTE_DTYPE=%r not supported "
                       "(bfloat16|float32|auto); serving in float32", name)
    return jnp.float32


def _quantize_mode() -> str:
    """Weight-at-rest quantization mode (``QUANTIZE`` env via ModelConfig).
    ``int8`` → serve matmul/conv weights as int8 + per-channel scales
    (nn/quant.py; beyond reference parity). Unknown values warn + disable
    rather than silently serving different numerics than configured."""
    from deepfake_video_detection_tpu.utils.config import ModelConfig

    mode = (ModelConfig.from_env().quantize or "none").lower()
    if mode in ("", "none", "0", "false", "off"):
        return "none"
    if mode != "int8":
        logger.warning("QUANTIZE=%r not supported (int8|none); "
                       "serving unquantized", mode)
        return "none"
    return mode


def load_model(path: str, model_type: Optional[str] = None
               ) -> Tuple[Any, Dict[str, Any], Dict[str, Any]]:
    """Resolve + load a serving model. Returns (model, variables, stats).

    Raises ``ValueError`` when no candidate architecture reaches match-ratio
    0.80 (≙ ``app.py:1735-1738``).
    """
    import jax

    from deepfake_video_detection_tpu.models.backbone_detector import (
        BackboneDetector, EnsembleDetector)
    from deepfake_video_detection_tpu.models.cnn_lstm import CNNLSTMHybrid
    from deepfake_video_detection_tpu.models.gcn import FrameGraphDetector

    sd, meta = load_any(path)
    if (meta.get("metrics_scored_on") == "ema"
            and path.endswith(".npz") and not path.endswith("_ema.npz")):
        # EMA training: best-checkpoint selection scored the EMA weights,
        # so the raw-params file's recorded metrics belong to the sibling
        # *_ema.npz — serve THOSE weights, not the raw ones
        ema_path = path[:-len(".npz")] + "_ema.npz"
        if os.path.exists(ema_path):
            logger.info("checkpoint %s was selected on EMA metrics; "
                        "serving the EMA weights from %s", path, ema_path)
            path = ema_path
            sd, meta = load_any(ema_path)
        else:
            logger.warning("checkpoint %s records EMA-scored metrics but no "
                           "sibling _ema.npz exists; serving RAW weights "
                           "whose quality may differ from the recorded "
                           "metrics", path)
    cfg = meta.get("model_config") or {}
    fake_idx = detect_fake_index(meta)
    n_members = infer_ensemble_count(sd)
    fname = os.path.basename(path)

    requested = (model_type or "").strip().lower() or cfg.get("model_type") or None
    cdt = serving_dtype()

    candidates: List[Tuple[str, Any, Dict[str, np.ndarray]]] = []
    if requested in ("temporal", "temporal_transformer") or (
            requested is None and "cls_token" in sd
            and any(k.startswith("backbone.") for k in sd)):
        from deepfake_video_detection_tpu.models.temporal_transformer import (
            TemporalTransformerDetector, infer_mlp_kwargs,
            normalize_state_dict)

        # pipeline-parallel checkpoints store blocks stacked; renumber to
        # the canonical loop layout (shared helper, also used by the
        # evaluator) so PP-trained models serve like any other
        sd = normalize_state_dict(sd)
        name = cfg.get("backbone") or infer_backbone_from_keys(
            {k[len("backbone."):]: v for k, v in sd.items()
             if k.startswith("backbone.")}, fname) or "efficientnet_b0"
        use_cls = "cls_token" in sd
        if use_cls:
            d_model = int(np.shape(sd["cls_token"])[-1])
        elif "proj.weight" in sd:  # use_cls=False (e.g. SP-trained): mean pool
            d_model = int(np.shape(sd["proj.weight"])[0])
        else:
            raise ValueError(
                f"{fname}: temporal checkpoint lacks both cls_token and "
                "proj.weight — cannot infer d_model")
        depth = 1 + max((int(k.split(".")[1]) for k in sd
                         if k.startswith("blocks.")), default=3)
        moe_kw = infer_mlp_kwargs(sd, d_model, cfg)
        candidates.append((
            "temporal",
            TemporalTransformerDetector(name, d_model=d_model, depth=depth,
                                        num_heads=cfg.get("num_heads", 4),
                                        use_cls=use_cls, compute_dtype=cdt,
                                        **moe_kw),
            sd))
    elif requested in ("cnn_lstm",) or (requested is None and
                                        any(k.startswith("cnn.") for k in sd)):
        candidates.append(("cnn_lstm", CNNLSTMHybrid(compute_dtype=cdt), sd))
    elif requested in ("vit_gcn", "gcn") or (requested is None and
                                             any(k.startswith("gcn.") for k in sd)):
        from deepfake_video_detection_tpu.evals.evaluate import (
            infer_vit_variant_from_state_dict)
        variant = cfg.get("vit_variant") or infer_vit_variant_from_state_dict(sd)
        candidates.append(("vit_gcn", FrameGraphDetector(
            vit_variant=variant, compute_dtype=cdt), sd))
    elif n_members > 0:
        combos = []
        if cfg.get("backbones"):
            combos.append(list(cfg["backbones"]))
        member_sd0 = _strip_member(sd, 0)
        inferred = infer_backbone_from_keys(member_sd0, fname)
        if inferred:
            combos.append([inferred] * n_members)
        combos += _ENSEMBLE_PRESETS.get(n_members,
                                        [["efficientnet_b0"] * n_members])
        seen = set()
        for combo in combos:
            key = tuple(combo)
            if key in seen or len(combo) != n_members:
                continue
            seen.add(key)
            # canonicalize per-member Sequential indices
            fixed = {}
            for i in range(n_members):
                member = canonicalize_detector_keys(_strip_member(sd, i),
                                                    combo[i])
                fixed.update({f"models.{i}.{k}": v for k, v in member.items()})
            extra = {k: v for k, v in sd.items() if not k.startswith("models.")}
            fixed.update(extra)
            candidates.append((
                "ensemble_pretrained",
                EnsembleDetector(combo,
                                 ensemble_method=cfg.get("ensemble_method",
                                                         "average"),
                                 compute_dtype=cdt),
                fixed))
    else:
        names = []
        cfg_backbone = cfg.get("backbone") or cfg.get("backbone_name")
        if cfg_backbone:
            names.append(cfg_backbone)
        inferred = infer_backbone_from_keys(sd, fname)
        if inferred:
            names.append(inferred)
        names += [n for n in _SINGLE_CANDIDATES if n not in names]
        for name in names:
            canon = canonicalize_detector_keys(sd, name)
            candidates.append(("pretrained",
                               BackboneDetector(name, compute_dtype=cdt),
                               canon))

    # score candidates by shape compatibility, best first
    scored = []
    for mtype, model, csd in candidates:
        try:
            scored.append((compat_score(csd, model), mtype, model, csd))
        except Exception:
            continue
    scored.sort(key=lambda t: -t[0])

    for score, mtype, model, csd in scored:
        if score < 0.5:  # don't bother instantiating hopeless candidates
            continue
        template = model.init(jax.random.PRNGKey(0))
        variables, report = import_into_variables(csd, template, strict=False)
        if report["match_ratio"] >= 0.80:
            n_quant = 0
            if _quantize_mode() == "int8":
                # weights at rest → int8 + per-out-channel scales; XLA fuses
                # the dequant into each matmul/conv read (nn/quant.py).
                # Post-load so every checkpoint format gets it for free.
                variables, n_quant = quantize_variables(variables)
                logger.info("QUANTIZE=int8: %d weight tensors quantized",
                            n_quant)
            stats = {
                "path": path, "model_type": mtype,
                "match_ratio": report["match_ratio"],
                "matched": len(report["matched"]),
                "missing": len(report["missing"]),
                "unexpected": len(report["unexpected"]),
                "shape_mismatch": len(report["shape_mismatch"]),
                "fake_class_index": fake_idx,
                "compat_score": score,
                "backbones": getattr(model, "backbone_names",
                                     getattr(model, "backbone_name", None)),
                "quantized_weights": n_quant,
            }
            LAST_LOAD_STATS.clear()
            LAST_LOAD_STATS.update(stats)
            return model, variables, stats
    best = scored[0][0] if scored else 0.0
    raise ValueError(f"no candidate architecture matched checkpoint {path} "
                     f"(best match ratio {best:.2f} < 0.80)")


# ---------------------------------------------------------------------------
# autoload candidate scoring (≙ app.py:450-675)
# ---------------------------------------------------------------------------


def _history_best_metric(folder: str) -> float:
    """Best F1/accuracy recorded in ``training_history.csv`` (tiebreak)."""
    path = os.path.join(folder, "training_history.csv")
    if not os.path.exists(path):
        return 0.0
    best = 0.0
    try:
        with open(path, newline="") as f:
            for row in csv.DictReader(f):
                for key in ("f1", "val_f1", "accuracy", "val_acc"):
                    try:
                        best = max(best, float(row.get(key, 0) or 0))
                    except ValueError:
                        pass
    except OSError:
        return 0.0
    return best


def calibration_penalty(folder: str) -> float:
    """Penalty for extreme calibration thresholds (≙ ``app.py:502-522``)."""
    path = os.path.join(folder, "calibration_best.json")
    if not os.path.exists(path):
        return 0.0
    try:
        with open(path) as f:
            cal = json.load(f)
        thr = float(cal.get("best_thr_accuracy", 0.5))
        if thr < 0.05 or thr > 0.95:
            return 5.0
    except (OSError, ValueError):
        return 0.0
    return 0.0


def rank_checkpoints_for_autoload(root: str = "checkpoints") -> List[str]:
    """Scored glob over checkpoint folders (dfdc200 > dfdc > ensemble),
    history-CSV tiebreak, extreme-calibration penalty. Returns ALL hits in
    descending score — autoload walks the list until one loads."""
    patterns = ["checkpoint_best*.npz", "checkpoint_best*.pt",
                "checkpoint_epoch_*.npz", "*.pt", "*.npz"]
    found: List[Tuple[float, str]] = []
    for dirpath, _, _files in os.walk(root):
        low = dirpath.lower()
        prior = 0.0
        if "dfdc200" in low:
            prior = 30.0
        elif "dfdc" in low:
            prior = 20.0
        elif "ensemble" in low:
            prior = 10.0
        for rank, pat in enumerate(patterns):
            hits = sorted(_glob.glob(os.path.join(dirpath, pat)))
            for p in hits:
                score = prior + (10 - rank) + _history_best_metric(dirpath) \
                    - calibration_penalty(dirpath)
                found.append((score, p))
            if hits:
                break  # best pattern class per dir only
    found.sort(key=lambda t: (-t[0], t[1]))
    return [p for _, p in found]


def pick_best_checkpoint_for_autoload(root: str = "checkpoints") -> Optional[str]:
    ranked = rank_checkpoints_for_autoload(root)
    return ranked[0] if ranked else None


def download_checkpoint(url: str, dest_dir: str = "checkpoints") -> Optional[str]:
    """≙ ``_download_checkpoint`` (``app.py:576-601``)."""
    os.makedirs(dest_dir, exist_ok=True)
    fname = env_str("MODEL_FILENAME") or os.path.basename(url.split("?")[0]) \
        or "model.pt"
    dest = os.path.join(dest_dir, fname)
    if os.path.exists(dest):
        return dest
    timeout = env_int("MODEL_DOWNLOAD_TIMEOUT", 60)
    try:
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                open(dest + ".part", "wb") as f:
            while True:
                chunk = r.read(1 << 20)
                if not chunk:
                    break
                f.write(chunk)
        os.replace(dest + ".part", dest)
        return dest
    except Exception:
        try:
            os.remove(dest + ".part")
        except OSError:
            pass
        return None


def build_autoload_candidates(root: str = "checkpoints") -> List[Tuple[str, Optional[str]]]:
    """Ordered (path, model_type) candidates (≙ ``app.py:604-641``)."""
    out: List[Tuple[str, Optional[str]]] = []
    url = env_str("MODEL_URL") or env_str("CHECKPOINT_URL")
    if url:
        p = download_checkpoint(url, root)
        if p:
            out.append((p, env_str("MODEL_TYPE")))
    explicit = env_str("MODEL_PATH") or env_str("CHECKPOINT_PATH")
    if explicit and os.path.exists(explicit):
        out.append((explicit, env_str("MODEL_TYPE")))
    for path in rank_checkpoints_for_autoload(root)[:8]:
        out.append((path, None))
    for legacy in ("checkpoints/checkpoint_best.pt",
                   "checkpoints/checkpoint_best.npz",
                   "checkpoints/vit_gnn_ckpt.pt"):
        if os.path.exists(legacy):
            out.append((legacy, None))
    return out


def attempt_autoload(root: str = "checkpoints"):
    """Try candidates until one loads (≙ ``_attempt_autoload``,
    ``app.py:643-675``). Returns (model, variables, stats) or None."""
    for path, mtype in build_autoload_candidates(root):
        try:
            return load_model(path, mtype)
        except Exception:
            continue
    return None
