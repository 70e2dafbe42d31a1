"""Checkpoint persistence: native ``.npz`` store + torch-layout ``.pt`` export.

Reproduces the reference's three checkpoint layouts (SURVEY.md §5.4) so that
torch-side tooling and the reference's own loader accept our checkpoints:

1. rich dict ``{epoch, model_state, optimizer_state, scheduler_state,
   metrics, best_f1}``                         — ``src/train.py:398-406``
2. ``{model_state, model_config}``             — ``src/train_improved.py:333-339``
3. raw ``state_dict``                          — ``src/ensemble_trainer.py:553``

Native format: one ``.npz`` file holding the flat dotted-key tensor map plus
a JSON metadata blob — cheap, dependency-free, and mmap-friendly for serving.
Training-state (opt state + step) checkpoints go through the same store with
an ``opt.``-prefixed subtree. ``load_any`` dispatches on content so every
loader in this framework accepts both our files and reference ``.pt`` files.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Mapping, Optional, Tuple

import numpy as np

from deepfake_video_detection_tpu.utils.tree import flatten_dotted, unflatten_dotted
from deepfake_video_detection_tpu.checkpoint.torch_bridge import (
    export_to_torch_state_dict,
    extract_state_dict,
    load_torch_file,
    normalize_state_dict_keys,
)

_META_KEY = "__meta_json__"


def _to_host(tree: Any) -> Any:
    import jax

    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, variables: Mapping[str, Any],
                    meta: Optional[Mapping[str, Any]] = None,
                    opt_state: Any = None, step: Optional[int] = None) -> None:
    """Write the native ``.npz`` checkpoint (atomic rename)."""
    flat: Dict[str, np.ndarray] = {}
    flat.update({f"params.{k}": v for k, v in
                 flatten_dotted(_to_host(variables["params"])).items()})
    flat.update({f"state.{k}": v for k, v in
                 flatten_dotted(_to_host(variables.get("state", {}))).items()})
    if opt_state is not None:
        import jax

        leaves, treedef = jax.tree_util.tree_flatten(_to_host(opt_state))
        for i, leaf in enumerate(leaves):
            flat[f"opt.{i}"] = np.asarray(leaf)
    m = dict(meta or {})
    if step is not None:
        m["step"] = int(step)
    flat[_META_KEY] = np.frombuffer(
        json.dumps(m, default=_json_default).encode(), dtype=np.uint8)
    tmp = path + ".tmp"
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, path)


def _json_default(o):
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def load_checkpoint(path: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Read a native ``.npz`` checkpoint → (variables, meta). ``meta`` also
    carries ``_opt_leaves`` (ordered list) when an optimizer state was saved."""
    z = np.load(path, allow_pickle=False)
    params_flat, state_flat, opt = {}, {}, {}
    meta: Dict[str, Any] = {}
    for k in z.files:
        if k == _META_KEY:
            meta.update(json.loads(bytes(z[k]).decode()))
        elif k.startswith("params."):
            params_flat[k[len("params."):]] = z[k]
        elif k.startswith("state."):
            state_flat[k[len("state."):]] = z[k]
        elif k.startswith("opt."):
            opt[int(k[len("opt."):])] = z[k]
    if opt:
        meta["_opt_leaves"] = [opt[i] for i in sorted(opt)]
    variables = {"params": unflatten_dotted(params_flat),
                 "state": unflatten_dotted(state_flat)}
    return variables, meta


def restore_opt_state(template_opt_state: Any, meta: Mapping[str, Any]) -> Any:
    """Rehydrate an optimizer state pytree from ``meta['_opt_leaves']``."""
    import jax

    leaves = meta.get("_opt_leaves")
    if leaves is None:
        return template_opt_state
    treedef = jax.tree_util.tree_structure(template_opt_state)
    return jax.tree_util.tree_unflatten(treedef, leaves)


# ---------------------------------------------------------------------------
# torch-layout export (the reference's three layouts)
# ---------------------------------------------------------------------------


def save_torch_checkpoint(
    path: str,
    variables: Mapping[str, Any],
    layout: str = "raw",
    meta: Optional[Mapping[str, Any]] = None,
) -> None:
    """Export to ``.pt`` in one of the reference layouts ('rich' /
    'model_config' / 'raw'), consumable by the reference's own loaders."""
    import torch

    # np.copy: jax host buffers are read-only; torch.from_numpy on them
    # warns (and writing through the tensor would be UB)
    sd = {k: torch.from_numpy(np.ascontiguousarray(np.copy(v)))
          for k, v in export_to_torch_state_dict(_to_host(variables)).items()}
    meta = dict(meta or {})
    if layout == "raw":
        obj: Any = sd
    elif layout == "model_config":
        obj = {"model_state": sd, "model_config": meta.get("model_config", {})}
    elif layout == "rich":
        obj = {
            "epoch": meta.get("epoch", 0),
            "model_state": sd,
            "optimizer_state": meta.get("optimizer_state", {}),
            "scheduler_state": meta.get("scheduler_state", {}),
            "metrics": meta.get("metrics", {}),
            "best_f1": meta.get("best_f1", 0.0),
        }
    else:
        raise ValueError(f"unknown layout {layout!r}")
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    torch.save(obj, path)


def load_any(path: str) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Load either a native ``.npz`` or a reference ``.pt`` checkpoint into
    ``(flat normalized torch-layout state dict, meta)`` — the common currency
    the model loader (serve/loader.py) consumes."""
    if path.endswith(".npz") or _is_zip_npz(path):
        variables, meta = load_checkpoint(path)
        return export_to_torch_state_dict(variables), meta
    ckpt = load_torch_file(path)
    if not isinstance(ckpt, Mapping):
        raise ValueError(f"unsupported checkpoint object in {path}")
    sd, meta = extract_state_dict(ckpt)
    return normalize_state_dict_keys(sd), meta


def save_orbax(path: str, variables: Mapping[str, Any],
               opt_state: Any = None) -> None:
    """Orbax-backed checkpoint (directory format) — the multi-host-safe path
    for large sharded training states; the ``.npz`` store remains the compact
    single-file format for serving artifacts."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    tree = {"variables": _to_host(dict(variables))}
    if opt_state is not None:
        tree["opt_state"] = _to_host(opt_state)
    ckptr.save(os.path.abspath(path), tree, force=True)
    ckptr.wait_until_finished()


def load_orbax(path: str, template: Optional[Any] = None) -> Any:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(os.path.abspath(path), template)
    return ckptr.restore(os.path.abspath(path))


def _is_zip_npz(path: str) -> bool:
    try:
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic[:2] != b"PK":
            return False
        with np.load(path, allow_pickle=False) as z:
            return _META_KEY in z.files
    except Exception:
        return False
