"""Pytree helpers.

Parameters across this framework are nested dicts whose *dotted paths* mirror
the PyTorch ``state_dict`` key layout of the equivalent reference modules
(e.g. ``blocks.1.0.conv_pw.weight``). That makes the torch checkpoint import
bridge (``train/torch_bridge.py``) a pure key-path mapping, reproducing the
three checkpoint layouts catalogued in SURVEY.md §5.4.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import jax
import numpy as np


def flatten_dotted(tree: Mapping[str, Any], prefix: str = "") -> Dict[str, Any]:
    """Flatten a nested dict into ``{"a.b.c": leaf}`` form."""
    out: Dict[str, Any] = {}
    for k, v in tree.items():
        path = f"{prefix}{k}"
        if isinstance(v, Mapping):
            out.update(flatten_dotted(v, prefix=path + "."))
        else:
            out[path] = v
    return out


def unflatten_dotted(flat: Mapping[str, Any]) -> Dict[str, Any]:
    """Inverse of :func:`flatten_dotted`."""
    out: Dict[str, Any] = {}
    for path, leaf in flat.items():
        parts = path.split(".")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = leaf
    return out


def tree_size(tree: Any) -> int:
    """Total number of scalar elements across all leaves."""
    return sum(int(np.prod(x.shape)) if hasattr(x, "shape") else 1
               for x in jax.tree_util.tree_leaves(tree))
