"""Pickle-free pytree (params) <-> npz serialization.

Used for model/tower export (SURVEY §5.4: "export = plain arrays + a tiny
serving fn" instead of the reference's three SavedModels,
ref: two_tower_model.py:176-205). Nested dict/list pytrees are flattened to
path keys ("query_tower/dense/0/w"); structure is recovered from the keys.
"""

from __future__ import annotations

import os
from typing import Dict

import numpy as np


def _flatten(tree, prefix: str, out: Dict[str, np.ndarray]) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            _flatten(v, f"{prefix}{k}/", out)
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            _flatten(v, f"{prefix}{i}/", out)
    else:
        out[prefix[:-1]] = np.asarray(tree)


def save_pytree_npz(tree, filepath: str) -> None:
    os.makedirs(os.path.dirname(filepath) or ".", exist_ok=True)
    flat: Dict[str, np.ndarray] = {}
    _flatten(tree, "", flat)
    np.savez(filepath, **flat)


def load_pytree_npz(filepath: str):
    """Rebuilds nested dicts/lists. A level whose keys are all digits is
    reconstructed as a list."""
    with np.load(filepath) as z:
        flat = {k: z[k] for k in z.files}
    root: dict = {}
    for path, arr in flat.items():
        parts = path.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = arr

    def densify(node):
        if not isinstance(node, dict):
            return node
        if node and all(k.isdigit() for k in node.keys()):
            return [
                densify(node[str(i)]) for i in range(len(node))
            ]
        return {k: densify(v) for k, v in node.items()}

    return densify(root)
