"""Checkpoint persistence: orbax when available, msgpack-free npz fallback.

The reference re-reads torch ``.pth`` files every run
(reference: build_sam.py:103-107, clip/clip.py:119-142); here torch
checkpoints are converted once (core/convert.py, tools/convert_checkpoints.py)
and stored in a fast native format the runtime loads without torch.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _flatten(tree, prefix=""):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(_flatten(v, f"{prefix}{i}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat):
    root: Any = {}
    for key, val in flat.items():
        parts = key.split("/")
        node = root
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val

    def listify(node):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if keys and all(k.isdigit() for k in keys):
            return [listify(node[str(i)]) for i in range(len(keys))]
        return {k: listify(v) for k, v in node.items()}

    return listify(root)


def save(path: str, tree) -> None:
    """Save a param pytree. ``.npz`` suffix -> numpy archive; directory ->
    orbax StandardCheckpointer."""
    if path.endswith(".npz"):
        flat = _flatten(jax.device_get(tree))
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        np.savez(path, **flat)
        return
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), jax.device_get(tree))
    ckptr.wait_until_finished()


def load(path: str):
    if path.endswith(".npz"):
        with np.load(path) as z:
            flat = {k: z[k] for k in z.files}
        return _unflatten(flat)
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
