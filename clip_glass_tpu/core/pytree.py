"""Parameter-pytree utilities: flat-key access, npz save/load, tree casting.

Models in this framework are plain functions over nested-dict parameter
pytrees (no module framework), which makes torch-checkpoint import
(weights/torch_import.py) and sharding annotation trivial.
"""

from __future__ import annotations

import os
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

SEP = "."


def flatten(tree, prefix: str = "") -> Dict[str, Any]:
    """Nested dict/list -> {dotted.key: leaf}; list indices become keys, so
    lists round-trip through unflatten as {'0': ..., '1': ...} dicts."""
    out = {}
    items = tree.items() if isinstance(tree, dict) else enumerate(tree)
    for k, v in items:
        key = f"{prefix}{SEP}{k}" if prefix else str(k)
        if isinstance(v, (dict, list, tuple)):
            out.update(flatten(v, key))
        else:
            out[key] = v
    return out


def unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    for key, v in flat.items():
        parts = key.split(SEP)
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_npz(path: str, tree: Dict[str, Any]) -> None:
    flat = {k: np.asarray(v) for k, v in flatten(tree).items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        np.savez(f, **flat)


def load_npz(path: str, dtype=None) -> Dict[str, Any]:
    def leaf(arr):
        # bind the array once: NpzFile.__getitem__ decompresses on every
        # access, so touching it twice doubles load time and peak memory
        if dtype is not None and np.issubdtype(arr.dtype, np.floating):
            return jnp.asarray(arr, dtype)
        return jnp.asarray(arr)

    with np.load(path) as data:
        flat = {k: leaf(data[k]) for k in data.files}
    return unflatten(flat)


def restore_lists(tree):
    """Invert flatten's list->{'0': ...} encoding: any dict whose keys are
    all decimal strings becomes a list ordered by index (recursively). Use
    after load_npz on pytrees that contained lists (model block lists)."""
    if isinstance(tree, dict):
        out = {k: restore_lists(v) for k, v in tree.items()}
        if out and all(k.isdigit() for k in out):
            return [out[k] for k in sorted(out, key=int)]
        return out
    return tree


def cast_floats(tree, dtype):
    """Cast floating leaves to dtype, leave ints/bools untouched."""
    def _cast(x):
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
            return jnp.asarray(x, dtype)
        return jnp.asarray(x)
    return jax.tree.map(_cast, tree)


def n_params(tree) -> int:
    return sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(tree))


def tree_bytes(tree) -> int:
    return sum(int(np.prod(np.shape(x))) * jnp.asarray(x).dtype.itemsize
               for x in jax.tree.leaves(tree))
