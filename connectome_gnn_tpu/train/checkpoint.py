"""Disk checkpointing for parameter/state pytrees.

The reference only ever snapshots best weights in memory
(reference ``connectome_gnn/train.py:113-125``); this module adds the
durable equivalent: save/restore of arbitrary pytrees (params, BatchNorm
state, optimizer state) to a single ``.npz`` file keyed by pytree path.
No pickle, no framework lock-in — arrays round-trip as raw numpy.

Restore is template-based: the caller provides a pytree of the right
structure (e.g. freshly initialized params) and gets back the same
structure filled with stored arrays.  This is the natural JAX pattern —
structure lives in code, data lives in the checkpoint.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for p in path:
        if isinstance(p, jax.tree_util.DictKey):
            parts.append(str(p.key))
        elif isinstance(p, jax.tree_util.SequenceKey):
            parts.append(str(p.idx))
        elif isinstance(p, jax.tree_util.GetAttrKey):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save_checkpoint(path: str, tree: Any) -> None:
    """Save a pytree of arrays to ``path`` (``.npz`` appended if missing).

    The write is atomic (tmp file + rename), so a crash mid-save — the
    preemption case checkpointing exists for — never corrupts the last
    good checkpoint.
    """
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    arrays = {_path_key(p): np.asarray(v) for p, v in flat}
    target = path if path.endswith(".npz") else path + ".npz"
    directory = os.path.dirname(os.path.abspath(target))
    os.makedirs(directory, exist_ok=True)
    tmp = f"{target}.tmp{os.getpid()}.npz"  # np.savez appends .npz otherwise
    try:
        np.savez(tmp, **arrays)
        os.replace(tmp, target)
    finally:
        if os.path.exists(tmp):
            os.remove(tmp)


def restore_checkpoint(path: str, template: Any) -> Any:
    """Restore a pytree saved by :func:`save_checkpoint`.

    ``template`` supplies the structure (and device placement via
    ``jnp.asarray``); every leaf is replaced by the stored array.
    """
    import jax.numpy as jnp

    file = path if path.endswith(".npz") else path + ".npz"
    with np.load(file) as data:
        stored = dict(data)

    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for p, leaf in flat:
        key = _path_key(p)
        if key not in stored:
            raise KeyError(f"checkpoint {file} is missing leaf '{key}'")
        value = stored[key]
        if hasattr(leaf, "shape") and tuple(leaf.shape) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch for '{key}': template {tuple(leaf.shape)} "
                f"vs checkpoint {tuple(value.shape)}"
            )
        leaves.append(jnp.asarray(value))
    return jax.tree_util.tree_unflatten(treedef, leaves)
