"""Checkpoint/resume: save and restore parameter pytrees as ``.npz``.

The reference has no checkpointing (hyperparameter vectors are tiny; users
pickle ad hoc — SURVEY.md §5).  Here any parameter pytree (including optimizer
state) round-trips through a flat ``.npz`` file keyed by tree path, so a long
NLML optimization is trivially resumable.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

__all__ = ["save_pytree", "load_pytree"]


def _key(path) -> str:
    return "/".join(str(getattr(p, "key", getattr(p, "idx", getattr(p, "name", p)))) for p in path)


def save_pytree(path: str, tree: Any) -> None:
    """Write every array leaf of ``tree`` to ``path`` (.npz), keyed by tree path."""
    flat = {}
    for p, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        flat[_key(p)] = np.asarray(leaf)
    np.savez(path, **flat)


def load_pytree(path: str, like: Any) -> Any:
    """Restore a pytree with the structure (and dtypes) of ``like``."""
    data = np.load(path)
    paths, treedef = jax.tree_util.tree_flatten_with_path(like)
    leaves = []
    for p, leaf in paths:
        k = _key(p)
        if k not in data:
            raise KeyError(f"checkpoint {path!r} missing leaf {k!r}")
        arr = data[k]
        leaves.append(jax.numpy.asarray(arr, dtype=leaf.dtype) if hasattr(leaf, "dtype") else arr)
    return jax.tree_util.tree_unflatten(treedef, leaves)
