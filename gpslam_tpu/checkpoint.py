"""Checkpoint / resume (SURVEY.md §5.4; reference: boost::serialization on
Values/NonlinearFactorGraph/ISAM2, S15).

The entire solver state here is a pytree (Values, SmootherState, factor
tables), so checkpointing is: flatten-with-paths -> one .npz per checkpoint,
restore into a structurally-identical template. Template-based restore avoids
fragile treedef serialization and keeps files plain numpy (inspectable,
version-proof). Works for any pytree the framework produces.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def _path_key(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        elif hasattr(p, "name"):
            parts.append(str(p.name))
        else:
            parts.append(str(p))
    return "/".join(parts)


def save(path: str, pytree: Any) -> None:
    """Write a pytree of arrays to `path` (.npz). Atomic via temp+rename."""
    leaves = jax.tree_util.tree_flatten_with_path(pytree)[0]
    data = {}
    for p, leaf in leaves:
        data[_path_key(p)] = np.asarray(leaf)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **data)
    # np.savez appends .npz if missing; normalize
    src = tmp if os.path.exists(tmp) else tmp + ".npz"
    os.replace(src, path)


def load(path: str, template: Any) -> Any:
    """Restore a pytree with the structure (and dtypes) of `template`."""
    with np.load(path) as data:
        leaves, treedef = jax.tree_util.tree_flatten_with_path(template)
        out = []
        for p, leaf in leaves:
            key = _path_key(p)
            if key not in data:
                raise KeyError(
                    f"checkpoint {path} missing leaf {key!r}; structure changed?"
                )
            arr = data[key]
            want = np.asarray(leaf)
            if arr.shape != want.shape:
                raise ValueError(
                    f"leaf {key!r}: checkpoint shape {arr.shape} != template "
                    f"{want.shape}"
                )
            out.append(jax.numpy.asarray(arr, want.dtype))
        return jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(template), out
        )
