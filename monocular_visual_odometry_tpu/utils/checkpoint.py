"""VO state checkpoint / resume.

The reference has no checkpointing at all (SURVEY.md §5.4) — only a final
trajectory text file. Because the whole engine state is one pytree
(models.state.VOState), checkpointing is a flat save/restore; an .npz
snapshot fully captures map, keyframe window, ring buffer and RNG, so a
sequence can be resumed mid-flight bit-exactly.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np


def save_state(path: str, state: Any) -> None:
    leaves, treedef = jax.tree_util.tree_flatten(state)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez_compressed(
        path,
        treedef=np.frombuffer(str(treedef).encode(), dtype=np.uint8),
        n_leaves=np.asarray(len(leaves)),
        **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)},
    )


def load_state(path: str, like: Any) -> Any:
    """Restore a state saved by :func:`save_state`. ``like`` provides the
    pytree structure (e.g. a freshly initialized VOState)."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = int(data["n_leaves"])
    if n != len(leaves):
        raise ValueError(f"checkpoint has {n} leaves, template has {len(leaves)}")
    new_leaves = [
        jax.numpy.asarray(data[f"leaf_{i}"], dtype=leaves[i].dtype)
        for i in range(n)
    ]
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
