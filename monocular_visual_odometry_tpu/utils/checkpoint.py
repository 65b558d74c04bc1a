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
    pytree structure (e.g. a freshly initialized VOState).

    Validates the saved treedef string and every leaf's shape against the
    template, so capacity/config mismatches fail with a clear message
    instead of a downstream asarray/broadcast error."""
    data = np.load(path)
    leaves, treedef = jax.tree_util.tree_flatten(like)
    n = int(data["n_leaves"])
    if n != len(leaves):
        raise ValueError(f"checkpoint has {n} leaves, template has {len(leaves)}")
    saved_treedef = bytes(data["treedef"]).decode()
    if saved_treedef != str(treedef):
        raise ValueError(
            "checkpoint pytree structure does not match the template state "
            "(was it saved with a different framework version?):\n"
            f"  saved:    {saved_treedef[:200]}...\n"
            f"  template: {str(treedef)[:200]}...")
    new_leaves = []
    for i in range(n):
        arr = data[f"leaf_{i}"]
        if tuple(arr.shape) != tuple(np.shape(leaves[i])):
            raise ValueError(
                f"checkpoint leaf {i} has shape {tuple(arr.shape)} but the "
                f"template expects {tuple(np.shape(leaves[i]))} — capacity "
                "config (max_keypoints/max_map_points/...) must match the "
                "one used at save time")
        new_leaves.append(jax.numpy.asarray(arr, dtype=leaves[i].dtype))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)
