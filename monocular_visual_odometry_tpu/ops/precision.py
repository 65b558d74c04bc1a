"""True-f32 matmul pinning for geometry code.

The TPU MXU's DEFAULT precision computes f32 matmuls as a single bf16
pass. That is the right trade for the descriptor matcher (which feeds the
MXU explicit bf16 inputs anyway) but it corrupts the geometry stack's
Gram-based solves — triangulation B'B, 8-point A'A, the BA/PnP normal
equations — at the ~1e-2 relative level (measured 0.75 max triangulation
error vs 3e-4 at HIGHEST on v5e, a 2.7x end-to-end ATE regression).
Every f32 contraction in this codebase is tiny, so HIGHEST (6-pass
true-f32) costs nothing material.

``f32_matmuls`` wraps a function so its ops — traced or eager — run under
``jax.default_matmul_precision("highest")``. Explicit-bf16 matmuls are
unaffected (precision config only selects the algorithm for f32 inputs).
"""

from __future__ import annotations

import functools

import jax


def f32_matmuls(fn):
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)
    return wrapped
