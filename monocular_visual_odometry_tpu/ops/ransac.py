"""Batched-hypothesis RANSAC primitives.

The reference relies on OpenCV's sequential early-exit RANSAC loops
(``findEssentialMat`` / ``findHomography`` / ``solvePnPRansac``,
SURVEY.md §3.5 item 4).  Data-dependent early exit does not map to XLA;
the TPU-native formulation samples a *fixed batch* of minimal sets, solves
them all with vmapped linear algebra, scores all hypotheses against all
correspondences as one [B, N] computation, and takes the argmax — then
refits on the winning consensus set (SURVEY.md §8.3 "RANSAC on TPU").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_minimal_sets(key: jax.Array, valid: jnp.ndarray, n_hypotheses: int,
                        sample_size: int) -> jnp.ndarray:
    """Sample ``n_hypotheses`` index sets of size ``sample_size`` from the
    valid entries of a masked array, without replacement within each set.

    Uses the Gumbel-top-k trick: one [B, N] uniform draw, -inf on invalid
    slots, top-k per row. If fewer than ``sample_size`` entries are valid,
    invalid indices can appear; downstream scoring masks those hypotheses
    out naturally (their solves are degenerate and score ~0 inliers).

    The top-k itself is ``sample_size`` successive argmax+mask reductions:
    lax.top_k lowers to a full row sort on TPU, which for minimal-set
    sizes (3-10) is orders of magnitude more work than k reductions.

    Returns [B, sample_size] int32 indices.
    """
    n = valid.shape[0]
    g = jnp.where(valid[None, :], jax.random.gumbel(key, (n_hypotheses, n)),
                  -jnp.inf)

    def pick(g, _):
        idx = jnp.argmax(g, axis=-1).astype(jnp.int32)
        cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
        g = jnp.where(cols == idx[:, None], -jnp.inf, g)
        return g, idx

    _, idx = jax.lax.scan(pick, g, None, length=sample_size)
    return jnp.swapaxes(idx, 0, 1)  # [B, sample_size]


def nullspace_via_eigh(A: jnp.ndarray) -> jnp.ndarray:
    """Smallest right-singular vector of A (..., M, D) via eigh(AᵀA).

    AᵀA is a tiny (D,D) Gram matrix (D=9 for E/H, D=4 for triangulation,
    D=12 for DLT-PnP), so a batched eigh is far cheaper on TPU than a
    batched SVD of A, and the Gram products run on the MXU.
    """
    AtA = jnp.einsum("...md,...me->...de", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def hartley_normalize(pts: jnp.ndarray, valid: jnp.ndarray | None = None):
    """Similarity-normalize 2-D points to zero mean / sqrt(2) RMS distance
    (Hartley's preconditioning for DLT in f32).

    pts: [..., N, 2]. Returns (pts_norm, T_3x3) with x_norm = T @ x_homog.
    """
    if valid is None:
        w = jnp.ones(pts.shape[:-1], dtype=pts.dtype)
    else:
        w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    mean = jnp.sum(pts * w[..., None], axis=-2, keepdims=True) / n[..., None]
    centered = (pts - mean) * w[..., None]
    rms = jnp.sqrt(jnp.sum(centered**2, axis=(-1, -2)) / jnp.squeeze(n, -1) + 1e-12)
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-8)
    pts_n = (pts - mean) * s[..., None, None]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    mx = jnp.squeeze(mean, -2)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mx[..., 0]], axis=-1),
            jnp.stack([zeros, s, -s * mx[..., 1]], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return pts_n, T
