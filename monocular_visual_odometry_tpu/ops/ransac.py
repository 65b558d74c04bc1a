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

    Kept as the reference implementation for tests; the hot path uses
    :func:`nullspace` (ridge-Cholesky inverse iteration), which on TPU is
    both ~4x faster and MORE accurate in f32 (measured on [256,8,9]
    batches: eigh 3.97 ms / 3e-3 max error vs 1.6 ms / 7e-5 — TPU eigh is
    an iterative batched routine whose f32 convergence floor is worse than
    two exact triangular solves).
    """
    AtA = jnp.einsum("...md,...me->...de", A, A)
    _, vecs = jnp.linalg.eigh(AtA)
    return vecs[..., :, 0]


def nullspace(A: jnp.ndarray, iters: int = 3) -> jnp.ndarray:
    """Smallest right-singular vector of A (..., M, D) by BLOCK-2 inverse
    iteration + Rayleigh-Ritz on the ridged Gram matrix — the init-latency
    cost center replacement (VERDICT r4 next #3; measured 16.2 -> 9.1 ms
    full init pair on v5e).

    AᵀA is a tiny (D,D) Gram (D=9 for E/H minimal solves, 12 for DLT-PnP).
    Its nullspace eigenvalue is ~0 (exact for minimal point sets,
    noise-level for consensus refits); inverse iteration on
    (AᵀA + eps·tr/D·I) converges at rate (λ_1+eps)/(λ_3+eps) per step.
    A SINGLE-vector iteration fails when λ_2 ≈ λ_1 — exactly the
    E-family degeneracy of low-parallax two-view geometry, where the two
    smallest eigenvalues are both at noise level and the iterate converges
    to an arbitrary mix of their eigenvectors (measured: 11-18° t-direction
    error on a small-baseline scene where eigh gave 0.4°). The 2-column
    block resolves that pair exactly: both near-null directions are
    captured by the subspace, and the closed-form 2x2 Rayleigh-Ritz
    problem orders them. Cost is nearly identical — the triangular solves
    take both columns in one call; one batched Cholesky + 2 two-column
    triangular solves per iteration replaces the batched eigh that
    dominated init latency (docs/LATENCY.md).
    """
    AtA = jnp.einsum("...md,...me->...de", A, A)
    d = AtA.shape[-1]
    tr = jnp.trace(AtA, axis1=-2, axis2=-1)[..., None, None]
    M = AtA + (1e-6 / d) * jnp.maximum(tr, 1e-30) * jnp.eye(d, dtype=A.dtype)
    L = jnp.linalg.cholesky(M)
    # two fixed, mutually-orthogonal start vectors (generic w.r.t. any
    # data-dependent nullspace; f32 round-off re-seeds lost components)
    v0 = jnp.ones(AtA.shape[:-2] + (d,), A.dtype)
    alt = jnp.asarray([1.0, -1.0], A.dtype)
    v1 = jnp.broadcast_to(jnp.resize(alt, (d,)), AtA.shape[:-2] + (d,))
    V = jnp.stack([v0, v1], axis=-1)                         # [..., D, 2]
    for _ in range(iters):
        Y = jax.lax.linalg.triangular_solve(
            L, V, left_side=True, lower=True)
        V = jax.lax.linalg.triangular_solve(
            L, Y, left_side=True, lower=True, transpose_a=True)
        # Gram-Schmidt re-orthonormalization of the 2 columns
        c0 = V[..., 0]
        c0 = c0 / (jnp.linalg.norm(c0, axis=-1, keepdims=True) + 1e-30)
        c1 = V[..., 1]
        c1 = c1 - jnp.sum(c0 * c1, axis=-1, keepdims=True) * c0
        c1 = c1 / (jnp.linalg.norm(c1, axis=-1, keepdims=True) + 1e-30)
        V = jnp.stack([c0, c1], axis=-1)
    # Rayleigh-Ritz: smallest eigenvector of the 2x2 projection Vᵀ(AᵀA)V.
    # CRITICAL precision detail: B is formed as (AV)ᵀ(AV) from A directly,
    # NOT as Vᵀ(AtA)V — the latter carries f32 noise relative to ‖AᵀA‖
    # (the LARGE eigenvalues), which swamps the tiny eigenvalues being
    # compared; the Gram of the projected columns A·V has f32 error
    # relative to the SMALL projected scale itself (measured: 1.93° -> ~
    # eigh-level error on a λ2/λ1 = 267 near-degenerate 8-point sample).
    AV = jnp.einsum("...md,...dk->...mk", A, V)              # [..., M, 2]
    B = jnp.einsum("...mk,...ml->...kl", AV, AV)             # [..., 2, 2]
    a, b, c = B[..., 0, 0], B[..., 0, 1], B[..., 1, 1]
    half_diff = 0.5 * (a - c)
    rad = jnp.sqrt(half_diff * half_diff + b * b)
    lam_min = 0.5 * (a + c) - rad
    # eigenvector of [[a,b],[b,c]] for lam_min: pick the better-conditioned
    # of the two analytic forms
    w1 = jnp.stack([b, lam_min - a], axis=-1)
    w2 = jnp.stack([lam_min - c, b], axis=-1)
    use1 = jnp.abs(lam_min - a) > jnp.abs(lam_min - c)
    w = jnp.where(use1[..., None], w1, w2)
    # b ≈ 0 and a ≈ c: any basis vector works; fall back to picking the
    # smaller diagonal
    degenerate = jnp.linalg.norm(w, axis=-1) < 1e-12
    w_fallback = jnp.where((a <= c)[..., None],
                           jnp.asarray([1.0, 0.0], A.dtype),
                           jnp.asarray([0.0, 1.0], A.dtype))
    w = jnp.where(degenerate[..., None], w_fallback, w)
    w = w / (jnp.linalg.norm(w, axis=-1, keepdims=True) + 1e-30)
    v = jnp.einsum("...dk,...k->...d", V, w)
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-30)


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
