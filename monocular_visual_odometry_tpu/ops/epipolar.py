"""Two-view epipolar geometry: E/H estimation, pose recovery, triangulation.

TPU-native replacement for ``/root/reference/src/geometry/
epipolar_geometry.cpp``:

- :func:`estimate_essential`       — cv::findEssentialMat RANSAC (:17-57),
  as batched 8-point solves + vectorized inlier counting + consensus refit
- :func:`recover_pose_from_E`      — cv::recoverPose (:53): SVD of E -> 4
  candidate (R, t), cheirality vote by batched triangulation, unit-norm t
- :func:`estimate_homography`      — cv::findHomography RANSAC (:106),
  batched 4-point DLT
- :func:`decompose_homography`     — cv::decomposeHomographyMat (:120):
  Faugeras-Lustman SVD decomposition, 4 solutions, unit-norm t
- :func:`homography_visible_filter`— cv::filterHomographyDecompByVisibleRefpoints
  via n.x > 0 voting over inliers (:59-88)
- :func:`triangulate`              — cv::triangulatePoints + homogeneous
  divide (:130-175), batched per-correspondence DLT
- :func:`epipolar_residuals`       — y2' [t]x R y1 residual (:184-209)

All functions take fixed-capacity masked correspondence arrays and are
jit/vmap-safe. Linear solves use Gram-matrix eigh (see ops.ransac).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from monocular_visual_odometry_tpu.ops import lie
from monocular_visual_odometry_tpu.ops.ransac import (
    hartley_normalize,
    nullspace,
    sample_minimal_sets,
)

_EPS = 1e-9


# ---------------------------------------------------------------------------
# essential matrix
# ---------------------------------------------------------------------------


def _eight_point(x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Batched 8-point algorithm on normalized-plane coords.

    x1, x2: [..., M, 2] (M >= 8). Returns essential matrices [..., 3, 3]
    projected onto the essential manifold (singular values (1, 1, 0)).
    """
    x1n, T1 = hartley_normalize(x1)
    x2n, T2 = hartley_normalize(x2)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    ones = jnp.ones_like(u1)
    # constraint rows for x2^T E x1 = 0
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, ones], axis=-1
    )  # [..., M, 9]
    e = nullspace(A)
    En = e.reshape(e.shape[:-1] + (3, 3))
    E = jnp.swapaxes(T2, -1, -2) @ En @ T1
    # project to essential manifold
    U, s, Vt = jnp.linalg.svd(E)
    sm = (s[..., 0] + s[..., 1]) * 0.5
    S = jnp.stack([sm, sm, jnp.zeros_like(sm)], axis=-1)
    return (U * S[..., None, :]) @ Vt


def _sym_epipolar_dist2(E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray) -> jnp.ndarray:
    """Symmetric squared point-line epipolar distance on the normalized
    plane. E: [..., 3, 3]; x1, x2: [N, 2]. Returns [..., N]."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)  # [N,3]
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    l2 = jnp.einsum("...ij,nj->...ni", E, h1)                        # line in view 2
    l1 = jnp.einsum("...ji,nj->...ni", E, h2)                        # line in view 1
    num = jnp.einsum("ni,...ni->...n", h2, l2)
    d2_2 = num**2 / (l2[..., 0] ** 2 + l2[..., 1] ** 2 + _EPS)
    d2_1 = num**2 / (l1[..., 0] ** 2 + l1[..., 1] ** 2 + _EPS)
    return d2_1 + d2_2


class RansacModel(NamedTuple):
    model: jnp.ndarray        # [3,3] E or H
    inliers: jnp.ndarray      # [N] bool
    n_inliers: jnp.ndarray    # scalar int32


def estimate_essential(
    x1: jnp.ndarray, x2: jnp.ndarray, valid: jnp.ndarray, key: jax.Array,
    *, threshold: float, n_hypotheses: int = 512, minimal: str = "8pt",
) -> RansacModel:
    """RANSAC essential matrix from normalized-plane correspondences.

    ``threshold`` is in normalized-plane units (the reference passes pixels
    to cv::findEssentialMat with focal/pp so OpenCV divides internally; our
    caller passes threshold_px / focal).  Fixed ``n_hypotheses`` batch,
    then a consensus refit on the winner's inliers via masked Gram-matrix
    8-point.

    ``minimal`` (jit-static) picks the minimal solver:

    - ``"8pt"``: 8-point samples — one hypothesis each, cheapest, but needs
      ~1.7x cleaner samples (8 inliers per draw vs 5).
    - ``"5pt"``: true five-point samples (ops.fivepoint, the cv::
      findEssentialMat/Nistér parity path) — up to 8 candidates per
      sample, wins at high outlier rates where 8-point draws rarely land
      all-inlier (tests/test_fivepoint.py).
    """
    th2 = threshold * threshold
    cap = 2.0 * th2

    if minimal == "5pt":
        from monocular_visual_odometry_tpu.ops.fivepoint import five_point_essential

        k_s, k_b = jax.random.split(key)
        # each 5-point sample yields up to 8 root candidates; spend the
        # hypothesis budget on B = n/4 samples for a comparable model pool
        n_samples = max(n_hypotheses // 4, 8)
        idx = sample_minimal_sets(k_s, valid, n_samples, 5)    # [B,5]
        Es, ok = five_point_essential(x1[idx], x2[idx], k_b)
        Es = Es.reshape(-1, 3, 3)
        ok = ok.reshape(-1)
    else:
        idx = sample_minimal_sets(key, valid, n_hypotheses, 8)  # [B,8]
        Es = _eight_point(x1[idx], x2[idx])                     # [B,3,3]
        ok = jnp.ones(Es.shape[0], bool)

    def msac(E):
        # truncated-quadratic (MSAC) score: robust model quality, much
        # better discriminator than inlier count near the noise floor
        d2 = _sym_epipolar_dist2(E, x1, x2)
        return jnp.sum(jnp.where(valid, jnp.minimum(d2, cap), 0.0), axis=-1), d2

    scores, d2 = msac(Es)
    scores = jnp.where(ok, scores, jnp.inf)
    best = jnp.argmin(scores)
    # Iterated consensus refit (LO-RANSAC-style), tracked by MSAC score.
    # TWO refit chains guard against consensus degeneracy: chain A seeds
    # from the best minimal hypothesis's gate; chain B seeds from ALL valid
    # matches. Chain B is what rescues quasi-planar scenes — minimal
    # 8-point samples collapse onto the plane-induced E family and their
    # gates exclude exactly the off-plane points that disambiguate it,
    # while the all-match solve keeps them (outlier rate is low after
    # radius-gated matching). Both chains run BATCHED (vmapped refit) so
    # the sequential depth is 4 refit rounds, not 12 — the refits are
    # latency-bound single-model solves on TPU, so depth is what counts.
    E_best, s_best = Es[best], scores[best]
    seeds = jnp.stack([(d2[best] < cap) & valid,
                       jnp.broadcast_to(valid, d2[best].shape)])  # [2,N]
    refit = jax.vmap(lambda w: _weighted_eight_point(x1, x2, w))
    inl_cur = seeds
    for _ in range(4):
        # a chain whose consensus set collapsed below the minimal sample
        # size produces a rank-deficient (in the limit all-zero) system
        # whose "model" can score PERFECTLY (E=0 makes every residual
        # 0/eps=0) — guard the chain out instead of letting it win
        n_sup = jnp.sum(inl_cur, axis=-1)                        # [2]
        E_cur = refit(inl_cur.astype(x1.dtype))                  # [2,3,3]
        s_cur, d2r = msac(E_cur)
        s_cur = jnp.where(n_sup >= 8, s_cur, jnp.inf)
        inl_cur = (d2r < cap) & valid[None]
        c_best = jnp.argmin(s_cur)
        better = s_cur[c_best] <= s_best
        E_best = jnp.where(better, E_cur[c_best], E_best)
        s_best = jnp.minimum(s_cur[c_best], s_best)
    d2f = _sym_epipolar_dist2(E_best, x1, x2)
    inl_best = (d2f < cap) & valid
    return RansacModel(E_best, inl_best, jnp.sum(inl_best))


def _weighted_eight_point(x1, x2, w):
    """8-point over all correspondences with 0/1 weights (consensus refit)."""
    x1n, T1 = hartley_normalize(x1, w > 0)
    x2n, T2 = hartley_normalize(x2, w > 0)
    u1, v1 = x1n[..., 0], x1n[..., 1]
    u2, v2 = x2n[..., 0], x2n[..., 1]
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, jnp.ones_like(u1)],
        axis=-1,
    ) * w[..., None]
    e = nullspace(A)
    En = e.reshape(3, 3)
    E = T2.T @ En @ T1
    U, s, Vt = jnp.linalg.svd(E)
    sm = (s[0] + s[1]) * 0.5
    return (U * jnp.asarray([sm, sm, 0.0])[None, :]) @ Vt


def _solve_sym3(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Closed-form batched solve of symmetric 3x3 systems via the adjugate
    — pure elementwise arithmetic, no LAPACK-style iteration. A: [...,3,3]
    (symmetric), b: [...,3]. Near-singular systems get a relative-scaled
    determinant floor; callers gate the resulting points by depth/parallax
    anyway."""
    a00, a01, a02 = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    a11, a12, a22 = A[..., 1, 1], A[..., 1, 2], A[..., 2, 2]
    c00 = a11 * a22 - a12 * a12
    c01 = a02 * a12 - a01 * a22
    c02 = a01 * a12 - a02 * a11
    c11 = a00 * a22 - a02 * a02
    c12 = a01 * a02 - a00 * a12
    c22 = a00 * a11 - a01 * a01
    det = a00 * c00 + a01 * c01 + a02 * c02
    scale = jnp.maximum(jnp.abs(a00) + jnp.abs(a11) + jnp.abs(a22), _EPS)
    det = jnp.where(jnp.abs(det) < _EPS * scale**3,
                    _EPS * scale**3, det)
    x0 = c00 * b[..., 0] + c01 * b[..., 1] + c02 * b[..., 2]
    x1 = c01 * b[..., 0] + c11 * b[..., 1] + c12 * b[..., 2]
    x2 = c02 * b[..., 0] + c12 * b[..., 1] + c22 * b[..., 2]
    return jnp.stack([x0, x1, x2], axis=-1) / det[..., None]


def triangulate(x1: jnp.ndarray, x2: jnp.ndarray, T_2_1: jnp.ndarray) -> jnp.ndarray:
    """Linear (DLT) triangulation of normalized-plane correspondences.

    Camera 1 has projection [I|0]; camera 2 has ``T_2_1`` (maps frame-1
    points into frame 2). Returns [N, 3] points in camera-1 frame.
    Mirrors doTriangulation (epipolar_geometry.cpp:130-175).

    Solved in the inhomogeneous form (Hartley-Zisserman linear
    triangulation with w=1): A = [B | c], X = -(B'B)^-1 B'c — a
    closed-form batched 3x3 solve instead of a 4x4 nullspace
    eigendecomposition. On TPU the batched eigh was the single most
    expensive op of the whole init path (4.2 ms for N=1024 vs ~0.1 ms for
    the closed form); points at infinity (w ~ 0), which the homogeneous
    form can represent and this one cannot, blow up to huge coordinates
    and are removed by the callers' positive-depth and parallax-angle
    gates either way.
    """
    P1 = jnp.eye(3, 4, dtype=x1.dtype)
    P2 = T_2_1[:3, :]

    def rows(P, x):
        # two DLT rows per view:  x * P[2] - P[0],  y * P[2] - P[1]
        return jnp.stack(
            [x[..., 0:1] * P[2] - P[0], x[..., 1:2] * P[2] - P[1]], axis=-2
        )

    A = jnp.concatenate([rows(P1, x1), rows(P2, x2)], axis=-2)  # [N,4,4]
    B = A[..., :3]
    c = A[..., 3]
    BtB = jnp.einsum("...ki,...kj->...ij", B, B)                # [N,3,3]
    Btc = jnp.einsum("...ki,...k->...i", B, c)                  # [N,3]
    return -_solve_sym3(BtB, Btc)


def depths_in_two_views(pts1: jnp.ndarray, T_2_1: jnp.ndarray):
    """z in camera 1 and camera 2 for frame-1 points."""
    z1 = pts1[..., 2]
    p2 = lie.transform_points(T_2_1, pts1)
    return z1, p2[..., 2]


def _sampson_residuals(R: jnp.ndarray, t: jnp.ndarray, x1: jnp.ndarray,
                       x2: jnp.ndarray) -> jnp.ndarray:
    """First-order geometric (Sampson) epipolar error per correspondence,
    in normalized-plane units. [N]."""
    E = lie.hat(t) @ R
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    Ex1 = h1 @ E.T          # [N,3]
    Etx2 = h2 @ E           # [N,3]
    r = jnp.sum(h2 * Ex1, axis=-1)
    denom = jnp.sqrt(
        Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2 + _EPS
    )
    return r / denom


def refine_pose_sampson(
    R0: jnp.ndarray, t0: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray,
    valid: jnp.ndarray, *, iterations: int = 10, huber_delta: float = 2e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gauss-Newton refinement of a relative pose on the 5-DoF essential
    manifold (rotation so(3) x translation-sphere tangent), minimizing
    Huber-robust Sampson error over ALL valid matches.

    This is the step OpenCV's 5-point RANSAC gets from its internal
    refinement and the reference lacks entirely; it also rescues
    quasi-planar consensus degeneracy, since off-plane correspondences
    re-enter through the robust cost instead of being hard-gated away.
    """

    def tangent_basis(t):
        # two unit vectors orthogonal to t
        a = jnp.where(jnp.abs(t[0]) < 0.9,
                      jnp.asarray([1.0, 0.0, 0.0], t.dtype),
                      jnp.asarray([0.0, 1.0, 0.0], t.dtype))
        b1 = jnp.cross(t, a)
        b1 = b1 / (jnp.linalg.norm(b1) + _EPS)
        b2 = jnp.cross(t, b1)
        return jnp.stack([b1, b2], axis=-1)  # [3,2]

    w_valid = valid.astype(x1.dtype)

    def residuals(params, R, t, B):
        w, tau = params[:3], params[3:]
        Rp = lie.so3_exp(w) @ R
        tp = t + B @ tau
        tp = tp / (jnp.linalg.norm(tp) + _EPS)
        return _sampson_residuals(Rp, tp, x1, x2)

    # Redescending IRLS weight: Huber inside, ZERO beyond 5x the Huber
    # width. Plain Huber keeps w = delta/|r| for gross outliers, which
    # grows the cost LINEARLY with their residual — at ~20% gross
    # outliers that measurably drags the refined translation direction
    # (tournament median t-dir error 26 deg vs 5.5 deg for the
    # unrefined reference rule, round-4 A/B). Cutting the weight to zero
    # makes refinement condition only on plausible correspondences, like
    # refining on the consensus set but smooth at the boundary.
    cutoff = 5.0 * huber_delta

    def irls_w(r):
        absr = jnp.abs(r)
        w = jnp.where(absr <= huber_delta, 1.0, huber_delta / (absr + _EPS))
        return jnp.where(absr > cutoff, 0.0, w)

    def robust_cost(r):
        # matching bounded evaluation cost: Huber inside, constant beyond
        # the cutoff (so moving an excluded outlier does not change it)
        absr = jnp.abs(r)
        quad = r * r
        lin = huber_delta * (2.0 * absr - huber_delta)
        c = jnp.where(absr <= huber_delta, quad, lin)
        cap = huber_delta * (2.0 * cutoff - huber_delta)
        return jnp.sum(w_valid * jnp.where(absr > cutoff, cap, c))

    def step(carry, _):
        R, t, lam = carry
        B = tangent_basis(t)
        p0 = jnp.zeros(5, dtype=x1.dtype)
        r = residuals(p0, R, t, B)
        J = jax.jacfwd(residuals)(p0, R, t, B)          # [N,5]
        w = w_valid * irls_w(r)
        H = J.T @ (J * w[:, None])
        g = J.T @ (r * w)
        delta = -jnp.linalg.solve(H + lam * jnp.eye(5, dtype=x1.dtype), g)
        R_new = lie.so3_exp(delta[:3]) @ R
        t_new = t + B @ delta[3:]
        t_new = t_new / (jnp.linalg.norm(t_new) + _EPS)
        cost = robust_cost(r)
        r_new = _sampson_residuals(R_new, t_new, x1, x2)
        cost_new = robust_cost(r_new)
        accept = cost_new < cost
        R = jnp.where(accept, R_new, R)
        t = jnp.where(accept, t_new, t)
        lam = jnp.where(accept, lam * 0.3, lam * 5.0)
        return (R, t, lam), None

    (R, t, _), _ = jax.lax.scan(
        step, (R0, t0, jnp.asarray(1e-4, dtype=x1.dtype)), None, length=iterations
    )
    return R, t


def recover_pose_from_E(
    E: jnp.ndarray, x1: jnp.ndarray, x2: jnp.ndarray, inliers: jnp.ndarray
):
    """cv::recoverPose: decompose E into 4 (R, t) candidates, pick by
    cheirality vote over the inlier correspondences; t unit-normalized
    (epipolar_geometry.cpp:53-56). Returns (R [3,3], t [3], n_good)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.asarray([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    t = t / (jnp.linalg.norm(t) + _EPS)

    cand_R = jnp.stack([R1, R1, R2, R2])          # [4,3,3]
    cand_t = jnp.stack([t, -t, t, -t])            # [4,3]
    Ts = jax.vmap(lie.rt_to_T)(cand_R, cand_t)    # [4,4,4]

    def count_good(T):
        pts1 = triangulate(x1, x2, T)
        z1, z2 = depths_in_two_views(pts1, T)
        ok = (z1 > 0) & (z2 > 0) & inliers
        return jnp.sum(ok)

    votes = jax.vmap(count_good)(Ts)
    best = jnp.argmax(votes)
    return cand_R[best], cand_t[best], votes[best]


# ---------------------------------------------------------------------------
# homography
# ---------------------------------------------------------------------------


def _four_point_h(p1: jnp.ndarray, p2: jnp.ndarray) -> jnp.ndarray:
    """Batched 4-point DLT homography (pixels). p1,p2: [..., M, 2] (M>=4).
    Returns [..., 3, 3] with p2 ~ H p1."""
    p1n, T1 = hartley_normalize(p1)
    p2n, T2 = hartley_normalize(p2)
    u1, v1 = p1n[..., 0], p1n[..., 1]
    u2, v2 = p2n[..., 0], p2n[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], axis=-1)
    r2 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1)
    A = jnp.concatenate([r1, r2], axis=-2)  # [..., 2M, 9]
    h = nullspace(A)
    Hn = h.reshape(h.shape[:-1] + (3, 3))
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / (H[..., 2:3, 2:3] + _EPS)


def _sym_transfer_dist2(H: jnp.ndarray, p1: jnp.ndarray, p2: jnp.ndarray):
    """Symmetric transfer squared distances for H (pixels). Returns [..., N]
    as the max of forward/backward squared errors (conservative gate)."""
    Hinv = jnp.linalg.inv(H)

    def transfer(M, p):
        h = jnp.concatenate([p, jnp.ones_like(p[..., :1])], axis=-1)
        q = jnp.einsum("...ij,nj->...ni", M, h)
        return q[..., :2] / (q[..., 2:3] + jnp.where(q[..., 2:3] >= 0, _EPS, -_EPS))

    e12 = jnp.sum((transfer(H, p1) - p2) ** 2, axis=-1)
    e21 = jnp.sum((transfer(Hinv, p2) - p1) ** 2, axis=-1)
    return jnp.maximum(e12, e21)


def estimate_homography(
    p1: jnp.ndarray, p2: jnp.ndarray, valid: jnp.ndarray, key: jax.Array,
    *, threshold_px: float = 3.0, n_hypotheses: int = 512,
) -> RansacModel:
    """RANSAC homography from pixel correspondences
    (cv::findHomography with ransacReprojThreshold=3,
    epipolar_geometry.cpp:106)."""
    idx = sample_minimal_sets(key, valid, n_hypotheses, 4)
    Hs = _four_point_h(p1[idx], p2[idx])
    cap = threshold_px * threshold_px

    def msac(H):
        d2 = _sym_transfer_dist2(H, p1, p2)
        return jnp.sum(jnp.where(valid, jnp.minimum(d2, cap), 0.0), axis=-1), d2

    scores, d2 = msac(Hs)
    best = jnp.argmin(scores)
    # two consensus-refit chains, batched — same depth-4 structure and
    # rationale as estimate_essential
    H_best, s_best = Hs[best], scores[best]
    seeds = jnp.stack([(d2[best] < cap) & valid,
                       jnp.broadcast_to(valid, d2[best].shape)])  # [2,N]
    refit = jax.vmap(lambda w: _weighted_h(p1, p2, w))
    inl_cur = seeds
    for _ in range(4):
        # degenerate-support guard — same rationale as estimate_essential
        n_sup = jnp.sum(inl_cur, axis=-1)                        # [2]
        H_cur = refit(inl_cur.astype(p1.dtype))                  # [2,3,3]
        s_cur, d2r = msac(H_cur)
        s_cur = jnp.where(n_sup >= 4, s_cur, jnp.inf)
        inl_cur = (d2r < cap) & valid[None]
        c_best = jnp.argmin(s_cur)
        better = s_cur[c_best] <= s_best
        H_best = jnp.where(better, H_cur[c_best], H_best)
        s_best = jnp.minimum(s_cur[c_best], s_best)
    d2f = _sym_transfer_dist2(H_best, p1, p2)
    inl_best = (d2f < cap) & valid
    return RansacModel(H_best, inl_best, jnp.sum(inl_best))


def _weighted_h(p1, p2, w):
    p1n, T1 = hartley_normalize(p1, w > 0)
    p2n, T2 = hartley_normalize(p2, w > 0)
    u1, v1 = p1n[..., 0], p1n[..., 1]
    u2, v2 = p2n[..., 0], p2n[..., 1]
    z = jnp.zeros_like(u1)
    o = jnp.ones_like(u1)
    r1 = jnp.stack([-u1, -v1, -o, z, z, z, u2 * u1, u2 * v1, u2], axis=-1) * w[..., None]
    r2 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=-1) * w[..., None]
    A = jnp.concatenate([r1, r2], axis=-2)
    h = nullspace(A)
    Hn = h.reshape(3, 3)
    H = jnp.linalg.inv(T2) @ Hn @ T1
    return H / (H[2, 2] + _EPS)


def decompose_homography(H: jnp.ndarray, K: jnp.ndarray):
    """Faugeras-Lustman decomposition of a pixel homography into 4 candidate
    (R, t, n) with t unit-normalized (cv::decomposeHomographyMat +
    the reference's t normalization, epipolar_geometry.cpp:120-127).

    Returns (Rs [4,3,3], ts [4,3], ns [4,3], valid4 [4] bool).
    ``valid4`` is False for the (near-)pure-rotation degenerate case where
    the scaled homography has (almost) equal singular values.
    """
    Kinv = jnp.linalg.inv(K)
    Hn = Kinv @ H @ K
    U, s, Vt = jnp.linalg.svd(Hn)
    d1, d2, d3 = s[0], s[1], s[2]
    detUV = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    # work with H' = s*H/d2 so that the middle singular value is 1
    distinct = (d1 / (d2 + _EPS) - 1.0 > 1e-4) | (1.0 - d3 / (d2 + _EPS) > 1e-4)

    x1_sq = (d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    x3_sq = (d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, _EPS)
    x1 = jnp.sqrt(jnp.clip(x1_sq, 0.0, 1.0))
    x3 = jnp.sqrt(jnp.clip(x3_sq, 0.0, 1.0))

    sin_t = (d1 - d3) * x1 * x3 / jnp.maximum(d2, _EPS)
    cos_t = (d1 * x3_sq + d3 * x1_sq) / jnp.maximum(d2, _EPS)

    def solution(e1, e3):
        st = e1 * e3 * sin_t
        Rp = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dtype=H.dtype
        )
        Rp = Rp.at[0, 0].set(cos_t).at[0, 2].set(-st).at[2, 0].set(st).at[2, 2].set(cos_t)
        npp = jnp.stack([e1 * x1, jnp.zeros_like(x1), e3 * x3])
        tp = (d1 - d3) * jnp.stack([e1 * x1, jnp.zeros_like(x1), -e3 * x3])
        R = detUV * (U @ Rp @ Vt)
        t = U @ tp
        nvec = Vt.T @ npp
        # convention: plane normal points toward camera 1 (n_z > 0 wanted by
        # the reference's max-|n_z| pick either way)
        t = t / (jnp.linalg.norm(t) + _EPS)
        return R, t, nvec

    Rs, ts, ns = [], [], []
    for e1 in (1.0, -1.0):
        for e3 in (1.0, -1.0):
            R, t, nv = solution(e1, e3)
            Rs.append(R)
            ts.append(t)
            ns.append(nv)
    valid4 = jnp.broadcast_to(distinct, (4,))
    return jnp.stack(Rs), jnp.stack(ts), jnp.stack(ns), valid4


def homography_visible_filter(ns: jnp.ndarray, x1: jnp.ndarray,
                              inliers: jnp.ndarray) -> jnp.ndarray:
    """cv::filterHomographyDecompByVisibleRefpoints analogue: a solution is
    plausible if the plane normal has the reference points on its visible
    side (n . [x, y, 1] > 0) for (almost) all inlier points.

    ns: [4,3] normals; x1: [N,2] normalized-plane points in view 1.
    Returns [4] bool."""
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)  # [N,3]
    dots = jnp.einsum("kj,nj->kn", ns, h1)
    n_in = jnp.maximum(jnp.sum(inliers), 1)
    frac_pos = jnp.sum((dots > 0) & inliers[None, :], axis=-1) / n_in
    return frac_pos > 0.9


def epipolar_residuals(x1: jnp.ndarray, x2: jnp.ndarray, R: jnp.ndarray,
                       t: jnp.ndarray) -> jnp.ndarray:
    """Algebraic epipolar constraint error y2^T [t]x R y1 per correspondence
    (computeEpipolarConsError, epipolar_geometry.cpp:184-209)."""
    E = lie.hat(t) @ R
    h1 = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    h2 = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    return jnp.einsum("ni,ij,nj->n", h2, E, h1)
